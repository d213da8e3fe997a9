"""Chunk-level retrieval loop, end to end: chunk_documents (RAG window
split) -> embed_map (per-chunk embeddings through the batched service
runner) -> cosine top-k -> join back to (doc_id, chunk_no, chunk_text).
This is the modern generalization of the reference's PAGE-level loop
(pages are the PDF special case of chunks); querying with a chunk's own
embedding must return that chunk first with the exact self-similarity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from no_ocr_spark.operators.chunking import CHUNK_SIZE, chunk_documents
from no_ocr_spark.operators.embed_map import StubEmbedClient, embed_map


def test_chunk_embed_search_loop(spark):
    # distinct-content docs, each yielding several chunks
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [
            " ".join(f"doc{i} topic{i} word{i}w{j}" for j in range(60))
            for i in range(6)
        ],
    }), "doc_id bigint, text string")

    chunks = chunk_documents(docs).withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_no"))
    n_chunks = chunks.count()
    assert n_chunks > 12  # multiple chunks per doc

    emb = embed_map(chunks, id_col="chunk_id", text_col="chunk_text")
    assert emb.count() == n_chunks

    # query: a mid-document chunk's own embedding, recomputed driver-side
    # through the same stub client (independent path)
    target = chunks.filter(
        (F.col("doc_id") == 3) & (F.col("chunk_no") == 2)
    ).collect()[0]
    qvec = StubEmbedClient().embed([target.chunk_text])[0]

    # exact cosine top-1 over the chunk embeddings (integer stub vectors)
    qlit = F.array(*[F.lit(int(v)).cast("bigint") for v in qvec])
    scored = (emb.withColumn("qv", qlit)
        .withColumn(
            "dot", F.expr(
                "aggregate(zip_with(embedding, qv, (a, b) -> a * b), "
                "cast(0 as bigint), (acc, x) -> acc + x)"))
        .withColumn("nq", F.lit(sum(int(v) * int(v) for v in qvec)))
        .withColumn("nd", F.expr(
            "aggregate(transform(embedding, v -> v * v), "
            "cast(0 as bigint), (acc, x) -> acc + x)"))
        .withColumn("score",
                    F.col("dot") / F.sqrt(F.col("nq") * F.col("nd")))
        .drop("qv"))

    # take top-2 FIRST (a join does not preserve sort order), then look
    # the winners back up — the reference's result->content join shape
    top2 = scored.orderBy(F.desc("score"), "chunk_id").limit(2)
    top = (top2.join(chunks.select("chunk_id", "doc_id", "chunk_no",
                                   "chunk_text"), "chunk_id")
           .orderBy(F.desc("score"))
           .collect())
    assert (top[0].doc_id, top[0].chunk_no) == (3, 2)
    assert abs(top[0].score - 1.0) < 1e-9  # exact self-match (cosine 1)
    assert top[1].score < top[0].score
    assert top[0].chunk_text == target.chunk_text
    assert len(top[0].chunk_text) <= CHUNK_SIZE
