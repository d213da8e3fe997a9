"""Exact-phrase search (operators/phrase.py): adjacency semantics on
authored fixtures. Cell-exact corpus grading is
tests/test_oracle_parity.py::phrase_search."""

from __future__ import annotations

from pyspark.sql import functions as F

from no_ocr_spark.operators.phrase import (
    PHRASE,
    build_positional_postings,
    q_phrase_search,
)

SF = "/root/testdata/sf0.001"


def test_adjacency_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join hash join"),        # 2 hits
            (2, "hash x join"),                 # terms present, not adjacent
            (3, "join hash"),                   # wrong order
            (4, "a hash join b hash join c hash"),  # 2 hits
            (5, "no terms at all"),
            (6, "hash hash join"),              # overlapping lead: 1 hit
        ],
        "doc_id long, text string",
    )
    post = build_positional_postings(docs)
    legs = [post.filter(F.col("term") == t)
            .select("doc_id", F.col("positions").alias(f"p{i}"))
            for i, t in enumerate(PHRASE)]
    joined = legs[0].join(legs[1], "doc_id")
    chain = F.array_intersect(
        F.transform(F.col("p0"), lambda p: p + 1), F.col("p1"))
    got = {r.doc_id: r.n for r in joined.select(
        "doc_id", F.size(chain).alias("n")).collect()}
    assert got.get(1) == 2
    assert got.get(2, 0) == 0
    assert got.get(3, 0) == 0
    assert got.get(4) == 2
    assert 5 not in got                  # no postings for either term
    assert got.get(6) == 1


def test_corpus_query_counts_match_brute_force(spark):
    import duckdb

    got = {r.doc_id: r.n_hits for r in q_phrase_search(spark, SF).collect()}
    assert got, "phrase must occur in the corpus fixture"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    brute = {}
    for doc_id, text in rows:
        w = (text or "").split(" ")
        n = sum(1 for i in range(len(w) - len(PHRASE) + 1)
                if w[i:i + len(PHRASE)] == PHRASE)
        if n:
            brute[doc_id] = n
    top = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == dict(top)
