"""Inverted-index BM25 (operators/invindex.py): the index path must
reproduce the fused-scan path's ranking (same docs, same order, scores
within the two paths' rounding-chain ulp). Cell-exact grading against
its own quantized oracle is tests/test_oracle_parity.py::bm25_indexed_topk."""

from __future__ import annotations

from no_ocr_spark.operators.bm25 import q_bm25_topk
from no_ocr_spark.operators.invindex import build_postings, q_bm25_indexed_topk

SF = "/root/testdata/sf0.001"


def test_index_path_matches_fused_scan_path(spark):
    fused = [(r.doc_id, r.score) for r in q_bm25_topk(spark, SF).collect()]
    indexed = [(r.doc_id, r.score)
               for r in q_bm25_indexed_topk(spark, SF).collect()]
    assert [d for d, _ in fused] == [d for d, _ in indexed]
    for (_, a), (_, b) in zip(fused, indexed):
        assert abs(a - b) < 2e-6


def test_postings_are_exact_term_frequencies(spark):
    import duckdb

    post = {(r.term, r.doc_id): (r.dl, r.tf)
            for r in build_postings(
                spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "text")).collect()}
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    n_pairs = 0
    for doc_id, text in rows:
        words = (text or "").split(" ")
        seen: dict[str, int] = {}
        for w in words:
            seen[w] = seen.get(w, 0) + 1
        n_pairs += len(seen)
        for w, tf in list(seen.items())[:5]:
            assert post[(w, doc_id)] == (len(words), tf)
    assert len(post) == n_pairs
