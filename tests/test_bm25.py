"""BM25 top-k (operators/bm25.py): independent naive-Python scorer as
a second oracle (the DuckDB parity leg is
tests/test_oracle_parity.py::bm25_topk), plus ranking sanity."""

from __future__ import annotations

import math

import duckdb

from no_ocr_spark.operators.bm25 import (
    B,
    K1,
    QUERY_TERMS,
    TOP_K,
    q_bm25_topk,
)

SF = "/root/testdata/sf0.001"


def _naive_bm25() -> list[tuple[int, float]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    words = {d: (t or "").split(" ") for d, t in rows}
    n = len(rows)
    avgdl = sum(len(w) for w in words.values()) / n
    df = {t: sum(1 for w in words.values() if t in w) for t in QUERY_TERMS}
    scored = []
    for d, w in words.items():
        s = 0.0
        for t in QUERY_TERMS:
            tf = w.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(w) / avgdl))
        scored.append((d, round(s, 6)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:TOP_K]


def test_matches_independent_scorer(spark):
    got = [(r.doc_id, r.score) for r in q_bm25_topk(spark, SF).collect()]
    assert got == _naive_bm25()


def test_scores_rank_term_rich_docs_first(spark):
    got = q_bm25_topk(spark, SF).collect()
    assert len(got) == TOP_K
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0
