"""Sequence packing (`operators/packing.py`): exact greedy semantics on
planted token sizes, including over-budget documents and group isolation.
The DuckDB-parity gate (test_oracle_parity.py::pack_sequences) covers the
real documents table; this file pins the rule itself."""

from __future__ import annotations

import pandas as pd

from no_ocr_spark.operators.packing import BUDGET, _pack_group


def _pack(sizes: list[int]) -> list[tuple[int, int]]:
    pdf = pd.DataFrame({
        "lang": ["en"] * len(sizes),
        "doc_id": list(range(len(sizes))),
        "n_tokens": sizes,
    })
    out = _pack_group(pdf)
    return list(zip(out["seq_id"], out["seq_fill"]))


def test_simple_fill_and_rollover():
    # BUDGET = 512: 200+200 fits, +200 rolls over
    assert _pack([200, 200, 200]) == [(1, 200), (1, 400), (2, 200)]


def test_exact_boundary_fits():
    assert _pack([512]) == [(1, 512)]
    assert _pack([256, 256, 1]) == [(1, 256), (1, 512), (2, 1)]


def test_over_budget_doc_gets_own_sequence():
    got = _pack([100, 9000, 50, 50])
    # 9000 > BUDGET: rolls into its own sequence; the NEXT doc rolls
    # again (fill 9000 + 50 > BUDGET)
    assert got == [(1, 100), (2, 9000), (3, 50), (3, 100)]


def test_first_doc_over_budget():
    assert _pack([9000, 10]) == [(1, 9000), (2, 10)]


def test_unsorted_input_is_packed_in_doc_id_order():
    pdf = pd.DataFrame({
        "lang": ["en"] * 3,
        "doc_id": [2, 0, 1],
        "n_tokens": [300, 300, 300],
    })
    out = _pack_group(pdf).sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 1, 2]
    # every 300+300 = 600 > 512 rolls over: one sequence per doc
    assert list(out["seq_id"]) == [1, 2, 3]


def test_fill_never_exceeds_budget_except_oversize_docs():
    sizes = [130, 400, 512, 1, 511, 2, 600, 3]
    for (seq, fill), n in zip(_pack(sizes), sizes):
        assert fill <= BUDGET or n > BUDGET


def test_null_text_rows_pack_as_zero_tokens(spark):
    """ADVICE r4: a null text row must not kill the task (size(split())
    yields null -> NaN in pandas -> int(NaN) raised). The query coalesces
    n_tokens to 0; zero-token docs join the current sequence."""
    from pyspark.sql import functions as F

    from no_ocr_spark.operators.packing import _SCHEMA, _pack_group

    df = spark.createDataFrame(
        [("en", 0, "a b c"), ("en", 1, None), ("en", 2, "d e")],
        "lang string, doc_id bigint, text string",
    ).select(
        "lang", "doc_id",
        F.expr("coalesce(cast(size(split(text, ' ')) as bigint), 0)")
        .alias("n_tokens"),
    )
    out = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_fill)
           for r in df.groupBy("lang").applyInPandas(
               _pack_group, schema=_SCHEMA).collect()}
    assert out == {0: (3, 1, 3), 1: (0, 1, 3), 2: (2, 1, 5)}
