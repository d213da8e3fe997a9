"""Hybrid RRF fusion (operators/hybrid.py): fusion math against an
independent recomputation from the two legs' own outputs. Cell-exact
grading is tests/test_oracle_parity.py::hybrid_rrf."""

from __future__ import annotations

from no_ocr_spark.operators.hybrid import LEG_N, RRF_K, TOP_K, q_hybrid_rrf

SF = "/root/testdata/sf0.001"


def test_fusion_matches_recomputation_from_leg_ranks(spark):
    got = q_hybrid_rrf(spark, SF).collect()
    assert len(got) == TOP_K
    for r in got:
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= LEG_N
            expect += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            assert 1 <= r.vec_rank <= LEG_N
            expect += 1.0 / (RRF_K + r.vec_rank)
        assert abs(r.rrf - expect) < 1e-6
        assert r.lex_rank is not None or r.vec_rank is not None
    # descending fusion order, and a doc present in BOTH legs outranks
    # same-rank single-leg docs
    rrfs = [r.rrf for r in got]
    assert rrfs == sorted(rrfs, reverse=True)


def test_leg_ranks_are_dense_and_distinct(spark):
    got = q_hybrid_rrf(spark, SF).collect()
    lex = [r.lex_rank for r in got if r.lex_rank is not None]
    vec = [r.vec_rank for r in got if r.vec_rank is not None]
    assert len(lex) == len(set(lex))
    assert len(vec) == len(set(vec))
