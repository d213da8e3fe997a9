"""Perplexity quality scoring (operators/perplexity.py, CCNet-style):
reference-like text scores fewer bits than out-of-distribution text,
sub-2-token docs get NULL with n_bigrams=0, and scoring is
deterministic. Exact engine-vs-oracle equality is covered by
tests/test_oracle_parity.py::perplexity_score."""

from __future__ import annotations

from no_ocr_spark.operators.perplexity import REF_MOD, score_perplexity


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r.doc_id: r for r in score_perplexity(df).collect()}


def test_reference_like_text_scores_lower(spark):
    # reference slice (doc_id % REF_MOD == 0) = repeated natural pattern
    ref_text = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i * REF_MOD, ref_text) for i in range(1, 6)]
    rows.append((1, "the cat sat on the mat"))          # in-distribution
    rows.append((2, "zq xv qqj vxk zzk jjq kkx vvz"))   # gibberish
    out = _run(spark, rows)
    assert out[1].ppl_bits < out[2].ppl_bits
    # every bigram of doc 1 was seen in the reference -> clearly under
    # the all-unseen gibberish's uniform-smoothed cost
    assert out[2].ppl_bits - out[1].ppl_bits > 1.0


def test_short_docs_have_no_bigrams(spark):
    out = _run(spark, [(0, "seed text for the model"),
                       (1, "word"), (2, "")])
    assert out[1].n_bigrams == 0 and out[1].ppl_bits is None
    assert out[2].n_bigrams == 0 and out[2].ppl_bits is None
    assert out[0].n_bigrams == 4


def test_deterministic(spark):
    rows = [(i, f"alpha beta gamma w{i} delta") for i in range(12)]
    a = {(r.doc_id, r.ppl_bits) for r in _run(spark, rows).values()}
    b = {(r.doc_id, r.ppl_bits) for r in _run(spark, rows).values()}
    assert a == b
