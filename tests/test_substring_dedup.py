"""Repeated-substring removal (operators/substring_dedup.py — Lee et
al. 2022 ExactSubstr semantics at word-k-gram granularity): planted
cross-doc and within-doc duplicated passages are removed from every
occurrence, unique text survives verbatim, sub-k docs are untouched.
Exact engine-vs-oracle equality is covered by
tests/test_oracle_parity.py::substring_dedup."""

from __future__ import annotations

from no_ocr_spark.operators.substring_dedup import (
    K_GRAM,
    remove_repeated_substrings,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r.doc_id: r for r in remove_repeated_substrings(df).collect()}


def test_cross_doc_passage_removed_from_every_occurrence(spark):
    passage = " ".join(f"dup{i}" for i in range(K_GRAM + 4))  # 12 words
    a_head = " ".join(f"ua{i}" for i in range(10))
    b_tail = " ".join(f"ub{i}" for i in range(10))
    out = _run(spark, [
        (1, f"{a_head} {passage}"),
        (2, f"{passage} {b_tail}"),
        (3, " ".join(f"uc{i}" for i in range(20))),
    ])
    # the shared 12-word passage vanishes from BOTH docs; unique words stay
    assert out[1].clean_text == a_head
    assert out[2].clean_text == b_tail
    assert out[1].n_removed == out[2].n_removed == K_GRAM + 4
    # fully-unique doc untouched
    assert out[3].n_removed == 0
    assert out[3].clean_text == " ".join(f"uc{i}" for i in range(20))


def test_within_doc_repetition_removed(spark):
    block = " ".join(f"w{i}" for i in range(K_GRAM))
    mid = " ".join(f"m{i}" for i in range(K_GRAM))  # unique separator
    out = _run(spark, [(1, f"{block} {mid} {block}")])
    # both copies of the repeated block go; the unique middle survives
    assert out[1].clean_text == mid
    assert out[1].n_removed == 2 * K_GRAM


def test_docs_shorter_than_k_are_never_touched(spark):
    short = " ".join(f"s{i}" for i in range(K_GRAM - 1))
    out = _run(spark, [(1, short), (2, short)])  # identical but sub-k
    assert out[1].n_removed == out[2].n_removed == 0
    assert out[1].clean_text == short


def test_boundary_fragments_survive(spark):
    """Only words COVERED by a duplicated k-gram are removed: a unique
    word adjacent to the duplicated span stays (the disclosed k-gram
    granularity vs the paper's suffix array)."""
    passage = " ".join(f"p{i}" for i in range(K_GRAM))
    out = _run(spark, [
        (1, f"only1 {passage}"),
        (2, f"only2 {passage}"),
    ])
    assert out[1].clean_text == "only1"
    assert out[2].clean_text == "only2"


def test_irregular_whitespace_reports_zero_removed(spark):
    """Review finding: split() emits empty tokens for doubled/leading/
    trailing spaces; the stats must not count them as removed words."""
    out = _run(spark, [(1, "a  b"), (2, " x y "), (3, "")])
    for d in (1, 2, 3):
        assert out[d].n_removed == 0, d
    assert out[1].n_words == 2 and out[3].n_words == 0
    # clean text is byte-faithful for untouched docs, empties included
    assert out[1].clean_text == "a  b"
