"""Unit semantics for the repetition/line-dedup family (DuckDB parity is
covered by tests/test_oracle_parity.py via the extras registry; these pin
the planted-corpus behaviors the parity hash alone wouldn't explain)."""

import pyspark.sql.functions as F


def test_repetition_stats_planted_docs_fire(spark, sf_dir):
    from no_ocr_spark.operators.repetition import q_repetition_stats

    df = q_repetition_stats(spark, sf_dir).cache()
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows, "empty corpus"
    planted = [r for d, r in rows.items() if d % 7 == 0]
    clean = [r for d, r in rows.items() if d % 7 != 0]
    assert planted and clean
    # every planted doc re-appends its first 12 words -> at least 12 words'
    # worth of duplicate characters beyond whatever the base text repeats
    for r in planted:
        assert r["dup_word_types"] >= 1
        assert r["dup_char_count"] > 0
    # signals are internally consistent everywhere
    for r in rows.values():
        assert 1 <= r["top_word_count"] <= r["n_words"]
        assert r["dup_word_types"] >= 0
        assert r["dup_char_count"] <= r["n_chars"]
        if r["n_words"] >= 2:
            assert r["top_2gram_count"] >= 1
    df.unpersist()


def test_line_dedup_copies_fully_deduped(spark, sf_dir):
    from no_ocr_spark.operators.repetition import q_line_dedup

    df = q_line_dedup(spark, sf_dir).cache()
    rows = {r["doc_id"]: r for r in df.collect()}
    copies = {d: r for d, r in rows.items() if d >= 100000}
    assert copies, "augmentation planted no copies"
    for d, r in copies.items():
        orig = rows[d - 100000]
        # the copy's text is the original's first 20 words = its first two
        # chunks; the original (lower doc_id) wins every one of them...
        assert r["n_lines"] == min(2, orig["n_lines"])
        # ...UNLESS the same chunk text also appears in the copy under a
        # different line_no — impossible here since the copy's two chunks
        # come from distinct word windows of a no-newline text; but chunks
        # may collide ACROSS copies of different docs, so the invariant is
        # only that nothing survives beyond what the originals already own.
        assert r["kept_lines"] == 0, f"copy {d} kept {r['kept_lines']} lines"
        assert r["clean_text"] == ""
    # originals: surviving line count never exceeds total, text shrinks
    # only for docs that lost lines
    for d, r in rows.items():
        if d >= 100000:
            continue
        assert 0 <= r["kept_lines"] <= r["n_lines"]
        if r["kept_lines"] == r["n_lines"]:
            assert r["clean_text"] != ""
    df.unpersist()


def test_line_dedup_total_line_conservation(spark, sf_dir):
    """Across the corpus each DISTINCT line survives exactly once."""
    from no_ocr_spark.operators.repetition import (
        _augmented_lines,
        _chunks_expr,
        q_line_dedup,
    )

    aug = _augmented_lines(spark, sf_dir)
    n_distinct = (
        aug.withColumn("w", F.expr("split(text, ' ')"))
        .select(F.explode(F.expr(_chunks_expr())).alias("line"))
        .distinct()
        .count()
    )
    kept_total = (
        q_line_dedup(spark, sf_dir)
        .agg(F.sum("kept_lines").alias("k"))
        .collect()[0]["k"]
    )
    assert kept_total == n_distinct
