"""Incremental-ingest test: files landing later are extracted exactly once
(Structured Streaming file source + AvailableNow + checkpoint)."""

import os

from no_ocr_spark.sources.synth_spark import pages_df
from no_ocr_spark.streaming.incremental import incremental_extract


def test_incremental_exactly_once(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("pages_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))

    all_pages = pages_df(spark, 120)
    first = all_pages.filter("url like '%-1' or url like '%-2' or url like '%-3'")
    first.write.mode("append").parquet(in_dir)
    n1_expected = first.count()

    incremental_extract(spark, in_dir, out_dir)
    got1 = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert got1.count() == n1_expected

    # second wave: append MORE files; only they get processed
    second = all_pages.filter("url like '%-4' or url like '%-5'")
    second.write.mode("append").parquet(in_dir)
    incremental_extract(spark, in_dir, out_dir)
    got2 = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert got2.count() == n1_expected + second.count()
    # no duplicates: urls unique
    assert got2.select("url").distinct().count() == got2.count()

    # third run with nothing new: output unchanged
    incremental_extract(spark, in_dir, out_dir)
    got3 = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert got3.count() == got2.count()


def test_replayed_batch_is_idempotent(spark, tmp_path_factory):
    # simulate foreachBatch at-least-once delivery: wipe the checkpoint's
    # commit log after a successful run so the SAME files replay with the
    # SAME batch_id — dynamic batch_id-partition overwrite must replace,
    # not duplicate
    import shutil

    in_dir = str(tmp_path_factory.mktemp("pages_in2"))
    out_dir = str(tmp_path_factory.mktemp("stream_out2"))
    ckpt = os.path.join(out_dir, "_checkpoint")

    pages = pages_df(spark, 30)
    pages.write.mode("append").parquet(in_dir)
    incremental_extract(spark, in_dir, out_dir, checkpoint_dir=ckpt)
    n = spark.read.parquet(os.path.join(out_dir, "extracted")).count()

    shutil.rmtree(os.path.join(ckpt, "commits"))  # crash-before-commit replay
    incremental_extract(spark, in_dir, out_dir, checkpoint_dir=ckpt)
    got = spark.read.parquet(os.path.join(out_dir, "extracted"))
    assert got.count() == n  # replay replaced its batch partition
    assert got.select("url").distinct().count() == n
