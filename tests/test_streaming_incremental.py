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
