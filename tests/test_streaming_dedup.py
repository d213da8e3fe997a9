"""Streaming dedup tests: duplicates arriving in-stream are dropped with
bounded state (dropDuplicatesWithinWatermark) and with exact unbounded
state (dropDuplicates)."""

import os

from pyspark.sql import functions as F

from no_ocr_spark.sources.synth_spark import pages_df
from no_ocr_spark.streaming.dedup import (
    stream_dedup_exact,
    stream_dedup_within_watermark,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _run_available_now(spark, in_dir, out_dir, dedup_fn):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    )
    q = (
        dedup_fn(stream)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(os.path.join(out_dir, "data"))


def test_stream_dedup_within_watermark_drops_in_horizon_dupes(
    spark, tmp_path_factory
):
    in_dir = str(tmp_path_factory.mktemp("sd_in"))
    out_dir = str(tmp_path_factory.mktemp("sd_out"))

    base = pages_df(spark, 40)
    # duplicate every page once at +1 minute (inside the 10-minute horizon)
    dupes = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 MINUTE")
    )
    base.unionByName(dupes).write.mode("append").parquet(in_dir)

    got = _run_available_now(
        spark, in_dir, out_dir, stream_dedup_within_watermark
    )
    assert got.count() == base.count()
    assert got.select("url").distinct().count() == base.count()
    # content untouched (dedup drops rows, never mutates them)
    assert got.columns == base.columns


def test_stream_dedup_exact_across_batches(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("se_in"))
    out_dir = str(tmp_path_factory.mktemp("se_out"))

    base = pages_df(spark, 25)
    base.write.mode("append").parquet(in_dir)
    got1 = _run_available_now(spark, in_dir, out_dir, stream_dedup_exact)
    assert got1.count() == base.count()

    # second wave: SAME pages again (state persists across restarts via
    # the checkpoint) plus a few genuinely new ones
    extra = pages_df(spark, 35).join(
        base.select("url"), "url", "left_anti"
    )
    base.unionByName(extra).write.mode("append").parquet(in_dir)
    got2 = _run_available_now(spark, in_dir, out_dir, stream_dedup_exact)
    assert got2.count() == base.count() + extra.count()
    assert got2.select("url").distinct().count() == got2.count()
