"""Structured Streaming windowed aggregation with watermark: events driven
through a file-source stream; results must equal the equivalent batch
window aggregation (the streaming/batch unification contract)."""

import os

from pyspark.sql import functions as F


def test_windowed_stream_equals_batch(spark, tmp_path_factory, sf_dir):
    events_path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(events_path)
    schema = batch.schema

    stream_in = str(tmp_path_factory.mktemp("stream_in"))
    batch.write.mode("append").parquet(stream_in)

    # watermarks need TIMESTAMP (LTZ); the parquet column is TIMESTAMP_NTZ
    stream = (
        spark.readStream.schema(schema).parquet(stream_in)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r.ws, r.event_type): r.n
           for r in spark.sql("SELECT * FROM win_out").collect()}
    want = {
        (r.ws, r.event_type): r.n
        for r in batch.groupBy(
            F.window("ts", "6 hours").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want and len(got) > 0
