"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-comparable, scale-ready plans:
  * AQE on (runtime shuffle-partition coalescing + skew handling),
  * Arrow on (the extraction core runs only in Arrow-batched UDFs —
    input_hint mandates zero per-row Python dispatch),
  * UTC session timezone (duckdb-oracle comparability),
  * shuffle partitions sized to cores for local mode (a 1000-executor
    deployment overrides via spark-submit --conf; nothing here assumes
    local mode except the default master).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "no_ocr_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = SparkSession.builder
    # Under spark-submit the JVM gateway already carries the submitted
    # --master (PYSPARK_GATEWAY_PORT is set); calling .master() here would
    # silently OVERRIDE it. Only set a master when not submitted, or when
    # the caller passes one explicitly.
    if master is not None or "PYSPARK_GATEWAY_PORT" not in os.environ:
        builder = builder.master(master or f"local[{cpus}]")
    builder = (
        builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html payloads are KB-scale; cap Arrow batches so a batch stays
        # ~tens of MB and the Python worker's peak memory is bounded.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # scan-split sizing: html payloads are CPU-heavy per byte, so favor
        # more, smaller scan partitions than the 128m default (at cluster
        # scale this is retuned per table; the principle — split size tracks
        # per-byte CPU cost, not just IO — is the same).
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "512k")
        # NOT the biggest heap that fits: the extraction pipeline is
        # allocation-heavy (nested span structs), and oversized heaps turn
        # frequent cheap GCs into rare 10s+ full pauses that serialize the
        # whole local job. 16g measured faster AND more stable than 48g.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # InferFiltersFromGenerate turns explode(expensive_expr) into an
        # inferred size(expensive_expr)>0 filter that predicate pushdown
        # then drives below every projection INTO the parquet scan — the
        # expensive expression ends up evaluated per row at scan
        # parallelism (and once more per plan branch). For token-explode
        # pipelines (jaccard prefix index, band explodes) this measured a
        # 10x wall-clock regression; the inferred filter buys nothing for
        # non-empty token arrays.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
