"""Keyed MERGE/upsert over bucketed parquet (SURVEY.md §2.9 W5).

Reference analogue: the case-status upsert — write-or-replace of a case's
JSON sidecar (`no-ocr-api/np_ocr/api.py:86-99, 241-252`). The engine-grade
generalization is MERGE INTO; without the Iceberg runtime jar (absent from
this environment — the swap point is sources/tables.py) the idiomatic
pre-Iceberg realization is PARTITION-LEVEL COPY-ON-WRITE:

  * the table is partitioned by a stable key-hash bucket
    (pmod(xxhash64(key), n_buckets) — same scheme as the lineage ledger);
  * an upsert computes the DISTINCT buckets its update keys touch (an
    aggregation over the updates only — never a scan of the table);
  * only those partition directories are read, merged (updates win on key
    collision), and atomically replaced via dynamic partition overwrite;
  * untouched buckets' files are never opened, let alone rewritten.

At 10^12 rows with u updates per batch, cost is O(u + u/n_buckets *
table_rows/n_buckets * touched_buckets) ~ proportional to the touched
fraction — the same asymptotic as Iceberg's copy-on-write MERGE, minus its
row-group-level granularity. Swapping to Iceberg turns merge_upsert's body
into a single MERGE INTO statement; every caller keeps its signature.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_key_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 32,
) -> dict:
    """MERGE updates INTO table_path ON key (updates win; last write per key
    within `updates` is resolved by a deterministic max-struct rule).

    Returns {"touched_buckets": [...], "n_updates": int}.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # dedupe updates on key deterministically (greatest full row wins) so a
    # batch containing the same key twice cannot produce two output rows
    data_cols = [c for c in updates.columns if c != key]
    upd = (
        updates.groupBy(key)
        .agg(F.max(F.struct(*data_cols)).alias("_r"))
        .select(key, *[F.col(f"_r.{c}").alias(c) for c in data_cols])
    )
    upd = _with_key_bucket(upd, key, n_buckets)

    if not os.path.exists(table_path):
        upd.write.mode("overwrite").partitionBy("bucket").parquet(table_path)
        touched = sorted(
            r.bucket for r in upd.select("bucket").distinct().collect()
        )
        return {"touched_buckets": touched, "n_updates": upd.count()}

    touched = sorted(
        r.bucket for r in upd.select("bucket").distinct().collect()
    )
    existing = (
        spark.read.parquet(table_path)
        # bucket is a partition column => directory pruning; untouched
        # buckets are never opened
        .filter(F.col("bucket").isin(touched))
    )
    survivors = existing.join(upd.select(key), key, "left_anti")
    merged = survivors.unionByName(upd)
    # one file per touched bucket; dynamic overwrite replaces exactly the
    # touched directories, atomically per partition
    (
        merged.repartition(len(touched), "bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(table_path)
    )
    return {"touched_buckets": touched, "n_updates": upd.count()}


def delete_keys(
    spark: SparkSession,
    table_path: str,
    keys: DataFrame,
    key: str,
    n_buckets: int = 32,
) -> dict:
    """Targeted row deletion (the GDPR/right-to-erasure shape): DELETE FROM
    table WHERE key IN (keys). Same partition-level copy-on-write as
    merge_upsert — only the buckets containing requested keys are read,
    anti-joined, and atomically replaced; every other file is untouched.
    Iceberg swap point: DELETE FROM ... WHERE key IN (SELECT ...)."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    k = _with_key_bucket(keys.select(key).distinct(), key, n_buckets)
    touched = sorted(r.bucket for r in k.select("bucket").distinct().collect())
    if not touched or not os.path.exists(table_path):
        return {"touched_buckets": [], "n_deleted": 0}
    existing = spark.read.parquet(table_path).filter(
        F.col("bucket").isin(touched)
    )
    n_before = existing.count()
    survivors = existing.join(k.select(key), key, "left_anti")
    n_after = survivors.count()
    surv_buckets = {
        r.bucket for r in survivors.select("bucket").distinct().collect()
    }
    (
        survivors.repartition(len(touched), "bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(table_path)
    )
    # dynamic overwrite only replaces partitions PRESENT in the write: a
    # bucket whose every row was deleted writes nothing and its old
    # directory would survive — drop emptied buckets explicitly (Iceberg's
    # row-level DELETE handles this natively at the swap point)
    import shutil

    for b in set(touched) - surv_buckets:
        shutil.rmtree(os.path.join(table_path, f"bucket={b}"),
                      ignore_errors=True)
    return {"touched_buckets": touched, "n_deleted": n_before - n_after}


def read_merged(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(table_path).drop("bucket")
