"""Per-partition lineage + checkpoint-resume (SURVEY.md §2.9 W5, §4 item 2).

Reference analogue: the CaseInfo status machine — `processing` -> `done`
JSON sidecar (`no-ocr-api/np_ocr/api.py:86-99, 241-252`) — generalized to a
per-bucket ledger so a 10^12-document job that dies mid-run re-processes
ONLY the missing buckets.

Design:
  * Work unit = stable url-hash bucket (plans/partitioning.with_bucket).
  * Outputs are written `partitionBy("bucket")` with dynamic partition
    overwrite, so re-running a bucket atomically replaces exactly its
    directory — idempotent resume.
  * Lineage row per bucket: (bucket, n_docs, n_bytes, checksum, status,
    wall_ms). Checksum = order-independent bit_xor of xxhash64(url, text):
    identical data => identical checksum regardless of row order or
    parallelism — this is how two runs at different cluster sizes are
    proven byte-identical.
  * Resume = left-anti join of all buckets against lineage status='done'
    (SURVEY.md §2.4) — only pending buckets are scanned (the bucket
    predicate prunes parquet row groups via pushdown).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from no_ocr_spark.operators.extract_udf import extract, spans_table
from no_ocr_spark.plans.partitioning import with_bucket

LINEAGE_SCHEMA = (
    "bucket int, n_docs bigint, n_bytes bigint, checksum string, "
    "status string, wall_ms bigint"
)


def lineage_rollup(extracted: DataFrame) -> DataFrame:
    """Per-bucket lineage aggregate (SURVEY.md §2.5 A4): partial+final hash
    agg, order-independent checksum."""
    return extracted.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_bytes"),
        F.lower(F.hex(F.bit_xor(F.xxhash64("url", "text")))).alias("checksum"),
        F.lit("done").alias("status"),
    )


def pending_buckets(spark: SparkSession, n_buckets: int, lineage_path: str) -> list[int]:
    """All buckets minus those marked done in the lineage table."""
    all_b = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    if not os.path.exists(lineage_path):
        return [r.bucket for r in all_b.collect()]
    done = (
        spark.read.parquet(lineage_path)
        .filter(F.col("status") == "done")
        .select("bucket")
        .distinct()
    )
    return sorted(
        r.bucket for r in all_b.join(done, "bucket", "left_anti").collect()
    )


def run_with_lineage(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
) -> dict:
    """The extraction job with checkpoint-resume.

    Returns {"processed_buckets": [...], "wall_ms": int}. Re-invoking after
    a partial failure processes only buckets absent from the lineage table.
    """
    t0 = time.time()
    # Resume SAFETY depends on dynamic partition overwrite: with the default
    # ("static"), mode('overwrite').partitionBy('bucket') on a partial bucket
    # list would wipe the already-done buckets' directories. Set it here so
    # correctness never hinges on which session factory built `spark`.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    lineage_path = os.path.join(out_dir, "lineage")
    todo = pending_buckets(spark, n_buckets, lineage_path)
    if not todo:
        return {"processed_buckets": [], "wall_ms": 0}

    bucketed = with_bucket(pages, n_buckets)
    if len(todo) < n_buckets:
        bucketed = bucketed.filter(F.col("bucket").isin(todo))

    # Extraction runs directly on the scan splits (max parallelism, zero
    # shuffle of raw html). The explicit url-hash repartition (SURVEY §4
    # item 1) happens AFTER extraction, on the ~10x smaller extracted data:
    # tasks land on (bucket, sub-split) groups — several files per bucket
    # dir, each dir still replaced atomically by dynamic overwrite — and it
    # is the shuffle you'd accept at 100 TB: never the fat input column.
    # Explicit N => AQE keeps it.
    #
    # Write-once, project-on-read: the `extracted` table carries the nested
    # spans column (schema superset of FIXTURES.md A2 — columnar readers
    # that don't select it never touch it). Storing text twice (a staging
    # copy + a projection copy) bought nothing; the per-page `spans` table
    # and the lineage rollup derive from column-pruned re-reads. Downstream
    # jobs run SERIALLY: concurrent jobs over nested-struct scans measured
    # 3x slower at high core counts (GC interference), with no win at low.
    result = extract(bucketed)  # bucket recomputed from url (pure fn)
    extracted_path = os.path.join(out_dir, "extracted")
    # Write parallelism: hash on (bucket, url-subsplit) rather than bucket
    # alone, so the number of write tasks is decoupled from n_buckets. With
    # exactly n_buckets tasks, a 32-bucket job runs only 4 waves on 8 cores
    # and one straggler stretches the stage; ~4 waves' worth of smaller
    # tasks per core keeps the tail short at every parallelism level (and
    # multiple files per bucket dir is what a real 100 TB run produces
    # anyway — dynamic overwrite replaces whole bucket dirs, so resume
    # semantics are unchanged).
    par = spark.sparkContext.defaultParallelism
    n_write = max(n_buckets, 8 * par)
    # NB: salt the sub-split hash (extra lit column) — bucket is
    # pmod(xxhash64(url), n_buckets), so an unsalted xxhash64(url) mod k
    # is perfectly correlated with it and yields no extra distinct keys.
    sub = F.pmod(F.xxhash64("url", F.lit("w")),
                 F.lit(max(1, n_write // n_buckets)))
    (
        with_bucket(result, n_buckets)
        .repartition(n_write, "bucket", sub)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(extracted_path)
    )
    st = spark.read.parquet(extracted_path)
    if len(todo) < n_buckets:
        # resume: derive spans/lineage only for the buckets just written
        # (bucket is a partition column -> directory pruning, no data read
        # for the already-done buckets)
        st = st.filter(F.col("bucket").isin(todo))

    with_bucket(spans_table(st), n_buckets).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(out_dir, "spans"))

    lineage_rows = lineage_rollup(
        st.select("bucket", "url", "text", "n_chars")
    ).collect()

    wall_ms = int((time.time() - t0) * 1000)
    lineage = spark.createDataFrame(lineage_rows).withColumn(
        "wall_ms", F.lit(wall_ms)
    )
    lineage.write.mode("append").parquet(lineage_path)
    return {"processed_buckets": todo, "wall_ms": wall_ms}


def snapshot_buckets(spark: SparkSession, snap_path: str) -> set[int]:
    """Buckets present in the CURRENT snapshot version, reconstructed from
    the per-commit `props['buckets']` summaries snapshot_extracted writes
    (metadata-only — no data scan). A non-compact commit written without
    the summary (foreign writer) falls back to a column-pruned distinct
    scan of the bucket column."""
    from no_ocr_spark.sources import snaptable

    if snaptable.current_version(spark, snap_path) < 1:
        return set()
    have: set[int] = set()
    for s in snaptable.history(spark, snap_path):
        op = s.get("operation")
        b = (s.get("props") or {}).get("buckets")
        if op == "compact":
            continue  # row-preserving: bucket set unchanged
        if b is None:
            return {
                r.bucket for r in snaptable.read(spark, snap_path)
                .select("bucket").distinct().collect()
            }
        have = set(b) if op == "overwrite" else have | set(b)
    return have


def snapshot_extracted(spark: SparkSession, out_dir: str, snap_path: str,
                       processed_buckets: list[int]) -> int | None:
    """Commit one snapshot-table version per JOB RUN containing the
    buckets that run actually processed (the north rule's "write
    extracted tables back to Iceberg" leg, on the from-scratch
    Iceberg-semantics format in sources/snaptable.py).

    * fresh run        -> version with all buckets
    * resumed run      -> append-commit of ONLY the recovered buckets
      (time travel then shows ingest progress run by run)
    * resume no-op run -> NO commit (returns the current version, or
      None for an empty table) — idempotent like the lineage ledger.

    The commit set is RECONCILED against the lineage ledger, not trusted
    from the caller: lineage is appended before this commit, so a crash
    in between leaves buckets done-in-ledger but absent-from-snapshot —
    the resumed run's run_with_lineage then reports no pending work, and
    without reconciliation those buckets would be permanently invisible
    to every read_incremental consumer. Diffing ledger-done against the
    snapshot's own per-commit bucket summaries (and committing the
    difference) makes the snapshot self-healing AND idempotent: buckets
    already committed are never re-appended. The bucket predicate prunes
    partition directories on the re-read, so the commit never rescans
    already-snapshotted buckets' data."""
    from no_ocr_spark.sources import snaptable

    done: set[int] = set()
    lineage_path = os.path.join(out_dir, "lineage")
    if os.path.exists(lineage_path):
        done = {
            r.bucket for r in spark.read.parquet(lineage_path)
            .filter(F.col("status") == "done")
            .select("bucket").distinct().collect()
        }
    have = snapshot_buckets(spark, snap_path)
    missing = sorted((set(processed_buckets) | done) - have)
    if not missing:
        return snaptable.current_version(spark, snap_path) or None
    df = spark.read.parquet(os.path.join(out_dir, "extracted")).filter(
        F.col("bucket").isin(missing)
    )
    return snaptable.write(spark, snap_path, df, mode="append",
                           props={"buckets": missing})
