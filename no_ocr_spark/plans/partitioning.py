"""Explicit partitioning + skew salting (SURVEY.md §4, deliberate item 1).

Two distinct concerns at 100 TB:

1. **Work distribution / resume units** — `with_bucket`: a STABLE partition
   key `bucket = pmod(xxhash64(url), n_buckets)`. url is unique, so buckets
   are uniform; stability across runs (pure function of url, unlike
   `spark_partition_id()`) is what makes per-bucket lineage + resume sound.

2. **Skewed-key aggregation** — a Common-Crawl-ish corpus has Zipf hosts
   (host0000 holds ~7% of all docs in the synthetic corpus). Any
   `groupBy(host)` therefore has a hot key. `salted_host_counts` implements
   the canonical two-stage salted aggregation: partial agg on
   (host, salt=pmod(xxhash64(url), S)) — S-way fan-out of the hot key —
   then final agg on host over the S partials. Map-side partial aggregation
   makes stage 1 cheap; stage 2 shuffles at most S rows per host.

Reference analogue: none — the reference is single-node (SURVEY.md §4);
this is mandated by the north rule ("partitioning / shuffle / skew handled
explicitly").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    """Attach the stable url-hash bucket column (resume/work unit)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int")
    )


def host_of(url_col: str = "url"):
    """Column expr: host part of the url (built-in parse_url — JVM-side)."""
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def salted_host_counts(pages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host doc counts + byte totals via two-stage salted aggregation.

    Equivalent result to `groupBy(host).count()` but with the hot host's
    work spread over `n_salts` reducers in stage 1.
    """
    salted = pages.select(
        host_of("url").alias("host"),
        F.pmod(F.xxhash64("url"), F.lit(n_salts)).alias("salt"),
        F.length("html").alias("n_bytes"),
    )
    partial = salted.groupBy("host", "salt").agg(
        F.count("*").alias("c"), F.sum("n_bytes").alias("b")
    )
    return partial.groupBy("host").agg(
        F.sum("c").alias("n_docs"), F.sum("b").alias("n_bytes")
    )


def detect_heavy_hosts(pages: DataFrame, min_share: float = 0.01) -> DataFrame:
    """Hosts holding more than `min_share` of the corpus (sampled, cheap):
    the candidates for salting when a host-keyed shuffle is unavoidable."""
    total = pages.count()
    return (
        salted_host_counts(pages)
        .filter(F.col("n_docs") >= F.lit(max(1, int(total * min_share))))
        .orderBy(F.desc("n_docs"))
    )


def salt_heavy_keys(df: DataFrame, heavy_keys: list[str], n_salts: int = 16,
                    key_col: str = "host", salt_source: str = "url") -> DataFrame:
    """Attach a `salt` column that fans out ONLY the detected heavy keys:
    heavy keys get pmod(xxhash64(salt_source), n_salts) (n_salts-way
    spread), everything else salt 0 (exactly one partial per key — no
    needless fan-out of the long tail). heavy_keys is driver-side but
    bounded: at min_share=0.01 there are at most 100 of them, broadcast as
    a literal isin list regardless of corpus size."""
    is_heavy = F.col(key_col).isin(heavy_keys) if heavy_keys else F.lit(False)
    return df.withColumn(
        "salt",
        F.when(is_heavy, F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)))
        .otherwise(F.lit(0)).cast("int"),
    )


def targeted_salted_host_counts(pages: DataFrame, n_salts: int = 16,
                                min_share: float = 0.01) -> DataFrame:
    """Detection -> TARGETED salting -> two-stage aggregation: the
    detect_heavy_hosts output actually drives the salt (SURVEY §4 item 1),
    unlike salted_host_counts which fans out every key uniformly.

    Stage 1 groups on (host, salt): each heavy host's rows spread over
    n_salts reducers; tail hosts keep one partial each. Stage 2 reduces at
    most n_salts rows per host. Same result as groupBy(host) by
    construction. Detection is LAZY (heavy_host_flags + broadcast join) —
    composing this fires no Spark job."""
    salted = salt_by_heavy_flags(
        pages.select(host_of("url").alias("host"), "url",
                     F.length("html").alias("n_bytes")),
        heavy_host_flags(pages, min_share), n_salts,
    )
    partial = salted.groupBy("host", "salt").agg(
        F.count("*").alias("c"), F.sum("n_bytes").alias("b")
    )
    return partial.groupBy("host").agg(
        F.sum("c").alias("n_docs"), F.sum("b").alias("n_bytes")
    )


def heavy_host_flags(pages: DataFrame, min_share: float = 0.01) -> DataFrame:
    """LAZY heavy-host detection — the in-DAG replacement for
    detect_heavy_hosts().collect() (round-3 verdict: a plan BUILDER must
    never fire a driver-side Spark job; same rule as lsh_bits_for,
    retrieval.py). Returns a DataFrame of at most 1/min_share `host` rows;
    nothing executes until the consuming query runs, and the consumer
    broadcasts it (<= 100 rows by construction regardless of corpus size).

    The histogram is a plain groupBy(host).count(): map-side partial
    aggregation collapses each mapper's hot-key rows to ONE row before the
    shuffle, so a COUNT over a skewed key needs no salting — the salted
    two-stage form only pays off for wide/heavy aggregation states. The
    global total arrives via crossJoin(broadcast(1-row agg)) instead of a
    global window, which would funnel the full histogram (millions of
    hosts at crawl scale) through a single partition."""
    hist = (
        pages.select(host_of("url").alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n"))
    )
    total = hist.agg(F.sum("n").alias("total"))
    return (
        hist.crossJoin(F.broadcast(total))
        # same threshold semantics as detect_heavy_hosts:
        # n >= max(1, int(total * min_share))  (int() truncates; so does
        # the bigint cast)
        .filter(F.col("n") >= F.greatest(
            F.lit(1).cast("bigint"),
            (F.col("total") * F.lit(min_share)).cast("bigint"),
        ))
        .select("host")
    )


def salt_by_heavy_flags(df: DataFrame, heavy: DataFrame, n_salts: int = 16,
                        key_col: str = "host",
                        salt_source: str = "url") -> DataFrame:
    """Targeted salting driven by a LAZY heavy-key DataFrame: broadcast
    left join of the <= 1/min_share heavy rows onto df (no shuffle of df),
    then the same salt rule as salt_heavy_keys — detected keys fan over
    n_salts partials, the tail keeps salt 0. Composing this fires no job;
    detection executes as the broadcast build side of the consuming DAG."""
    flagged = df.join(
        F.broadcast(heavy.withColumn("_heavy", F.lit(True))),
        key_col, "left",
    )
    return flagged.withColumn(
        "salt",
        F.when(F.col("_heavy"),
               F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)))
        .otherwise(F.lit(0)).cast("int"),
    ).drop("_heavy")


def fan_out_for_cpu(df: DataFrame, spark) -> DataFrame:
    """Repartition to full parallelism BEFORE a CPU-heavy per-row stage —
    but ONLY when the scan itself can't feed the cluster (fewer splits
    than cores: single-file / single-ROW-GROUP inputs, like the bench
    tables — a parquet file never splits finer than its row groups, so
    maxPartitionBytes alone can't help there). At 100 TB a table is
    thousands of files and this is a NO-OP with zero shuffle; on a
    starved scan it is exactly the _augmented/extraction fan-out rule:
    shuffle the raw rows once so the expensive expressions run on every
    core. Split count comes from the FileScanRDD driver-side (plan
    build + file listing — composing fires no Spark job; asserted in
    tests/test_partitioning.py)."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
