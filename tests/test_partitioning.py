"""Skew machinery tests: salted two-stage aggregation equals the naive
groupBy; heavy-hitter detection finds the Zipf head (host0000 holds ~7% of
the synthetic corpus)."""

from pyspark.sql import functions as F

from no_ocr_spark.plans.partitioning import (
    detect_heavy_hosts,
    host_of,
    salted_host_counts,
    with_bucket,
)
from no_ocr_spark.sources.synth_spark import pages_df


def test_salted_counts_equal_naive(spark):
    pages = pages_df(spark, 400).cache()
    salted = {r.host: (r.n_docs, r.n_bytes)
              for r in salted_host_counts(pages, n_salts=8).collect()}
    naive = {
        r.host: (r.n_docs, r.n_bytes)
        for r in pages.select(host_of("url").alias("host"),
                              F.length("html").alias("b"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"), F.sum("b").alias("n_bytes"))
        .collect()
    }
    assert salted == naive


def test_detect_heavy_hosts_finds_zipf_head(spark):
    pages = pages_df(spark, 400)
    heavy = [r.host for r in detect_heavy_hosts(pages, min_share=0.03).collect()]
    assert "host0000.example.org" in heavy
    assert len(heavy) < 20  # only the head, not the tail


def test_bucket_stability_and_uniformity(spark):
    pages = pages_df(spark, 400)
    b1 = {r.url: r.bucket for r in with_bucket(pages, 16).collect()}
    b2 = {r.url: r.bucket
          for r in with_bucket(pages.repartition(7), 16).collect()}
    assert b1 == b2  # pure function of url — partitioning-independent
    from collections import Counter

    counts = Counter(b1.values())
    assert len(counts) == 16
    assert max(counts.values()) < 3 * min(counts.values())  # roughly uniform


def test_targeted_salting_fans_out_only_heavy_keys(spark):
    from no_ocr_spark.plans.partitioning import (
        salt_heavy_keys,
        targeted_salted_host_counts,
    )

    # corpus where one host holds ~30% of rows
    hot = spark.range(300).selectExpr(
        "concat('https://hot.example.org/p', id) AS url",
        "cast(repeat('x', 100) as binary) AS html",
    )
    tail = spark.range(700).selectExpr(
        "concat('https://t', id % 70, '.example.org/p', id) AS url",
        "cast(repeat('y', 50) as binary) AS html",
    )
    pages = hot.unionByName(tail).cache()

    heavy = [r.host for r in detect_heavy_hosts(pages, min_share=0.1).collect()]
    assert heavy == ["hot.example.org"]

    # the hot key fans out to n_salts partials; tail keys keep exactly one
    salted = salt_heavy_keys(
        pages.select(host_of("url").alias("host"), "url"), heavy, n_salts=8
    )
    partials = (
        salted.groupBy("host", "salt").count()
        .groupBy("host").count().withColumnRenamed("count", "n_partials")
    )
    n_partials = {r.host: r.n_partials for r in partials.collect()}
    assert n_partials["hot.example.org"] == 8
    assert all(v == 1 for h, v in n_partials.items() if h != "hot.example.org")

    # end-to-end: targeted pipeline equals the naive groupBy
    got = {r.host: (r.n_docs, r.n_bytes)
           for r in targeted_salted_host_counts(pages, n_salts=8,
                                                min_share=0.1).collect()}
    naive = {
        r.host: (r.n_docs, r.n_bytes)
        for r in pages.select(host_of("url").alias("host"),
                              F.length("html").alias("b"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"), F.sum("b").alias("n_bytes"))
        .collect()
    }
    assert got == naive


def _n_spark_jobs(spark) -> int:
    # DAGScheduler.numTotalJobs = every job ever submitted on this context
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


def test_heavy_host_flags_matches_eager_detection(spark):
    from no_ocr_spark.plans.partitioning import heavy_host_flags

    pages = pages_df(spark, 400).cache()
    lazy = {r.host for r in heavy_host_flags(pages, min_share=0.03).collect()}
    eager = {r.host
             for r in detect_heavy_hosts(pages, min_share=0.03).collect()}
    assert lazy == eager and "host0000.example.org" in lazy


def test_compose_fires_no_spark_job(spark):
    """Plan builders must never run a driver-side Spark job (the
    lsh_bits_for rule): composing q_extract_host_stats — including its
    in-DAG heavy-host detection — must not execute anything beyond the
    parquet schema-inference (footer-read) jobs inherent to its two
    spark.read.parquet calls, which every query in the repo pays."""
    from no_ocr_spark.operators.extraction_queries import q_extract_host_stats
    from no_ocr_spark.plans.partitioning import (
        heavy_host_flags,
        salt_by_heavy_flags,
        targeted_salted_host_counts,
    )
    from no_ocr_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    # baseline: the unavoidable footer-read jobs of two bare table loads
    # (q_extract_host_stats reads the documents table twice: detection
    # branch + extraction branch)
    b0 = _n_spark_jobs(spark)
    load_table(spark, sf, "documents")
    load_table(spark, sf, "documents")
    baseline = _n_spark_jobs(spark) - b0

    before = _n_spark_jobs(spark)
    df = q_extract_host_stats(spark, sf)
    assert _n_spark_jobs(spark) - before <= baseline, (
        "composing q_extract_host_stats ran a Spark job beyond parquet "
        "schema inference"
    )

    # the pure planning primitives fire NOTHING on an in-memory frame
    pages = pages_df(spark, 50)
    before = _n_spark_jobs(spark)
    _ = targeted_salted_host_counts(pages, n_salts=4, min_share=0.1)
    _ = salt_by_heavy_flags(
        pages.select(host_of("url").alias("host"), "url"),
        heavy_host_flags(pages),
    )
    assert _n_spark_jobs(spark) == before, "composing ran a Spark job"
    # and the composed query still executes correctly (smoke)
    assert df.limit(1).count() >= 0


def test_salt_by_heavy_flags_fans_out_only_heavy_keys(spark):
    from no_ocr_spark.plans.partitioning import (
        heavy_host_flags,
        salt_by_heavy_flags,
    )

    hot = spark.range(300).selectExpr(
        "concat('https://hot.example.org/p', id) AS url",
        "cast(repeat('x', 100) as binary) AS html",
    )
    tail = spark.range(700).selectExpr(
        "concat('https://t', id % 70, '.example.org/p', id) AS url",
        "cast(repeat('y', 50) as binary) AS html",
    )
    pages = hot.unionByName(tail).cache()
    salted = salt_by_heavy_flags(
        pages.select(host_of("url").alias("host"), "url"),
        heavy_host_flags(pages, min_share=0.1), n_salts=8,
    )
    partials = (
        salted.groupBy("host", "salt").count()
        .groupBy("host").count().withColumnRenamed("count", "n_partials")
    )
    n_partials = {r.host: r.n_partials for r in partials.collect()}
    assert n_partials["hot.example.org"] == 8
    assert all(v == 1 for h, v in n_partials.items() if h != "hot.example.org")


def test_fan_out_for_cpu_conditional_and_jobless(spark):
    """Round-5 fan-out rule: repartitions a starved scan (fewer splits
    than cores) to full parallelism, NO-OPs on an already-parallel
    input, and composing it fires no Spark job beyond the footer reads
    every parquet load pays."""
    from no_ocr_spark.plans.partitioning import fan_out_for_cpu
    from no_ocr_spark.sources.tables import load_table

    par = spark.sparkContext.defaultParallelism
    # starved input: the bench documents table is one row group
    n0 = _n_spark_jobs(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base_jobs = _n_spark_jobs(spark) - n0
    n0 = _n_spark_jobs(spark)
    fanned = fan_out_for_cpu(docs, spark)
    assert _n_spark_jobs(spark) - n0 <= base_jobs  # composing fires no extra job
    assert fanned.rdd.getNumPartitions() == par
    # already-parallel input: returned unchanged, no Exchange added
    wide = spark.range(0, 1000, 1, par * 2)
    assert fan_out_for_cpu(wide, spark) is wide
