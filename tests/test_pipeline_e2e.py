"""End-to-end pipeline tests (SURVEY.md §5 plan items 2 & 4):

* byte-identical extracted text per url — engine (Arrow-batched UDF path)
  vs the pure-Python extractor run directly (the golden oracle),
* identity holds under different partitionings (the determinism contract),
* spans table shape + ordering,
* lineage rows present; checkpoint-resume processes only missing buckets.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from no_ocr_spark.operators.extract_udf import extract, extracted_table, spans_table
from no_ocr_spark.plans.lineage import pending_buckets, run_with_lineage
from no_ocr_spark.plans.partitioning import with_bucket
from no_ocr_spark.sources.synth import gen_pages
from no_ocr_spark.sources.synth_spark import pages_df

N_DOCS = 300


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_DOCS).cache()


def test_byte_identical_vs_pure_python_golden(spark, pages):
    from no_ocr_spark.extract.api import extract_document

    golden = {r["url"]: extract_document(r["html"])["text"]
              for r in gen_pages(N_DOCS)}
    got = {r["url"]: r["text"]
           for r in extracted_table(extract(pages)).collect()}
    assert set(got) == set(golden)
    mismatches = [u for u in golden if got[u] != golden[u]]
    assert mismatches == [], f"{len(mismatches)} urls differ, e.g. {mismatches[:3]}"


def test_determinism_across_partitionings(spark, pages):
    h1 = (extract(pages.repartition(3))
          .select(F.sha2(F.concat_ws("\x00", "url", "text"), 256).alias("h")))
    h2 = (extract(pages.repartition(11, "url"))
          .select(F.sha2(F.concat_ws("\x00", "url", "text"), 256).alias("h")))
    agg1 = h1.agg(F.bit_xor(F.xxhash64("h")).alias("x")).collect()[0].x
    agg2 = h2.agg(F.bit_xor(F.xxhash64("h")).alias("x")).collect()[0].x
    assert agg1 == agg2


def test_spans_table_shape_and_order(spark, pages):
    spans = spans_table(extract(pages))
    row = (spans.filter(F.col("page") >= 2).limit(1).collect())
    assert row, "expected multi-page PDFs in the corpus"
    r = row[0]
    blocks_lines = [(s.block, s.line) for s in r.spans]
    assert blocks_lines == sorted(blocks_lines)
    assert all(s.text for s in r.spans)
    # HTML rows: bbox nulled, page always 1
    html_row = spans.filter(F.col("url").contains("-0")).limit(1).collect()[0]
    assert html_row.page == 1
    assert html_row.spans[0].x0 is None


def test_lineage_and_resume(spark, pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job_out"))
    n_buckets = 8
    # partial run: only docs in buckets 0-3 (simulate a job killed mid-way)
    part = with_bucket(pages, n_buckets).filter(F.col("bucket") < 4).drop("bucket")
    r1 = run_with_lineage(spark, part, out, n_buckets=n_buckets)
    assert r1["processed_buckets"] == list(range(n_buckets))
    # corrupt the ledger: mark buckets >=4 as never-done by rewriting lineage
    lin = spark.read.parquet(out + "/lineage").filter(F.col("bucket") < 4)
    lin.write.mode("overwrite").parquet(out + "/lineage_tmp")
    shutil.rmtree(out + "/lineage")
    shutil.move(out + "/lineage_tmp", out + "/lineage")
    assert pending_buckets(spark, n_buckets, out + "/lineage") == [4, 5, 6, 7]
    # resume with the FULL input: only buckets 4-7 get processed
    r2 = run_with_lineage(spark, pages, out, n_buckets=n_buckets)
    assert r2["processed_buckets"] == [4, 5, 6, 7]
    # final table is complete and byte-identical to a clean full run
    final = spark.read.parquet(out + "/extracted")
    assert final.count() == N_DOCS
    clean = extracted_table(extract(pages))
    diff = (final.select("url", "text").exceptAll(clean.select("url", "text")))
    assert diff.isEmpty()
    # third run: nothing pending
    r3 = run_with_lineage(spark, pages, out, n_buckets=n_buckets)
    assert r3["processed_buckets"] == []


def test_lineage_checksum_order_independent(spark, pages):
    from no_ocr_spark.plans.lineage import lineage_rollup

    ext = with_bucket(extract(pages), 4).select("bucket", "url", "text", "n_chars")
    c1 = {r.bucket: r.checksum for r in lineage_rollup(ext.repartition(2)).collect()}
    c2 = {r.bucket: r.checksum for r in lineage_rollup(ext.repartition(13)).collect()}
    assert c1 == c2 and len(c1) == 4
