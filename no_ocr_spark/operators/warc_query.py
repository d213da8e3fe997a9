"""WARC sink round-trip as an oracle-checked query (extras registry).

The sink (`sources/warc.py pages_to_warc`) was pytest-only evidence; this
query runs the full sink -> source cycle inside the parity harness: derive
the pages corpus, WRITE it through the per-record-gzip WARC sink (atomic
rename, pyarrow.fs seam), read the archives back through `pages_from_warc`
(binaryFile scan -> Arrow-batched record framing), and emit a per-url
verdict comparing xxhash64(html) and warc_ts before/after. The DuckDB
oracle pins the row set and the all-true verdict columns — a red row means
either a lost/duplicated record or a corrupted payload.

Like merge_upsert_read, this query deliberately RUNS the write at compose
time (it exercises a writer; it is not a plan-builder) and reads back
lazily from a per-invocation temp dir.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from no_ocr_spark.operators.extraction_queries import pages_from_documents
from no_ocr_spark.sources.tables import load_table
from no_ocr_spark.sources.warc import pages_from_warc, pages_to_warc


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir).select(
        "url", "warc_ts", "html"
    )
    # DETERMINISTIC per-sf dir, not a fresh mkdtemp per compose: the sink
    # clears stale parts itself, so repeated invocations overwrite one
    # corpus copy instead of accumulating copies in /tmp (tmpfs = RAM on
    # the sandbox) across parity/audit/bench loops
    out = os.path.join(tempfile.gettempdir(), "no_ocr_warc_gate",
                       os.path.basename(sf_dir.rstrip("/")))
    pages_to_warc(pages, out, compress=True)
    back = pages_from_warc(spark, out).select(
        "url",
        F.col("warc_ts").alias("ts_back"),
        F.xxhash64("html").alias("h_back"),
    )
    src = pages.select(
        "url",
        F.col("warc_ts").alias("ts_src"),
        F.xxhash64("html").alias("h_src"),
    )
    return (
        src.join(back, "url", "full")
        .select(
            "url",
            (F.col("h_back") == F.col("h_src")).alias("payload_ok"),
            # WARC-Date carries second resolution; the source ts is
            # second-aligned by construction, so equality is exact
            (F.col("ts_back") == F.col("ts_src")).alias("ts_ok"),
        )
    )


def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET artifact round trip (sources/wet.py): documents -> extracted-
    text rows -> per-record-gzip WET sink -> binaryFile WET source ->
    per-url verdict. The oracle pins every url, the exact UTF-8 text
    digest, and ts equality — so a lost record, a warcinfo mis-skip, or
    any byte drift in the Content-Length-framed payload goes red. The
    per-row ts (epoch-2024 + doc_id seconds) exercises real date
    round-tripping through the WARC-Date header, not one constant."""
    from no_ocr_spark.sources.wet import texts_from_wet, texts_to_wet

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/doc-"), F.col("doc_id")).alias("url"),
        F.expr("timestamp'2024-01-01 00:00:00' "
               "+ make_interval(0, 0, 0, 0, 0, 0, doc_id)").alias("warc_ts"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    out = os.path.join(tempfile.gettempdir(), "no_ocr_wet_gate",
                       os.path.basename(sf_dir.rstrip("/")))
    texts_to_wet(docs, out, compress=True)
    back = texts_from_wet(spark, out).select(
        "url",
        F.col("warc_ts").alias("ts_back"),
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5"),
    )
    src = docs.select("url", F.col("warc_ts").alias("ts_src"))
    return (
        src.join(back, "url", "full")
        .select(
            "url", "text_md5",
            (F.col("ts_back") == F.col("ts_src")).alias("ts_ok"),
        )
    )


QUERIES = {"warc_roundtrip": q_warc_roundtrip,
           "wet_roundtrip": q_wet_roundtrip}

ORACLES = {
    "warc_roundtrip": """
        SELECT 'https://' || source || '.example.org/doc-'
                   || doc_id::VARCHAR AS url,
               true AS payload_ok,
               true AS ts_ok
        FROM documents
    """,
    "wet_roundtrip": """
        SELECT 'https://' || source || '.example.org/doc-'
                   || doc_id::VARCHAR AS url,
               md5(coalesce(text, '')) AS text_md5,
               true AS ts_ok
        FROM documents
    """,
}
