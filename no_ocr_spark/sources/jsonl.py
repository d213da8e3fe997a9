"""Gzip JSONL training-data shards — the de-facto interchange artifact
for LLM corpora (Dolma's `documents/*.jsonl.gz` spec, RedPajama,
FineWeb's jsonl exports all ship this shape: one JSON object per line
with `id` / `text` / `source` / `metadata` fields).

The reference materializes curated text into its store
(`no-ocr-api/np_ocr/data.py` rows into LanceDB); at training-pipeline
scale the handoff artifact between curation and the trainer's data
loader is sharded JSONL. This completes the artifact family next to
WARC/WET/WAT (crawl side) and parquet/snapshot tables (warehouse side):

  * `docs_to_jsonl` — sink on the shared `write_member_parts` writer
    (one `part-N.jsonl[.gz]` per partition, PER-RECORD gzip members so
    any line is range-fetchable independently, hidden attempt-unique
    temp names + atomic rename, pyarrow.fs seam). Serialization is
    CANONICAL: sorted keys, compact separators, ensure_ascii=False,
    exactly one trailing `\\n` — byte-deterministic for a given row, so
    shard digests are reproducible across runs and partitionings.
  * `docs_from_jsonl` — the Spark-FIRST read path: the NATIVE JVM json
    source with an EXPLICIT schema (`spark.read.schema(...).json`) —
    zero Python in the scan, no inference pass, and Hadoop's gzip codec
    reads the concatenated per-record members as one stream (verified
    empirically; multi-member gzip is part of RFC 1952).

Scale: the sink never shuffles (it writes the upstream partitioning);
the source parallelizes per file. gzip is NOT splittable — one shard =
one task — so shard size is the parallelism knob exactly as in
published pipelines (Dolma caps shards near 1 GiB for this reason);
`coalesce`/`repartition` upstream of the sink is the control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from no_ocr_spark.sources.warc import write_member_parts

# Dolma-style document shape; metadata is a typed struct (not a free
# map) so the native reader needs no inference and Catalyst can prune
# `metadata.*` subfields at the scan.
JSONL_DOC_SCHEMA = (
    "id string, text string, source string, "
    "metadata struct<lang: string, n_chars: bigint>"
)


def docs_to_jsonl(df: DataFrame, out_dir: str,
                  compress: bool = True) -> list[dict]:
    """(id, text, source, metadata{lang, n_chars}) rows -> one
    `part-N.jsonl[.gz]` per partition. Returns [{file, n_records,
    n_bytes}] (executor-collected manifest)."""
    import json

    def row_bytes(r) -> bytes:
        meta = r["metadata"]
        obj = {
            "id": r["id"],
            "metadata": {
                "lang": None if meta is None else meta["lang"],
                "n_chars": None if meta is None else meta["n_chars"],
            },
            "source": r["source"],
            "text": r["text"] if r["text"] is not None else "",
        }
        return (json.dumps(obj, sort_keys=True, ensure_ascii=False,
                           separators=(",", ":")) + "\n").encode("utf-8")

    return write_member_parts(
        df.select("id", "text", "source", "metadata"), out_dir, ".jsonl",
        row_bytes, compress=compress,
    )


def docs_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Shard directory -> typed DataFrame via the native JVM json source
    (explicit schema: no inference scan, no Python). Corrupt lines
    surface as all-null rows under the default PERMISSIVE mode; pass
    the result through `.where(col("id").isNotNull())` or set
    mode=FAILFAST upstream if the pipeline wants hard errors."""
    return (
        spark.read.schema(JSONL_DOC_SCHEMA)
        .option("pathGlobFilter", "part-*.jsonl*")
        .json(path)
    )


def documents_as_jsonl_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table in Dolma shard shape (deterministic id =
    '<source>/<doc_id>')."""
    from no_ocr_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select(
        F.concat_ws("/", "source", "doc_id").alias("id"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "source",
        F.struct(F.col("lang"), F.col("n_chars")).alias("metadata"),
    )
