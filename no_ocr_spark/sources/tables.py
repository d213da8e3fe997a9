"""Loaders for the driver-provided parquet tables (TESTDATA.md) and the
synthesized `pages` table.

Catalog note (SURVEY.md §7 M3): the Iceberg runtime jar is not in this
environment, so tables are plain Parquet with identical schemas; the write
path goes through `write_table` below so swapping in
`df.writeTo("catalog.db.t")` (Iceberg) is a one-line change. Semantics
first, format second.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single write chokepoint — Parquet today, Iceberg when the runtime jar
    is on the classpath (`df.writeTo(...).createOrReplace()`)."""
    df.write.mode(mode).parquet(path)
