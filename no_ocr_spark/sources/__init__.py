"""Table sources: driver-provided parquet tables + the deterministic
synthetic Common-Crawl-style `pages` corpus (FIXTURES.md A1)."""

from no_ocr_spark.sources.tables import load_table, load_tables  # noqa: F401
