"""Streaming/incremental ingest.

The reference has NO streaming operators (SURVEY.md §2.11) — its only
asynchrony is a FastAPI background task + client-side status polling
(`no-ocr-api/np_ocr/api.py:298`). The batch engine covers that with the
lineage table. This package adds the Spark-native *incremental ingest*
capability on top: new page files landing in a directory are extracted
exactly once, via Structured Streaming's file source + checkpointed
foreachBatch — the same extraction operator, zero code duplication.
"""

from no_ocr_spark.streaming.incremental import incremental_extract  # noqa: F401
