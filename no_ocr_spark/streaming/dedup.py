"""Streaming deduplication: drop re-crawled duplicates as pages ARRIVE,
before they ever reach storage — the streaming-ingest counterpart of the
batch dedup family (operators/dedup.py).

Two idiomatic Structured Streaming realizations:

* ``stream_dedup_within_watermark`` — `dropDuplicatesWithinWatermark` on
  the content key: state for a key is held only until the event-time
  watermark passes it, so state size is bounded by (arrival rate x
  watermark horizon) instead of growing with the corpus — the property
  that keeps a year-long 100 TB ingest from accumulating unbounded state.
  Duplicates arriving WITHIN the horizon (the common re-crawl/retry case)
  are dropped; a re-crawl after the horizon re-admits the url, which is
  exactly the CommonCrawl refresh semantic (a months-later fetch is a new
  snapshot, not a dupe).

* ``stream_dedup_exact`` — `dropDuplicates` on the key with no watermark:
  exact forever-dedup, state grows with distinct keys (documented
  trade-off; use the watermarked form at scale).

Both key on ``(xxhash64(url), xxhash64(url, content))`` so the state store
holds 16 bytes of key — never the document, never the raw url string —
the same 8-byte-shuffle-key discipline as batch dedup_exact."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(pages: DataFrame) -> DataFrame:
    # state key = (url hash, content hash): 16 bytes per distinct key in
    # the state store — neither the fat html column nor the raw url string
    # enters state
    return pages.withColumn("url_key", F.xxhash64("url")).withColumn(
        "content_key", F.xxhash64("url", "html")
    )


def stream_dedup_within_watermark(
    pages_stream: DataFrame,
    event_time_col: str = "warc_ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates of a key arriving within
    `horizon` of each other (event time) are dropped; state older than the
    watermark is evicted."""
    return (
        _keyed(pages_stream)
        .withWatermark(event_time_col, horizon)
        .dropDuplicatesWithinWatermark(["url_key", "content_key"])
        .drop("url_key", "content_key")
    )


def stream_dedup_exact(pages_stream: DataFrame) -> DataFrame:
    """Unbounded-state exact streaming dedup (first arrival wins forever).
    State grows with distinct keys — prefer the watermarked form at
    corpus scale."""
    return (
        _keyed(pages_stream)
        .dropDuplicates(["url_key", "content_key"])
        .drop("url_key", "content_key")
    )
