"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted inside Arrow-batched mapInPandas.

Reference analogue: the page-image binary column (JPEG bytes,
`no-ocr-api/np_ocr/data.py:25-27, 51-53`) and its thumbnail/base64
post-processing (`search.py:164-168`, `api.py:223-226`).

The image/audio codec libraries are not in this container, so the DECODE
step is a deterministic fake (clearly marked) — but every piece of Spark
plumbing is real and tested: binary column creation, Arrow transport of
bytes into pandas, batch-shaped UDF, typed metadata struct out. The fake is
arithmetic on the byte length, which makes the whole path ORACLE-CHECKABLE
in SQL — a stub with a correctness gate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from no_ocr_spark.sources.tables import load_table

_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, channels int, "
    "fmt string"
)


def fake_decode_image(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decoder (real decode needs PIL/ffmpeg — not in
    this container). Swap the body for PIL.Image.open when available; the
    signature, batching, and schema stay identical."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 64 + n % 512,
        "height": 64 + (n * 7) % 512,
        "channels": 3,
        "fmt": "fakeimg",
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [fake_decode_image(b) for b in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> binary payload column -> Arrow-batched 'decode' ->
    typed metadata. The oracle recomputes the fake's arithmetic in SQL —
    proving bytes survive the JVM->Arrow->pandas round trip intact."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(_decode_batches, schema=_META_SCHEMA)


QUERIES = {"multimodal_meta": q_multimodal_meta}

ORACLES = {
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text))::BIGINT AS n_bytes,
               (64 + octet_length(encode(text)) % 512)::INT AS width,
               (64 + (octet_length(encode(text)) * 7) % 512)::INT AS height,
               3::INT AS channels,
               'fakeimg' AS fmt
        FROM documents
    """,
}
