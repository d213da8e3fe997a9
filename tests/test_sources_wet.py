"""WET extracted-text artifact (sources/wet.py): framing round trips,
warcinfo handling, per-member gzip independence, and the Spark
sink -> source cycle. Exact per-url oracle grading of the full cycle is
tests/test_oracle_parity.py::wet_roundtrip."""

from __future__ import annotations

import datetime as dt
import gzip
import os
import zlib

from pyspark.sql import functions as F

from no_ocr_spark.sources.wet import (
    build_wet,
    parse_wet,
    texts_from_wet,
    texts_to_wet,
)

RECS = [
    {"url": "https://a.example.org/1",
     "date": dt.datetime(2024, 3, 1, 12, 0, 5),
     "text": "plain ascii text"},
    {"url": "https://b.example.org/2",
     "date": dt.datetime(2024, 3, 2, 0, 0, 0),
     # CRLFs, a fake record header, and non-ASCII inside the payload:
     # Content-Length framing must carry all of it byte-exactly
     "text": "line1\r\nWARC/1.0\r\nWARC-Type: response\r\né中文"},
    {"url": "https://c.example.org/3",
     "date": None,  # writer substitutes the epoch
     "text": ""},
]


def test_build_parse_roundtrip():
    data = build_wet(RECS, filename="t.warc.wet")
    back = parse_wet(data)
    assert [r["url"] for r in back] == [r["url"] for r in RECS]
    assert [r["text"] for r in back] == [r["text"] for r in RECS]
    assert back[0]["warc_ts"] == RECS[0]["date"]
    assert back[2]["warc_ts"] == dt.datetime(1970, 1, 1)


def test_warcinfo_is_present_but_skipped():
    data = build_wet(RECS[:1])
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    assert len(parse_wet(data)) == 1  # conversion records only


def test_spark_sink_source_roundtrip(spark, tmp_path):
    rows = [(r["url"], r["date"], r["text"]) for r in RECS]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).repartition(2)
    out = str(tmp_path / "wet")
    manifest = texts_to_wet(df, out, compress=True)
    assert sum(m["n_records"] for m in manifest) == 3
    back = texts_from_wet(spark, out).orderBy("url").collect()
    assert [r.url for r in back] == [r["url"] for r in RECS]
    assert [r.text for r in back] == [r["text"] for r in RECS]
    assert back[0].warc_ts == RECS[0]["date"]


def test_gzip_members_inflate_independently(spark, tmp_path):
    """Common Crawl convention: the first member of a .wet.gz is the
    warcinfo record alone; each subsequent member is exactly one
    conversion record — a range request can inflate any record without
    reading the rest of the file."""
    df = spark.createDataFrame(
        [(r["url"], r["date"], r["text"]) for r in RECS],
        "url string, warc_ts timestamp, text string",
    ).coalesce(1)
    out = str(tmp_path / "wet1")
    texts_to_wet(df, out, compress=True)
    path = os.path.join(out, next(
        f for f in os.listdir(out) if f.endswith(".wet.gz")
    ))
    raw = open(path, "rb").read()
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(raw)
    assert first.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    d2 = zlib.decompressobj(wbits=31)
    second = d2.decompress(d.unused_data)
    recs = parse_wet(second)
    assert len(recs) == 1  # exactly one record per member
    # and the whole file is still one valid gzip stream
    assert len(parse_wet(gzip.decompress(raw))) == 3


def test_rerun_clears_stale_parts(spark, tmp_path):
    df3 = spark.createDataFrame(
        [(r["url"], r["date"], r["text"]) for r in RECS],
        "url string, warc_ts timestamp, text string",
    )
    out = str(tmp_path / "wet2")
    texts_to_wet(df3.repartition(3), out)
    texts_to_wet(df3.coalesce(1), out)  # fewer partitions on re-run
    back = texts_from_wet(spark, out)
    assert back.count() == 3  # no orphaned part files double rows
    assert back.select(F.countDistinct("url")).collect()[0][0] == 3
