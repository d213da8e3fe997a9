"""WET extracted-text artifact: the crawl-side OUTPUT format of an
extraction pipeline (Common Crawl publishes exactly this next to each
WARC segment — `*.warc.wet.gz` files of `WARC-Type: conversion`
records whose payload is the extracted plain text; the layout is the
public IIPC/Common-Crawl convention on top of ISO 28500 WARC framing).

The reference materializes extracted text as rows in its store
(`no-ocr-api/np_ocr/data.py` writes per-page text into LanceDB); at
crawl scale the interchange artifact for the same content is WET.
This module completes the engine's archive family — WARC in/out
(`sources/warc.py`), CDX index (`operators/cdx.py`), WET out/in (here):

  * `build_wet` — deterministic writer: one leading `warcinfo` record
    (what real WET files carry) + one `conversion` record per document,
    UTF-8 payloads, Content-Length framed (binary-safe: text containing
    CRLFs or even "WARC/1.0" bytes round-trips exactly).
  * `parse_wet` — reader: conversion records -> [{url, warc_ts, text}],
    warcinfo skipped, shared framing walker with the WARC reader
    (`iter_warc_records` — one framing implementation in the repo).
  * `texts_to_wet` — Spark sink, same discipline as `pages_to_warc`:
    one `part-N.warc.wet[.gz]` per partition, PER-RECORD gzip members
    (any record range-fetchable independently), hidden attempt-unique
    temp names + atomic rename, stale-part cleanup, pyarrow.fs seam
    (local/hdfs/s3), executor-collected manifest.
  * `texts_from_wet` — Spark source: binaryFile (one file = one task,
    the natural crawl-segment parallel unit) -> Arrow-batched record
    explosion, zero row-Python.

Scale: WET payloads are ~5-10x smaller than their WARC html; a
10^12-doc crawl's WET leg is ~10^5-10^6 files — the same
beyond-linear file parallelism as the WARC leg, and the sink never
shuffles (it writes whatever partitioning the extraction output
already has).
"""

from __future__ import annotations

import datetime as dt
import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from no_ocr_spark.sources.warc import (
    _CRLF,
    _warc_fs,
    iter_warc_records,
    parse_warc_date,
)

WET_TEXTS_SCHEMA = "url string, warc_ts timestamp, text string"

_EPOCH = dt.datetime(1970, 1, 1)


def _warcinfo(filename: str) -> bytes:
    body = (
        b"software: no-ocr-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conformsTo: ISO 28500\r\n"
    )
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Filename: " + filename.encode() + _CRLF +
        b"WARC-Date: 1970-01-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(body)).encode() + _CRLF +
        _CRLF + body + _CRLF * 2
    )


def build_wet(records: list[dict], filename: str = "part.warc.wet",
              warcinfo: bool = True) -> bytes:
    """records: [{url, date (datetime), text (str)}] -> WET bytes
    (uncompressed; the sink gzips per record member)."""
    out = bytearray()
    if warcinfo:
        out += _warcinfo(filename)
    for rec in records:
        payload = rec["text"].encode("utf-8")
        date = (rec["date"] or _EPOCH).strftime("%Y-%m-%dT%H:%M:%SZ")
        out += (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + rec["url"].encode() + _CRLF +
            b"WARC-Date: " + date.encode() + _CRLF +
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF +
            _CRLF + payload + _CRLF * 2
        )
    return bytes(out)


def parse_wet(data: bytes) -> list[dict]:
    """WET bytes -> [{url, warc_ts, text}] for conversion records
    (warcinfo and any other record types skipped)."""
    out: list[dict] = []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "conversion":
            continue
        out.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": parse_warc_date(headers),
            "text": block.decode("utf-8"),
        })
    return out


def _explode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, texts = [], [], []
        for content in pdf["content"]:
            for rec in parse_wet(bytes(content)):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                texts.append(rec["text"])
        yield pd.DataFrame({"url": urls, "warc_ts": tss, "text": texts})


def texts_from_wet(spark: SparkSession, path: str,
                   glob: str = "*.wet*") -> DataFrame:
    """Directory of WET files -> (url, warc_ts, text) DataFrame."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_explode_batches, schema=WET_TEXTS_SCHEMA)


def texts_to_wet(df: DataFrame, out_dir: str,
                 compress: bool = True) -> list[dict]:
    """Extracted-text sink: (url, warc_ts, text) rows -> one
    `part-N.warc.wet[.gz]` per partition. Compressed output is
    per-record gzip members with the warcinfo record as its own leading
    member (Common Crawl's convention), so the file is one valid
    .wet.gz AND every record inflates independently. Same crash/retry
    discipline as `pages_to_warc`: stale-part cleanup, hidden
    attempt-unique temp names, atomic rename, pyarrow.fs chokepoint.
    Returns [{file, n_records, n_bytes}]."""
    import posixpath
    import uuid

    from pyarrow import fs as pafs

    fs_d, root = _warc_fs(out_dir)
    fs_d.create_dir(root, recursive=True)
    for info in fs_d.get_file_info(pafs.FileSelector(root)):
        name = info.base_name
        if name.startswith(("part-", ".part-")) and ".wet" in name:
            fs_d.delete_file(info.path)

    def write_partition(idx: int, rows: Iterator) -> Iterator[dict]:
        fs_e, rt = _warc_fs(out_dir)
        name = f"part-{idx:05d}.warc.wet" + (".gz" if compress else "")
        final = posixpath.join(rt, name)
        tmp = posixpath.join(
            rt, f".{name}.{uuid.uuid4().hex[:12]}.inprogress"
        )
        n = 0
        with fs_e.open_output_stream(tmp) as f:
            info_rec = _warcinfo(name)
            f.write(gzip.compress(info_rec, mtime=0) if compress
                    else info_rec)
            for r in rows:
                rec = build_wet([{
                    "url": r["url"],
                    "date": r["warc_ts"],
                    "text": r["text"] if r["text"] is not None else "",
                }], warcinfo=False)
                f.write(gzip.compress(rec, mtime=0) if compress else rec)
                n += 1
        if n == 0:
            fs_e.delete_file(tmp)
            return iter(())
        fs_e.move(tmp, final)
        return iter([{"file": name, "n_records": n,
                      "n_bytes": fs_e.get_file_info(final).size}])

    manifest = (
        df.select("url", "warc_ts", "text")
        .rdd.mapPartitionsWithIndex(write_partition)
        .collect()
    )
    return sorted(manifest, key=lambda m: m["file"])
