"""WARC revisit records (sources/warc_revisit.py): record grammar,
canonical selection, resolution, and the storage saving that is the
operator's reason to exist. Full-cycle oracle grading is
tests/test_oracle_parity.py::warc_revisit_roundtrip."""

from __future__ import annotations

import datetime as dt
import gzip

from no_ocr_spark.sources.warc import iter_warc_records
from no_ocr_spark.sources.warc_revisit import (
    REVISIT_PROFILE,
    pages_from_warc_resolved,
    pages_to_warc_dedup,
)

def _blob(seed: bytes, n_chunks: int = 128) -> bytes:
    """Deterministic INCOMPRESSIBLE payload (sha256 chain) — a gzip-
    friendly payload would hide the storage saving under header cost."""
    import hashlib

    out, h = b"", seed
    for _ in range(n_chunks):
        h = hashlib.sha256(h).digest()
        out += h
    return b"<html>" + out + b"</html>"


ROWS = [
    ("https://a.example/1", dt.datetime(2024, 3, 1), _blob(b"A")),
    ("https://b.example/2", dt.datetime(2024, 3, 5), _blob(b"A")),
    ("https://c.example/3", dt.datetime(2024, 3, 2), _blob(b"A")),
    ("https://d.example/4", dt.datetime(2024, 3, 1), _blob(b"B")),
]


def _write(spark, tmp_path, compress=True):
    df = spark.createDataFrame(
        ROWS, "url string, warc_ts timestamp, html binary").repartition(2)
    out = str(tmp_path / "warc")
    manifest = pages_to_warc_dedup(df, out, compress=compress)
    return out, manifest


def test_records_and_grammar(spark, tmp_path):
    out, manifest = _write(spark, tmp_path)
    assert sum(m["n_records"] for m in manifest) == 4
    recs = []
    import os

    for f in sorted(os.listdir(out)):
        data = gzip.decompress(open(os.path.join(out, f), "rb").read())
        recs += list(iter_warc_records(data))
    by_type: dict[str, list] = {}
    for h, block in recs:
        by_type.setdefault(h["warc-type"], []).append((h, block))
    # earliest capture of the duplicate payload is the one response
    assert len(by_type["response"]) == 2
    assert len(by_type["revisit"]) == 2
    for h, block in by_type["revisit"]:
        assert h["warc-profile"] == REVISIT_PROFILE
        assert h["content-length"] == "0" and block == b""
        assert h["warc-refers-to-target-uri"] == "https://a.example/1"
        assert h["warc-payload-digest"].startswith("sha1:")
    # the FRAME WALKER recovered every record (the r5 one-CRLF-short bug
    # made the record after a revisit unparseable)
    assert len(recs) == 4


def test_resolution_and_storage_saving(spark, tmp_path):
    out, manifest = _write(spark, tmp_path)
    back = {r.url: r for r in pages_from_warc_resolved(spark, out).collect()}
    assert set(back) == {u for u, _, _ in ROWS}
    for url, ts, html in ROWS:
        assert bytes(back[url].html) == html, url
        assert back[url].warc_ts == ts
    assert not back["https://a.example/1"].was_revisit   # earliest wins
    assert back["https://b.example/2"].was_revisit
    assert back["https://c.example/3"].was_revisit
    assert not back["https://d.example/4"].was_revisit
    # the dedup sink stores the fat payload once: smaller than the plain
    # sink on the same rows
    from no_ocr_spark.sources.warc import pages_to_warc

    df = spark.createDataFrame(
        ROWS, "url string, warc_ts timestamp, html binary")
    plain = pages_to_warc(df, str(tmp_path / "plain"), compress=True)
    assert (sum(m["n_bytes"] for m in manifest)
            < 0.7 * sum(m["n_bytes"] for m in plain))
