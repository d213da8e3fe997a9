"""Gzip JSONL training shards (sources/jsonl.py): canonical-byte
determinism, per-member gzip independence, null/non-ASCII fidelity
through the native reader, and permissive corrupt-line behavior. Exact
per-id oracle grading of the full cycle is
tests/test_oracle_parity.py::jsonl_roundtrip."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from no_ocr_spark.sources.jsonl import (
    JSONL_DOC_SCHEMA,
    docs_from_jsonl,
    docs_to_jsonl,
)

ROWS = [
    ("web/1", "plain ascii text", "web", ("en", 16)),
    # non-ASCII must survive ensure_ascii=False encode -> native decode
    ("web/2", "é中文 — dash\ttab", "web", ("zh", 14)),
    # null text coalesces to ""; null metadata subfields round-trip
    ("books/3", None, "books", (None, None)),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t, s, m) for i, t, s, m in ROWS], JSONL_DOC_SCHEMA
    )


def test_sink_bytes_are_canonical_and_member_independent(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = docs_to_jsonl(_df(spark).coalesce(1), out, compress=True)
    assert sum(m["n_records"] for m in manifest) == 3
    (path,) = [os.path.join(out, f) for f in os.listdir(out)
               if f.startswith("part-")]
    raw = open(path, "rb").read()
    # every line is its own gzip member: the FIRST member alone inflates
    # to exactly one complete JSON line
    d = gzip.zlib.decompressobj(16 + gzip.zlib.MAX_WBITS)
    first = d.decompress(raw)
    assert first.endswith(b"\n") and first.count(b"\n") == 1
    # canonical serialization: sorted keys, compact, non-ASCII literal
    lines = gzip.decompress(raw).decode("utf-8").splitlines()
    objs = {json.loads(ln)["id"]: ln for ln in lines}
    assert '"id":"web/2"' in objs["web/2"]      # compact separators
    assert "中文" in objs["web/2"]               # ensure_ascii=False
    assert list(json.loads(objs["web/1"])) == sorted(
        json.loads(objs["web/1"]))               # sorted keys


def test_roundtrip_fidelity_including_nulls(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs_to_jsonl(_df(spark).repartition(2), out, compress=True)
    back = {r.id: r for r in docs_from_jsonl(spark, out).collect()}
    assert set(back) == {"web/1", "web/2", "books/3"}
    assert back["web/2"].text == "é中文 — dash\ttab"
    assert back["web/2"].metadata.lang == "zh"
    assert back["books/3"].text == ""            # writer coalesces null
    assert back["books/3"].metadata.lang is None
    assert back["books/3"].metadata.n_chars is None


def test_native_reader_prunes_and_is_permissive(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs_to_jsonl(_df(spark), out, compress=True)
    # corrupt line in its own shard file: PERMISSIVE mode yields an
    # all-null row instead of failing the scan
    with open(os.path.join(out, "part-99999.jsonl"), "wb") as f:
        f.write(b'{"id": "broken"\n')
    df = docs_from_jsonl(spark, out)
    assert df.count() == 4
    assert df.where(F.col("id").isNotNull()).count() == 3
    # column pruning reaches the json scan (ReadSchema carries only the
    # selected top-level fields)
    plan = df.select("id")._jdf.queryExecution().executedPlan().toString()
    assert "struct<id:string>" in plan.replace(" ", "")


def test_rewrite_clears_stale_parts(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs_to_jsonl(_df(spark).repartition(4), out, compress=True)
    docs_to_jsonl(_df(spark).coalesce(1), out, compress=True)
    assert docs_from_jsonl(spark, out).count() == 3
