"""Property tests for the web-curation operators: canonicalization must be
IDEMPOTENT (canon(canon(u)) == canon(u)) — the invariant that lets a
pipeline re-canonicalize already-clean URLs without churn — and line_dedup
must be a FIXPOINT on its own output (re-deduping removes nothing)."""

import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from no_ocr_spark.operators.webops import _canon_chain

_scheme = st.sampled_from(["http://", "https://", "HTTPS://", "HtTp://"])
_host = st.sampled_from(
    ["www.Example.COM", "example.com", "WWW.sub.site.org", "a.b"]
)
_port = st.sampled_from(["", ":443", ":80", ":8080"])
_path = st.sampled_from(["", "/", "/Docs/X", "/p/q"])
_query = st.sampled_from(
    ["", "?id=1", "?utm_source=x", "?utm_a=1&id=2", "?id=3&utm_b=z&k=v",
     # names/values merely CONTAINING utm_ must survive untouched
     "?xutm_y=2&k=v", "?a=butm_c&k=v", "?xutm_a=1&utm_b=2",
     # runs of consecutive utm params (leading, trailing, both)
     "?utm_a=1&utm_b=2&k=v", "?utm_a=1&utm_b=2", "?k=v&utm_a=1&utm_b=2",
     "?utm_a=1&k=v&utm_b=2&utm_c=3"]
)
_frag = st.sampled_from(["", "#f", "#sec-2"])


def _canon_duck(con, url: str) -> str:
    return con.execute(
        f"SELECT {_canon_chain('duckdb', 'u')} FROM (SELECT ? AS u)", [url]
    ).fetchone()[0]


@settings(max_examples=200, deadline=None)
@given(_scheme, _host, _port, _path, _query, _frag)
def test_url_canonicalization_idempotent(sch, host, port, path, query, frag):
    url = f"{sch}{host}{port}{path}{query}{frag}"
    con = duckdb.connect()
    con.execute("SET threads=1")
    once = _canon_duck(con, url)
    twice = _canon_duck(con, once)
    assert twice == once, (url, once, twice)
    # invariants of the canonical form
    assert "#" not in once
    # only DELIMITER-ANCHORED utm params are tracking params; a name or
    # value containing 'utm_' as a substring must survive
    assert not re.search(r"[?&]utm_", once), (url, once)
    assert not once.endswith(("?", "&"))


def test_utm_strip_is_anchored_and_lossless():
    """The round-3 regex deleted 'xutm_y=2&' entirely and fused 'x' onto
    the next param (canon -> '?xk=v'). Anchored form keeps it."""
    con = duckdb.connect()
    con.execute("SET threads=1")
    cases = {
        "http://a.b/p?xutm_y=2&k=v": "http://a.b/p?xutm_y=2&k=v",
        "http://a.b/p?utm_a=1&utm_b=2&k=v": "http://a.b/p?k=v",
        "http://a.b/p?utm_a=1&utm_b=2": "http://a.b/p",
        "http://a.b/p?k=v&utm_a=1&utm_b=2": "http://a.b/p?k=v",
        "http://a.b/p?a=butm_c": "http://a.b/p?a=butm_c",
        "http://a.b/p?utm_only=1": "http://a.b/p",
    }
    for url, want in cases.items():
        assert _canon_duck(con, url) == want, url


def test_line_dedup_is_fixpoint_on_own_output(spark, sf_dir):
    """Running line_dedup over already-deduped docs removes nothing:
    every non-final chunk is exactly 10 words, so re-assembling kept
    chunks and re-chunking reproduces them byte-identically (a kept final
    short chunk is always last in the re-assembly) — and survivors are
    globally unique by construction, so a second dedup pass is the
    identity."""
    from pyspark.sql import functions as F

    from no_ocr_spark.operators.repetition import _chunks_expr, q_line_dedup

    clean = q_line_dedup(spark, sf_dir).filter(F.col("kept_lines") > 0)
    rechunked = (
        clean.select("doc_id", F.col("clean_text").alias("text"),
                     "kept_lines")
        .withColumn("w", F.expr("split(text, ' ')"))
        .select("doc_id", "kept_lines",
                F.posexplode(F.expr(_chunks_expr())).alias("i", "line"))
    )
    # re-chunking reproduces exactly kept_lines chunks per doc
    counts = rechunked.groupBy("doc_id", "kept_lines").agg(
        F.count("*").alias("n")
    )
    assert counts.filter(F.col("n") != F.col("kept_lines")).count() == 0
    # and every re-derived chunk is globally unique -> second pass keeps all
    assert (
        rechunked.groupBy("line").agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1).count()
    ) == 0
