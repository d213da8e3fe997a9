"""Deterministic synthetic Common-Crawl-style `pages` corpus (FIXTURES.md A1).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties engineered in:
  * Zipf-skewed host distribution — exercises the skew-salting path
    (SURVEY.md §4 item 1).
  * Templated HTML: nav / header / footer / sidebar boilerplate + main
    article blocks + link farms, so the boilerplate classifier has real work.
  * A deterministic fraction of rows carry PDF bytes (the reference's actual
    input medium, `no-ocr-api/np_ocr/data.py:14`) built by
    extract.pdf.build_pdf.
  * `text` = WET-style full visible text (boilerplate included), distinct
    from the extractor's main-content output.

Determinism: every row is a pure function of (seed, doc_id) — per-row
`random.Random(f"{seed}:{doc_id}")` — so generation order, partitioning, and
parallelism cannot change any byte. CPython's Mersenne-Twister and the
`random` methods used here are stable across versions.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

from no_ocr_spark.extract.pdf import build_pdf

N_HOSTS = 200
PDF_EVERY = 40  # 1 in 40 docs is a PDF (2.5%)

_SYLLABLES = [
    "ka", "to", "mi", "ra", "sen", "dor", "vel", "un", "pra", "sto",
    "len", "gar", "nu", "bel", "tri", "mon", "fi", "zer", "qua", "lix",
]

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "auf", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "de", "un", "est", "dans", "pour", "que"],
}
LANGS = ["en", "en", "en", "de", "fr"]  # en-heavy mix


def _zipf_cdf(n: int) -> list[float]:
    weights = [1.0 / (i + 1) for i in range(n)]
    total = sum(weights)
    acc = 0.0
    cdf = []
    for w in weights:
        acc += w / total
        cdf.append(acc)
    return cdf


_HOST_CDF = _zipf_cdf(N_HOSTS)


def _pick_host(rng: random.Random) -> str:
    r = rng.random()
    lo, hi = 0, N_HOSTS - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _HOST_CDF[mid] < r:
            lo = mid + 1
        else:
            hi = mid
    return f"host{lo:04d}.example.org"


def _word(rng: random.Random) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))


def _sentence(rng: random.Random, stop: list[str], n_words: int) -> str:
    words = []
    for i in range(n_words):
        w = rng.choice(stop) if rng.random() < 0.35 else _word(rng)
        words.append(w.capitalize() if i == 0 else w)
    return " ".join(words) + "."


def _paragraph(rng: random.Random, stop: list[str]) -> str:
    return " ".join(
        _sentence(rng, stop, rng.randint(6, 18))
        for _ in range(rng.randint(2, 6))
    )


def make_page(seed: int, doc_id: int) -> dict:
    """Pure function (seed, doc_id) -> pages row."""
    rng = random.Random(f"{seed}:{doc_id}")
    host = _pick_host(rng)
    lang = rng.choice(LANGS)
    stop = _STOPWORDS[lang]
    path = "/".join(_word(rng) for _ in range(rng.randint(1, 3)))
    url = f"https://{host}/{path}-{doc_id}"
    warc_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=doc_id * 37 % 31_536_000
    )

    if doc_id % PDF_EVERY == PDF_EVERY - 1:
        n_pages = rng.randint(1, 4)
        pages = []
        for _ in range(n_pages):
            lines = [
                _sentence(rng, stop, rng.randint(4, 9))
                for _ in range(rng.randint(5, 15))
            ]
            pages.append(lines)
        # rotate writer styles so the corpus exercises every parser path
        # (TJ array shows with kerning, ' next-line shows, page-tree
        # ordering with reversed object order, /Differences-encoded bytes,
        # AES-128/V4 and AES-256/V5-R6 Standard-security encryption) —
        # all seven styles extract BYTE-IDENTICAL text+spans, so goldens
        # and cross-style checksums are invariant. Keyed on the PDF
        # ORDINAL (doc_id // PDF_EVERY), NOT doc_id: PDFs occur at
        # doc_id % 40 == 39, and doc_id % k for k sharing a factor with
        # 40 only ever hits a subset of residues (with the old % 5 every
        # corpus PDF landed on one style) — the correlated-moduli trap.
        # The aesv3 docs share ONE deterministic security dictionary
        # (what a single crawl source re-encrypting with one tool
        # produces), so the ~0.7s/distinct-salt hardened hash
        # (Algorithm 2.B, _hash_2b) runs once per Python worker, not per
        # document — per-distinct-file cost disclosed in BENCH/BASELINE.md.
        style = ["tj", "tj_arr", "quote", "reversed", "encoded",
                 "aesv2", "aesv3"][(doc_id // PDF_EVERY) % 7]
        payload = build_pdf(pages, style=style)
        wet_text = "\n".join("\n".join(p) for p in pages)
        return {"url": url, "warc_ts": warc_ts, "html": payload,
                "text": wet_text, "lang": lang}

    site = _word(rng).capitalize()
    title = _sentence(rng, stop, rng.randint(3, 8)).rstrip(".")
    nav_links = [(_word(rng), f"/{_word(rng)}") for _ in range(rng.randint(4, 9))]
    related = [(_sentence(rng, stop, rng.randint(2, 5)).rstrip("."), f"/{_word(rng)}")
               for _ in range(rng.randint(3, 8))]
    paras = [_paragraph(rng, stop) for _ in range(rng.randint(3, 10))]
    footer_links = [(_word(rng), f"/{_word(rng)}") for _ in range(rng.randint(3, 6))]
    copyright_ = f"(c) 2024 {site} inc. All rights reserved."

    html_parts = [
        "<!DOCTYPE html>",
        f'<html lang="{lang}"><head><meta charset="utf-8">',
        f"<title>{title} - {site}</title>",
        "<style>body{margin:0}</style>",
        '<script>var x = "<div>not text</div>";</script>',
        "</head><body>",
        '<header><div class="logo">' + site + "</div>",
        "<nav><ul>",
    ]
    for label, href in nav_links:
        html_parts.append(f'<li><a href="{href}">{label}</a></li>')
    html_parts.append("</ul></nav></header>")
    html_parts.append("<main><article>")
    html_parts.append(f"<h1>{title}</h1>")
    for p in paras:
        html_parts.append(f"<p>{p}</p>")
    html_parts.append("</article></main>")
    html_parts.append('<aside><h3>Related</h3><ul>')
    for label, href in related:
        html_parts.append(f'<li><a href="{href}">{label}</a></li>')
    html_parts.append("</ul></aside>")
    html_parts.append("<footer><ul>")
    for label, href in footer_links:
        html_parts.append(f'<li><a href="{href}">{label}</a></li>')
    html_parts.append(f"</ul><p>{copyright_}</p></footer>")
    html_parts.append("</body></html>")
    html = "\n".join(html_parts)

    wet_parts = [site] + [l for l, _ in nav_links] + [title] + paras
    wet_parts += [l for l, _ in related] + [l for l, _ in footer_links]
    wet_parts.append(copyright_)
    wet_text = "\n".join(wet_parts)

    return {"url": url, "warc_ts": warc_ts, "html": html.encode("utf-8"),
            "text": wet_text, "lang": lang}


def gen_pages(n_docs: int, seed: int = 42) -> Iterator[dict]:
    for doc_id in range(n_docs):
        yield make_page(seed, doc_id)


SF_DOCS = {0.001: 500, 0.01: 5_000, 0.1: 50_000}


def n_docs_for_sf(sf: float) -> int:
    return SF_DOCS.get(sf, max(1, int(500_000 * sf)))
