"""Regenerate the committed golden extraction fixtures (FIXTURES.md A2/A3).

Goldens pin the extractor's byte-level behavior: any change to tokenizer /
DOM rules / classifier thresholds / span geometry shows up as a golden
mismatch and requires an intentional regeneration in the same commit.

Usage: python scripts/gen_goldens.py
Writes: tests/goldens/golden_extract_sf0.001.jsonl.gz   (synth pages corpus)
        tests/goldens/golden_extract_docs_sf0.01.jsonl.gz   (driver documents
        -> doc_to_page -> extractor; DuckDB oracle source for the
        extract_documents / extract_host_stats contract queries)
        tests/goldens/golden_extract_spans_sf0.01.jsonl.gz  (ditto for
        extract_spans)

The sf0.01 goldens are computed by a PURE-PYTHON re-derivation (no Spark):
documents.parquet row -> doc_to_page (the same shared function the Spark
query uses) -> extract_document -> per-page span grouping replicating
spans_table's (block, line) ordering. The driver's DuckDB oracle then reads
these files, which makes the Spark orchestration (Arrow round trip,
mapInPandas batching, span re-nesting) independently checkable even though
the extractor itself is not SQL-expressible.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from no_ocr_spark.extract.api import extract_document  # noqa: E402
from no_ocr_spark.sources.synth import gen_pages  # noqa: E402

N_DOCS = 500  # sf0.001
DOCS_PARQUET_SF0_01 = "/root/testdata/sf0.01/documents.parquet"


def gen_corpus_golden(out_dir: str) -> None:
    path = os.path.join(out_dir, "golden_extract_sf0.001.jsonl.gz")
    with gzip.open(path, "wt") as f:
        for row in gen_pages(N_DOCS):
            rec = extract_document(row["html"])
            f.write(json.dumps({
                "url": row["url"],
                "text_sha256": hashlib.sha256(rec["text"].encode()).hexdigest(),
                "n_chars": len(rec["text"]),
                "n_spans": len(rec["spans"]),
                "method": rec["method"],
            }, sort_keys=True) + "\n")
    print(f"wrote {path}")


def gen_query_goldens(out_dir: str) -> None:
    import duckdb

    from no_ocr_spark.operators.extraction_queries import doc_to_page

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text, source, lang FROM '{DOCS_PARQUET_SF0_01}' "
        "ORDER BY doc_id"
    ).fetchall()
    docs_path = os.path.join(out_dir, "golden_extract_docs_sf0.01.jsonl.gz")
    spans_path = os.path.join(out_dir, "golden_extract_spans_sf0.01.jsonl.gz")
    with gzip.open(docs_path, "wt") as fd, gzip.open(spans_path, "wt") as fs:
        for doc_id, text, source, lang in rows:
            url, html = doc_to_page(doc_id, text, source)
            rec = extract_document(html)
            fd.write(json.dumps({
                "url": url,
                "lang": lang,
                "n_blocks": rec["n_blocks"],
                "n_chars": len(rec["text"]),
                "method": rec["method"],
            }, sort_keys=True) + "\n")
            by_page: dict[int, list] = {}
            for sp in rec["spans"]:
                by_page.setdefault(sp["page"], []).append(sp)
            for page in sorted(by_page):
                # replicate spans_table's explicit (block, line) ordering
                spans = sorted(by_page[page],
                               key=lambda s: (s["block"], s["line"]))
                fs.write(json.dumps({
                    "url": url,
                    "page": page,
                    "n_spans": len(spans),
                    "first_block": spans[0]["block"],
                }, sort_keys=True) + "\n")
    print(f"wrote {docs_path}")
    print(f"wrote {spans_path}")


def main() -> int:
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    gen_corpus_golden(out_dir)
    gen_query_goldens(out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
