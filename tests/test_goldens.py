"""Golden-corpus regression: the pure extractor must reproduce the
committed goldens byte-for-byte (sha256 of extracted text per url).
An intentional extractor change requires regenerating goldens in the same
commit (python scripts/gen_goldens.py) — accidental drift fails here.
"""

import gzip
import hashlib
import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "golden_extract_sf0.001.jsonl.gz")


def test_extractor_matches_committed_goldens():
    from no_ocr_spark.extract.api import extract_document
    from no_ocr_spark.sources.synth import gen_pages

    with gzip.open(GOLDEN, "rt") as f:
        golden = {r["url"]: r for r in map(json.loads, f)}
    n_checked = 0
    for row in gen_pages(len(golden)):
        rec = extract_document(row["html"])
        g = golden[row["url"]]
        sha = hashlib.sha256(rec["text"].encode()).hexdigest()
        assert sha == g["text_sha256"], f"text drift at {row['url']}"
        assert len(rec["spans"]) == g["n_spans"], f"span drift at {row['url']}"
        assert rec["method"] == g["method"]
        n_checked += 1
    assert n_checked == 500
