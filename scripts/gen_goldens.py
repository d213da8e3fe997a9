"""Regenerate the committed golden extraction fixtures (FIXTURES.md A2/A3).

Goldens pin the extractor's byte-level behavior: any change to tokenizer /
DOM rules / classifier thresholds / span geometry shows up as a golden
mismatch and requires an intentional regeneration in the same commit.

Usage: python scripts/gen_goldens.py
Writes: tests/goldens/golden_extract_sf0.001.jsonl.gz
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


def main() -> int:
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
