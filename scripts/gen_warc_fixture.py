"""Generate the committed WARC fixture + its extraction golden.

The `warc_extract` contract query reads this fixture (a real Common-Crawl
style .warc.gz pair) through the engine's WARC source, runs the extraction
operator, and is graded against the golden — so the crawl-native ingestion
edge (sources/warc.py) is verified at the driver gate, not just in pytest.

Everything is a pure function: pages come from sources/synth.gen_pages
(seeded per-row RNG; includes the deterministic PDF fraction, so the PDF
parse branch is driver-graded too), the WARC bytes use gzip mtime=0
(byte-reproducible), and the golden is a no-Spark re-derivation
(parse-free: the records are generated, extract_document is called on the
payloads directly), keeping the Spark path — binaryFile scan, record
framing, Arrow explode, mapInPandas extraction — independently checked.

Usage: python scripts/gen_warc_fixture.py
Writes: tests/fixtures/warc/part-{0,1}.warc.gz
        tests/goldens/golden_warc_extract.jsonl.gz
"""

from __future__ import annotations

import gzip
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from no_ocr_spark.extract.api import extract_document  # noqa: E402
from no_ocr_spark.sources.synth import gen_pages  # noqa: E402
from no_ocr_spark.sources.warc import build_warc  # noqa: E402

N_PAGES = 120  # 3 PDFs at the 1-in-40 synth rate
N_FILES = 2


def main() -> int:
    fixture_dir = os.path.join(REPO, "tests", "fixtures", "warc")
    golden_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(fixture_dir, exist_ok=True)
    os.makedirs(golden_dir, exist_ok=True)

    pages = list(gen_pages(N_PAGES))
    per_file = (len(pages) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        chunk = pages[i * per_file:(i + 1) * per_file]
        recs = [
            {"url": p["url"], "date": p["warc_ts"], "payload": p["html"]}
            for p in chunk
        ]
        path = os.path.join(fixture_dir, f"part-{i}.warc.gz")
        with open(path, "wb") as f:
            f.write(build_warc(recs, compress=True))
        print(f"wrote {path} ({len(chunk)} records)")

    golden = os.path.join(golden_dir, "golden_warc_extract.jsonl.gz")
    with gzip.GzipFile(golden, "wb", mtime=0) as f:
        for p in pages:
            rec = extract_document(p["html"])
            f.write((json.dumps({
                "url": p["url"],
                "n_blocks": rec["n_blocks"],
                "n_chars": len(rec["text"]),
                "method": rec["method"],
            }, sort_keys=True) + "\n").encode())
    print(f"wrote {golden}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
