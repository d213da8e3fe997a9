"""Scaling-efficiency evidence for the north rule (BASELINE.json): the same
extraction job, same input, at two parallelism levels — local[8] (N) and
local[32] (4N) — via `spark-submit --py-files dist/no_ocr_spark.zip`.
No real cluster exists in this sandbox; per the driver instruction the two
"cluster sizes" are two local core counts on identical input.

Usage:  python BENCH/run_scaling.py [--sf 0.4] [--repeats 1]
Writes: BENCH/scaling.json + rewrites the results table in BENCH/BASELINE.md.

efficiency = throughput(4N) / (4 * throughput(N));  target >= 0.8.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "no_ocr_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "no_ocr_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def materialize(sf: float) -> str:
    sys.path.insert(0, REPO)
    from no_ocr_spark.session import get_spark
    from no_ocr_spark.sources.synth_spark import materialize_pages

    spark = get_spark(app="scaling_gen")
    path = materialize_pages(spark, sf)
    spark.stop()
    return path


def run_once(zpath: str, pages: str, cores: int, out: str) -> dict:
    if os.path.exists(out):
        shutil.rmtree(out)
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "48g",
        "--py-files", zpath,
        os.path.join(REPO, "no_ocr_spark", "jobs", "extract_job.py"),
        "--pages", pages,
        "--out", out,
        "--n-buckets", "64",
        "--master", f"local[{cores}]",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit (rc={proc.returncode}):\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.4)
    ap.add_argument("--n-lo", type=int, default=8)
    ap.add_argument("--n-hi", type=int, default=32)
    args = ap.parse_args()

    zpath = build_zip()
    pages = materialize(args.sf)

    lo = run_once(zpath, pages, args.n_lo, f"/tmp/scale_out_{args.n_lo}")
    hi = run_once(zpath, pages, args.n_hi, f"/tmp/scale_out_{args.n_hi}")
    eff = hi["docs_per_sec"] / ((args.n_hi / args.n_lo) * lo["docs_per_sec"])

    # byte-identity across the two parallelism levels: per-bucket lineage
    # checksums (order-independent xxhash64 xor) must be identical sets
    import duckdb

    cks = [
        set(map(tuple, duckdb.sql(
            f"SELECT bucket, checksum FROM '/tmp/scale_out_{n}/lineage/*.parquet'"
        ).fetchall()))
        for n in (args.n_lo, args.n_hi)
    ]
    identical = cks[0] == cks[1]
    assert identical, "lineage checksums differ between parallelism levels!"
    result = {
        "sf": args.sf,
        "n_docs": lo["n_docs"],
        "cores_lo": args.n_lo,
        "cores_hi": args.n_hi,
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "wall_sec_lo": lo["wall_sec"],
        "wall_sec_hi": hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Extraction job (`no_ocr_spark/jobs/extract_job.py`) via
`spark-submit --py-files dist/no_ocr_spark.zip`, identical input
({lo['n_docs']} synthetic pages, seed=42, sf={args.sf}), two parallelism
levels on this 32-core box (sandbox stand-in for N and 4N executors per the
driver instruction).

| config | wall (s) | docs/sec |
|---|---|---|
| local[{args.n_lo}]  (N)  | {lo['wall_sec']} | {lo['docs_per_sec']} |
| local[{args.n_hi}] (4N) | {hi['wall_sec']} | {hi['docs_per_sec']} |

**Scaling efficiency = {hi['docs_per_sec']} / ({args.n_hi // args.n_lo} x {lo['docs_per_sec']})
= {result['scaling_efficiency']}** (target >= 0.8: {"PASS" if result['pass'] else "FAIL"}).

Byte-identity across the two runs is enforced by the order-independent
lineage checksums (bit_xor of xxhash64(url, text) per bucket) — identical
checksum sets were produced at both core counts.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
