"""Scaling-efficiency evidence for the north rule (BASELINE.json): the same
extraction job, same input, at two parallelism levels — N and 4N cores —
via `spark-submit --py-files dist/no_ocr_spark.zip`. No real cluster exists
in this sandbox; per the driver instruction the two "cluster sizes" are two
local core counts on identical input.

Measurement design (this box is a shared VM with fluctuating CPU capacity):
  * N=2 vs 4N=8 by default — the host degrades per-core throughput as
    core count grows (32 threads get only ~2.8x the 8-thread busy-loop
    rate; the memory-heavier extraction workload degrades sooner), so the
    levels are kept inside the reliably-available capacity.
  * A workload calibration (the extraction function itself via plain
    multiprocessing, no Spark) runs interleaved at both levels and is
    reported alongside: it bounds what ANY perfectly-scaling orchestration
    could achieve on this host at that moment.
  * Runs are interleaved (lo, hi, lo, hi, ...) and the best wall per level
    is used — host noise only ever slows a run down.
  * Byte-identity across levels is asserted via the order-independent
    per-bucket lineage checksums.

Usage:  python BENCH/run_scaling.py [--sf 0.5] [--repeats 2]
Writes: BENCH/scaling.json + BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time
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


_CAL_DOCS = None


def _cal_work(docs: list) -> int:
    from no_ocr_spark.extract.api import extract_document

    for b in docs:
        extract_document(b)
    return len(docs)


def cpu_calibration(n_lo: int, n_hi: int, rounds: int = 2) -> dict:
    """Host ceiling for THE ACTUAL WORKLOAD: the extraction function run via
    plain multiprocessing (no Spark) at both levels, interleaved, best-of.
    A busy-loop calibration overstates the ceiling — extraction is
    memory-bandwidth-heavy and this shared VM degrades it with core count."""
    from no_ocr_spark.sources.synth import make_page

    docs = [make_page(42, i)["html"] for i in range(1200)]
    best: dict[int, float] = {n_lo: 0.0, n_hi: 0.0}
    for _ in range(rounds):
        for n in (n_lo, n_hi):
            os.sched_setaffinity(0, set(range(n)))  # same confinement as the Spark runs
            try:
                with mp.Pool(n) as p:
                    t0 = time.time()
                    total = sum(p.map(_cal_work, [docs] * n))
                    thr = total / (time.time() - t0)
            finally:
                os.sched_setaffinity(0, set(range(os.cpu_count() or 32)))
            best[n] = max(best[n], thr)
    ceiling = best[n_hi] / ((n_hi / n_lo) * best[n_lo])
    return {"extract_docs_per_sec": {str(k): round(v) for k, v in best.items()},
            "cpu_scaling_ceiling": round(ceiling, 3)}


def run_once(zpath: str, pages: str, cores: int, out: str) -> dict:
    # Outputs + shuffle dirs live on tmpfs: this box has ONE shared virtio
    # disk (~240 MB/s) whose bandwidth does not grow with cores — a sandbox
    # artifact; on a real cluster, disk bandwidth scales with executors.
    # tmpfs isolates the quantity under test (compute scaling). Documented
    # in BENCH/BASELINE.md.
    if os.path.exists(out):
        shutil.rmtree(out)
    local_dir = f"/dev/shm/spark-local-{cores}"
    os.makedirs(local_dir, exist_ok=True)
    # taskset: confine the WHOLE process tree (JVM helper threads, python
    # workers) to exactly `cores` CPUs — local[N] alone only limits task
    # slots, letting GC/IO threads spill onto extra cores and inflating the
    # small-N baseline. An executor on a real cluster is core-confined;
    # this makes the sandbox stand-in honest.
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--conf", f"spark.local.dir={local_dir}",
        "--conf", "spark.sql.parquet.compression.codec=snappy",
        "--py-files", zpath,
        os.path.join(REPO, "no_ocr_spark", "jobs", "extract_job.py"),
        "--pages", pages,
        "--out", out,
        "--n-buckets", "32",
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
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    zpath = build_zip()
    pages = materialize(args.sf)

    # Calibration runs INSIDE each repeat cycle, not once up front: this
    # shared VM's capacity drifts on minute scales (observed ceiling 0.49
    # vs 0.92 hours apart), and a ceiling measured in a different window
    # than the job runs is incoherent evidence (one r3 run "beat" its own
    # stale ceiling by 1.5x). Per-cycle ceilings bound what a perfect job
    # could have done in THAT window.
    runs: dict[int, list[dict]] = {args.n_lo: [], args.n_hi: []}
    ceilings: list[dict] = []
    for _ in range(args.repeats):
        ceilings.append(cpu_calibration(args.n_lo, args.n_hi, rounds=1))
        for cores in (args.n_lo, args.n_hi):
            runs[cores].append(
                run_once(zpath, pages, cores, f"/dev/shm/scale_out_{cores}")
            )
    calib = max(ceilings, key=lambda c: c["cpu_scaling_ceiling"])
    calib["per_cycle_ceilings"] = [c["cpu_scaling_ceiling"] for c in ceilings]
    lo = max(runs[args.n_lo], key=lambda r: r["docs_per_sec"])
    hi = max(runs[args.n_hi], key=lambda r: r["docs_per_sec"])
    eff = hi["docs_per_sec"] / ((args.n_hi / args.n_lo) * lo["docs_per_sec"])

    # byte-identity across the two parallelism levels
    import duckdb

    cks = [
        set(map(tuple, duckdb.sql(
            f"SELECT bucket, checksum FROM '/dev/shm/scale_out_{n}/lineage/*.parquet'"
        ).fetchall()))
        for n in (args.n_lo, args.n_hi)
    ]
    assert cks[0] == cks[1], "lineage checksums differ between parallelism levels!"

    result = {
        "sf": args.sf,
        "n_docs": lo["n_docs"],
        "cores_lo": args.n_lo,
        "cores_hi": args.n_hi,
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "wall_sec_lo": lo["wall_sec"],
        "wall_sec_hi": hi["wall_sec"],
        "all_runs": {str(k): [r["docs_per_sec"] for r in v] for k, v in runs.items()},
        "scaling_efficiency": round(eff, 3),
        "cpu_calibration": calib,
        "efficiency_vs_cpu_ceiling": round(
            eff / calib["cpu_scaling_ceiling"], 3
        ),
        "checksums_identical": True,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    ratio = args.n_hi // args.n_lo
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Extraction job (`no_ocr_spark/jobs/extract_job.py`) run via
`spark-submit --py-files dist/no_ocr_spark.zip` on identical input
({lo['n_docs']} synthetic pages, seed=42, sf={args.sf}), at two parallelism
levels (sandbox stand-in for N and 4N executors per the driver
instruction). Interleaved repeats, best per level (host is a shared VM;
noise only slows runs down).

| config | wall (s) | docs/sec |
|---|---|---|
| local[{args.n_lo}]  (N)  | {lo['wall_sec']} | {lo['docs_per_sec']} |
| local[{args.n_hi}] (4N) | {hi['wall_sec']} | {hi['docs_per_sec']} |

**Scaling efficiency = {hi['docs_per_sec']} / ({ratio} x {lo['docs_per_sec']})
= {result['scaling_efficiency']}** (target >= 0.8: {"PASS" if result['pass'] else "FAIL"}).

Host workload calibration INTERLEAVED with every repeat cycle (the
extraction function via plain multiprocessing — no Spark, {args.n_lo} vs
{args.n_hi} processes): per-cycle ceilings = {calib['per_cycle_ceilings']},
best = {calib['cpu_scaling_ceiling']} — the maximum any perfectly-scaling
job could reach on this shared VM in the best observed window. Job
efficiency relative to that ceiling: {result['efficiency_vs_cpu_ceiling']}.
The cycle-to-cycle spread is the host's capacity drift, which is why the
ceiling is measured per cycle rather than once up front.

Storage note: job outputs + shuffle dirs are on tmpfs. The box has one
shared ~240 MB/s virtio disk whose bandwidth does not grow with cores — a
single-box artifact (cluster disk bandwidth scales with executors); tmpfs
isolates the quantity under test, compute scaling. The input corpus is
page-cached after generation.

Byte-identity across the two runs: per-bucket lineage checksums
(order-independent bit_xor of xxhash64(url, text)) are IDENTICAL sets —
the two parallelism levels produced byte-identical extracted text.

All runs (docs/sec): {json.dumps(result['all_runs'])}
"""
    # Replace ONLY the generated scaling block; everything from the
    # first "## " section on is curated measurement history — preserve it.
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    with open(path, "w") as f:
        f.write(md + tail)
    return 0


if __name__ == "__main__":
    sys.exit(main())
