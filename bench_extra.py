"""Per-query isolated measurement harness (round 6 optimization evidence).

bench.py is FROZEN for driver measurement; this file provides the guide
§1 instrumentation on top of the same methodology:

  * same session factory, same warmup, same forcing expression
    (bit_xor(xxhash64(struct(*)))) as bench.py:212 so numbers are
    directly comparable with the driver's per-query seconds;
  * --queries a,b,c  runs only the named queries (isolation — no
    python-worker residue from 70 earlier queries);
  * --reps N         best-of-N per query (default 3);
  * --explain DIR    additionally writes .explain("formatted") for each
    query to DIR/<name>.txt (the plan evidence for plans/r06/);
  * --noop           forces with a noop sink instead of the checksum
    (guide §1.4) — times computation of every column without the
    driver-side collect.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      --queries dedup_simhash_pairs,ann_pq_topk --reps 3 \
      --explain plans/r06_scratch
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma list; empty = all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default="", help="dir for plan dumps")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from no_ocr_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app="bench_extra")
    # bench.py's warmup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(256, numPartitions=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, schema="id long").count()

    qmap = {**entrymod.queries(), **entrymod.extra_queries()}
    names = [n for n in args.queries.split(",") if n] or list(qmap)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        q = qmap[name]
        if args.explain:
            df = q(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
        samples = []
        if args.reps == 0:
            out[name] = {"best": None, "samples": []}
            print(f"  {name}: plan only", file=sys.stderr)
            continue
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = q(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.selectExpr(
                    "bit_xor(xxhash64(struct(*))) AS chk").collect()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
        print(f"  {name}: best={min(samples)} samples={samples}",
              file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
