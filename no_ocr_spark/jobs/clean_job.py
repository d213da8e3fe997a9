"""spark-submit entry point for the post-extraction cleanup pipeline:

    spark-submit --py-files dist/no_ocr_spark.zip \
      no_ocr_spark/jobs/clean_job.py --extracted /out/extracted --out /out2

Reads the extract_job's `extracted` table, runs quality gates -> exact
dedup -> MinHash-LSH near-dup removal (operators/cleanup.py), writes the
`clean` table bucketed by url-hash (same dynamic-overwrite layout as the
extraction sinks), and prints one JSON line of per-stage survivor counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extracted", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from no_ocr_spark.operators.cleanup import clean_corpus
    from no_ocr_spark.plans.partitioning import with_bucket
    from no_ocr_spark.session import get_spark

    spark = get_spark(app="clean_job", master=args.master)
    extracted = spark.read.parquet(args.extracted)
    if "bucket" in extracted.columns:
        extracted = extracted.drop("bucket")

    t0 = time.time()
    clean, stats = clean_corpus(extracted, min_tokens=args.min_tokens)
    unpersist = stats.pop("_unpersist")
    (
        with_bucket(clean, args.n_buckets)
        .repartition(args.n_buckets, "bucket")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(args.out + "/clean")
    )
    unpersist()
    wall = time.time() - t0
    out = {
        "job": "clean",
        **stats,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(stats["n_in"] / wall, 1) if wall else None,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
