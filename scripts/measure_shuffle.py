"""One-off shuffle-write measurement for a named contract query at a given
sf dir: run with UI enabled, sum shuffleWriteBytes + wall time via REST.
Usage: python scripts/measure_shuffle.py <query> [sf_dir]"""
import json
import sys
import time
import urllib.request


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    qmap = {**entrymod.queries(), **entrymod.extra_queries()}
    t0 = time.time()
    df = qmap[name](spark, sf_dir)
    df.selectExpr("bit_xor(xxhash64(struct(*))) AS chk").collect()
    wall = time.time() - t0
    app = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"http://localhost:4099/api/v1/applications/{app}/stages"))
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    print(json.dumps({"query": name, "wall_sec": round(wall, 2),
                      "shuffle_write_bytes": sw,
                      "shuffle_write_mb": round(sw / 1e6, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
