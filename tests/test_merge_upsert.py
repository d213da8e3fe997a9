"""W5 MERGE shim: keyed upsert over bucketed parquet with partition-level
copy-on-write — updates win, untouched bucket files are not rewritten."""

import glob
import os

from pyspark.sql import functions as F

from no_ocr_spark.sources.merge import merge_upsert, read_merged


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, status string, v bigint")


def test_merge_upserts_and_inserts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tbl")) + "/t"
    base = _mk(spark, [(i, "pending", i * 10) for i in range(100)])
    merge_upsert(spark, path, base, key="k", n_buckets=8)
    assert read_merged(spark, path).count() == 100

    upd = _mk(spark, [(5, "done", 555), (7, "done", 777), (200, "new", 1)])
    res = merge_upsert(spark, path, upd, key="k", n_buckets=8)
    assert res["n_updates"] == 3

    got = {r.k: (r.status, r.v) for r in read_merged(spark, path).collect()}
    assert len(got) == 101  # 100 originals + 1 insert, no dup keys
    assert got[5] == ("done", 555)
    assert got[7] == ("done", 777)
    assert got[200] == ("new", 1)
    assert got[6] == ("pending", 60)  # untouched row survives


def test_merge_rewrites_only_touched_buckets(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tbl2")) + "/t"
    base = _mk(spark, [(i, "pending", i) for i in range(200)])
    merge_upsert(spark, path, base, key="k", n_buckets=8)

    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(path, "bucket=*", "*.parquet"))}

    upd = _mk(spark, [(3, "done", 33)])
    res = merge_upsert(spark, path, upd, key="k", n_buckets=8)
    assert len(res["touched_buckets"]) == 1
    (tb,) = res["touched_buckets"]

    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(path, "bucket=*", "*.parquet"))}
    for f, mt in after.items():
        in_touched = f"bucket={tb}" in f
        if not in_touched:
            assert before[f] == mt, f"untouched bucket file rewritten: {f}"
    # the touched bucket WAS rewritten (new file or new mtime)
    touched_files = [f for f in after if f"bucket={tb}" in f]
    assert any(f not in before or before[f] != after[f] for f in touched_files)


def test_merge_dedupes_same_key_within_batch(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tbl3")) + "/t"
    upd = _mk(spark, [(1, "a", 1), (1, "b", 2)])
    merge_upsert(spark, path, upd, key="k", n_buckets=4)
    rows = read_merged(spark, path).collect()
    assert len(rows) == 1
    assert rows[0].status == "b" and rows[0].v == 2  # max-struct wins


def test_delete_keys_targeted(spark, tmp_path_factory):
    from no_ocr_spark.sources.merge import delete_keys

    path = str(tmp_path_factory.mktemp("tbl4")) + "/t"
    base = _mk(spark, [(i, "pending", i) for i in range(200)])
    merge_upsert(spark, path, base, key="k", n_buckets=8)

    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(path, "bucket=*", "*.parquet"))}

    doomed = spark.createDataFrame([(3,), (17,), (42,)], "k bigint")
    res = delete_keys(spark, path, doomed, key="k", n_buckets=8)
    assert res["n_deleted"] == 3

    got = read_merged(spark, path)
    assert got.count() == 197
    assert got.filter(got.k.isin([3, 17, 42])).count() == 0
    # untouched buckets' files not rewritten
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(path, "bucket=*", "*.parquet"))}
    touched = {f"bucket={b}" for b in res["touched_buckets"]}
    for f, mt in after.items():
        if not any(t in f for t in touched):
            assert before[f] == mt, f"untouched bucket rewritten: {f}"


def test_delete_keys_empties_whole_bucket(spark, tmp_path_factory):
    from no_ocr_spark.sources.merge import delete_keys

    path = str(tmp_path_factory.mktemp("tbl5")) + "/t"
    base = _mk(spark, [(i, "x", i) for i in range(50)])
    merge_upsert(spark, path, base, key="k", n_buckets=4)
    # delete EVERY key of one bucket: its directory must disappear
    bucketed = spark.read.parquet(path)
    some_bucket = bucketed.select("bucket").first().bucket
    doomed_keys = [
        (r.k,) for r in
        bucketed.filter(F.col("bucket") == some_bucket).select("k").collect()
    ]
    res = delete_keys(spark, path, spark.createDataFrame(doomed_keys, "k bigint"),
                      key="k", n_buckets=4)
    assert res["n_deleted"] == len(doomed_keys) > 0
    got = spark.read.parquet(path)
    assert got.filter(F.col("bucket") == some_bucket).count() == 0
    assert got.count() == 50 - len(doomed_keys)
    assert not os.path.exists(os.path.join(path, f"bucket={some_bucket}"))
