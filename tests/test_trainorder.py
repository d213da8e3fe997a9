"""Training-order shuffle (operators/trainorder.py): permutation
properties and partitioning-invariance. Cell-exact grading is
tests/test_oracle_parity.py::train_order."""

from __future__ import annotations

from no_ocr_spark.operators.trainorder import N_SHARDS, q_train_order

SF = "/root/testdata/sf0.001"


def test_is_a_sharded_permutation(spark):
    rows = q_train_order(spark, SF).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))          # every doc exactly once
    assert set(r.shard for r in rows) == set(range(N_SHARDS))
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the within-shard order is actually shuffled, not doc_id order
    shard0 = sorted((r.pos, r.doc_id) for r in rows if r.shard == 0)
    assert [d for _, d in shard0] != sorted(d for _, d in shard0)


def test_partitioning_invariant(spark):
    a = {(r.doc_id, r.shard, r.pos)
         for r in q_train_order(spark, SF).repartition(7).collect()}
    b = {(r.doc_id, r.shard, r.pos)
         for r in q_train_order(spark, SF).coalesce(1).collect()}
    assert a == b
