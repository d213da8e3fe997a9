"""Canonical-survivor selection (operators/keepbest.py): invariants the
cell-exact parity row can't express as clearly. Exact grading is
tests/test_oracle_parity.py::dedup_keep_best."""

from __future__ import annotations

from no_ocr_spark.operators.keepbest import q_dedup_keep_best

SF = "/root/testdata/sf0.001"


def test_one_survivor_per_cluster_and_it_is_the_best(spark):
    rows = q_dedup_keep_best(spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert sum(1 for r in rows if r.keep) == len(by_cluster)
    multi = 0
    for members in by_cluster.values():
        kept = [r for r in members if r.keep]
        assert len(kept) == 1
        best = max(members, key=lambda r: (r.score, -r.doc_id))
        assert kept[0].doc_id == best.doc_id
        multi += len(members) > 1
    assert multi > 0          # the corpus has real near-dup clusters
    # singletons are their own cluster and always kept
    for members in by_cluster.values():
        if len(members) == 1:
            assert members[0].keep
