"""T6 embedding-map operator: per-partition client init, intra-partition
batching, and end-to-end Spark round trip. (Oracle parity for the two
contract queries is covered by test_oracle_parity.py.)"""

import pandas as pd

from no_ocr_spark.operators.embed_map import (
    EMBED_DIM,
    StubEmbedClient,
    embed_map,
    make_embed_runner,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stub_is_deterministic_and_dim():
    c = StubEmbedClient()
    v1 = c.embed(["hello world", ""])
    v2 = StubEmbedClient().embed(["hello world", ""])
    assert v1 == v2
    assert all(len(v) == EMBED_DIM for v in v1)
    assert all(-504 <= x <= 504 for v in v1 for x in v)


def test_one_client_per_partition_and_batching():
    created = []

    class CountingClient(StubEmbedClient):
        def __init__(self):
            super().__init__()
            created.append(self)

    # one "partition" delivered as 3 Arrow batches of 5 rows, batch_size=4
    batches = [
        pd.DataFrame({"doc_id": range(i, i + 5),
                      "text": [f"doc {j}" for j in range(i, i + 5)]})
        for i in (0, 5, 10)
    ]
    runner = make_embed_runner(CountingClient, batch_size=4)
    out = pd.concat(list(runner(iter(batches))), ignore_index=True)

    assert len(created) == 1, "client must be created once per partition"
    # 3 arrow batches x ceil(5/4)=2 requests each
    assert created[0].n_requests == 6
    assert len(out) == 15
    # batching must not change results: compare to one-shot embedding
    direct = StubEmbedClient().embed([f"doc {j}" for j in range(15)])
    assert out["embedding"].tolist() == direct


def test_embed_map_spark_round_trip(spark):
    from no_ocr_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    rows = embed_map(docs, batch_size=7).orderBy("doc_id").collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    ref = StubEmbedClient()
    for r in rows:
        assert list(r.embedding) == ref.embed([texts[r.doc_id]])[0]


def test_flaky_client_retries_with_fresh_connection():
    import pytest

    created = []
    failed = []

    class FlakyClient(StubEmbedClient):
        def __init__(self):
            super().__init__()
            created.append(self)

        def embed(self, texts):
            # the service drops exactly one connection mid-partition
            if not failed:
                failed.append(True)
                raise ConnectionError("reset")
            return super().embed(texts)

    batch = pd.DataFrame({"doc_id": [1, 2, 3],
                          "text": ["aa", "bb", "cc"]})
    runner = make_embed_runner(FlakyClient, batch_size=2, max_retries=2)
    out = pd.concat(list(runner(iter([batch]))), ignore_index=True)
    assert out["embedding"].tolist() == StubEmbedClient().embed(["aa", "bb", "cc"])
    # first client failed once -> replaced; request 2 reused the new client
    assert len(created) == 2

    class AlwaysDown(StubEmbedClient):
        def embed(self, texts):
            raise ConnectionError("down")

    runner2 = make_embed_runner(AlwaysDown, batch_size=2, max_retries=1)
    with pytest.raises(ConnectionError):
        list(runner2(iter([batch])))
