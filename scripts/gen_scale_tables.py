"""Synthesize LARGER driver-shaped tables for noise-floor benchmarking.

The driver testdata tops out at sf0.1; sub-second per-query times there sit
inside the shared host's ~0.3 s minute-to-minute swing, so suite-level
comparisons are noisy. This script scales every sf0.1 table by an integer
factor using KEY-SHIFTED copies (deterministic, no external data, schema
and join graph preserved):

  * copy i shifts every key/FK column by i * 1e9 — copy 0 is the identity,
    so literal point-lookup predicates keep matching, and every join pair
    shifts in lockstep (cross-copy joins cannot match: the shift exceeds
    any native key range);
  * documents.text gets a per-copy suffix token (' cI' for i>0, n_chars
    adjusted) so dedup/similarity operators see a 10x corpus, NOT a corpus
    where every doc has 9 exact twins (which would blow up duplicate-group
    quadratics unrepresentatively);
  * embeddings repeat vectors under shifted vec_ids (cosine/ANN cost is
    row-count-driven; tie-breaks are by id and stay deterministic).

Usage: python scripts/gen_scale_tables.py [factor] [out_dir]
Default: factor 10 -> .data/sf1.0_tables (bench.py parses sf=1.0 from the
name and pairs it with the .data/pages_sf1.0 extraction corpus).

BENCH USE ONLY — correctness is graded at sf0.01 against DuckDB oracles on
the driver tables; these scaled tables exist to lift per-query times above
the host-noise floor.
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".data/sf1.0_tables"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
        parts = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * OFF} AS {c}")
                elif table == "documents" and c == "text" and i > 0:
                    sel.append(f"text || ' c{i}' AS text")
                elif table == "documents" and c == "n_chars" and i > 0:
                    sel.append(f"n_chars + {len(f' c{i}')} AS n_chars")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'")
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
