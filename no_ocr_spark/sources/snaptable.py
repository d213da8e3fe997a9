"""Snapshot-table format over parquet — the from-scratch stand-in for the
Iceberg table layer BASELINE.json names (the Iceberg runtime jar is absent
from this environment; `sources/tables.py` remains the swap seam and this
module implements the SEMANTICS the pipeline needs from it: atomic commits,
snapshot isolation for readers, time travel, and safe file GC).

Re-derived from the publicly documented Iceberg spec concepts (spec v2:
table metadata + snapshot list + manifest-tracked immutable data files),
not ported: the realization is deliberately minimal —

  <table>/data/<uuid>/part-*.parquet   immutable data-file directories
                                       (one per commit, never rewritten)
  <table>/_meta/v{N:012d}.metadata.json  FULL metadata for version N
  <table>/_meta/VERSION                current version, committed by
                                       ATOMIC RENAME (the commit point —
                                       on HDFS/posix rename is atomic; on
                                       object stores swap this single
                                       file for a metastore CAS, exactly
                                       Iceberg's own catalog contract)

Each metadata version embeds the COMPLETE snapshot history, and every
snapshot lists its complete data-directory set (Iceberg's manifest-list
indirection flattened — O(commits) metadata per version is the documented
trade-off; fine up to thousands of commits, which is the lineage-bucket
regime this engine writes).

Guarantees (tested in tests/test_snaptable.py):
  * readers NEVER see a partial commit — data and metadata are invisible
    until the VERSION rename lands;
  * a crash between data write and commit leaves only orphan files that
    `vacuum` removes (never referenced, never read);
  * time travel: `read(version=K)` reproduces any retained version
    byte-identically (data files are immutable);
  * `vacuum(keep_versions=k)` deletes data dirs referenced by NO retained
    metadata version — concurrent readers of retained versions are safe.

Concurrent WRITERS are fenced: each commit claims its version file by
CREATE-EXCLUSIVE (posix link(2) locally; HDFS create-no-overwrite
elsewhere; a metastore CAS is the object-store swap), so of N racing
committers exactly one wins each version and the rest rebase and retry —
every commit survives as a distinct version (tested:
tests/test_snaptable.py two-writer race). `compact` conflict-fails
instead of rebasing, since rebasing could drop a concurrent append.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from no_ocr_spark.sources.merge import _Fs

_FORMAT = "no-ocr-snaptable/1"


def _meta_dir(path: str) -> str:
    return path.rstrip("/") + "/_meta"


def _version_of(fs: _Fs, path: str) -> int:
    """Latest COMMITTED version. The commit point is the create-exclusive
    metadata file (see _commit); VERSION is a reader cache that can lag —
    after a crash between metadata create and pointer update, or a lost
    pointer race between two fenced writers — so probe forward from it.
    An unparseable probe target is a half-written claim on a
    non-atomic-create FS, i.e. NOT committed: stop there."""
    vfile = f"{_meta_dir(path)}/VERSION"
    v = int(fs.read_text(vfile).strip()) if fs.exists(vfile) else 0
    while True:
        nxt = f"{_meta_dir(path)}/v{v + 1:012d}.metadata.json"
        if not fs.exists(nxt):
            return v
        try:
            if json.loads(fs.read_text(nxt)).get("version") != v + 1:
                return v
        except (ValueError, OSError):
            return v
        v += 1


def _commit(fs: _Fs, path: str, schema_json: dict, make_snap) -> int:
    """Fenced optimistic commit: build metadata against the latest version
    and claim v+1 by CREATE-EXCLUSIVE of its metadata file. Exactly one of
    N concurrent writers wins each version; losers rebase on the new
    latest and retry, so every commit survives as a distinct version (no
    last-rename-wins lost updates). `make_snap(v, snapshots)` returns the
    new snapshot entry (id must be v+1)."""
    for _ in range(16):
        v = _version_of(fs, path)
        snapshots = _load_meta(fs, path, v)["snapshots"] if v else []
        snap = make_snap(v, snapshots)
        meta = {
            "format": _FORMAT,
            "version": v + 1,
            "schema": schema_json,
            "snapshots": snapshots + [snap],
        }
        mp = f"{_meta_dir(path)}/v{v + 1:012d}.metadata.json"
        if fs.create_exclusive(mp, json.dumps(meta)):
            # pointer update is a best-effort reader cache — a crash here
            # loses nothing (_version_of probes past a stale pointer)
            fs.write_atomic(f"{_meta_dir(path)}/VERSION", str(v + 1))
            return v + 1
        # Lost the race — or a dead claim (half-written file from a crash
        # on a non-atomic-create FS) occupies the slot. Readable occupant:
        # rebase and retry. Unreadable: remove the corpse and retake.
        try:
            json.loads(fs.read_text(mp))
        except (ValueError, OSError):
            fs.delete(mp)
    raise IOError(f"snapshot commit contention at {path}: "
                  f"gave up after 16 attempts")


def _load_meta(fs: _Fs, path: str, version: int) -> dict:
    return json.loads(fs.read_text(
        f"{_meta_dir(path)}/v{version:012d}.metadata.json"
    ))


def current_version(spark: SparkSession, path: str) -> int:
    return _version_of(_Fs(spark, path), path)


def write(spark: SparkSession, path: str, df: DataFrame,
          mode: str = "append", props: dict | None = None) -> int:
    """Commit df as a new snapshot; returns the new version number.

    mode='append'    new snapshot = previous file set + this commit's files
    mode='overwrite' new snapshot = this commit's files only (previous
                     versions stay readable until vacuumed — that IS the
                     snapshot-isolation contract)
    props            arbitrary JSON recorded on the snapshot entry
                     (Iceberg's snapshot summary) — e.g. the lineage
                     bucket list the extract pipeline uses to reconcile
                     snapshot contents against its ledger.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    fs = _Fs(spark, path)
    data_dir = f"data/{uuid.uuid4().hex}"
    df.write.parquet(f"{path.rstrip('/')}/{data_dir}")

    def make_snap(v: int, snapshots: list[dict]) -> dict:
        prev = snapshots[-1]["files"] if (snapshots and mode == "append") \
            else []
        snap = {
            "id": v + 1,
            "ts_ms": int(time.time() * 1000),
            "operation": mode if v else "create",
            "files": prev + [data_dir],
        }
        if props:
            snap["props"] = props
        return snap

    return _commit(fs, path, df.schema.jsonValue(), make_snap)


def read(spark: SparkSession, path: str,
         version: int | None = None) -> DataFrame:
    """Snapshot read: latest by default, any retained version for time
    travel. The file set is resolved ONCE, driver-side, from that
    version's metadata — concurrent commits cannot shift the rows this
    DataFrame yields (data files are immutable)."""
    fs = _Fs(spark, path)
    v = version if version is not None else _version_of(fs, path)
    if v < 1:
        raise ValueError(f"no committed version at {path}")
    meta = _load_meta(fs, path, v)
    snap = meta["snapshots"][-1]
    base = path.rstrip("/")
    return spark.read.parquet(*[f"{base}/{d}" for d in snap["files"]])


def history(spark: SparkSession, path: str) -> list[dict]:
    """Snapshot log of the current version (id, ts_ms, operation, files)."""
    fs = _Fs(spark, path)
    v = _version_of(fs, path)
    return _load_meta(fs, path, v)["snapshots"] if v else []


def read_incremental(spark: SparkSession, path: str, from_version: int,
                     to_version: int | None = None) -> DataFrame:
    """CHANGE FEED: rows added strictly AFTER `from_version`, up to
    `to_version` (default: current) — Iceberg's incremental append scan.
    `from_version=0` yields the full table. Correct because data files
    are immutable and append commits only ADD directories: the delta is
    exactly (to's file set) minus (from's file set). An overwrite commit
    inside the range breaks the append-only premise — rejected rather
    than silently misread (Iceberg's incremental scan has the same
    restriction). This is what lets a downstream job consume a snapshot
    table produced by repeated `extract_job --snapshot` runs without
    ever rescanning already-processed versions."""
    fs = _Fs(spark, path)
    to_v = to_version if to_version is not None else _version_of(fs, path)
    if to_v < 1 or from_version > to_v:
        raise ValueError(f"bad version range {from_version}..{to_v}")
    meta = _load_meta(fs, path, to_v)
    snaps = {s["id"]: s for s in meta["snapshots"]}
    # from_version=0 is the bootstrap read: the old file set is empty, so
    # the set difference equals the full current table and is correct
    # regardless of overwrite history — only ranges STARTING at a real
    # version need the append-only premise
    if from_version >= 1:
        for k in range(from_version + 1, to_v + 1):
            if k in snaps and snaps[k]["operation"] in ("overwrite",
                                                        "compact"):
                raise ValueError(
                    f"version {k} is a {snaps[k]['operation']} commit — "
                    f"incremental append scan undefined across it "
                    f"(read(version=...) for full-snapshot semantics)"
                )
    old: set[str] = set()
    if from_version >= 1:
        old = set(_load_meta(fs, path, from_version)["snapshots"][-1]["files"])
    new_files = [d for d in snaps[to_v]["files"] if d not in old]
    base = path.rstrip("/")
    if not new_files:
        return read(spark, path, version=to_v).limit(0)
    return spark.read.parquet(*[f"{base}/{d}" for d in new_files])


def compact(spark: SparkSession, path: str,
            target_partitions: int = 1) -> int:
    """Rewrite the CURRENT snapshot's rows into one fresh data directory
    with `target_partitions` files and commit it as a new version
    (operation 'compact') — the small-files remedy (Iceberg's
    rewrite_data_files): repeated small append commits otherwise leave
    one directory per commit and scan planning degrades. Rows are
    unchanged; older versions stay readable until vacuumed; incremental
    scans crossing a compact commit are rejected by read_incremental
    (file-set diffing cannot see that the rows are identical — the same
    caveat Iceberg's incremental read has for replace snapshots)."""
    fs = _Fs(spark, path)
    v0 = _version_of(fs, path)
    df = read(spark, path, version=v0).repartition(target_partitions)
    data_dir = f"data/{uuid.uuid4().hex}"
    df.write.parquet(f"{path.rstrip('/')}/{data_dir}")

    def make_snap(v: int, _snapshots: list[dict]) -> dict:
        if v != v0:
            # compact claims row preservation; a commit that landed since
            # our snapshot read would be silently dropped — conflict-fail
            # instead (Iceberg rewrite_data_files does the same)
            raise IOError(f"concurrent commit (v{v0}->v{v}) during "
                          f"compact of {path}; re-run compact")
        return {
            "id": v + 1,
            "ts_ms": int(time.time() * 1000),
            "operation": "compact",
            "files": [data_dir],
        }

    return _commit(fs, path, df.schema.jsonValue(), make_snap)


def vacuum(spark: SparkSession, path: str, keep_versions: int = 2) -> dict:
    """Delete data directories referenced by NO retained metadata version
    (the last `keep_versions`), plus orphans from crashed commits, plus
    expired metadata files. Readers of retained versions are unaffected —
    their file sets stay intact."""
    fs = _Fs(spark, path)
    v = _version_of(fs, path)
    base = path.rstrip("/")
    keep = range(max(1, v - keep_versions + 1), v + 1)
    referenced: set[str] = set()
    for k in keep:
        # version k's file set is its metadata's LAST snapshot (id == k)
        referenced.update(_load_meta(fs, path, k)["snapshots"][-1]["files"])
    removed_data = []
    for d in fs.listdir(f"{base}/data"):
        if f"data/{d}" not in referenced:
            fs.delete(f"{base}/data/{d}")
            removed_data.append(f"data/{d}")
    removed_meta = []
    for name in fs.listdir(_meta_dir(path)):
        if name.startswith("v") and name.endswith(".metadata.json"):
            k = int(name[1:13])
            if k not in keep:
                fs.delete(f"{_meta_dir(path)}/{name}")
                removed_meta.append(name)
        elif ".metadata.json.claim-" in name:
            # claim corpse from a crashed committer. Only claims for
            # versions <= current are certainly dead (an IN-FLIGHT claim
            # targets v+1 > current); leave newer ones alone.
            k = int(name[1:13])
            if k <= v:
                fs.delete(f"{_meta_dir(path)}/{name}")
                removed_meta.append(name)
    return {"removed_data_dirs": sorted(removed_data),
            "removed_meta": sorted(removed_meta),
            "retained_versions": list(keep)}
