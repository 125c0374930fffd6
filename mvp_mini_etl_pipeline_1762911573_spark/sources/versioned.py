"""Minimal versioned parquet tables (EXT, SURVEY §2.13 M10/M11):
snapshot isolation, time travel, rollback and vacuum over plain
parquet + JSON manifests — the lakehouse commit protocol
(Delta/Iceberg's core idea) expressed with nothing but atomic file
primitives, for pipelines that need reproducible reads ("train on the
corpus AS OF version 7") without adopting a table-format dependency.

No reference counterpart (the reference holds state in React memory and
loses it on refresh, pages/index.js:22-36 — the staged-history UI it
fakes is exactly what versions provide for real).

Design (each piece is the standard production answer):

* **Data files are immutable.**  Every commit writes NEW parquet files
  under ``data/`` in a writer-unique staging dir (racing writers can
  never clobber each other's files) and never touches existing ones —
  readers of old snapshots stay correct with zero coordination.
* **A manifest IS the snapshot.**  ``_manifests/v{N}.json`` lists the
  data files live at version N.  Readers list ONE small JSON file and
  then read exactly those parquet files — no directory listing of
  ``data/`` (the object-store listing consistency trap), no partial
  state visible mid-commit.
* **Publish = fsync'd temp + hard-link.**  The manifest is fully
  written and fsync'd at a temp path, then published with
  ``os.link`` — atomic AND exclusive, so a crash mid-write can never
  leave a torn manifest visible (no manifest -> no snapshot, really),
  and two writers racing to version N produce exactly one winner; the
  loser gets ``CommitConflict`` and retries on top of the new state
  (optimistic concurrency, the Delta protocol).
* **Rollback is a new commit**, never history rewrite: version K's
  file list re-published as version N+1, so the audit trail survives.
* **Vacuum** deletes data files unreferenced by the manifests kept
  after retention trimming — the only destructive operation.  It
  skips unreferenced files younger than ``retention_s`` (the Delta
  retention answer): an in-flight commit's staged files exist before
  its manifest does, and without the grace window vacuum would eat
  them mid-commit.
* **Row counts come from parquet footers** (pyarrow metadata), never
  a second Spark scan of data the writer just produced.

At 100 TB the manifest holds file paths + row counts, not data; commit
cost is O(new files), read planning O(manifest).  Scaling manifests
past millions of files needs manifest sharding (Iceberg's avro
manifest lists) — out of scope, noted for honesty.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer committed this version first; re-read and retry."""


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifests")


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_path), f"v{version}.json")


def versions(table_path: str) -> list[int]:
    mdir = _manifest_dir(table_path)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(f[1:-5]) for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
        and not f.endswith(".tmp.json"))


def _load_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as fh:
        return json.load(fh)


def _stage_batch(df: DataFrame, table_path: str) -> tuple[list, int]:
    """Write df's parquet files into a writer-unique staging dir and
    return (file list, row count).  Uniqueness matters: two writers
    racing toward the same version must not share a staging path, or
    the eventual loser's overwrite-mode write deletes the winner's
    data files before the manifest race even resolves.  Row count
    comes from the parquet footers — metadata reads, not a second
    Spark job over data we just wrote."""
    import pyarrow.parquet as pq

    staging = os.path.join(table_path, "data", f"c-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    files = sorted(
        os.path.join(staging, f) for f in os.listdir(staging)
        if f.endswith(".parquet"))
    n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return files, n_rows


def _publish_manifest(table_path: str, version: int,
                      manifest: dict) -> None:
    """Durably publish ONE manifest: fully write + fsync at a temp
    path, then hard-link into place.  link() is atomic and fails if
    the target exists — so a torn write is never visible (the temp
    name is never read by versions()) and exactly one of N racing
    writers wins the version."""
    os.makedirs(_manifest_dir(table_path), exist_ok=True)
    final = _manifest_path(table_path, version)
    tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp.json"
    with open(tmp, "x") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed") from exc
    finally:
        os.remove(tmp)


def _base_state(table_path: str,
                expect_base: int | None) -> tuple[int | None, dict | None]:
    vs = versions(table_path)
    base = expect_base if expect_base is not None \
        else (vs[-1] if vs else None)
    prev = _load_manifest(table_path, base) if base is not None else None
    return base, prev


def commit(spark: SparkSession, table_path: str, df: DataFrame,
           mode: str = "append",
           expect_base: int | None = None) -> int:
    """Write ``df`` as a new snapshot and return its version.

    mode='append' keeps the previous snapshot's files and adds the new
    ones; mode='overwrite' starts the file list fresh.  Raises
    CommitConflict if another writer claimed the version first (data
    files written by the loser are orphans; vacuum reclaims them
    after the retention window).

    ``expect_base`` pins the snapshot this commit believes is latest
    (read-your-base optimistic concurrency): a writer that planned its
    append against version K passes expect_base=K, and if anyone
    committed K+1 meanwhile the manifest publish loses and the writer
    must re-plan — without it, a racing append would silently base
    itself on a snapshot it never read."""
    assert mode in ("append", "overwrite"), mode
    base, prev = _base_state(table_path, expect_base)
    version = (base if base is not None else -1) + 1
    new_files, n_rows = _stage_batch(df, table_path)
    prev_files = prev["files"] if prev and mode == "append" else []
    _publish_manifest(table_path, version, {
        "version": version,
        "mode": mode,
        "files": prev_files + new_files,
        "added_files": len(new_files),
        "added_rows": n_rows,
        # committed-batch high-water set carried forward on EVERY
        # manifest so the streaming dedup check reads one file (O(1)
        # per micro-batch, not O(history)); kept across rollback and
        # overwrite deliberately — those batches WERE delivered, and a
        # failure-replay of them must stay a no-op
        "batch_ids": prev["batch_ids"] if prev else [],
    })
    return version


def committed_batch_ids(table_path: str) -> set:
    """Batch ids already durably committed — read from the LATEST
    manifest only (every manifest carries the full set forward)."""
    vs = versions(table_path)
    if not vs:
        return set()
    return set(_load_manifest(table_path, vs[-1]).get("batch_ids", []))


def streaming_sink(spark: SparkSession, table_path: str):
    """Exactly-once streaming sink: a foreachBatch function that
    appends each micro-batch as one snapshot, recording the batch id
    in the manifest's carried-forward batch_ids set.  On
    failure-replay Spark re-delivers a batch under the SAME id; the
    stamp makes the dedup check durable in the table itself (not in
    the checkpoint, which can be lost or point at a restored copy of
    the table), so the replayed batch is skipped and the committed
    data appears exactly once.  The transactional version of
    jobs.idempotent_batch_sink's partition-overwrite idempotence:
    even a commit torn mid-write is invisible (no manifest -> no
    snapshot) and retried cleanly.  A concurrent writer racing the
    sink surfaces as CommitConflict (same contract as commit())."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        base, prev = _base_state(table_path, None)
        done = set(prev.get("batch_ids", [])) if prev else set()
        if batch_id in done:
            return
        version = (base if base is not None else -1) + 1
        new_files, n_rows = _stage_batch(batch_df, table_path)
        _publish_manifest(table_path, version, {
            "version": version,
            "mode": "stream-append",
            "batch_id": batch_id,
            "files": (prev["files"] if prev else []) + new_files,
            "added_files": len(new_files),
            "added_rows": n_rows,
            "batch_ids": sorted(done | {batch_id}),
        })
    return sink


def read(spark: SparkSession, table_path: str,
         version: int | None = None) -> DataFrame:
    """Read a snapshot (latest by default, or AS OF ``version``).
    Plans from the manifest's explicit file list — never a data-dir
    listing, so in-flight commits are invisible."""
    vs = versions(table_path)
    assert vs, f"no snapshots at {table_path}"
    v = vs[-1] if version is None else version
    files = _load_manifest(table_path, v)["files"]
    if not files:
        return spark.range(0).drop("id")
    return spark.read.parquet(*files)


def rollback(spark: SparkSession, table_path: str,
             to_version: int) -> int:
    """Publish version ``to_version``'s file list as a NEW version —
    restore without rewriting history."""
    old = _load_manifest(table_path, to_version)
    base, prev = _base_state(table_path, None)
    version = base + 1
    _publish_manifest(table_path, version, {
        "version": version,
        "mode": f"rollback->{to_version}",
        "files": old["files"],
        "added_files": 0,
        "added_rows": 0,
        "batch_ids": prev.get("batch_ids", []) if prev else [],
    })
    return version


def history(table_path: str) -> list[dict]:
    return [
        {k: m[k] for k in
         ("version", "mode", "added_files", "added_rows")}
        for m in (_load_manifest(table_path, v)
                  for v in versions(table_path))
    ]


def vacuum(table_path: str, keep_last: int = 2,
           retention_s: float = 600.0) -> int:
    """Drop all but the last ``keep_last`` manifests, then delete data
    files no surviving manifest references (orphans from conflicted or
    superseded commits included).  Unreferenced files YOUNGER than
    ``retention_s`` are kept: an in-flight commit's staged data exists
    before its manifest does, and deleting it would corrupt the
    snapshot about to be published — the same reason Delta vacuums
    with a retention period.  Returns files deleted."""
    vs = versions(table_path)
    dead_versions = vs[:-keep_last] if keep_last > 0 else vs[:-1]
    live = set()
    for v in vs:
        if v not in dead_versions:
            live.update(_load_manifest(table_path, v)["files"])
    for v in dead_versions:
        os.remove(_manifest_path(table_path, v))

    deleted = 0
    cutoff = time.time() - retention_s
    data_root = os.path.join(table_path, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            p = os.path.join(dirpath, f)
            if (f.endswith(".parquet") and p not in live
                    and os.stat(p).st_mtime < cutoff):
                os.remove(p)
                deleted += 1
    return deleted
