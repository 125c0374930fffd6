"""Minimal versioned parquet tables (EXT, SURVEY §2.13 M10): snapshot
isolation, time travel, rollback and vacuum over plain parquet + JSON
manifests — the lakehouse commit protocol (Delta/Iceberg's core idea)
expressed with nothing but atomic file primitives, for pipelines that
need reproducible reads ("train on the corpus AS OF version 7") without
adopting a table-format dependency.

No reference counterpart (the reference holds state in React memory and
loses it on refresh, pages/index.js:22-36 — the staged-history UI it
fakes is exactly what versions provide for real).

Design (each piece is the standard production answer):

* **Data files are immutable.**  Every commit writes NEW parquet files
  under ``data/`` (named by version, so writers never collide on file
  names) and never touches existing ones — readers of old snapshots
  stay correct with zero coordination.
* **A manifest IS the snapshot.**  ``_manifests/v{N}.json`` lists the
  data files live at version N.  Readers list ONE small JSON file and
  then read exactly those parquet files — no directory listing of
  ``data/`` (the object-store listing consistency trap), no partial
  state visible mid-commit.
* **Commit = atomic manifest creation.**  The manifest is written with
  O_EXCL (``open(..., "x")``): two writers racing to commit version N
  produce exactly one winner; the loser gets ``CommitConflict`` and
  retries on top of the new state (optimistic concurrency, the
  Delta protocol).  fsync'd before visible.
* **Rollback is a new commit**, never history rewrite: version K's
  file list re-published as version N+1, so the audit trail survives.
* **Vacuum** deletes data files unreferenced by the manifests kept
  after retention trimming — the only destructive operation, and it
  never touches files any surviving snapshot references.

At 100 TB the manifest holds file paths + row counts, not data; commit
cost is O(new files), read planning O(manifest).  Scaling manifests
past millions of files needs manifest sharding (Iceberg's avro
manifest lists) — out of scope, noted for honesty.
"""

from __future__ import annotations

import json
import os

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
        if f.startswith("v") and f.endswith(".json"))


def _load_manifest(table_path: str, version: int) -> dict:
    with open(_manifest_path(table_path, version)) as fh:
        return json.load(fh)


def commit(spark: SparkSession, table_path: str, df: DataFrame,
           mode: str = "append",
           expect_base: int | None = None) -> int:
    """Write ``df`` as a new snapshot and return its version.

    mode='append' keeps the previous snapshot's files and adds the new
    ones; mode='overwrite' starts the file list fresh.  Raises
    CommitConflict if another writer claimed the version first (data
    files written by the loser are orphans; vacuum reclaims them).

    ``expect_base`` pins the snapshot this commit believes is latest
    (read-your-base optimistic concurrency): a writer that planned its
    append against version K passes expect_base=K, and if anyone
    committed K+1 meanwhile the O_EXCL manifest creation loses and the
    writer must re-plan — without it, a racing append would silently
    base itself on a snapshot it never read."""
    assert mode in ("append", "overwrite"), mode
    vs = versions(table_path)
    base = expect_base if expect_base is not None \
        else (vs[-1] if vs else None)
    version = (base if base is not None else -1) + 1

    staging = os.path.join(table_path, "data", f"v{version}")
    df.write.mode("overwrite").parquet(staging)
    new_files = sorted(
        os.path.join(staging, f) for f in os.listdir(staging)
        if f.endswith(".parquet"))
    n_rows = spark.read.parquet(staging).count()

    prev_files = (_load_manifest(table_path, base)["files"]
                  if base is not None and mode == "append" else [])
    manifest = {
        "version": version,
        "mode": mode,
        "files": prev_files + new_files,
        "added_files": len(new_files),
        "added_rows": n_rows,
    }
    os.makedirs(_manifest_dir(table_path), exist_ok=True)
    try:
        # O_EXCL: exactly one writer wins version N
        with open(_manifest_path(table_path, version), "x") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed") from exc
    return version


def committed_batch_ids(table_path: str) -> set:
    """Batch ids already durably committed (see streaming_sink)."""
    return {
        m["batch_id"]
        for m in (_load_manifest(table_path, v)
                  for v in versions(table_path))
        if m.get("batch_id") is not None
    }


def streaming_sink(spark: SparkSession, table_path: str):
    """Exactly-once streaming sink: a foreachBatch function that
    appends each micro-batch as one snapshot, stamping the manifest
    with the batch id.  On failure-replay Spark re-delivers a batch
    under the SAME id; the stamp makes the dedup check durable in the
    table itself (not in the checkpoint, which can be lost or point at
    a restored copy of the table), so the replayed batch is skipped
    and the committed data appears exactly once.  The transactional
    version of jobs.idempotent_batch_sink's partition-overwrite
    idempotence: here even a commit torn mid-write is invisible (no
    manifest -> no snapshot) and retried cleanly."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table_path):
            return
        vs = versions(table_path)
        base = vs[-1] if vs else None
        version = (base if base is not None else -1) + 1
        staging = os.path.join(table_path, "data",
                               f"v{version}-b{batch_id}")
        batch_df.write.mode("overwrite").parquet(staging)
        new_files = sorted(
            os.path.join(staging, f) for f in os.listdir(staging)
            if f.endswith(".parquet"))
        prev_files = (_load_manifest(table_path, base)["files"]
                      if base is not None else [])
        manifest = {
            "version": version,
            "mode": "stream-append",
            "batch_id": batch_id,
            "files": prev_files + new_files,
            "added_files": len(new_files),
            "added_rows": batch_df.sparkSession.read
                                  .parquet(staging).count(),
        }
        os.makedirs(_manifest_dir(table_path), exist_ok=True)
        with open(_manifest_path(table_path, version), "x") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
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
    version = versions(table_path)[-1] + 1
    manifest = {
        "version": version,
        "mode": f"rollback->{to_version}",
        "files": old["files"],
        "added_files": 0,
        "added_rows": 0,
    }
    try:
        with open(_manifest_path(table_path, version), "x") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed") from exc
    return version


def history(table_path: str) -> list[dict]:
    return [
        {k: m[k] for k in
         ("version", "mode", "added_files", "added_rows")}
        for m in (_load_manifest(table_path, v)
                  for v in versions(table_path))
    ]


def vacuum(table_path: str, keep_last: int = 2) -> int:
    """Drop all but the last ``keep_last`` manifests, then delete data
    files no surviving manifest references (orphans from conflicted or
    superseded commits included).  Returns files deleted."""
    vs = versions(table_path)
    dead_versions = vs[:-keep_last] if keep_last > 0 else vs[:-1]
    live = set()
    for v in vs:
        if v not in dead_versions:
            live.update(_load_manifest(table_path, v)["files"])
    for v in dead_versions:
        os.remove(_manifest_path(table_path, v))

    deleted = 0
    data_root = os.path.join(table_path, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            p = os.path.join(dirpath, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
                deleted += 1
    return deleted
