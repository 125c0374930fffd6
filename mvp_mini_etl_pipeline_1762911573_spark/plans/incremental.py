"""Incremental aggregate maintenance (EXT, SURVEY §2.13 M9): keep a
materialized per-key aggregate current as new data batches arrive,
WITHOUT rescanning history — the materialized-view delta-merge every
continuously-ingesting pipeline needs (per-source corpus stats, token
inventories, engagement rollups).

No reference counterpart (the reference recomputes its dashboard
metrics from scratch per run, src/lib/randomuser.js:117-122 — viable
at 1,240 rows, not at 100 TB/day ingest).

The core idea is standard IVM over MERGEABLE aggregation states:
store, per key, the partial-aggregate state (count, sum, min, max —
every state here is commutative/associative), aggregate ONLY the new
batch, and combine states key-wise.  Per refresh the cost is
O(batch) + O(state), never O(history); the merge is a single
outer-join-free union + groupBy (states are just re-reduced), so the
only shuffle carries per-key states.  avg is DERIVED (sum/count) at
read time — storing it directly would make the state non-mergeable,
the classic IVM mistake.

Durability uses the same staging-dir atomic-rename protocol as
sinks.compact_parquet: a torn refresh can never leave a half-written
state table.

Invariant (pytest-pinned, tests/test_sinks.py): folding batches
1..k incrementally == aggregating the concatenation from scratch,
for every prefix k and any batch order.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

#: state columns maintained per (source,) key — all mergeable
_STATE_AGGS = [
    F.count("*").alias("n_docs"),
    F.sum("n_chars").alias("sum_chars"),
    F.min("n_chars").alias("min_chars"),
    F.max("n_chars").alias("max_chars"),
]
_MERGE_AGGS = [
    F.sum("n_docs").alias("n_docs"),
    F.sum("sum_chars").alias("sum_chars"),
    F.min("min_chars").alias("min_chars"),
    F.max("max_chars").alias("max_chars"),
]
STATE_COLS = ["source", "n_docs", "sum_chars", "min_chars", "max_chars"]


def batch_state(batch: DataFrame) -> DataFrame:
    """Reduce ONE new batch to its per-key partial states."""
    return batch.groupBy("source").agg(*_STATE_AGGS)


def merge_states(prev: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two state tables key-wise.  union + re-reduce (not an
    outer join): the states are elements of a commutative monoid, so
    re-running the merge aggregates over the stacked rows is both the
    simplest and the cheapest formulation — one groupBy whose shuffle
    carries per-key states from both sides."""
    return prev.select(*STATE_COLS).unionByName(
        delta.select(*STATE_COLS)).groupBy("source").agg(*_MERGE_AGGS)


def refresh(spark, state_path: str, batch: DataFrame) -> DataFrame:
    """Fold one batch into the durable state table (create on first
    call) with the staging-dir atomic-rename commit, and return the
    refreshed state.

    Swap protocol (the compact_parquet one, backup step included): the
    old state moves ASIDE to ``.prev`` before the staged state renames
    into place, and ``.prev`` is deleted only after the new state is
    live — a crash anywhere in the window leaves either the old state
    or a recoverable backup, never nothing (rmtree-then-rename would
    silently re-initialize history from the next single batch).  A
    leftover ``.prev`` from a crashed refresh is restored on the next
    call before merging."""
    prev_path = state_path + ".prev"
    if os.path.exists(prev_path) and not os.path.exists(state_path):
        # crashed between moving the old state aside and publishing
        # the new one: the backup IS the state — restore and refold
        os.rename(prev_path, state_path)

    delta = batch_state(batch)
    if os.path.exists(state_path):
        prev = spark.read.parquet(state_path)
        new_state = merge_states(prev, delta)
    else:
        new_state = delta.select(*STATE_COLS)
    staged = state_path + ".staging"
    new_state.write.mode("overwrite").parquet(staged)
    # read back BEFORE swapping: new_state's plan still reads the old
    # files; the returned frame must survive the rename
    committed = spark.read.parquet(staged).localCheckpoint(eager=True)
    if os.path.exists(prev_path):
        shutil.rmtree(prev_path)
    if os.path.exists(state_path):
        os.rename(state_path, prev_path)
    os.rename(staged, state_path)
    if os.path.exists(prev_path):
        shutil.rmtree(prev_path)
    return committed


def report(state: DataFrame) -> DataFrame:
    """Read-time view over the state: derived columns (avg) computed
    here, never stored."""
    return state.select(
        "source", "n_docs", "sum_chars", "min_chars", "max_chars",
        F.round(F.col("sum_chars") / F.col("n_docs"), 4)
         .alias("avg_chars"),
    )
