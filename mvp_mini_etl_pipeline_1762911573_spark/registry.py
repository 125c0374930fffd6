"""Assembles the driver contract: every implemented query from
SURVEY.md §2 with (where SQL-expressible) its DuckDB oracle.

Each operator module exposes ``QUERIES: dict[str, callable]`` (callable
takes (spark, sf_dir) -> DataFrame) and ``ORACLES: dict[str, str]``.
Names missing from ORACLES get the driver's weaker rows-only check
(non-SQL-expressible ops: LSH, approx sketches, streaming state).

Verification-window management
------------------------------
The driver's per-round CORRECTNESS check runs the FIRST 50 queries in
registry insertion order and stops.  Rather than encoding that contract
implicitly in module ordering (fragile: adding a query to an early
module silently pushes a later debut query out of the window),
``WINDOW_PRIORITY`` below names the queries that must occupy the front
of the registry, in order.  Everything else follows in module order.
Rotating coverage for a new round = editing one list.

Round-5 window (current): the 3 round-4 RED rows first — table_diff,
inverted_index (ARRAY output columns the driver's pandas canon cannot
hash; now array_join'd) and events_debounce (raw unrounded DOUBLE;
now round(value, 4)) — their round-4 official rows are the only
non-green rows in the contract and MUST be replaced.  Then the 2
sketch queries promoted rows-only → hash tier under sketch-contract
oracles (agg_approx_percentiles, agg_approx_count_distinct: exact
stats oracle-checked + literal-TRUE accuracy-bound booleans), then
the 4 round-5 debuts (ks_test, gini_concentration, benford_digits,
text_entropy), then the 41 round-1 greens that could not fit in the
round-4 window (rotation_report r1 tier).  3 + 2 + 4 + 41 = 50:
exactly full.  Every round-2 green is at worst 3 rounds stale going
into round 6 — the structural bound test_registry.py enforces.

ROTATION NOTE (round 6): any round-6 debuts go FIRST, then the
stalest tier is the round-2 greens (agg_collect, agg_grouping_sets,
agg_percentiles, corpus_curate, ... — do NOT hand-count: run
`python scripts/rotation_report.py`, which derives each query's
latest official row from the CORRECTNESS_r*.json files and prints the
stalest-first candidate list sized to the window; round 2's and round
3's bookkeeping slips were both hand-count drift).

ROTATION SCHEDULE (standing, documented per round-2 verdict #6): a
50-row window over N registered queries → a ceil(N/50)-round cycle.
At N=150 that kept every official row at most 2 rounds old; coverage
growth past 150 means up to (N-150) rows wait one extra round — the
deliberate trade (coverage over perfect freshness), bounded
mechanically by tests/test_registry.py's slack-aware invariant.
Every round: new queries land at the FRONT of the window; then fill
with the stalest greens (oldest official row first, per
rotation_report.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Queries hoisted, in this order, to the front of the registry (and
# therefore into the driver's 50-query CORRECTNESS window).  Names must
# exist; duplicates are an error.  Keep this list at exactly the window
# size so placement is deliberate, not accidental.
WINDOW_SIZE = 50
WINDOW_PRIORITY: list[str] = [
    # -- the 3 red round-4 rows, FIXED this round (driver-canon-safe
    #    output encodings: array_join'd arrays / rounded double) — they
    #    need fresh official rows more than anything else in the repo --
    "table_diff", "inverted_index", "events_debounce",
    # -- promoted rows-only -> hash tier via sketch-contract oracles ---
    "agg_approx_percentiles", "agg_approx_count_distinct",
    # -- the 4 round-5 debuts: verified the round they land ------------
    "ks_test", "gini_concentration", "benford_digits", "text_entropy",
    # -- the 41 round-1 greens that could not fit in round 4
    #    (rotation_report.py r1 tier, stalest-first order) -------------
    "agg_min_max", "agg_rollup", "agg_salted_twophase", "agg_stats",
    "array_cosine", "asof_join", "csv_flatten", "dedup_content_hash",
    "dedup_distinct", "dedup_exact", "dedup_near",
    "dedup_ngram_jaccard", "dedup_removed_count", "dedup_simhash",
    "embedding_centroids", "embedding_normalize", "filter_nonnull",
    "filter_valid_date", "join_anti", "join_broadcast", "join_equi",
    "join_left", "join_range", "join_semi", "limit_topn",
    "metrics_row", "set_except", "set_intersect", "set_intersect_all",
    "set_union", "similarity_join", "similarity_topk", "sort_limit1",
    "sort_multi", "udf_cosine", "validity_filter_counts",
    "window_lag", "window_last_user", "window_ntile_frame",
    "window_rank", "window_running_sum",
]


def _modules():
    from .operators import (aggregates, analytics, custom, dedup, joins,
                            projections, setops, similarity, sorts,
                            sqlapi, timeseries, tpch, windows)
    from .functions import multimodal, scalars, text
    from . import core
    from .sources import pyds
    from .streaming import batch_equiv
    return [sqlapi, scalars, text, multimodal, batch_equiv, custom,
            core, similarity, projections, sorts, windows, joins,
            aggregates, setops, dedup, tpch, analytics, timeseries,
            pyds]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    by_module: dict[str, Callable] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in by_module, f"duplicate query name: {name}"
            by_module[name] = fn

    assert len(WINDOW_PRIORITY) == len(set(WINDOW_PRIORITY)), \
        "duplicate names in WINDOW_PRIORITY"
    assert len(WINDOW_PRIORITY) == WINDOW_SIZE, (
        f"WINDOW_PRIORITY has {len(WINDOW_PRIORITY)} names; keep it at "
        f"exactly {WINDOW_SIZE} so window placement stays deliberate")
    missing = [n for n in WINDOW_PRIORITY if n not in by_module]
    assert not missing, f"WINDOW_PRIORITY names not registered: {missing}"

    out: dict[str, Callable] = {n: by_module[n] for n in WINDOW_PRIORITY}
    for name, fn in by_module.items():
        if name not in out:
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
