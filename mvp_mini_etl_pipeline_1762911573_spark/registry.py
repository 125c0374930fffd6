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

Round-11 window (current): the 4 r11 debuts FIRST (heaps_law,
filter_funnel, burst_detect, dedup_semantic — the verdict-suggested
SURVEY §7 candidate set, inside the <=5 debut budget the r8 verdict
set to protect freshness), then the 4 rows-only ride-alongs
(ROWS_ONLY_RIDE_ALONG — r10 verdict item 7: the driver re-records
their row counts once per ~5 rounds; their official rows dated from
r4/r6), then the ENTIRE 39-query round-6-stale tier (5 rounds without
a fresh row — the staleness ceiling enforced by
test_window_rotation_bounds_max_staleness), then the 3 stalest
round-7 greens.  Outside a ride-along round, rows-only queries stay
excluded from the window — the driver records only `err: no_oracle`
plus a row count for them (r7's lesson; enforced by
test_window_contains_only_oracle_checked_queries, and skipped by
rotation_report.py's candidate list since r9).

ROTATION NOTE (round 11 → 12): empty ROWS_ONLY_RIDE_ALONG again, put
any round-11 debuts FIRST, then fill
from `python scripts/rotation_report.py` (it derives each query's
latest official row from CORRECTNESS_r*.json and prints the
stalest-first candidate list sized to the window; rounds 2, 3 AND 6
all slipped on this — round 6 never rotated at all, wasting a full
window beat re-verifying the freshest rows in the repo.  Do NOT
hand-count, and do NOT defer: tests/test_registry.py now FAILS if a
registered query without an official row is outside the window).

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

#: Rows-only queries riding the window THIS round (r10 verdict item 7:
#: their official rows dated from r4/r6, so every ~5 rounds they ride
#: along once and the driver re-records their row counts — a weaker
#: check than the hash tier, but fresher than a half-year-old row).
#: Normally rows-only queries stay out of the window (the r7 lesson:
#: the driver records `err: no_oracle`, so a permanent slot is a
#: wasted slot); the ride-along list is the DELIBERATE, bounded
#: exception, pinned by test_window_contains_only_oracle_checked_
#: queries to exactly these names.  Empty it again for r12.
ROWS_ONLY_RIDE_ALONG: list[str] = [
    "bpe_encode", "dedup_near", "dedup_simhash", "similarity_join",
]

WINDOW_PRIORITY: list[str] = [
    # ROUND-11 WINDOW (rotation_report.py's r11 plan + the r10 verdict:
    # the ENTIRE 39-query round-6-stale tier is the freshness ceiling
    # and rotates as one beat).  4 debuts first, then the 4 rows-only
    # ride-alongs (verdict item 7 — row counts re-recorded once per
    # ~5 rounds), then the 39 r6-stale greens, then the 3 stalest r7
    # greens.  4 + 4 + 39 + 3 = 50: exactly full; the remaining r7
    # tier (46 queries) waits for r12 — 5 rounds stale then, inside
    # the ceil(240/50)+1 = 6-round ceiling.
    # -- r11 debuts (SURVEY §7 candidates, <=5 budget) -------------------
    "heaps_law", "filter_funnel", "burst_detect", "dedup_semantic",
    # -- rows-only ride-alongs (weaker rows-only check by design) --------
    *ROWS_ONLY_RIDE_ALONG,
    # -- the entire 39-query round-6-stale tier (5 rounds without a
    # fresh row — the staleness ceiling; rotation_report order) --------
    "benford_digits", "csv_flatten", "dedup_content_hash",
    "dedup_distinct", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_removed_count", "embedding_centroids", "embedding_normalize",
    "events_debounce", "filter_nonnull", "filter_valid_date",
    "gini_concentration", "inverted_index", "join_anti",
    "join_broadcast", "join_equi", "join_left", "join_range",
    "join_semi", "ks_test", "limit_topn", "metrics_row", "set_except",
    "set_intersect", "set_intersect_all", "set_union",
    "similarity_topk", "sort_limit1", "sort_multi", "table_diff",
    "text_entropy", "udf_cosine", "validity_filter_counts",
    "window_lag", "window_last_user", "window_ntile_frame",
    "window_rank", "window_running_sum",
    # -- 3 stalest round-7 greens (rotation_report order) ---------------
    "acf_lags", "agg_collect", "agg_grouping_sets",
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
