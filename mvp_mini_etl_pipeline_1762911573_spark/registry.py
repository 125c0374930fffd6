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

Round-10 window (current): the 5 r10 debuts FIRST (mirror_detect,
crawl_frontier, source_perplexity, winnow_coverage, ivfpq_recall —
the verdict-suggested candidate set, at the <=5 debut budget the r8
verdict set to protect freshness), then similarity_recall (its
n_queries derivation moved to the exact arm per the r9 ADVICE —
values identical on the fixtures, re-windowed as insurance), then
the ENTIRE 36-query round-4-stale remainder (6 rounds without a
fresh row — the ceil(N/50)+1 staleness ceiling enforced by
test_window_rotation_bounds_max_staleness), then the 8 stalest
round-6 greens.  Rows-only queries (similarity_join, dedup_near,
dedup_simhash, bpe_encode) are permanently excluded from the window —
the driver records only `err: no_oracle` for them, a wasted slot
(r7's lesson; enforced by
test_window_contains_only_oracle_checked_queries, and skipped by
rotation_report.py's candidate list since r9).

ROTATION NOTE (round 10 → 11): any round-10 debuts go FIRST, then fill
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
WINDOW_PRIORITY: list[str] = [
    # ROUND-10 WINDOW (rotation_report.py's r10 plan: the ENTIRE
    # 36-query round-4-stale remainder is at the ceil(N/50)+1 = 6-round
    # staleness ceiling and rotates as one beat, per the r9 verdict's
    # top task).  5 debuts + 1 derivation-clarified re-verify first,
    # then the 36 r4-stale, then the 8 stalest round-6 greens.
    # 6 + 36 + 8 = 50: exactly full; the remaining 6 r6 greens
    # (benford_digits .. dedup_ngram_jaccard, rotation_report slots
    # 45+) wait for r11 — 5 rounds stale then, inside the ceiling.
    # Rows-only queries are structurally excluded from this list
    # (test_window_contains_only_oracle_checked_queries) — a slot the
    # driver can't verify is a slot wasted.
    # -- r10 debuts -----------------------------------------------------
    "mirror_detect", "crawl_frontier", "source_perplexity",
    "winnow_coverage", "ivfpq_recall",
    # -- r10 derivation change, values identical (r9 ADVICE: n_queries
    # now counted from the exact arm on both engines) — re-windowed as
    # cheap insurance even though the r9 row's hashes still hold -------
    "similarity_recall",
    # -- the entire 36-query round-4-stale tier (6 rounds without a
    # fresh row — the staleness ceiling; rotation_report order) --------
    "bitmap_days", "cdc_apply", "chain_rcte", "chi_square",
    "cusum_changepoint", "dedup_bloom", "dq_check", "entity_canonical",
    "events_path_transitions", "events_sessionize", "feature_hash",
    "gap_fill_interp", "graph_bfs", "graph_pagerank", "graph_triangles",
    "heavy_hitters", "join_fuzzy", "mix_temperature",
    "multimodal_pipeline", "profile_columns", "quality_logit",
    "quantile_bins", "regr_by_group", "rfm_segments", "sample_priority",
    "scd2_merge", "session_overlap", "skew_report", "skyline_pareto",
    "source_crawl", "stream_ohlc", "text_bm25", "time_bucket_ohlc",
    "window_ewma", "window_rolling_median", "window_twap",
    # -- 8 stalest round-6 greens (rotation_report order) ---------------
    "agg_approx_count_distinct", "agg_approx_percentiles",
    "agg_min_max", "agg_rollup", "agg_salted_twophase", "agg_stats",
    "array_cosine", "asof_join",
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
