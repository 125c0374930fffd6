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

Round-4 window (current): ALL 43 round-4 debuts (verified the round
they land), then multimodal_pipeline (oracle-ified this round:
rows-only → hash tier, needs a fresh official row under the new
contract), then the 6 stalest round-1 greens.  43 + 1 + 6 = 50:
exactly full.  Forty-one round-1 greens could not fit once the debut
count grew past the original plan's 2 (agg_min_max, agg_rollup,
agg_salted_twophase, agg_stats, array_cosine, asof_join, csv_flatten,
dedup_content_hash, dedup_distinct, dedup_exact, dedup_near,
dedup_ngram_jaccard, dedup_removed_count,
dedup_simhash, embedding_centroids,
embedding_normalize, filter_nonnull,
filter_valid_date, join_anti,
join_broadcast, join_equi,
join_left, join_range, join_semi,
limit_topn, metrics_row, set_except, set_intersect,
set_intersect_all, set_union, similarity_join, similarity_topk,
sort_limit1, sort_multi, udf_cosine, validity_filter_counts,
window_lag, window_last_user, window_ntile_frame, window_rank,
window_running_sum) — they are the FIRST fill of the round-5 window.

ROTATION NOTE (round 5): any round-5 debuts go FIRST, then the 41
round-1 leftovers named above, then the stalest round-2 greens until
the window is full.  Do NOT hand-count: run
`python scripts/rotation_report.py`, which derives each query's
latest official row from the CORRECTNESS_r*.json files and prints the
stalest-first candidate list sized to the window (round 2's and round
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
    # -- the 43 round-4 debuts: verified the round they land -----------
    # (rotation_report.py order: registry insertion order)
    "events_sessionize", "events_path_transitions", "quantile_bins",
    "bpe_encode", "scd2_merge", "profile_columns", "graph_pagerank",
    "dedup_bloom", "graph_triangles", "skew_report", "session_overlap",
    "source_crawl", "sample_priority", "heavy_hitters", "chain_rcte",
    "basket_pairs", "window_ewma", "gap_fill_interp", "join_fuzzy",
    "text_bm25", "cdc_apply", "graph_bfs", "rfm_segments",
    "window_rolling_median", "asof_nearest", "entity_canonical",
    "quality_logit", "events_debounce", "feature_hash",
    "table_diff", "dq_check", "time_bucket_ohlc", "window_twap",
    "cusum_changepoint", "inverted_index", "bitmap_days",
    "skyline_pareto", "regr_by_group", "attribution", "ab_test",
    "chi_square", "mix_temperature", "stream_ohlc",
    # -- oracle-ified this round (rows-only -> hash tier) --------------
    "multimodal_pipeline",
    # -- the 6 stalest round-1 greens (alphabetical, the first 6 of
    #    rotation_report's r1 tier; the remaining 41 roll to round 5) --
    "agg_approx_count_distinct", "agg_avg_years", "agg_count",
    "agg_count_distinct", "agg_cube", "agg_group_count",
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
