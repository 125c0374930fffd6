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

Round-3 window (current): the FULL 33-query backlog with no official
row after rounds 1-2 (round 2's rotation note undercounted it at 21 —
it missed agg_corr, agg_hll_sketch, decontaminate, events_zscore,
funnel_steps, gap_fill, lm_score, mix_sources, retention_cohorts,
scd2_intervals, vocab_topk, window_range_frame), plus
agg_approx_percentiles (round 2's only red row, re-verified after the
scalar-output fix), plus ALL 13 round-3 debut queries (breaking the
lands-after-the-window-freezes cycle both verdicts flagged: debuts now
displace stale greens, not the other way around), plus the 9 OLDEST
round-1 greens (two rounds stale).
ROTATION NOTE (round 4): no unverified backlog this time — every
registered query has an official row after round 3.  Fill round 4's
window with (a) any round-4 debuts FIRST, then (b) the stalest greens:
the 13 round-1 classics displaced this round (csv_flatten,
filter_nonnull, filter_valid_date, validity_filter_counts, join_equi,
join_broadcast, join_left, join_semi, join_anti, agg_count,
agg_count_distinct, agg_avg_years, agg_group_count) and the rest of the round-1 block (windows/sorts/
setops/dedup/similarity/metrics_row/asof/udf_cosine/rollup-cube-stats,
last verified in CORRECTNESS_r01).

ROTATION SCHEDULE (standing, documented per round-2 verdict #6): with
~134 registered queries and a 50-row window, a 3-round cycle keeps
every query's official row at most 2 rounds old:
  cycle slot A (this round): debut backlog + oldest round-1 classics
    (projections/filters/joins/aggs basics).
  cycle slot B (next round): the remaining round-1 greens not taken in
    slot A (windows/sorts/setops/dedup/similarity/metrics_row/asof/
    udf_cosine/rollup-cube-stats family, ~34 names) + any new debuts.
  cycle slot C (round after): the round-2 greens (sqlapi shapes,
    scalars, text, multimodal, streaming, fallbacks, sampling, IVF/
    quantize/merge/clusters) + any new debuts.
Every round: new queries land at the FRONT of next round's window;
then fill with the stalest greens (oldest official row first).
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
    # -- the 33-query backlog: landed after round 2's window froze ----
    # TPC-H shapes (15)
    "sql_q1", "sql_q2", "sql_q6", "sql_q8", "sql_q9", "sql_q10",
    "sql_q11", "sql_q12", "sql_q14", "sql_q15", "sql_q16", "sql_q17",
    "sql_q19", "sql_q20", "sql_q21",
    # event analytics E1-E6 (6)
    "funnel_steps", "retention_cohorts", "events_zscore",
    "scd2_intervals", "gap_fill", "window_range_frame",
    # EXT text/dedup/misc debuts (12)
    "decontaminate", "lm_score", "vocab_topk", "mix_sources",
    "doc_chunk", "seq_pack", "scrub_pii", "agg_corr", "agg_histogram",
    "agg_hll_sketch", "join_range_binned", "udtf_tokens",
    # -- round 2's only red row, re-verify after scalar-output fix ----
    "agg_approx_percentiles",
    # -- round-3 debuts: verified the round they land, no new backlog -
    "dedup_clusters_star", "asof_forward", "join_null_safe",
    "split_assign", "decontaminate_filter", "window_cume_dist",
    "events_anomaly_mad", "dedup_keep_best", "rolling_mau",
    "bpe_pair_stats", "window_fill_forward", "text_repetition",
    "lm_score_bigram",
    # -- 3 oldest round-1 greens (two rounds stale) -------------------
    "synthetic_source", "project_nested", "coalesce_id",
]


def _modules():
    from .operators import (aggregates, analytics, custom, dedup, joins,
                            projections, setops, similarity, sorts,
                            sqlapi, tpch, windows)
    from .functions import multimodal, scalars, text
    from . import core
    from .streaming import batch_equiv
    return [sqlapi, scalars, text, multimodal, batch_equiv, custom,
            core, similarity, projections, sorts, windows, joins,
            aggregates, setops, dedup, tpch, analytics]


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
