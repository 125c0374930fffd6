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

Round-9 window (current): the 4 r9 debuts FIRST (similarity_recall,
token_fertility, novelty_delta, host_dedup — debut count deliberately
small per the r8 verdict's freshness-over-debuts guidance), then
simhash_join, whose OUTPUT CHANGED this round (120-bit two-BIGINT
prints with 4x30-bit bands replace the r8 scale-weak 60-bit/4x15
form — the r8 green row certifies the old recipe, so it re-verifies
like a debut), then the ENTIRE 36-query round-3-stale tier (6 rounds
without a fresh row — retired in one beat, rotation_report's exact
list), then the 9 stalest round-4 greens (alphabetical; bpe_encode,
which sat between them by staleness, is rows-only and structurally
excluded).  Rows-only queries (similarity_join, dedup_near,
dedup_simhash, bpe_encode) are permanently excluded from the window —
the driver records only `err: no_oracle` for them, a wasted slot
(r7's lesson; enforced by
test_window_contains_only_oracle_checked_queries, and skipped by
rotation_report.py's candidate list since r9).

ROTATION NOTE (round 9 → 10): any round-9 debuts go FIRST, then fill
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
    # ROUND-9 WINDOW (rotation_report.py's r9 plan, verbatim, per the
    # r8 verdict's top task 2).  4 debuts + 1 output-contract change
    # first, then the FULL 36-query round-3-stale tier (6 rounds
    # without a fresh row), then the 9 stalest round-4 greens.
    # 5 + 36 + 9 = 50: exactly full; the remaining r4 greens
    # (bitmap_days, cdc_apply, chain_rcte, chi_square,
    # cusum_changepoint, ... — rotation_report slots 46+) wait for
    # r10, per the documented coverage-over-freshness trade (bounded
    # by the slack-aware backlog invariant in tests/test_registry.py).
    # Rows-only queries are structurally excluded from this list
    # (test_window_contains_only_oracle_checked_queries) — a slot the
    # driver can't verify is a slot wasted.
    # -- r9 debuts ------------------------------------------------------
    "similarity_recall", "token_fertility", "novelty_delta",
    "host_dedup",
    # -- r9 output-contract change: 120-bit prints / 4x30-bit bands
    # (the r8 green row certified the old 60-bit/4x15 recipe) ----------
    "simhash_join",
    # -- the entire 36-query round-3-stale tier (stalest-first,
    # rotation_report order) -------------------------------------------
    "funnel_steps", "gap_fill", "join_null_safe", "join_range_binned",
    "lm_score", "lm_score_bigram", "mix_sources", "project_nested",
    "retention_cohorts", "rolling_mau", "scd2_intervals", "scrub_pii",
    "seq_pack", "split_assign", "sql_q1", "sql_q10", "sql_q11",
    "sql_q12", "sql_q14", "sql_q15", "sql_q16", "sql_q17", "sql_q19",
    "sql_q2", "sql_q20", "sql_q21", "sql_q6", "sql_q8", "sql_q9",
    "synthetic_source", "text_repetition", "udtf_tokens", "vocab_topk",
    "window_cume_dist", "window_fill_forward", "window_range_frame",
    # -- 9 stalest round-4 greens (alphabetical; bpe_encode is
    # rows-only and skipped) -------------------------------------------
    "ab_test", "agg_avg_years", "agg_count", "agg_count_distinct",
    "agg_cube", "agg_group_count", "asof_nearest", "attribution",
    "basket_pairs",
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
