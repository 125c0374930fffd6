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

Round-13 window (current): the ONE r13 debut FIRST (dup_cluster_sizes
— the r12 verdict capped this round's debut budget at <=1 because the
r8-stale tier is 49 queries: 1 + 49 = exactly one 50-slot window),
then the ENTIRE 49-query round-8-stale tier (5 rounds without a fresh
row — the staleness ceiling enforced by
test_window_rotation_bounds_max_staleness).  The other three SURVEY
§7 r13 candidates (ttr_by_source, source_length_drift, burst_overlap)
are deliberately HELD for r14 per the verdict's slack arithmetic.
No rows-only ride-alongs this round (they rode in r11; next ~r16).
Outside a ride-along round, rows-only queries stay excluded from the
window — the driver records only `err: no_oracle` plus a row count
for them (r7's lesson; enforced by
test_window_contains_only_oracle_checked_queries, and skipped by
rotation_report.py's candidate list since r9).

ROTATION NOTE (round 13 → 14): the r9-stale tier is next (ab_test
leads it); put any round-13 debuts FIRST, budget the r14 debuts
against the tier size per rotation_report.py, keep
ROWS_ONLY_RIDE_ALONG empty until ~r16, then fill
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
#: every ~5 rounds they ride along once and the driver re-records
#: their row counts — a weaker check than the hash tier, but fresher
#: than a half-year-old row).  Normally rows-only queries stay out of
#: the window (the r7 lesson: the driver records `err: no_oracle`, so
#: a permanent slot is a wasted slot); the ride-along list is the
#: DELIBERATE, bounded exception, pinned by
#: test_window_contains_only_oracle_checked_queries to exactly these
#: names.  EMPTY for r12 (they rode in r11; next ride ~r16:
#: bpe_encode, dedup_near, dedup_simhash, similarity_join).
ROWS_ONLY_RIDE_ALONG: list[str] = []

WINDOW_PRIORITY: list[str] = [
    # ROUND-13 WINDOW (rotation_report.py's r13 plan + the r12 verdict
    # item 1: the ENTIRE 49-query round-8-stale tier rotates as one
    # beat, which caps the debut budget at ONE).  1 debut first, then
    # the 49 r8-stale greens (rotation_report slots 1-49).  1 + 49 =
    # 50: exactly full; no rows-only ride-alongs (they rode in r11;
    # next ~r16).
    # -- r13 debut (SURVEY §7 candidate, <=1 budget per r12 verdict) ----
    "dup_cluster_sizes",
    # -- the entire 49-query round-8-stale tier (5 rounds without a
    # fresh row — the staleness ceiling; rotation_report order) --------
    "agg_corr", "agg_histogram", "agg_hll_sketch", "agg_moments",
    "asof_forward", "bpe_pair_stats", "calibration_bins", "coalesce_id",
    "decontaminate", "decontaminate_filter", "dedup_clusters_star",
    "dedup_keep_best", "doc_chunk", "events_anomaly_mad",
    "events_zscore", "js_divergence", "logit_step", "minhash_lsh_join",
    "naive_bayes_train", "roc_auc", "sample_stratified",
    "scalar_string", "scalar_url", "scalar_variant", "similarity_ivf",
    "source_overlap", "spearman_corr", "sql_q13", "sql_q18", "sql_q22",
    "sql_q3", "sql_q4", "sql_q5", "sql_q7", "sql_recursive_cte",
    "stream_correlate", "stream_enrich", "stream_session",
    "stream_sliding", "stream_tumbling", "text_quality", "text_stats",
    "text_tfidf", "token_count", "udaf_mode", "unpivot_metrics",
    "winnow_fingerprint", "winnow_join", "zipf_fit",
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
