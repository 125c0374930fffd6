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

Round-8 window (current): the 13 r8 debuts and re-contracted
promotions FIRST (logit_step, naive_bayes_train, source_overlap,
minhash_lsh_join, agg_moments, then the session-2 debuts roc_auc,
calibration_bins, spearman_corr, winnow_fingerprint, winnow_join,
zipf_fit, js_divergence, simhash_join; agg_hll_sketch and
sample_stratified were
promoted from rows-only to full sketch-contract oracles this round —
their output schemas changed, so each needs a fresh green row under
the new contract), then the ENTIRE 23-query round-2-stale tier
(5 rounds without a fresh row — retired in one beat: the
sql_q3/4/5/7/13/18/22 TPC-H group, the five stream_* batch-equiv
queries, scalar_string/url/variant, text_quality/stats/tfidf,
token_count, udaf_mode, unpivot_metrics, similarity_ivf,
sql_recursive_cte), then the 12 stalest round-3 greens.  Rows-only
queries (similarity_join, dedup_near, dedup_simhash, bpe_encode) are
permanently excluded from the window — the driver records only
`err: no_oracle` for them, a wasted slot (r7's lesson; enforced by
test_window_contains_only_oracle_checked_queries).

ROTATION NOTE (round 8 → 9): any round-8 debuts go FIRST, then fill
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
    # ROUND-8 WINDOW (rotation_report.py's r8 plan, verbatim, per the
    # r7 verdict's top task 1).  Debuts and contract changes first:
    # the 5 r8 debuts (logit_step, naive_bayes_train,
    # source_overlap, minhash_lsh_join, agg_moments) plus the two r8
    # sketch-contract promotions (agg_hll_sketch, sample_stratified —
    # their outputs changed, so they need a fresh green row under the
    # new contract), plus the 8 session-2 debuts (roc_auc,
    # calibration_bins, spearman_corr, winnow_fingerprint,
    # winnow_join, zipf_fit, js_divergence, simhash_join).  Then
    # the full 23-query
    # round-2-stale tier (5 rounds without a fresh row — retired in
    # one beat) and the stalest round-3 greens.
    # 15 + 23 + 12 = 50: exactly full; the 14 freshest-waiting r3
    # greens (funnel_steps, gap_fill, join_null_safe,
    # join_range_binned, lm_score,
    # lm_score_bigram, mix_sources, project_nested,
    # retention_cohorts, rolling_mau, scd2_intervals, scrub_pii,
    # seq_pack, split_assign) wait one round, per the documented
    # coverage-over-freshness trade (bounded by the slack-aware
    # backlog invariant in tests/test_registry.py).  Rows-only queries are structurally
    # excluded from this list (test_window_contains_only_oracle_
    # checked_queries) — a slot the driver can't verify is a slot
    # wasted.
    # -- r8 debuts + re-contracted promotions --------------------------
    "logit_step", "naive_bayes_train", "source_overlap",
    "minhash_lsh_join", "agg_moments", "agg_hll_sketch",
    "sample_stratified",
    # -- r8 session-2 debuts (evaluation + fingerprint family) ---------
    "roc_auc", "calibration_bins", "spearman_corr", "winnow_fingerprint",
    "winnow_join", "zipf_fit", "js_divergence", "simhash_join",
    # -- the entire 23-query round-2-stale tier (stalest-first) --------
    "scalar_string", "scalar_url", "scalar_variant", "similarity_ivf",
    "sql_q13", "sql_q18", "sql_q22", "sql_q3", "sql_q4", "sql_q5",
    "sql_q7", "sql_recursive_cte", "stream_correlate", "stream_enrich",
    "stream_session", "stream_sliding", "stream_tumbling",
    "text_quality", "text_stats", "text_tfidf", "token_count",
    "udaf_mode", "unpivot_metrics",
    # -- 12 stalest round-3 greens (alphabetical within the tier; the
    # 8 session-2 debuts evicted the tier's last 8 names —
    # funnel_steps, gap_fill, join_null_safe, join_range_binned,
    # lm_score, lm_score_bigram, mix_sources, project_nested wait one
    # round per the debuts-first rule) --------------------------------------------------------------
    "agg_corr", "agg_histogram", "asof_forward", "bpe_pair_stats",
    "coalesce_id", "decontaminate", "decontaminate_filter",
    "dedup_clusters_star", "dedup_keep_best", "doc_chunk",
    "events_anomaly_mad", "events_zscore",
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
