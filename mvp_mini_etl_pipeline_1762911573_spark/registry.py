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

Round-12 window (current): the 4 r12 debuts FIRST (lm_interp,
degree_powerlaw, dup_rate_by_source, length_percentiles — the
verdict-suggested SURVEY §7 candidate set, inside the <=5 debut
budget the r8 verdict set to protect freshness), then the ENTIRE
remaining 46-query round-7-stale tier (5 rounds without a fresh row —
the staleness ceiling enforced by
test_window_rotation_bounds_max_staleness).  No rows-only ride-alongs
this round (they rode in r11; next ~r16).  Outside a ride-along
round, rows-only queries stay excluded from the window — the driver
records only `err: no_oracle` plus a row count for them (r7's lesson;
enforced by test_window_contains_only_oracle_checked_queries, and
skipped by rotation_report.py's candidate list since r9).

ROTATION NOTE (round 12 → 13): the r8-stale tier is next (the window
is now on a clean ~5-round cycle); put any round-12 debuts FIRST,
keep ROWS_ONLY_RIDE_ALONG empty until ~r16, then fill
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
    # ROUND-12 WINDOW (rotation_report.py's r12 plan + the r11 verdict
    # item 1: the ENTIRE remaining 46-query round-7-stale tier rotates
    # as one beat).  4 debuts first, then the 46 r7-stale greens
    # (rotation_report slots 1-46).  4 + 46 = 50: exactly full; no
    # rows-only ride-alongs this round (they rode in r11).
    # -- r12 debuts (SURVEY §7 candidates, <=4 budget) -------------------
    "lm_interp", "degree_powerlaw", "dup_rate_by_source",
    "length_percentiles",
    # -- the entire 46-query round-7-stale tier (5 rounds without a
    # fresh row — the staleness ceiling; rotation_report order) --------
    "agg_percentiles", "attribution_linear", "bootstrap_ci", "cms_topk",
    "collapse_repeats", "collocation_pmi", "corpus_curate",
    "dedup_clusters", "dedup_containment", "dedup_embedding",
    "doc_fingerprint", "drift_psi", "embedding_quantize",
    "etl_fallback_log", "etl_fallback_metrics", "events_rate_limit",
    "gopher_rules", "importance_sample", "join_prefix_filter",
    "join_salted", "kaplan_meier", "kmeans_step", "lang_confusion",
    "lang_id", "mann_whitney", "merge_upsert", "multimodal_frames",
    "multimodal_schema", "mutual_info", "ngram_novelty",
    "pca_power_iter", "pivot_events", "quality_audit",
    "quantile_normalize", "rank_fusion", "raw_modal",
    "sample_cap_per_group", "sample_hash", "scalar_case", "scalar_date",
    "scalar_json", "scalar_map_json", "scalar_map_ops",
    "seasonal_envelope", "substring_dedup", "winsorize",
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
