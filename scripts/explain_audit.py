"""Emit `.explain("formatted")` for a representative slice of the
headline queries — the plan-shape audit trail (pushdown, broadcast,
exchange count, WholeStageCodegen spans) as a reviewable artifact.

Usage: python scripts/explain_audit.py [sf_dir] > PLANS_rN.md
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries  # noqa: E402
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402

AUDIT = [
    "metrics_row",        # flagship: scan->validate->dedup->join->agg
    "sql_q9",             # deepest TPC-H join tree
    "join_broadcast",     # broadcast dims, fact never shuffles
    "window_rank",        # one-exchange window
    "events_sessionize",  # round-4 debut: single reused partitioning
    "session_overlap",    # round-4: binned interval self-join
    "dedup_near",         # LSH: checkpointed signatures, banded join
    "decontaminate",      # broadcast gram index, corpus map-side
    "rolling_mau",        # user-days-bounded distinct rewrite
    "graph_triangles",    # two-path + closing-edge joins over edges
    "dedup_bloom",        # round-4: broadcast position-table filter
    "quantile_bins",      # round-4: 1-row cutoff broadcast + CASE
    "scd2_merge",         # round-4: anti/semi broadcast on delta keys
    "skew_report",        # round-4: TakeOrderedAndProject heavy hitters
    "source_crawl",       # round-4: Python DataSource scan -> agg
    "sample_priority",    # round-4: partial WindowGroupLimit pre-shuffle
    "basket_pairs",       # round-4: apriori prune before pair self-join
    "chain_rcte",         # round-4: recursive CTE (UnionLoop) traversal
    "join_fuzzy",         # round-4: blocked linkage join (no cartesian)
    "text_bm25",          # round-4: query-term-pruned posting shuffle
    "cdc_apply",          # round-4: one-shuffle log compaction window
    "rfm_segments",       # round-4: cutoff broadcast, no global ntile
    "asof_nearest",       # round-4: one sort, both frames in one pass
    "events_debounce",    # round-4: one shuffle reused by lag+cumsum+rank
    "time_bucket_ohlc",   # round-4: hash-agg rollup (scalar min_by key)
    "inverted_index",     # round-4: one-sort blocked posting lists
    "skyline_pareto",     # round-4: level-table window + broadcast back
    "attribution",        # round-4: window-carried last touch, no self-join
    "ks_test",            # round-5: broadcast grid bucketing, bounded window
    "gini_concentration",  # round-5: orders reduced before join/window
    "benford_digits",     # round-5: 9-key map-side agg
    "text_entropy",       # round-5: pure map-side HOFs + bounded sort
    "agg_approx_percentiles",  # round-5: sketch-contract single agg
    "winsorize",          # round-6: one per-group exchange, reused
    "quantile_normalize",  # round-6: single ranking exchange
    "collocation_pmi",    # round-6: reduced pair-table marginal joins
    "lang_confusion",     # round-6: map-side scoring + 25-cell window
    "substring_dedup",    # round-7: one gram shuffle + reduced-df join
    "dedup_containment",  # round-7: blocked equi-join, no cross product
    "gopher_rules",       # round-7: map-side rules, source-cardinality agg
    "importance_sample",  # round-7: broadcast max + map-side acceptance
    "events_rate_limit",  # round-7: one user exchange, RANGE window
    "sample_cap_per_group",  # round-7: one cell exchange, rank + agg
    "cms_topk",           # round-7: sketch-state partial agg + broadcast
    "kmeans_step",        # round-7: map-side assign, K-state agg
    "join_prefix_filter",  # round-7: rare-prefix blocking, no hot-gram skew
    "mann_whitney",       # round-7: distinct-value prefix sum, no global sort
    "drift_psi",          # round-7: broadcast decile row, map-side bucketing
    "acf_lags",           # round-7: one series exchange feeds all windows
    "ngram_novelty",      # round-7: one gram exchange, reduce + join reuse
    "kaplan_meier",       # round-7: user agg -> tiny curve-table windows
    "pca_power_iter",     # round-7: map-side coefficients, d-state reduce
    "bootstrap_ci",       # round-7: n×B partial-aggs to groups×B states
    "rank_fusion",        # round-7: two top-20 sort-limits, 40-row fusion
    "mutual_info",        # round-7: reduced cell table, 1-row reductions
    "seasonal_envelope",  # round-7: one (type, hour) exchange, 3 bands
    "attribution_linear",  # round-7: user-equi range join, no cartesian
    "logit_step",         # round-8: map-side terms, 1-row gradient state
    "naive_bayes_train",  # round-8: class-vocab reduce, top-K window
    "source_overlap",     # round-8: distinct gram reduce, |src|² fan-out
    "minhash_lsh_join",   # round-8: slot-min agg, band keys, stream verify
    "agg_moments",        # round-8: 5-number mergeable moment states
    "roc_auc",            # round-8: domain-bounded score table prefix sum
    "calibration_bins",   # round-8: map-side scoring, 10-bin agg
    "spearman_corr",      # round-8: shared status exchange, 6-number reduce
    "winnow_fingerprint",  # round-8: one doc exchange, two shared windows
    "winnow_join",        # round-8: df-pruned fingerprint self-join
    "simhash_join",       # round-8: vote agg, band buckets, popcount
    "zipf_fit",           # round-8: vocab reduce, WindowGroupLimit top-K
    "js_divergence",      # round-8: vocab reduce, |src|²-bounded pair join
    "similarity_recall",  # round-9: two bounded arms + broadcast join
    "token_fertility",    # round-9: vocab TakeOrdered + broadcast rejoin
    "novelty_delta",      # round-9: gram-keyed index join, linear
    "host_dedup",         # round-9: join-free two-level hash agg
    "mirror_detect",      # round-10: df-pruned lead-fp pair join
    "crawl_frontier",     # round-10: join-free two-level hash agg
    "source_perplexity",  # round-10: token-keyed vocab join + rollup
    "winnow_coverage",    # round-10: one doc exchange, lag audit
    "ivfpq_recall",       # round-10: three bounded arms, map-side PQ
    "heaps_law",          # round-11: doc-grain vocab reduce + bounded OLS
    "filter_funnel",      # round-11: one corpus pass, digest window, 1-row agg
    "burst_detect",       # round-11: hourly partial-agg, densified windows
    "dedup_semantic",     # round-11: broadcast centroids, within-cell pairs
    "lm_interp",          # round-12: bigram/unigram joins, exact mixture
    "dup_cluster_sizes",  # round-13: CC reuse + bounded histogram windows
    "sort_multi",         # round-13: TakeOrdered-then-rank (audit fix;
    #                       text_bm25 got the same fix — in list above)
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    queries = all_queries()
    print(f"# Plan audit at {sf_dir} (AQE on; formatted explain)\n")
    for name in AUDIT:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        print(f"## {name}\n\n```\n{buf.getvalue().rstrip()}\n```\n")


if __name__ == "__main__":
    main()
