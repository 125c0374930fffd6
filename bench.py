"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Emission contract (r8 verdict #1): the driver captures only the LAST
~2000 bytes of stdout — r8's final line (51 queries + 51
anchor_ratios inline) outgrew that window and BENCH_r08.json recorded
"parsed": null, losing the headline signal.  The final stdout line is
now a COMPACT headline (<1 KB: metric/value/anchor/repro + per-query
count + a pointer), and the per-query timings + anchor_ratios are
written to BENCH_DETAIL_r{NN}.json (NN = next driver round, inferred
from the CORRECTNESS_r*.json already on disk) plus a stable-name
BENCH_DETAIL.json copy so the detail is reachable regardless of
whether the driver runs bench before or after the correctness sweep.

Headline set = the flagship ETL pipeline plus one representative of
each operator family (join, agg, window, dedup, similarity, text,
streaming-batch-equiv) — the queries whose plans matter at 100 TB.
Each query is timed to full materialization (count of the result, not
collect — we measure engine time, not driver transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
    warm_edges_cache,
)
from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark
from mvp_mini_etl_pipeline_1762911573_spark.tables import warm_users_cache

HEADLINE = [
    "metrics_row",          # flagship: scan→validate→dedup→join→agg
    "agg_stats",            # multi-stat scan-agg
    "sql_q1",               # TPC-H Q1: the canonical pricing summary
    "sql_q3",               # TPC-H Q3 shape via spark.sql
    "sql_q10",              # TPC-H Q10: decimal revenue top-20
    "sql_q9",               # TPC-H Q9: deepest join tree (6 tables)
    "sql_q18",              # TPC-H Q18 shape: HAVING over fact-fact join
    "join_equi",            # 3-way join + group
    "asof_join",            # union+window as-of join
    "window_rank",          # partitioned window
    "dedup_near",           # MinHash LSH near-dup
    "similarity_topk",      # brute-force cosine top-k
    "similarity_ivf",       # IVF ANN top-k (coarse-quantized)
    "similarity_join",      # multi-table LSH ANN join
    "text_stats",           # corpus stats
    "corpus_curate",        # end-to-end curation (filter+dedup+stats)
    "quality_audit",        # constraint sweep (1 agg pass per table)
    "stream_tumbling",      # windowed event agg (batch flavor)
    "decontaminate",        # train/benchmark n-gram overlap (broadcast)
    "lm_score",             # unigram-LM doc scoring (vocab join)
    "funnel_steps",         # sequential conditional aggregation
    "scd2_intervals",       # gaps-and-islands SCD2 build
    "dedup_clusters",       # iterative CC over within-cell dup edges
    "dedup_clusters_star",  # same clusters, large-star/small-star CC
    "gap_fill",             # spine densification (sequence explode)
    "time_bucket_ohlc",     # round 4: hash-agg hypertable rollup
    "inverted_index",       # round 4: blocked posting-list build
    "attribution",          # round 4: window-carried last-touch credit
    "ks_test",              # round 5: grid-bucketed KS distribution test
    "gini_concentration",   # round 5: DECIMAL-exact Lorenz/Gini
    "benford_digits",       # round 5: integer-cents first-digit audit
    "text_entropy",         # round 5: map-side char-entropy HOFs
    "substring_dedup",      # round 7: gram-df join substring audit
    "join_prefix_filter",   # round 7: rare-prefix similarity join
    "cms_topk",             # round 7: count-min sketch build + probe
    "events_rate_limit",    # round 7: RANGE-window throttling
    "kmeans_step",          # round 7: map-side assign + K-state agg
    "mann_whitney",         # round 7: distributed prefix-sum rank test
    "ngram_novelty",        # round 7: linear gram reduce + join-back
    "logit_step",           # round 8: map-side quantized gradient step
    "naive_bayes_train",    # round 8: class-vocab reduce NB trainer
    "source_overlap",       # round 8: source-pair gram overlap matrix
    "minhash_lsh_join",     # round 8: deterministic MinHash LSH join
    "roc_auc",              # round 8: domain-bounded rank AUC eval
    "spearman_corr",        # round 8: doubled-rank correlation
    "winnow_fingerprint",   # round 8: windowed-min gram fingerprints
    "winnow_join",          # round 8: df-pruned fingerprint pairing
    "simhash_join",         # round 8/9: banded 120-bit popcount join
    "js_divergence",        # round 8: source-pair JS divergence
    "similarity_recall",    # round 9: ANN recall-vs-random readout
    "token_fertility",      # round 9: per-language tokenizer pieces
    "novelty_delta",        # round 9: batch-over-corpus gram novelty
    "host_dedup",           # round 9: URL canonicalization rollup
    "mirror_detect",        # round 10: df-pruned cross-domain mirrors
    "crawl_frontier",       # round 10: two-level host priority reduce
    "source_perplexity",    # round 10: token-keyed LM rollup
    "winnow_coverage",      # round 10: winnowing-guarantee audit
    "ivfpq_recall",         # round 10: IVFADC quality readout
    "heaps_law",            # round 11: doc-grain Heaps'-law growth fit
    "filter_funnel",        # round 11: per-stage curation attrition
    "burst_detect",         # round 11: densified burst intervals
    "dedup_semantic",       # round 11: centroid-nearest SemDeDup
    "lm_interp",            # round 12: JM-interpolated bigram LM
    "degree_powerlaw",      # round 12: similarity-graph degree law
    "dup_rate_by_source",   # round 12: per-source dup-rate rollup
    "length_percentiles",   # round 12: per-source length order stats
    "dup_cluster_sizes",    # round 13: CC cluster-size tail histogram
]

#: the cross-machine timing anchors (ADVICE/verdict r7: two rounds in a
#: row, every query drifted by one uniform machine-speed factor and
#: wall-second deltas read as regressions).  r9 follow-up: a SINGLE
#: anchor is itself a noise source — sql_q9 sped up 2.07→1.65s in r9
#: and every ratio inflated ~1.25x, reading as a fleet-wide regression.
#: The normalizer is now the GEOMETRIC MEAN of three stable
#: heavyweights (scan-agg, 6-table join, fact-fact HAVING).  Not the
#: median: the three anchors are well separated in magnitude (~0.35 /
#: 0.73 / 2.1s), so a median just re-selects the middle one and its
#: solo drift would move every ratio — the r9 failure mode verbatim
#: (r10 review).  Under the geomean a 1.5x drift in ONE anchor moves
#: the normalizer only 1.5^(1/3) ≈ 1.14x, and a uniform machine-speed
#: factor still cancels exactly.  `anchor_ratios` divide each query's
#: seconds by it — compare RATIOS across rounds, never wall seconds.
ANCHORS = ["sql_q1", "sql_q9", "sql_q18"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = all_queries()

    # warm the JVM before the timed section: the first real job of a
    # session pays codegen compilation, executor-thread spin-up and
    # page-cache faults (~2-3s at sf0.1) that belong to session
    # startup, not to whichever query happens to run first.  One scan
    # + one tiny shuffle covers both code paths.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").count().collect()
    # ... and the localCheckpoint machinery: the FIRST checkpoint of a
    # session pays ~2s of one-time block-manager/codegen setup (same
    # cost on a 1-row RDD as on the real entity — measured 2.6s first
    # vs 0.5s second for the identical call), which belongs to session
    # startup exactly like the scan/shuffle warm-up above.  The
    # iterative queries (dedup_clusters*) absorb it in their discarded
    # cold run; users_materialize is a single timed cold build, so
    # without this line it books the machinery cost as its own.
    spark.range(1).localCheckpoint(eager=True)

    timings: dict[str, float] = {}

    # materialize the canonical users entity ONCE for the whole run —
    # 5 of the headline queries re-derive it otherwise.  Timed as its
    # own line item: the total stays honest (derivation paid once, not
    # hidden), which is exactly the 100-TB shape (entity materialized
    # per pipeline run, queries read the materialization).
    t0 = time.monotonic()
    warm_users_cache(spark, sf_dir)
    timings["users_materialize"] = round(time.monotonic() - t0, 3)
    print(f"# users_materialize: {timings['users_materialize']}s",
          file=sys.stderr)
    # ... and the SemDeDup candidate-edge table, the shared input of
    # dedup_embedding / dedup_clusters / dedup_clusters_star /
    # dedup_keep_best — materialized once per run (the production
    # shape: write the edge table, then cluster), timed as its own
    # line item so the total stays honest.
    t0 = time.monotonic()
    warm_edges_cache(spark, sf_dir)
    timings["edges_materialize"] = round(time.monotonic() - t0, 3)
    print(f"# edges_materialize: {timings['edges_materialize']}s",
          file=sys.stderr)
    # each query runs 3x — one discarded cold run (absorbs per-query
    # codegen/broadcast warm-up) then two timed warm runs with the MIN
    # reported.  Round 2's single-shot numbers let warm-up and
    # scheduler jitter masquerade as regression (four sub-second
    # comparisons burned on noise, VERDICT r2 'Performance'); min-of-2
    # warm is the standard noise-floor estimator and reproduces within
    # ~10% across back-to-back runs where second-of-2 still drifted
    # ~30% on the jittery iterative queries.
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        cold = round(time.monotonic() - t0, 3)
        warms = []
        for _ in range(2):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            warms.append(round(time.monotonic() - t0, 3))
        timings[name] = min(warms)
        print(f"# {name}: {timings[name]}s (cold {cold}s, "
              f"warms {warms}) rows={n}", file=sys.stderr)

    # reproducibility pass (round-3 verdict #5: the ±10% claim needs
    # in-record evidence, not just methodology): a SECOND full
    # min-of-2-warm sweep after every query has run once, reported as
    # the max per-query relative delta vs the first sweep.  Off-switch
    # for quick iteration: SPARK_GRAFT_BENCH_NO_REPRO=1.
    repro = None
    suspects: list[str] = []
    first_pass: dict[str, float] = {}
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_REPRO"):
        max_abs = 0.0
        sum_a = sum_b = 0.0
        repro_secs: dict[str, float] = {}
        for name in HEADLINE:
            fn = queries[name]
            warms = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                warms.append(time.monotonic() - t0)
            second = min(warms)
            repro_secs[name] = second
            # max ABS drift + total relative drift, not per-query
            # relative: sub-second queries jitter ~0.1s of scheduler
            # noise, which reads as a scary 40% while meaning nothing
            max_abs = max(max_abs, abs(second - timings[name]))
            sum_a += timings[name]
            sum_b += second
            print(f"# repro {name}: {round(second, 3)}s vs "
                  f"{timings[name]}s", file=sys.stderr)
        repro = {
            "total_delta_pct": round(abs(sum_b - sum_a) / sum_a, 4),
            "max_abs_delta_sec": round(max_abs, 3),
        }
        print(f"# repro totals: {round(sum_b, 3)}s vs {round(sum_a, 3)}s "
              f"(delta {repro['total_delta_pct']:.1%}, max abs "
              f"{repro['max_abs_delta_sec']}s)", file=sys.stderr)
        # divergence defense (r13 verdict "what's wrong" #1): the r13
        # driver run had a mid-run DAGScheduler failure + retry storm
        # land BOTH warm runs of 8 queries inside the failure window —
        # 21.3s of phantom cost that min-of-2 could not reject because
        # both of its samples were poisoned.  The repro sweep SAW the
        # divergence (max_abs 9.7s) and still reported the bad first-
        # pass number.  Now: any query whose two sweeps disagree by
        # more than 50% of the smaller AND by more than 0.25s absolute
        # (sub-second scheduler jitter stays exempt) is re-run
        # min-of-2 once more, and its reported time is the MIN ACROSS
        # ALL SIX samples; the first-pass value is preserved in the
        # detail file and the names ride the headline as `suspect`.
        # This changes only which of the already-measured samples is
        # reported for a divergent query — methodology (min-of-warm on
        # .count(), caches warm) is unchanged.
        for name in HEADLINE:
            a, b = timings[name], repro_secs[name]
            if abs(a - b) > max(0.25, 0.5 * min(a, b)):
                suspects.append(name)
        for name in suspects:
            fn = queries[name]
            retry = []
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                retry.append(time.monotonic() - t0)
            first_pass[name] = timings[name]
            timings[name] = round(
                min(timings[name], repro_secs[name], *retry), 3)
            print(f"# suspect {name}: first {first_pass[name]}s, "
                  f"repro {round(repro_secs[name], 3)}s, retry "
                  f"{[round(r, 3) for r in retry]} -> min "
                  f"{timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Fail LOUD if any anchor ever leaves HEADLINE or degenerates:
    # a silent 1.0 fallback would make anchor_ratios equal raw wall
    # seconds — machine-dependent again — with nothing flagging it
    # (r8 review finding).
    missing = [a for a in ANCHORS
               if a not in timings or timings[a] <= 0.0]
    if missing:
        raise SystemExit(
            f"bench anchors {missing!r} missing or zero-timed; "
            "anchor_ratios would silently degrade to wall seconds")
    prod = 1.0
    for a in ANCHORS:
        prod *= timings[a]
    anchor_sec = round(prod ** (1.0 / len(ANCHORS)), 4)
    detail = {
        "queries": timings,
        # machine-speed-invariant view: seconds / geomean-anchor
        # seconds.  Compare THESE across rounds; wall-second deltas on
        # different machines are dominated by the host factor (r6->r7
        # lesson, twice), and a single anchor's own drift moved every
        # r9 ratio — the geomean of three dilutes one drifter to its
        # cube root (see ANCHORS).
        "anchors": ANCHORS,
        "anchor_secs": {a: timings[a] for a in ANCHORS},
        "anchor": "geomean(%s)" % ",".join(ANCHORS),
        "anchor_sec": anchor_sec,
        "anchor_ratios": {k: round(v / anchor_sec, 3)
                          for k, v in timings.items()},
    }
    if first_pass:
        # the pre-retry numbers for divergent queries, kept per the
        # "keep the old numbers too" bench-contract rule
        detail["suspect_first_pass"] = {
            k: round(v, 3) for k, v in first_pass.items()}
    repo = os.path.dirname(os.path.abspath(__file__))
    # Current-round inference (r9 review finding: a bare
    # max(CORRECTNESS)+1 mislabels by +1 whenever the driver runs the
    # correctness sweep BEFORE bench — which it does, per the r8
    # artifact mtimes).  The driver writes CORRECTNESS_rN during round
    # N but BENCH_rN only after this process exits, so:
    #   max(C) >  max(B)  → round max(C) is in flight (post-sweep)
    #   otherwise         → the latest recorded round is done; we are a
    #                       pre-sweep run of the NEXT one.  max(C, B)+1,
    #                       not max(C)+1: after a bench-only round
    #                       (max_b > max_c) the bare form would relabel
    #                       itself into an ALREADY-RECORDED round and
    #                       overwrite its detail file (r9 ADVICE).
    def _rounds(prefix: str) -> int:
        return max((int(m.group(1)) for f in os.listdir(repo)
                    if (m := re.match(rf"{prefix}_r(\d+)\.json$", f))),
                   default=0)
    max_c, max_b = _rounds("CORRECTNESS"), _rounds("BENCH")
    this_round = max_c if max_c > max_b else max(max_c, max_b) + 1
    detail_name = f"BENCH_DETAIL_r{this_round:02d}.json"
    # self-identifying copy: the headline totals ride inside the
    # detail file, so a mislabeled or stale file is detectable on
    # sight instead of silently impersonating another round's numbers
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail.update({"metric": "headline_total", "value": total,
                   "unit": "sec", "sf": sf_val,
                   "n_queries": len(timings), "timing": "min-of-2-warm"})
    for name in (detail_name, "BENCH_DETAIL.json"):
        with open(os.path.join(repo, name), "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    record = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "anchor": "geomean(%s)" % ",".join(ANCHORS),
        "anchor_sec": anchor_sec,
        "detail": detail_name,
        "sf": sf_val,
        # methodology marker (ADVICE r3): totals before round 3 were
        # single cold runs — cross-round deltas spanning the switch
        # partly reflect methodology, and this field makes that break
        # detectable in the record itself
        "timing": "min-of-2-warm",
    }
    if repro is not None:
        record["repro"] = repro
    if suspects:
        # names whose sweeps diverged and were re-measured (see the
        # repro block); cap the inline list so the headline stays
        # under the driver's ~2000B tail-capture window
        record["suspect"] = (suspects if len(suspects) <= 10
                             else len(suspects))
    line = json.dumps(record)
    # hard-fail, never assert: asserts vanish under python -O, which
    # would silently re-enable the r8 parsed:null regression (review)
    if len(line) >= 1000:
        raise SystemExit(
            f"headline line grew to {len(line)}B; the driver tail "
            "capture is ~2000B — keep per-query data in the detail file")
    print(line)


if __name__ == "__main__":
    main()
