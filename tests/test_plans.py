"""Physical-plan shape assertions (SURVEY.md §4): the optimizations we
rely on at 100 TB must actually appear in the plans — pushdown, column
pruning, broadcast joins, partial aggregation, no accidental cartesian
products."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import (
    flagship_metrics_row,
)
from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def _plan(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = (load(spark, sf_dir, "orders")
          .where(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_totalprice"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dim_joins_are_broadcast(spark, sf_dir):
    q = all_queries()["join_equi"](spark, sf_dir)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_agg_is_partial_then_final(spark, sf_dir):
    q = all_queries()["agg_stats"](spark, sf_dir)
    plan = _plan(q)
    # map-side combine: a partial_ aggregate before the exchange
    assert "partial_sum" in plan or "partial_count" in plan


def test_flagship_no_cartesian_and_single_id_shuffle(spark, sf_dir):
    plan = _plan(flagship_metrics_row(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_plans_as_take_ordered(spark, sf_dir):
    q = all_queries()["sort_limit1"](spark, sf_dir)
    plan = _plan(q)
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_key_shuffle(spark, sf_dir):
    """The as-of join must be union + ONE window over the key — no
    range join, no cartesian/BNLJ blowup."""
    plan = _plan(all_queries()["asof_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1
    assert "Union" in plan


def test_sql_q3_joins_not_cartesian(spark, sf_dir):
    plan = _plan(all_queries()["sql_q3"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan  # segment/priority reach the scans


def test_join_hints_respected(spark, sf_dir):
    """SHUFFLE_HASH and MERGE hints must pick ShuffledHashJoin /
    SortMergeJoin — the knobs for overriding Catalyst when cluster
    stats are wrong at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    sh = orders.join(customer.hint("shuffle_hash"),
                     orders.o_custkey == customer.c_custkey)
    assert "ShuffledHashJoin" in _plan(sh)
    sm = orders.join(customer.hint("merge"),
                     orders.o_custkey == customer.c_custkey)
    assert "SortMergeJoin" in _plan(sm)


def test_whole_stage_codegen_covers_scan_agg(spark, sf_dir):
    q = all_queries()["agg_stats"](spark, sf_dir)
    q.collect()  # AQE finalizes this plan only on ITS OWN execution
    executed = q._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans; scan-side partial
    # agg and final agg must both be inside one
    assert "*(1) HashAggregate" in executed
    assert "*(2) HashAggregate" in executed


def test_q4_exists_decorrelates_to_semi_join(spark, sf_dir):
    """EXISTS must become a (left-)semi join, not a per-row subquery."""
    plan = _plan(all_queries()["sql_q4"](spark, sf_dir))
    assert "LeftSemi" in plan or "Semi" in plan
    assert "CartesianProduct" not in plan


def test_q22_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    """NOT EXISTS must become an anti join; the scalar avg subquery is
    a 1-row broadcast (Subquery), not a rescan per row."""
    plan = _plan(all_queries()["sql_q22"](spark, sf_dir))
    assert "LeftAnti" in plan or "Anti" in plan
    assert "CartesianProduct" not in plan


def test_q5_dims_broadcast_no_cartesian(spark, sf_dir):
    """Q5's nation/region dims must broadcast; the only big join is
    orders-lineitem."""
    plan = _plan(all_queries()["sql_q5"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_probe_join_is_broadcast(spark, sf_dir):
    """IVF candidate generation must broadcast the tiny probe side —
    the corpus never shuffles for the cell equi-join."""
    plan = _plan(all_queries()["similarity_ivf"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """The co-located join: two tables bucketed (and sorted) on the
    join key by the SAME bucket count sort-merge-join with ZERO
    Exchange — the at-scale answer to 'this fact-fact join shuffles
    100 TB every run': pay the shuffle once at write time, then every
    subsequent join is map-side.  Asserts the executed plan contains a
    SortMergeJoin and no Exchange on either input."""
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice")
    (customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .option("path", str(tmp_path / "b_customer"))
     .mode("overwrite").saveAsTable("b_customer"))
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "b_orders"))
     .mode("overwrite").saveAsTable("b_orders"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"))
        joined.collect()
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in executed
        assert "Exchange" not in executed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """AQE skew-join: a hot join key must be SPLIT at runtime —
    SortMergeJoin(skew=true) / 'AQEShuffleRead ... skewed' in the final
    plan.  This is the automatic counterpart to the explicit
    join_salted operator.

    Two preconditions discovered the hard way, both worth pinning:
    * the skewed side's shuffle needs MULTIPLE map tasks — AQE splits a
      reduce partition by map-index ranges, so a single-file scan (one
      mapper, the test-scale default) is unsplittable; hence the
      repartition(8) upstream.  At 100 TB mappers number in the
      thousands — never a constraint.
    * the join output must have no downstream requirement on the join
      key (a groupBy on the same key right after suppresses the split,
      because duplicating the dim side's rows would break the required
      hash distribution).
    Detection thresholds are lowered to test-data sizes; the defaults
    (256 MB) are for real clusters."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load(spark, sf_dir, "orders")
        # fold every 10th orderkey onto hot key 0, then fan it out
        # 2000x: one reduce partition dwarfs the median
        fact = (
            orders
            .withColumn("k", F.when(F.col("o_orderkey") % 10 == 0,
                                    F.lit(0))
                              .otherwise(F.col("o_orderkey") % 1000))
            .withColumn("_x", F.explode(
                F.when(F.col("k") == 0, F.sequence(F.lit(1), F.lit(2000)))
                 .otherwise(F.array(F.lit(1)))))
            .select("k", "o_totalprice")
            .repartition(8)
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        j = (fact.join(dim, "k")
             # predicate spans both sides so it cannot push below the
             # join; result is empty but the shuffle still carries the
             # full skew
             .where(F.col("o_totalprice") + F.col("v") < 0))
        assert j.collect() == []
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_q2_min_cost_subquery_decorrelates(spark, sf_dir):
    """Q2's correlated min-cost scalar subquery must decorrelate into
    a per-part aggregate + rejoin — never a per-row rescan."""
    plan = _plan(all_queries()["sql_q2"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q17_correlated_avg_decorrelates(spark, sf_dir):
    """Q17's 0.5*avg(quantity)-per-part subquery: one aggregate pass,
    joined back — the correlation key becomes a join key."""
    plan = _plan(all_queries()["sql_q17"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q20_nested_in_becomes_semi_joins(spark, sf_dir):
    """Q20's nested IN subqueries must plan as (left-)semi joins."""
    plan = _plan(all_queries()["sql_q20"](spark, sf_dir))
    assert "Semi" in plan
    assert "CartesianProduct" not in plan


def test_q19_or_of_ands_no_cartesian(spark, sf_dir):
    """Q19's OR-of-ANDs spans both join inputs; Catalyst must still
    join on the common key and evaluate the disjunction post-join —
    the naive plan is a filtered cartesian."""
    plan = _plan(all_queries()["sql_q19"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


import pytest as _pytest

_TPCH_ALL = [f"sql_q{i}" for i in range(1, 23)]


@_pytest.mark.parametrize("name", _TPCH_ALL)
def test_tpch_plans_never_cartesian(spark, sf_dir, name):
    """Every one of the 22 TPC-H shapes must plan without a cartesian
    product — the one failure mode that silently works at test scale
    and detonates at 100 TB."""
    plan = _plan(all_queries()[name](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_doc_chunk_is_shuffle_free(spark, sf_dir):
    """Chunking is a per-row explode — the plan must contain no
    Exchange at all (chunk rows inherit the scan partitioning)."""
    plan = _plan(all_queries()["doc_chunk"](spark, sf_dir))
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark gram index is tiny at any corpus scale — the
    candidate join must be a BroadcastHashJoin (train corpus never
    shuffles for the join) and never a cartesian."""
    plan = _plan(all_queries()["decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_zscore_broadcasts_group_moments(spark, sf_dir):
    """Standardization must be agg-then-broadcast-rejoin, not an
    unbounded window over event_type (which would buffer whole groups
    on one task at scale)."""
    plan = _plan(all_queries()["events_zscore"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_no_query_plans_a_cartesian_product(spark, sf_dir):
    """Engine-wide invariant: NO registered query may plan a
    CartesianProduct — at 100 TB an n² cross join is a detonation, not
    a plan.  (Broadcast nested-loop joins against tiny literal tables
    are a different node and remain allowed where documented.)"""
    offenders = []
    for name, fn in all_queries().items():
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface the name
            offenders.append((name, f"plan failed: {e}"))
            continue
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
    assert not offenders, offenders


def test_no_query_uses_row_at_a_time_python(spark, sf_dir):
    """Engine-wide invariant: Python appears in plans ONLY as
    Arrow-vectorized evaluation (ArrowEvalPython / mapInPandas /
    applyInPandas) — never BatchEvalPython, the row-at-a-time UDF
    marker that is 10-100x slower and the #1 PySpark scale killer."""
    offenders = []
    for name, fn in all_queries().items():
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - surface the name
            offenders.append((name, f"plan failed: {e}"))
            continue
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_aqe_coalesces_overpartitioned_shuffle(spark, sf_dir):
    """AQE must shrink a massively over-provisioned shuffle at runtime
    (AQEShuffleRead coalesced) — the mechanism that makes one static
    spark.sql.shuffle.partitions setting survive 100TB-vs-100MB stage
    variance without per-job tuning."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    try:
        df = (load(spark, sf_dir, "events")
              .groupBy("event_type")
              .agg(F.count("*").alias("n")))
        df.collect()  # AQE final plan exists only after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_asof_nearest_one_sort_both_frames(spark, sf_dir):
    """asof_nearest's claim: BOTH directional carries come out of ONE
    union + ONE key shuffle + ONE sort — the backward and forward
    window frames share a (partition, order) spec, so they must land
    in a single WindowExec, with no second Exchange/Sort pair and no
    join node at all."""
    plan = _plan(all_queries()["asof_nearest"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "Union" in plan
    # the two directional carries must land in the SAME WindowExec:
    # exactly one Window node argument list mentions the backward carry
    # (last(_payload)), and that same list must also hold the forward
    # carry (first(_payload)) — a second window pass would split them.
    # (The shared input-dedup stage contributes its own row_number
    # window; that one mentions neither carry.)
    carry_args = [a for a in plan.split("\n")
                  if "last(_payload" in a]
    assert len(carry_args) == 1, f"{len(carry_args)} carry windows"
    assert "first(_payload" in carry_args[0]


def test_ohlc_uses_hash_aggregation(spark, sf_dir):
    """time_bucket_ohlc's claim: min_by/max_by on the packed SCALAR
    ordering key keep the rollup in HashAggregate — the natural
    struct(ts, value) key has no mutable fixed-width buffer, so Spark
    silently falls back to SortAggregate and every scan partition gets
    sorted by the group key before combining (this test failed against
    that formulation)."""
    plan = _plan(all_queries()["time_bucket_ohlc"](spark, sf_dir))
    assert "SortAggregate" not in plan, plan[:2000]
    assert "ObjectHashAggregate" not in plan, plan[:2000]
    assert "HashAggregate" in plan


def test_users_clean_dedup_is_hash_aggregated(spark, sf_dir):
    """clean_from's dedup must stay a pure HashAggregate: full-row
    distinct() has grouping keys only (no agg buffers), whereas the
    earlier dropDuplicates(['id']) planned first() aggregates whose
    var-length STRING buffers silently fell back to SortAggregate —
    two extra sorts in every clean-entity consumer (the r4->r5
    window_rank bench drift).  Same fallback family the OHLC test
    above pins."""
    from mvp_mini_etl_pipeline_1762911573_spark.tables import users_clean

    plan = _plan(users_clean(spark, sf_dir))
    assert "SortAggregate" not in plan, plan[:2000]
    assert "HashAggregate" in plan


def test_ks_test_grid_is_broadcast(spark, sf_dir):
    """ks_test's claim: the percentile grid reaches every row as a
    1-row BROADCAST (nested-loop cross of a single row), never a
    shuffle join, and the bucket aggregation is hash-based."""
    plan = _plan(all_queries()["ks_test"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def _top_level_lists(s: str) -> list[str]:
    out, depth, cur = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                cur = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(s[cur:i])
    return out


def _unpartitioned_window_count(plan: str) -> int:
    """Count physical Window nodes with an EMPTY partition spec — the
    exact condition for Spark's `WindowExec: No Partition Defined`
    warning.  Formatted-plan format: `Arguments: [exprs]` (no
    partition, no order), `[exprs], [orderSpec]` (no partition —
    order entries carry ASC/DESC NULLS markers, which is what
    distinguishes them from a partition-only `[exprs], [partSpec]`),
    or `[exprs], [partSpec], [orderSpec]` (partitioned).
    WindowGroupLimit nodes (different Arguments shape, always
    partition-pruned) are excluded by the exact node-name match."""
    import re

    n = 0
    for block in plan.split("\n\n"):
        lines = block.splitlines()
        if not lines or not re.match(r"\(\d+\) Window(\s|$)",
                                     lines[0].strip()):
            continue
        arg = next((ln for ln in lines if ln.startswith("Arguments:")),
                   "")
        lists = _top_level_lists(arg)
        if len(lists) == 1 or (
                len(lists) == 2 and (" ASC NULLS " in lists[1]
                                     or " DESC NULLS " in lists[1])):
            n += 1
    return n


#: queries ALLOWED to plan an unpartitioned (single-partition) Window,
#: each because the window provably runs over a BOUNDED frame — a
#: model-constant grid, a post-limit top-K, or a reduced domain-sized
#: table — never the raw stream (r12 verdict item 3: the WindowExec
#: warning is indistinguishable from a real scale bug in a log, so the
#: allowed emitters are enumerated and everything else must stay
#: silent).  Value = max allowed count of such nodes in the plan.
UNPARTITIONED_WINDOW_ALLOWED = {
    "benford_digits": 1,      # 9-row first-digit grid rank
    "chi_square": 1,          # levels x levels contingency grid
    "drift_psi": 3,           # decile-edge grid (10 buckets + ranks)
    "dup_cluster_sizes": 2,   # cluster-size histogram (<= max size)
    "funnel_steps": 1,        # 3-row funnel-stage frame
    "kaplan_meier": 3,        # distinct-duration risk table (time-
    #                           domain bounded; prefix sums over it)
    "ks_test": 2,             # percentile-grid CDF prefix sums
    "mann_whitney": 1,        # bucket-offset grid prefix sum (docstring
    #                           pins the <=200-row value grid)
    "rank_fusion": 3,         # two top-K retriever lists + fused rank
    "roc_auc": 1,             # quantized-threshold grid cumulative
    "skew_report": 1,         # rank over post-limit SKEW_TOP rows
    "skyline_pareto": 1,      # window form over the reduced candidate
    #                           frame (dominance prune first)
    "sort_multi": 1,          # rank over post-TakeOrdered 500 rows
    "text_bm25": 1,           # rank over post-TakeOrdered 20 rows
    "vocab_topk": 1,          # rank+coverage over post-limit VOCAB_K
}


def test_unpartitioned_windows_only_where_allowed(spark, sf_dir):
    """Engine-wide invariant (r12 verdict item 3): a query may move
    data through a single-partition Window ONLY if it is in the
    allow-list above (bounded frame by construction).  A new
    unbounded global window — the classic silent scale killer — fails
    this test instead of hiding among the known warnings.  The counts
    are pinned exactly, so a listed query GROWING a new unpartitioned
    window also fails."""
    offenders, counts = [], {}
    for name, fn in all_queries().items():
        try:
            counts[name] = _unpartitioned_window_count(
                _plan(fn(spark, sf_dir)))
        except Exception as e:  # pragma: no cover - surface the name
            offenders.append((name, f"plan failed: {e}"))
            continue
        allowed = UNPARTITIONED_WINDOW_ALLOWED.get(name, 0)
        if counts[name] > allowed:
            offenders.append((name, f"{counts[name]} unpartitioned "
                                    f"Window nodes (allowed {allowed})"))
    assert not offenders, offenders
    # the list must not go stale the other way either: every allowed
    # entry still exists and still plans at least one such window
    for name, allowed in UNPARTITIONED_WINDOW_ALLOWED.items():
        assert 1 <= counts[name] <= allowed, (
            f"{name}: {counts[name]} unpartitioned windows vs allowed "
            f"{allowed} — shrink/remove its allow-list entry")
