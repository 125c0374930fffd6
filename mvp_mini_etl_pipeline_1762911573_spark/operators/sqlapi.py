"""SQL-API surface + pivot + percentiles (relational completeness
beyond SURVEY.md §2's literal inventory).

The engine's second front door: `spark.sql` over registered temp views
— identical Catalyst plans to the DataFrame API, proven by running a
TPC-H-Q3-shaped query through it.  Pivot is the classic wide-format
report (conditional aggregation under the hood); percentiles cover the
exact (sort-based) and approximate (t-digest/GK sketch) paths.

Scale notes: pivot with an explicit value list is a single pass of
conditional aggregates (no shuffle beyond the groupBy); exact
percentile sorts per group — at 100 TB use approx_percentile (constant
memory, mergeable sketches), shipped here as the rows-only variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.scalars import duck_json_lead
from ..functions.exact import (finite_or_null, finite_or_null_sql,
                               finite_portable_sql, money_dec,
                               money_ok, money_ok_portable_sql,
                               money_ok_sql, money_sum,
                               money_sum_portable_sql, money_sum_sql,
                               rate_ok_portable_sql,
                               rev_sum_portable_sql,
                               round4_ratio_dec, round4_ratio_dec_sql)
from ..tables import load

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the spark.sql front door: top-10 urgent
    un-shipped orders by revenue."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(f"""
        SELECT o_orderkey,
               {rev_sum_portable_sql()}
                 AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
               o_orderpriority
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderpriority = '1-URGENT'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """)


def _sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue by nation inside
    one region/year, customer and supplier constrained to the SAME
    nation.  The join-order stressor: Catalyst + AQE must broadcast the
    tiny dims (nation/region) and keep the one big fact-fact join
    (orders⋈lineitem) as the single large shuffle."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(f"""
        SELECT n_name AS nation,
               {rev_sum_portable_sql()}
                 AS revenue
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_supplier ON l_suppkey = s_suppkey
                       AND c_nationkey = s_nationkey
        JOIN v_nation ON s_nationkey = n_nationkey
        JOIN v_region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """)


def _sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bidirectional trade volume
    between two geographies by ship year.  Two self-referencing nation
    dims (n1 supplier-side, n2 customer-side) — both broadcast; the
    ship-date filter pushes to the lineitem scan."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {rev_sum_portable_sql()}
                 AS revenue
        FROM v_supplier
        JOIN v_lineitem ON s_suppkey = l_suppkey
        JOIN v_orders ON o_orderkey = l_orderkey
        JOIN v_customer ON c_custkey = o_custkey
        JOIN v_nation n1 ON s_nationkey = n1.n_nationkey
        JOIN v_nation n2 ON c_nationkey = n2.n_nationkey
        JOIN v_region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN v_region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
    """)


def _sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold, top-100 by price.

    Written in the push-agg-below-join form Catalyst does NOT derive
    itself: lineitem pre-aggregates per l_orderkey (a narrow 2-column
    shuffle) and the HAVING prunes ~99% of orders BEFORE any join —
    the naive join-then-group form shuffles the full
    customer⋈orders⋈lineitem output on a 5-column key.  Same result
    set (l_orderkey is the join key AND the agg key), same oracle; at
    100 TB this is the difference between one narrow shuffle and a
    wide fact-fact shuffle.  Top-100 is TakeOrderedAndProject — no
    global sort materializes."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM v_lineitem
          GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        )
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
               o_totalprice, total_qty
        FROM big
        JOIN v_orders ON o_orderkey = l_orderkey
        JOIN v_customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """)


def _sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS correlated
    subquery — Catalyst decorrelates it to a left-semi join on
    l_orderkey, so the lineitem side never materializes per-row.  The
    plan to want at 100×: semi-join build on the filtered orders, no
    subquery re-execution."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS order_cnt
        FROM v_orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
          AND EXISTS (SELECT 1 FROM v_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


def _sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a predicate INSIDE the join condition (not a post-filter
    — a post-filter would silently turn the outer join inner), then a
    two-level aggregation.  Zero-order customers land in c_count=0."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM v_customer LEFT JOIN v_orders
                ON c_custkey = o_custkey
               AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """)


def _sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (dormant high-balance customers): scalar
    aggregate subquery (one 1-row broadcast) + NOT EXISTS anti-join.
    The anti-join condition keeps only customers with no large order —
    testdata gives every customer SOME order, so the plain Q22
    no-orders predicate would be vacuous (FIXTURES note)."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(f"""
        SELECT c_mktsegment AS segment, count(*) AS numcust,
               {money_sum_portable_sql('c_acctbal')} AS totacctbal
        FROM v_customer
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal
                                    AS DECIMAL(18,2))) AS DOUBLE)
                                  / count(c_acctbal)
                           FROM v_customer WHERE c_acctbal > 0
                             AND {money_ok_portable_sql('c_acctbal')})
          AND NOT EXISTS (SELECT 1 FROM v_orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 300000)
        GROUP BY c_mktsegment
        ORDER BY segment
    """)


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type.  The
    explicit value list keeps it a one-pass conditional agg (omitting
    it would trigger a distinct-scan first)."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 25 == 3)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


def _agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90 / p99) of order totals per
    status — sort-based, linear-interpolated; oracle via DuckDB
    quantile_cont."""
    # r11 extreme-doubles sweep: an inf sample makes interpolation
    # emit inf on one engine and NULL (inf - inf = NaN) on the other
    orders = load(spark, sf_dir, "orders").where(
        finite_or_null("o_totalprice"))
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
             .alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)
             .alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4)
             .alias("p99"),
        )
    )


def _quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: quantile discretization (QuantileDiscretizer-style feature
    binning) — compute exact price quartile cutoffs, assign every
    lineitem to its quartile, aggregate per bin.  The fixed-point
    detail that keeps this oracle-exact: interpolated cutoffs always
    lie ON or strictly BETWEEN adjacent sorted data values, so `<`
    comparisons classify every row identically in both engines even
    if the last ulp of the interpolation differed.

    100 TB shape: the cutoff row is a 1-row broadcast; bin assignment
    is map-side CASE; one small-key shuffle for the per-bin agg.  At
    real scale the exact percentile pass becomes approx_percentile
    (mergeable sketch, same downstream plan) — exactness is kept here
    for the oracle."""
    li = load(spark, sf_dir, "lineitem").where(
        finite_or_null("l_extendedprice"))  # r11 extremes sweep
    cuts = li.agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("q2"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"))
    binned = li.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("l_extendedprice") < F.col("q1"), "q1_low")
         .when(F.col("l_extendedprice") < F.col("q2"), "q2_mid_low")
         .when(F.col("l_extendedprice") < F.col("q3"), "q3_mid_high")
         .otherwise("q4_high").alias("bin"),
        "l_extendedprice", "l_quantity")
    return (
        binned.groupBy("bin")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_quantity"), 2).alias("total_qty"),
             F.round(F.min("l_extendedprice"), 2).alias("min_price"),
             F.round(F.max("l_extendedprice"), 2).alias("max_price"))
    )


def _winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r6 debut): per-group winsorization — the outlier-clipping
    preprocessing step (clip to the [p05, p95] order statistics) every
    feature pipeline runs before scaling, with exact audit counts of
    how many rows each tail clipped.  Sibling of quantile_bins (bin
    assignment) and agg_approx_percentiles (sketch flavor): this one
    CLIPS and reports the winsorized mean.

    Bounds are DISCRETE order statistics (the ceil(0.05n)-th /
    ceil(0.95n)-th value), not interpolated percentiles: an
    interpolated bound is a ratio of integers that can land on an
    exact rounding half (the functions/exact.py divergence class),
    while an order statistic IS a data value.  All arithmetic is in
    integer CENTS — floor(x*100 + 0.5), the benford idiom: one IEEE
    op, identical bit on both engines — and rank indices come from
    pure-integer ceil division `(n*k + 99) div 100` (never float
    0.05*n, whose binary representation could flip a ceil at exact
    multiples).  The winsorized mean divides exact cent sums via
    round4_ratio_dec (DECIMAL(38) space: cent sums pass the int64
    *20000 bound around sf1).

    100 TB shape: one hash-partitioned per-group sort feeds both
    window functions AND the bound extraction (same partition key →
    Spark reuses a single exchange), then one per-group agg; groups
    (order statuses) are few and each sorts in parallel across its
    partitions.  At real scale the exact sort swaps for
    approx_percentile bounds — same downstream clip plan — exactness
    kept here for the oracle, as in quantile_bins."""
    o = load(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
        & money_ok("o_totalprice"))  # cents floor: DECIMAL-range bound
    v = o.select(
        F.col("o_orderstatus").alias("status"), "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"))
    part = Window.partitionBy("status")
    ranked = (v
              .withColumn("rn", F.row_number().over(
                  part.orderBy("cents", "o_orderkey")))
              .withColumn("n", F.count("*").over(part)))
    bounded = (ranked
               .withColumn("lo", F.max(F.when(
                   F.col("rn") == F.expr("(n * 5 + 99) div 100"),
                   F.col("cents"))).over(part))
               .withColumn("hi", F.max(F.when(
                   F.col("rn") == F.expr("(n * 95 + 99) div 100"),
                   F.col("cents"))).over(part)))
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")),
                      F.col("hi"))
    return (bounded.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        F.max("lo").alias("lo_cents"),
        F.max("hi").alias("hi_cents"),
        F.sum((F.col("cents") < F.col("lo")).cast("long"))
        .alias("n_clipped_lo"),
        F.sum((F.col("cents") > F.col("hi")).cast("long"))
        .alias("n_clipped_hi"),
        round4_ratio_dec(
            F.sum(clipped.cast("decimal(38,0)")),
            (F.count("*") * 100).cast("decimal(38,0)"))
        .alias("winsorized_mean"))
        .orderBy("status"))


def _agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB flavor: approx_percentile sketches (mergeable,
    constant memory).  Promoted from rows-only to a FULL hash oracle
    in round 5 via a sketch-contract encoding: the raw sketch VALUE is
    engine-internal (GK summaries merge per-partition, and empirically
    diverge from DuckDB's quantile_disc on ~1 of 3 status groups even
    at accuracy=10000 ≫ group size, so no cross-engine value oracle
    can exist — that is WHY r2's version went red and r3 demoted it).
    What IS cross-engine checkable: (a) the exact interpolated
    percentiles (the parity `agg_percentiles` already pins against
    quantile_cont) and (b) the sketch's accuracy CONTRACT — each
    estimate must land inside the ±2%-rank window around its target
    quantile (GK guarantees ~1/accuracy rank error per summary;
    partition merges widen it far below 0.02 at any SF).  The booleans
    are deterministic TRUE when the sketch honors its bound, so the
    oracle emits literal TRUEs and a contract breach hash-fails the
    row instead of hiding behind rows-only.

    CONTRACT-MARGIN NOTE (ADVICE r5, triage aid): the ±2%-rank window
    was empirically validated at sf0.001, sf0.01 and sf0.1 (GK at
    accuracy=10000 lands well inside it at each).  A red row at an
    untested SF or after a Spark version bump changing GK internals
    is a CONTRACT-MARGIN event, not query logic — widen the window
    knowingly rather than debugging the percentile math."""
    orders = load(spark, sf_dir, "orders").where(
        finite_or_null("o_totalprice"))  # r11 extremes sweep
    g = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.approx_percentile(
            "o_totalprice",
            F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000)
        .alias("apx"),
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
        .alias("ex"),
        F.expr("percentile(o_totalprice, array(0.48, 0.88, 0.97))")
        .alias("lo"),
        F.expr("percentile(o_totalprice, array(0.52, 0.92, 1.0))")
        .alias("hi"),
        F.count("o_totalprice").alias("n_measured"))

    def in_bound(i: int, name: str):
        # coalesce(TRUE): a group whose metric column is entirely NULL
        # has NULL percentiles on both arms — the accuracy contract is
        # VACUOUSLY honored, and a NULL boolean would arrive as pandas
        # object-dtype against the oracle's literal bool (the r11
        # all-NULL sweep's dtype-kind failure).  n_measured < 50:
        # below 1/0.02 rows the ±2%-RANK window is narrower than one
        # rank step, so the interpolated [lo, hi] can exclude the
        # exact order statistic GK returns (GK holds ALL rows exactly
        # at this size) — the contract is vacuous by its own math, not
        # just empirically (r12 long-strings sweep: tiny junk-status
        # groups landed apx outside a degenerate window)
        return F.coalesce(
            (F.col("n_measured") < 50)
            | ((F.element_at("apx", i) >= F.element_at("lo", i))
               & (F.element_at("apx", i) <= F.element_at("hi", i))),
            F.lit(True)).alias(name)

    return g.select(
        "status",
        F.round(F.element_at("ex", 1), 4).alias("p50"),
        F.round(F.element_at("ex", 2), 4).alias("p90"),
        F.round(F.element_at("ex", 3), 4).alias("p99"),
        in_bound(1, "p50_in_bound"),
        in_bound(2, "p90_in_bound"),
        in_bound(3, "p99_in_bound"),
    )


def _agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): (status, priority),
    (status), () — with grouping_id to disambiguate NULL-as-total from
    NULL-as-value.  Single grouping-set expansion pass."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(f"""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               grouping_id() AS gid,
               count(*) AS order_cnt,
               {money_sum_portable_sql('o_totalprice')} AS revenue
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """)


def _unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-status aggregate row → long
    (status, metric, value) — the inverse of pivot, zero-shuffle
    expand."""
    orders = load(spark, sf_dir, "orders")
    # money_sum discipline (r12 many-files sweep): exact DECIMAL sum,
    # avg derived from it over the same finite-conditional count
    pdec = money_dec("o_totalprice")
    wide = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        money_sum("o_totalprice").alias("revenue"),
        F.round(F.sum(pdec).cast("double")
                / F.count(pdec), 2).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return wide.unpivot(
        ["status"], ["revenue", "avg_price", "max_price"],
        "metric", "value")


def _sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): a calendar spine — the canonical
    gap-filling pattern — left-joined to daily order counts so days
    with no orders appear as zeros."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_rc")
    return spark.sql(f"""
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT d + INTERVAL 1 DAY FROM days
          WHERE d < DATE '1995-01-31'
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS day,
               count(o_orderkey) AS order_cnt,
               coalesce({money_sum_portable_sql('o_totalprice')}, 0.0) AS revenue
        FROM days
        LEFT JOIN v_orders_rc ON CAST(o_orderdate AS DATE) = d
        GROUP BY d
    """)


def _agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/sort_array + array function battery, reduced to
    deterministic scalars (size / first / last / contains / join) so
    the cross-engine hash is stable regardless of array stringification."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines"),
        F.sort_array(F.collect_set("l_returnflag")).alias("flags"),
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("lines", 1).alias("has_line1"),
        F.array_join("lines", ",").alias("lines_csv"),
        F.array_join("flags", "|").alias("flags_bar"),
    )


def _sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod stratified sampling: keep a row iff
    sha256(event_id) mod 10000 falls under its stratum's rate — the
    production-reproducible alternative to RNG sampling (same rows on
    every rerun, every engine, any partitioning; a seeded Bernoulli
    draw is none of those — see `sample_stratified` for that flavor).
    Fully oracle-checked because the hash is public.  Per-stratum
    rates: downsample the dominant types, keep the rare ones."""
    ev = load(spark, sf_dir, "events")
    bucket = F.pmod(
        F.conv(F.substring(
            F.sha2(F.col("event_id").cast("string"), 256), 1, 8), 16, 10)
         .cast("long"),
        F.lit(10000))
    rate = (F.when(F.col("event_type").isin("view", "click"), 1000)
            .when(F.col("event_type") == "error", 5000)
            .otherwise(10000))
    return (
        ev.where(bucket < rate)
        .groupBy("event_type")
        .agg(F.count("*").alias("sampled_cnt"),
             money_sum("value").alias("sampled_value"))
        .orderBy("event_type")
    )


BOOT_B = 50  # bootstrap replicates; ranks derive from B by integer ceil
#: Poisson(1) CDF cut points scaled to the 1e6 hash-bucket grid
#: (floor(cdf·1e6), computed once offline): a bucket below POISSON_CUM[k]
#: draws weight ≤ k.  Truncated at w = 5 (tail mass 6e-4, documented).
POISSON_CUM = [367879, 735758, 919698, 981011, 996340]


def _bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): percentile-bootstrap confidence interval for the
    per-status mean order price via the POISSON bootstrap — the
    resampling scheme that actually distributes: classical bootstrap
    draws n-out-of-n WITH replacement (a global, stateful operation),
    Poisson bootstrap gives every (row, replicate) an independent
    Poisson(1) weight, making resampling a pure MAP over the stream.

    Determinism: the weight is NOT an RNG draw — it is a public-hash
    bucket (sha256(o_orderkey ':' b) first 8 hex chars mod 1e6, the
    sample_hash idiom both engines compute bit-identically) cut at
    the Poisson(1) CDF grid POISSON_CUM.  The 2^32→1e6 modulo bias
    (~2e-4 relative) and the w ≤ 5 truncation (tail mass 6e-4) are
    accepted, documented approximations — identical on both engines,
    so the oracle stays exact.

    Replicate means are exact integer-cent ratios (round4_ratio_dec;
    an all-zero-weight replicate is NULL and is excluded from the
    rank on BOTH engines — the NULL-ordering trap).  The CI bounds
    are DISCRETE order statistics of the replicate means (the
    winsorize idiom): ranks ceil(0.025·B_eff) / ceil(0.975·B_eff) in
    pure-integer ceil division — never interpolated percentiles.

    Scale: the n×B expanded stream never materializes — it partial-
    aggregates map-side to ≤ groups×B states per partition, so the
    one exchange carries O(groups·B·parts) rows no matter the corpus;
    the point-estimate agg reuses the same base scan.  B scales the
    map CPU (one sha256 per row-replicate), not the shuffle."""
    o = load(spark, sf_dir, "orders").where(
        money_ok("o_totalprice")).select(
        F.col("o_orderstatus").alias("status"), "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"))
    rep = o.select(
        "status", "o_orderkey", "cents",
        F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b"))
    bucket = F.pmod(
        F.conv(F.substring(
            F.sha2(F.concat(F.col("o_orderkey").cast("string"),
                            F.lit(":"), F.col("b").cast("string")), 256),
            1, 8), 16, 10).cast("long"),
        F.lit(1000000))
    w = (F.when(bucket < POISSON_CUM[0], 0)
         .when(bucket < POISSON_CUM[1], 1)
         .when(bucket < POISSON_CUM[2], 2)
         .when(bucket < POISSON_CUM[3], 3)
         .when(bucket < POISSON_CUM[4], 4)
         .otherwise(5)).cast("long")
    means = (rep.withColumn("w", w)
             .groupBy("status", "b")
             .agg(F.sum("w").alias("sw"),
                  F.sum(F.col("w") * F.col("cents")).alias("swc"))
             .select("status", "b",
                     round4_ratio_dec(
                         F.col("swc"), F.col("sw") * 100).alias("m"))
             .where(F.col("m").isNotNull()))
    part = Window.partitionBy("status")
    ranked = (means
              .withColumn("rn", F.row_number().over(
                  part.orderBy("m", "b")))
              .withColumn("beff", F.count("*").over(part)))
    ci = (ranked
          .withColumn("lo", F.max(F.when(
              F.col("rn") == F.expr("(beff * 25 + 999) div 1000"),
              F.col("m"))).over(part))
          .withColumn("hi", F.max(F.when(
              F.col("rn") == F.expr("(beff * 975 + 999) div 1000"),
              F.col("m"))).over(part))
          .groupBy("status")
          .agg(F.max("beff").alias("b_eff"),
               F.max("lo").alias("ci_lo"),
               F.max("hi").alias("ci_hi")))
    point = o.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        round4_ratio_dec(F.sum("cents"),
                         F.count("*") * 100).alias("mean_price"))
    return (point.join(ci, "status")
            .select("status", "n_orders", "mean_price",
                    "ci_lo", "ci_hi", "b_eff")
            .orderBy("status"))


CAP_PER_CELL = 200  # max docs retained per (lang, source) cell


def _sample_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): per-cell cap sampling — keep at most
    CAP_PER_CELL documents per (lang, source) cell, chosen by
    deterministic hash order (sha256 of doc_id, doc_id tiebreak), the
    balancing primitive for mixture construction: no language/domain
    cell may dominate, and reruns/engines pick the IDENTICAL survivor
    set (contrast `sample_stratified`'s seeded Bernoulli, which is
    neither).  Hash order, not "first N by doc_id": id order encodes
    crawl order — a systematic bias the hash destroys.

    Emits the per-cell audit: inventory, kept count, kept char mass
    (what the downstream token budget actually sees).

    100 TB shape: one hash-exchange on the (lang, source) key feeds
    rank + both aggregates; with a hot cell the rank is a top-K —
    at scale swap row_number for a per-partition heap (partial top-K,
    same semantics) or pre-filter by bucket range; the audit output
    is |cells| rows."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(
        F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10
    ).cast("long")
    w = (Window.partitionBy("lang", "source")
         .orderBy(bucket.asc(), F.col("doc_id").asc()))
    ranked = docs.select(
        "lang", "source", "n_chars",
        F.row_number().over(w).alias("rn"))
    return (
        ranked.groupBy("lang", "source")
        .agg(F.count("*").alias("n_total"),
             F.sum(F.when(F.col("rn") <= CAP_PER_CELL, 1).otherwise(0))
             .alias("n_kept"),
             F.sum(F.when(F.col("rn") <= CAP_PER_CELL, F.col("n_chars"))
                   .otherwise(0)).alias("kept_chars"))
    )


#: stratified sampling rates: downsample the dominant event types,
#: keep all rare ones — shared by the Spark query and its oracle so
#: the two sides cannot drift
STRAT_RATES = {"view": 0.1, "click": 0.1, "error": 0.5,
               "purchase": 1.0, "signup": 1.0}


def _sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (sampleBy): downsample the dominant
    event types, keep all rare ones — the corpus-balancing primitive
    for training-data pipelines.

    Promoted from rows-only to a full hash oracle in round 8 via the
    sketch-contract encoding (the r7 verdict's top task 2):
    Bernoulli draws are engine-specific even when seeded, so the
    sampled count itself can never value-match — the output instead
    carries (a) the exact stratum size and configured rate — both
    oracle-reproducible — and (b) a boolean asserting the realized
    sample landed within 6σ of n·p (σ = √(n·p·(1−p)), +1 absolute
    slack so a 1-row stratum can't fail on granularity).  6σ of a
    binomial is a ~1e-9 false-alarm bound, yet any broken sampler
    (wrong rate, double sampling, dropped stratum) lands far outside
    it.  The +1 granularity slack applies ONLY to fractional rates:
    rate-1.0 (keep-all) and rate-0.0 (strata absent from STRAT_RATES,
    which sampleBy drops entirely) have σ = 0 and the contract demands
    the EXACT count — a sampler silently dropping one row of a
    keep-all stratum must flip the boolean (r8 review finding).  The
    rate for an unconfigured stratum coalesces to 0.0 to mirror both
    sampleBy's missing-key semantics and the oracle's ELSE 0.0 branch.
    The oracle emits the exact sizes, rates, and literal TRUE."""
    ev = load(spark, sf_dir, "events")
    sampled = (ev.sampleBy("event_type", STRAT_RATES, seed=42)
               .groupBy("event_type")
               .agg(F.count("*").alias("sampled_cnt")))
    totals = (ev.groupBy("event_type")
              .agg(F.count("*").alias("n_total")))
    rate = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in STRAT_RATES.items()
                           for x in kv]),
            F.col("event_type")),
        F.lit(0.0))
    sigma = F.sqrt(F.col("n_total") * F.col("rate")
                   * (1.0 - F.col("rate")))
    slack = F.when((F.col("rate") > 0.0) & (F.col("rate") < 1.0),
                   F.lit(1.0)).otherwise(F.lit(0.0))
    return (totals.join(sampled, "event_type", "left")
            .withColumn("sampled_cnt",
                        F.coalesce("sampled_cnt", F.lit(0)))
            .withColumn("rate", rate)
            .select("event_type", "n_total",
                    F.round("rate", 2).alias("rate"),
                    (F.abs(F.col("sampled_cnt")
                           - F.col("n_total") * F.col("rate"))
                     <= 6.0 * sigma + slack).alias("sample_in_bound"))
            # asc_nulls_last matches DuckDB's ASC default (NULLS LAST);
            # Spark's bare asc is NULLS FIRST — a NULL event_type would
            # otherwise land at opposite ends of the two row orders
            .orderBy(F.col("event_type").asc_nulls_last()))


def _sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: priority sampling (Duffield/Lund/Thorup, JACM 2007) — the
    weighted flavor of `sample_hash`: per source stratum keep the K
    docs with the largest priority q_i = w_i / u_i (w_i = n_chars
    weight, u_i = hash-uniform), and attach the Horvitz-Thompson
    estimator w_hat_i = max(w_i, tau) with tau the (K+1)-th largest
    priority, so sum(w_hat) is an unbiased estimate of the stratum's
    total weight from K rows.

    Fully oracle-checked, which is rare for weighted sampling: u_i is
    derived from sha256 (both engines bit-agree) and every downstream
    step is IEEE +-*/ and comparisons — no ln/pow, whose last-ulp
    behavior is libm-specific.  That is WHY priority sampling is used
    here instead of the classic exponential-jump A-ES scheme: same
    estimation guarantees, transcendental-free.

    Scale: one window shuffle on (source); the rk <= K+1 filter lets
    Spark insert WindowGroupLimit, so each map task forwards at most
    K+1 rows per stratum and the shuffle is O(strata * K), not O(n).
    tau is attached with a second window over the SAME partitioning
    (no extra exchange), never a self-join."""
    K = 5
    docs = load(spark, sf_dir, "documents")
    u = (F.conv(F.substring(
            F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
         .cast("double") + 1.0) / 4294967296.0  # uniform in (0, 1]
    w = F.col("n_chars").cast("double")
    win = Window.partitionBy("source").orderBy(F.desc("q"), F.asc("doc_id"))
    ranked = (
        docs.select("doc_id", "source", w.alias("w"), (w / u).alias("q"))
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= K + 1)
    )
    tau = F.max(F.when(F.col("rk") == K + 1, F.col("q"))) \
        .over(Window.partitionBy("source"))
    return (
        ranked.withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .where(F.col("rk") <= K)
        .select("source", "doc_id",
                F.col("w").cast("bigint").alias("w"),
                F.round("q", 4).alias("priority"),
                F.round(F.greatest("w", "tau"), 4).alias("w_hat"))
        .orderBy("source", "doc_id")
    )


def _chain_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: recursive CTE, data-driven flavor — per-customer
    order-chain traversal with DATA-DEPENDENT depth (each level is an
    equi-join against an edge table, and recursion stops when the walk
    runs off the longest real chain).  `sql_recursive_cte` covers the
    other recursion species, a self-generating sequence with a
    constant bound; together they exercise both halves of the Spark 4
    WITH RECURSIVE surface.
    Orders form a linked list per customer (each order's successor =
    the next order by date); the anchor selects each customer's first
    order, the recursive member follows successor edges, and the chain
    position + days-since-first accumulate along the walk.  Recursion
    terminates naturally (the successor graph is acyclic); depth = the
    longest per-customer order history, far under Spark's
    cteRecursionLevelLimit (100).

    The DuckDB oracle deliberately uses the WINDOW formulation
    (row_number + min-over-partition) instead of mirroring the
    recursion — a cross-PARADIGM differential check: two different
    algorithms must agree, not one algorithm run twice.

    Spark's UNION-distinct-in-recursion is not supported yet
    (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so cyclic closures like
    the dup-cluster graph stay on the iterative DataFrame CC path
    (dedup_clusters/_star); recursive CTEs here are for acyclic
    chains/hierarchies, where each level is one equi-join the
    optimizer plans like any other."""
    # o_custkey IS NOT NULL on both sides: an order with no customer
    # belongs to no chain.  Load-bearing for the cross-paradigm check —
    # the recursion's equi-join never matches a NULL key (each NULL
    # order would stay a 1-link anchor) while the oracle's window
    # formulation GROUPS NULLs into one 1500-deep phantom chain (r11
    # all-NULL sweep: 1 row vs 1500)
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        WITH RECURSIVE ords AS (
          SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM v_orders WHERE o_custkey IS NOT NULL
        ), edges AS (
          SELECT a.o_custkey, a.o_orderkey AS prev_key,
                 b.o_orderkey AS next_key, b.d AS next_d
          FROM ords a JOIN ords b
            ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
        ), chain(o_custkey, o_orderkey, first_d, d, pos) AS (
          SELECT o_custkey, o_orderkey, d, d, 1 FROM ords WHERE rn = 1
          UNION ALL
          SELECT c.o_custkey, e.next_key, c.first_d, e.next_d, c.pos + 1
          FROM chain c JOIN edges e
            ON e.o_custkey = c.o_custkey AND e.prev_key = c.o_orderkey
        )
        SELECT pos, count(*) AS n_orders,
               round(avg(datediff(d, first_d)), 4) AS avg_days_since_first,
               CAST(min(o_orderkey) AS BIGINT) AS min_okey
        FROM chain GROUP BY pos ORDER BY pos
    """)


def _sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report): THE canonical
    scan-heavy aggregate — one full lineitem pass, 8 aggregates over 2
    grouping columns, filter pushed to the parquet scan.  The plan to
    want at 100 TB: partial (map-side) aggregation on ~6 groups means
    the shuffle carries a handful of rows per task regardless of input
    size; whole-stage codegen covers scan→project→partial-agg.

    Money sums in exact DECIMAL, avgs derived from the exact sums
    (r12 many-files sweep: the double sum_charge flipped a cent
    between a 1-file and a 7-file layout of the SAME rows — partial-
    aggregation order follows file layout; see _agg_stats, the same
    fix); the finite-or-null measure filter covers all four measures
    because corrupt ±inf/NaN would hit the DECIMAL casts (tpch._fin's
    portable spelling — Spark SQL has no isfinite)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2)
                    AS DOUBLE)                     AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))),
                          2) AS DOUBLE)            AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))),
                          2) AS DOUBLE)            AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))
                              * (1 + CAST(l_tax AS DECIMAL(4,2)))),
                          2) AS DOUBLE)            AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DOUBLE) / count(l_quantity), 4)
                                                   AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / count(l_extendedprice), 4)
                                                   AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,2)))
                          AS DOUBLE) / count(l_discount), 4)
                                                   AS avg_disc,
               count(*)                            AS count_order
        FROM v_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          AND {money_ok_portable_sql('l_quantity')}
          AND {money_ok_portable_sql('l_extendedprice')}
          AND {rate_ok_portable_sql('l_discount')}
          AND {rate_ok_portable_sql('l_tax')}
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


def _sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    lost revenue from returned lineitems in one quarter.  Date filter
    prunes orders BEFORE the fact-fact join; nation broadcasts; the
    final top-20 is TakeOrderedAndProject, never a global sort.

    Revenue accumulates in DECIMAL, not DOUBLE: this query's sf0.01 sum
    lands within 1e-9 of a half-cent boundary, where double summation
    ORDER (engine-dependent) flips round(x, 2).  Decimal sums are exact
    and order-independent — also simply the right type for money at
    100 TB; the final CAST back to DOUBLE keeps the emitted schema
    uniform with the other revenue queries."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(f"""
        SELECT c_custkey, c_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))),
                          2) AS DOUBLE)
                 AS revenue,
               round(c_acctbal, 2) AS acctbal,
               n_name AS nation
        FROM v_customer
        JOIN v_orders ON c_custkey = o_custkey
        JOIN v_lineitem ON l_orderkey = o_orderkey
        JOIN v_nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-04-01'
          AND l_returnflag = 'R'
          -- corrupt money (non-finite OR past DECIMAL capacity)
          -- must not reach the DECIMAL revenue sum
          AND {money_ok_portable_sql('l_extendedprice')}
          AND {money_ok_portable_sql('l_discount')}
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """)


def _table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: snapshot reconciliation (data diff) — compare two versions
    of a keyed table and emit every added / removed / changed row with
    the list of columns that changed: the audit direction of the
    lakehouse write path (`merge_upsert` applies changes; this
    DETECTS them — migration validation, replication drift checks,
    "what did yesterday's load touch").

    The new snapshot is derived deterministically from orders (drop
    keys %97, bump totalprice on %13, re-status %41, append %89 under
    keys shifted past max(k) — a scalar-subquery offset, so appended
    keys can never collide with surviving base keys at ANY scale
    factor; a fixed literal shift broke at sf>=2 where orderkeys pass
    it) so both engines diff identical inputs.  Shape: ONE full-outer
    join on the key — the same single shuffle as the merge — with the
    per-column comparison and the changed-column array built map-side
    afterward; unchanged rows are filtered out so the output is the
    (small) change set, not the table.  The DuckDB oracle computes
    the same change set by a DIFFERENT algorithm (anti-joins per
    status class), the cross-paradigm discipline the as-of/BFS
    oracles set."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        WITH base AS (
          SELECT o_orderkey AS k, o_orderstatus AS status,
                 round(o_totalprice, 2) AS price
          FROM v_orders
        ), new AS (
          SELECT k,
                 CASE WHEN k % 41 = 0 THEN 'X' ELSE status END AS status,
                 round(CASE WHEN k % 13 = 0 THEN price + 10.0
                            ELSE price END, 2) AS price
          FROM base WHERE k % 97 != 0
          UNION ALL
          SELECT k + (SELECT max(k) + 1 FROM base), 'N', 1.0
          FROM base WHERE k % 89 = 0
        ), joined AS (
          SELECT coalesce(b.k, n.k) AS k,
                 b.status AS b_status, n.status AS n_status,
                 b.price AS b_price, n.price AS n_price,
                 b.k IS NULL AS is_add, n.k IS NULL AS is_del
          FROM base b FULL OUTER JOIN new n ON b.k = n.k
        )
        SELECT k,
               CASE WHEN is_add THEN 'added'
                    WHEN is_del THEN 'removed'
                    ELSE 'changed' END AS status,
               array_join(filter(array(
                 CASE WHEN NOT is_add AND NOT is_del
                       AND b_status != n_status THEN 'status' END,
                 CASE WHEN NOT is_add AND NOT is_del
                       AND b_price != n_price THEN 'price' END),
                 x -> x IS NOT NULL), ',') AS changed_cols,
               n_status, n_price
        FROM joined
        WHERE is_add OR is_del
           OR b_status != n_status OR b_price != n_price
    """)


def _dq_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: data-quality checks as a query — the deequ/dbt-test
    pattern: declarative constraints evaluated to a (check,
    n_violations, passed) report.  Uniqueness via group-having,
    referential integrity via anti-join over the NOT-NULL-keyed rows
    (a null key is its own violation class, counted once by the
    not-null check, never double-reported as an orphan), domain and
    range checks as map-side predicates; every check reduces to a
    count — at 100 TB the whole suite is a handful of scan+count
    jobs (or one multi-aggregate pass per table), never row-level
    materialization — so the
    report is driver-tiny no matter the table size.

    The two `*_finite` checks (r12, the r11 advice item) are the
    AUDIT SIGNAL for the repo-wide finite-or-null measure contract
    (functions/exact.py::finite_or_null / tpch._fin): since r11 every
    revenue/statistic query silently EXCLUDES ±inf/NaN measures on
    both engines — deliberate, but corrupt-money rows disappearing
    from revenue without a counter can mask an upstream data-quality
    failure, so the exclusion count is now a first-class dq row.  The
    predicate is tpch._fin's portable isnan/abs-Infinity spelling
    (Spark SQL has no isfinite(); the oracle uses DuckDB's)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql("""
        WITH checks AS (
          SELECT 'orders.custkey_not_null' AS check,
                 count_if(o_custkey IS NULL) AS n_violations
          FROM v_orders
          UNION ALL
          SELECT 'orders.custkey_refs_customer',
                 count(*)
          FROM (SELECT o_custkey FROM v_orders
                WHERE o_custkey IS NOT NULL) o
          ANTI JOIN v_customer c
            ON o.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'orders.totalprice_positive',
                 count_if(o_totalprice <= 0)
          FROM v_orders
          UNION ALL
          SELECT 'orders.status_in_domain',
                 count_if(o_orderstatus NOT IN ('F', 'O', 'P'))
          FROM v_orders
          UNION ALL
          SELECT 'customer.custkey_unique',
                 coalesce(sum(cnt - 1), 0)
          FROM (SELECT count(*) AS cnt FROM v_customer
                GROUP BY c_custkey HAVING count(*) > 1)
          UNION ALL
          SELECT 'customer.acctbal_in_range',
                 count_if(c_acctbal < -1000.0 OR c_acctbal > 10000.0)
          FROM v_customer
          UNION ALL
          SELECT 'orders.totalprice_finite',
                 count_if(o_totalprice IS NOT NULL
                          AND (isnan(o_totalprice)
                               OR abs(o_totalprice)
                                  = CAST('Infinity' AS DOUBLE)))
          FROM v_orders
          UNION ALL
          SELECT 'events.value_finite',
                 count_if(value IS NOT NULL
                          AND (isnan(value)
                               OR abs(value) = CAST('Infinity' AS DOUBLE)))
          FROM v_events
        )
        SELECT check, CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS passed
        FROM checks
    """)


def _rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: RFM segmentation — score every customer 1-5 on Recency /
    Frequency / Monetary quintiles of their order history, then
    profile the segments; the standard CRM / marketing-analytics
    operator.

    The naive formulation is three GLOBAL ntile() windows — a
    single-partition sort of the whole customer table, a scale-killer.
    The distributed rewrite (quantile_bins' trick, composed three
    ways): compute the four quintile cutoffs per dimension in one
    1-row exact-percentile aggregate, broadcast it, and assign scores
    map-side with CASE.  Interpolated cutoffs lie on or strictly
    between adjacent sorted values, so `<` classifies every customer
    identically in both engines; per-customer monetary and per-segment
    value sum in DECIMAL so no float accumulation order leaks in.
    Scores are the raw quintile index (1 = lowest metric value) —
    recency_days is DAYS SINCE last order, so r_score 1 = most
    recent.  At 100 TB swap percentile → approx_percentile (mergeable
    sketch), same plan."""
    orders = load(spark, sf_dir, "orders").where(
        money_ok("o_totalprice"))  # DECIMAL monetary sums downstream
    ref = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("refd"))
    cust = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("custkey"), "refd")
        .agg(F.datediff("refd", F.max(F.col("o_orderdate").cast("date")))
              .alias("recency_days"),
             F.count("*").alias("frequency"),
             F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
              .cast("double").alias("monetary"))
    )
    cuts = cust.agg(*[
        F.expr(f"percentile({m}, {q})").alias(f"{m[0]}{i}")
        for m in ("recency_days", "frequency", "monetary")
        for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)])

    def score(m: str):
        c = F.col
        x = c(m)
        p = m[0]
        return (F.when(x < c(f"{p}1"), 1).when(x < c(f"{p}2"), 2)
                .when(x < c(f"{p}3"), 3).when(x < c(f"{p}4"), 4)
                .otherwise(5))

    scored = cust.crossJoin(F.broadcast(cuts)).select(
        "custkey", "monetary",
        score("recency_days").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"))
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"),
             F.round(F.sum(F.col("monetary").cast("decimal(18,2)")), 2)
              .cast("double").alias("segment_value"))
    )


def _cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: CDC change-log application — collapse an ordered stream of
    upserts and deletes into final table state, the core of every
    log-to-table materialization (Debezium→lakehouse, Delta/Hudi/
    Iceberg MERGE loops).  Distinct from `merge_upsert` (one batch of
    updates against one base) and `scd2_merge` (history-keeping): this
    is last-writer-wins REPLAY with tombstones — many ops per key, the
    final op decides, and a trailing delete erases the key entirely.

    The events table plays the change log: key = (user_id, k from the
    JSON props), op = delete for 'error' rows else upsert of `value`,
    log order = (ts, event_id).  Last-op-per-key is one ranking window
    over the key-partitioned sort — the scale-canonical formulation:
    ONE shuffle on the key, no iterative driver loop, and at 100 TB
    it's exactly the compaction pass a log-structured table runs.
    Surviving state re-aggregates per user; values sum in
    DECIMAL(18,2) so the total is exact and accumulation-order-free
    (the sql_q10 pattern)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql(f"""
        WITH ch AS (
          SELECT user_id,
                 CAST(get_json_object(props, '$.k') AS INT) AS k,
                 ts, event_id, event_type, value
          FROM v_events
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id, k
                                       ORDER BY ts DESC, event_id DESC)
                    AS rn
          FROM ch
        )
        SELECT user_id, count(*) AS live_keys,
               -- r11 extremes sweep: a corrupt payload value must not
               -- poison the DECIMAL sum, but its change record still
               -- wins last-writer-wins for its key
               CAST(round(sum(CASE WHEN {money_ok_portable_sql('value')}
                              THEN CAST(value AS DECIMAL(18,2)) END), 2)
                    AS DOUBLE) AS total_value
        FROM ranked
        WHERE rn = 1 AND event_type != 'error'
        GROUP BY user_id
    """)


QUERIES = {
    "cdc_apply": _cdc_apply,
    "rfm_segments": _rfm_segments,
    "table_diff": _table_diff,
    "dq_check": _dq_check,
    "sql_q1": _sql_q1,
    "sql_q3": _sql_q3,
    "sql_q10": _sql_q10,
    "sql_q4": _sql_q4,
    "sql_q5": _sql_q5,
    "sql_q7": _sql_q7,
    "sql_q13": _sql_q13,
    "sql_q18": _sql_q18,
    "sql_q22": _sql_q22,
    "agg_grouping_sets": _agg_grouping_sets,
    "unpivot_metrics": _unpivot_metrics,
    "sql_recursive_cte": _sql_recursive_cte,
    "agg_collect": _agg_collect,
    "sample_stratified": _sample_stratified,
    "sample_hash": _sample_hash,
    "bootstrap_ci": _bootstrap_ci,
    "sample_cap_per_group": _sample_cap_per_group,
    "sample_priority": _sample_priority,
    "chain_rcte": _chain_rcte,
    "pivot_events": _pivot_events,
    "agg_percentiles": _agg_percentiles,
    "quantile_bins": _quantile_bins,
    "winsorize": _winsorize,
    "agg_approx_percentiles": _agg_approx_percentiles,
}

ORACLES = {
    "table_diff": """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         round(o_totalprice, 2) AS price
  FROM orders
), new AS (
  SELECT k,
         CASE WHEN k % 41 = 0 THEN 'X' ELSE status END AS status,
         round(CASE WHEN k % 13 = 0 THEN price + 10.0
                    ELSE price END, 2) AS price
  FROM base WHERE k % 97 != 0
  UNION ALL
  SELECT k + (SELECT max(k) + 1 FROM base), 'N', 1.0
  FROM base WHERE k % 89 = 0
)
-- independent algorithm (the Spark side uses ONE full-outer join):
-- each change class derived by its own anti-join / inner-join pass
SELECT n.k, 'added' AS status,
       '' AS changed_cols,
       n.status AS n_status, n.price AS n_price
FROM new n ANTI JOIN base b ON n.k = b.k
UNION ALL
SELECT b.k, 'removed', '', NULL, NULL
FROM base b ANTI JOIN new n ON b.k = n.k
UNION ALL
SELECT b.k, 'changed',
       array_to_string(list_filter([
         CASE WHEN b.status != n.status THEN 'status' END,
         CASE WHEN b.price != n.price THEN 'price' END],
         x -> x IS NOT NULL), ','),
       n.status, n.price
FROM base b JOIN new n ON b.k = n.k
WHERE b.status != n.status OR b.price != n.price
""",
    "dq_check": """
WITH checks AS (
  SELECT 'orders.custkey_not_null' AS check,
         count(*) FILTER (o_custkey IS NULL) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'orders.custkey_refs_customer', count(*)
  FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
  ANTI JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'orders.totalprice_positive',
         count(*) FILTER (o_totalprice <= 0)
  FROM orders
  UNION ALL
  SELECT 'orders.status_in_domain',
         count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P'))
  FROM orders
  UNION ALL
  SELECT 'customer.custkey_unique', coalesce(sum(cnt - 1), 0)
  FROM (SELECT count(*) AS cnt FROM customer
        GROUP BY c_custkey HAVING count(*) > 1)
  UNION ALL
  SELECT 'customer.acctbal_in_range',
         count(*) FILTER (c_acctbal < -1000.0 OR c_acctbal > 10000.0)
  FROM customer
  UNION ALL
  SELECT 'orders.totalprice_finite',
         count(*) FILTER (o_totalprice IS NOT NULL
                          AND NOT isfinite(o_totalprice))
  FROM orders
  UNION ALL
  SELECT 'events.value_finite',
         count(*) FILTER (value IS NOT NULL AND NOT isfinite(value))
  FROM events
)
SELECT "check", CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
""",
    "rfm_segments": f"""
WITH fo AS (
  SELECT * FROM orders
  WHERE {money_ok_sql("o_totalprice")}
), ref AS (
  SELECT CAST(max(o_orderdate) AS DATE) AS refd FROM fo
), cust AS (
  SELECT o_custkey AS custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE), refd)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
              AS DOUBLE) AS monetary
  FROM fo, ref
  GROUP BY o_custkey, refd
), cuts AS (
  SELECT quantile_cont(recency_days, 0.2) AS r1,
         quantile_cont(recency_days, 0.4) AS r2,
         quantile_cont(recency_days, 0.6) AS r3,
         quantile_cont(recency_days, 0.8) AS r4,
         quantile_cont(frequency, 0.2) AS f1,
         quantile_cont(frequency, 0.4) AS f2,
         quantile_cont(frequency, 0.6) AS f3,
         quantile_cont(frequency, 0.8) AS f4,
         quantile_cont(monetary, 0.2) AS m1,
         quantile_cont(monetary, 0.4) AS m2,
         quantile_cont(monetary, 0.6) AS m3,
         quantile_cont(monetary, 0.8) AS m4
  FROM cust
), scored AS (
  SELECT custkey, monetary,
         CASE WHEN recency_days < r1 THEN 1 WHEN recency_days < r2 THEN 2
              WHEN recency_days < r3 THEN 3 WHEN recency_days < r4 THEN 4
              ELSE 5 END AS r_score,
         CASE WHEN frequency < f1 THEN 1 WHEN frequency < f2 THEN 2
              WHEN frequency < f3 THEN 3 WHEN frequency < f4 THEN 4
              ELSE 5 END AS f_score,
         CASE WHEN monetary < m1 THEN 1 WHEN monetary < m2 THEN 2
              WHEN monetary < m3 THEN 3 WHEN monetary < m4 THEN 4
              ELSE 5 END AS m_score
  FROM cust, cuts
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(monetary AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS segment_value
FROM scored GROUP BY r_score, f_score, m_score
""",
    # duck_json_lead mirrors get_json_object's lenient leading-document
    # parse on corrupt payloads (r12 string sweeps)
    "cdc_apply": f"""
WITH ch AS (
  SELECT user_id,
         CAST(json_extract_string({duck_json_lead('props')}, '$.k')
              AS INTEGER) AS k,
         ts, event_id, event_type, value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, k
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id, CAST(count(*) AS BIGINT) AS live_keys,
       CAST(round(sum(CASE WHEN {money_ok_sql("value")}
                      THEN CAST(value AS DECIMAL(18,2)) END), 2)
            AS DOUBLE) AS total_value
FROM ranked
WHERE rn = 1 AND event_type != 'error'
GROUP BY user_id
""",
    # exact DECIMAL money sums, avgs off the exact sums (r12 many-
    # files sweep — see _sql_q1's docstring)
    "sql_q1": f"""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
                                           AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
            AS DOUBLE)                     AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE)                     AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
            AS DOUBLE)                     AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_quantity), 4)       AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_extendedprice), 4)  AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_discount), 4)       AS avg_disc,
       CAST(count(*) AS BIGINT)            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  AND {money_ok_portable_sql("l_quantity")}
  AND {money_ok_portable_sql("l_extendedprice")}
  AND {rate_ok_portable_sql("l_discount")}
  AND {rate_ok_portable_sql("l_tax")}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "sql_q10": f"""
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))),
                  2) AS DOUBLE) AS revenue,
       round(c_acctbal, 2) AS acctbal,
       n_name AS nation
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND l_returnflag = 'R'
  AND {money_ok_sql("l_extendedprice")}
  AND {money_ok_sql("l_discount")}
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    "sql_recursive_cte": f"""
WITH RECURSIVE days(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1995-01-31'
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(count(o_orderkey) AS BIGINT) AS order_cnt,
       coalesce({money_sum_portable_sql("o_totalprice")}, 0.0) AS revenue
FROM days
LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
GROUP BY d
""",
    # flags: FILTER + coalesce mirror Spark exactly — collect_set
    # SKIPS NULL elements and array_join of the resulting EMPTY array
    # is '', while DuckDB's unfiltered list() keeps NULL and
    # array_to_string of an empty/all-NULL list is NULL (r11 all-NULL
    # sweep divergence)
    "agg_collect": """
SELECT l_orderkey,
       CAST(len(lines) AS INTEGER) AS n_lines,
       lines[1] AS first_line,
       lines[-1] AS last_line,
       list_contains(lines, 1) AS has_line1,
       array_to_string(lines, ',') AS lines_csv,
       coalesce(array_to_string(flags, '|'), '') AS flags_bar
FROM (
  SELECT l_orderkey,
         list_sort(list(l_linenumber)) AS lines,
         list_sort(list(DISTINCT l_returnflag)
                   FILTER (l_returnflag IS NOT NULL)) AS flags
  FROM lineitem WHERE l_orderkey % 100 = 0
  GROUP BY l_orderkey
)
""",
    "unpivot_metrics": f"""
WITH wide AS (
  SELECT o_orderstatus AS status,
         {money_sum_portable_sql("o_totalprice")} AS revenue,
         round(CAST(sum(CASE WHEN {money_ok_portable_sql("o_totalprice")}
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                    AS DOUBLE)
               / count(CASE WHEN {money_ok_portable_sql("o_totalprice")}
                       THEN o_totalprice END), 2) AS avg_price,
         round(max(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_orderstatus
)
SELECT status, 'revenue' AS metric, revenue AS value FROM wide
UNION ALL
SELECT status, 'avg_price', avg_price FROM wide
UNION ALL
SELECT status, 'max_price', max_price FROM wide
""",
    "agg_grouping_sets": f"""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_portable_sql("o_totalprice")} AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
""",
    "sql_q3": f"""
SELECT o_orderkey,
       {rev_sum_portable_sql()} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderpriority = '1-URGENT'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
    "chain_rcte": """
WITH ords AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS pos,
         min(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey) AS first_d
  FROM orders WHERE o_custkey IS NOT NULL
)
SELECT pos, CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(date_diff('day', first_d, d)), 4) AS avg_days_since_first,
       CAST(min(o_orderkey) AS BIGINT) AS min_okey
FROM ords GROUP BY pos ORDER BY pos
""",
    "sample_priority": """
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
         CAST(n_chars AS DOUBLE) /
           ((CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)),
                                      1, 8)) AS BIGINT) + 1.0)
            / 4294967296.0) AS q
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY q DESC, doc_id ASC) AS rk
  FROM d
  QUALIFY rk <= 6
), t AS (
  SELECT *, coalesce(max(CASE WHEN rk = 6 THEN q END)
                       OVER (PARTITION BY source), 0.0) AS tau
  FROM r
)
SELECT source, doc_id, CAST(w AS BIGINT) AS w,
       round(q, 4) AS priority,
       round(greatest(w, tau), 4) AS w_hat
FROM t
WHERE rk <= 5
ORDER BY source, doc_id
""",
    # identical 32-bit sha prefix hash order, doc_id tiebreak; every
    # output column an exact integer (sums of BIGINT n_chars)
    "sample_cap_per_group": f"""
WITH ranked AS (
  SELECT lang, source, n_chars,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY CAST(concat('0x',
                      substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) ASC, doc_id ASC) AS rn
  FROM documents
)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN rn <= {CAP_PER_CELL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn <= {CAP_PER_CELL} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM ranked
GROUP BY lang, source
""",
    "sample_hash": f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS sampled_cnt,
       {money_sum_sql("value")} AS sampled_value
FROM events
WHERE CAST(concat('0x', substr(sha256(CAST(event_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000
      < CASE WHEN event_type IN ('view', 'click') THEN 1000
             WHEN event_type = 'error' THEN 5000
             ELSE 10000 END
GROUP BY event_type
ORDER BY event_type
""",
    "sql_q4": """
SELECT o_orderpriority, count(*) AS order_cnt
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "sql_q13": """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "sql_q22": f"""
SELECT c_mktsegment AS segment, count(*) AS numcust,
       {money_sum_portable_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal
                            AS DECIMAL(18,2))) AS DOUBLE)
                          / count(c_acctbal)
                   FROM customer WHERE c_acctbal > 0
                     AND {money_ok_portable_sql('c_acctbal')})
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY c_mktsegment
ORDER BY segment
""",
    "sql_q5": f"""
SELECT n_name AS nation,
       {rev_sum_portable_sql()} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
    "sql_q7": f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {rev_sum_portable_sql()} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
WHERE r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'
  AND l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
""",
    "sql_q18": """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       o_totalprice, sum(l_quantity) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 250
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    "pivot_events": """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS "view"
FROM events
WHERE user_id % 25 = 3
GROUP BY user_id
""",
    "agg_percentiles": f"""
SELECT o_orderstatus AS status,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders WHERE {finite_or_null_sql("o_totalprice")}
GROUP BY o_orderstatus
""",
    # sketch-contract oracle: exact percentiles are cross-engine
    # reproducible; the in-bound booleans assert Spark's GK sketch
    # honored its ±2%-rank accuracy contract (literal TRUE here, so a
    # contract breach hash-fails instead of hiding in rows-only)
    "agg_approx_percentiles": f"""
SELECT o_orderstatus AS status,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       true AS p50_in_bound,
       true AS p90_in_bound,
       true AS p99_in_bound
FROM orders WHERE {finite_or_null_sql("o_totalprice")}
GROUP BY o_orderstatus
""",
    "quantile_bins": f"""
WITH cuts AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.50) AS q2,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem
  WHERE {finite_or_null_sql("l_extendedprice")}
)
SELECT CASE WHEN l_extendedprice < q1 THEN 'q1_low'
            WHEN l_extendedprice < q2 THEN 'q2_mid_low'
            WHEN l_extendedprice < q3 THEN 'q3_mid_high'
            ELSE 'q4_high' END AS bin,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_quantity), 2) AS total_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem, cuts
WHERE {finite_or_null_sql("l_extendedprice")}
GROUP BY 1
""",
    "winsorize": f"""
WITH v AS (
  SELECT o_orderstatus AS status, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_totalprice IS NOT NULL AND {money_ok_sql("o_totalprice")}
), ranked AS (
  SELECT *, row_number() OVER (
             PARTITION BY status ORDER BY cents, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY status) AS n
  FROM v
), bounded AS (
  SELECT *,
         max(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END)
           OVER (PARTITION BY status) AS lo,
         max(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END)
           OVER (PARTITION BY status) AS hi
  FROM ranked
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(max(lo) AS BIGINT) AS lo_cents,
       CAST(max(hi) AS BIGINT) AS hi_cents,
       CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi,
       {round4_ratio_dec_sql("sum(least(greatest(cents, lo), hi))",
                             "count(*) * 100")} AS winsorized_mean
FROM bounded GROUP BY status
""",
}

# identical Poisson-bootstrap recurrence: public-hash bucket -> CDF-grid
# weight, exact integer-cent replicate means (NULL replicates excluded
# on both sides), discrete-order-statistic CI at integer ceil ranks
ORACLES["bootstrap_ci"] = f"""
WITH o AS (
  SELECT o_orderstatus AS status, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE {money_ok_sql("o_totalprice")}
), rep AS (
  SELECT status, o_orderkey, cents, b
  FROM o, unnest(range(1, {BOOT_B} + 1)) AS rb(b)
), weighted AS (
  SELECT status, b, cents,
    CASE
      WHEN bucket < {POISSON_CUM[0]} THEN 0
      WHEN bucket < {POISSON_CUM[1]} THEN 1
      WHEN bucket < {POISSON_CUM[2]} THEN 2
      WHEN bucket < {POISSON_CUM[3]} THEN 3
      WHEN bucket < {POISSON_CUM[4]} THEN 4
      ELSE 5 END AS w
  FROM (
    SELECT status, b, cents,
           CAST(concat('0x', substr(sha256(
             CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
             1, 8)) AS BIGINT) % 1000000 AS bucket
    FROM rep)
), means AS (
  SELECT status, b,
         {round4_ratio_dec_sql("CAST(sum(w * cents) AS HUGEINT)",
                               "CAST(sum(w) AS HUGEINT) * 100")} AS m
  FROM weighted GROUP BY status, b
), ranked AS (
  SELECT status, m,
         row_number() OVER (PARTITION BY status ORDER BY m, b) AS rn,
         count(*) OVER (PARTITION BY status) AS beff
  FROM means WHERE m IS NOT NULL
), ci AS (
  SELECT status,
         CAST(max(beff) AS BIGINT) AS b_eff,
         max(CASE WHEN rn = (beff * 25 + 999) // 1000 THEN m END) AS ci_lo,
         max(CASE WHEN rn = (beff * 975 + 999) // 1000 THEN m END) AS ci_hi
  FROM ranked GROUP BY status
), point AS (
  SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
         {round4_ratio_dec_sql("CAST(sum(cents) AS HUGEINT)",
                               "CAST(count(*) AS HUGEINT) * 100")}
         AS mean_price
  FROM o GROUP BY status
)
SELECT p.status, p.n_orders, p.mean_price, c.ci_lo, c.ci_hi, c.b_eff
FROM point p JOIN ci c USING (status)
ORDER BY status
"""

# sketch-contract oracle (r8 promotion): exact stratum sizes and the
# configured rates — generated from the same STRAT_RATES constant as
# the Spark side — plus literal TRUE for the 6-sigma binomial bound
# the Spark side computes from its realized sample
ORACLES["sample_stratified"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       round(CASE event_type {cases} ELSE 0.0 END, 2) AS rate,
       TRUE AS sample_in_bound
FROM events GROUP BY event_type
ORDER BY event_type
""".format(cases=" ".join(f"WHEN '{k}' THEN {v}"
                          for k, v in STRAT_RATES.items()))
