"""Aggregation operators (SURVEY.md §2.4 A1-A9).

Reference parity: buildMetrics (src/lib/randomuser.js:70-123) — count
(:71,:118), Set-based count-distinct (:93-94,:119-120), conditional
avg-of-year-diffs (:95-115), toFixed(2) rounding (:121), the vestigial
gender groupBy-count (:72-90), and the REF-DECL dedup_removed metric
(src/mock-data/etl.json:5).

Scale notes (100 TB):
* counts/sums/avgs are map-side partial aggregates — one small shuffle
  of partial states, never of rows.
* exact countDistinct costs an expand+reshuffle per distinct column;
  `agg_approx_count_distinct` is the HLL path you'd run at 100 TB
  (rsd=5% default, constant memory per partition).
* rollup/cube produce grouping-set expansion map-side; the shuffle is
  keyed by (grouping_id, keys) — no extra pass per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import (finite_or_null, finite_or_null_sql,
                               money_ok, money_ok_portable_sql,
                               money_sum, money_sum_raw, money_sum_sql,
                               rate_ok, rate_ok_portable_sql,
                               stat_ok, stat_ok_sql,
                               round4_ratio_dec, round4_ratio_dec_sql)
from ..oracles import USERS_CTE
from ..tables import CURRENT_YEAR, load, users_clean, users_valid


def _agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: totalUsers = count(*) (randomuser.js:71,118)."""
    return users_clean(spark, sf_dir).agg(
        F.count("*").alias("total_users"))


def _agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: uniqueCountries / uniqueCities via Set.size
    (randomuser.js:93-94,119-120)."""
    return users_clean(spark, sf_dir).agg(
        F.countDistinct("country").alias("unique_countries"),
        F.countDistinct("city").alias("unique_cities"),
    )


def _agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 at scale: HLL sketch instead of exact expand-shuffle.
    Promoted from rows-only to a full hash oracle in round 5 via the
    sketch-contract encoding (same scheme as agg_approx_percentiles):
    Spark's HLL++ estimate can never value-match DuckDB's HLL, so the
    output carries (a) the exact distinct count — oracle-reproducible
    — and (b) a boolean asserting the estimate landed within 3x the
    requested 2% relative standard deviation (HLL++ error is
    deterministic for fixed data: register maxes are merge-order
    independent; observed error at sf0.001-0.1 is <1%).  The oracle
    emits the exact count and a literal TRUE, so a sketch running out
    of contract hash-fails the row.

    CONTRACT-MARGIN NOTE (ADVICE r5, triage aid): the 0.06 factor IS
    the theoretical 3-sigma for rsd=0.02, and the bound was
    empirically validated at sf0.001, sf0.01 and sf0.1 (max observed
    error <1%, i.e. 6x headroom).  If this row ever turns red at an
    untested SF or after a Spark upgrade changes HLL++ internals,
    suspect CONTRACT MARGIN first, not query logic — the estimate is
    allowed to move; the exact_users column and the oracle cannot."""
    ev = load(spark, sf_dir, "events")
    return (ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("apx"),
        F.countDistinct("user_id").alias("exact_users"))
        .select(
            "exact_users",
            (F.abs(F.col("apx") - F.col("exact_users"))
             <= 0.06 * F.col("exact_users")).alias("estimate_in_bound")))


def _agg_avg_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4: avgRegistrationYears = round(avg(currentYear - year(ts)), 2)
    over valid dates (randomuser.js:95-115,121); year pinned to 2026."""
    return users_clean(spark, sf_dir).agg(
        F.round(F.avg(F.lit(CURRENT_YEAR) - F.year("registered_ts")), 2)
         .alias("avg_registration_years"))


def _agg_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the vestigial gender-count reduce (randomuser.js:72-90),
    realized over events.event_type as SURVEY.md §2.4 maps it."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        money_sum("value").alias("total_value"),
    )


def _dedup_removed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (REF-DECL): dedup_removed = rows_valid - rows_after_dedup
    (etl.json:5 invariant rows_in - rows_out == dedup_removed)."""
    valid = users_valid(spark, sf_dir).agg(
        F.count("*").alias("rows_valid"))
    deduped = users_clean(spark, sf_dir).agg(
        F.count("*").alias("rows_out"))
    return valid.crossJoin(deduped).select(
        "rows_valid", "rows_out",
        (F.col("rows_valid") - F.col("rows_out")).alias("dedup_removed"),
    )


def _agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: revenue rollup by (region, nation) with subtotals + grand
    total — grouping-set expansion, single shuffle."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")
    joined = (
        orders
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation),
              customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup(F.col("r_name").alias("region"),
                      F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("order_cnt"),
             money_sum("o_totalprice").alias("revenue"))
    )


def _agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8b: cube over (orderstatus, orderpriority) — all 4 grouping sets."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube(F.col("o_orderstatus").alias("status"),
                    F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_cnt"),
             money_sum("o_totalprice").alias("revenue"))
    )


def _agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: bivariate statistics battery — Pearson correlation,
    sample/population covariance of quantity vs extended price per
    return flag, plus the univariate quantity stddev.  Single-pass
    mergeable co-moments: each partition keeps (n, Sx, Sy, Sxy, Sxx,
    Syy) and merges — constant memory at 100 TB.

    Exactness (r13 max-cardinality rewrite): both measures quantize to
    integer CENTS (floor(v*100 + 0.5) — exact recovery of the 2dp
    measure grid, the fleet money contract) and all six co-moment sums
    accumulate in DECIMAL(38,0)/HUGEINT — order-free, so results
    cannot depend on partial-aggregation order or file layout.  The
    covariances are EXACT half-up integer ratios (round4_ratio_dec at
    4dp; the r13 sweep caught a 2-row group whose covar_pop landed
    EXACTLY on a .5 and the engines' double round() legitimately
    disagreed — the agg_stats many-files class, closed the same way).
    corr and stddev pass through sqrt (irrational for any
    non-degenerate group), computed from DOUBLE casts of the SAME
    exact integers — identical IEEE operands on both engines, then
    round(6)/round(4).

    The r13 sweep also caught a crash: Spark's corr() aggregate
    RAISES ANSI DIVIDE_BY_ZERO on a zero-variance group with n >= 2
    (DuckDB returns NULL; covar/stddev carry proper guards, corr does
    not) — one constant-valued group would kill the whole job at any
    scale.  The closed-form corr here guards variance > 0 explicitly
    and NULLs degenerate groups on both engines.

    NULL semantics match the engine aggregates they replace: the
    pairwise stats sum only rows where BOTH measures are non-NULL
    (corr/covar pair-skip), the quantity stddev sums rows where
    quantity alone is non-NULL, and n = count(*) counts every
    surviving row.

    Bounded-domain contract (the agg_moments discipline): |measure| <
    1e7 on top of stat_ok, so cents <= 1e9 and each Sxy term <= 1e18.
    The BINDING term is not the covar numerator cv = n*Sxy - Sx*Sy
    (<= 2n²·1e18) itself but round4_ratio_dec's internal x20000 on it
    (r13 review): 4e22·n² must stay inside DECIMAL(38,0)/HUGEINT, so
    the envelope is ~5e7 rows per group at worst-case measures — or
    ~5e9 at realistic |measure| < 1e5.  Past that, requantize to
    dollars (the agg_moments dial, x1e4 headroom) — same downstream
    shape."""
    # r11 extreme-doubles sweep: inf/NaN poison the co-moment sums
    # (DuckDB refuses, Spark emits garbage); corrupt measures are
    # excluded like the rest of the stat family, and the r13 capacity
    # bound excludes finite-but-huge measures the cents cast cannot
    # hold (NULLs still pass — they carry the pair-skip semantics)
    rep_bound = 1e7
    li = load(spark, sf_dir, "lineitem").where(
        stat_ok("l_quantity") & stat_ok("l_extendedprice")
        & (F.col("l_quantity").isNull()
           | (F.abs("l_quantity") < rep_bound))
        & (F.col("l_extendedprice").isNull()
           | (F.abs("l_extendedprice") < rep_bound)))
    dec = "decimal(38,0)"
    qc = F.floor(F.col("l_quantity") * 100 + 0.5)
    pc = F.floor(F.col("l_extendedprice") * 100 + 0.5)
    both = F.col("l_quantity").isNotNull() \
        & F.col("l_extendedprice").isNotNull()
    qok = F.col("l_quantity").isNotNull()
    base = li.select(
        "l_returnflag",
        F.when(both, qc).cast("long").alias("xq"),
        F.when(both, pc).cast("long").alias("yp"),
        F.when(qok, qc).cast("long").alias("q"))
    sums = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count("xq").alias("np"),
        F.sum(F.col("xq").cast(dec)).alias("sx"),
        F.sum(F.col("yp").cast(dec)).alias("sy"),
        F.sum(F.col("xq").cast(dec) * F.col("yp")).alias("sxy"),
        F.sum(F.col("xq").cast(dec) * F.col("xq")).alias("sxx"),
        F.sum(F.col("yp").cast(dec) * F.col("yp")).alias("syy"),
        F.count("q").alias("nq"),
        F.sum(F.col("q").cast(dec)).alias("sq"),
        F.sum(F.col("q").cast(dec) * F.col("q")).alias("sqq"))
    npd = F.col("np").cast(dec)
    cv = npd * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = npd * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = npd * F.col("syy") - F.col("sy") * F.col("sy")
    nqd = F.col("nq").cast(dec)
    vq = nqd * F.col("sqq") - F.col("sq") * F.col("sq")
    # corr = cv / sqrt(vx*vy): scale factors cancel, so the exact
    # integers go straight in; sqrt/division over identical IEEE
    # operands on both engines
    corr = F.when(
        (vx > 0) & (vy > 0),
        cv.cast("double")
        / F.sqrt(vx.cast("double") * vy.cast("double")))
    # covar_samp = cv / (np*(np-1)*1e4), covar_pop = cv / (np^2*1e4)
    # (1e4 converts cents^2 back to measure units); exact 4dp half-up
    # ratios — NULL when np < 2 / np < 1, matching the engine aggs
    stddev = F.when(
        F.col("nq") >= 2,
        F.sqrt(vq.cast("double")
               / (F.col("nq").cast("double")
                  * (F.col("nq") - 1).cast("double"))) / 100.0)
    return (
        sums.select(
            "l_returnflag",
            F.round(corr, 6).alias("qty_price_corr"),
            round4_ratio_dec(cv, npd * (F.col("np") - 1).cast(dec)
                             * 10000).alias("qty_price_covar"),
            round4_ratio_dec(cv, npd * npd * 10000)
            .alias("qty_price_covar_pop"),
            F.round(stddev, 4).alias("qty_stddev"),
            "n",
        )
    )


def _agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric aggregate battery on lineitem: min/max/sum/avg/stddev —
    TPC-H Q1 shape (the canonical pricing-summary scan-agg).

    Money sums accumulate in exact DECIMAL, never DOUBLE (r12
    many-files sweep: the 3-factor sum_charge double sum flipped a
    CENT between a 1-file and a 7-file layout of the SAME rows —
    partial-aggregation order is a function of file layout, and a
    result that depends on file count is wrong at any scale).  The
    sql_q10 discipline: per-row products in DECIMAL (discount/tax at
    their natural (4,2) width keeps the 3-factor product inside
    precision 38), exact order-free sums, ONE cast back to DOUBLE.
    Averages derive from the exact sums — one IEEE division with
    identical operands on both engines — instead of avg()'s
    order-dependent double accumulation (count(col), not count(*), to
    keep avg's NULL-skip semantics).  The measure filter is money_ok
    (finite AND inside the DECIMAL capacity — r12 review: a finite
    9e18 is as corrupt as inf and crashes the cast on both engines),
    with the tighter RATE_ABS_MAX width bound on the DECIMAL(4,2)
    rate casts."""
    li = load(spark, sf_dir, "lineitem").where(
        money_ok("l_quantity") & money_ok("l_extendedprice")
        & rate_ok("l_discount") & rate_ok("l_tax"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")     # noqa: E731
    rate = lambda c: F.col(c).cast("decimal(4,2)")     # noqa: E731
    disc_price = dec("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2)
             .cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2)
             .cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2)
             .cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + rate("l_tax"))), 2)
             .cast("double").alias("sum_charge"),
            F.round(F.sum(dec("l_quantity")).cast("double")
                    / F.count("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double")
                    / F.count("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.sum(dec("l_discount")).cast("double")
                    / F.count("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max over timestamps and strings (lexicographic) on events."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.min("event_type").alias("min_type"),
        F.max("event_type").alias("max_type"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def _agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew pattern: two-phase salted aggregation over a 3-value key
    (o_orderstatus — maximally skewed: ~n/3 rows per key).  Phase 1
    pre-aggregates on (key, salt16) spreading each hot key over 16
    reducers; phase 2 merges the 48 partials.  Equivalent to the plain
    groupBy (the oracle proves it); at 100 TB this is the manual
    fallback when AQE skew-split can't help (e.g. skewed agg, not
    join)."""
    orders = load(spark, sf_dir, "orders")
    salted = orders.withColumn(
        "_salt", F.pmod(F.col("o_orderkey"), F.lit(16)))
    phase1 = salted.groupBy("o_orderstatus", "_salt").agg(
        F.count("*").alias("pc"),
        # exact DECIMAL partials (money_sum contract): the partial->
        # merge tree is exactly the layout-dependent order a double
        # sum is sensitive to
        money_sum_raw("o_totalprice").alias("ps"),
    )
    return (
        phase1.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.sum("pc").alias("order_cnt"),
             F.round(F.sum("ps"), 2).cast("double").alias("revenue"))
    )


HIST_BINS = 8


def _agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: equi-width histogram of o_totalprice — the distribution
    profile every data-quality dashboard draws.  min/max come from a
    1-row aggregate CROSS JOINED back (broadcast of one row), so the
    whole histogram is two passes over one scan lineage and one
    tiny shuffle of HIST_BINS rows — never a collect-then-requery.
    Bucket arithmetic (floor of the scaled offset, clamped to the last
    bin) is identical IEEE-754 on both engines."""
    # r11 extremes sweep: an inf bound makes every bucket NaN (and
    # the INT cast a crash); corrupt prices are excluded like NULLs
    orders = load(spark, sf_dir, "orders").where(
        finite_or_null("o_totalprice"))
    bounds = orders.agg(F.min("o_totalprice").alias("lo"),
                        F.max("o_totalprice").alias("hi"))
    step = (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BINS))
    # try_divide: a ZERO-WIDTH range (constant column, or one row after
    # a filter) makes step 0 and ANSI division a task-killing crash.
    # try_divide yields NULL there, and least() skips NULLs on BOTH
    # engines, so the degenerate range lands everything in the last
    # bin with edge_lo == edge_hi == lo — exactly what the oracle's
    # NULL-propagating DuckDB arithmetic already computes (r10
    # single-row sweep)
    bucket = F.least(
        F.floor(F.try_divide(F.col("o_totalprice") - F.col("lo"), step)),
        F.lit(HIST_BINS - 1)).cast("int")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"),
                (F.col("lo") + bucket * step).alias("edge_lo"),
                (F.col("lo") + (bucket + 1) * step).alias("edge_hi"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"),
             F.round(F.first("edge_lo"), 2).alias("edge_lo"),
             F.round(F.first("edge_hi"), 2).alias("edge_hi"))
    )


#: shared skewness/kurtosis closed form over DOUBLE power-sum columns
#: (nD, s1D..s4D) — ONE string used verbatim by selectExpr and the
#: DuckDB oracle (the window_ewma discipline): both engines start from
#: identical exact-integer sums, so the fixed IEEE expression tree
#: yields identical doubles, and the single pow() per statistic rounds
#: at 6dp (a transcendental can't land on a rounding half)
_MOM_MU = "(s1D / nD)"
_MOM_M2 = f"(s2D / nD - {_MOM_MU} * {_MOM_MU})"
_MOM_M3 = (f"(s3D / nD - 3.0 * {_MOM_MU} * s2D / nD"
           f" + 2.0 * {_MOM_MU} * {_MOM_MU} * {_MOM_MU})")
_MOM_M4 = (f"(s4D / nD - 4.0 * {_MOM_MU} * s3D / nD"
           f" + 6.0 * {_MOM_MU} * {_MOM_MU} * s2D / nD"
           f" - 3.0 * {_MOM_MU} * {_MOM_MU} * {_MOM_MU} * {_MOM_MU})")
_MOM_SEL = (
    f"CASE WHEN {_MOM_M2} > 0"
    f" THEN round({_MOM_M3} / pow({_MOM_M2}, 1.5), 6) END AS skewness",
    f"CASE WHEN {_MOM_M2} > 0"
    f" THEN round({_MOM_M4} / pow({_MOM_M2}, 2.0), 6) END"
    " AS kurtosis_raw",
)


def _agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): higher-moment distribution profile — population
    variance, skewness and raw kurtosis of order totals per status,
    the one-pass shape test a monitoring pipeline runs where
    `agg_stats` stops at means (is the revenue distribution
    right-tailed? heavier than normal?).

    Exactness: prices quantize to integer DOLLARS (floor(p + 0.5) —
    cents would push the 4th power sum past DECIMAL(38,0) at sf0.1;
    in dollars the BINDING constraint is not S4 = Σd⁴ ≤ n·1.3e23 but
    the variance numerator's cross terms s1² and s2·n, both ≤ n²·3.6e11
    at d ≤ 6e5 — inside DECIMAL(38,0) to ~1.6e13 rows/group, still
    ~2000× a 100 TB status-group's row count),
    the four power sums accumulate exactly in DECIMAL(38,0)
    (order-free), and the closed-form combination runs over DOUBLE
    casts of those exact integers through the ONE shared expression
    string above.  A constant group (m2 = 0) yields NULL
    skew/kurtosis on both engines, never a /0 crash (ANSI).

    100 TB shape: ONE partial-agg'd groupBy carries 5 numbers per
    (partition, status) — the canonical mergeable-moments pattern
    (what Welford/DataSketches moments do with floats, done here in
    exact integers because the domain is bounded); everything after
    the shuffle is |statuses|-row arithmetic."""
    # r11 extreme-doubles sweep + r12 domain bound: floor(inf + 0.5)
    # kills the dollar quantization cast, and a FINITE huge price is
    # just as lethal further down — dd = d*d must stay in int64
    # (|d| < 3e9) and n*d^4 inside DECIMAL(38,0)/HUGEINT, so the
    # operator's documented bounded-domain contract is explicit:
    # |price| < 1e7 (d^4 = 1e28 leaves 10 orders for n).  NULLs pass
    rep_bound = 1e7
    orders = load(spark, sf_dir, "orders").where(
        finite_or_null("o_totalprice")
        & (F.col("o_totalprice").isNull()
           | (F.abs("o_totalprice") < rep_bound)))
    d = F.floor(F.col("o_totalprice") + 0.5)
    dd = (d * d).alias("dd")
    base = orders.select(F.col("o_orderstatus").alias("status"),
                         d.alias("d"), dd)
    sums = base.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum(F.col("d").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("dd").cast("decimal(38,0)")).alias("s2"),
        F.sum((F.col("dd").cast("decimal(38,0)") * F.col("d")))
        .alias("s3"),
        F.sum((F.col("dd").cast("decimal(38,0)") * F.col("dd")))
        .alias("s4"))
    # mean and variance are RATIOS OF EXACT INTEGERS — engine round()
    # diverges on exact decimal halves (the r5 class), so both go
    # through the exact half-up helper: mean = s1/n, population
    # variance = (n*s2 - s1^2) / n^2, both in DECIMAL space.  skew and
    # kurtosis pass through pow() (irrational for any non-degenerate
    # group), which cannot land on a rounding half — plain round(6) on
    # the shared-expression double is engine-stable there.
    casted = sums.select(
        "status", "n",
        round4_ratio_dec(F.col("s1"), F.col("n").cast("decimal(38,0)"))
        .alias("mean_dollars"),
        round4_ratio_dec(
            F.col("s2") * F.col("n") - F.col("s1") * F.col("s1"),
            (F.col("n").cast("decimal(38,0)")
             * F.col("n")).cast("decimal(38,0)")).alias("variance"),
        F.col("n").cast("double").alias("nD"),
        F.col("s1").cast("double").alias("s1D"),
        F.col("s2").cast("double").alias("s2D"),
        F.col("s3").cast("double").alias("s3D"),
        F.col("s4").cast("double").alias("s4D"))
    return (casted.selectExpr(
                "status", "n", "mean_dollars", "variance",
                *_MOM_SEL)
            .orderBy("status"))


def _agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 at 100 TB, the MERGEABLE form: per-group Apache DataSketches
    HLL sketches (hll_sketch_agg) estimated per event_type, PLUS an
    'ALL' row built by hll_union_agg over the per-group sketch BINARIES
    — never re-reading the raw stream.  Mergeability is the whole
    scale story: sketches reduce map-side, union at any rollup level,
    and can be persisted as bytes for incremental daily refresh.

    Promoted from rows-only to a full hash oracle in round 8 via the
    sketch-contract encoding (the agg_approx_count_distinct scheme;
    the r7 verdict's top task 2 — a rows-only query in the
    verification window burns a slot the driver can't use): sketch
    binaries and estimates can never value-match across engines, so
    the output carries (a) the exact distinct count per group AND for
    the unioned ALL row — oracle-reproducible — and (b) a boolean
    asserting each estimate landed within 5% relative error.  lgK=14
    gives rse ≈ 1.04/√2^14 ≈ 0.81%, so 5% is ~6σ; DataSketches HLL
    is exact in sparse mode at small cardinalities, so the relative
    bound needs no absolute slack.  The oracle emits the exact counts
    and literal TRUE: a sketch out of contract hash-fails the row.
    If this ever reds after a DataSketches upgrade, suspect CONTRACT
    MARGIN first — the estimate may move; exact_users cannot."""
    ev = load(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"))
    per_group = sketches.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est"),
        "exact_users")
    overall = (
        sketches.agg(F.hll_union_agg("sk").alias("u"))
        .crossJoin(F.broadcast(
            ev.agg(F.countDistinct("user_id").alias("exact_users"))))
        .select(F.lit("ALL").alias("event_type"),
                F.hll_sketch_estimate("u").alias("est"),
                "exact_users"))
    return (per_group.unionByName(overall)
            .select("event_type", "exact_users",
                    (F.abs(F.col("est") - F.col("exact_users"))
                     <= 0.05 * F.col("exact_users"))
                    .alias("estimate_in_bound"))
            .orderBy("event_type"))


# data-profiling sweep: the columns audited and the audited table.
# Scale note in _profile_columns' docstring.
PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority"]


def _profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: per-column data profiling (null counts, exact distinct
    cardinality, null fraction) — the first query any pipeline runs on
    a new source, and the stats a curation dashboard shows per column.

    One scan computes every column's aggregates in a single agg node;
    ``stack`` unpivots the 1-row result into the per-column report
    (driver-side width, executor-side single pass).  The exact
    multi-column count(distinct) expands the input ×(columns+1)
    (Spark's Expand strategy) — fine at audit cadence; at 100 TB the
    drop-in swap is approx_count_distinct, which collapses the Expand
    into one pass of mergeable HLL states (same output shape, ±2%).
    Exactness kept here for the DuckDB oracle."""
    orders = load(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint"))
                    .alias(f"{c}_nn"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}_nd"))
    one = orders.agg(*aggs)
    stack = "stack({}, {}) as (column_name, n_null, n_distinct)".format(
        len(PROFILE_COLS),
        ", ".join(f"'{c}', {c}_nn, {c}_nd" for c in PROFILE_COLS))
    return (
        one.selectExpr("n_rows", stack)
        .select("column_name", "n_rows", "n_null", "n_distinct",
                F.round(F.col("n_null") / F.col("n_rows"), 4)
                 .alias("null_frac"))
    )


def _bitmap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: bitmap activity aggregation — each user's active days in
    the month packed into one BIGINT (bit d-1 set if any event on day
    d), the roaring-bitmap engagement pattern: distinct-day counting
    becomes bit_or + bit_count, with NO count(distinct) Expand and no
    per-day rows — the aggregation state is 8 bytes per user no
    matter how many events they produced, and masks from different
    partitions/epochs merge with a single OR (the same mergeability
    argument as the HLL sketches in `agg_hll_sketch`, but exact,
    because the domain is bounded).  Derived per user: active-day
    count, first/last active day, and density over the active span."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").alias("day"))
    return (
        ev.groupBy("user_id")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), day - 1)"))
              .alias("day_mask"),
             F.min("day").alias("first_day"),
             F.max("day").alias("last_day"))
        .select("user_id", "day_mask",
                F.bit_count("day_mask").alias("n_active_days"),
                "first_day", "last_day",
                F.round(F.bit_count("day_mask")
                        / (F.col("last_day") - F.col("first_day") + 1),
                        4).alias("span_density"))
        .orderBy("user_id")
    )


QUERIES = {
    "bitmap_days": _bitmap_days,
    "profile_columns": _profile_columns,
    "agg_hll_sketch": _agg_hll_sketch,
    "agg_moments": _agg_moments,
    "agg_histogram": _agg_histogram,
    "agg_corr": _agg_corr,
    "agg_count": _agg_count,
    "agg_salted_twophase": _agg_salted_twophase,
    "agg_count_distinct": _agg_count_distinct,
    "agg_approx_count_distinct": _agg_approx_count_distinct,
    "agg_avg_years": _agg_avg_years,
    "agg_group_count": _agg_group_count,
    "dedup_removed_count": _dedup_removed_count,
    "agg_rollup": _agg_rollup,
    "agg_cube": _agg_cube,
    "agg_stats": _agg_stats,
    "agg_min_max": _agg_min_max,
}

ORACLES = {
    "bitmap_days": """
WITH m AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << (dayofmonth(ts) - 1)) AS day_mask,
         CAST(min(dayofmonth(ts)) AS INTEGER) AS first_day,
         CAST(max(dayofmonth(ts)) AS INTEGER) AS last_day
  FROM events GROUP BY user_id
)
SELECT user_id, day_mask,
       CAST(bit_count(day_mask) AS INTEGER) AS n_active_days,
       first_day, last_day,
       round(bit_count(day_mask)
             / CAST(last_day - first_day + 1 AS DOUBLE), 4)
         AS span_density
FROM m
""",
    # exact HUGEINT co-moments over integer cents — the r13 rewrite
    # (see _agg_corr): covariances as exact 4dp half-up ratios; corr
    # and stddev through sqrt over identical IEEE operands
    "agg_corr": f"""
WITH base AS (
  SELECT l_returnflag,
         CASE WHEN l_quantity IS NOT NULL
               AND l_extendedprice IS NOT NULL
              THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END
           AS xq,
         CASE WHEN l_quantity IS NOT NULL
               AND l_extendedprice IS NOT NULL
              THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           END AS yp,
         CASE WHEN l_quantity IS NOT NULL
              THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END
           AS q
  FROM lineitem
  WHERE {stat_ok_sql("l_quantity")}
    AND {stat_ok_sql("l_extendedprice")}
    AND (l_quantity IS NULL OR abs(l_quantity) < 1e7)
    AND (l_extendedprice IS NULL OR abs(l_extendedprice) < 1e7)
), sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(xq) AS HUGEINT) AS np,
         coalesce(sum(CAST(xq AS HUGEINT)), 0) AS sx,
         coalesce(sum(CAST(yp AS HUGEINT)), 0) AS sy,
         coalesce(sum(CAST(xq AS HUGEINT) * yp), 0) AS sxy,
         coalesce(sum(CAST(xq AS HUGEINT) * xq), 0) AS sxx,
         coalesce(sum(CAST(yp AS HUGEINT) * yp), 0) AS syy,
         CAST(count(q) AS HUGEINT) AS nq,
         coalesce(sum(CAST(q AS HUGEINT)), 0) AS sq,
         coalesce(sum(CAST(q AS HUGEINT) * q), 0) AS sqq
  FROM base GROUP BY l_returnflag
)
SELECT l_returnflag,
       CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
            THEN round(CAST(np * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                              * CAST(np * syy - sy * sy AS DOUBLE)), 6)
         END AS qty_price_corr,
       {round4_ratio_dec_sql("np * sxy - sx * sy",
                             "np * (np - 1) * 10000")}
         AS qty_price_covar,
       {round4_ratio_dec_sql("np * sxy - sx * sy", "np * np * 10000")}
         AS qty_price_covar_pop,
       CASE WHEN nq >= 2
            THEN round(sqrt(CAST(nq * sqq - sq * sq AS DOUBLE)
                            / (CAST(nq AS DOUBLE)
                               * CAST(nq - 1 AS DOUBLE))) / 100.0, 4)
         END AS qty_stddev,
       n
FROM sums
""",
    "agg_histogram": f"""
WITH fo AS (
  SELECT * FROM orders
  WHERE {finite_or_null_sql("o_totalprice")}
), bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM fo
), bucketed AS (
  SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 8.0))
               AS INTEGER), 7) AS bucket,
         lo, hi
  FROM fo CROSS JOIN bounds
)
SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
       round(min(lo + bucket * ((hi - lo) / 8.0)), 2) AS edge_lo,
       round(min(lo + (bucket + 1) * ((hi - lo) / 8.0)), 2) AS edge_hi
FROM bucketed
GROUP BY bucket
""",
    "agg_salted_twophase": f"""
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders GROUP BY o_orderstatus
""",
    "agg_count": USERS_CTE + """
SELECT CAST(count(*) AS BIGINT) AS total_users FROM users_clean
""",
    "agg_count_distinct": USERS_CTE + """
SELECT CAST(count(DISTINCT country) AS BIGINT) AS unique_countries,
       CAST(count(DISTINCT city) AS BIGINT) AS unique_cities
FROM users_clean
""",
    # sketch-contract oracle (see the query docstring): exact count is
    # cross-engine reproducible, the bound boolean is literal TRUE
    "agg_approx_count_distinct": """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       true AS estimate_in_bound
FROM events
""",
    "agg_avg_years": USERS_CTE + f"""
SELECT round(avg({CURRENT_YEAR} - year(registered_ts)), 2)
         AS avg_registration_years
FROM users_clean
""",
    "agg_group_count": f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
       {money_sum_sql("value")} AS total_value
FROM events GROUP BY event_type
""",
    "dedup_removed_count": USERS_CTE + """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM users_valid) AS rows_valid,
  (SELECT CAST(count(*) AS BIGINT) FROM users_clean) AS rows_out,
  (SELECT CAST(count(*) AS BIGINT) FROM users_valid)
    - (SELECT CAST(count(*) AS BIGINT) FROM users_clean) AS dedup_removed
""",
    "agg_rollup": f"""
SELECT r_name AS region, n_name AS nation,
       CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    "agg_cube": f"""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    # exact DECIMAL money sums (r12 many-files sweep: double sums are
    # partial-order-dependent, flipping cents across file layouts);
    # avgs derive from the exact sums — identical IEEE operands
    "agg_stats": f"""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_quantity), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_extendedprice), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / count(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  AND {money_ok_portable_sql("l_quantity")}
  AND {money_ok_portable_sql("l_extendedprice")}
  AND {rate_ok_portable_sql("l_discount")}
  AND {rate_ok_portable_sql("l_tax")}
GROUP BY l_returnflag, l_linestatus
""",
    "agg_min_max": """
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
       min(event_type) AS min_type,
       max(event_type) AS max_type,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
""",
}

# sketch-contract oracle (r8 promotion): the exact distinct counts —
# per group and for the unioned ALL row — plus literal TRUE for the
# accuracy-bound assertion the Spark side computes from its sketch
ORACLES["agg_hll_sketch"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS estimate_in_bound
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS estimate_in_bound
FROM events
ORDER BY event_type
"""

# profile oracle: one UNION ALL branch per audited column (DuckDB has
# no stack(); the branch list is generated from the same PROFILE_COLS
# constant so the two sides cannot drift)
ORACLES["profile_columns"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       round(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
             / count(*), 4) AS null_frac
FROM orders"""
    for c in PROFILE_COLS)

# agg_moments oracle (r8): exact HUGEINT power sums, exact-ratio mean
# and variance via the shared half-up helper, skew/kurtosis through
# the SAME closed-form expression strings as the Spark side
ORACLES["agg_moments"] = f"""
WITH base AS (
  SELECT o_orderstatus AS status,
         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS d
  FROM orders
  WHERE {finite_or_null_sql("o_totalprice")}
    AND (o_totalprice IS NULL OR abs(o_totalprice) < 1e7)
), sums AS (
  SELECT status, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(d AS HUGEINT)) AS s1,
         sum(CAST(d AS HUGEINT) * d) AS s2,
         sum(CAST(d AS HUGEINT) * d * d) AS s3,
         sum(CAST(d AS HUGEINT) * d * d * d) AS s4
  FROM base GROUP BY status
), casted AS (
  SELECT status, n,
         {round4_ratio_dec_sql('s1', 'n')} AS mean_dollars,
         {round4_ratio_dec_sql('s2 * n - s1 * s1', 'CAST(n AS HUGEINT) * n')}
           AS variance,
         CAST(n AS DOUBLE) AS nD, CAST(s1 AS DOUBLE) AS s1D,
         CAST(s2 AS DOUBLE) AS s2D, CAST(s3 AS DOUBLE) AS s3D,
         CAST(s4 AS DOUBLE) AS s4D
  FROM sums
)
SELECT status, n, mean_dollars, variance,
       {_MOM_SEL[0]},
       {_MOM_SEL[1]}
FROM casted ORDER BY status
"""
