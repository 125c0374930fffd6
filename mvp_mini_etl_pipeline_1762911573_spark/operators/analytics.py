"""Event-analytics operators (EXT): funnel analysis, cohort retention,
and statistical outlier detection over the `events` table.

No reference counterpart (the reference's only event surface is the
staged run log, pages/index.js:63-80); these are the standard product-
analytics queries any engine claiming "same query capabilities at
100 TB" must run, and they exercise plan shapes the rest of the suite
doesn't: sequential conditional aggregation (funnel), self-alignment on
a derived key (cohorts), and aggregate-then-rejoin standardization
(z-score).

Scale notes (100 TB):
* funnel: every stage keys on user_id — one hash partitioning reused
  by all three conditional aggs, and each stage's output shrinks
  monotonically (survivors only), so stages 2..k are broadcast-join
  candidates under AQE.  No windows over the raw stream.
* retention: the cohort assignment (min ts per user) and the activity
  matrix (distinct user×week) both reduce on user_id before the join,
  so the join inputs are per-user rows, not raw events.  The final
  rollup is per (cohort, offset) — tiny.
* z-score: per-group moments via ONE partial-aggregated groupBy on a
  5-value key, broadcast back over the stream — never a whole-partition
  window (an unbounded window over event_type would buffer 20 TB per
  group on a real corpus; the broadcast join is the correct shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exact import (finite_or_null, finite_or_null_sql,
                               money_ok, money_ok_sql,
                               stat_ok, stat_ok_sql,
                               round4_ratio, round4_ratio_dec,
                               round4_ratio_dec_sql, round4_ratio_sql)
from ..tables import load

# Ordered funnel definition: each step must happen strictly after the
# previous step's completion and within FUNNEL_WINDOW_H hours of it.
FUNNEL_STEPS = ["signup", "view", "purchase"]
FUNNEL_WINDOW_H = 24

ZSCORE_CUT = 3.0  # |z| at or above this is an outlier


def _funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: ordered conversion funnel signup → view → purchase with a
    24 h step deadline.  Stage k keeps users whose earliest step-k
    event lands in (t_{k-1}, t_{k-1} + 24 h]; emits one row per step
    with step-over-step and overall conversion rates.  The 3-row
    result window is driver-trivial; the heavy lifting is the chained
    conditional min-aggregations, all keyed on user_id."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type")
    deadline = F.expr(f"INTERVAL {FUNNEL_WINDOW_H} HOURS")

    prev = (ev.where(F.col("event_type") == FUNNEL_STEPS[0])
            .groupBy("user_id").agg(F.min("ts").alias("t")))
    stages = [prev]
    for step in FUNNEL_STEPS[1:]:
        nxt = (
            ev.where(F.col("event_type") == step)
            .join(prev.select("user_id", F.col("t").alias("t_prev")),
                  "user_id")
            .where((F.col("ts") > F.col("t_prev"))
                   & (F.col("ts") <= F.col("t_prev") + deadline))
            .groupBy("user_id").agg(F.min("ts").alias("t"))
        )
        stages.append(nxt)
        prev = nxt

    rows = None
    for i, (step, df) in enumerate(zip(FUNNEL_STEPS, stages), start=1):
        one = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(step).alias("event_type"),
            "n_users")
        rows = one if rows is None else rows.unionByName(one)

    w = Window.orderBy("step")  # 3 rows — single-partition is fine
    first_n = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # try_divide, not /: a step with ZERO users (possible whenever an
    # upstream stage empties — an empty period, a filter that drops
    # every signup) makes the next step's denominator 0, and ANSI mode
    # turns that into a task-killing DIVIDE_BY_ZERO; the oracle wraps
    # its denominators in explicit NULLIF so it emits NULL there by
    # contract, not by DuckDB's default /0 behavior (r10 empty-input
    # sweep; NULLIF added r11 so a DuckDB division-semantics change
    # can't silently alter the oracle)
    return rows.select(
        "step", "event_type", "n_users",
        F.round(F.try_divide(
            F.col("n_users"),
            F.coalesce(F.lag("n_users").over(w), F.col("n_users"))),
            4).alias("conv_rate"),
        F.round(F.try_divide(F.col("n_users"), first_n), 4)
         .alias("overall_rate"),
    )


def _retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: weekly cohort retention — users grouped by first-activity
    week (Monday-truncated), activity counted as distinct user×week,
    offset in whole weeks, retention as a share of the cohort's week-0
    size (window over the tiny per-cohort rollup)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week"),
    ).distinct()
    counts = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int").alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    w = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))) \
            .over(w)
    return counts.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset", "n_active",
        F.round(F.col("n_active") / size, 4).alias("retention"),
    )


def _events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: per-event-type z-score outliers — group moments (mean,
    sample stddev) aggregated once and broadcast back over the event
    stream; rows at |z| ≥ 3 survive.  The rejoin-not-window shape is
    the 100 TB point (see module docstring)."""
    # r11 extreme-doubles sweep: one inf/NaN value poisons the group
    # moments (Spark emits NaN z everywhere, DuckDB refuses VARSAMP)
    ev = (load(spark, sf_dir, "events")
          .where(finite_or_null("value"))
          .select("event_id", "user_id", "event_type", "value"))
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"))
    z = F.round((F.col("value") - F.col("m")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_type", "event_id", "user_id", "value",
                z.alias("z"))
        .where(F.abs(F.col("z")) >= ZSCORE_CUT)
    )


def _gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: time-series densification — per-user weekly event counts
    with MISSING weeks zero-filled against the corpus-wide week spine,
    so downstream window math (moving averages, week-over-week deltas)
    sees a dense series.  The spine is generated per user by exploding
    a sequence() between the global min/max week (a broadcast 1-row
    aggregate) — never a cross join of two large relations; spine rows
    are n_users × n_weeks, partitioned by user like everything else.
    The left join back to actual counts is user+week keyed."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week"))
    counts = ev.groupBy("user_id", "week").agg(
        F.count("*").alias("n_events"))
    bounds = ev.agg(F.min("week").alias("wmin"),
                    F.max("week").alias("wmax"))
    spine = (
        ev.select("user_id").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("user_id",
                F.explode(F.sequence(
                    "wmin", "wmax", F.expr("INTERVAL 7 DAYS")))
                 .alias("week"))
    )
    return (
        spine.join(counts, ["user_id", "week"], "left")
        .select(
            "user_id",
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


def _gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: linear-interpolation densification — `gap_fill`'s numeric
    sibling: where that query zero-fills COUNTS, this one repairs a
    sparse VALUE series (per-user daily purchase average) by linear
    interpolation between the surrounding observations — the standard
    sensor/metrics imputation one notch above LOCF
    (`window_fill_forward`), which biases trends flat.

    Scale shape: the spine is generated per user from that user's own
    [min(day), max(day)] bounds (no global cross join, and edge rows
    are observed by construction so every gap has both neighbors);
    the join back is user+day equi-keyed; prev/next observation value
    AND date arrive via four IGNORE NULLS window calls over the same
    two frames — two streaming passes per user run, no self-join, no
    as-of probe.  Everything after the one groupBy+window shuffle is
    map-side.

    Float parity is by construction: the interpolation expression is
    written identically in both engines over identical doubles (v is
    rounded to 4 before interpolating), and the final 4-decimal
    quantization is floor(x·10⁴ + 0.5)/10⁴ rather than round(x, 4) —
    midpoints are EXACT here (halving 4-decimal neighbors lands on
    x.xxxx5 precisely), where Spark's BigDecimal-HALF_UP and DuckDB's
    binary rounding genuinely disagree; floor on an identical double
    is deterministic in any engine."""
    load(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    return spark.sql("""
        WITH obs AS (
          SELECT user_id, CAST(date_trunc('DAY', ts) AS DATE) AS day,
                 round(avg(value), 4) AS v
          FROM v_events
          WHERE event_type = 'purchase'
            -- double-moment domain bound (r11 extremes + r12
            -- finite-huge arm): inf - inf = NaN inside the
            -- interpolation on one engine, inf on the other, and a
            -- finite 9.5e18 makes the day-mean ulp-diverge; NULL
            -- rows pass through (a NULL-valued day stays observed,
            -- exactly as the null_mixed tier pins)
            AND (value IS NULL
                 OR (NOT isnan(value) AND abs(value) < 9e14))
          GROUP BY user_id, CAST(date_trunc('DAY', ts) AS DATE)
        ), bounds AS (
          SELECT user_id, min(day) AS dmin, max(day) AS dmax
          FROM obs GROUP BY user_id
        ), spine AS (
          SELECT user_id,
                 explode(sequence(dmin, dmax, interval 1 day)) AS day
          FROM bounds
        ), j AS (
          SELECT s.user_id, s.day, o.v
          FROM spine s LEFT JOIN obs o USING (user_id, day)
        ), w AS (
          SELECT user_id, day, v,
                 last_value(v) IGNORE NULLS OVER wp AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN day END)
                   IGNORE NULLS OVER wp AS pd,
                 first_value(v) IGNORE NULLS OVER wf AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN day END)
                   IGNORE NULLS OVER wf AS nd
          FROM j
          WINDOW wp AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, date_format(day, 'yyyy-MM-dd') AS day,
               v AS observed,
               CASE WHEN v IS NOT NULL THEN v
                    ELSE floor((pv + (nv - pv)
                                * CAST(datediff(day, pd) AS DOUBLE)
                                / CAST(datediff(nd, pd) AS DOUBLE))
                               * 10000.0 + 0.5) / 10000.0
               END AS filled,
               v IS NULL AS is_gap
        FROM w
    """)


DEBOUNCE_S = 21600  # suppress repeats within 6 h of a burst start


def _events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: event debouncing — collapse bursts of the same (user,
    event_type) into their first occurrence, the telemetry/clickstream
    noise filter (double-clicks, retry storms, sensor chatter).

    Debounce is trickier than it looks: "drop events within the window of
    the PREVIOUS event" (one lag()) is wrong for chained bursts — a
    burst spanning 20 minutes at 1-min spacing would re-emit nothing
    after the first drop broke the chain... actually it would KEEP
    only gaps, emitting mid-burst events whose predecessor happened to
    be dropped.  The correct semantics ("first event of each burst,
    where a burst ends after a silence ≥ the window") is exactly
    gaps-and-islands: flag gaps > DEBOUNCE_S (6 h here — sized to the fixture event
    rate so suppression actually exercises), running-sum the flags
    into island ids, keep each island's first row.  Same single
    (user_id, event_type) shuffle reused by the lag, the cumsum and
    the ranking — the sessionize plan shape (E9) specialized to
    suppression."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "*",
        F.when(gap.isNull() | (gap > DEBOUNCE_S * 1_000_000), 1)
         .otherwise(0).alias("is_burst_start"))
    islands = flagged.select(
        "*", F.sum("is_burst_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("burst_id"))
    keep_w = Window.partitionBy(
        "user_id", "event_type", "burst_id").orderBy("ts", "event_id")
    return (islands
            .withColumn("rn", F.row_number().over(keep_w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                    F.round("value", 4).alias("value"), "burst_id"))


RATE_LIMIT_N = 5          # allowed events per user per sliding day
RATE_LIMIT_US = 86_400_000_000  # 24 h window, microseconds


def _events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): sliding-window rate limiting — flag every event
    that is its user's (RATE_LIMIT_N+1)-th or later within the
    trailing 24 h, the ingestion-side abuse/bot/crawler throttle a
    training-data pipeline applies before events become features
    (debounce collapses BURSTS of the same action; rate limiting caps
    VOLUME regardless of type or spacing).  Emits the drop list:
    events whose trailing-window count exceeds the limit.

    Semantics: a RANGE frame over event-time microseconds —
    [t − 24 h, t] by VALUE, so simultaneous events are peers and count
    together on both engines (a ROWS frame would tie-break
    arbitrarily; RANGE is the deterministic choice).  All outputs are
    exact integers/strings — no rounding hazard anywhere.

    Execution form (r9): the trailing count is computed as the
    DIFFERENCE OF TWO GROWING FRAMES — #events with us ≤ t minus
    #events with us ≤ t − 24h − 1µs (equal, in exact integer µs, to
    #events with us < t − 24h).  Spark evaluates a growing
    [unboundedPreceding, x] frame incrementally (rows only ever enter
    the buffer) but RECOMPUTES a sliding [-24h, 0] frame from scratch
    per row — O(n·w) per key, measured 18s for one 50k-event hot user
    (the r9 hot-entity sweep) vs ~1s for this form.  Values are
    identical: both frames are peer-inclusive RANGE counts on the
    same integer key.

    100 TB shape: ONE hash-exchange on user_id feeds the sort + both
    growing windows (same ordering — one sort); no joins, no second
    shuffle.  Key count = |users| — AQE skew-split absorbs hot
    users; at extreme skew the window is monotone in t so a
    per-(user, day)-salted two-phase variant keeps the same semantics
    (carry the previous day's tail count), documented not needed at
    the fixture's user fan-out."""
    # an event without a timestamp cannot be rate-limited — excluded
    # on both sides (Spark gives a NULL RANGE key an empty frame while
    # DuckDB makes every NULL a peer of every other: 0 vs 1000 flagged
    # rows on the r11 all-NULL sweep)
    ev = load(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()).select(
        "event_id", "user_id", "event_type", "ts",
        F.unix_micros("ts").alias("us"))
    w_le = (Window.partitionBy("user_id").orderBy("us")
            .rangeBetween(Window.unboundedPreceding, 0))
    w_before = (Window.partitionBy("user_id").orderBy("us")
                .rangeBetween(Window.unboundedPreceding,
                              -RATE_LIMIT_US - 1))
    return (
        ev.withColumn("n_in_window",
                      F.count("*").over(w_le)
                      - F.count("*").over(w_before))
        .where(F.col("n_in_window") > RATE_LIMIT_N)
        .select("event_id", "user_id", "event_type",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                "n_in_window")
    )


def _kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): Kaplan-Meier survival curve for time-to-first-
    purchase — the censoring-aware conversion analysis (a plain
    conversion-time average silently drops every user who has not
    converted YET; KM keeps them at risk until their last observed
    event).  Per user: enter at their first event, 'die' at their
    first purchase, else right-censored at their last event; time is
    whole DAYS (integer µs div 86400e6 — exact on both engines).

    Survival is a cumulative PRODUCT, which floats make order-
    dependent — so it runs through the lm_score idiom: each step's
    ln((n_risk − d)/n_risk) is ln of ONE IEEE division of two exact
    BIGINTs (bit-identical input on both engines), quantized to
    integer micro-units (floor(ln·1e6 + 0.5); |ln·1e6| < 2e7, far
    inside the quantizer's domain), summed EXACTLY in int64 down the
    curve, and exponentiated once per row (transcendental output —
    never on a rounding half).  A step that kills the last subjects
    at risk (d = n_risk) is exact 0, bypassing ln(0).

    Standard KM conventions: subjects censored at t are still at risk
    AT t (cum-prev exclusive window); only death times emit rows.

    Scale: one user_id exchange builds subjects, one per-time agg
    reduces them to ≤ |distinct day durations| rows, and the two
    single-partition windows run over THAT table (bounded by the
    censoring horizon in days, never by users; at a longer horizon
    the two-level prefix scan — mann_whitney's — is the documented
    rewrite)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    subjects = ev.groupBy("user_id").agg(
        F.min("us").alias("enter"),
        F.max("us").alias("last"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us")))
        .alias("conv"))
    subjects = subjects.select(
        F.when(F.col("conv").isNotNull(), F.col("conv") - F.col("enter"))
        .otherwise(F.col("last") - F.col("enter")).alias("dur_us"),
        F.col("conv").isNotNull().cast("long").alias("event"))
    # a subject with NO timestamped events has NULL duration — it was
    # never observed, so it enters neither curve (without the filter
    # the NULL t_days row sorts FIRST through Spark's cumulative
    # windows but LAST through DuckDB's ORDER BY — the r11 NULL-mixed
    # sweep's curve split)
    subjects = subjects.where(F.col("dur_us").isNotNull())
    per_t = (subjects
             .select(F.expr("dur_us div 86400000000").alias("t_days"),
                     "event")
             .groupBy("t_days")
             .agg(F.sum("event").alias("n_events"),
                  F.sum(1 - F.col("event")).alias("n_censored")))
    w_all = Window.orderBy("t_days")
    at_risk = per_t.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(
            w_all.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    deaths = at_risk.where(F.col("n_events") > 0)
    li = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.floor(F.log((F.col("n_risk") - F.col("n_events"))
                      / F.col("n_risk")) * 1e6 + 0.5).cast("long"))
    curve = deaths.withColumn(
        "cum_li",
        F.sum(li).over(w_all.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)))
    survival = F.when(
        F.sum((F.col("n_events") == F.col("n_risk")).cast("int")).over(
            w_all.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)) > 0,
        F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("cum_li") / 1e6), 4))
    return (curve.select("t_days", "n_risk", "n_events", "n_censored",
                         survival.alias("survival"))
            .orderBy("t_days"))


MAD_K = 1.4826  # normal-consistency constant: MAD * 1.4826 ≈ sigma


def _events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: robust (median/MAD) outlier detection — the z-score's
    production-grade sibling: mean and stddev are themselves dragged by
    the outliers they're meant to find, median and MAD are not.  Two
    grouped exact-percentile passes (median of value, then median of
    |value - median|), both tiny per-type aggregates broadcast back
    over the stream; rows beyond 3 robust sigmas survive.  Same
    rejoin-not-window scale shape as events_zscore; at 100 TB swap
    percentile() for approx_percentile sketches (same plan)."""
    ev = (load(spark, sf_dir, "events")
          .where(stat_ok("value"))  # double-moment domain bound (r12)
          .select("event_id", "user_id", "event_type", "value"))
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "event_id", "user_id", "value", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"))
    # zero-MAD guard: a type where >=50% of values equal the median
    # (constant-valued telemetry is common) has mad = 0 and the
    # division would throw DIVIDE_BY_ZERO under ANSI mode — such a
    # group has no robust scale, so its rows are excluded (null z,
    # filtered by the threshold predicate; oracle mirrors)
    rz = F.when(
        F.col("mad") != 0,
        F.round((F.col("value") - F.col("med"))
                / (F.lit(MAD_K) * F.col("mad")), 4))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_type", "event_id", "user_id", "value",
                F.round("med", 4).alias("med"),
                F.round("mad", 4).alias("mad"),
                rz.alias("robust_z"))
        .where(F.abs(F.col("robust_z")) >= 3.0)
    )


def _rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: rolling 7-day active users per day — the canonical
    "COUNT(DISTINCT) over a sliding window" metric, which no engine's
    window frame can express directly (distinct doesn't decompose over
    frames).  The scalable rewrite: dedup to (user, day) FIRST (the
    big cardinality cut, map-side partial), then equi-join each
    activity day to the ≤7 calendar days it contributes to via a
    compact explode, then a plain count-distinct per day.  Work is
    bounded by 7 × |user-days|, never |events| × window; the naive
    per-day self-join over raw events is |events|-squared-ish.  At
    100 TB the (user, day) dedup is the same digest-style shuffle as
    exact dedup, and the 7× fan-out happens AFTER it."""
    ev = load(spark, sf_dir, "events")
    user_days = (ev.select("user_id",
                           F.date_trunc("day", "ts").alias("day"))
                 .distinct())
    contributes = user_days.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + F.expr("INTERVAL 6 DAYS"),
            F.expr("INTERVAL 1 DAY"))).alias("obs_day"))
    # clamp to days that actually occur in the data (no trailing pad)
    days = user_days.select(F.col("day").alias("obs_day")).distinct()
    return (
        contributes.join(days, "obs_day")
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("mau_7d"))
        .select(F.date_format("obs_day", "yyyy-MM-dd").alias("day"),
                "mau_7d")
    )


SESSION_GAP_MIN = 30  # inactivity gap that closes a session


def _sessions(ev: DataFrame) -> DataFrame:
    """Per-session rows (user_id, session_idx, s_start, s_end) via the
    gaps-and-islands idiom — shared by the sessionize query and the
    concurrency (interval-overlap) query."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(prev_ts.isNull() | (prev_ts < F.col("ts") - gap),
                   F.lit(1)).otherwise(F.lit(0))
    return (
        ev.withColumn("new_s", new_s)
        .withColumn(
            "session_idx",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("s_start"),
             F.max("ts").alias("s_end"))
    )


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round-4 debut): gaps-and-islands sessionization — assign
    each event to a per-user session that closes after 30 min of
    inactivity, then aggregate per session.  The batch sibling of
    ST3's session_window(): same semantics, expressed as the classic
    lag-flag + running-sum island id so the whole thing is one window
    spec.

    Scale: everything — lag, cumulative sum, and the final groupBy —
    keys on user_id, so Catalyst reuses ONE hash partitioning for the
    entire plan (window + agg, no second exchange;
    tests/test_profiler.py pins n_shuffles == 1).  No whole-partition
    window frames: state per user is a single row of lag memory.
    Tie-break on event_id makes the order total, so the island ids are
    deterministic under any partitioning."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id")
    return _sessions(ev).select(
        "user_id", "session_idx", "n_events",
        F.date_format("s_start", "yyyy-MM-dd HH:mm:ss")
         .alias("session_start"),
        F.date_format("s_end", "yyyy-MM-dd HH:mm:ss")
         .alias("session_end"),
        (F.unix_timestamp("s_end")
         - F.unix_timestamp("s_start")).alias("duration_sec"),
    )


def _session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (registered for the round-5 window): session concurrency —
    for every session, count the OTHER users' sessions live at the
    same time, where a session stays live until its inactivity gap
    expires ([s_start, s_end + gap)).  The load-profile question
    ("how many users am I serving concurrently?") as an interval
    self-overlap join.

    Scale: the overlap join is the binned-equi-join rewrite of the
    quadratic interval predicate (same move as join_range_binned, on
    the time axis): sessions replicate to the HOUR bins they span
    (bounded fan-out: interval length / bin width, ~2 here), candidates
    equi-join on bin, and the exact half-open-overlap predicate trims
    bin-edge spill.  A naive theta-join is a BroadcastNestedLoop over
    all session pairs — quadratic death at 100 TB; the oracle runs
    exactly that quadratic semantics to certify the rewrite."""
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 5 == 0) \
        .select("user_id", "ts", "event_id")
    gap = F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
    # the session table feeds BOTH sides of the overlap self-join AND
    # the final left join — materialize it once (same move as the LSH
    # signature frame; at 100 TB the session table is written to
    # storage once per run for the same reason)
    sess = (_sessions(ev)
            .select("user_id", "session_idx", "s_start",
                    (F.col("s_end") + gap).alias("s_live"))
            .localCheckpoint(eager=True))
    binned = sess.withColumn(
        "bin", F.explode(F.sequence(
            F.date_trunc("hour", "s_start"),
            F.date_trunc("hour", "s_live"),
            F.expr("INTERVAL 1 HOUR"))))
    l, r = binned.alias("l"), binned.alias("r")
    overlaps = (
        l.join(r, (F.col("l.bin") == F.col("r.bin"))
               & (F.col("l.user_id") != F.col("r.user_id"))
               & (F.col("l.s_start") < F.col("r.s_live"))
               & (F.col("r.s_start") < F.col("l.s_live")))
        .select(F.col("l.user_id").alias("user_id"),
                F.col("l.session_idx").alias("session_idx"),
                F.col("r.user_id").alias("o_user"),
                F.col("r.session_idx").alias("o_session"))
        .distinct()  # a pair straddling 2 shared bins counts once
        .groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_concurrent"))
    )
    return (
        sess.join(overlaps, ["user_id", "session_idx"], "left")
        .select("user_id", "session_idx",
                F.date_format("s_start", "yyyy-MM-dd HH:mm:ss")
                 .alias("session_start"),
                F.coalesce("n_concurrent", F.lit(0))
                 .alias("n_concurrent"))
    )


def _events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (round-4 debut): user-journey transition matrix — count
    consecutive (prev event type → next event type) pairs per user
    ordered by time, then row-normalize into an empirical Markov
    transition probability per source type.

    Scale: the lag keys on user_id (one hash partitioning, same reuse
    as sessionize); the groupBy reduces to a k×k matrix (k = distinct
    event types, single digits) so the normalization window runs over
    a driver-trivial relation.  The raw stream is touched exactly
    once."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .where(F.col("prev_type").isNotNull()))
    matrix = (pairs.groupBy("prev_type",
                            F.col("event_type").alias("next_type"))
              .agg(F.count("*").alias("n_transitions"),
                   F.countDistinct("user_id").alias("n_users")))
    wp = Window.partitionBy("prev_type")
    return matrix.select(
        "prev_type", "next_type", "n_transitions", "n_users",
        F.round(F.col("n_transitions")
                / F.sum("n_transitions").over(wp), 4).alias("p_next"),
    )


SKEW_TOP = 10


def _skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: join-key skew diagnosis — the query a pipeline runs BEFORE
    deciding to salt (operators/joins.py's salted join is the remedy;
    this is the detector).  Per-key row counts for a prospective join
    key, the heaviest SKEW_TOP hitters with their corpus share, and
    each key's multiple of the mean key load (x_avg): keys at x_avg ≫ 1
    are the stragglers that would pin a shuffle partition.

    100 TB shape: per-key counts partial-aggregate map-side (the
    shuffle carries key states, not rows); the top-K is
    TakeOrderedAndProject (per-partition heap + driver K-merge, no
    global sort); the denominator stats are a 1-row broadcast.  At
    extreme cardinality, approx heavy-hitters (count-min / sampled
    counts) replace the exact groupBy — the report shape is
    unchanged."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"))
    top = (counts.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
           .limit(SKEW_TOP))
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(w).alias("rnk"),
            "user_id", "cnt", "n_keys",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("n_rows"), 4)
             .alias("x_avg"),
        )
    )


BASKET_MIN_SUP = 3  # a pair must co-occur in >= this many orders


def _basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: market-basket analysis — frequent part PAIRS across orders
    with support and lift, the apriori-pruned first rung of
    association mining (FP-growth's output for itemset size 2, exact).

    Scale shape, in order of what matters at 100 TB:
    1. APRIORI PRUNE before the quadratic step: an item appearing in
       fewer than BASKET_MIN_SUP orders cannot be in a frequent pair,
       so it is dropped before the self-join.  On long-tail catalogs
       this removes most of the item stream and is THE reason basket
       jobs finish; the prune list arrives as a broadcast (item dim
       sized, never the fact table).
    2. The pair generation is an equi-SELF-JOIN on l_orderkey (both
       sides shuffle-partitioned by order — one exchange each, no
       cartesian anywhere); the a.part < b.part predicate halves the
       output and canonicalizes the pair key.
    3. Lift needs per-item order counts and the global order count —
       both are REUSED aggregates of the same `items` frame (Spark
       computes the distinct once per branch under AQE), joined back
       broadcast-sized.
    All post-join math is count ratios (IEEE division only), so the
    DuckDB oracle matches bit-exactly at round(6)."""
    li = load(spark, sf_dir, "lineitem")
    # r14 OPT (guide §1.2): the distinct (order, item) table feeds the
    # item counts, BOTH self-join sides (via fitems) and the order
    # count — unmaterialized, the scan+distinct ran four times.  Lazy
    # checkpoint (it is the reduced form a basket pipeline would
    # materialize; the self-join sides are concurrent, so no barrier).
    items = (li.select("l_orderkey", "l_partkey").distinct()
             .localCheckpoint(eager=False))
    icnt = items.groupBy("l_partkey").agg(F.count("*").alias("item_cnt"))
    freq = icnt.where(F.col("item_cnt") >= BASKET_MIN_SUP)
    fitems = items.join(F.broadcast(freq.select("l_partkey")), "l_partkey")
    a, b = fitems.alias("a"), fitems.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_a"),
                 F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= BASKET_MIN_SUP)
    )
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ca = icnt.select(F.col("l_partkey").alias("part_a"),
                     F.col("item_cnt").alias("cnt_a"))
    cb = icnt.select(F.col("l_partkey").alias("part_b"),
                     F.col("item_cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("n_orders"), 6)
             .alias("support"),
            F.round(F.col("pair_cnt") * F.col("n_orders")
                    / (F.col("cnt_a") * F.col("cnt_b")), 4).alias("lift"))
        .orderBy(F.col("pair_cnt").desc(), "part_a", "part_b")
    )


def _skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Pareto skyline — customers not strictly dominated on
    (account balance, lifetime spend): no other customer is >= on both
    measures and > on at least one.  The textbook formulation is an
    all-pairs NOT EXISTS (the oracle states it that way as the
    semantic spec); the distributed shape here is the sort-based 2-D
    skyline: collapse to one row per distinct balance level (max
    spend per level — this groupBy is the big shrink: candidates <=
    distinct balance values), then one running-max-with-lag window
    over the level table ranks each level against every strictly
    higher balance, O(levels log levels) instead of O(n^2).  At
    100 TB the level table is bounded by measure cardinality, and a
    map-side per-partition skyline prefilter (each partition's local
    dominated rows can never be global survivors) would shrink the
    input before the window — the standard distributed-skyline
    two-phase."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    pts = (
        orders.where(money_ok("o_totalprice"))  # DECIMAL spend sum
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").alias("spend"))
        .join(cust.select(F.col("c_custkey").alias("o_custkey"),
                          F.round("c_acctbal", 2).alias("bal")),
              "o_custkey")
    )
    # dominance needs BOTH measures: a point with a NULL balance or
    # NULL spend is incomparable — the all-pairs NOT EXISTS spec would
    # keep every such point as never-provably-dominated while the
    # window form sorts it positionally (r11 NULL-mixed sweep: 5 vs 79
    # rows); the skyline is defined over fully-measured points
    pts = pts.where(F.col("bal").isNotNull() & F.col("spend").isNotNull()
                    & finite_or_null("bal") & finite_or_null("spend"))
    lvl = pts.groupBy("bal").agg(F.max("spend").alias("lvl_max"))
    w_above = (Window.orderBy(F.col("bal").desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    keep_lvl = (lvl.withColumn("best_above",
                               F.max("lvl_max").over(w_above))
                .where(F.col("best_above").isNull()
                       | (F.col("lvl_max") > F.col("best_above")))
                .select("bal", "lvl_max"))
    return (
        pts.join(F.broadcast(keep_lvl), "bal")
        .where(F.col("spend") == F.col("lvl_max"))
        .select(F.col("o_custkey").alias("custkey"), "bal", "spend")
        .orderBy(F.col("bal").desc())
    )


#: regression target: value over hours since the corpus epoch —
#: keeps slope magnitudes readable and both engines' x identical
REGR_EPOCH = "2024-01-01 00:00:00"


def _regr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: grouped ordinary-least-squares — per event_type, regress
    value on hours-since-epoch with the SQL-standard regr_* aggregate
    family (slope, intercept, r2, n): the drift-monitoring query a
    metrics platform runs per series.  Pure one-pass aggregation —
    the co-moment states (sums of x, y, xy, x2) are mergeable, so the
    whole fit is map-side partials plus a 5-row reduce; no window, no
    second scan, and adding series never adds passes."""
    ev = (load(spark, sf_dir, "events")
          .where(stat_ok("value"))  # double-moment domain bound (r12)
          .select("event_type", "value",
                  (F.unix_micros("ts") / 3.6e9).alias("x_hours")))
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.regr_slope("value", "x_hours"), 8)
              .alias("slope"),
             F.round(F.regr_intercept("value", "x_hours"), 4)
              .alias("intercept"),
             F.round(F.regr_r2("value", "x_hours"), 6).alias("r2"),
             F.regr_count("value", "x_hours").alias("n"))
        .orderBy("event_type")
    )


ATTR_WINDOW_H = 24  # attribution lookback horizon
ATTR_Q = 10000      # linear-attribution credit quantum: 1e-4 cent


def _attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): LINEAR multi-touch attribution — every
    purchase's value split EQUALLY across all click/view touches in
    the 24 h lookback ('direct' keeps full credit when there are
    none).  The model marketing runs NEXT to last-touch
    (_attribution) to see how much credit the last click steals from
    upper-funnel views; shipping both is the point.

    Exactness: per-(purchase, channel) credit is cents·k_c/n — a
    rational whose denominator varies per purchase, so float credit
    sums would be order-dependent and exact rational sums don't
    exist in SQL.  Credits are therefore quantized to integer
    MICRO-CREDITS: floor(cents·k_c·ATTR_Q / n) in exact DECIMAL(38,0)
    floor division — num − pmod(num, den) is sign-safe floor on Spark,
    and the oracle mirrors it with the explicit ((x%m)+m)%m positive
    mod (DuckDB's bare // truncates toward zero on negatives, the
    stream_ohlc pre-1970 lesson; moot under the positivity guard
    below, kept as defense in depth).  Attributable purchases are
    those with 0 < value < 9e6 (non-NaN, explicitly — both engines
    order NaN above every number, so NaN > 0 alone would ADMIT it):
    NaN/Inf/huge values would saturate Spark's floor(DOUBLE)→LONG
    where DuckDB's BIGINT cast raises, refunds (v ≤ 0) are not
    attributable revenue and would let credits cancel (q_total → 0
    explodes the rev_share ratio past round4_ratio_dec's BIGINT
    range), and the 9e6 cap keeps total·1e4 micro-dollars inside
    int64 to ~1e8 purchases (envelope documented, hostile-value
    differential corpus pins all three edges).
    The ≤ 1e-4-cent-per-cell truncation is deterministic and
    identical on both engines; reported revenue divides the exact
    micro-credit sum by ATTR_Q·100 (round4_ratio_dec), share by the
    exact total.

    Scale: unlike last-touch (two carry windows, zero joins), the
    equal split NEEDS the purchase×touch fan-out — it IS the
    semantics.  The join is user_id-equi + time-range (the
    stream-stream correlate shape): one exchange per side, range
    predicate prunes within user groups, fan-out bounded by touches
    within the horizon (bot users → salting, as documented on
    join_salted).  Everything after is purchase-grained aggregation."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    horizon_us = ATTR_WINDOW_H * 3600 * 1_000_000
    # r13 OPT (guide §1.2): p feeds the touch join AND the direct-
    # credit anti-join; pc below feeds the per-purchase totals AND the
    # credit join — unmaterialized, the events scan + purchase×touch
    # range join chain ran repeatedly (28 parquet scans in the
    # before-plan).  Both frames are purchase-grained (tiny).
    p = (ev.where((F.col("event_type") == "purchase")
                  & F.col("value").isNotNull() & ~F.isnan("value")
                  & (F.col("value") > 0) & (F.col("value") < 9e6))
         .select("user_id", F.col("event_id").alias("p_id"),
                 F.col("us").alias("p_us"),
                 F.floor(F.col("value") * 100 + 0.5).alias("cents"))
         .localCheckpoint(eager=True))
    t = (ev.where(F.col("event_type").isin("click", "view"))
         .select(F.col("user_id").alias("t_user"),
                 F.col("us").alias("t_us"),
                 F.col("event_type").alias("channel")))
    j = p.join(t, (F.col("user_id") == F.col("t_user"))
               & (F.col("t_us") < F.col("p_us"))
               & (F.col("t_us") >= F.col("p_us") - horizon_us))
    pc = j.groupBy("p_id", "cents", "channel").agg(
        F.count("*").alias("k")).localCheckpoint(eager=True)
    pn = pc.groupBy("p_id").agg(F.sum("k").alias("n"))
    num = (F.col("cents").cast("decimal(19,0)") * F.col("k")
           * ATTR_Q).cast("decimal(38,0)")
    den = F.col("n").cast("decimal(38,0)")
    credit = (pc.join(pn, "p_id")
              .select("p_id", "channel",
                      ((num - F.pmod(num, den)) / den)
                      .cast("decimal(38,0)").alias("q")))
    # the attributed-purchase id set off the already-reduced pc (same
    # distinct p_id set as j — pc is j grouped by (p_id, …)), so the
    # anti-join never re-derives the range join
    direct = (p.join(pc.select("p_id").distinct(), "p_id", "left_anti")
              .select("p_id", F.lit("direct").alias("channel"),
                      (F.col("cents").cast("decimal(38,0)") * ATTR_Q)
                      .alias("q")))
    per_chan = (credit.unionByName(direct)
                .groupBy("channel")
                .agg(F.countDistinct("p_id").alias("n_purchases"),
                     F.sum("q").alias("qs")))
    total = per_chan.agg(F.sum("qs").alias("q_total"))
    return (per_chan.crossJoin(F.broadcast(total))
            .select("channel", "n_purchases",
                    round4_ratio_dec(F.col("qs"),
                                     F.lit(ATTR_Q * 100)
                                     .cast("decimal(38,0)"))
                    .alias("revenue_attr"),
                    round4_ratio_dec(F.col("qs"), F.col("q_total"))
                    .alias("rev_share"))
            .orderBy("channel"))


def _attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: last-touch revenue attribution — every purchase's value is
    credited to the user's most recent preceding click/view within a
    24 h lookback ('direct' when none), the standard marketing-
    attribution query.  The carried touchpoint comes from two
    IGNORE-NULLS last() windows over ONE (user, time) ordering —
    never a purchases×touches self-join, whose fan-out on heavy users
    is quadratic; the stream crosses one exchange and the rollup is
    per-channel.  Both carried columns (ts, type) share the same
    null mask, so the two window passes pick the same source row by
    construction.  Revenue sums in DECIMAL (order-free, exact)."""
    # r11 extremes sweep: corrupt purchase values must not reach the
    # DECIMAL revenue sum; the oracle's ev CTE carries the same filter
    ev = (load(spark, sf_dir, "events")
          .where(money_ok("value"))
          .select("user_id", "ts", "event_id", "event_type", "value",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("us")))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col("event_type").isin("click", "view"),
                   F.col("us"))
    touch_ty = F.when(F.col("event_type").isin("click", "view"),
                      F.col("event_type"))
    horizon_us = ATTR_WINDOW_H * 3600 * 1_000_000
    attributed = (
        ev.withColumn("prior_us", F.last(touch, ignorenulls=True).over(w))
        .withColumn("prior_ty",
                    F.last(touch_ty, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .withColumn(
            "channel",
            F.when(F.col("prior_us").isNull()
                   | (F.col("us") - F.col("prior_us") > horizon_us),
                   "direct").otherwise(F.col("prior_ty")))
    )
    per_chan = attributed.groupBy("channel").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev_d"))
    total = per_chan.agg(
        F.sum("rev_d").alias("rev_total"))
    return (
        per_chan.crossJoin(F.broadcast(total))
        .select("channel", "n_purchases",
                F.col("rev_d").cast("double").alias("revenue"),
                F.round((F.col("rev_d") / F.col("rev_total"))
                        .cast("double"), 6).alias("rev_share"))
        .orderBy("channel")
    )


def _ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: A/B experiment readout — users deterministically assigned
    to arms by the engine-invariant sha256 idiom (same as
    split_assign: assignment survives re-sharding and reruns, which
    seeded randomSplit does not), then per-metric Welch's t statistic
    between arms.  ONE conditional-aggregation pass over the stream:
    counts, means and variances for both arms come out of a single
    groupBy (mergeable moment states), no join, no second scan — the
    shape that makes a 100 TB experiment readout a single reduce."""
    ev = load(spark, sf_dir, "events").where(
        stat_ok("value"))  # double-moment domain bound (r12)
    arm = F.pmod(
        F.conv(F.substring(
            F.sha2(F.col("user_id").cast("string"), 256), 1, 8), 16, 10)
         .cast("long"),
        F.lit(2))
    va = F.when(arm == 0, F.col("value"))
    vb = F.when(arm == 1, F.col("value"))
    agg = ev.groupBy("event_type").agg(
        F.count(va).alias("n_a"), F.count(vb).alias("n_b"),
        F.avg(va).alias("m_a"), F.avg(vb).alias("m_b"),
        F.var_samp(va).alias("v_a"), F.var_samp(vb).alias("v_b"))
    t = ((F.col("m_a") - F.col("m_b"))
         / F.sqrt(F.col("v_a") / F.col("n_a")
                  + F.col("v_b") / F.col("n_b")))
    return (agg.select(
        "event_type", "n_a", "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(t, 4).alias("welch_t"))
        .orderBy("event_type"))


def _chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: chi-square independence test — event_type vs day-of-week
    contingency table reduced to the test statistic.  Day-of-week is
    computed arithmetically (days since the 2024-01-01 Monday, mod 7)
    because engines disagree on dayofweek numbering conventions.
    The raw stream collapses to the k x 7 observed table in one
    partial-aggregated groupBy; margins, expected counts and the
    statistic are windows/aggregates over that driver-tiny table, so
    the whole test costs one scan regardless of corpus size.  The
    table is DENSIFIED to the full observed-levels grid first
    (distinct-ty x distinct-dow cross join — both sides tiny): a
    zero-count cell still contributes (0-e)^2/e = e to the statistic,
    and summing over observed cells only would silently understate
    chi2 on sparse tables."""
    # NULL levels are excluded from the contingency table (standard
    # test practice, and load-bearing: a NULL level would enter the
    # grid but never re-match through the equi-join — NULL != NULL —
    # leaving a phantom zero-margin cell whose expected count divides
    # by zero and kills the task under ANSI; r11 all-NULL sweep)
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull())
    dow = F.pmod(F.datediff(F.to_date("ts"), F.lit("2024-01-01")),
                 F.lit(7))
    obs = (ev.groupBy(F.col("event_type").alias("ty"),
                      dow.alias("dow"))
           .agg(F.count("*").alias("o")))
    grid = obs.select("ty").distinct().crossJoin(
        obs.select("dow").distinct())
    full = (grid.join(obs, ["ty", "dow"], "left")
            .withColumn("o", F.coalesce("o", F.lit(0))))
    w_ty = Window.partitionBy("ty")
    w_dow = Window.partitionBy("dow")
    w_all = Window.partitionBy()
    cells = (full
             .withColumn("row_tot", F.sum("o").over(w_ty))
             .withColumn("col_tot", F.sum("o").over(w_dow))
             .withColumn("n", F.sum("o").over(w_all)))
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return cells.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4)
         .alias("chi2"),
        ((F.countDistinct("ty") - 1) * (F.countDistinct("dow") - 1))
        .alias("dof"),
        F.sum("o").alias("n"))


KS_GRID = [i / 100.0 for i in range(1, 100)]  # pooled-quantile grid
KS_ALPHA_C = 1.358  # critical coefficient at alpha = 0.05


def _ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: two-sample Kolmogorov-Smirnov test — are `purchase` and
    `click` event values drawn from the same distribution?  Completes
    the repo's statistical-testing trio (ab_test = means, chi_square =
    categories, ks_test = whole distributions).

    The textbook KS evaluates the ECDF gap at every sample point,
    which distributed means a GLOBAL sort + global prefix sum — a
    single-partition window, the scale anti-pattern this repo bans.
    The scale rewrite evaluates the gap on the pooled-sample percentile
    grid (99 points): each row's grid bucket (#grid points strictly
    below its value) is a map-side array HOF against the broadcast
    1-row grid; per-(arm, bucket) counts partial-aggregate to <= 200
    rows; the ECDF prefix sums and the max-gap reduction run on that
    driver-tiny table.  No global sort, no unbounded window, one
    bounded shuffle — the same aggregate-then-rejoin shape as
    events_zscore.  Grid-restricting the sup costs at most 1% of
    probability mass per cell (D_grid <= D <= D_grid + max cell mass),
    a bounded, documented approximation — and the oracle computes the
    IDENTICAL statistic by a different algorithm (per-grid-point
    conditional counts, no bucketing), the cross-paradigm discipline.

    Degenerate-input contract (code-review r5): NULL values are
    excluded from BOTH samples on both sides (the engines disagree on
    where a NULL lands in an ECDF); an empty arm yields NULL
    d_stat/reject_h0 with the real counts (try_divide ⇄ DuckDB's
    NULL-on-/0); an all-tied sample keeps its bucket-0 row (gap 0,
    never the max) so the result is d_stat=0, not an all-NULL row."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type").isin("purchase", "click")
                 & F.col("value").isNotNull()
                 & finite_or_null("value"))  # r11 extremes sweep
          .select("event_type", "value"))
    grid = ev.agg(F.expr(
        "percentile(value, array({}))".format(
            ", ".join(str(p) for p in KS_GRID))).alias("grid"))
    bucketed = (ev.crossJoin(F.broadcast(grid))
                .select("event_type",
                        F.size(F.filter(
                            "grid", lambda g: g < F.col("value")))
                        .alias("bucket")))
    counts = bucketed.groupBy("bucket").agg(
        F.count_if(F.col("event_type") == "purchase").alias("c1"),
        F.count_if(F.col("event_type") == "click").alias("c2"))
    # ECDF at grid point i = fraction of rows with value <= g_i
    #                      = 1 - (rows in buckets > i) / n  — prefix
    # sums over <= 100 rows: the single-partition window is bounded by
    # GRID SIZE, not data size, so it is scale-legal.  The bucket-0
    # row contributes gap = |0-0| = 0 — kept, so the frame is never
    # empty when data exists.
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    # the gap stays an INTEGER as long as possible: every per-grid gap
    # shares the denominator n1*n2, so the sup is max over the integer
    # numerators |f1*n2 - f2*n1| and the ONE division happens after the
    # max — rounded in exact integer space (functions/exact.py), since
    # f/n ratios can land exactly on a 5th-decimal half where engine
    # round() semantics disagree.  Overflow bound: gap_num*2e4 < 2^63
    # needs n1*n2 < 4.6e14 — arms up to ~2e7 rows each, far above any
    # verification SF (at 100 TB the grid is approx_percentile and the
    # statistic double-precision anyway).
    gaps = (counts
            .withColumn("n1", F.sum("c1").over(
                Window.partitionBy()))
            .withColumn("n2", F.sum("c2").over(
                Window.partitionBy()))
            .withColumn("f1", F.coalesce(F.sum("c1").over(w), F.lit(0)))
            .withColumn("f2", F.coalesce(F.sum("c2").over(w), F.lit(0)))
            .select(F.abs(F.col("f1") * F.col("n2")
                          - F.col("f2") * F.col("n1")).alias("gap_num"),
                    "n1", "n2"))
    return gaps.agg(
        round4_ratio(F.max("gap_num"),
                     F.max("n1") * F.max("n2")).alias("d_stat"),
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
        (F.try_divide(F.max("gap_num"),
                      (F.max("n1") * F.max("n2")).cast("double"))
         > KS_ALPHA_C
         * F.sqrt(F.try_divide(F.max("n1") + F.max("n2"),
                               F.max("n1") * F.max("n2"))))
        .alias("reject_h0"))


def _gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Gini coefficient of customer revenue per nation — the
    revenue-concentration / inequality readout (Lorenz-curve area),
    the standard "how top-heavy is this market" metric.

    G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n over revenues
    x_1 <= ... <= x_n.  Everything order-sensitive stays EXACT: per-
    customer revenue is a DECIMAL(18,2) sum (order-free money), the
    rank-weighted sum accumulates i * x in DECIMAL(38,2) (exact, so
    partition merge order cannot flip a bit), and the only floating
    division happens once per nation on exact operands.  Shapes: one
    groupBy(custkey) reduce, one per-nation window rank (partitioned —
    never global), one per-nation agg.  Ranking ties break on custkey;
    tied revenues contribute identically to sum(i * x) under any
    permutation, so the statistic is tie-stable by algebra, not luck."""
    o = load(spark, sf_dir, "orders").where(
        money_ok("o_totalprice"))  # DECIMAL revenue sums downstream
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")))
    cust = (rev.join(c, rev.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select("n_name", "c_custkey", "rev"))
    rk = Window.partitionBy("n_name").orderBy("rev", "c_custkey")
    ranked = cust.withColumn("i", F.row_number().over(rk))
    per_nation = ranked.groupBy("n_name").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev").alias("tot"),
        F.sum((F.col("i") * F.col("rev")).cast("decimal(38,2)"))
        .alias("iwsum"))
    # G = (2S - (n+1)T) / (nT) with S, T exact integer CENTS — a ratio
    # of integers, so the 4-dp rounding happens in exact integer space
    # (round4_ratio_dec; ADVICE r5: plain round() diverges between
    # engines when the quotient's shortest decimal repr lands on a
    # 5th-decimal half).  DECIMAL(38,0) operands, not int64: the
    # rank-weighted cent sum S reaches ~2.7e14 at sf0.1 and grows n²
    # per nation, past round4_ratio's a*20000 < 2^63 bound.  A nation
    # whose revenues total <= 0 cents yields gini NULL on both engines
    # (inequality over a non-positive total is undefined; covers the
    # code-review-r5 /0 case too).
    iw_cents = (F.col("iwsum") * 100).cast("decimal(38,0)")
    tot_cents = (F.col("tot") * 100).cast("decimal(38,0)")
    n = F.col("n_customers")
    gini = round4_ratio_dec(
        2 * iw_cents - (n + 1).cast("decimal(38,0)") * tot_cents,
        n.cast("decimal(38,0)") * tot_cents)
    return (per_nation.select(
        F.col("n_name").alias("nation"), "n_customers",
        F.col("tot").cast("double").alias("total_revenue"),
        gini.alias("gini"))
        .orderBy("nation"))


def _quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r6 debut): rank-based quantile normalization — map each
    event's value to its empirical quantile position within its
    event_type, the distribution-free feature scaling (rank transform
    / probability-integral transform) ML preprocessing applies when
    raw magnitudes are unreliable.  qnorm = (rank - 1) / (n - 1) in
    [0, 1]; ties share the min rank (rank(), not row_number: equal
    values MUST map to equal quantiles or the transform leaks order
    noise), so the output is a deterministic function of the value
    multiset.

    Exactness: (rank-1)/(n-1) is a ratio of integers → rounded in
    exact integer space via round4_ratio (the engine round() exact-
    half divergence class).  NULL values are excluded on BOTH sides
    (the r4 NULL-bucketing trap: g < NULL comparisons silently drop
    rows asymmetrically); a single-row group (n = 1) yields NULL
    qnorm on both engines (round4_ratio's b = 0 guard — a quantile
    within a 1-point distribution is undefined).  Overflow bound:
    rank*20000 < 2^63 → safe to 4.6e14 rows per event_type.

    100 TB shape: one hash shuffle on event_type, per-group parallel
    sort, map-side ratio — the same single-exchange plan as any
    ranking window.  Skewed types fall to AQE skew-split; at extreme
    group cardinality the exact rank swaps for an approx-CDF join
    (agg_approx_percentiles' sketch), same downstream contract."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    part = Window.partitionBy("event_type")
    # value is RAW data quantized for display: floor(x*1e4 + 0.5)/1e4
    # (the benford cents idiom) — pure IEEE ops, identical bit on both
    # engines, unlike round(value, 4), whose exact-5th-decimal-half
    # behavior is engine-specific (ADVICE r6: the same divergence
    # class functions/exact.py documents; it only stayed green
    # because the fixture doubles avoid 5th-decimal halves).
    # The idiom itself needs a domain guard (r7 review find): Spark's
    # floor(DOUBLE) returns LONG and SATURATES at 2^63 while DuckDB's
    # stays DOUBLE — so NaN (Spark long-casts to 0), ±Inf and
    # |value|*1e4 beyond int64 all diverge.  Outside the safe domain
    # the RAW parquet double passes through untouched — bit-identical
    # on both engines by construction, so the hash contract holds at
    # ANY input, and the fixture path (all values finite and small)
    # is unchanged.
    Q4_SAFE = 9.0e14  # |value|*1e4 + 0.5 must stay well under 2^63
    q4 = F.when(
        F.isnan("value") | (F.abs("value") >= F.lit(Q4_SAFE)),
        F.col("value"),
    ).otherwise(
        F.floor(F.col("value") * 10000 + F.lit(0.5)) / F.lit(10000.0))
    return (ev
            .withColumn("rk", F.rank().over(part.orderBy("value")))
            .withColumn("n", F.count("*").over(part))
            .select("event_id", "event_type",
                    q4.alias("value"),
                    round4_ratio(F.col("rk") - 1, F.col("n") - 1)
                    .alias("qnorm")))


BENFORD_DIGITS = list(range(1, 10))


def _benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: Benford first-significant-digit audit over order totals —
    the classic fraud / synthetic-data detector: natural multi-scale
    amounts follow P(d) = log10(1 + 1/d); fabricated ones usually
    don't.  Completes the data-quality family (dq_check = declared
    constraints, benford = statistical forensics).

    Digit extraction dodges every float trap: log10(x) near a power
    of ten misclassifies (floor(log10(1000.0)) can evaluate 2), and
    double->string formatting is engine-specific — so the amount is
    first fixed to integer CENTS and the first digit read from the
    BIGINT's decimal string, which every engine formats identically.
    Cents come from floor(x*100 + 0.5), NOT round(x*100): round() of
    a DOUBLE disagrees between engines on exact halves (Spark rounds
    the shortest decimal repr half-up, DuckDB the binary value —
    ADVICE r5: a 3rd-decimal-5 price at a power-of-ten boundary,
    99999.5 cents -> 100000 vs 99999, flips the first digit), while
    floor(+0.5) is a single IEEE operation with the identical result
    bit on every engine.  Map-side digit, 9-key partial agg,
    driver-tiny join against the expected distribution: one scan at
    any scale."""
    # the guard is on CENTS >= 1, not price > 0: a 0 < price < 0.005
    # order rounds to zero cents, whose "first digit" is 0 and whose
    # Benford expectation log10(1 + 1/0) divides by zero (ANSI crash;
    # code-review r5) — a first SIGNIFICANT digit needs a nonzero
    # amount at cent precision on both engines
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5)
    # cents >= 1 already drops NaN/-inf (NULL/false compare), but +inf
    # passed straight into the leading-digit cast (r11 extremes sweep)
    o = load(spark, sf_dir, "orders").where(
        (cents >= 1) & money_ok("o_totalprice"))
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (o.select(digit.alias("digit"))
           .groupBy("digit").agg(F.count("*").alias("cnt")))
    tot = Window.partitionBy()  # 9-row table: bounded, scale-legal
    # obs_share rounds in exact integer space (functions/exact.py):
    # cnt/total is a ratio of integers; abs_dev stays double — the
    # log10 term makes it irrational, never on a rounding boundary
    return (obs
            .withColumn("obs_share",
                        round4_ratio(F.col("cnt"),
                                     F.sum("cnt").over(tot)))
            .withColumn("exp_share",
                        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4))
            .withColumn("abs_dev",
                        F.round(F.abs(
                            F.col("cnt") / F.sum("cnt").over(tot)
                            - F.log10(1.0 + 1.0 / F.col("digit"))), 4))
            .select("digit", "cnt", "obs_share", "exp_share", "abs_dev")
            .orderBy("digit"))


MW_ARM_A, MW_ARM_B = "purchase", "click"  # same two arms as ks_test
MW_BUCKET_W = 16.0   # range-bucket width for the two-level prefix sum
MW_Z_CRIT = 1.96     # two-sided alpha = 0.05


def _value_arm_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared reduction for the rank-based tests (_mann_whitney) and
    the rank-boundary extraction (_drift_psi's sibling shape): the
    two-arm event value stream reduced to per-DISTINCT-value counts
    with an exact GLOBAL exclusive prefix count — computed as a
    two-level distributed prefix sum, never a global sort.

    Level 1 hash-shuffles (value, c1, c2) states (partial-aggregated:
    the exchange carries the distinct-value table, not the stream) and
    prefix-sums WITHIN coarse range buckets floor(value / 16) — each
    a partitioned window.  Level 2 prefix-sums the per-bucket totals —
    a single-partition window, but over (value_range / 16) rows, so it
    is bounded by the DOMAIN of the measure, not the corpus (the
    ks_test grid argument) — and broadcasts the bucket offsets back.
    cum_before = bucket offset + within-bucket prefix: the classic
    distributed prefix-sum (scan) decomposition, the rewrite the CUSUM
    docstring promises for fat series."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("event_type").isin(MW_ARM_A, MW_ARM_B)
                 & F.col("value").isNotNull() & ~F.isnan("value"))
          .select("event_type", "value"))
    vals = (ev.groupBy("value").agg(
        F.count_if(F.col("event_type") == MW_ARM_A).alias("c1"),
        F.count_if(F.col("event_type") == MW_ARM_B).alias("c2"))
        .withColumn("c", F.col("c1") + F.col("c2")))
    return _prefix_scan(vals).select(
        "value", "c1", "c2", "c", "cum_before")


def _prefix_scan(vals: DataFrame) -> DataFrame:
    """The two-level distributed prefix sum itself, shared by
    _value_arm_cum (both arms) and _drift_psi (reference arm) — the
    ONE implementation of the scan (r7 review: the drift_psi copy is
    exactly the hand-kept-copies drift class the _gram_array
    docstring records).  Input: a per-DISTINCT-value frame with a
    BIGINT count column ``c`` (other columns pass through).  Output:
    the same frame plus ``cum_before`` — the exact global EXCLUSIVE
    prefix count in value order.  Level 1 prefix-sums within coarse
    range buckets floor(value / MW_BUCKET_W) (partitioned windows
    over the already-reduced value table); level 2 prefix-sums the
    per-bucket totals (single-partition window bounded by the
    measure's DOMAIN / bucket width, not the corpus) and broadcasts
    the offsets back."""
    # r13 OPT (guide §1.2): the value table feeds BOTH the in-bucket
    # window branch and the bucket-totals branch — unmaterialized,
    # the whole corpus-reducing chain beneath it (scoring, groupBy)
    # ran twice per consumer (roc_auc's before-plan carried 14 parquet
    # scans).  The input is by contract an already-reduced
    # per-DISTINCT-value frame (bounded by the measure's domain, not
    # the corpus) — PRECONDITION: callers must pass the REDUCED
    # per-distinct-value frame, never an occurrence-grained stream
    # (a violating caller would materialize corpus-scale data with
    # truncated lineage).  LAZY (r14: the in-bucket and bucket-
    # totals branches overlap; eager re-measured slower in the
    # warm-cache bench regime).
    vals = vals.localCheckpoint(eager=False)
    vals = vals.withColumn(
        "bkt", F.floor(F.col("value") / MW_BUCKET_W).cast("long"))
    w_in = (Window.partitionBy("bkt").orderBy("value")
            .rowsBetween(Window.unboundedPreceding, -1))
    vals = vals.withColumn(
        "cum_in", F.coalesce(F.sum("c").over(w_in), F.lit(0)))
    btot = vals.groupBy("bkt").agg(F.sum("c").alias("bc"))
    w_b = (Window.orderBy("bkt")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = (btot.withColumn(
        "off", F.coalesce(F.sum("bc").over(w_b), F.lit(0)))
        .select("bkt", "off"))
    return (vals.join(F.broadcast(boff), "bkt")
            .withColumn("cum_before", F.col("off") + F.col("cum_in"))
            .drop("bkt", "cum_in", "off"))


def _mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): Mann-Whitney U rank-sum test — do `purchase`
    and `click` event values come from the same distribution?  The
    nonparametric companion to ab_test (means) and ks_test (ECDF sup):
    rank-based, so it is the test teams actually run on skewed revenue
    values.

    The textbook statistic needs every observation's GLOBAL average
    rank — a global sort in naive form.  Here ranks come from the
    two-level distributed prefix sum (_value_arm_cum): the doubled
    average rank of the tied group at value v is an exact INTEGER,
    2*cum_before + c + 1, so the rank sum, the doubled U statistic
    u1_x2 = 2*R1 - n1*(n1+1), and the tie-correction term sum(c^3-c)
    are all order-free integer aggregates — bit-identical on any
    engine and partitioning (the pagerank integer-mass discipline
    applied to rank statistics).  Only the final z standardization is
    floating point (sqrt — transcendental, never on a rounding half).
    Overflow bound: rank sums reach n1*(2n+1) — int64-safe below ~1e9
    relevant rows per arm, far past every verification SF (at 100 TB
    the z-score is double-precision anyway).

    Degenerate contract: an empty arm or an all-tied pooled sample
    zeroes the variance — z and reject_h0 go NULL on both engines
    (try_divide <-> DuckDB NULL-on-/0), never a crash.

    Cross-paradigm oracle: DuckDB computes the same integers by the
    NAIVE route — one global window rank over distinct values."""
    cum = _value_arm_cum(spark, sf_dir)
    r2 = 2 * F.col("cum_before") + F.col("c") + 1  # doubled avg rank
    stats = cum.agg(
        F.sum(F.col("c1") * r2).alias("rs2"),
        # coalesce to 0 on an empty input: a global agg over zero rows
        # sums to NULL, but the oracle's COALESCE(sum(c1), 0) reports
        # 0 — the arm SIZES are defined (empty) even when the
        # statistic is not (r7 review find; u1_x2/z/reject stay NULL
        # on both engines)
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c2"), F.lit(0)).alias("n2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("tie3"))
    n = F.col("n1") + F.col("n2")
    u1_x2 = F.col("rs2") - F.col("n1") * (F.col("n1") + 1)
    # n(n-1) multiplies EXACTLY (DECIMAL(38,0), mirrored by the
    # oracle's HUGEINT product) and rounds once on the cast to double:
    # int64-multiply-then-cast vs the oracle's old cast-then-multiply
    # associate differently past n ~ 9.5e7 (2^53) and the int64
    # product overflows ANSI at n ~ 3e9 (r7 review find)
    tie_adj = F.coalesce(
        F.try_divide(F.col("tie3").cast("double"),
                     (n.cast("decimal(38,0)") * (n - 1)).cast("double")),
        F.lit(0.0))
    var2 = (F.col("n1") * F.col("n2")).cast("double") / 12.0 \
        * ((n + 1).cast("double") - tie_adj)
    z = F.try_divide((u1_x2 - F.col("n1") * F.col("n2")).cast("double"),
                     2.0 * F.sqrt(var2))
    return stats.select(
        u1_x2.cast("long").alias("u1_x2"),
        F.col("n1"), F.col("n2"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > MW_Z_CRIT).alias("reject_h0"))


PSI_SPLIT = "2024-01-16"  # events span 2024-01; ref = first half
PSI_DECILES = 9           # boundaries -> 10 buckets


def _drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): population stability index — the standard
    model-monitoring drift metric: bucket the current period's value
    distribution by the REFERENCE period's decile boundaries and sum
    (p_ref - p_cur) * ln(p_ref / p_cur) over buckets.  Completes the
    drift toolkit next to ks_test (one-shot equality test): PSI is the
    per-bucket decomposable score dashboards trend.

    Boundaries are DISCRETE order statistics of the reference sample
    (the winsorize rule: an interpolated percentile is an integer
    ratio that can land on a rounding half; an order statistic IS a
    data value, bit-identical from the parquet) — but extracted
    WITHOUT the global sort winsorize documents away: the rank of a
    distinct value is its exact global prefix count from the same
    two-level distributed scan as _mann_whitney, and boundary i is
    min(value where 10*cum_end >= i*n) — pure integer comparisons, a
    conditional agg over the distinct-value table.  Bucketing is a
    map-side array HOF against the broadcast 9-value boundary row;
    per-(period, bucket) counts partial-aggregate to <= 20 rows; the
    densified grid, add-one smoothing (a zero bucket must not ln(0) —
    Laplace on both engines), and the <= 10-row total window are all
    driver-tiny.  Shares round in exact integer space (round4_ratio);
    psi terms carry one ln of an exact-integer ratio (transcendental,
    never on a rounding half)."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & ~F.isnan("value"))
          .select("value",
                  (F.col("ts") < F.lit(PSI_SPLIT).cast("timestamp"))
                  .alias("is_ref")))
    # distinct-value exclusive prefix over the REFERENCE sample only:
    # the shared two-level scan (_prefix_scan), one arm
    ref_vals = (ev.where("is_ref").groupBy("value")
                .agg(F.count("*").alias("c")))
    cum = (_prefix_scan(ref_vals)
           .select("value",
                   (F.col("cum_before") + F.col("c")).alias("cum_end")))
    n_ref_row = ev.where("is_ref").agg(F.count("*").alias("n_ref"))
    # boundary i = value at reference rank ceil(i*n/10): the smallest
    # distinct value whose inclusive prefix count reaches the index —
    # 10*cum_end >= i*n in pure integers, no float rank arithmetic
    bnd_aggs = [
        F.min(F.when(F.col("cum_end") * 10 >= i * F.col("n_ref"),
                     F.col("value"))).alias(f"b{i}")
        for i in range(1, PSI_DECILES + 1)]
    bnds = (cum.crossJoin(F.broadcast(n_ref_row)).agg(*bnd_aggs)
            .select(F.array(*[F.col(f"b{i}")
                              for i in range(1, PSI_DECILES + 1)])
                    .alias("bl")))
    bucketed = (ev.crossJoin(F.broadcast(bnds))
                .select("is_ref",
                        F.size(F.filter("bl", lambda b: b < F.col("value")))
                        .alias("bucket")))
    counts = bucketed.groupBy("bucket").agg(
        F.count_if(F.col("is_ref")).alias("ca"),
        F.count_if(~F.col("is_ref")).alias("cb"))
    grid = spark.range(PSI_DECILES + 1).select(
        F.col("id").cast("int").alias("bucket"))
    full = (grid.join(counts, "bucket", "left")
            .select("bucket",
                    F.coalesce("ca", F.lit(0)).alias("ca"),
                    F.coalesce("cb", F.lit(0)).alias("cb")))
    w_all = Window.partitionBy()  # <= 10-row table: bounded
    full = (full
            .withColumn("na", F.sum("ca").over(w_all))
            .withColumn("nb", F.sum("cb").over(w_all)))
    # Laplace add-one smoothing: pa = (ca+1)/(na+10), pb likewise
    sa = F.col("ca") + 1
    sb = F.col("cb") + 1
    da = F.col("na") + PSI_DECILES + 1
    db = F.col("nb") + PSI_DECILES + 1
    # (pa - pb) * ln(pa/pb): the difference numerator stays an exact
    # integer; one double division + one ln, identical ops per engine
    term = ((sa * db - sb * da).cast("double")
            / (da * db).cast("double")) * F.log(
        (sa * db).cast("double") / (sb * da).cast("double"))
    full = full.withColumn("psi_term", term)
    return (full.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("ca").alias("ref_n"), F.col("cb").alias("cur_n"),
        round4_ratio(sa, da).alias("ref_share"),
        round4_ratio(sb, db).alias("cur_share"),
        F.round("psi_term", 6).alias("psi_term"),
        F.round(F.sum("psi_term").over(w_all), 6).alias("psi_total"))
        .orderBy("bucket"))


def _logit_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (label, µ-sigmoid score) of the quality classifier —
    the shared evaluation input of roc_auc and calibration_bins:
    y = the logit_step training label (lang = 'en'), lp = the exact
    integer µ-probability (0..10000) from the shared _LOGIT_PE
    contract (functions/text.py), so both engines score every doc
    bit-identically."""
    from ..functions.text import _LOGIT_PE, _LOGIT_Y, quality_feats_frame

    return quality_feats_frame(spark, sf_dir).selectExpr(
        f"{_LOGIT_Y} AS y", f"{_LOGIT_PE} AS lp")


def _roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): ROC AUC of the quality classifier as an
    English-discriminator — the evaluation half of the training loop
    (`logit_step` emits the gradient, this scores the model): AUC =
    P(score_pos > score_neg) + ½·P(tie), computed from tie-averaged
    ranks, plus the Gini coefficient 2·AUC − 1.

    Exactly the Mann-Whitney machinery re-pointed at classifier
    evaluation (AUC = U1/(n1·n0) is the textbook identity): the
    µ-sigmoid score lp is an exact integer, the distinct-score table
    (≤ 10001 rows by construction) flows through the shared two-level
    prefix scan, the doubled average rank 2·cum_before + c + 1 is an
    exact integer, and AUC = (rs2 − n1(n1+1)) / (2·n1·n0) and
    gini = (rs2 − n1(n1+1) − n1·n0) / (n1·n0) are exact half-up
    integer ratios (round4_ratio_dec / HUGEINT) — no float anywhere.
    Rank sums stay int64-safe below ~2e9 docs (the mann_whitney
    bound); the DECIMAL ratios never overflow.

    Degenerate contract: a single-class corpus (n1 or n0 = 0) yields
    NULL auc/gini on both engines (zero denominator -> NULL in the
    half-up helpers), never a crash.

    100 TB shape: scoring is map-side; each scan branch partial-aggs
    to <= 10001 distinct-score rows immediately (the plan carries TWO
    corpus scans — _prefix_scan's bucket-offset branch re-derives the
    score table, the same trade mann_whitney ships; a cache() of the
    value table trades memory for the second scan at extreme scale),
    the prefix scan runs on the bounded table, and the final
    statistic is a 1-row aggregate — nothing after the first reduce
    scales with corpus size."""
    # un-scorable docs (NULL text -> NULL features -> NULL lp) are
    # excluded from the evaluation on BOTH sides: the shared
    # _prefix_scan drops a NULL score value while the oracle's ORDER
    # BY lp window kept it as a sortable group — 500 phantom negatives
    # on the r11 all-NULL sweep
    s = _logit_scores(spark, sf_dir).where(F.col("lp").isNotNull())
    v = (s.groupBy("lp")
         .agg(F.count("*").alias("c"),
              F.coalesce(F.sum("y"), F.lit(0)).alias("c1"))
         .select(F.col("lp").cast("double").alias("value"), "c", "c1"))
    cum = _prefix_scan(v)
    r2 = 2 * F.col("cum_before") + F.col("c") + 1
    agg = cum.agg(
        F.sum(F.col("c1") * r2).alias("rs2"),
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(F.col("c") - F.col("c1")), F.lit(0))
        .alias("n0"))
    u2 = (F.col("rs2")
          - F.col("n1") * (F.col("n1") + 1)).cast("decimal(38,0)")
    d = F.col("n1").cast("decimal(38,0)") * F.col("n0")
    return agg.select(
        F.col("n1").alias("n_pos"), F.col("n0").alias("n_neg"),
        round4_ratio_dec(u2, (d * 2).cast("decimal(38,0)")).alias("auc"),
        round4_ratio_dec(u2 - d, d).alias("gini"))


CALIB_BINS = 10  # reliability-diagram bins over the µ-score range


def _calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): reliability diagram of the quality classifier —
    per predicted-probability decile: row count, positives, mean
    predicted probability, empirical positive rate, and the
    calibration gap between them.  The companion eval to `roc_auc`
    (AUC measures ranking, this measures whether the probabilities
    MEAN anything — the sigmoid can rank perfectly yet be wildly
    miscalibrated, and a curation pipeline thresholding on p > 0.8
    cares about the latter).

    Exactness: the bin is integer floor-division of the exact µ-score
    (lp div 1000, clamped so lp = 10000 joins the top bin); mean_pred
    = Σlp/(n·10⁴) and frac_pos = pos/n are exact half-up integer
    ratios; the gap subtracts two already-4dp-quantized doubles
    (identical values cross-engine, so the one float subtraction is
    bit-identical too).

    100 TB shape: map-side scoring, ONE partial-agg'd groupBy onto
    <= 10 bins, arithmetic on the 10-row result."""
    s = _logit_scores(spark, sf_dir)
    b = s.select(
        "y", "lp",
        F.least(F.expr("lp div 1000"),
                F.lit(CALIB_BINS - 1)).cast("int").alias("bin"))
    agg = (b.groupBy("bin")
           .agg(F.count("*").alias("n"),
                F.sum("lp").cast("decimal(38,0)").alias("slp"),
                F.sum("y").alias("n_pos")))
    scored = agg.select(
        "bin", "n", "n_pos",
        round4_ratio_dec(
            F.col("slp"),
            (F.col("n").cast("decimal(38,0)") * 10_000)
            .cast("decimal(38,0)")).alias("mean_pred"),
        round4_ratio(F.col("n_pos"), F.col("n")).alias("frac_pos"))
    return (scored
            .select("bin", "n", "n_pos", "mean_pred", "frac_pos",
                    F.round(F.col("mean_pred") - F.col("frac_pos"), 4)
                    .alias("gap"))
            .orderBy("bin"))


def _spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): Spearman rank correlation per order status —
    does basket size (line items per order) move with order value?
    The monotone-association companion to `regr_by_group` (Pearson
    slope on raw values): rank-based, so one whale order cannot swamp
    the statistic — the flavor analysts actually use on skewed
    money/size measures.

    Exactness: y quantizes to exact cents; both measures get DOUBLED
    tie-averaged ranks 2·rank() + count(tied) − 1 — exact integers,
    the mann_whitney rank discipline — so every Pearson-on-ranks sum
    (Σr, Σr², Σrxry) accumulates exactly in DECIMAL(38,0)/HUGEINT and
    the three covariance terms n·Σxy − ΣxΣy are exact integers.  Only
    the final ρ = num / sqrt(d1·d2) is floating point: one shared
    cast-to-double + sqrt expression per engine on identical exact
    integers (the agg_moments skew/kurtosis precedent), rounded at
    6dp.  Doubled ranks ≤ 2n keep every sum inside DECIMAL(38,0) to
    n ~ 1e9 rows per status group.

    Degenerate contract: a constant measure within a group (all ranks
    tied) zeroes d1 or d2 — ρ is NULL on both engines (try_divide /
    NULLIF), never a crash; single-row groups likewise.

    100 TB shape: the per-order item count is one partial-agg'd
    groupBy; both rank windows share the ONE hash-exchange on status
    (two sorts inside it); the moment reduce is 6 numbers per group.
    A hot status at extreme scale splits via the same two-level scan
    trick mann_whitney uses — documented trade, not a rewrite."""
    orders = load(spark, sf_dir, "orders").where(
        money_ok("o_totalprice"))  # integer-cents ranks downstream
    li = load(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("x"))
    base = (orders
            .join(cnt, orders["o_orderkey"] == cnt["l_orderkey"])
            .select(F.col("o_orderstatus").alias("status"),
                    F.col("x"),
                    F.floor(F.col("o_totalprice") * 100 + 0.5)
                    .alias("y")))
    wx = Window.partitionBy("status").orderBy("x")
    wxc = Window.partitionBy("status", "x")
    wy = Window.partitionBy("status").orderBy("y")
    wyc = Window.partitionBy("status", "y")
    r = base.select(
        "status",
        (2 * F.rank().over(wx) + F.count("*").over(wxc) - 1)
        .alias("rx"),
        (2 * F.rank().over(wy) + F.count("*").over(wyc) - 1)
        .alias("ry"))

    def dec(c):
        return c.cast("decimal(38,0)")

    sums = r.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("rx")) * F.col("ry")).alias("sxy"),
        F.sum(dec(F.col("rx"))).alias("sx"),
        F.sum(dec(F.col("ry"))).alias("sy"),
        F.sum(dec(F.col("rx")) * F.col("rx")).alias("sxx"),
        F.sum(dec(F.col("ry")) * F.col("ry")).alias("syy"))
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    d1 = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    d2 = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    rho = F.try_divide(num, F.sqrt(d1 * d2))
    return (sums.select("status", "n", F.round(rho, 6).alias("rho"))
            .orderBy("status"))


QUERIES = {
    "roc_auc": _roc_auc,
    "calibration_bins": _calibration_bins,
    "spearman_corr": _spearman_corr,
    "ks_test": _ks_test,
    "gini_concentration": _gini_concentration,
    "benford_digits": _benford_digits,
    "quantile_normalize": _quantile_normalize,
    "skyline_pareto": _skyline_pareto,
    "regr_by_group": _regr_by_group,
    "attribution": _attribution,
    "ab_test": _ab_test,
    "chi_square": _chi_square,
    "basket_pairs": _basket_pairs,
    "skew_report": _skew_report,
    "events_sessionize": _events_sessionize,
    "events_path_transitions": _events_path_transitions,
    "session_overlap": _session_overlap,
    "rolling_mau": _rolling_mau,
    "gap_fill": _gap_fill,
    "gap_fill_interp": _gap_fill_interp,
    "events_debounce": _events_debounce,
    "events_rate_limit": _events_rate_limit,
    "funnel_steps": _funnel_steps,
    "retention_cohorts": _retention_cohorts,
    "events_zscore": _events_zscore,
    "events_anomaly_mad": _events_anomaly_mad,
    "mann_whitney": _mann_whitney,
    "drift_psi": _drift_psi,
    "kaplan_meier": _kaplan_meier,
    "attribution_linear": _attribution_linear,
}

ORACLES = {
    # identical RANGE-by-value frame over epoch micros; every output
    # column is an exact integer or string (no rounding anywhere)
    "events_rate_limit": f"""
WITH c AS (
  SELECT event_id, user_id, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
         CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {RATE_LIMIT_US} PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_in_window
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id, event_type, ts, n_in_window
FROM c WHERE n_in_window > {RATE_LIMIT_N}
""",
    # cross-paradigm: Spark buckets rows against the broadcast grid and
    # prefix-sums per-bucket counts; the oracle evaluates the ECDF gap
    # at each grid point directly by correlated conditional counts
    "ks_test": """
WITH s AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    AND isfinite(value)
), grid AS (
  SELECT unnest(quantile_cont(value, [{pcts}])) AS g FROM s
), n AS (
  SELECT count(*) FILTER (event_type = 'purchase') AS n1,
         count(*) FILTER (event_type = 'click') AS n2
  FROM s
), gaps AS (
  SELECT abs(
      (SELECT count(*) FROM s
       WHERE event_type = 'purchase' AND value <= g) * n2
    - (SELECT count(*) FROM s
       WHERE event_type = 'click' AND value <= g) * n1) AS gap_num,
    n1, n2
  FROM grid, n
)
SELECT {r4} AS d_stat,
       CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
       max(gap_num) / CAST(max(n1) * max(n2) AS DOUBLE)
         > {c} * sqrt((max(n1) + max(n2))
                      / CAST(max(n1) * max(n2) AS DOUBLE))
         AS reject_h0
FROM gaps
""".format(pcts=", ".join(str(p) for p in KS_GRID), c=KS_ALPHA_C,
           r4=round4_ratio_sql("CAST(max(gap_num) AS BIGINT)",
                               "CAST(max(n1) * max(n2) AS BIGINT)")),
    "gini_concentration": f"""
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders
  WHERE {money_ok_sql("o_totalprice")}
  GROUP BY o_custkey
), cust AS (
  SELECT n_name, c_custkey, rev
  FROM rev
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY n_name ORDER BY rev, c_custkey) AS i
  FROM cust
), per_nation AS (
  SELECT n_name, count(*) AS n, sum(rev) AS tot,
         CAST(sum(CAST(i * rev AS DECIMAL(38,2))) * 100 AS HUGEINT)
           AS s_cents,
         CAST(sum(rev) * 100 AS HUGEINT) AS t_cents
  FROM ranked GROUP BY n_name
)
SELECT n_name AS nation, CAST(n AS BIGINT) AS n_customers,
       CAST(tot AS DOUBLE) AS total_revenue,
       {round4_ratio_dec_sql("2 * s_cents - (n + 1) * t_cents",
                             "n * t_cents")} AS gini
FROM per_nation
""",
    "benford_digits": f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
  WHERE floor(o_totalprice * 100 + 0.5) >= 1
    AND {money_ok_sql("o_totalprice")}
), obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY digit
), t AS (SELECT sum(cnt) AS tot FROM obs)
SELECT digit, cnt,
       {round4_ratio_sql("cnt", "CAST(tot AS BIGINT)")} AS obs_share,
       round(log10(1.0 + 1.0 / digit), 4) AS exp_share,
       round(abs(cnt / CAST(tot AS DOUBLE)
                 - log10(1.0 + 1.0 / digit)), 4) AS abs_dev
FROM obs, t
""",
    # qnorm = (rank-1)/(n-1) is a ratio of integers -> exact-int
    # rounding (round4_ratio_sql); rank() (not row_number) so ties map
    # to equal quantiles; NULL values excluded on BOTH sides (the r4
    # NULL-bucketing trap); n = 1 groups yield NULL via the b = 0 guard
    "quantile_normalize": f"""
SELECT event_id, event_type,
       -- same NaN/±Inf/magnitude guard as the Spark side: outside
       -- the floor-quantize safe domain the raw double passes through
       CASE WHEN isnan(value) OR abs(value) >= 9.0e14 THEN value
            ELSE floor(value * 10000 + 0.5) / 10000.0 END AS value,
       {round4_ratio_sql("rk - 1", "n - 1")} AS qnorm
FROM (
  SELECT event_id, event_type, value,
         rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
""",
    "attribution": f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type, value, epoch_us(ts) AS us
  FROM events WHERE {money_ok_sql("value")}
), carried AS (
  SELECT *,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN us END IGNORE NULLS) OVER w AS prior_us,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS prior_ty
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
  SELECT CASE WHEN prior_us IS NULL
               OR us - prior_us > CAST({ATTR_WINDOW_H} AS BIGINT)
                                  * 3600 * 1000000
              THEN 'direct' ELSE prior_ty END AS channel,
         value
  FROM carried WHERE event_type = 'purchase'
), per_chan AS (
  SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
         sum(CAST(value AS DECIMAL(18,2))) AS rev_d
  FROM attributed GROUP BY channel
)
SELECT channel, n_purchases, CAST(rev_d AS DOUBLE) AS revenue,
       round(CAST(rev_d / sum(rev_d) OVER () AS DOUBLE), 6)
         AS rev_share
FROM per_chan
""",
    "ab_test": f"""
WITH assigned AS (
  -- '0x' || ..., not concat(): DuckDB concat SKIPS NULL args, so a
  -- NULL user_id yielded the unparseable literal '0x' where Spark's
  -- sha2-conv chain NULL-propagates (r11 all-NULL sweep); || keeps
  -- the NULL and the CAST emits NULL arm = excluded from both arms,
  -- matching Spark
  SELECT event_type, value,
         CAST('0x' || substr(sha256(CAST(user_id AS VARCHAR)),
                             1, 8) AS BIGINT) % 2 AS arm
  FROM events WHERE {stat_ok_sql("value")}
), agg AS (
  SELECT event_type,
         CAST(count(CASE WHEN arm = 0 THEN value END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN arm = 1 THEN value END) AS BIGINT) AS n_b,
         avg(CASE WHEN arm = 0 THEN value END) AS m_a,
         avg(CASE WHEN arm = 1 THEN value END) AS m_b,
         var_samp(CASE WHEN arm = 0 THEN value END) AS v_a,
         var_samp(CASE WHEN arm = 1 THEN value END) AS v_b
  FROM assigned GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS welch_t
FROM agg
""",
    "chi_square": """
WITH obs AS (
  SELECT event_type AS ty,
         -- sign-safe modulus: DuckDB % yields negative remainders for
         -- pre-2024 timestamps, Spark's pmod never does
         CAST(((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7)
               + 7) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
), grid AS (
  SELECT ty, dow
  FROM (SELECT DISTINCT ty FROM obs), (SELECT DISTINCT dow FROM obs)
), full_ AS (
  SELECT g.ty, g.dow, coalesce(o.o, 0) AS o
  FROM grid g LEFT JOIN obs o ON g.ty = o.ty AND g.dow = o.dow
), cells AS (
  SELECT *, sum(o) OVER (PARTITION BY ty) AS row_tot,
         sum(o) OVER (PARTITION BY dow) AS col_tot,
         sum(o) OVER () AS n
  FROM full_
)
SELECT round(sum((o - row_tot * col_tot / CAST(n AS DOUBLE))
                 * (o - row_tot * col_tot / CAST(n AS DOUBLE))
                 / (row_tot * col_tot / CAST(n AS DOUBLE))), 4) AS chi2,
       CAST((count(DISTINCT ty) - 1) * (count(DISTINCT dow) - 1)
            AS BIGINT) AS dof,
       CAST(sum(o) AS BIGINT) AS n
FROM cells
""",
    "skyline_pareto": f"""
WITH pts AS (
  SELECT o.o_custkey AS custkey, round(c.c_acctbal, 2) AS bal,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE {money_ok_sql("o.o_totalprice")}
  GROUP BY o.o_custkey, round(c.c_acctbal, 2)
  HAVING round(c.c_acctbal, 2) IS NOT NULL
     AND isfinite(round(c.c_acctbal, 2))
     AND sum(CAST(o.o_totalprice AS DECIMAL(18,2))) IS NOT NULL
)
SELECT custkey, bal, spend
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.bal >= p.bal AND q.spend >= p.spend
    AND (q.bal > p.bal OR q.spend > p.spend))
""",
    "regr_by_group": f"""
SELECT event_type,
       round(regr_slope(value, epoch_us(ts) / 3.6e9), 8) AS slope,
       round(regr_intercept(value, epoch_us(ts) / 3.6e9), 4)
         AS intercept,
       round(regr_r2(value, epoch_us(ts) / 3.6e9), 6) AS r2,
       CAST(regr_count(value, epoch_us(ts) / 3.6e9) AS BIGINT) AS n
FROM events WHERE {stat_ok_sql("value")} GROUP BY event_type
""",
    "basket_pairs": """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), icnt AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_cnt
  FROM items GROUP BY l_partkey
), n AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS pair_cnt
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
  HAVING count(*) >= 3
)
SELECT p.part_a, p.part_b, p.pair_cnt,
       round(p.pair_cnt / n.n_orders, 6) AS support,
       round(p.pair_cnt * n.n_orders / (ca.item_cnt * cb.item_cnt), 4)
         AS lift
FROM pairs p
JOIN icnt ca ON ca.l_partkey = p.part_a
JOIN icnt cb ON cb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY pair_cnt DESC, part_a, part_b
""",
    "session_overlap": f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR lag(ts) OVER w < ts - INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id % 5 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(ts) AS s_start,
         max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS s_live
  FROM numbered GROUP BY user_id, session_idx
), ov AS (
  SELECT l.user_id, l.session_idx,
         CAST(count(*) AS BIGINT) AS n_concurrent
  FROM sess l JOIN sess r
    ON l.user_id != r.user_id
   AND l.s_start < r.s_live AND r.s_start < l.s_live
  GROUP BY l.user_id, l.session_idx
)
SELECT s.user_id, s.session_idx,
       strftime(s.s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       coalesce(o.n_concurrent, 0) AS n_concurrent
FROM sess s LEFT JOIN ov o
  ON o.user_id = s.user_id AND o.session_idx = s.session_idx
""",
    "events_sessionize": f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR lag(ts) OVER w < ts - INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       date_diff('second', min(ts), max(ts)) AS duration_sec
FROM sess GROUP BY user_id, session_idx
""",
    "events_path_transitions": """
WITH pairs AS (
  SELECT user_id, event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), matrix AS (
  SELECT prev_type, next_type,
         CAST(count(*) AS BIGINT) AS n_transitions,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions, n_users,
       round(n_transitions / SUM(n_transitions)
               OVER (PARTITION BY prev_type), 4) AS p_next
FROM matrix
""",
    "rolling_mau": """
WITH user_days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), days AS (
  SELECT DISTINCT day AS obs_day FROM user_days
)
SELECT strftime(d.obs_day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau_7d
FROM days d
JOIN user_days u
  ON u.day <= d.obs_day AND u.day > d.obs_day - INTERVAL 7 DAY
GROUP BY d.obs_day
""",
    "events_anomaly_mad": f"""
WITH fme AS (
  SELECT * FROM events WHERE {stat_ok_sql("value")}
), med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM fme GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.event_id, e.user_id, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM fme e JOIN med m ON e.event_type = m.event_type
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, d.event_id, d.user_id, d.value,
       round(d.med, 4) AS med, round(x.mad, 4) AS mad,
       round((d.value - d.med) / ({MAD_K} * x.mad), 4) AS robust_z
FROM dev d JOIN mad x ON d.event_type = x.event_type
WHERE x.mad != 0
  AND abs(round((d.value - d.med) / ({MAD_K} * x.mad), 4)) >= 3.0
""",
    "gap_fill": """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS week FROM events
), counts AS (
  SELECT user_id, week, CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id, week
), bounds AS (
  SELECT min(week) AS wmin, max(week) AS wmax FROM ev
), spine AS (
  SELECT u.user_id, unnest(generate_series(
           b.wmin, b.wmax, INTERVAL 7 DAY)) AS week
  FROM (SELECT DISTINCT user_id FROM ev) u, bounds b
)
SELECT s.user_id, strftime(s.week, '%Y-%m-%d') AS week,
       coalesce(c.n_events, 0) AS n_events,
       c.n_events IS NULL AS is_gap
FROM spine s LEFT JOIN counts c
  ON c.user_id = s.user_id AND c.week = s.week
""",
    "events_debounce": """
WITH w AS (
  SELECT user_id, event_type, event_id, ts, value,
         CASE WHEN lag(ts) OVER pw IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER pw) > 21600000000
              THEN 1 ELSE 0 END AS is_burst_start
  FROM events
  WINDOW pw AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), islands AS (
  SELECT *, sum(is_burst_start) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS burst_id
  FROM w
)
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(value, 4) AS value,
       -- DuckDB window SUM yields HUGEINT -> pandas float64; Spark emits
       -- int64. The driver hashes via pandas, so the dtype must match.
       CAST(burst_id AS BIGINT) AS burst_id
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY user_id, event_type, burst_id
           ORDER BY ts, event_id) AS rn
  FROM islands)
WHERE rn = 1
""",
    "gap_fill_interp": f"""
WITH obs AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         round(avg(value), 4) AS v
  FROM events WHERE event_type = 'purchase' AND {stat_ok_sql("value")}
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
), bounds AS (
  SELECT user_id, min(day) AS dmin, max(day) AS dmax
  FROM obs GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(
           CAST(dmin AS TIMESTAMP), CAST(dmax AS TIMESTAMP),
           INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), j AS (
  SELECT s.user_id, s.day, o.v
  FROM spine s LEFT JOIN obs o USING (user_id, day)
), w AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END
                    IGNORE NULLS) OVER wp AS pd,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END
                     IGNORE NULLS) OVER wf AS nd
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       v AS observed,
       CASE WHEN v IS NOT NULL THEN v
            ELSE floor((pv + (nv - pv)
                        * CAST(date_diff('day', pd, day) AS DOUBLE)
                        / CAST(date_diff('day', pd, nd) AS DOUBLE))
                       * 10000.0 + 0.5) / 10000.0
       END AS filled,
       v IS NULL AS is_gap
FROM w
""",
    "funnel_steps": f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t1 ON e.user_id = t1.user_id
   AND e.ts > t1.t AND e.ts <= t1.t + INTERVAL {FUNNEL_WINDOW_H} HOURS
  WHERE e.event_type = 'view' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN t2 ON e.user_id = t2.user_id
   AND e.ts > t2.t AND e.ts <= t2.t + INTERVAL {FUNNEL_WINDOW_H} HOURS
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), rows_ AS (
  SELECT 1 AS step, 'signup' AS event_type,
         CAST(count(*) AS BIGINT) AS n_users FROM t1
  UNION ALL SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM t2
  UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM t3
)
SELECT step, event_type, n_users,
       round(n_users / NULLIF(coalesce(lag(n_users) OVER (ORDER BY step),
                                       n_users), 0), 4) AS conv_rate,
       round(n_users / NULLIF(first_value(n_users) OVER (ORDER BY step
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0),
             4) AS overall_rate
FROM rows_
""",
    "retention_cohorts": """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
), counts AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.active_week) / 7
              AS INTEGER) AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM active a JOIN firsts f ON a.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
       n_active,
       round(n_active / max(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week), 4) AS retention
FROM counts
""",
    "events_zscore": f"""
WITH fe AS (
  SELECT * FROM events WHERE {finite_or_null_sql("value")}
), stats AS (
  SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
  FROM fe GROUP BY event_type
)
SELECT e.event_type, e.event_id, e.user_id, e.value,
       round((e.value - s.m) / s.sd, 4) AS z
FROM fe e JOIN stats s ON e.event_type = s.event_type
WHERE abs(round((e.value - s.m) / s.sd, 4)) >= {ZSCORE_CUT}
""",
}

ORACLES["skew_report"] = f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows
  FROM counts
), top AS (
  SELECT user_id, cnt FROM counts
  ORDER BY cnt DESC, user_id ASC LIMIT {SKEW_TOP}
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC)
            AS INTEGER) AS rnk,
       user_id, cnt, n_keys,
       round(cnt / n_rows, 6) AS share,
       round(cnt * n_keys / CAST(n_rows AS DOUBLE), 4) AS x_avg
FROM top, stats
"""

# cross-paradigm: Spark derives ranks via the two-level distributed
# prefix sum; the oracle takes the naive route — one global window
# over distinct values.  Every statistic before z is an exact integer.
_MW_Z = """((rs2 - n1 * (n1 + 1) - n1 * n2) /
  (2 * sqrt((n1 * n2) / 12.0 * ((n1 + n2 + 1) -
     COALESCE(tie3 / CAST(CAST(n1 + n2 AS HUGEINT)
                          * (n1 + n2 - 1) AS DOUBLE), 0)))))"""

ORACLES["mann_whitney"] = f"""
WITH s AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{MW_ARM_A}', '{MW_ARM_B}')
    AND value IS NOT NULL AND NOT isnan(value)
), v AS (
  SELECT value,
         CAST(count(*) FILTER (event_type = '{MW_ARM_A}') AS BIGINT)
           AS c1,
         CAST(count(*) FILTER (event_type = '{MW_ARM_B}') AS BIGINT)
           AS c2,
         CAST(count(*) AS BIGINT) AS c
  FROM s GROUP BY value
), r AS (
  SELECT c1, c2, c,
         2 * CAST(COALESCE(sum(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) + c + 1 AS r2
  FROM v
), agg AS (
  SELECT CAST(sum(c1 * r2) AS BIGINT) AS rs2,
         CAST(COALESCE(sum(c1), 0) AS BIGINT) AS n1,
         CAST(COALESCE(sum(c2), 0) AS BIGINT) AS n2,
         CAST(sum(c * c * c - c) AS BIGINT) AS tie3
  FROM r
)
SELECT CAST(rs2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2, n1, n2,
       round({_MW_Z}, 4) AS z,
       abs({_MW_Z}) > {MW_Z_CRIT} AS reject_h0
FROM agg
"""

# cross-paradigm: Spark extracts decile boundaries from the distributed
# prefix-sum (min value whose inclusive rank reaches ceil(i*n/10));
# the oracle reads the value at that rank off a naive global
# row_number.  The 9 scalar subqueries preserve duplicate boundary
# values exactly like Spark's 9 independent conditional mins.
_PSI_BOUNDS = ", ".join(
    f"(SELECT value FROM ranked, nref WHERE rn = ({i} * n + 9) // 10)"
    for i in range(1, 10))

ORACLES["drift_psi"] = f"""
WITH ev AS (
  SELECT value, ts < TIMESTAMP '{PSI_SPLIT}' AS is_ref
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), ref AS (SELECT value FROM ev WHERE is_ref),
nref AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn FROM ref
), bnds AS (
  SELECT [{_PSI_BOUNDS}] AS bl
), b AS (
  SELECT is_ref,
         len(list_filter(bl, x -> x < value)) AS bucket
  FROM ev, bnds
), counts AS (
  SELECT bucket,
         CAST(count(*) FILTER (is_ref) AS BIGINT) AS ca,
         CAST(count(*) FILTER (NOT is_ref) AS BIGINT) AS cb
  FROM b GROUP BY bucket
), grid AS (
  SELECT unnest(range(10)) AS bucket
), full_grid AS (
  SELECT grid.bucket, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM grid LEFT JOIN counts ON grid.bucket = counts.bucket
), sel AS (
  SELECT bucket, ca, cb,
         CAST(sum(ca) OVER () AS BIGINT) AS na,
         CAST(sum(cb) OVER () AS BIGINT) AS nb
  FROM full_grid
), terms AS (
  SELECT bucket, ca, cb, na, nb,
         ((ca + 1) * (nb + 10) - (cb + 1) * (na + 10))
           / CAST((na + 10) * (nb + 10) AS DOUBLE)
           * ln(CAST((ca + 1) * (nb + 10) AS DOUBLE)
                / ((cb + 1) * (na + 10))) AS t
  FROM sel
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(ca AS BIGINT) AS ref_n, CAST(cb AS BIGINT) AS cur_n,
       {round4_ratio_sql("ca + 1", "na + 10")} AS ref_share,
       {round4_ratio_sql("cb + 1", "nb + 10")} AS cur_share,
       round(t, 6) AS psi_term,
       round(sum(t) OVER (), 6) AS psi_total
FROM terms ORDER BY bucket
"""

# identical KM recurrence: day durations by integer div, at-risk via a
# FOLLOWING-inclusive window sum, each step's ln quantized to integer
# micro-units off ONE int/int IEEE division (the lm_score idiom), exact
# int64 cumulative sum, one exp per row; d = n_risk short-circuits to 0
ORACLES["kaplan_meier"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), subj AS (
  SELECT min(us) AS enter, max(us) AS last,
         min(CASE WHEN event_type = 'purchase' THEN us END) AS conv
  FROM ev GROUP BY user_id
), subjects AS (
  SELECT CASE WHEN conv IS NOT NULL THEN conv - enter
              ELSE last - enter END AS dur_us,
         CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM subj
), per_t AS (
  SELECT dur_us // 86400000000 AS t_days,
         CAST(sum(event) AS BIGINT) AS n_events,
         CAST(sum(1 - event) AS BIGINT) AS n_censored
  FROM subjects WHERE dur_us IS NOT NULL GROUP BY 1
), at_risk AS (
  SELECT *, CAST(sum(n_events + n_censored) OVER
    (ORDER BY t_days ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    AS BIGINT) AS n_risk
  FROM per_t
), deaths AS (
  SELECT * FROM at_risk WHERE n_events > 0
), curve AS (
  SELECT *,
    sum(CASE WHEN n_events < n_risk THEN
        CAST(floor(ln((n_risk - n_events) / CAST(n_risk AS DOUBLE))
                   * 1e6 + 0.5) AS BIGINT) END) OVER w AS cum_li,
    sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER w AS n_zero
  FROM deaths
  WINDOW w AS (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t_days, n_risk, n_events, n_censored,
       CASE WHEN n_zero > 0 THEN 0.0
            ELSE round(exp(cum_li / 1e6), 4) END AS survival
FROM curve ORDER BY t_days
"""

# identical linear-attribution recurrence: user-equi + range join,
# per-(purchase, channel) touch counts, exact HUGEINT floor-division
# micro-credits (positive operands: // == floor), direct = anti-join
ORACLES["attribution_linear"] = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
  FROM events
), p AS (
  SELECT user_id, event_id AS p_id, us AS p_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM ev WHERE event_type = 'purchase'
    AND value IS NOT NULL AND NOT isnan(value)
    AND value > 0 AND value < 9e6
), t AS (
  SELECT user_id AS t_user, us AS t_us, event_type AS channel
  FROM ev WHERE event_type IN ('click', 'view')
), j AS (
  SELECT p.p_id, p.cents, t.channel
  FROM p JOIN t ON p.user_id = t.t_user
       AND t.t_us < p.p_us
       AND t.t_us >= p.p_us - {ATTR_WINDOW_H * 3600 * 1000000}
), pc AS (
  SELECT p_id, cents, channel, CAST(count(*) AS BIGINT) AS k
  FROM j GROUP BY p_id, cents, channel
), pn AS (
  SELECT p_id, CAST(sum(k) AS BIGINT) AS n FROM pc GROUP BY p_id
), pcn AS (
  SELECT pc.p_id, pc.channel,
         CAST(pc.cents AS HUGEINT) * pc.k * {ATTR_Q} AS num,
         CAST(pn.n AS HUGEINT) AS den
  FROM pc JOIN pn USING (p_id)
), credit AS (
  -- sign-safe floor division: bare // truncates toward zero on
  -- negative numerators (refund credits) where Spark's
  -- (num - pmod(num, den)) / den floors
  SELECT p_id, channel,
         (num - (((num % den) + den) % den)) // den AS q
  FROM pcn
  UNION ALL
  SELECT p.p_id, 'direct' AS channel,
         CAST(p.cents AS HUGEINT) * {ATTR_Q} AS q
  FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.p_id = p.p_id)
), per_chan AS (
  SELECT channel, CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
         sum(q) AS qs
  FROM credit GROUP BY channel
), total AS (
  SELECT sum(qs) AS q_total FROM per_chan
)
SELECT channel, n_purchases,
       {round4_ratio_dec_sql("qs", str(ATTR_Q * 100))} AS revenue_attr,
       {round4_ratio_dec_sql("qs", "q_total")} AS rev_share
FROM per_chan, total
ORDER BY channel
"""


# roc_auc / calibration_bins oracles (r8): the per-doc (y, lp) score
# table comes from the SAME quality-feature CTE chain and _LOGIT_*
# expression strings as logit_step's oracle (functions/text.py), so
# training and evaluation cannot drift; the rank pipeline below is
# the mann_whitney naive-rank oracle re-pointed at AUC.  The import
# is acyclic: functions/text.py never imports operators/analytics.
from ..functions.text import (_LOGIT_PE, _LOGIT_Y,  # noqa: E402
                              DUCK_QFEATS_CTES)

_DUCK_SCORES_CTE = (f"{DUCK_QFEATS_CTES}, s AS (\n"
                    f"  SELECT {_LOGIT_Y} AS y, {_LOGIT_PE} AS lp"
                    f" FROM feats\n)")

ORACLES["roc_auc"] = f"""
WITH {_DUCK_SCORES_CTE}, v AS (
  SELECT lp, CAST(count(*) AS BIGINT) AS c,
         CAST(COALESCE(sum(y), 0) AS BIGINT) AS c1
  FROM s WHERE lp IS NOT NULL GROUP BY lp
), r AS (
  SELECT c, c1,
         2 * CAST(COALESCE(sum(c) OVER (ORDER BY lp
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) + c + 1 AS r2
  FROM v
), agg AS (
  SELECT CAST(sum(c1 * r2) AS HUGEINT) AS rs2,
         CAST(COALESCE(sum(c1), 0) AS BIGINT) AS n1,
         CAST(COALESCE(sum(c - c1), 0) AS BIGINT) AS n0
  FROM r
)
SELECT n1 AS n_pos, n0 AS n_neg,
       {round4_ratio_dec_sql('rs2 - n1 * (n1 + 1)',
                             'CAST(n1 AS HUGEINT) * n0 * 2')} AS auc,
       {round4_ratio_dec_sql(
           'rs2 - n1 * (n1 + 1) - CAST(n1 AS HUGEINT) * n0',
           'CAST(n1 AS HUGEINT) * n0')} AS gini
FROM agg
"""

ORACLES["calibration_bins"] = f"""
WITH {_DUCK_SCORES_CTE}, b AS (
  SELECT y, lp, CAST(least(lp // 1000, {CALIB_BINS - 1}) AS INTEGER)
           AS bin
  FROM s
), a AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lp) AS HUGEINT) AS slp,
         CAST(sum(y) AS BIGINT) AS n_pos
  FROM b GROUP BY bin
)
SELECT bin, n, n_pos,
       {round4_ratio_dec_sql('slp', 'CAST(n AS HUGEINT) * 10000')}
         AS mean_pred,
       {round4_ratio_sql('n_pos', 'n')} AS frac_pos,
       round({round4_ratio_dec_sql('slp', 'CAST(n AS HUGEINT) * 10000')}
             - {round4_ratio_sql('n_pos', 'n')}, 4) AS gap
FROM a ORDER BY bin
"""

# spearman oracle: identical doubled tie-averaged ranks (the
# mann_whitney rank discipline) through naive global windows, HUGEINT
# moment sums, one shared cast-to-double + sqrt expression at the end
ORACLES["spearman_corr"] = f"""
WITH cnt AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x
  FROM lineitem GROUP BY l_orderkey
), base AS (
  SELECT o.o_orderstatus AS status, c.x,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders o JOIN cnt c ON c.l_orderkey = o.o_orderkey
  WHERE {money_ok_sql("o.o_totalprice")}
), r AS (
  SELECT status,
         2 * rank() OVER (PARTITION BY status ORDER BY x)
           + count(*) OVER (PARTITION BY status, x) - 1 AS rx,
         2 * rank() OVER (PARTITION BY status ORDER BY y)
           + count(*) OVER (PARTITION BY status, y) - 1 AS ry
  FROM base
), sums AS (
  SELECT status, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
         CAST(sum(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
         CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
  FROM r GROUP BY status
)
SELECT status, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE)), 0), 6)
         AS rho
FROM sums ORDER BY status
"""

