"""Time-series rollup operators (EXT): hypertable-style OHLC bucket
aggregation, time-weighted averages, and CUSUM drift detection over
the `events` table.

No reference counterpart (the reference's only time surface is the
run-duration metric, src/lib/randomuser.js:117-122); these are the
continuous-aggregate queries a TimescaleDB/ClickHouse user expects an
engine claiming "same capabilities at 100 TB" to run, and they
exercise two plan families the suite doesn't otherwise pin:
pure-aggregation time-bucket rollups (no window, map-side partials all
the way down) and order-sensitive interval weighting (lead over a
bounded partition).

Scale notes (100 TB):
* OHLC: open/close via min_by/max_by make the whole rollup ONE
  groupBy — partial aggregation collapses each scan partition to at
  most one row per (type, bucket) before the shuffle, so the exchange
  carries bucket summaries, never raw ticks.  This is why the
  hypertable pattern beats the row_number()-window formulation, which
  would hash-partition and sort the full tick stream.
* TWAP: the lead() window partitions by (event_type, day) — bounded
  chunks regardless of corpus size (the hypertable chunking trick),
  never one partition per series.  Interval durations stay in integer
  microseconds; only the final ratio rounds.
* CUSUM: per-series moments come from ONE partial-aggregated groupBy
  broadcast back over the stream (the events_zscore shape); the
  running sum is inherently sequential per series, so the series key
  is the partition key — for few fat series, chunk + per-chunk offset
  (two passes) is the distributed-prefix-sum rewrite; documented, not
  needed at this series cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exact import (finite_or_null, finite_or_null_sql,
                               money_dec, money_ok, money_ok_sql,
                               round4_ratio_dec, round4_ratio_dec_sql)
from ..tables import load

OHLC_BUCKET_S = 21600  # 6-hour buckets, epoch-aligned on both engines
CUSUM_ROUND = 4


def _bucket6h(col):
    # epoch-aligned arithmetic bucketing: identical on any engine,
    # no reliance on a time_bucket() origin convention
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col) / OHLC_BUCKET_S).cast("bigint")
        * OHLC_BUCKET_S)


def _time_bucket_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: hypertable rollup — OHLC candlesticks per (event_type,
    6 h bucket): open = value of the earliest tick (ties: smallest
    value), close = value of the latest tick (ties: largest value),
    high/low as plain extremes, volume as an exact DECIMAL sum
    (order-free, bit-equal on any engine) surfaced as double.  One
    groupBy, zero windows: the map-side partial combine is the
    entire point of the shape.

    open/close come from DECODING plain min/max of a packed SCALAR
    key — bucket-relative microseconds (< 2^35) in the high bits,
    clamped value-cents (< 2^24) in the low bits — rather than
    min_by/max_by: (a) a struct ordering key would push min_by's
    buffer out of HashAggregate into a SortAggregate fallback that
    sorts every scan partition by the group key (pinned by
    tests/test_plans.py::test_ohlc_uses_hash_aggregation); (b) even a
    scalar min_by is nondeterministic when two ticks TIE on the full
    key (same µs, same cents) — it returns either row's raw value —
    whereas decoding cents from min(ordk) yields the identical answer
    no matter which row won, so the operator is total-order-free
    deterministic by construction.  The decode quantizes open/close
    to cents, exact while 0 <= value < 167,772 (clamped outside),
    which a price-like measure satisfies by specification."""
    # finite ticks only (r11 extreme-doubles sweep): round(inf*100)
    # kills the packed-key BIGINT cast before the clamp can catch it,
    # and a corrupt tick belongs in no candle
    ev = load(spark, sf_dir, "events").where(money_ok("value"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucket_s = (F.floor(F.unix_timestamp("ts") / OHLC_BUCKET_S)
                .cast("bigint") * OHLC_BUCKET_S)
    cents = F.least(
        F.greatest(F.round(F.col("value") * 100).cast("bigint"),
                   F.lit(0)),
        F.lit((1 << 24) - 1))
    ordk = (us - bucket_s * 1_000_000) * (1 << 24) + cents
    decode = lambda c: (F.pmod(c, F.lit(1 << 24)) / 100.0)  # noqa: E731
    return (
        ev.groupBy(
            "event_type",
            F.date_format(_bucket6h(F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("bucket_start"))
        .agg(decode(F.min(ordk)).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             decode(F.max(ordk)).alias("close"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("volume"),
             F.count("*").alias("n_ticks"))
        .orderBy("event_type", "bucket_start")
    )


def _window_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: time-weighted average price per (event_type, day) — each
    observation holds until the next one, so its weight is the integer
    microseconds to the successor within the day-chunk (last
    observation of a chunk carries no interval, per the standard TWAP
    convention).  Reported against the naive mean so the
    sampling-bias gap is visible."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value",
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        F.unix_micros(F.col("ts")).alias("us"))
    w = (Window.partitionBy("event_type", "day")
         .orderBy("ts", "event_id"))
    iv = ev.withColumn("dur_us", F.lead("us").over(w) - F.col("us"))
    # money_sum discipline (r12 many-files sweep): both numerator sums
    # accumulate exactly — value in DECIMAL(18,2) (cents-exact) times
    # the integer microsecond weight stays integral at scale 2; the
    # one division has identical IEEE operands on both engines
    vdec = money_dec("value")
    return (
        iv.groupBy("event_type", "day")
        .agg(F.round(F.sum(vdec * F.col("dur_us")).cast("double")
                     / F.sum("dur_us"), 6).alias("twap"),
             F.round(F.sum(vdec).cast("double")
                     / F.count(vdec), 6).alias("naive_avg"),
             F.count("dur_us").alias("n_intervals"))
        .orderBy("event_type", "day")
    )


def _cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: CUSUM drift detection — per event_type, the running sum of
    standardized deviations over time order; the report row is the
    excursion peak (argmax of |CUSUM|, ties broken by earliest ts):
    where the series drifted furthest from its long-run mean.  Moments
    via groupBy + broadcast rejoin (never an unbounded window over the
    raw stream); ranking happens on the ROUNDED statistic so the
    argmax choice is engine-stable."""
    # finite-or-null measure hygiene (r11 extreme-doubles sweep): a
    # corrupt +-inf/NaN measure silently poisons moments/cumulative
    # sums on one engine and kills exact-integer casts on the other;
    # NULL semantics stay exactly as the null_mixed tier pins them
    ev = (load(spark, sf_dir, "events")
          .where(finite_or_null("value"))
          .select("event_type", "ts", "event_id", "value"))
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"),
        F.count("*").alias("n_events"))
    wcum = (Window.partitionBy("event_type").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cusum = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("cusum", F.sum((F.col("value") - F.col("m"))
                                   / F.col("sd")).over(wcum))
        .withColumn("abs_c", F.round(F.abs("cusum"), CUSUM_ROUND))
    )
    wtop = Window.partitionBy("event_type").orderBy(
        F.col("abs_c").desc(), F.col("ts").asc(), F.col("event_id").asc())
    return (
        cusum.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") == 1)
        .select("event_type", "n_events",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                 .alias("peak_ts"),
                F.round("cusum", CUSUM_ROUND).alias("peak_cusum"),
                F.signum("cusum").cast("int").alias("drift_sign"))
        .orderBy("event_type")
    )


ACF_MAX_LAG = 3  # autocorrelation horizon; the oracle unrolls lags 1..3


def _acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): per-series autocorrelation function — r_k for
    lags 1..ACF_MAX_LAG of each event_type's value series in time
    order, the first diagnostic a forecasting pipeline reads (is this
    series momentum, mean-reverting, or noise?).  Completes the
    time-series family: OHLC summarizes levels, TWAP weights them,
    CUSUM finds a break, ACF measures memory.

    Engine-invariance discipline (the pagerank/lm_score pattern):
    r_k = sum(u_t * u_{t+k}) / sum(u_t^2) where u_t = n*c_t - S over
    integer CENTS c_t (floor(v*100+0.5), the benford idiom) — i.e.
    the mean-centered terms scaled through by n so EVERYTHING is an
    exact integer (a double mean would leak order-dependent ulps into
    every product).  Sums accumulate in DECIMAL(38,0) (order-free;
    u^2 ~ 1e20 passes int64), and the single division per lag rounds
    half-up in exact decimal space (round4_ratio_dec).  A constant
    series has denominator 0 -> NULL acf on both engines (the
    round4_ratio_dec guard), never a crash.

    Domain guard: NULL/NaN excluded AND |v| < 9e6 — TIGHTER than the
    floor-cents 9e14 quantizer bound, because u = n*c - S squares:
    sum(u^2) ~ n^3 * var(cents) must stay inside DECIMAL(38,0), so
    cents are capped at 9e8 (envelope: n^3 * var_cents < 1e38, i.e.
    worst-case-adversarial-safe to ~1e6 rows/series, realistic-var-
    safe far beyond; past that, chunk the series per the scale note).
    The hostile-value differential corpus pins the bound (a 9e14 cap
    overflows the u^2 accumulator with ~9e16-cent outliers).

    Scale: ONE hash exchange on event_type feeds the whole-partition
    moments window, the lead() windows and the final agg (same key ->
    Catalyst reuses the partitioning; the profiler pin asserts it).
    Series count bounds parallelism — for few fat series the
    chunk-plus-offset split (the _value_arm_cum two-level scan) is
    the documented rewrite, as in CUSUM."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & ~F.isnan("value")
                 & (F.abs(F.col("value")) < 9e6))
          .select("event_type", "ts", "event_id",
                  F.floor(F.col("value") * 100 + 0.5).alias("c")))
    part = Window.partitionBy("event_type")
    ordered = part.orderBy("ts", "event_id")
    d = (ev
         .withColumn("n", F.count("*").over(part))
         .withColumn("s", F.sum("c").over(part))
         .withColumn("u", (F.col("n") * F.col("c") - F.col("s"))
                     .cast("decimal(19,0)")))
    for k in range(1, ACF_MAX_LAG + 1):
        d = d.withColumn(f"u{k}", F.lead("u", k).over(ordered))
    aggs = [F.count("*").alias("n_obs"),
            F.sum((F.col("u") * F.col("u")).cast("decimal(38,0)"))
            .alias("den")]
    for k in range(1, ACF_MAX_LAG + 1):
        aggs.append(F.sum((F.col("u") * F.col(f"u{k}"))
                          .cast("decimal(38,0)")).alias(f"num{k}"))
    out = d.groupBy("event_type").agg(*aggs)
    sel = [F.col("event_type"), F.col("n_obs")]
    for k in range(1, ACF_MAX_LAG + 1):
        sel.append(round4_ratio_dec(
            F.col(f"num{k}"), F.col("den")).alias(f"acf{k}"))
    return out.select(*sel).orderBy("event_type")


def _seasonal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): seasonal percentile envelope — p10/p50/p90
    bands of value per (event_type, hour-of-day), the baseline a
    monitoring pipeline draws before flagging 'today at 14:00 is
    outside the envelope'.  Completes the time-series family sideways:
    OHLC/TWAP/ACF walk calendar time, this one folds it onto the
    24-hour clock to expose the daily seasonality profile.

    Exactness is the winsorize discipline end-to-end: integer CENTS
    (floor(100v + 0.5)), band edges as DISCRETE order statistics at
    pure-integer ceil ranks ((n·k + 99) div 100 — never interpolated
    percentiles, never float rank arithmetic), edges REPORTED as
    cents BIGINTs, and the mean as an exact cent-sum ratio
    (round4_ratio_dec).  Hour-of-day comes from the NTZ timestamp —
    both engines read the same wall-clock field, no zone arithmetic.

    Scale: ONE hash exchange on the ≤ types×24 composite key feeds
    the ranking window, the three band extractions (same partition →
    the windows share the sort) and the final agg.  Each cell sorts
    independently in parallel; at 100 TB swap the exact order
    statistics for approx_percentile sketches — identical downstream
    shape, exactness kept here for the oracle (the winsorize note)."""
    ev = (load(spark, sf_dir, "events")
          .where(F.col("value").isNotNull() & ~F.isnan("value")
                 & (F.abs(F.col("value")) < 9e14))
          .select("event_type", F.hour("ts").alias("hr"), "event_id",
                  F.floor(F.col("value") * 100 + 0.5).alias("cents")))
    part = Window.partitionBy("event_type", "hr")
    ranked = (ev
              .withColumn("rn", F.row_number().over(
                  part.orderBy("cents", "event_id")))
              .withColumn("n", F.count("*").over(part)))
    band = lambda k: F.max(F.when(                      # noqa: E731
        F.col("rn") == F.expr(f"(n * {k} + 99) div 100"),
        F.col("cents"))).over(part)
    return (ranked
            .withColumn("p10", band(10))
            .withColumn("p50", band(50))
            .withColumn("p90", band(90))
            .groupBy("event_type", "hr")
            .agg(F.count("*").alias("n_obs"),
                 F.max("p10").alias("p10_cents"),
                 F.max("p50").alias("p50_cents"),
                 F.max("p90").alias("p90_cents"),
                 round4_ratio_dec(
                     F.sum(F.col("cents").cast("decimal(38,0)")),
                     (F.count("*") * 100).cast("decimal(38,0)"))
                 .alias("mean_value"))
            .orderBy("event_type", "hr"))


BURST_BUCKET_S = 3600   # tumbling rate window: 1 hour
BURST_BASELINE_W = 6    # trailing baseline: the 6 previous windows
BURST_SIGMA2 = 4        # squared surprise threshold: burst iff the
#                         count exceeds the baseline mean by >= sqrt(
#                         SIGMA2) Poisson standard deviations — see
#                         the docstring's cross-multiplied form
BURST_MIN_CNT = 3       # absolute floor: a 1-2 event blip is never
#                         a burst, whatever the baseline says


def _burst_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r11 debut; r12 rule change): per-event-type burst
    intervals — tumbling 1-hour rates compared against the trailing
    BURST_BASELINE_W-window mean, maximal above-threshold runs merged
    into one interval each (the Kleinberg-style burst readout at its
    cheapest useful form: "this event type ran well above its own
    recent rate from 14:00 to 17:00, 312 events, peaking at 19/h").
    The anomaly sibling of `events_zscore` (global moments) and
    `cusum_changepoint` (cumulative drift): LOCAL rate vs local
    baseline, reported as intervals rather than points.

    Burst rule (r12, the verdict's de-vacuation item): a window is a
    burst iff its count exceeds the baseline mean by at least
    sqrt(BURST_SIGMA2) Poisson standard deviations — the
    scale-INVARIANT surprise test.  The r11 rule (cnt >= 2x baseline
    mean) was vacuous at dense fixtures: relative fluctuation shrinks
    as 1/sqrt(rate), so a fixed rate MULTIPLE stops firing exactly
    when data gets dense (sf0.1 returned 0 rows on both engines — a
    scale check that verifies the empty set), while a fixed
    SIGMA threshold fires at a roughly density-free per-hour
    probability at every SF.  Cross-multiplied to stay all-integer
    (no float rate, no sqrt): with exc = cnt·W − Σ(prev W counts),
    burst iff exc > 0 AND exc² >= SIGMA2·W·Σ — exc² in
    DECIMAL(38,0)/HUGEINT (cnt·W can pass 2^31.5 at 100 TB hourly
    rates, so the square needs wide space) — AND cnt >= BURST_MIN_CNT.

    Exactness: the verdict is integer compares on a gap-DENSIFIED
    hourly series (missing hours count 0: a spike after a quiet gap
    must compare against the true zero-ish rate, not against the last
    few busy hours).  Warm-up rows (fewer than W trailing windows) are
    excluded, so the first W hours of a series can't self-compare.
    Runs merge via the gaps-and-islands idiom (`events_sessionize`):
    island id = hour index − row_number, both integers.  Every output
    column is an integer or a formatted timestamp string — nothing
    rounds.

    100 TB shape: the rate table is ONE partial-agg'd groupBy
    (event_type, hour) — the exchange carries hourly summaries, never
    raw events; densification explodes a bounded per-type hour span
    (8.8k rows/type/year); baseline + islands are windows keyed on the
    same event_type partitioning Catalyst reuses end-to-end.  Series
    key = partition key, the hypertable chunking note atop this module
    applies."""
    ev = load(spark, sf_dir, "events")
    bi = F.floor(F.unix_timestamp("ts") / BURST_BUCKET_S).cast("long")
    cnts = (ev.select("event_type", bi.alias("bi"))
            .groupBy("event_type", "bi")
            .agg(F.count("*").alias("cnt")))
    spans = cnts.groupBy("event_type").agg(
        F.min("bi").alias("b0"), F.max("bi").alias("b1"))
    dense = spans.select(
        "event_type", F.explode(F.sequence("b0", "b1")).alias("bi"))
    filled = (dense.join(cnts, ["event_type", "bi"], "left")
              .select("event_type", "bi",
                      F.coalesce("cnt", F.lit(0)).alias("cnt")))
    wb = (Window.partitionBy("event_type").orderBy("bi")
          .rowsBetween(-BURST_BASELINE_W, -1))
    based = filled.select(
        "event_type", "bi", "cnt",
        F.sum("cnt").over(wb).alias("bsum"),
        F.count(F.lit(1)).over(wb).alias("bn"))
    exc = F.col("cnt") * BURST_BASELINE_W - F.col("bsum")
    bursts = based.where(
        (F.col("bn") == BURST_BASELINE_W)
        & (exc > 0)
        & (exc.cast("decimal(38,0)") * exc.cast("decimal(38,0)")
           >= F.lit(BURST_SIGMA2 * BURST_BASELINE_W)
           * F.col("bsum").cast("decimal(38,0)"))
        & (F.col("cnt") >= BURST_MIN_CNT))
    wr = Window.partitionBy("event_type").orderBy("bi")
    isl = bursts.withColumn("grp", F.col("bi") - F.row_number().over(wr))

    def hour_str(c):
        return F.date_format(
            F.timestamp_seconds(c * BURST_BUCKET_S),
            "yyyy-MM-dd HH:mm:ss")

    return (isl.groupBy("event_type", "grp")
            .agg(F.min("bi").alias("bi0"), F.max("bi").alias("bi1"),
                 F.count("*").alias("n_windows"),
                 F.sum("cnt").alias("n_events"),
                 F.max("cnt").alias("peak"))
            .select("event_type",
                    hour_str(F.col("bi0")).alias("burst_start"),
                    hour_str(F.col("bi1")).alias("burst_end"),
                    "n_windows", "n_events", "peak")
            .orderBy("event_type", "burst_start"))


QUERIES = {
    "time_bucket_ohlc": _time_bucket_ohlc,
    "window_twap": _window_twap,
    "cusum_changepoint": _cusum_changepoint,
    "acf_lags": _acf_lags,
    "seasonal_envelope": _seasonal_envelope,
    "burst_detect": _burst_detect,
}

ORACLES = {
    "time_bucket_ohlc": f"""
WITH b AS (
  SELECT event_type,
         strftime(to_timestamp(CAST(floor(epoch(ts) / {OHLC_BUCKET_S})
                  AS BIGINT) * {OHLC_BUCKET_S}),
                  '%Y-%m-%d %H:%M:%S') AS bucket_start,
         (epoch_us(ts)
          - CAST(floor(epoch(ts) / {OHLC_BUCKET_S}) AS BIGINT)
            * {OHLC_BUCKET_S} * 1000000) * 16777216
         + least(greatest(CAST(round(value * 100) AS BIGINT), 0),
                 16777215) AS ordk,
         value
  FROM events WHERE {money_ok_sql("value")}
)
SELECT event_type, bucket_start,
       (min(ordk) % 16777216) / 100.0 AS open,
       max(value) AS high, min(value) AS low,
       (max(ordk) % 16777216) / 100.0 AS close,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM b GROUP BY event_type, bucket_start
""",
    "window_twap": f"""
WITH iv AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CASE WHEN {money_ok_sql("value")} THEN value END AS v,
         lead(epoch_us(ts)) OVER (
           PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
           ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
  FROM events
)
SELECT event_type, day,
       round(CAST(sum(CAST(v AS DECIMAL(18,2)) * dur_us) AS DOUBLE)
             / sum(dur_us), 6) AS twap,
       round(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
             / count(v), 6) AS naive_avg,
       CAST(count(dur_us) AS BIGINT) AS n_intervals
FROM iv GROUP BY event_type, day
""",
    "cusum_changepoint": f"""
WITH fe AS (
  SELECT * FROM events WHERE {finite_or_null_sql("value")}
), stats AS (
  SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd,
         CAST(count(*) AS BIGINT) AS n_events
  FROM fe GROUP BY event_type
), cs AS (
  SELECT e.event_type, s.n_events, e.ts,
         sum((e.value - s.m) / s.sd) OVER (
           PARTITION BY e.event_type
           ORDER BY e.ts, e.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
         e.event_id
  FROM fe e JOIN stats s ON e.event_type = s.event_type
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type
           ORDER BY round(abs(cusum), {CUSUM_ROUND}) DESC,
                    ts ASC, event_id ASC) AS rn
  FROM cs
)
SELECT event_type, n_events,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS peak_ts,
       round(cusum, {CUSUM_ROUND}) AS peak_cusum,
       CAST(sign(cusum) AS INTEGER) AS drift_sign
FROM ranked WHERE rn = 1
""",
    # burst_detect (r11; r12 sigma rule): identical integer hour
    # indices, the same densified trailing frame, the same all-integer
    # cross-multiplied Poisson-surprise verdict (exc² in HUGEINT, the
    # Spark side's DECIMAL(38,0)) and gaps-and-islands merge — every
    # column integer/string
    "burst_detect": f"""
WITH bc AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {BURST_BUCKET_S}) AS BIGINT) AS bi,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(bi) AS b0, max(bi) AS b1 FROM bc GROUP BY 1
), dense AS (
  SELECT s.event_type, unnest(generate_series(s.b0, s.b1)) AS bi
  FROM spans s
), filled AS (
  SELECT d.event_type, d.bi, coalesce(c.cnt, 0) AS cnt
  FROM dense d LEFT JOIN bc c USING (event_type, bi)
), based AS (
  SELECT *, sum(cnt) OVER w AS bsum, count(*) OVER w AS bn
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY bi
               ROWS BETWEEN {BURST_BASELINE_W} PRECEDING
                        AND 1 PRECEDING)
), bursts AS (
  SELECT event_type, bi, cnt,
         bi - row_number() OVER (PARTITION BY event_type ORDER BY bi)
           AS grp
  FROM based
  WHERE bn = {BURST_BASELINE_W}
    AND cnt * {BURST_BASELINE_W} - bsum > 0
    AND CAST(cnt * {BURST_BASELINE_W} - bsum AS HUGEINT)
        * (cnt * {BURST_BASELINE_W} - bsum)
        >= {BURST_SIGMA2 * BURST_BASELINE_W} * CAST(bsum AS HUGEINT)
    AND cnt >= {BURST_MIN_CNT}
)
SELECT event_type,
       strftime(to_timestamp(min(bi) * {BURST_BUCKET_S}),
                '%Y-%m-%d %H:%M:%S') AS burst_start,
       strftime(to_timestamp(max(bi) * {BURST_BUCKET_S}),
                '%Y-%m-%d %H:%M:%S') AS burst_end,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(max(cnt) AS BIGINT) AS peak
FROM bursts GROUP BY event_type, grp
ORDER BY event_type, burst_start
""",
}

# identical integer recurrence: u = n*c - S in int64, products summed
# exactly (HUGEINT here, DECIMAL(38,0) on the Spark side), one
# half-up division per lag in exact wide-integer space
ORACLES["acf_lags"] = f"""
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    AND abs(value) < 9e6
), st AS (
  SELECT event_type, ts, event_id, c,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS s
  FROM e
), u AS (
  SELECT event_type, n, n * c - s AS u,
         lead(n * c - s, 1) OVER w AS u1,
         lead(n * c - s, 2) OVER w AS u2,
         lead(n * c - s, 3) OVER w AS u3
  FROM st
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_obs,
         sum(CAST(u AS HUGEINT) * u) AS den,
         sum(CAST(u AS HUGEINT) * u1) AS num1,
         sum(CAST(u AS HUGEINT) * u2) AS num2,
         sum(CAST(u AS HUGEINT) * u3) AS num3
  FROM u GROUP BY event_type
)
SELECT event_type, n_obs,
       {round4_ratio_dec_sql("num1", "den")} AS acf1,
       {round4_ratio_dec_sql("num2", "den")} AS acf2,
       {round4_ratio_dec_sql("num3", "den")} AS acf3
FROM agg ORDER BY event_type
"""

# identical winsorize-style recurrence: cents, row_number ranks with
# (event_id) tie-break, integer ceil-rank band extraction, exact mean
ORACLES["seasonal_envelope"] = f"""
WITH e AS (
  SELECT event_type, hour(ts) AS hr, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
    AND abs(value) < 9e14
), ranked AS (
  SELECT event_type, hr, cents,
         row_number() OVER w AS rn,
         CAST(count(*) OVER (PARTITION BY event_type, hr) AS BIGINT) AS n
  FROM e
  WINDOW w AS (PARTITION BY event_type, hr ORDER BY cents, event_id)
)
SELECT event_type, CAST(hr AS INTEGER) AS hr,
       CAST(count(*) AS BIGINT) AS n_obs,
       max(CASE WHEN rn = (n * 10 + 99) // 100 THEN cents END)
         AS p10_cents,
       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END)
         AS p50_cents,
       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN cents END)
         AS p90_cents,
       {round4_ratio_dec_sql("CAST(sum(cents) AS HUGEINT)",
                             "CAST(count(*) AS HUGEINT) * 100")}
         AS mean_value
FROM ranked GROUP BY event_type, hr
ORDER BY event_type, hr
"""
