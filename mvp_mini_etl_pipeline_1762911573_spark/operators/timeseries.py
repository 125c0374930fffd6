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
    ev = load(spark, sf_dir, "events")
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
             F.sum(F.col("value").cast("decimal(14,2)"))
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
    return (
        iv.groupBy("event_type", "day")
        .agg(F.round(F.sum(F.col("value") * F.col("dur_us"))
                     / F.sum("dur_us"), 6).alias("twap"),
             F.round(F.avg("value"), 6).alias("naive_avg"),
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
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value")
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


QUERIES = {
    "time_bucket_ohlc": _time_bucket_ohlc,
    "window_twap": _window_twap,
    "cusum_changepoint": _cusum_changepoint,
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
  FROM events
)
SELECT event_type, bucket_start,
       (min(ordk) % 16777216) / 100.0 AS open,
       max(value) AS high, min(value) AS low,
       (max(ordk) % 16777216) / 100.0 AS close,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM b GROUP BY event_type, bucket_start
""",
    "window_twap": """
WITH iv AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value,
         lead(epoch_us(ts)) OVER (
           PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
           ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
  FROM events
)
SELECT event_type, day,
       round(sum(value * dur_us) / sum(dur_us), 6) AS twap,
       round(avg(value), 6) AS naive_avg,
       CAST(count(dur_us) AS BIGINT) AS n_intervals
FROM iv GROUP BY event_type, day
""",
    "cusum_changepoint": f"""
WITH stats AS (
  SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
), cs AS (
  SELECT e.event_type, s.n_events, e.ts,
         sum((e.value - s.m) / s.sd) OVER (
           PARTITION BY e.event_type
           ORDER BY e.ts, e.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
         e.event_id
  FROM events e JOIN stats s ON e.event_type = s.event_type
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
}
