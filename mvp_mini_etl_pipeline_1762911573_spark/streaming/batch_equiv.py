"""Windowed event-time aggregations (SURVEY.md §2.9 ST1-ST3), exposed
batch-first so the DuckDB oracle can check them; `streaming.jobs` wires
the SAME logical transformations to readStream/writeStream.

Reference parity: the UI's "real time" claim (pages/index.js:216-217)
is simulated with setTimeout staging (:63-80); these are the honest
Structured-Streaming semantics over the `events` table.

Scale notes: tumbling/sliding windows shuffle on (window, key) — state
per live window only; session windows merge overlapping gaps per key.
With `withWatermark` state is bounded and late rows beyond the
watermark drop — the batch flavors below are the watermark-free
(complete) semantics the stream converges to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracles import USERS_CTE
from ..functions.exact import (finite_or_null, finite_or_null_sql,
                               money_ok, money_ok_sql, money_sum,
                               money_sum_sql)
from ..tables import load, users_clean


def tumbling_counts(events: DataFrame) -> DataFrame:
    """ST1: 1-hour tumbling window × event_type counts."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"),
             money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
             .alias("window_start"),
            "event_type", "cnt", "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """ST2: 1-hour window sliding every 15 minutes — each event lands
    in 4 windows."""
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
             .alias("window_start"),
            "cnt",
        )
    )


def session_windows(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """ST3: session windows (30-min gap) per user — batch flavor via
    the lag-gap-cumsum idiom so DuckDB can oracle it; the streaming
    flavor uses session_window() (same semantics, merged state)."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.select(
        "user_id", "event_id", "ts", "value",
        # micros precision (cast-to-long truncates sub-seconds and can
        # flip boundary gaps vs the oracle's epoch_us)
        F.when(
            (F.unix_micros("ts")
             - F.lag(F.unix_micros("ts")).over(w))
            > gap_min * 60 * 1_000_000,
            1).otherwise(0).alias("is_new_session"),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = gapped.withColumn(
        "session_id", F.sum("is_new_session").over(w_cum))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
             .alias("session_end"),
            money_sum("value").alias("session_value"),
        )
    )


def ohlc_rollup(events: DataFrame) -> DataFrame:
    """ST-EXT3: continuous OHLC aggregate — 1 h tumbling candlesticks
    per event_type, the TimescaleDB continuous-aggregate / tick-bar
    pattern as a stream-ready aggregation.  Shares the packed SCALAR
    ordering key with the batch hypertable rollup
    (operators/timeseries.py:_time_bucket_ohlc): open/close DECODE
    from plain min/max of that key, keeping the whole rollup a single
    mergeable aggregation, which is what makes it STREAMABLE —
    per-window state merges across micro-batches exactly like
    map-side partials merge across partitions; the row_number-window
    formulation is not supported over a stream at all.  Within-hour
    offset (< 2^32 µs, epoch-aligned buckets) packs with clamped
    value-cents (< 2^24) into one BIGINT; decoding (rather than
    min_by) means full-key ties — same µs, same cents — still yield
    one answer on every engine and every micro-batch order: the same
    determinism contract as the batch flavor."""
    # same finite-ticks-only contract as the batch hypertable rollup
    # (r11 extreme-doubles sweep: the packed-key cast)
    events = events.where(money_ok("value"))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = F.least(
        F.greatest(F.round(F.col("value") * 100).cast("bigint"),
                   F.lit(0)),
        F.lit((1 << 24) - 1))
    ordk = F.pmod(us, F.lit(3_600_000_000)) * (1 << 24) + cents
    decode = lambda c: (F.pmod(c, F.lit(1 << 24)) / 100.0)  # noqa: E731
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(decode(F.min(ordk)).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             decode(F.max(ordk)).alias("close"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("volume"),
             F.count("*").alias("n_ticks"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
             .alias("window_start"),
            "event_type", "open", "high", "low", "close",
            "volume", "n_ticks")
    )


def _stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_rollup(load(spark, sf_dir, "events"))


def enrich_counts(events: DataFrame, users: DataFrame) -> DataFrame:
    """ST-EXT: stream-static enrichment — events joined to the users
    dimension (country), 6-hour tumbling counts per country.  The dim
    side of a stream-static join is re-read per micro-batch and must be
    broadcast-sized (or pre-bucketed) — exactly this shape; rows whose
    user never survived cleaning land in 'unknown' (left join, not
    silent drop)."""
    dim = users.select(F.col("custkey").alias("user_id"), "country")
    return (
        events.join(F.broadcast(dim), "user_id", "left")
        .groupBy(
            F.window("ts", "6 hours").alias("w"),
            F.coalesce("country", F.lit("unknown")).alias("country"))
        .agg(F.count("*").alias("cnt"),
             money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
             .alias("window_start"),
            "country", "cnt", "total_value",
        )
    )


def _stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich_counts(load(spark, sf_dir, "events"),
                         users_clean(spark, sf_dir))


def correlate_views_purchases(views: DataFrame,
                              purchases: DataFrame) -> DataFrame:
    """ST-EXT2: event correlation — each purchase matched to the views
    by the same user in the preceding hour (the classic attribution
    interval join).  Batch flavor: equi-join on user_id + time-range
    predicate; streaming flavor (jobs.correlate_stream) is the SAME
    condition as a watermarked stream-stream inner join, where the
    range bound is what lets Spark expire join state.

    Scale: the equi key (user_id) drives the shuffle; the range
    predicate prunes within key groups.  Skewed users (bots) would
    salt the key; state size in streaming is bounded by
    watermark + 1 h."""
    v = views.select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") < F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts")
           - F.expr("INTERVAL 1 HOUR")))
    return (
        joined.groupBy(F.col("p_user").alias("user_id"), "purchase_id",
                       "purchase_value")
        .agg(F.count("*").alias("views_before"),
             F.date_format(F.max("view_ts"), "yyyy-MM-dd HH:mm:ss")
              .alias("last_view"))
        .orderBy("user_id", "purchase_id")
    )


def _stream_correlate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return correlate_views_purchases(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"))


def _stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load(spark, sf_dir, "events"))


def _stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load(spark, sf_dir, "events"))


def _stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 20 == 3)
    return session_windows(ev)


QUERIES = {
    "stream_ohlc": _stream_ohlc,
    "stream_tumbling": _stream_tumbling,
    "stream_sliding": _stream_sliding,
    "stream_session": _stream_session,
    "stream_enrich": _stream_enrich,
    "stream_correlate": _stream_correlate,
}

ORACLES = {
    # ts IS NOT NULL in all four windowed-oracle mirrors: Spark's
    # F.window() DROPS rows without event time (the streaming
    # semantics — an event that carries no timestamp cannot be placed
    # in any window) while DuckDB's time_bucket(NULL) kept a NULL
    # bucket group (r11 all-NULL sweep: 0 vs 1 rows)
    "stream_ohlc": f"""
WITH b AS (
  SELECT event_type,
         strftime(time_bucket(INTERVAL 1 HOUR, ts),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         -- sign-safe floor mod (mirrors Spark's pmod): DuckDB's %
         -- truncates, so a pre-1970 negative epoch_us would yield a
         -- NEGATIVE within-hour offset and corrupt the packed key
         -- (r7 negative-epoch differential find)
         (((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
           * 16777216
         + least(greatest(CAST(round(value * 100) AS BIGINT), 0),
                 16777215) AS ordk,
         value
  FROM events WHERE ts IS NOT NULL AND {money_ok_sql("value")}
)
SELECT window_start, event_type,
       (min(ordk) % 16777216) / 100.0 AS open,
       max(value) AS high, min(value) AS low,
       (max(ordk) % 16777216) / 100.0 AS close,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM b GROUP BY window_start, event_type
""",
    "stream_correlate": """
SELECT p.user_id, p.event_id AS purchase_id,
       p.value AS purchase_value,
       CAST(count(*) AS BIGINT) AS views_before,
       strftime(max(v.ts), '%Y-%m-%d %H:%M:%S') AS last_view
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts < p.ts
 AND v.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY p.user_id, p.event_id, p.value
ORDER BY 1, 2
""",
    "stream_enrich": USERS_CTE + f"""
SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       coalesce(country, 'unknown') AS country,
       CAST(count(*) AS BIGINT) AS cnt,
       {money_sum_sql("value")} AS total_value
FROM events
LEFT JOIN users_clean ON user_id = custkey
WHERE ts IS NOT NULL
GROUP BY time_bucket(INTERVAL 6 HOUR, ts), coalesce(country, 'unknown')
""",
    "stream_tumbling": f"""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       {money_sum_sql("value")} AS total_value
FROM events WHERE ts IS NOT NULL
GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
""",
    "stream_sliding": """
WITH offsets AS (SELECT unnest([0, 15, 30, 45]) AS off_min),
     slid AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts - (off_min * INTERVAL 1 MINUTE))
           + (off_min * INTERVAL 1 MINUTE) AS window_start
  FROM events, offsets WHERE ts IS NOT NULL
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(*) AS BIGINT) AS cnt
FROM slid
GROUP BY window_start
""",
    "stream_session": f"""
WITH gapped AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WHERE user_id % 20 = 3
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, sum(is_new_session) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       {money_sum_sql("value")} AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
}
