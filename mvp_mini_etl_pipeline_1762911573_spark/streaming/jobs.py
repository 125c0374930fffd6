"""Real Structured Streaming flavors (SURVEY.md §2.9 ST1-ST5).

The logical transformations are shared with `batch_equiv` — a stream is
the same DataFrame program bound to readStream instead of read, which
is the whole point of Spark's unified model.  These run in tests with
``Trigger.AvailableNow`` against the parquet `events` table as a file
stream, writing to a memory sink, and must equal the batch results.

Scale notes: file-source streams list+read incrementally
(maxFilesPerTrigger); state stores (window aggs, dedup) are RocksDB-
backed on a real cluster (`spark.sql.streaming.stateStore.providerClass`)
— config, not code.  Watermarks bound state: 10-min late tolerance
means state per key×window lives ~window+10min.
"""

from __future__ import annotations

from ..functions.exact import money_sum
from pyspark.sql import DataFrame, SparkSession, functions as F

from .batch_equiv import enrich_counts, tumbling_counts
from ..tables import load


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from
    the raw batch read — streaming sources require an explicit schema).
    The raw `ts` arrives as nanos-long (see tables.load); the same
    micros conversion is applied on the stream.

    SIDE EFFECT (deliberate, session-wide): sets
    ``spark.sql.legacy.parquet.nanosAsLong=true`` and
    ``spark.sql.session.timeZone=UTC`` on the caller's session and does
    NOT restore prior values — the returned stream executes lazily
    under whatever conf is live at micro-batch time, so a scoped
    save/restore would silently undo the UTC pin before the stream
    runs.  This mirrors tables.load exactly; every query in this repo
    assumes (and re-asserts) the same two confs."""
    import os

    path = f"{sf_dir}/events.parquet"
    # mirror tables.load's defensive confs: the driver may hand us its
    # own session, and the NTZ->timestamp cast below is only
    # instant-preserving when the session timezone is UTC (nanosAsLong
    # is likewise required to read the NANOS-timestamped parquet)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(path).schema
    # FileStreamSource requires a DIRECTORY.  Two layouts exist:
    # the driver fixtures ship events.parquet as a single FILE (point
    # the stream at sf_dir, glob down to it — one micro-batch), while
    # Spark-written tables are a DIRECTORY of part files (stream that
    # directory itself — each part becomes its own micro-batch, which
    # is what makes cross-batch state-merge testing real).
    if os.path.isdir(path):
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # mirror tables.load: NTZ parquet micros → instant under UTC
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_stream(events: DataFrame) -> DataFrame:
    """ST1 as a stream with ST4 watermark: 10-minute late tolerance."""
    return tumbling_counts(events.withWatermark("ts", "10 minutes"))


def ohlc_stream(events: DataFrame) -> DataFrame:
    """ST-EXT3 streaming flavor: the continuous OHLC aggregate bound
    to a watermarked stream — candlestick state per live (type, hour)
    window merges across micro-batches (min_by/max_by are mergeable;
    see batch_equiv.ohlc_rollup for why that, not a ranking window,
    is the streamable formulation)."""
    from .batch_equiv import ohlc_rollup
    return ohlc_rollup(events.withWatermark("ts", "10 minutes"))


def sliding_stream(events: DataFrame) -> DataFrame:
    """ST2 streaming flavor: the same sliding-window count bound to a
    watermarked stream — each event contributes to 4 overlapping
    windows; state per live window only."""
    from .batch_equiv import sliding_counts
    return sliding_counts(events.withWatermark("ts", "10 minutes"))


def sessionized_stream(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """ST3 native streaming flavor: session_window() merges overlapping
    [ts, ts+gap) intervals per key in the state store."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"),
                 "user_id")
        .agg(F.count("*").alias("n_events"),
             money_sum("value").alias("session_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
             .alias("session_start"),
            "n_events", "session_value",
        )
    )


def enrich_stream(events: DataFrame, users: DataFrame) -> DataFrame:
    """ST-EXT streaming flavor: stream-static join — the static users
    dim is (re)resolved each micro-batch, so dimension updates are
    picked up without restarting the query; broadcast keeps the join
    map-side."""
    return enrich_counts(events.withWatermark("ts", "10 minutes"), users)


def _correlate_sides(events: DataFrame):
    """The watermarked view/purchase stream pair and interval
    predicate shared by BOTH correlate flavors (inner and left-outer
    differ only in join direction/type): the watermark and the 1-hour
    range bound define state-expiry semantics, and two hand-kept
    copies would let a bound change silently desynchronize them."""
    v = (events.where(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts"))
         .withWatermark("view_ts", "10 minutes"))
    p = (events.where(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts"),
                 F.col("value").alias("purchase_value"))
         .withWatermark("purchase_ts", "10 minutes"))
    cond = ((F.col("v_user") == F.col("p_user"))
            & (F.col("view_ts") < F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts")
               - F.expr("INTERVAL 1 HOUR")))
    return v, p, cond


def correlate_stream(events: DataFrame) -> DataFrame:
    """ST-EXT2 streaming flavor: watermarked stream-stream inner join —
    views matched to purchases of the same user within the preceding
    hour.  Both sides carry watermarks and the join condition bounds
    view_ts in [purchase_ts - 1h, purchase_ts), so the state store can
    expire views older than watermark + 1 h (unbounded-state joins are
    rejected by Spark in append mode for exactly this reason).  Emits
    matched pairs (append mode); the batch flavor's per-purchase rollup
    runs downstream of the drain in the convergence test — a
    post-stream-stream-join aggregation would need its own watermark
    hop."""
    v, p, cond = _correlate_sides(events)
    return v.join(p, cond)


def correlate_outer_stream(events: DataFrame) -> DataFrame:
    """ST-EXT4: watermarked stream-stream LEFT OUTER join — the
    attribution query where EVERY purchase emits, matched to its
    preceding-hour views or with null view columns if none arrived.

    Outer stream-stream joins are the capability inner joins don't
    exercise: an unmatched left row can only emit once the watermark
    proves no matching right row can still arrive (state eviction
    time), so null emissions lag the data by watermark + the join's
    time bound — purchases younger than that at stream end stay
    unemitted, which the convergence test accounts for.  Same state
    expiry as correlate_stream: the range bound lets Spark drop views
    older than watermark + 1 h."""
    v, p, cond = _correlate_sides(events)
    return p.join(v, cond, "leftOuter")


def dedup_stream(events: DataFrame) -> DataFrame:
    """ST5: stateful exact dedup on event_id within the watermark —
    state holds only ids younger than the watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def idempotent_batch_sink(out_dir: str):
    """ST-EXT3: exactly-once foreachBatch writer for non-transactional
    sinks.  Each micro-batch lands in its own ``batch_id=<epoch>``
    partition under DYNAMIC partition overwrite, so a REPLAYED batch
    (crash between the sink write and the checkpoint offset commit —
    the at-least-once window every foreachBatch sink has) overwrites
    its own partition instead of appending duplicates.  Idempotent
    writes + checkpointed offsets = end-to-end exactly-once; this is
    the standard Spark recipe when the sink can't do transactions.

    At 100 TB this also gives per-batch lineage: a bad batch is
    re-dropped by overwriting exactly its partition, and downstream
    readers prune on batch_id."""
    def write_batch(df: DataFrame, epoch_id: int) -> None:
        (df.withColumn("batch_id", F.lit(epoch_id))
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy("batch_id")
           .parquet(out_dir))
    return write_batch


def run_to_memory(stream_df: DataFrame, query_name: str,
                  output_mode: str = "complete",
                  timeout_sec: int = 120) -> DataFrame:
    """Execute a streaming DataFrame with Trigger.AvailableNow into a
    memory sink; block until done; return the materialized result.
    Aggregating streams use 'complete'; pass 'append' for stateless /
    dedup streams.

    awaitTermination's return value is CHECKED: on timeout it returns
    False (it does not raise), and silently reading the memory table
    then would hand the caller a partial result from a still-running
    query — a confusing flaky row-count mismatch downstream, plus a
    leaked active query that collides with the next same-name start.
    Stop the query and fail loudly instead."""
    q = (
        stream_df.writeStream
        .format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream '{query_name}' still running after {timeout_sec}s "
            "— refusing to return a partial memory table")
    spark = stream_df.sparkSession
    return spark.table(query_name)
