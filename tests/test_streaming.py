"""Structured Streaming vs batch equivalence (SURVEY.md §5.5):
the same logical program bound to readStream must produce the batch
answer once the stream drains (Trigger.AvailableNow)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.streaming import jobs
from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
    tumbling_counts,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    batch = tumbling_counts(load(spark, sf_dir, "events"))
    stream = jobs.tumbling_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_tumbling", "complete")
    cols = ["window_start", "event_type", "cnt", "total_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_session_stream_runs(spark, sf_dir):
    stream = jobs.sessionized_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_session", "complete")
    assert got.count() > 0
    # session windows partition the events: totals must reconcile
    n_events = got.agg(F.sum("n_events")).first()[0]
    assert n_events == load(spark, sf_dir, "events").count()


def test_sliding_stream_equals_batch(spark, sf_dir):
    """ST2 parity: the watermarked sliding-window stream converges to
    the batch sliding_counts answer once the stream drains."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        sliding_counts,
    )
    batch = sliding_counts(load(spark, sf_dir, "events"))
    stream = jobs.sliding_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_sliding", "complete")
    cols = ["window_start", "cnt"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_session_stream_equals_batch(spark, sf_dir):
    """ST3 parity: session_window() streaming state merge produces the
    same sessions as the batch lag-gap-cumsum idiom.  Compared on the
    columns both flavors emit: a session is identified by its owner and
    first-event timestamp; n_events/session_value pin its content.
    Boundary note: session_window splits when the inter-event gap is
    >= gap (half-open [ts, ts+gap)); the batch idiom splits on strict
    > gap.  They diverge only for a gap of exactly 30:00.000000 —
    absent from the fixtures at micros precision, and this test is the
    tripwire if that ever changes."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        session_windows,
    )
    batch = session_windows(load(spark, sf_dir, "events"))
    stream = jobs.sessionized_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_session_eq", "complete")
    cols = ["user_id", "session_start", "n_events", "session_value"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_dedup_stream_drops_dupes(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    stream = jobs.dedup_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_dedup", "append")
    assert got.count() == ev.select("event_id").distinct().count()


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the arbitrary-sink escape hatch — write each
    micro-batch to parquet; drained output must equal the batch read."""
    out = str(tmp_path / "fb_out")
    stream = jobs.events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value")

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out)

    q = (stream.writeStream.foreachBatch(write_batch)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
         .start())
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    ev = load(spark, sf_dir, "events")
    assert back.count() == ev.count()
    assert (back.agg(F.round(F.sum("value"), 2)).first()[0]
            == ev.agg(F.round(F.sum("value"), 2)).first()[0])


def test_idempotent_sink_survives_batch_replay(spark, sf_dir, tmp_path):
    """ST-EXT3: the exactly-once foreachBatch recipe — a replayed
    micro-batch (the at-least-once failure window) must overwrite its
    own batch_id partition, not append duplicates."""
    out = str(tmp_path / "idem_out")
    stream = jobs.events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value")
    sink = jobs.idempotent_batch_sink(out)

    q = (stream.writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "idem_ckpt"))
         .start())
    q.awaitTermination(120)
    ev = load(spark, sf_dir, "events")
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    batch_ids = [r[0] for r in back.select("batch_id").distinct().collect()]

    # simulate the crash-and-replay: re-deliver the first batch (with
    # maxFilesPerTrigger=1 and one events file the whole table IS
    # batch 0) — count and totals must be unchanged after the replay
    replay = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    sink(replay, min(batch_ids))
    back2 = spark.read.parquet(out)
    assert back2.count() == ev.count()
    assert (back2.agg(F.round(F.sum("value"), 2)).first()[0]
            == ev.agg(F.round(F.sum("value"), 2)).first()[0])


def test_enrich_stream_equals_batch(spark, sf_dir):
    """ST-EXT: the stream-static enrichment join converges to the batch
    answer once the stream drains."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        enrich_counts,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import users_clean

    users = users_clean(spark, sf_dir)
    stream = jobs.enrich_stream(jobs.events_stream(spark, sf_dir), users)
    got = jobs.run_to_memory(stream, "t_enrich", "complete")
    want = enrich_counts(load(spark, sf_dir, "events"), users)
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b
    # at least one country bucket and the unknown bucket both present
    countries = {r[1] for r in a}
    assert "unknown" in countries and len(countries) > 1


def test_correlate_outer_stream_emits_unmatched(spark, sf_dir):
    """ST-EXT4: the LEFT OUTER stream-stream join must emit (a) every
    matched pair exactly as the batch left join does, and (b) a
    null-view row for every unmatched purchase old enough that the
    final watermark proves no view can still arrive.  Purchases
    younger than (watermark delay + join bound) at stream end are
    allowed to stay unemitted — that's outer-join semantics, not
    data loss."""
    ev = load(spark, sf_dir, "events")
    stream = jobs.correlate_outer_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_outer", "append")

    v = (ev.where(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts"),
                 F.col("value").alias("purchase_value")))
    batch = p.join(
        v,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") < F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts")
           - F.expr("INTERVAL 1 HOUR")),
        "leftOuter")

    cols = ["purchase_id", "view_id"]
    got_rows = set(_rows(got, cols))
    batch_rows = set(_rows(batch, cols))
    # nothing beyond the batch semantics ever emits
    assert got_rows <= batch_rows
    # matched pairs emit in full (inner emissions don't wait for the
    # watermark)
    assert ({r for r in got_rows if r[1] is not None}
            == {r for r in batch_rows if r[1] is not None})
    # null rows emit for every purchase the final watermark has proven
    # unmatched: older than max event time - (10 min delay + 1 h bound),
    # with one trigger's slack
    horizon = ev.agg(
        F.max("ts") - F.expr("INTERVAL 2 HOURS")).first()[0]
    old_unmatched = {
        r.purchase_id
        for r in batch.where(F.col("view_id").isNull()
                             & (F.col("purchase_ts") < F.lit(horizon)))
        .collect()}
    emitted_nulls = {r[0] for r in got_rows if r[1] is None}
    assert old_unmatched <= emitted_nulls
    assert old_unmatched, "fixtures should contain unmatched purchases"


def test_watermark_drops_late_events(spark, tmp_path):
    """ST4 behavioral evidence (round-3 verdict #4): an event arriving
    AFTER the watermark has passed its window must be dropped from the
    windowed aggregate, not counted.

    Three source files force three micro-batches (maxFilesPerTrigger=1,
    mtime-ordered).  Since Spark 3.4 (SPARK-42376) the LATE-event
    filter uses the PREVIOUS batch's watermark while eviction uses the
    current one, so the sequence is: batch 0 fills the window and
    advances event time past it; batch 1 evicts+emits the window
    (watermark 10:50 > window end 10:15); batch 2 replays a late row
    into the already-closed window — the filter must drop it (the
    numRowsDroppedByWatermark state metric is the direct evidence) and
    the emitted count must stay at the on-time value.
    """
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    src = tmp_path / "late_src"
    src.mkdir()

    def write(name, times, mtime):
        tbl = pa.table({
            "ts": pa.array([datetime(2026, 1, 1, *t) for t in times],
                           type=pa.timestamp("us")),
            "user_id": pa.array(range(len(times)), type=pa.int64()),
        })
        path = str(src / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    # batch 0: two rows in window [10:00, 10:15) + one at 11:00 that
    # advances the watermark to 10:50 (> the window end)
    write("a.parquet", [(10, 0), (10, 14), (11, 0)], 1_000_000)
    # batch 1: fresh event time only — the 10:00 window evicts here
    write("b.parquet", [(11, 30)], 1_000_060)
    # batch 2: the LATE row targeting the closed window, plus an
    # on-time row
    write("c.parquet", [(10, 5), (11, 45)], 1_000_120)

    schema = spark.read.parquet(str(src)).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src))
              # naive parquet micros read as NTZ; same UTC-pinned cast
              # to instant semantics as events_stream
              .withColumn("ts", F.col("ts").cast("timestamp")))
    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.date_format("w.start", "HH:mm").alias("w_start"),
                "cnt"))
    q = (windowed.writeStream.format("memory").queryName("t_late_drop")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress
                  for op in p["stateOperators"])
    by_window = {r.w_start: r.cnt
                 for r in spark.table("t_late_drop").collect()}
    # the watermark filter dropped exactly the one late row...
    assert dropped == 1
    # ...so the closed window stays at its on-time count
    assert by_window["10:00"] == 2
    assert sum(by_window.values()) <= 5  # 6 events, >=1 excluded


def test_correlate_stream_equals_batch(spark, sf_dir):
    """ST-EXT2: the watermarked stream-stream join emits exactly the
    batch interval-join's matched pairs once both streams drain."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        correlate_views_purchases,
    )
    ev = load(spark, sf_dir, "events")
    stream = jobs.correlate_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_corr", "append")
    # roll up the emitted pairs the same way the batch query does
    rolled = (got.groupBy(F.col("p_user").alias("user_id"),
                          "purchase_id", "purchase_value")
              .agg(F.count("*").alias("views_before"),
                   F.date_format(F.max("view_ts"), "yyyy-MM-dd HH:mm:ss")
                    .alias("last_view")))
    want = correlate_views_purchases(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"))
    a = sorted(tuple(r) for r in rolled.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b
    assert len(a) > 0


def test_custom_python_source_stream_equals_batch(spark):
    """The custom Python DataSource's streaming reader, drained with
    AvailableNow over several micro-batches, must produce the batch
    reader's per-shard report exactly — offsets are record-id ranges
    and readBetweenOffsets replays them deterministically (the
    exactly-once contract of an incremental source)."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.pyds import (
        crawl_frame, crawl_stream)

    agg = (crawl_stream(spark, per_batch=137)
           .groupBy("shard")
           .agg(F.count("*").alias("n_recs"),
                F.sum((F.col("status") == 200).cast("bigint"))
                 .alias("n_ok"),
                F.sum("nbytes").alias("total_bytes")))
    # AvailableNow snapshots only the FIRST prefetched offset range of
    # a simple stream reader; processAllAvailable() instead drains
    # micro-batches until the source stops advancing — which this
    # finite source does at its cap
    q = (agg.writeStream.format("memory").queryName("t_crawl_stream")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_crawl_stream")
    batch = (crawl_frame(spark)
             .groupBy("shard")
             .agg(F.count("*").alias("n_recs"),
                  F.sum((F.col("status") == 200).cast("bigint"))
                   .alias("n_ok"),
                  F.sum("nbytes").alias("total_bytes")))
    cols = ["shard", "n_recs", "n_ok", "total_bytes"]
    assert _rows(got, cols) == _rows(batch, cols)


def test_ohlc_stream_equals_batch(spark, sf_dir):
    """The continuous OHLC aggregate must converge to the batch
    candlesticks once the stream drains — including open/close, whose
    min_by/max_by state merges across micro-batches in whatever order
    files arrive (the packed ordering key makes the merge
    order-free)."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        ohlc_rollup,
    )
    batch = ohlc_rollup(load(spark, sf_dir, "events"))
    stream = jobs.ohlc_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_ohlc", "complete")
    cols = ["window_start", "event_type", "open", "high", "low",
            "close", "volume", "n_ticks"]
    assert _rows(got, cols) == _rows(batch, cols)
