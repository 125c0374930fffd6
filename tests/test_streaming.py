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
