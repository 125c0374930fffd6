"""applyInPandasWithState: the custom stateful operator must converge
to the batch answer once the stream drains, and corrupt-input handling
must follow the PERMISSIVE/_corrupt_record contract (SURVEY.md §5.4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.streaming import jobs
from mvp_mini_etl_pipeline_1762911573_spark.streaming.stateful import (
    running_totals_stream,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def test_stateful_running_totals_converge(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 50 == 9)
    stream_src = jobs.events_stream(spark, sf_dir).where(
        F.col("user_id") % 50 == 9)
    got = jobs.run_to_memory(
        running_totals_stream(stream_src), "t_state", "update")
    # update mode emits one row per user per batch — the LAST emission
    # per user is the converged running total
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(
        F.col("events_seen").desc())
    final = (got.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1))
    want = ev.groupBy("user_id").agg(
        F.count("*").alias("events_seen"),
        F.round(F.sum("value"), 2).alias("value_sum"))
    a = sorted(tuple(r) for r in
               final.select("user_id", "events_seen", "value_sum").collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b


def test_corrupt_json_permissive(spark, tmp_path):
    """PERMISSIVE mode replaces the reference's optional-chaining
    guards: bad records land in _corrupt_record and are countable,
    good records parse (SURVEY.md §1.3)."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        'this is not json\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": 3, broken\n'
    )
    df = (spark.read
          .schema("id bigint, name string, _corrupt_record string")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(str(p)))
    df = df.cache()  # corrupt-record counting requires materialization
    try:
        total = df.count()
        bad = df.where(F.col("_corrupt_record").isNotNull()).count()
        good = df.where(F.col("id").isNotNull()).count()
        assert total == 4
        assert bad == 2
        assert good == 2
    finally:
        df.unpersist()


def test_jsonl_quarantine_split(spark, tmp_path):
    """The engine-side quarantine loader: good rows parse clean, bad
    lines are preserved VERBATIM for replay, one file read serves both
    sides, and the caller's schema object is not mutated."""
    from pyspark.sql import types as T

    from mvp_mini_etl_pipeline_1762911573_spark.sources.static_json import (
        read_jsonl_quarantine,
    )

    p = tmp_path / "feed.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        'this is not json\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": 3, broken\n'
    )
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("name", T.StringType())])
    n_fields = len(schema.fields)
    good, quarantine = read_jsonl_quarantine(spark, str(p), schema)
    try:
        assert sorted(tuple(r) for r in good.collect()) == \
            [(1, "ok"), (2, "also ok")]
        assert good.columns == ["id", "name"]
        bad = sorted(r[0] for r in quarantine.collect())
        assert bad == ["this is not json", '{"id": 3, broken']
        assert len(schema.fields) == n_fields
    finally:
        spark.catalog.clearCache()


def test_cdc_state_stream_converges_across_batch_splits(spark, sf_dir,
                                                        tmp_path):
    """The streaming CDC state (last-writer-wins per (user_id, k),
    `stateful.cdc_state_stream`) must converge to the batch ranked-
    window answer when the SAME log arrives split across three
    micro-batches — the max-(ts, event_id) state transition is
    commutative/associative, so the batch split cannot change the
    outcome.  This is the live-ingest half of `cdc_apply` (whose
    oracle checks the batch compaction)."""
    import os

    from mvp_mini_etl_pipeline_1762911573_spark.streaming.stateful import (
        cdc_state_stream,
    )

    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 5 == 2)

    src = tmp_path / "cdc_src"
    src.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq
    # explicit arrow schema: pandas inference on a near-empty chunk
    # degrades object columns, and ns timestamps become TIMESTAMP(NANOS)
    pa_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    cols = [f.name for f in pa_schema]
    for i in range(3):
        part = str(src / f"chunk{i}.parquet")
        pdf = ev.where(F.col("event_id") % 3 == i).toPandas()[cols]
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=pa_schema,
                                 preserve_index=False), part)
        os.utime(part, (1_000_000 + 60 * i, 1_000_000 + 60 * i))

    schema = spark.read.parquet(str(src)).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    got = jobs.run_to_memory(cdc_state_stream(stream), "t_cdc", "update")

    # update mode re-emits a key's state every batch that touches it;
    # the winning (max ts_us, event_id) emission per key is final state
    from pyspark.sql import Window
    w = Window.partitionBy("user_id", "k").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc())
    final = (got.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .select("user_id", "k", "event_id", "is_del", "value"))

    wb = Window.partitionBy("user_id", "k").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    want = (ev.select(
                "user_id",
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                "ts", "event_id",
                (F.col("event_type") == "error").alias("is_del"),
                "value")
            .withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") == 1)
            .select("user_id", "k", "event_id", "is_del", "value"))

    a = sorted(tuple(r) for r in final.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a and a == b
    assert any(r[3] for r in b), "log subset should contain tombstones"


def test_rate_limit_stream_converges_across_batch_splits(spark, sf_dir,
                                                         tmp_path):
    """The streaming rate limiter (`stateful.rate_limit_stream`) must
    converge to the batch RANGE-window answer when the SAME log
    arrives split across three micro-batches in event_id (NOT time)
    order — late earlier-timestamp arrivals retro-correct previously
    emitted counts, and since window counts only grow as events land,
    the MAX emission per event_id is the converged value."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        RATE_LIMIT_N, _events_rate_limit,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.stateful import (
        rate_limit_stream,
    )

    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 5 == 3)

    src = tmp_path / "rl_src"
    src.mkdir()
    pa_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    cols = [f.name for f in pa_schema]
    for i in range(3):
        part = str(src / f"chunk{i}.parquet")
        pdf = ev.where(F.col("event_id") % 3 == i).toPandas()[cols]
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=pa_schema,
                                 preserve_index=False), part)
        os.utime(part, (1_000_000 + 60 * i, 1_000_000 + 60 * i))

    schema = spark.read.parquet(str(src)).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    if dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    got = jobs.run_to_memory(rate_limit_stream(stream), "t_rl", "update")

    final = (got.groupBy("event_id")
             .agg(F.max("n_in_window").alias("n_in_window")))
    # compare the flagged subset against the batch operator run on a
    # matching parquet dir (same filtered log)
    batch_dir = tmp_path / "rl_batch"
    ev.coalesce(1).write.parquet(f"{batch_dir}/events.parquet")
    want = (_events_rate_limit(spark, str(batch_dir))
            .select("event_id", "n_in_window"))
    a = sorted(tuple(r) for r in
               final.where(F.col("n_in_window") > RATE_LIMIT_N).collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a and a == b
