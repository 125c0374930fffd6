"""Sink + storage-layout tests: JSON API payload (reference S6),
partitioned parquet writes (the 100 TB layout), bucketed tables
(shuffle-free co-located joins)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.sources.sinks import (
    to_json_payload,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import load, users_clean


def test_json_payload_shape(spark, sf_dir):
    users = users_clean(spark, sf_dir)
    payload = to_json_payload(
        users, metrics={"rows_out": users.count()},
        source_url="https://example.com/api", fallback_used=False,
        fetched_at="2026-01-01T00:00:00Z", limit=10)
    assert set(payload) == {"users", "metrics", "fallbackUsed",
                            "sourceUrl", "fetchedAt"}
    assert len(payload["users"]) == 10
    assert payload["metrics"]["rows_out"] > 0
    assert payload["fallbackUsed"] is False


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Write events partitioned by event_type; a type-filtered read
    must prune to one partition directory (PartitionFilters, not a
    full scan) — the layout that makes 100 TB date/type scans cheap."""
    ev = load(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    exp = ev.where(F.col("event_type") == "click").count()
    assert back.count() == exp


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucket both sides on the join key -> sort-merge join with NO
    Exchange on either side (pre-shuffled storage, the classic
    co-location win for repeated 100 TB joins)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    (orders.write.mode("overwrite")
     .bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("orders_b"))
    (customer.write.mode("overwrite")
     .bucketBy(8, "c_custkey").sortBy("c_custkey")
     .saveAsTable("customer_b"))
    try:
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ob.join(cb, ob.o_custkey == cb.c_custkey)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                j.explain()
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert j.count() == orders.join(
                customer, orders.o_custkey == customer.c_custkey).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(32 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_dynamic_partition_overwrite_and_pruning(spark, sf_dir, tmp_path):
    """The 100-TB incremental-write pattern: a partitioned table where
    a rerun overwrites ONLY the partitions it produces, and readers
    prune the scan by partition column."""
    import contextlib
    import io

    from mvp_mini_etl_pipeline_1762911573_spark.sources.sinks import (
        write_partitioned,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import users_clean

    path = str(tmp_path / "users_by_region")
    users = users_clean(spark, sf_dir).select(
        "custkey", "id", "country", "region", "acctbal")
    write_partitioned(users, path, ["region"])
    full = spark.read.parquet(path)
    n_total = full.count()
    regions = [r["region"] for r in full.select("region").distinct().collect()]
    assert len(regions) >= 2

    # rewrite ONE region with a sentinel value; other partitions must
    # survive untouched (dynamic overwrite), and totals must hold
    target = sorted(regions)[0]
    patched = (users.where(F.col("region") == target)
               .withColumn("acctbal", F.lit(0.0)))
    write_partitioned(patched, path, ["region"])
    back = spark.read.parquet(path)
    assert back.count() == n_total
    assert back.where(F.col("region") == target) \
               .where(F.col("acctbal") != 0.0).count() == 0
    assert back.where(F.col("region") != target).count() == \
        users.where(F.col("region") != target).count()

    # read-side partition pruning: a region filter must reach the scan
    # as a PartitionFilter, not a post-scan Filter over all partitions
    q = back.where(F.col("region") == target).select("custkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert f"region#" in plan

    # static mode is the whole-table replace: only the written
    # partition remains
    write_partitioned(patched, path, ["region"], dynamic=False)
    assert [r["region"] for r in
            spark.read.parquet(path).select("region").distinct().collect()] \
        == [target]


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP — the optimization that makes star-schema joins over
    partitioned 100-TB facts viable: when the fact is partitioned on
    the join key and the dim side carries the selective filter, the
    fact scan must be pruned AT RUNTIME by a dynamicpruning subquery
    fed from the dim broadcast — not scan every partition and filter
    after the join."""
    out = str(tmp_path / "ev_by_type")
    ev = load(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    fact = spark.read.parquet(out)
    # the dim must be a FILE relation: a VALUES LocalRelation gets its
    # filter constant-folded away before the PartitionPruning rule
    # looks for a selective predicate, so DPP would (correctly) not
    # fire — exactly as on a real cluster, where dims are tables
    dim_path = str(tmp_path / "dim_team")
    spark.sql("""
        SELECT * FROM VALUES ('purchase', 'revenue'), ('signup', 'growth'),
                             ('error', 'ops'), ('view', 'traffic'),
                             ('click', 'traffic')
        AS dim(event_type, team)
    """).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)
    joined = (fact.join(F.broadcast(dim), "event_type")
              .where(F.col("team") == "revenue")
              .groupBy("event_type").agg(F.count("*").alias("n")))
    plan = joined._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower(), plan[:4000]
    # and the answer is right: only purchase events survive
    got = joined.collect()
    want = ev.where("event_type = 'purchase'").count()
    assert [(r.event_type, r.n) for r in got] == [("purchase", want)]


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    """Schema drift — at 100 TB a table accretes columns over months of
    writers.  Old files must stay readable next to new ones: mergeSchema
    unions the file schemas, old rows surface NULL for columns they
    predate, and filters on the new column still push to the scan."""
    out = str(tmp_path / "evolving")
    ev = load(spark, sf_dir, "events")
    # epoch 1: original schema
    ev.select("event_id", "event_type", "value") \
      .write.mode("append").parquet(out)
    # epoch 2: a writer adds a quality-score column
    ev.select("event_id", "event_type", "value",
              F.round(F.col("value") / 100.0, 4).alias("score")) \
      .write.mode("append").parquet(out)

    back = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(back.columns) == {"event_id", "event_type", "value", "score"}
    n = ev.count()
    assert back.count() == 2 * n
    # epoch-1 rows carry NULL scores; epoch-2 rows all have one
    assert back.where(F.col("score").isNull()).count() == n
    # predicates on the late-added column still reach the scan
    plan = (back.where(F.col("score") > 0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(score), GreaterThan(score,0.5)]" in plan


def test_compaction_rewrites_small_files(spark, sf_dir, tmp_path):
    """Small-file compaction: a fragmented table (200 files) collapses
    to the target layout with identical contents, and the table stays
    readable at the same path (staging + swap, no in-place clobber)."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.sinks import (
        compact_parquet,
    )

    out = str(tmp_path / "fragmented")
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    ev.repartition(200).write.parquet(out)  # simulate drip ingestion
    import glob
    assert len(glob.glob(f"{out}/*.parquet")) == 200

    before = ev.agg(F.count("*"), F.round(F.sum("value"), 2)).first()
    n_rows = before[0]
    n_files = compact_parquet(spark, out, target_rows_per_file=500)
    assert n_files == -(-n_rows // 500)
    assert len(glob.glob(f"{out}/*.parquet")) == n_files
    after = (spark.read.parquet(out)
             .agg(F.count("*"), F.round(F.sum("value"), 2)).first())
    assert tuple(after) == tuple(before)
    assert not glob.glob(f"{out}_next") and not glob.glob(f"{out}_prev")


def test_zorder_write_tightens_footer_stats_on_both_columns(
        spark, sf_dir, tmp_path):
    """M-EXT z-order layout: per-file parquet min/max spans must shrink
    on BOTH clustered columns vs a round-robin write of the same data
    (round-robin files see ~the full range of every column, so any
    filter scans every file; the z-ordered files carry tight (a, b)
    bounding boxes)."""
    import duckdb

    from mvp_mini_etl_pipeline_1762911573_spark.sources.sinks import (
        zorder_write,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    ev.repartition(16).write.parquet(plain)
    # 16 files = 4 leading z-bits = a 4x4 grid: both dims split 4x
    # (8 files would split one dim 4x but the other only 2x)
    zorder_write(ev, zed, "user_id", "value", n_files=16)

    back = spark.read.parquet(zed)
    assert back.count() == ev.count()

    con = duckdb.connect()

    def mean_span(path, col):
        q = f"""
            SELECT avg(CAST(stats_max_value AS DOUBLE)
                       - CAST(stats_min_value AS DOUBLE))
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'
        """
        return con.execute(q).fetchone()[0]

    for col in ("user_id", "value"):
        plain_span = mean_span(plain, col)
        z_span = mean_span(zed, col)
        # each z-file should cover well under half the per-column
        # range a round-robin file covers
        assert z_span < 0.5 * plain_span, (
            f"{col}: z-span {z_span} vs plain {plain_span}")


def test_python_datasource_parallelism_contract(spark):
    """The custom Python DataSource must fan out one input split per
    shard (executor-side parallel generation — the property that
    separates a DataSource from a driver-side createDataFrame shim)
    and the per-shard record layout must be the pure id function the
    oracle regenerates."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.pyds import (
        crawl_frame, _crawl_record)

    df = crawl_frame(spark, shards=3, per_shard=5)
    assert df.rdd.getNumPartitions() == 3
    got = sorted(map(tuple, df.collect()))
    want = sorted(_crawl_record(s, r, 5)
                  for s in range(3) for r in range(5))
    assert got == want


def test_incremental_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    """IVM invariant: folding batches incrementally equals aggregating
    the concatenation from scratch — at every prefix, and under a
    shuffled batch order (the states are a commutative monoid or this
    breaks)."""
    from mvp_mini_etl_pipeline_1762911573_spark.plans import incremental
    docs = load(spark, sf_dir, "documents")
    batches = [docs.where(F.col("doc_id") % 3 == k) for k in (2, 0, 1)]
    state_path = str(tmp_path / "state")

    seen = None
    for k, b in enumerate(batches):
        got = incremental.refresh(spark, state_path, b)
        seen = b if seen is None else seen.unionByName(b)
        want = incremental.batch_state(seen)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect())), f"prefix {k}"

    # durable: a fresh read of the committed table matches, and the
    # derived report exposes avg without having stored it
    final = spark.read.parquet(state_path)
    rep = incremental.report(final)
    assert "avg_chars" in rep.columns
    assert final.count() == rep.count() > 0


def test_incremental_refresh_survives_torn_staging(spark, sf_dir, tmp_path):
    """A leftover .staging dir from a crashed refresh must not corrupt
    the next commit (the atomic-rename protocol overwrites it)."""
    from mvp_mini_etl_pipeline_1762911573_spark.plans import incremental
    docs = load(spark, sf_dir, "documents")
    state_path = str(tmp_path / "state")
    incremental.refresh(spark, state_path, docs.where(F.col("doc_id") < 100))
    # simulate a torn refresh: stale junk in the staging location
    staging = state_path + ".staging"
    import os
    os.makedirs(staging, exist_ok=True)
    open(os.path.join(staging, "garbage"), "w").write("torn")
    got = incremental.refresh(spark, state_path,
                              docs.where(F.col("doc_id") >= 100))
    want = incremental.batch_state(docs)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
