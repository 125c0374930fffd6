"""ETL pipeline invariants (SURVEY.md §5.2-§5.4): golden metric
relationships, dedup idempotence, CSV round-trip with the reference's
quoting semantics (pages/index.js:446-450), failure-path fallback."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import run_pipeline
from mvp_mini_etl_pipeline_1762911573_spark.sources.sinks import (
    flatten_for_csv, write_users_csv,
)
from mvp_mini_etl_pipeline_1762911573_spark.sources.synthetic import (
    synthetic_users,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import (
    users_clean, users_raw, users_valid,
)


def test_metrics_invariants(spark, sf_dir):
    """The reference's mock metrics encode rows_in - rows_out ==
    dedup_removed + invalid (etl.json:3-5) — ours must actually
    satisfy it."""
    out = run_pipeline(spark, sf_dir)
    m = out["metrics"]
    assert m["rows_in"] > m["rows_out"] > 0
    assert m["dedup_removed"] > 0
    assert 0 < m["countries"] <= 25
    assert m["cities"] <= 3 * 25
    assert m["rows_in"] - m["rows_out"] >= m["dedup_removed"]
    assert len(out["log"]) == 3  # extract, transform, load
    assert [e["stage"] for e in out["log"]] == \
        ["extract", "transform", "load"]


def test_run_pipeline_csv_sink(spark, sf_dir, tmp_path):
    """E3 end-to-end: the Load stage writes the reference-format CSV;
    read-back row count equals rows_out."""
    out = str(tmp_path / "users_out")
    res = run_pipeline(spark, sf_dir, csv_out=out)
    back = (spark.read.option("header", True)
            .option("escape", '"').csv(out))
    assert back.count() == res["metrics"]["rows_out"]
    assert sorted(back.columns) == sorted(
        ["id", "name_first", "name_last", "email", "phone",
         "country", "city", "registered_date"])


def test_dedup_idempotent(spark, sf_dir):
    clean = users_clean(spark, sf_dir)
    again = clean.dropDuplicates(["id"])
    assert clean.count() == again.count()


def test_union_count_additivity(spark, sf_dir):
    raw = users_raw(spark, sf_dir)
    synth = synthetic_users(spark, 50)
    assert raw.count() + 50 == \
        raw.select("id").unionAll(synth.select("mock_id")).count()


def test_countries_bounded_by_rows(spark, sf_dir):
    clean = users_clean(spark, sf_dir)
    agg = clean.agg(
        F.countDistinct("country").alias("c"),
        F.count("*").alias("n")).first()
    assert agg["c"] <= agg["n"]


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    """Write → read preserves values, including '"'-escaping and the
    ISO timestamp format (reference CSV semantics)."""
    users = users_clean(spark, sf_dir).limit(100)
    flat = flatten_for_csv(users).withColumn(
        "city", F.concat(F.lit('quo"ted '), F.col("city")))
    path = str(tmp_path / "users_csv")
    write_users_csv(flat, path)
    back = (spark.read.option("header", True)
            .option("escape", '"')
            .csv(path))
    assert sorted(back.columns) == sorted(flat.columns)
    a = sorted(tuple(r) for r in flat.collect())
    b = sorted(tuple(r) for r in back.fillna("").collect())
    assert a == b


def test_flagship_on_empty_input(spark, sf_dir, tmp_path):
    """Reference parity: a run over no data yields one zeroed metrics
    row, not a crash (pages/index.js:293-311 catch-all)."""
    import pyspark.sql.functions as F  # noqa: F811
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    for t in ["customer", "nation", "region", "orders"]:
        load(spark, sf_dir, t).limit(0).write.mode("overwrite") \
            .parquet(f"{tmp_path}/{t}.parquet")
    from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import (
        flagship_metrics_row,
    )
    row = flagship_metrics_row(spark, str(tmp_path)).first().asDict()
    assert row["rows_in"] in (0, None)
    assert row["rows_out"] == 0
    assert row["countries"] == 0
    assert row["last_user"] is None


def test_fallback_on_bad_source(spark):
    """Failure path (randomuser.js:59-62): a failing extract yields the
    50-row synthetic frame."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.http_json import (
        load_users_http,
    )
    df, prov = load_users_http(spark, "http://127.0.0.1:1/nope", timeout=1)
    assert prov["fallbackUsed"]
    assert df.count() == 50


def test_fallback_schema_matches_live_transform(spark):
    """ADVICE r1: the fallback branch must produce EXACTLY the live
    transform's schema (randomuser.js fallbackUsers feeds the same
    mapping) — no extra idx/gender, thumbnail present."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.http_json import (
        RAW_USER_SCHEMA, transform_raw_users,
    )
    live_cols = transform_raw_users(
        spark.createDataFrame([], schema=RAW_USER_SCHEMA)).columns
    assert synthetic_users(spark, 5).columns == live_cols


def test_run_pipeline_empty_source_uses_fallback_metrics(spark, sf_dir):
    """restart.js:11-12: zero extracted users -> the pinned etl.json
    fallback metrics, not a crash."""
    empty = lambda s, d: users_raw(s, d).where(F.lit(False))  # noqa: E731
    out = run_pipeline(spark, sf_dir, source=empty)
    assert out["fallback_metrics_used"]
    m = out["metrics"]
    assert (m["rows_in"], m["rows_out"], m["dedup_removed"]) == \
        (1240, 1210, 30)
    assert m["last_user"] == "N/A"
    assert out["log"][-1]["stage"] == "fallback"


def test_run_pipeline_error_returns_zeroed_metrics(spark, sf_dir):
    """pages/index.js:293-311: any pipeline error -> zeroed metrics row,
    never a propagated exception."""
    def boom(s, d):
        raise RuntimeError("extract exploded")
    out = run_pipeline(spark, sf_dir, source=boom)
    assert out["fallback_metrics_used"]
    assert out["error"] == "extract exploded"
    m = out["metrics"]
    assert m["rows_in"] == 0 and m["rows_out"] == 0
    assert m["last_user"] == "N/A"
    assert out["log"][-1]["stage"] == "error"


def test_static_json_source_roundtrip(spark, tmp_path):
    """S4: the static-JSON loader reads any file with the etl.json
    shape — explicit schema, multiLine."""
    import json
    from mvp_mini_etl_pipeline_1762911573_spark.sources.static_json import (
        fallback_log, fallback_metrics,
    )
    doc = {"pipeline": ["extract"],
           "metrics": {"rows_in": 7, "rows_out": 6, "dedup_removed": 1,
                       "countries": 2, "duration_sec": 3,
                       "lastUser": "Zed"},
           "logs": ["2025-01-01T00:00:00Z | Extract | seven rows"]}
    p = str(tmp_path / "etl.json")
    with open(p, "w") as f:
        json.dump(doc, f, indent=2)
    m = fallback_metrics(spark, p).first().asDict()
    assert m == {"rows_in": 7, "rows_out": 6, "dedup_removed": 1,
                 "countries": 2, "duration_sec": 3, "last_user": "Zed"}
    log = fallback_log(spark, p).collect()
    assert len(log) == 1
    assert (log[0]["seq"], log[0]["stage"]) == (0, "Extract")
    assert log[0]["message"] == "seven rows"


def test_warm_users_cache_pins_both_entity_tiers(spark, sf_dir):
    """The bench perf claim's mechanism: after warm_users_cache, BOTH
    users_base and users_clean resolve to checkpointed scans (no
    joins, no distinct re-run), and the clean tier returns the exact
    rows of the cold derivation.  Cold consumers (correctness sweeps,
    which never warm) still get the full derivation."""
    from mvp_mini_etl_pipeline_1762911573_spark import tables as T

    saved_base = dict(T._USERS_CACHE)
    saved_clean = dict(T._USERS_CLEAN_CACHE)
    try:
        T.clear_users_cache()
        cold = T.users_clean(spark, sf_dir)
        assert "Scan ExistingRDD" not in \
            cold._jdf.queryExecution().executedPlan().toString()
        cold_rows = sorted(map(tuple, cold.collect()))

        T.warm_users_cache(spark, sf_dir)
        warm = T.users_clean(spark, sf_dir)
        plan = warm._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan       # serves the checkpoint
        assert "HashAggregate" not in plan      # distinct NOT re-run
        assert sorted(map(tuple, warm.collect())) == cold_rows
    finally:
        T.clear_users_cache()
        T._USERS_CACHE.update(saved_base)
        T._USERS_CLEAN_CACHE.update(saved_clean)


def test_warm_edges_cache_pins_the_candidate_edge_table(spark, sf_dir):
    """Symmetric to the users-entity test: after warm_edges_cache the
    SemDeDup family's shared candidate-edge input resolves to the
    checkpointed scan with rows identical to the cold derivation;
    a NON-default threshold always bypasses the cache (different edge
    set)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators import dedup
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _CENT_CACHE,
    )

    saved = dict(_CENT_CACHE)
    try:
        _CENT_CACHE.clear()
        cold = dedup._embedding_pair_edges(spark, sf_dir)
        cold_rows = sorted(map(tuple, cold.collect()))

        dedup.warm_edges_cache(spark, sf_dir)
        warm = dedup._embedding_pair_edges(spark, sf_dir)
        assert "Scan ExistingRDD" in \
            warm._jdf.queryExecution().executedPlan().toString()
        assert sorted(map(tuple, warm.collect())) == cold_rows

        custom = dedup._embedding_pair_edges(spark, sf_dir,
                                             threshold=0.99)
        assert "Scan ExistingRDD" not in \
            custom._jdf.queryExecution().executedPlan().toString()
    finally:
        _CENT_CACHE.clear()
        _CENT_CACHE.update(saved)
