"""The ETL pipeline: Extract -> Transform -> Load, Spark-first.

Mirrors the reference lifecycle (SURVEY.md §3): one lazy DataFrame DAG
(source -> validate -> dedup -> canonical users) with the dashboard
metrics derived from the same DAG.  Where the reference fakes stage
liveness with UI timers (pages/index.js:63-80), we take real per-stage
row counts from ``df.observe`` and real wall-clock from the driver.

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

from ..tables import CURRENT_YEAR, users_clean, users_raw, users_valid


def flagship_metrics_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two aggregate branches only (keeps the stage count low): the raw
    # side counts rows_in/rows_valid in one pass; the clean side computes
    # everything else in ONE agg (count + 2 countDistinct + avg + max_by
    # with a (ts, custkey) struct tie-break for determinism).
    raw = users_raw(spark, sf_dir).withColumn(
        "is_valid",
        F.col("email").isNotNull()
        & F.try_to_timestamp("registered_raw").isNotNull(),
    )
    raw_agg = raw.agg(
        F.count("*").alias("rows_in"),
        F.count(F.when(F.col("is_valid"), 1)).alias("rows_valid"),
    )

    clean_agg = users_clean(spark, sf_dir).agg(
        F.count("*").alias("rows_out"),
        F.countDistinct("country").alias("countries"),
        F.countDistinct("city").alias("cities"),
        F.round(
            F.avg(F.lit(CURRENT_YEAR) - F.year("registered_ts")), 2
        ).alias("avg_registration_years"),
        F.max_by(F.concat_ws(" ", "name_first", "name_last"),
                 F.struct("registered_ts", "custkey")).alias("last_user"),
    )

    return raw_agg.crossJoin(clean_agg).select(
        "rows_in",
        "rows_out",
        (F.col("rows_valid") - F.col("rows_out")).alias("dedup_removed"),
        "countries",
        "cities",
        "avg_registration_years",
        "last_user",
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


def run_pipeline(spark: SparkSession, sf_dir: str,
                 csv_out: str | None = None) -> dict:
    """Run the full ETL with real per-stage observability.

    Returns the canonical unified metrics (SURVEY.md §1.2 decision) plus
    a per-stage run log — the honest version of the reference's
    timer-faked log lines (pages/index.js:49-81, etl.json:11-15).
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

    raw = users_raw(spark, sf_dir)
    observed = raw.observe("extract", F.count(F.lit(1)).alias("rows_in"))
    rows_in = observed.count()
    stage("extract", rows_in)

    clean = users_clean(spark, sf_dir)
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
    valid_cnt = users_valid(spark, sf_dir).count()

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
    return {"metrics": metrics, "log": log}
