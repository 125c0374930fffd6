"""Static JSON file source (reference S4).

The reference ships `src/mock-data/etl.json` — a pinned
{pipeline, metrics, logs} document imported by both the restart API
(`pages/api/etl/restart.js:1,12`: fallback metrics when the extract
returns zero users) and the dashboard (`pages/index.js:3,30`).  This
module is the engine-side loader: `spark.read.json` with an explicit
schema (never schema inference on a production path), plus relational
projections of the two entities the reference consumes:

* metrics — the 1-row dashboard metrics record (etl.json:3-10), with
  the reference's `lastUser` camelCase normalized to the engine's
  `last_user`.
* logs — the staged run log (etl.json:11-15).  The reference stores
  log lines as pre-rendered `"<ts> | <Stage> | <message>"` strings; we
  parse them back into typed columns (posexplode keeps the stage
  order) so they join/filter like any other table.

A mirror of the reference document is vendored at
`resources/etl_fallback.json` (data contract, cited above) so the repo
is standalone.  Scale note: this is a driver-tiny config read — the
pattern (explicit schema + multiLine) is what matters; a 100 TB JSON
dataset would use the same reader with multiLine=false line-delimited
shards.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "etl_fallback.json")

ETL_JSON_SCHEMA = T.StructType([
    T.StructField("pipeline", T.ArrayType(T.StringType())),
    T.StructField("metrics", T.StructType([
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("dedup_removed", T.LongType()),
        T.StructField("countries", T.LongType()),
        T.StructField("duration_sec", T.LongType()),
        T.StructField("lastUser", T.StringType()),
    ])),
    T.StructField("logs", T.ArrayType(T.StringType())),
])


def read_etl_json(spark: SparkSession, path: str | None = None) -> DataFrame:
    """Raw document read: one row per JSON document (multiLine — the
    file is a single pretty-printed object, not JSON-lines)."""
    return (spark.read.schema(ETL_JSON_SCHEMA)
            .option("multiLine", True).json(path or DEFAULT_PATH))


def fallback_metrics(spark: SparkSession,
                     path: str | None = None) -> DataFrame:
    """The reference's `etlFallback.metrics` entity (restart.js:12) as a
    1-row DataFrame in engine column naming."""
    return read_etl_json(spark, path).select(
        F.col("metrics.rows_in").alias("rows_in"),
        F.col("metrics.rows_out").alias("rows_out"),
        F.col("metrics.dedup_removed").alias("dedup_removed"),
        F.col("metrics.countries").alias("countries"),
        F.col("metrics.duration_sec").alias("duration_sec"),
        F.col("metrics.lastUser").alias("last_user"),
    )


def fallback_log(spark: SparkSession, path: str | None = None) -> DataFrame:
    """The staged log (etl.json:11-15) parsed from the reference's
    `"<ts> | <Stage> | <message>"` render back into typed columns."""
    lines = read_etl_json(spark, path).select(
        F.posexplode("logs").alias("seq", "line"))
    parts = F.split(F.col("line"), r" \| ")
    return lines.select(
        F.col("seq").cast("int").alias("seq"),
        F.element_at(parts, 1).alias("ts"),
        F.element_at(parts, 2).alias("stage"),
        F.element_at(parts, 3).alias("message"),
    )


def read_jsonl_quarantine(spark: SparkSession, path: str,
                          schema: T.StructType):
    """S2 at scale: line-delimited JSON ingestion with a QUARANTINE
    split — the production replacement for the reference's per-field
    optional chaining (pages/index.js:36-57).  PERMISSIVE parse routes
    unparseable lines to _corrupt_record; returns (good, quarantine)
    as two lazy views of ONE cached parse (corrupt-record bookkeeping
    requires materialization — Spark documents this; the cache also
    means the file is read once, not twice).  At 100 TB the quarantine
    side is written next to the table and replayed after the upstream
    fix — bad rows are data, not exceptions."""
    # copy, don't schema.add(): StructType.add mutates the receiver
    full = T.StructType(list(schema.fields)
                        + [T.StructField("_corrupt_record", T.StringType())])
    # the cache is deliberate (good + quarantine share one parse) but
    # session-lifetime: a long-lived caller looping over batch files
    # should unpersist after consuming both views —
    # good.sparkSession.catalog.clearCache() or keep its own handle —
    # or the pinned parses accumulate in storage memory
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)
          .cache())
    good = (df.where(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record"))
    quarantine = (df.where(F.col("_corrupt_record").isNotNull())
                  .select("_corrupt_record"))
    return good, quarantine


FALLBACK_METRICS_ORACLE = f"""
SELECT metrics.rows_in AS rows_in,
       metrics.rows_out AS rows_out,
       metrics.dedup_removed AS dedup_removed,
       metrics.countries AS countries,
       metrics.duration_sec AS duration_sec,
       metrics.lastUser AS last_user
FROM read_json_auto('{DEFAULT_PATH}')
"""

FALLBACK_LOG_ORACLE = f"""
SELECT CAST(i - 1 AS INTEGER) AS seq,
       split_part(logs[i], ' | ', 1) AS ts,
       split_part(logs[i], ' | ', 2) AS stage,
       split_part(logs[i], ' | ', 3) AS message
FROM read_json_auto('{DEFAULT_PATH}'),
     LATERAL (SELECT unnest(range(1, len(logs) + 1)) AS i)
"""
