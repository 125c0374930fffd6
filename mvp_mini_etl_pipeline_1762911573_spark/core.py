"""Core pipeline queries: the flagship metrics row, validity counts,
the synthetic fallback source, and the CSV-flatten projection.

Reference parity: src/lib/randomuser.js (extract/transform/metrics),
pages/index.js:107-133 (CSV flatten), src/mock-data/etl.json (metrics
schema).  See SURVEY.md §2.1-2.2, §2.4 A9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .oracles import USERS_CTE
from .plans.pipeline import METRICS_ROW_ORACLE, flagship_metrics_row
from .sources.static_json import (FALLBACK_LOG_ORACLE,
                                  FALLBACK_METRICS_ORACLE, fallback_log,
                                  fallback_metrics)
from .sources.synthetic import SYNTHETIC_USERS_ORACLE, synthetic_users
from .sources.sinks import flatten_for_csv
from .tables import load, users_raw, users_valid


def _synthetic_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthetic_users(spark, 50)


def _csv_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = users_valid(spark, sf_dir)
    return flatten_for_csv(users)


def _validity_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF-DECL P6: rows_in vs valid vs invalid (pages/index.js:55).
    Uses tables.valid_predicate — the same rule users_valid applies —
    so rows_valid always equals the row count feeding rows_out."""
    from .tables import valid_predicate
    raw = (users_raw(spark, sf_dir)
           .withColumn("registered_ts",
                       F.try_to_timestamp("registered_raw"))
           .withColumn("is_valid", valid_predicate()))
    return raw.agg(
        F.count("*").alias("rows_in"),
        F.count(F.when(F.col("is_valid"), 1)).alias("rows_valid"),
        F.count(F.when(~F.col("is_valid"), 1)).alias("rows_invalid"),
    )


def _etl_fallback_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: the pinned fallback-metrics entity (etl.json:3-10 via
    restart.js:12) loaded through the static-JSON engine source."""
    return fallback_metrics(spark)


def _etl_fallback_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4b: the staged run log (etl.json:11-15) parsed to typed cols."""
    return fallback_log(spark)


def _raw_modal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: the raw-payload modal — first 10 users rendered as JSON
    (pages/index.js:262 `users.slice(0, 10)`).  Deterministic order by
    custkey; the JSON rendering is a narrow projection so the limit
    prunes everything else (TakeOrderedAndProject, no full sort)."""
    users = users_valid(spark, sf_dir)
    return (
        users.orderBy("custkey").limit(10)
        .select(
            "custkey",
            F.to_json(
                F.struct("id", "name_first", "name_last", "email",
                         "country", "city"),
                {"ignoreNullFields": "false"},
            ).alias("raw_json"),
        )
    )


def _quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: declarative data-quality audit (dbt-test / Deequ-style) —
    the constraint sweep a training-data pipeline runs before accepting
    a batch: PK null/duplicate checks, referential integrity, value
    ranges, and the known-dirty user feed's defect counts.  One row per
    check, so downstream alerting is a trivial filter(violations > 0).

    Scale shape: one aggregate pass per table (all counts are map-side
    partials — conditional counts share the scan), plus one anti-join
    for referential integrity (plans as a shuffle/broadcast semi join,
    never materializing the dim payload).  The 1-row aggregates
    cross-join into a single row and unpivot to (check, count) — no
    per-check re-scans."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    events = load(spark, sf_dir, "events")
    raw = users_raw(spark, sf_dir)

    cust = customer.agg(
        F.count(F.when(F.col("c_custkey").isNull(), 1))
         .alias("customer_null_pk"),
        (F.count("*") - F.countDistinct("c_custkey"))
         .alias("customer_dup_pk"))
    ordr = orders.agg(
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
         .alias("orders_nonpositive_total"),
        F.count(F.when(F.col("o_custkey").isNull(), 1))
         .alias("orders_null_custkey"))
    orphan = (
        orders.join(customer, orders.o_custkey == customer.c_custkey,
                    "left_anti")
        .agg(F.count("*").alias("orders_orphan_custkey")))
    ev = events.agg(
        F.count(F.when(F.col("ts").isNull(), 1)).alias("events_null_ts"))
    usr = raw.agg(
        F.count(F.when(F.col("email").isNull(), 1))
         .alias("users_null_email"),
        F.count(F.when(F.try_to_timestamp("registered_raw").isNull(), 1))
         .alias("users_bad_date"),
        (F.count("id") - F.countDistinct("id")).alias("users_dup_id"))

    row = (cust.crossJoin(ordr).crossJoin(orphan)
           .crossJoin(ev).crossJoin(usr))
    return row.unpivot(
        [], row.columns, "check_name", "violations")


QUERIES = {
    "quality_audit": _quality_audit,
    "metrics_row": flagship_metrics_row,
    "synthetic_source": _synthetic_source,
    "csv_flatten": _csv_flatten,
    "validity_filter_counts": _validity_filter_counts,
    "etl_fallback_metrics": _etl_fallback_metrics,
    "etl_fallback_log": _etl_fallback_log,
    "raw_modal": _raw_modal,
}

ORACLES = {
    "quality_audit": USERS_CTE + """
SELECT 'customer_null_pk' AS check_name,
       CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT) AS violations
FROM customer
UNION ALL
SELECT 'customer_dup_pk',
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer
UNION ALL
SELECT 'orders_nonpositive_total',
       CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_null_custkey',
       CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_custkey IS NULL
UNION ALL
SELECT 'events_null_ts',
       CAST(count(*) FILTER (ts IS NULL) AS BIGINT) FROM events
UNION ALL
SELECT 'users_null_email',
       CAST(count(*) FILTER (email IS NULL) AS BIGINT) FROM users_raw
UNION ALL
SELECT 'users_bad_date',
       CAST(count(*) FILTER (try_cast(registered_raw AS TIMESTAMP)
                             IS NULL) AS BIGINT) FROM users_raw
UNION ALL
SELECT 'users_dup_id',
       CAST(count(id) - count(DISTINCT id) AS BIGINT) FROM users_raw
""",
    "metrics_row": USERS_CTE + METRICS_ROW_ORACLE,
    "synthetic_source": SYNTHETIC_USERS_ORACLE,
    "csv_flatten": USERS_CTE + """
SELECT
  coalesce(id, '') AS id,
  coalesce(name_first, '') AS name_first,
  coalesce(name_last, '') AS name_last,
  coalesce(email, '') AS email,
  coalesce(phone, '') AS phone,
  coalesce(country, '') AS country,
  coalesce(city, '') AS city,
  coalesce(strftime(registered_ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z', '')
    AS registered_date
FROM users_valid
""",
    "validity_filter_counts": USERS_CTE + """
SELECT
  count(*) AS rows_in,
  count(CASE WHEN email IS NOT NULL AND id IS NOT NULL
              AND try_cast(registered_raw AS TIMESTAMP) IS NOT NULL
        THEN 1 END) AS rows_valid,
  count(CASE WHEN NOT (email IS NOT NULL AND id IS NOT NULL
              AND try_cast(registered_raw AS TIMESTAMP) IS NOT NULL)
        THEN 1 END) AS rows_invalid
FROM users_raw
""",
    "etl_fallback_metrics": FALLBACK_METRICS_ORACLE,
    "etl_fallback_log": FALLBACK_LOG_ORACLE,
    "raw_modal": USERS_CTE + """
SELECT custkey,
       to_json(struct_pack(
         id := id, name_first := name_first, name_last := name_last,
         email := email, country := country, city := city)) AS raw_json
FROM users_valid
ORDER BY custkey
LIMIT 10
""",
}
