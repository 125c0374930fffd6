"""Synthetic fallback source (reference S3, src/lib/randomuser.js:3-28).

The reference generates 50 mock users on any extract error: mod-based
gender/country/city, day-spaced registration dates, `Math.random` ids.
Spark-first this is `spark.range(n)` + pure column expressions — fully
distributed, no driver loop, and (unlike the reference) deterministic:
the random id becomes `md5(seed || index)` and "now" is pinned.

Scale note: `spark.range` partitions the index space; generating 10^12
mock rows is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Pinned "now" (the reference uses Date.now(), randomuser.js:9).
BASE_DATE = "2026-01-01"
COUNTRIES = ["USA", "Canada", "Germany"]          # index % 3 (randomuser.js:6)
CITIES = ["Springfield", "Rivertown"]             # index % 2 (randomuser.js:7)
GENDERS = ["male", "female"]                      # index % 2 (randomuser.js:5)


def synthetic_users(spark: SparkSession, n: int = 50) -> DataFrame:
    i = F.col("id")
    first = F.concat(F.lit("User"), i.cast("string"))
    last = F.concat(F.lit("Mock"), (i % 7).cast("string"))
    reg_date = F.date_sub(F.to_date(F.lit(BASE_DATE)), i.cast("int"))
    return spark.range(n).select(
        i.cast("bigint").alias("idx"),
        # deterministic stand-in for Math.random().toString(36) ids
        F.substring(F.md5(F.concat(F.lit("mock-"), i.cast("string"))), 1, 9)
        .alias("mock_id"),
        F.element_at(F.array(*[F.lit(g) for g in GENDERS]),
                     (i % 2 + 1).cast("int")).alias("gender"),
        first.alias("name_first"),
        last.alias("name_last"),
        F.concat(F.lower(first), F.lit("."), F.lower(last),
                 F.lit("@example.com")).alias("email"),
        F.lpad((i % 100).cast("string"), 2, "0").alias("phone"),
        F.element_at(F.array(*[F.lit(c) for c in COUNTRIES]),
                     (i % 3 + 1).cast("int")).alias("country"),
        F.element_at(F.array(*[F.lit(c) for c in CITIES]),
                     (i % 2 + 1).cast("int")).alias("city"),
        F.concat(reg_date.cast("string"), F.lit("T00:00:00.000Z"))
        .alias("registered_date"),
    )


SYNTHETIC_USERS_ORACLE = f"""
SELECT
  CAST(i AS BIGINT) AS idx,
  substr(md5('mock-' || CAST(i AS VARCHAR)), 1, 9) AS mock_id,
  CASE WHEN i % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
  'User' || CAST(i AS VARCHAR) AS name_first,
  'Mock' || CAST(i % 7 AS VARCHAR) AS name_last,
  lower('User' || CAST(i AS VARCHAR)) || '.' ||
    lower('Mock' || CAST(i % 7 AS VARCHAR)) || '@example.com' AS email,
  lpad(CAST(i % 100 AS VARCHAR), 2, '0') AS phone,
  CASE i % 3 WHEN 0 THEN 'USA' WHEN 1 THEN 'Canada' ELSE 'Germany' END
    AS country,
  CASE WHEN i % 2 = 0 THEN 'Springfield' ELSE 'Rivertown' END AS city,
  strftime(DATE '{BASE_DATE}' - CAST(i AS INTEGER), '%Y-%m-%d')
    || 'T00:00:00.000Z' AS registered_date
FROM generate_series(0, 49) t(i)
"""
