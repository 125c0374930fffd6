"""Synthetic fallback source (reference S3, src/lib/randomuser.js:3-28).

The reference generates 50 mock users on any extract error
(`generateMockUser`, randomuser.js:3-20): John{i}/Jane{i} Doe{i} names,
USA/Canada/Mexico by index%3, New York/Los Angeles by index%2,
`555-0101-NN` phones, day-spaced registration dates, a portraits
thumbnail URL, and a `mock-id-{i}-{random}` id.  Spark-first this is
`spark.range(n)` + pure column expressions — fully distributed, no
driver loop — and (unlike the reference) deterministic: the
`Math.random().toString(36).substr(2,9)` suffix becomes
`substr(md5('mock-'||i),1,9)` and "now" is pinned to BASE_DATE.

The output schema is EXACTLY `transform_raw_users`'s schema
(mock_id .. thumbnail), matching the reference where `fallbackUsers()`
feeds the same downstream mapping as the live fetch (randomuser.js:59-62)
— so fallback and live branches union/flatten/export identically.

Scale note: `spark.range` partitions the index space; generating 10^12
mock rows is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Pinned "now" (the reference uses Date.now(), randomuser.js:9).
BASE_DATE = "2026-01-01"


def synthetic_users(spark: SparkSession, n: int = 50) -> DataFrame:
    i = F.col("id")
    gender = F.when(i % 2 == 0, F.lit("male")).otherwise(F.lit("female"))
    first = F.concat(F.when(i % 2 == 0, F.lit("John")).otherwise(F.lit("Jane")),
                     i.cast("string"))
    last = F.concat(F.lit("Doe"), i.cast("string"))
    reg_date = F.date_sub(F.to_date(F.lit(BASE_DATE)), i.cast("int"))
    return spark.range(n).select(
        # deterministic stand-in for `mock-id-{i}-{Math.random 9 chars}`
        F.concat(F.lit("mock-id-"), i.cast("string"), F.lit("-"),
                 F.substring(F.md5(F.concat(F.lit("mock-"), i.cast("string"))),
                             1, 9)).alias("mock_id"),
        first.alias("name_first"),
        last.alias("name_last"),
        F.concat(F.lower(first), F.lit("."), F.lower(last),
                 F.lit("@example.com")).alias("email"),
        F.concat(F.lit("555-0101-"),
                 F.lpad((i % 100).cast("string"), 2, "0")).alias("phone"),
        F.when(i % 3 == 0, F.lit("USA"))
         .when(i % 3 == 1, F.lit("Canada"))
         .otherwise(F.lit("Mexico")).alias("country"),
        F.when(i % 2 == 0, F.lit("New York"))
         .otherwise(F.lit("Los Angeles")).alias("city"),
        F.concat(reg_date.cast("string"), F.lit("T00:00:00.000Z"))
        .alias("registered_date"),
        F.concat(F.lit("https://randomuser.me/api/portraits/"), gender,
                 F.lit("/"), i.cast("string"), F.lit(".jpg"))
        .alias("thumbnail"),
    )


SYNTHETIC_USERS_ORACLE = f"""
SELECT
  'mock-id-' || CAST(i AS VARCHAR) || '-'
    || substr(md5('mock-' || CAST(i AS VARCHAR)), 1, 9) AS mock_id,
  (CASE WHEN i % 2 = 0 THEN 'John' ELSE 'Jane' END)
    || CAST(i AS VARCHAR) AS name_first,
  'Doe' || CAST(i AS VARCHAR) AS name_last,
  lower((CASE WHEN i % 2 = 0 THEN 'John' ELSE 'Jane' END)
        || CAST(i AS VARCHAR)) || '.' ||
    lower('Doe' || CAST(i AS VARCHAR)) || '@example.com' AS email,
  '555-0101-' || lpad(CAST(i % 100 AS VARCHAR), 2, '0') AS phone,
  CASE i % 3 WHEN 0 THEN 'USA' WHEN 1 THEN 'Canada' ELSE 'Mexico' END
    AS country,
  CASE WHEN i % 2 = 0 THEN 'New York' ELSE 'Los Angeles' END AS city,
  strftime(DATE '{BASE_DATE}' - CAST(i AS INTEGER), '%Y-%m-%d')
    || 'T00:00:00.000Z' AS registered_date,
  'https://randomuser.me/api/portraits/'
    || (CASE WHEN i % 2 = 0 THEN 'male' ELSE 'female' END)
    || '/' || CAST(i AS VARCHAR) || '.jpg' AS thumbnail
FROM generate_series(0, 49) t(i)
"""
