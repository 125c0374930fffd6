"""Projection / filter operators (SURVEY.md §2.2 P1-P5).

Reference parity: the per-row restructuring map src/lib/randomuser.js:49-57
(nested projection + coalesce), the null-guards :99-104, and the lenient
date-validity predicate :105-111.

Spark-first notes: all of these are pure narrow transformations — no
shuffle at any scale.  The nested-struct projection keeps everything
inside whole-stage codegen; filters are pushed to the parquet scan by
Catalyst (verify via .explain: PushedFilters on the customer scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracles import USERS_CTE
from ..tables import load, users_raw


def _project_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: restructure flat columns into the reference's canonical nested
    user shape (randomuser.js:49-57), then flatten back out for the
    oracle compare (DuckDB side uses plain columns — struct round-trip
    must be lossless)."""
    raw = users_raw(spark, sf_dir)
    nested = raw.select(
        F.struct(F.col("id").alias("value")).alias("id_s"),
        F.struct(F.col("name_first").alias("first"),
                 F.col("name_last").alias("last")).alias("name"),
        "email",
        "phone",
        F.struct(F.col("country"), F.col("city")).alias("location"),
        F.struct(F.col("registered_raw").alias("date")).alias("registered"),
        F.struct(F.col("thumbnail")).alias("picture"),
    )
    return nested.select(
        F.col("id_s.value").alias("id"),
        F.col("name.first").alias("name_first"),
        F.col("name.last").alias("name_last"),
        "email",
        "phone",
        F.col("location.country").alias("country"),
        F.col("location.city").alias("city"),
        F.col("registered.date").alias("registered_date"),
        F.col("picture.thumbnail").alias("thumbnail"),
    )


def _coalesce_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: ``id.value ?? login.uuid`` (randomuser.js:50).  The primary id
    is nulled for every 7th row and replaced by a uuid-like fallback."""
    raw = users_raw(spark, sf_dir)
    with_alt = raw.select(
        "custkey",
        F.when(F.col("custkey") % 7 == 3, F.lit(None).cast("string"))
         .otherwise(F.col("id")).alias("primary_id"),
        F.sha2(F.concat(F.lit("uuid:"), F.col("id")), 256).alias("login_uuid"),
    )
    return with_alt.select(
        "custkey",
        F.coalesce("primary_id", "login_uuid").alias("resolved_id"),
        F.col("primary_id").isNull().alias("used_fallback"),
    )


def _filter_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: null-guard predicate (randomuser.js:99-104) — keep rows whose
    location/country and email survive the optional-chaining guards."""
    raw = users_raw(spark, sf_dir)
    return (
        raw.where(F.col("country").isNotNull() & F.col("email").isNotNull())
        .select("custkey", "id", "email", "country", "city")
    )


def _filter_valid_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: lenient date-parse predicate (randomuser.js:105-111) —
    ``new Date(s)`` NaN-check maps to try_to_timestamp IS NOT NULL."""
    raw = users_raw(spark, sf_dir)
    with_ts = raw.withColumn("registered_ts",
                             F.try_to_timestamp("registered_raw"))
    return (
        with_ts.where(F.col("registered_ts").isNotNull())
        .select(
            "custkey", "id",
            F.date_format("registered_ts", "yyyy-MM-dd HH:mm:ss")
             .alias("registered"),
        )
    )


QUERIES = {
    "project_nested": _project_nested,
    "coalesce_id": _coalesce_id,
    "filter_nonnull": _filter_nonnull,
    "filter_valid_date": _filter_valid_date,
}

ORACLES = {
    "project_nested": USERS_CTE + """
SELECT id, name_first, name_last, email, phone, country, city,
       registered_raw AS registered_date, thumbnail
FROM users_raw
""",
    "coalesce_id": USERS_CTE + """
SELECT
  custkey,
  coalesce(
    CASE WHEN custkey % 7 = 3 THEN NULL ELSE id END,
    sha256('uuid:' || id)) AS resolved_id,
  (custkey % 7 = 3) AS used_fallback
FROM users_raw
""",
    "filter_nonnull": USERS_CTE + """
SELECT custkey, id, email, country, city
FROM users_raw
WHERE country IS NOT NULL AND email IS NOT NULL
""",
    "filter_valid_date": USERS_CTE + """
SELECT custkey, id,
       strftime(try_cast(registered_raw AS TIMESTAMP),
                '%Y-%m-%d %H:%M:%S') AS registered
FROM users_raw
WHERE try_cast(registered_raw AS TIMESTAMP) IS NOT NULL
""",
}
