"""Set operations (SURVEY.md §2.7 U1-U3).

Reference parity: the fallback path (src/lib/randomuser.js:59-62) is
logically ``union(live, synthetic)`` with one side empty; the cleaning
diff (input − output) realizes the `dedup_removed`/validity story as
EXCEPT ALL.

Scale notes (100 TB): UNION ALL is a free physical concat (no shuffle).
EXCEPT/INTERSECT hash-shuffle both sides on the full row — fine keyed
on a projection of a few columns, ruinous on wide rows; every use below
projects to narrow key sets first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracles import USERS_CTE
from ..tables import users_clean, users_raw, users_valid
from ..sources.synthetic import synthetic_users


def _set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: live ∪ synthetic-fallback users (unionByName = name-aligned
    UNION ALL), tagged by provenance."""
    live = users_clean(spark, sf_dir).select(
        "id", "name_first", "name_last", "country",
        F.lit("live").alias("src"))
    synth = synthetic_users(spark, 50).select(
        F.col("mock_id").alias("id"), F.col("name_first"),
        F.col("name_last"), F.col("country"),
        F.lit("fallback").alias("src"))
    return live.unionByName(synth)


def _set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: rows removed by cleaning = raw EXCEPT ALL valid (projected to
    the identity columns; multiset semantics keep duplicate counts)."""
    cols = ["custkey", "id", "email", "country"]
    raw = users_raw(spark, sf_dir).select(*cols)
    valid = users_valid(spark, sf_dir).select(*cols)
    return raw.exceptAll(valid)


def _set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: countries present among both high-balance and low-balance
    customers (INTERSECT = distinct semantics)."""
    users = users_clean(spark, sf_dir)
    hi = users.where(F.col("acctbal") > 5000).select("country")
    lo = users.where(F.col("acctbal") < 0).select("country")
    return hi.intersect(lo)


def _set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3b: INTERSECT ALL — multiset semantics (duplicate rows kept up
    to the min multiplicity on each side); raw∩valid keeps the
    duplicate-injected rows that survived validation."""
    cols = ["custkey", "id", "country"]
    raw = users_raw(spark, sf_dir).select(*cols)
    valid = users_valid(spark, sf_dir).select(*cols)
    return raw.intersectAll(valid)


QUERIES = {
    "set_union": _set_union,
    "set_except": _set_except,
    "set_intersect": _set_intersect,
    "set_intersect_all": _set_intersect_all,
}

ORACLES = {
    "set_union": USERS_CTE + """
SELECT id, name_first, name_last, country, 'live' AS src FROM users_clean
UNION ALL
SELECT 'mock-id-' || CAST(i AS VARCHAR) || '-'
         || substr(md5('mock-' || CAST(i AS VARCHAR)), 1, 9) AS id,
       (CASE WHEN i % 2 = 0 THEN 'John' ELSE 'Jane' END)
         || CAST(i AS VARCHAR) AS name_first,
       'Doe' || CAST(i AS VARCHAR) AS name_last,
       CASE i % 3 WHEN 0 THEN 'USA' WHEN 1 THEN 'Canada'
                  ELSE 'Mexico' END AS country,
       'fallback' AS src
FROM generate_series(0, 49) AS t(i)
""",
    "set_except": USERS_CTE + """
SELECT custkey, id, email, country FROM users_raw
EXCEPT ALL
SELECT custkey, id, email, country FROM users_valid
""",
    "set_intersect": USERS_CTE + """
SELECT country FROM users_clean WHERE acctbal > 5000
INTERSECT
SELECT country FROM users_clean WHERE acctbal < 0
""",
    "set_intersect_all": USERS_CTE + """
SELECT custkey, id, country FROM users_raw
INTERSECT ALL
SELECT custkey, id, country FROM users_valid
""",
}
