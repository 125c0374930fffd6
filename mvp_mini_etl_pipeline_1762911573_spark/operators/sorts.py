"""Sort / limit / top-k operators (SURVEY.md §2.6 L1-L5).

Reference parity: `users.slice(0, 20)` card grid (pages/index.js:226),
`slice(0, 10)` raw modal (:262), remainder count "и ещё N записей"
(:242-246).  The reference preserves source order; we impose a total
order so limits are deterministic under distribution.

Scale notes (100 TB): orderBy+limit plans as TakeOrderedAndProject —
each task keeps a k-row heap, driver merges k·partitions rows; no
global sort materialization.  A bare ORDER BY of the full table
(`sort_multi`) range-partitions on sampled bounds — the only truly
global sort here, kept for SQL completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..oracles import USERS_CTE
from ..tables import load, users_clean


def _limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+L3: top-20 display slice (by registration recency, custkey
    tie-break) plus the 'and N more' remainder count on every row."""
    users = users_clean(spark, sf_dir)
    total = users.agg(F.count("*").alias("total"))
    top = (
        users.orderBy(F.col("registered_ts").desc(),
                      F.col("custkey").asc())
        .limit(20)
        .select("custkey", "id",
                F.concat_ws(" ", "name_first", "name_last").alias("name"),
                "country",
                F.date_format("registered_ts", "yyyy-MM-dd HH:mm:ss")
                 .alias("registered"))
    )
    return top.crossJoin(total).select(
        "custkey", "id", "name", "country", "registered",
        F.greatest(F.col("total") - 20, F.lit(0)).alias("remainder"),
    )


def _sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: general multi-column ORDER BY with nulls-last.  Output must
    carry its own order proof for the order-insensitive hash gate, so
    rank is materialized.

    100 TB shape (r13 WindowExec audit): the LIMIT runs FIRST —
    orderBy+limit plans as TakeOrderedAndProject (per-partition heap +
    driver K-merge, never a global sort) — and the row_number window
    ranks the ≤500 surviving rows.  The previous form ranked the WHOLE
    table through one partition and only then filtered pos <= 500
    (InferWindowGroupLimit did not fire on the empty-partition spec);
    the sort keys form a total order (custkey tie-break), so limit-
    then-rank is value-identical.  The remaining single-partition
    window is over the bounded result frame — allow-listed in
    tests/test_plans.py."""
    users = users_clean(spark, sf_dir)
    order_cols = [F.col("country").asc_nulls_last(),
                  F.col("acctbal").desc(), F.col("custkey").asc()]
    top = users.orderBy(*order_cols).limit(500)
    from pyspark.sql import Window
    w = Window.orderBy(*order_cols)
    return top.select(
        F.row_number().over(w).alias("pos"),
        "custkey", "country", "acctbal",
    )


QUERIES = {
    "limit_topn": _limit_topn,
    "sort_multi": _sort_multi,
}

ORACLES = {
    "limit_topn": USERS_CTE + """
SELECT custkey, id, name_first || ' ' || name_last AS name, country,
       strftime(registered_ts, '%Y-%m-%d %H:%M:%S') AS registered,
       greatest((SELECT count(*) FROM users_clean) - 20, 0) AS remainder
FROM users_clean
ORDER BY registered_ts DESC, custkey ASC
LIMIT 20
""",
    "sort_multi": USERS_CTE + """
SELECT CAST(row_number() OVER (ORDER BY country ASC NULLS LAST,
            acctbal DESC, custkey ASC) AS BIGINT) AS pos,
       custkey, country, acctbal
FROM users_clean
QUALIFY pos <= 500
""",
}
