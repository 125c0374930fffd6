"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mvp_mini_etl_pipeline_1762911573_spark/``; this file
only aggregates the registry (SURVEY.md §2 names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's entire
    dashboard as one metrics row (SURVEY.md §7 minimum slice)."""
    from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import (
        flagship_metrics_row,
    )
    return flagship_metrics_row(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
