"""SparkSession factory.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning, partition coalescing, skew-join splitting), UTC
session timezone (determinism), Arrow for any pandas exchange.  On a
1000-executor cluster only the master/memory lines change; the SQL conf
is scale-portable (`spark.sql.shuffle.partitions` is a floor — AQE
coalesces down / splits skew up from there).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mvp_mini_etl_pipeline_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # filterless count/min/max aggregates answer from parquet
        # footer statistics instead of scanning row groups (e.g. the
        # corpus-count broadcast inside text_tfidf / ngram pruning)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # has no native type for — read as long, convert in tables.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
