"""Bucketed-table co-located join (SURVEY.md §2.13 adjacent): writing
both join sides bucketed by the join key lets Spark's sort-merge join
read bucket-aligned splits and skip BOTH shuffle exchanges — the
pre-shuffle-at-write-time pattern that turns every subsequent join on
that key into a map-side merge.  At 100 TB this is the difference
between re-shuffling a fact table per query and paying the shuffle
once at ingest.

Asserted from executed SQLMetrics (plans/profiler.py), not plan
strings: the bucketed join's only exchange is the downstream rollup's,
while the identical unbucketed join pays two join shuffles on top.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mvp_mini_etl_pipeline_1762911573_spark.plans.profiler import profile
from mvp_mini_etl_pipeline_1762911573_spark.tables import load

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    (orders.write.bucketBy(N_BUCKETS, "o_custkey").sortBy("o_custkey")
     .option("path", str(tmp_path / "orders_b"))
     .mode("overwrite").saveAsTable("t_orders_b"))
    (customer.write.bucketBy(N_BUCKETS, "c_custkey").sortBy("c_custkey")
     .option("path", str(tmp_path / "customer_b"))
     .mode("overwrite").saveAsTable("t_customer_b"))
    yield spark.table("t_orders_b"), spark.table("t_customer_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def _rollup(a, b):
    # force sort-merge (no broadcast) so the shuffle count measures the
    # JOIN strategy, not the small-table escape hatch
    return (a.join(b.hint("merge"), a.o_custkey == b.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("order_cnt"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def test_bucketed_join_skips_both_join_shuffles(spark, sf_dir,
                                                bucketed_tables):
    ob, cb = bucketed_tables
    s = profile(_rollup(ob, cb))["summary"]
    # the ONLY exchange is the 4-group rollup; the join reads
    # bucket-aligned splits directly
    assert s["n_shuffles"] == 1
    assert s["shuffle_records"] <= 5 * 32


def test_unbucketed_join_pays_two_more_shuffles(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    s = profile(_rollup(orders, customer))["summary"]
    assert s["n_shuffles"] == 3          # both join sides + the rollup


def test_bucketed_join_result_equals_plain(spark, sf_dir,
                                           bucketed_tables):
    ob, cb = bucketed_tables
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    got = sorted(tuple(r) for r in _rollup(ob, cb).collect())
    want = sorted(tuple(r) for r in _rollup(orders, customer).collect())
    assert got == want
