"""Differential tests: every registry query vs its DuckDB oracle —
the local mirror of the driver's correctness gate (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle(name, spark, duck, sf_dir):
    from .oracle_utils import compare
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_round4_ratio_exact_halves_agree_across_engines(spark, duck):
    """The engine round() trap the r5 extended-seed sweep caught:
    Spark rounds a double's SHORTEST DECIMAL REPR half-up (2.51075 ->
    2.5108) while DuckDB rounds the BINARY value (2.5107499999... ->
    2.5107), so ratio-of-integers outputs landing on exact 5th-decimal
    halves diverged (lm_score_bigram, sum 10043000 over 4 bigrams).
    round4_ratio/round4_ratio_sql round in pure int64 arithmetic —
    assert both sides produce the identical half-up result on the
    exact boundary and on its neighbors, and NULL on a zero
    denominator."""
    import pyspark.sql.functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.functions.exact import (
        round4_ratio, round4_ratio_sql,
    )

    cases = [(10043000, 4000000),   # 2.51075 exactly: the seed-110 hit
             (10042999, 4000000), (10043001, 4000000),
             (1, 8), (125, 1000000),  # 0.000125: half at the 4th dp
             (0, 5), (7, 0),          # zero numerator; zero denominator
             # num = a*20000 + b > 2^53: long/long double division
             # loses the numerator and truncates to q-1 (follow-up
             # review counterexample) — the quotient must divide in
             # exact decimal space
             (354292650708359, 56296894981972)]
    df = spark.createDataFrame(cases, "a long, b long").select(
        "a", "b", round4_ratio(F.col("a"), F.col("b")).alias("r"))
    got = {(r.a, r.b): r.r for r in df.collect()}
    sql = round4_ratio_sql("a", "b")
    for a, b in cases:
        want = duck.execute(
            f"SELECT {sql} FROM (SELECT CAST({a} AS BIGINT) a, "
            f"CAST({b} AS BIGINT) b)").fetchone()[0]
        assert got[(a, b)] == (float(want) if want is not None else None), \
            (a, b, got[(a, b)], want)
    assert got[(10043000, 4000000)] == 2.5108   # half-up, BOTH engines
    assert got[(7, 0)] is None
