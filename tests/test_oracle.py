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
