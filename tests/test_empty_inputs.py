"""Empty-input robustness tier (round 10): every oracle-backed query
run on schema-preserving ZERO-ROW tables, compared to DuckDB on the
same empty parquet.

At 100 TB an empty input is not exotic — a date filter can zero out
any partition range, a tenant can have no rows, a backfill can land
before its data.  The r10 sweep that seeded this tier found FIVE
operators that crashed (IndexError in the IVF centroid seeding that
nine consumers share; ANSI DIVIDE_BY_ZERO in funnel_steps whenever a
funnel stage empties — reachable on NON-empty data too) and two that
silently diverged from their oracles (metrics_row NULL-vs-0 counts,
window_last_user's phantom all-NULL aggregate row).  All fixed
output-identically for non-empty input; this tier keeps the fleet
empty-safe as operators evolve.

Documented exceptions, asserted as such below:

* agg_cube / agg_rollup / agg_grouping_sets — Spark returns ZERO rows
  for grouping sets over an empty relation, where the SQL standard
  (and DuckDB) emit the grand-total grouping set as one row of
  count=0 aggregates.  Engine-intrinsic (Spark's ExpandExec produces
  nothing from no input rows); repairing it would mean a count-guard
  job or a union hack in three hot operators for a degenerate shape.
* ivfpq_recall — PQ training on an empty corpus is undefined; the
  operator raises a named diagnostic instead of returning garbage.
"""

from __future__ import annotations

import duckdb
import pytest

from mvp_mini_etl_pipeline_1762911573_spark.registry import (
    all_oracles, all_queries,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import TABLE_NAMES
from .oracle_utils import compare

#: engine-intrinsic grand-total-row divergence (Spark 0 rows, SQL
#: standard 1): asserted separately, excluded from the equality loop
GRANDTOTAL_DIVERGENT = ["agg_cube", "agg_rollup", "agg_grouping_sets"]
#: raises a named diagnostic on an empty corpus by design
RAISES_BY_DESIGN = ["ivfpq_recall"]


@pytest.fixture(scope="module")
def empty_dirs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        (spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
         .limit(0).coalesce(1)
         .write.parquet(f"{d}/{t}.parquet"))
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{d}/{t}.parquet/*.parquet'")
    return str(d), con


def test_every_oracle_query_is_empty_safe(spark, empty_dirs):
    """One loop, not one test per query: 232 sub-second cases — a
    per-case parametrize would pay pytest overhead 232x for a tier
    whose failures are best read as one list."""
    sf_dir, con = empty_dirs
    queries, oracles = all_queries(), all_oracles()
    skip = set(GRANDTOTAL_DIVERGENT) | set(RAISES_BY_DESIGN)
    failures = []
    for name in sorted(oracles):
        if name in skip:
            continue
        try:
            compare(queries[name](spark, sf_dir), con, oracles[name],
                    f"{name}@empty")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e)[:200]}")
    assert not failures, (
        f"{len(failures)} queries diverge or crash on empty input:\n  "
        + "\n  ".join(failures))


def test_grandtotal_divergence_is_exactly_as_documented(spark, empty_dirs):
    """The three grouping-set queries: Spark MUST yield zero rows and
    the oracle MUST yield its grand-total row(s) — if either side ever
    changes (a Spark version aligning with the standard, an oracle
    edit), this fails and the docstring above gets rewritten."""
    sf_dir, con = empty_dirs
    queries, oracles = all_queries(), all_oracles()
    for name in GRANDTOTAL_DIVERGENT:
        n_spark = queries[name](spark, sf_dir).count()
        n_oracle = len(con.execute(oracles[name]).fetchall())
        assert n_spark == 0, f"{name}: spark now emits {n_spark} rows"
        assert n_oracle >= 1, f"{name}: oracle emits no grand total"


def test_ivfpq_raises_named_diagnostic_on_empty(spark, empty_dirs):
    sf_dir, _ = empty_dirs
    with pytest.raises(Exception, match="PQ needs >= 2 codebook seeds"):
        all_queries()["ivfpq_recall"](spark, sf_dir).collect()
