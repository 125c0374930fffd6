"""Golden-output tests (SURVEY.md §5.2): the flagship pipeline's
metrics at sf0.001 are pinned exactly — any change to the users
derivation, validity rules, or dedup semantics trips this first,
before the driver's oracle gate (mirrors the reference's fixed mock
expectations, src/mock-data/etl.json:3-10)."""

from __future__ import annotations

from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import (
    flagship_metrics_row,
)

GOLDEN_SF0001 = {
    "rows_in": 165,            # 150 customers + 15 duplicate copies
    "rows_out": 137,           # valid, deduped
    "dedup_removed": 15,       # every dup's original is valid here
    "countries": 25,           # all nations represented
    "cities": 68,
    "avg_registration_years": 30.71,
    "last_user": "Customer 000000037",
}


def test_flagship_golden(spark):
    got = flagship_metrics_row(spark, "/root/testdata/sf0.001") \
        .first().asDict()
    assert got == GOLDEN_SF0001


def test_reference_metric_invariant(spark):
    """The reference's mock encodes rows_in - rows_out >= dedup_removed
    (etl.json:3-5: 1240-1210=30); the same relation must hold here
    (invalid rows account for the rest of the gap)."""
    m = GOLDEN_SF0001
    assert m["rows_in"] - m["rows_out"] >= m["dedup_removed"]
    assert m["countries"] <= m["rows_out"]
