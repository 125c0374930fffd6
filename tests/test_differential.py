"""Randomized differential tier (SURVEY §5.10): run oracle-checked
operators on GENERATED event tables and compare Spark vs DuckDB on the
same bytes — extending the fixed-fixture oracle gate to adversarial
data shapes the fixtures never exercise (the class every round's
latent findings came from): same-microsecond timestamp ties, duplicate
values inside a tie, single-event groups, value extremes at the
quantization clamp, and users whose purchases have no prior touch.

Deterministic seeded generation (no hypothesis shrinking needed — on
failure the seed pins the exact corpus), three profiles per operator.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest

from mvp_mini_etl_pipeline_1762911573_spark.registry import (
    all_oracles, all_queries,
)
from .oracle_utils import compare

#: operators under differential test — the ones whose semantics hinge
#: on ordering/ties/interval arithmetic over `events`
EVENT_OPS = ["time_bucket_ohlc", "window_twap", "cusum_changepoint",
             "attribution", "ab_test", "chi_square", "bitmap_days",
             "events_debounce", "window_fill_forward", "stream_ohlc",
             "stream_tumbling", "events_sessionize"]

TYPES = ["click", "view", "purchase", "signup", "error"]


def _gen_events(seed: int, n: int = 400):
    """Adversarial event table: ~20% of rows share a timestamp with a
    neighbor (same-µs ties), values cluster with exact duplicates and
    clamp-edge extremes, few users (dense per-user series)."""
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    ts = base
    for i in range(n):
        if rng.random() < 0.8:
            ts = ts + dt.timedelta(microseconds=rng.randint(1, 3_000_000_000))
        # else: reuse previous ts — a same-microsecond tie
        value = rng.choice([
            round(rng.uniform(0, 100), 2),
            10.0,                      # exact duplicate cluster
            10.004,                    # same-cents tie with 10.0
            0.0,                       # clamp floor
            round(rng.uniform(150000, 200000), 2),  # cents clamp ceiling
        ])
        rows.append((i, ts, rng.randint(1, 8), rng.choice(TYPES),
                     value, '{"k": %d}' % rng.randint(0, 99)))
    return rows


@pytest.fixture(scope="module")
def diff_dirs(spark, tmp_path_factory):
    """Three seeded corpora written as events.parquet dirs, plus a
    DuckDB connection with a view per corpus."""
    out = {}
    con = duckdb.connect()
    for seed in (1, 2, 3):
        d = tmp_path_factory.mktemp(f"diff{seed}")
        df = spark.createDataFrame(
            _gen_events(seed),
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        df.coalesce(2).write.parquet(f"{d}/events.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", EVENT_OPS)
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_differential_on_generated_events(spark, diff_dirs, name, seed):
    dirs, con = diff_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS events")
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf_dir}/events.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")
