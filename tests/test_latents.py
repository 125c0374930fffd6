"""Evidence tests for the round-3 latent divergences (VERDICT r3
'What's wrong' 1-3): each test feeds the previously-latent input the
fixtures never exercised and asserts the fixed behavior.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.operators import custom, joins
from mvp_mini_etl_pipeline_1762911573_spark.operators.joins import (
    BIN_WIDTH, binned_bands, range_binned_join,
)
from mvp_mini_etl_pipeline_1762911573_spark.streaming import jobs
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def test_udtf_tokens_matches_re2_on_unicode_whitespace(spark, tmp_path):
    """Latent #1: the UDTF tokenizer must split exactly like the
    oracle's RE2 '\\s+' ([\\t\\n\\f\\r ]) — NBSP, thin space, AND
    vertical tab stay inside tokens (Python str.split() / \\v-bearing
    classes would split them)."""
    docs = spark.createDataFrame(
        [(0, "foo bar baz", "en", "t", 11),
         (20, "a b cd e", "en", "t", 9),
         (40, "plain words only", "en", "t", 16),
         (1, "filtered out anyway", "en", "t", 19)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    docs.coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")

    got = sorted(
        tuple(r) for r in custom.QUERIES["udtf_tokens"](
            spark, str(tmp_path)).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet/*.parquet'")
    want = sorted(tuple(r) for r in
                  con.execute(custom.ORACLES["udtf_tokens"]).fetchall())
    assert got == want
    tokens = {t for (_, _, t) in got}
    # the latent inputs survive unsplit
    assert "foo bar" in tokens
    assert "a b" in tokens
    assert "cd" in tokens


def test_events_stream_pins_utc_under_non_utc_session(spark, sf_dir):
    """Latent #2: a driver session left on a non-UTC timezone must not
    shift the streamed instants — events_stream pins UTC itself."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        stream = jobs.events_stream(spark, sf_dir)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = jobs.run_to_memory(
            stream.select("event_id", "ts"), "t_utc_pin", "append")
        batch = load(spark, sf_dir, "events")
        assert (got.agg(F.min("ts"), F.max("ts"), F.count("*")).first()
                == batch.agg(F.min("ts"), F.max("ts"),
                             F.count("*")).first())
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_binned_range_join_drops_impossible_bands(spark, sf_dir):
    """Latent #3: a band whose lo exceeds the observed max price must
    contribute ZERO exploded bin rows (a start>stop sequence() is
    DESCENDING and would replicate the band below its own lo), and the
    query result with such a band must equal the plain range join."""
    part = load(spark, sf_dir, "part")
    ghost_bands = spark.sql("""
        SELECT * FROM VALUES
          ('low', 0.0D, 933.0D), ('mid', 933.0D, 966.0D),
          ('high', 966.0D, 1e9D), ('ghost', 900000.0D, 1000000.0D)
        AS bands(band, lo, hi)
    """)
    maxp = part.agg(F.max("p_retailprice").alias("max_price"))
    assert maxp.first()[0] < 900000.0, "ghost band must be impossible"

    bb = binned_bands(ghost_bands, maxp)
    assert bb.where(F.col("band") == "ghost").count() == 0
    # the replication-bound rationale: no band ever lands in a bin
    # below its own lo
    assert bb.where(
        F.col("bin") < F.floor(F.col("lo") / BIN_WIDTH)).count() == 0

    got = sorted(tuple(r) for r in
                 range_binned_join(part, ghost_bands).collect())
    want = sorted(tuple(r) for r in
                  joins.QUERIES["join_range"](spark, sf_dir).collect())
    assert got == want
