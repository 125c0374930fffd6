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


def test_chi_square_counts_zero_cells(spark, sf_dir, tmp_path):
    """Round-4 review latent: a (type, day-of-week) cell with zero
    events still contributes (0-e)^2/e = e to the statistic.  Feed a
    corpus with one event type entirely absent on one weekday and
    check chi2 against the dense-grid hand computation — the
    observed-cells-only formulation understates it."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _chi_square,
    )
    ev = load(spark, sf_dir, "events")
    dow = F.pmod(F.datediff(F.to_date("ts"), F.lit("2024-01-01")),
                 F.lit(7))
    # knock out one cell entirely
    sparse = ev.where(~((F.col("event_type") == "click") & (dow == 2)))
    out = str(tmp_path / "sparse")
    sparse.write.parquet(f"{out}/events.parquet")

    got = _chi_square(spark, out).first()

    # dense-grid reference computation in plain Python
    obs = {(r.ty, r.dow): r.o for r in
           sparse.groupBy(F.col("event_type").alias("ty"),
                          dow.alias("dow"))
           .agg(F.count("*").alias("o")).collect()}
    tys = {t for t, _ in obs}
    dows = {d for _, d in obs}
    n = sum(obs.values())
    row = {t: sum(v for (tt, _), v in obs.items() if tt == t) for t in tys}
    col = {d: sum(v for (_, dd), v in obs.items() if dd == d) for d in dows}
    chi2 = sum((obs.get((t, d), 0) - row[t] * col[d] / n) ** 2
               / (row[t] * col[d] / n) for t in tys for d in dows)
    assert ("click", 2) not in obs          # the zero cell exists
    assert abs(got.chi2 - round(chi2, 4)) < 1e-9
    assert got.dof == (len(tys) - 1) * (len(dows) - 1)


def test_ohlc_open_deterministic_under_full_key_ties(spark, tmp_path):
    """Round-4 review latent: two ticks at the SAME microsecond whose
    values round to the same cents tie on the packed ordering key; a
    min_by would return either raw value, while the decode-from-min
    construction yields the cents value regardless of which row wins
    — assert the decoded open/close exactly."""
    import datetime as dt
    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        _time_bucket_ohlc,
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 1)
    rows = [
        (0, t0, 1, "click", 10.0, None),       # ties with the next on
        (1, t0, 2, "click", 10.004, None),     # (µs, cents=1000)
        (2, dt.datetime(2024, 1, 1, 1, 0, 0), 3, "click", 55.5, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    out = str(tmp_path / "ties")
    df.write.parquet(f"{out}/events.parquet")
    got = _time_bucket_ohlc(spark, out).first()
    assert got.open == 10.0                    # decoded cents, not raw
    assert got.close == 55.5
    assert got.high == 55.5 and got.low == 10.0


def test_dq_check_null_key_not_double_counted(spark, sf_dir, tmp_path):
    """Round-4 review latent: a NULL-keyed order is one violation (the
    not-null check), never ALSO an orphan — an unfiltered anti-join
    counts it twice because NULL = c_custkey never matches."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.sqlapi import (
        _dq_check,
    )
    orders = load(spark, sf_dir, "orders")
    nulled = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 1, None)
         .otherwise(F.col("o_custkey")))
    out = str(tmp_path / "dq")
    nulled.write.parquet(f"{out}/orders.parquet")
    load(spark, sf_dir, "customer").write.parquet(
        f"{out}/customer.parquet")
    # dq_check also audits events.value_finite (r12) — materialize it
    load(spark, sf_dir, "events").write.parquet(f"{out}/events.parquet")

    got = {r.check: r.n_violations for r in _dq_check(spark, out).collect()}
    base = {r.check: r.n_violations
            for r in _dq_check(spark, sf_dir).collect()}
    assert got["orders.custkey_not_null"] \
        == base["orders.custkey_not_null"] + 1
    # the nulled row must NOT additionally surface as an orphan
    assert got["orders.custkey_refs_customer"] \
        == base["orders.custkey_refs_customer"]


def test_lsh_short_docs_do_not_flood_candidates(spark, tmp_path):
    """Round-4 review latent: sub-shingle docs (< SHINGLE_N tokens)
    all carry the identical all-NULL minhash signature and would
    collide into one bucket per band, emitting m²/2 zero-similarity
    pairs.  A corpus of one-word docs must produce ZERO near-dup
    pairs, not 190."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _dedup_near_minhash,
    )
    rows = [(i, f"w{i}", "en", "src", 2) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = str(tmp_path / "short")
    df.write.parquet(f"{out}/documents.parquet")
    assert _dedup_near_minhash(spark, out).count() == 0


def test_run_pipeline_injected_source_counts_are_consistent(spark, sf_dir):
    """Round-4 review latent: with a non-empty injected source, every
    stage must derive from THAT extract — the old code counted rows_in
    from the injection but rebuilt transform/dedup from the default
    users_raw, so the metrics mixed two datasets."""
    from mvp_mini_etl_pipeline_1762911573_spark.plans.pipeline import (
        run_pipeline,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import users_raw

    def tiny_source(spark_, sf_dir_):
        # a 40-row slice: far smaller than the default extract, so any
        # default-source leakage makes rows_out exceed rows_in
        return users_raw(spark_, sf_dir_).where(F.col("custkey") <= 40)

    got = run_pipeline(spark, sf_dir, source=tiny_source)
    m = got["metrics"]
    assert not got["fallback_metrics_used"]
    assert 0 < m["rows_out"] <= m["rows_in"] <= 50
    assert m["dedup_removed"] >= 0
    assert m["rows_in"] == tiny_source(spark, sf_dir).count()

def test_cent_cache_evicts_dead_application_entries():
    """ADVICE r4 latent: _CENT_CACHE entries must not outlive their
    owning SparkContext — a driver process that stops and restarts
    sessions would otherwise accumulate dead numpy centroid matrices
    forever.  _cent_cache_put's contract: inserting under application
    A evicts every entry owned by any other application."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _CENT_CACHE, _cent_cache_put,
    )

    saved = dict(_CENT_CACHE)
    try:
        _CENT_CACHE.clear()
        _CENT_CACHE[("app-dead", "h1", (), ())] = "stale-matrices"
        _cent_cache_put(("app-live", "h2", (), ()), "fresh")
        assert ("app-dead", "h1", (), ()) not in _CENT_CACHE
        _cent_cache_put(("app-live", "h3", (), (), "pq"), "fresh-pq")
        # same-application entries coexist
        assert _CENT_CACHE[("app-live", "h2", (), ())] == "fresh"
        assert len(_CENT_CACHE) == 2
    finally:
        _CENT_CACHE.clear()
        _CENT_CACHE.update(saved)


def test_cc_iteration_cap_exit_warns(spark, sf_dir, monkeypatch):
    """ADVICE r3/r4 latent: exhausting CC_MAX_ITERS without a fixpoint
    must be LOUD — under-merged clusters are otherwise invisible until
    an oracle run.  Pin the cap at 0 so the fixpoint is structurally
    unreachable and assert both CC flavors raise the RuntimeWarning."""
    import pytest

    from mvp_mini_etl_pipeline_1762911573_spark.operators import dedup

    monkeypatch.setattr(dedup, "CC_MAX_ITERS", 0)
    with pytest.warns(RuntimeWarning, match="CC_MAX_ITERS"):
        dedup.QUERIES["dedup_clusters"](spark, sf_dir).collect()
    with pytest.warns(RuntimeWarning, match="CC_MAX_ITERS"):
        dedup.QUERIES["dedup_clusters_star"](spark, sf_dir).collect()


def _duck_with_views(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet/*.parquet'")
    return con


def test_ks_test_degenerate_inputs_match_oracle(spark, tmp_path):
    """Code-review r5 latents, all confirmed-by-execution before the
    fix: (a) an all-tied sample emptied the gap frame (all-NULL row vs
    the oracle's d_stat=0); (b) an arm with zero rows divided by zero
    under ANSI mode (crash vs the oracle's NULL); (c) NULL values
    bucketed below every grid point on the Spark side but out of every
    ECDF numerator on the DuckDB side.  Each shape now matches."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import (
        all_oracles, all_queries,
    )
    from .oracle_utils import compare

    base = __import__("datetime").datetime(2024, 1, 1)
    shapes = {
        "tied": [(i, base, 1, ["purchase", "click"][i % 2], 10.0, "{}")
                 for i in range(40)],
        "one_arm": [(i, base, 1, "purchase", float(i), "{}")
                    for i in range(40)],
        "nulls": [(i, base, 1, ["purchase", "click"][i % 2],
                   None if i % 5 == 0 else float(i % 7), "{}")
                  for i in range(60)],
    }
    for label, rows in shapes.items():
        d = tmp_path / label
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string"
        ).coalesce(1).write.parquet(f"{d}/events.parquet")
        con = _duck_with_views(str(d), ["events"])
        compare(all_queries()["ks_test"](spark, str(d)), con,
                all_oracles()["ks_test"], f"ks_test@{label}")


def test_gini_and_benford_degenerate_inputs_match_oracle(spark, tmp_path):
    """Code-review r5 latents: a zero-revenue nation crashed gini with
    ANSI DIVIDE_BY_ZERO (oracle: NULL gini); a 0 < price < 0.005 order
    rounded to zero cents, produced 'digit 0' and crashed benford's
    log10(1 + 1/0) (oracle: NULL row).  gini now try_divides; benford
    guards on cents >= 1 on both sides."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import (
        all_oracles, all_queries,
    )
    from .oracle_utils import compare

    base = __import__("datetime").datetime(1995, 1, 1)
    d = tmp_path / "rel"
    spark.createDataFrame(
        [(1, 1, "F", 0.0, base, "5-LOW"),       # zero-revenue customer
         (2, 2, "O", 0.004, base, "5-LOW"),     # sub-half-cent amount
         (3, 2, "O", 123.45, base, "5-LOW"),
         (4, 3, "F", 999.99, base, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(1, "Customer#1", 0, 0.0, "BUILDING"),
         (2, "Customer#2", 1, 1.0, "BUILDING"),
         (3, "Customer#3", 1, 2.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(0, "ZERONATION", 0), (1, "TWONATION", 0)],
        "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    con = _duck_with_views(str(d), ["orders", "customer", "nation"])
    compare(all_queries()["gini_concentration"](spark, str(d)), con,
            all_oracles()["gini_concentration"], "gini@zero-revenue")
    compare(all_queries()["benford_digits"](spark, str(d)), con,
            all_oracles()["benford_digits"], "benford@sub-cent")


def test_quantile_normalize_guards_floor_domain(spark, tmp_path):
    """Latent (r7 review find #1): the floor(x*1e4+0.5) quantization
    diverges cross-engine outside its domain — Spark's floor(DOUBLE)
    returns LONG (saturates at 2^63; NaN long-casts to 0) while
    DuckDB's stays DOUBLE.  NaN, ±Inf and >=9e14-magnitude values must
    pass through RAW (bit-identical parquet doubles) and still hash
    equal; in-domain values keep the quantized path."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import (
        all_oracles, all_queries,
    )
    d = tmp_path
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 1.25),
        (2, "2024-01-01 00:01:00", 10, "view", float("nan")),
        (3, "2024-01-01 00:02:00", 10, "view", 9.3e14),
        (4, "2024-01-01 00:03:00", 10, "view", float("inf")),
        (5, "2024-01-01 00:04:00", 10, "view", -9.9e15),
        (6, "2024-01-01 00:05:00", 10, "view", 2.51075),
        (7, "2024-01-01 00:06:00", 11, "click", 0.0001),
        (8, "2024-01-01 00:07:00", 11, "click", None),
    ]
    spark.createDataFrame(
        [(i, ts, u, t, v) for (i, ts, u, t, v) in rows],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double",
    ).select("event_id", F.to_timestamp("ts_s").cast("timestamp_ntz")
             .alias("ts"), "user_id", "event_type", "value",
             F.lit("{}").alias("props")) \
     .coalesce(1).write.parquet(f"{d}/events.parquet")
    con = _duck_with_views(str(d), ["events"])
    from tests.oracle_utils import compare
    compare(all_queries()["quantile_normalize"](spark, str(d)), con,
            all_oracles()["quantile_normalize"], "qnorm@floor-domain")


def test_tokenizers_agree_on_vertical_tab(spark, tmp_path):
    """Latent (r7 review find #2): Java's \\s includes \\x0B (vertical
    tab), RE2's does not — a '\\s' shared between a Spark regex and
    its DuckDB oracle silently tokenizes VT-bearing text differently.
    The explicit WS class closed it; this pins the whole tokenizer
    family on a VT-bearing corpus."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import (
        all_oracles, all_queries,
    )
    from tests.oracle_utils import compare
    docs = [
        (0, "foo\x0bbar the and of baz", "en", "web", 22),
        (1, "a\x0b\x0bb c d the of and is it", "en", "web", 25),
        (2, "the and of in is it normal words here", "en", "book", 37),
        (3, "el la de\x0bel la de el la de", "es", "web", 26),
        (4, "\x0b", "en", "web", 1),
        (5, "tab\tand\x0bvt and\fff the of", "en", "web", 24),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    con = _duck_with_views(str(tmp_path), ["documents"])
    for name in ("token_count", "text_stats", "gopher_rules", "lang_id",
                 "text_quality", "vocab_topk", "substring_dedup",
                 "dedup_containment", "importance_sample"):
        compare(all_queries()[name](spark, str(tmp_path)), con,
                all_oracles()[name], f"{name}@vt-corpus")


def test_prefix_filter_prunes_are_exact_at_the_4dp_boundary():
    """r8 review finding: all three SSJoin prunes in
    `_join_prefix_filter` must be derived from the verifier's EXACT
    accept condition Q*I >= P*(na+nb-I) with P=49995, Q=100000 (a
    Jaccard of exactly 0.49995 rounds half-up to the 0.5000
    threshold), not from the nominal t=1/2.  The t=1/2 forms
    over-pruned once sets grew past the point where the 0.00005
    rounding band exceeds one gram: the old one-unit alpha slack
    failed at na+nb >= ~45k (na=nb=45000, I=29998 accepts but was
    position-pruned), the old `2*min >= max` length filter at
    max >= ~20k (na=9999, nb=20000, I=9999 accepts but was
    length-pruned), and the old ceil(n/2) prefix was one gram short
    of the theorem for n >= 20000.  This mirrors the column
    arithmetic in pure Python and sweeps the boundary band so the
    formulas cannot drift back."""
    import math

    P, Q = 49995, 100000

    def accepts(i, na, nb):          # the verifier's exact cut
        return Q * i >= P * (na + nb - i)

    def alpha(na, nb):               # position-filter bound, as coded
        sn = (na + nb) * P + (P + Q - 1)
        return (sn - sn % (P + Q)) // (P + Q)

    def prefix_len(n):               # blocking prefix, as coded
        pn = n * P + (Q - 1)
        return n - (pn - pn % Q) // Q + 1

    def length_ok(na, nb):           # length filter, as coded
        return na * Q >= nb * P and nb * Q >= na * P

    for na, nb in [(9999, 20000), (45000, 45000), (3, 7), (1, 1),
                   (20000, 20001), (2, 4), (60000, 119999),
                   (100000, 100000), (5, 11), (199990, 100000)]:
        lo = max(1, alpha(na, nb) - 3)
        hi = min(na, nb, alpha(na, nb) + 3)
        for i in range(lo, hi + 1):
            if accepts(i, na, nb):
                # completeness: an accepting overlap may never sit
                # below the position-filter bound, and the pair must
                # survive the length filter
                assert i >= alpha(na, nb), (na, nb, i)
                assert length_ok(na, nb), (na, nb, i)
                # the smallest common gram sits at 1-based position
                # <= n - I + 1 in each sorted array: inside the prefix
                assert na - i + 1 <= prefix_len(na), (na, i)
                assert nb - i + 1 <= prefix_len(nb), (nb, i)
        # tightness: alpha is EXACTLY the least accepting overlap
        # (when one exists at these sizes)
        a = alpha(na, nb)
        if a <= min(na, nb):
            assert accepts(a, na, nb), (na, nb, a)
            assert not accepts(a - 1, na, nb), (na, nb, a)
        assert a == math.ceil(P * (na + nb) / (P + Q)), (na, nb)
        for n in (na, nb):
            assert prefix_len(n) == n - math.ceil(P * n / Q) + 1, n
    # the old filters really were wrong at the documented shapes —
    # keep the counterexamples executable
    assert accepts(29998, 45000, 45000)
    assert alpha(45000, 45000) == 29998          # old slack: 29999
    assert accepts(9999, 9999, 20000)
    assert length_ok(9999, 20000)                # old: 2*9999 < 20000


def _write_token_docs(spark, path, big_k: int) -> None:
    """The r9 book-length-document corpus at a parameterized size:
    one big_k-token random doc, one (2·big_k/3)-token single-token
    run, one empty doc, one single word."""
    import random

    rng = random.Random(9)
    words = ["spark", "join", "window", "the", "of"]
    rows = [
        (0, " ".join(rng.choices(words, k=big_k)), "en", "src1", 1),
        (1, " ".join(["the"] * (big_k * 2 // 3)), "en", "src1", 1),
        (2, "", "en", "src2", 0),                              # empty
        (3, "solo", "de", "src2", 4),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long").write.parquet(f"{path}/documents.parquet")


def test_collapse_repeats_is_linear_on_book_length_docs(spark, tmp_path):
    """The r9 book-length-document latent: an indexed-HOF lambda that
    calls element_at on the UNPROJECTED split expression re-evaluates
    the whole split PER ELEMENT — O(L²), minutes for one 30k-token
    doc, invisible to count()-based checks because column pruning
    drops the rewritten-text column.  The zip_with rewrite is
    per-element O(1) by construction.  The pin is a GROWTH-RATE bound,
    not absolute seconds (r9 ADVICE: a fixed `< 60` both flakes on a
    loaded machine and silently passes a ~30s quadratic): each op
    first runs on a 3k-token corpus — that run absorbs codegen
    warm-up AND measures this machine's speed — then the 30k-token
    (10×) run must come in under 10× the baseline + 6s jitter grace.
    Linear forms are scheduling-overhead-bound (big ≈ baseline,
    measured 0.4-0.7s vs 0.5-3.4s baselines); the quadratic forms
    (140s, 140s, 33s at this size) blow the bound on any machine
    since both sides scale with the same host factor."""
    import time

    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries

    small = tmp_path / "short"
    _write_token_docs(spark, small, 3_000)
    d = tmp_path / "long"
    _write_token_docs(spark, d, 30_000)

    def timed(name, path):
        t0 = time.monotonic()
        rows = all_queries()[name](spark, str(path)).collect()
        return rows, time.monotonic() - t0

    _, base = timed("collapse_repeats", small)
    out, took = timed("collapse_repeats", d)
    out = {r.doc_id: r for r in out}
    assert took < 10 * base + 6, \
        f"quadratic regression: {took:.1f}s for 10x tokens vs " \
        f"{base:.1f}s baseline"
    assert out[1].n_tokens == 20_000
    assert out[1].n_collapsed == 19_999          # one survivor
    assert out[3].n_collapsed == 0
    assert 0 not in (out[0].n_tokens,)           # book doc processed
    # the two sibling offenders found by the same sweep: the r7
    # text_repetition built bigrams with element_at(ws, i) on the
    # unprojected split (O(L²), ~140s for the 20k run) and the r7
    # doc_chunk carried the whole token array into every chunk row
    # (O(L²/stride) bytes, ~33s); both now linear — same ratio bound.
    _, base = timed("text_repetition", small)
    rep, took = timed("text_repetition", d)
    assert took < 10 * base + 6, \
        f"text_repetition quadratic again: {took:.1f}s vs {base:.1f}s"
    # doc_id % 10 == 5 filter: this corpus contributes no rows, which
    # is itself the guard that the heavy path ran only on the big doc
    _, base = timed("doc_chunk", small)
    chunks, took = timed("doc_chunk", d)
    assert took < 10 * base + 6, \
        f"doc_chunk quadratic again: {took:.1f}s vs {base:.1f}s"
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every chunk of the book doc carries ONLY its own text
    assert all(len(r.chunk_text.split()) == r.chunk_len
               for r in by_doc[0])
    assert sum(r.chunk_len for r in by_doc[0]) >= 30_000  # full cover
    assert rep is not None
    # _gram_array consumers (r9 verdict): the shared n-gram builder
    # (dedup.py::_gram_array) indexes element_at over a PROJECTED
    # token column — measured linear — but an inlined split expression
    # inside its lambda would regress to the same O(L²) class as
    # collapse_repeats.  Pin its two heaviest callers on the same
    # corpus pair (gram build dominates here: the 5-word vocab
    # collapses the distinct-gram stream, so pair work is nil and the
    # timing isolates the array construction).
    for op in ("dedup_ngram_jaccard", "decontaminate"):
        _, base = timed(op, small)
        _, took = timed(op, d)
        assert took < 10 * base + 6, \
            f"{op} gram build superlinear: {took:.1f}s vs {base:.1f}s"


def test_events_rate_limit_is_linear_on_a_hot_user(spark, tmp_path):
    """The r9 hot-entity latent: Spark recomputes a SLIDING range
    frame ([-24h, 0]) from scratch for every row — O(n·w) per key,
    ~18s for one 50k-event user — while GROWING frames
    ([unboundedPreceding, x]) are incremental.  events_rate_limit now
    takes the difference of two growing-frame counts (us <= t minus
    us < t − 24h, exact integer µs), which this pin holds to a
    GROWTH-RATE bound on a hot key (r9 ADVICE: the old absolute
    `< 60` both flaked on loaded machines and would have passed the
    ~10-20s sliding form at this size): a 3k-event baseline run
    absorbs warm-up and measures the host speed, then the 60k-event
    (20×) run must stay under 10× baseline + 6s.  The incremental
    form is overhead-bound on both (measured ~0.6-0.7s each); the
    sliding form's 60k run costs ~60k·8640 frame re-scans (~21s on
    the r9 machine, scaling with the same host factor as the
    baseline), well past the bound.  The peer-inclusive tie
    semantics the RANGE form exists for are asserted alongside."""
    import datetime as dt
    import time

    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        RATE_LIMIT_N,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries

    base = dt.datetime(2024, 1, 1)

    def write_hot(path, n):
        rows = [(i, base + dt.timedelta(seconds=10 * i), 1,
                 "click", 1.0, "{}") for i in range(n)]
        # a tie cluster: 5 simultaneous events for user 2 — RANGE
        # peers must all count each other
        for j in range(5):
            rows.append((10_000_000 + j, base, 2, "view", 1.0, "{}"))
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        ).write.parquet(f"{path}/events.parquet")

    small = tmp_path / "warm"
    write_hot(small, 3_000)
    d = tmp_path / "hot"
    write_hot(d, 60_000)
    t0 = time.monotonic()
    all_queries()["events_rate_limit"](spark, str(small)).collect()
    baseline = time.monotonic() - t0
    t0 = time.monotonic()
    out = all_queries()["events_rate_limit"](spark, str(d)).collect()
    took = time.monotonic() - t0
    assert took < 10 * baseline + 6, \
        f"sliding-frame regression: {took:.1f}s for 20x events vs " \
        f"{baseline:.1f}s baseline"
    # user 1: events 10s apart -> trailing 24h holds 8640+1 events;
    # every event past the first RATE_LIMIT_N is flagged
    flagged_u1 = [r for r in out if r.user_id == 1]
    assert len(flagged_u1) == 60_000 - RATE_LIMIT_N
    # the tie cluster: all 5 peers count each other (n_in_window = 5
    # for every one of them) — flagged iff 5 > RATE_LIMIT_N
    u2 = [r.n_in_window for r in out if r.user_id == 2]
    assert u2 == ([5] * 5 if 5 > RATE_LIMIT_N else [])


def test_ps_unit_cost_guard_bounds_negative_ratios(spark, tmp_path):
    """Latent (r13 advice, medium): the _PS_CTE unit-cost capacity
    guard was ONE-SIDED (`ratio < 1e13`) — a finite NEGATIVE price
    (passes money_ok) over a tiny positive quantity gives a hugely
    negative ratio that sailed through the filter, and the
    floor(ratio*1e4+0.5) DECIMAL(18,4) cast then overflowed: DuckDB
    raises ConversionException, Spark NULLs/throws.  The guard is now
    `abs(ratio) < 1e10` (the r13 review tightened the bound again:
    DECIMAL(18,4) holds < 1e14 and the quantization scales by 1e4
    first, so the initially-shipped 1e13 left ratios in [1e10, 1e13)
    crashing both engines); this probe ships the negative-huge row
    (price -9e13 over qty 1e-4 → ratio -9e17), a mid-hole row
    (ratio ~1e11 — passes 1e13, overflows the cast), and in-domain
    rows, and asserts the CTE output matches cross-engine — with
    either old guard the oracle side of this compare RAISES."""
    import duckdb

    from mvp_mini_etl_pipeline_1762911573_spark.operators.tpch import (
        _PS_CTE,
    )
    from tests.oracle_utils import compare

    rows = [
        # (okey, pkey, skey, lineno, qty, price)
        (1, 1, 1, 1, 10.0, 250.0),          # in-domain
        (2, 1, 1, 2, 4.0, 100.0),           # in-domain, same (p,s)
        (3, 2, 1, 1, 0.0001, -9e13),        # ratio -9e17: must drop
        (4, 2, 1, 2, 0.0001, 9e13),         # ratio +9e17: must drop
        (5, 3, 2, 1, 2.0, -50.0),           # sane negative: kept
        (6, 4, 2, 1, 0.01, 1e9),            # ratio 1e11: the r13
        #                                     review's mid-hole case
        #                                     (passes 1e13, overflows
        #                                     DECIMAL(18,4)): drop
    ]
    spark.createDataFrame(
        [(o, p, s, ln, q, pr, 0.0, 0.0, "N", "O") for
         (o, p, s, ln, q, pr) in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string",
    ).withColumn("l_shipdate",
                 F.to_timestamp(F.lit("1995-06-01 00:00:00"))
                 .cast("timestamp_ntz")) \
     .coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    sql = _PS_CTE + (
        "SELECT ps_partkey, ps_suppkey, "
        "CAST(ps_unit_cost AS DOUBLE) AS ps_unit_cost, "
        "ps_qty FROM ps ORDER BY ps_partkey, ps_suppkey")
    spark.read.parquet(f"{tmp_path}/lineitem.parquet") \
         .createOrReplaceTempView("lineitem")
    con = _duck_with_views(str(tmp_path), ["lineitem"])
    compare(spark.sql(sql), con, sql, "ps-cte@negative-ratio")
    # the hostile (p=2, s=1) and mid-hole (p=4, s=2) groups must be
    # absent entirely (out of capacity), and the sane negative
    # survives
    got = {(r.ps_partkey, r.ps_suppkey): float(r.ps_unit_cost)
           for r in spark.sql(sql).collect()}
    assert (2, 1) not in got
    assert (4, 2) not in got
    assert got[(3, 2)] == -25.0


def test_mix_queries_survive_wholly_tokenless_corpus(spark, tmp_path):
    """Latent (r13 review): the empty-keys axis produced zero-token
    SOURCES (guarded in r13), but a WHOLLY tokenless corpus zeroes
    tok_total/w_sum themselves — Spark's ANSI division raises where
    DuckDB /0 yields NULL.  All mixture columns are NULL on both
    engines in that case; this pins the whole-corpus form."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import (
        all_oracles, all_queries,
    )
    from tests.oracle_utils import compare

    spark.createDataFrame(
        [(0, "", "en", "web", 0), (1, "   ", "en", "web", 3),
         (2, "​", "es", "book", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    con = _duck_with_views(str(tmp_path), ["documents"])
    for name in ("mix_temperature", "mix_sources"):
        compare(all_queries()[name](spark, str(tmp_path)), con,
                all_oracles()[name], f"{name}@tokenless-corpus")
