"""Property-based invariants (SURVEY.md §5.3) over small generated
frames: dedup idempotence, union additivity, CSV quote-escape
round-trip, timestamp parse-format round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mvp_mini_etl_pipeline_1762911573_spark.tables import load

# row strategy: ids with collisions (dedup interesting), strings with
# quotes/commas/newlines-free (csv), occasional nulls
_ids = st.integers(min_value=0, max_value=20)
_text = st.text(
    alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Zs"),
        exclude_characters="\r\n"),
    max_size=12)
_rows = st.lists(st.tuples(_ids, _text, st.one_of(st.none(), _text)),
                 min_size=0, max_size=30)

_SLOW = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=_rows)
@_SLOW
def test_dedup_idempotent_and_bounded(spark, rows):
    df = spark.createDataFrame(rows, "id int, a string, b string") \
        if rows else spark.range(0).selectExpr(
            "cast(id as int) id", "'x' a", "'y' b")
    once = df.dropDuplicates(["id"])
    twice = once.dropDuplicates(["id"])
    n_once, n_twice = once.count(), twice.count()
    assert n_once == n_twice
    assert n_once <= df.count()
    assert n_once == df.select("id").distinct().count()


@given(rows=_rows, extra=_rows)
@_SLOW
def test_union_count_additive(spark, rows, extra):
    schema = "id int, a string, b string"
    d1 = spark.createDataFrame(rows, schema) if rows \
        else spark.range(0).selectExpr("cast(id as int) id", "'' a", "'' b")
    d2 = spark.createDataFrame(extra, schema) if extra \
        else spark.range(0).selectExpr("cast(id as int) id", "'' a", "'' b")
    assert d1.unionByName(d2).count() == d1.count() + d2.count()


@given(vals=st.lists(
    st.text(alphabet=st.characters(codec="ascii", min_codepoint=32,
                                   max_codepoint=126),
            max_size=15),
    min_size=1, max_size=12))
@_SLOW
def test_csv_quote_roundtrip(spark, tmp_path_factory, vals):
    """The reference's quoteAll + '""' escaping (pages/index.js:446-450)
    must survive write->read for arbitrary printable values, including
    embedded quotes and commas."""
    path = str(tmp_path_factory.mktemp("csvprop") / "out")
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id int, v string")
    (df.write.mode("overwrite").option("header", True)
     .option("quoteAll", True).option("escape", '"')
     .option("ignoreLeadingWhiteSpace", False)
     .option("ignoreTrailingWhiteSpace", False).csv(path))
    back = (spark.read.option("header", True).option("escape", '"')
            .schema("id int, v string").csv(path))
    got = {(r.id, r.v if r.v is not None else "") for r in back.collect()}
    want = {(i, v) for i, v in enumerate(vals)}
    assert got == want


@given(secs=st.lists(st.integers(min_value=0, max_value=2_000_000_000),
                     min_size=1, max_size=10))
@_SLOW
def test_timestamp_parse_format_roundtrip(spark, secs):
    df = spark.createDataFrame([(s,) for s in secs], "s long")
    iso = df.select(
        "s",
        F.date_format(F.timestamp_seconds("s"),
                      "yyyy-MM-dd'T'HH:mm:ss").alias("iso"))
    back = iso.select(
        "s", F.unix_timestamp(F.to_timestamp("iso")).alias("s2"))
    assert all(r.s == r.s2 for r in back.collect())


@given(events=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # user_id
              st.integers(min_value=0, max_value=360)),   # minutes offset
    min_size=1, max_size=40))
@_SLOW
def test_sessionize_properties(spark, events):
    """Gaps-and-islands invariants for arbitrary event sets: sessions
    PARTITION each user's events (counts add up), every intra-session
    gap is <= the 30-min cutoff, and consecutive sessions of one user
    are separated by > the cutoff (checked via each session's span
    against a local reference grouping)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        SESSION_GAP_MIN, _sessions,
    )
    rows = [(u, 1_700_000_000 + m * 60, i)
            for i, (u, m) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id long, secs long, event_id long") \
        .select("user_id", F.timestamp_seconds("secs").alias("ts"),
                "event_id")
    got = _sessions(df).collect()
    assert sum(r.n_events for r in got) == len(rows)

    # local reference: sort each user's times, split on gap > cutoff
    from collections import defaultdict
    by_user = defaultdict(list)
    for u, s, _ in rows:
        by_user[u].append(s)
    want = defaultdict(list)           # user -> [(start, end, n)]
    for u, times in by_user.items():
        times.sort()
        start = prev = times[0]
        n = 1
        for t in times[1:]:
            if t - prev > SESSION_GAP_MIN * 60:
                want[u].append((start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        want[u].append((start, prev, n))
    # timegm, not .timestamp(): Spark returns naive datetimes in the
    # session tz (UTC); .timestamp() would re-interpret them in the
    # host tz
    from calendar import timegm
    got_spans = sorted(
        (r.user_id, timegm(r.s_start.timetuple()),
         timegm(r.s_end.timetuple()), r.n_events) for r in got)
    want_spans = sorted((u, a, b, n) for u, spans in want.items()
                        for (a, b, n) in spans)
    assert got_spans == want_spans


def test_quantization_error_bound(spark):
    """int8 affine quantization property: per-dim reconstruction error
    is at most s/2 = (hi-lo)/510, so mae <= (hi-lo)/510 for every
    vector (equality only in degenerate cases)."""
    import pyspark.sql.functions as F
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    df = all_queries()["embedding_quantize"](
        spark, "/root/testdata/sf0.001")
    bad = df.where(
        F.col("mae") > (F.col("hi") - F.col("lo")) / 510 + 1e-12)
    assert bad.count() == 0
    # codes are valid int8 range
    for c in ("q0", "q1", "q2", "q3"):
        assert df.where((F.col(c) < 0) | (F.col(c) > 255)).count() == 0


def test_ohlc_invariants(spark, sf_dir):
    """Candlestick laws on real data: low <= open, close <= high in
    every bucket (open/close are cents-quantized, so allow the half-
    cent quantization slack on the low side only — quantization
    rounds, never exceeds the true extremes by more than 0.005), and
    per-type tick counts reconcile with the raw stream."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        _time_bucket_ohlc,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    rows = _time_bucket_ohlc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low - 0.005 <= r.open <= r.high + 0.005, r
        assert r.low - 0.005 <= r.close <= r.high + 0.005, r
        assert r.n_ticks >= 1
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.n_ticks for r in rows) == n_events


def test_twap_within_value_range(spark, sf_dir):
    """A time-weighted average is a convex combination of observed
    values, so every (type, day) TWAP lies within that chunk's
    min/max value."""
    import pyspark.sql.functions as F
    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        _window_twap,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    ev = (load(spark, sf_dir, "events")
          .groupBy("event_type",
                   F.date_format("ts", "yyyy-MM-dd").alias("day"))
          .agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    bounds = {(r.event_type, r.day): (r.lo, r.hi) for r in ev.collect()}
    for r in _window_twap(spark, sf_dir).collect():
        lo, hi = bounds[(r.event_type, r.day)]
        assert lo - 1e-6 <= r.twap <= hi + 1e-6, r
        assert lo - 1e-6 <= r.naive_avg <= hi + 1e-6, r


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    """Every purchase is attributed to exactly one channel (the
    channels partition the purchase set), and attributed revenue sums
    to total purchase revenue; shares sum to ~1."""
    import pyspark.sql.functions as F
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _attribution,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    rows = _attribution(spark, sf_dir).collect()
    p = (load(spark, sf_dir, "events")
         .where(F.col("event_type") == "purchase")
         .agg(F.count("*").alias("n"),
              F.sum(F.col("value").cast("decimal(14,2)"))
               .cast("double").alias("rev")).first())
    assert sum(r.n_purchases for r in rows) == p.n
    assert abs(sum(r.revenue for r in rows) - p.rev) < 1e-6
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-3


def test_ks_test_statistic_bounds(spark, sf_dir):
    """D is a sup of |F1 - F2| over ECDFs: 0 <= d_stat <= 1, the arm
    counts reconcile with the filtered stream, and reject_h0 agrees
    with the critical-value formula recomputed from the outputs."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        KS_ALPHA_C, _ks_test,
    )

    row = _ks_test(spark, sf_dir).collect()[0]
    assert 0.0 <= row.d_stat <= 1.0
    ev = load(spark, sf_dir, "events")
    n = ev.where(F.col("event_type").isin("purchase", "click")
                 & F.col("value").isNotNull()).count()
    assert row.n1 + row.n2 == n
    crit = KS_ALPHA_C * math.sqrt((row.n1 + row.n2) / (row.n1 * row.n2))
    # d_stat is rounded; recompute with enough slack for the rounding
    assert row.reject_h0 == (row.d_stat > crit) or \
        abs(row.d_stat - crit) < 1e-3


def test_gini_bounds_and_customer_conservation(spark, sf_dir):
    """With non-negative revenues, 0 <= G < 1 per nation, and the
    per-nation customer counts sum to exactly the customers that have
    at least one order (inner-join conservation)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _gini_concentration,
    )

    rows = _gini_concentration(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.gini < 1.0 for r in rows)
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")).distinct()
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")).distinct()
    assert sum(r.n_customers for r in rows) == o.join(c, "k").count()


def test_benford_shares_telescope_to_one(spark, sf_dir):
    """The Benford expectation telescopes: sum over digits 1..9 of
    log10(1 + 1/d) = log10(10) = 1 exactly — so BOTH share columns
    must sum to ~1 (4-dp rounding slack), and counts reconcile with
    the cents >= 1 guard."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _benford_digits,
    )

    rows = _benford_digits(spark, sf_dir).collect()
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-3
    # expected shares for digits PRESENT; fixture covers all nine
    assert len(rows) == 9
    assert abs(sum(r.exp_share for r in rows) - 1.0) < 1e-3
    n = load(spark, sf_dir, "orders").where(
        F.round(F.col("o_totalprice") * 100, 0) >= 1).count()
    assert sum(r.cnt for r in rows) == n


def test_entropy_bounded_by_log_distinct(spark, sf_dir):
    """Shannon: 0 <= H <= log2(#distinct chars), with micro-bit
    integer-rounding slack; single-char docs must land exactly on 0."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _text_entropy,
    )

    rows = _text_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-4 <= r.entropy_bits <= \
            math.log2(max(r.n_distinct_chars, 1)) + 1e-3
        if r.n_distinct_chars == 1:
            assert r.entropy_bits == 0.0


def test_substring_dedup_share_bounds_and_doc_conservation(spark, sf_dir):
    """0 <= n_dup <= n_grams, dup_share in [0, 1] (4-dp quantized),
    and every doc with >= SUBSTR_N tokens appears exactly once."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        SUBSTR_N, _substring_dedup,
    )

    rows = _substring_dedup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup <= r.n_grams
        assert 0.0 <= r.dup_share <= 1.0
    n_eligible = (load(spark, sf_dir, "documents")
                  .where(F.size(F.split(F.lower("text"), r"\s+"))
                         >= SUBSTR_N).count())
    # raw-split tokenization feeds the gram array, so eligibility is
    # raw-split length >= n; each eligible doc emits exactly one row
    assert len(rows) == n_eligible
    assert len({r.doc_id for r in rows}) == len(rows)


def test_dedup_containment_is_superset_of_high_jaccard(spark, sf_dir):
    """Containment >= Jaccard always (same gram universe, same
    pruning; C(A->B) = I/|A| >= I/(|A|+|B|-I) = J).  So every pair the
    Jaccard audit reports at >= CONTAIN_MIN must appear (in at least
    one orientation) in the containment report, and containment must
    sit in [CONTAIN_MIN, 1]."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        CONTAIN_MIN, _dedup_containment, _dedup_ngram_jaccard,
    )

    cont = _dedup_containment(spark, sf_dir).collect()
    assert cont
    pairs = {(r.doc_a, r.doc_b) for r in cont}
    assert len(pairs) == len(cont)
    for r in cont:
        assert CONTAIN_MIN <= r.containment <= 1.0
        assert 0 < r.inter <= r.na
    jac = _dedup_ngram_jaccard(spark, sf_dir).collect()
    for j in jac:
        if j.jaccard >= CONTAIN_MIN:
            assert (j.doc_a, j.doc_b) in pairs \
                or (j.doc_b, j.doc_a) in pairs


def test_gopher_rules_counts_reconcile(spark, sf_dir):
    """Per-rule failure counts are bounded by n_docs, n_pass can never
    exceed n_docs minus the largest single-rule failure count, and the
    source totals reconcile with the table."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _gopher_rules,
    )

    rows = _gopher_rules(spark, sf_dir).collect()
    assert rows
    for r in rows:
        worst = max(r.n_fail_nwords, r.n_fail_wlen,
                    r.n_fail_alpha, r.n_fail_stop)
        assert 0 <= worst <= r.n_docs
        assert 0 <= r.n_pass <= r.n_docs - worst
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_importance_sample_is_monotone_in_score(spark, sf_dir):
    """The acceptance rule is monotone: a doc with the corpus-max
    score is ALWAYS kept (threshold = B), and kept counts never exceed
    totals; overall kept share should be near the mean score/max_score
    (hash uniformity, loose 3x band)."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _importance_sample,
    )

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        IMP_BUCKETS, STOPWORDS, _tokens,
    )

    rows = _importance_sample(spark, sf_dir).collect()
    assert rows
    tot = sum(r.n_docs for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert 0 < kept <= tot
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
    # max-score docs are always kept: threshold = B > every bucket
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    score = (F.size(F.filter(_tokens(F.col("text")),
                             lambda t: F.array_contains(stop, t))) + 1)
    scores = (load(spark, sf_dir, "documents")
              .select("lang", score.alias("s")).collect())
    mx = max(r.s for r in scores)
    mean = sum(r.s for r in scores) / len(scores)
    n_max_by_lang = {}
    for r in scores:
        if r.s == mx:
            n_max_by_lang[r.lang] = n_max_by_lang.get(r.lang, 0) + 1
    for r in rows:
        assert r.n_kept >= n_max_by_lang.get(r.lang, 0)
    # kept share ~= E[score]/max_score under hash uniformity (each
    # doc kept iff bucket < floor(B*s/mx), bucket ~U[0,B)); loose
    # 3x band so the test never flakes on corpus shape
    expected = mean / mx
    assert expected / 3 <= kept / tot <= min(1.0, expected * 3)


def test_events_rate_limit_flags_are_consistent(spark, sf_dir):
    """Every flagged event exceeds the limit, per-user flagged counts
    never exceed that user's event count, and the flagged set is a
    subset of the events table (ids preserved)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        RATE_LIMIT_N, _events_rate_limit,
    )

    rows = _events_rate_limit(spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events")
    ev_ids = {r.event_id for r in ev.select("event_id").collect()}
    for r in rows:
        assert r.n_in_window > RATE_LIMIT_N
        assert r.event_id in ev_ids
    # per-user flagged counts never exceed that user's event count,
    # and a user needs > RATE_LIMIT_N events to have ANY flags
    per_user = {r.user_id: r.cnt for r in
                ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
                .collect()}
    flagged = {}
    for r in rows:
        flagged[r.user_id] = flagged.get(r.user_id, 0) + 1
    for u, n in flagged.items():
        assert per_user[u] > RATE_LIMIT_N
        assert n <= per_user[u] - RATE_LIMIT_N


def test_sample_cap_per_group_caps_and_conserves(spark, sf_dir):
    """n_kept = min(n_total, CAP) exactly per cell, kept_chars <= the
    cell's total char mass, and cell totals reconcile with the
    table."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.sqlapi import (
        CAP_PER_CELL, _sample_cap_per_group,
    )

    rows = _sample_cap_per_group(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept == min(r.n_total, CAP_PER_CELL)
    docs = load(spark, sf_dir, "documents")
    assert sum(r.n_total for r in rows) == docs.count()


def test_cms_topk_never_underestimates(spark, sf_dir):
    """CMS structural law: est >= true for every reported token (the
    min over depth rows can only include collision mass, never lose
    own mass); overestimate is bounded by the total stream mass, and
    the K-cut is exactly K rows on a vocab-rich corpus."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        CMS_TOPK, _cms_topk, _tokens,
    )

    rows = _cms_topk(spark, sf_dir).collect()
    assert len(rows) == CMS_TOPK
    n_total = (load(spark, sf_dir, "documents")
               .select(F.explode(_tokens(F.col("text"))).alias("t"))
               .count())
    for r in rows:
        assert r.never_under
        assert r.freq <= r.cms_est <= n_total


def test_kmeans_step_conserves_vectors_and_shift_bounds(spark, sf_dir):
    """One Lloyd step: cell member counts partition the corpus, every
    centroid has >= 1 member (its seed vector assigns to itself at
    cosine 1), and the shift is a finite non-negative distance bounded
    by the 4-dim box diagonal of unit-ish embeddings."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _kmeans_step,
    )

    rows = _kmeans_step(spark, sf_dir).collect()
    assert rows
    n_vecs = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        assert r.n_vecs >= 1
        assert r.shift is not None and 0.0 <= r.shift < 10.0


def test_prefix_filter_equals_naive_jaccard_join(spark, sf_dir):
    """The prefix-filter completeness theorem checked in-engine: the
    pruned-candidate result must EQUAL a naive Spark all-shared-grams
    join over the same (unpruned) gram universe at the same
    threshold — no pair lost, none invented, Jaccards identical."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.exact import (
        round4_ratio,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        PREFIX_JACCARD_T, _gram_array, _join_prefix_filter,
    )

    got = sorted((r.doc_a, r.doc_b, r.inter, r.jaccard) for r in
                 _join_prefix_filter(spark, sf_dir).collect())

    docs = load(spark, sf_dir, "documents")
    grams = (docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("ws"))
        .select("doc_id", F.explode(_gram_array("ws", 3)).alias("gram")))
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    naive = (grams.alias("l")
             .join(grams.alias("r"),
                   (F.col("l.gram") == F.col("r.gram"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
             .groupBy(F.col("l.doc_id").alias("doc_a"),
                      F.col("r.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter"))
             .join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
             .join(sizes.withColumnRenamed("doc_id", "doc_b")
                   .withColumnRenamed("n", "nb"), "doc_b")
             .select("doc_a", "doc_b", "inter",
                     round4_ratio(F.col("inter"),
                                  F.col("na") + F.col("nb")
                                  - F.col("inter")).alias("jaccard"))
             .where(F.col("jaccard") >= PREFIX_JACCARD_T))
    want = sorted((r.doc_a, r.doc_b, r.inter, r.jaccard)
                  for r in naive.collect())
    assert got == want


def test_mann_whitney_integer_statistic_reconciles(spark, sf_dir):
    """The doubled U statistic is an exact integer with hard bounds:
    0 <= u1_x2 <= 2*n1*n2 (U is between 0 and n1*n2), the arm counts
    reconcile with the filtered stream, and a BRUTE-FORCE pair count
    over the driver-collected arms reproduces u1_x2 exactly —
    U1 = #{(a, b): a > b} + 0.5 * #ties, doubled."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _mann_whitney,
    )

    row = _mann_whitney(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull() & ~F.isnan("value"))
    a = [r.value for r in
         ev.where("event_type = 'purchase'").select("value").collect()]
    b = [r.value for r in
         ev.where("event_type = 'click'").select("value").collect()]
    assert (row.n1, row.n2) == (len(a), len(b))
    assert 0 <= row.u1_x2 <= 2 * row.n1 * row.n2
    b_sorted = sorted(b)
    import bisect
    u2 = 0
    for x in a:
        lt = bisect.bisect_left(b_sorted, x)
        eq = bisect.bisect_right(b_sorted, x) - lt
        u2 += 2 * lt + eq
    assert u2 == row.u1_x2


def test_drift_psi_shares_and_counts_reconcile(spark, sf_dir):
    """PSI invariants: 10 buckets exactly; ref/cur counts reconcile
    with the period split; smoothed shares sum to ~1 per period; the
    reference deciles are balanced (each ref bucket holds n/10 +- the
    tie slack of its boundary's duplicate cluster); psi_total is the
    sum of the terms and is >= 0 up to rounding (identical
    distributions give 0; PSI is a symmetrized KL, nonnegative)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _drift_psi,
    )

    rows = _drift_psi(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(10))
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value"))
    n_ref = ev.where("ts < timestamp '2024-01-16'").count()
    n_cur = ev.count() - n_ref
    assert sum(r.ref_n for r in rows) == n_ref
    assert sum(r.cur_n for r in rows) == n_cur
    assert abs(sum(r.ref_share for r in rows) - 1.0) < 2e-3
    assert abs(sum(r.cur_share for r in rows) - 1.0) < 2e-3
    assert abs(sum(r.psi_term for r in rows) - rows[0].psi_total) < 1e-5
    assert rows[0].psi_total >= -1e-6


def test_acf_lags_brute_force_replay(spark, sf_dir):
    """ACF invariants: a driver-side brute-force replay over the
    collected per-series values (time order, (ts, event_id)
    tie-break) reproduces every acf_k exactly through the same
    integer recurrence (c = floor(100v + 0.5), u = n*c − S, half-up
    division), and Cauchy-Schwarz bounds each lag: |r_k| <= 1 up to
    the 1e-4 rounding grid."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        ACF_MAX_LAG, _acf_lags,
    )

    rows = {r.event_type: r for r in _acf_lags(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value"))
    series = {}
    for r in ev.select("event_type", "ts", "event_id", "value").collect():
        series.setdefault(r.event_type, []).append(
            (r.ts, r.event_id, math.floor(r.value * 100 + 0.5)))
    assert set(series) == set(rows)
    for etype, pts in series.items():
        pts.sort(key=lambda t: (t[0], t[1]))
        c = [p[2] for p in pts]
        n, s = len(c), sum(c)
        u = [n * ci - s for ci in c]
        den = sum(x * x for x in u)
        row = rows[etype]
        assert row.n_obs == n
        for k in range(1, ACF_MAX_LAG + 1):
            num = sum(u[i] * u[i + k] for i in range(n - k))
            got = getattr(row, f"acf{k}")
            if den <= 0:
                assert got is None
            else:
                want = ((num * 20000 + den)
                        - ((num * 20000 + den) % (2 * den))) // (2 * den)
                assert got == want / 1e4
                assert abs(got) <= 1.0001


def test_ngram_novelty_brute_force_replay(spark, sf_dir):
    """Novelty invariants: a driver-side replay over the collected
    texts (same WS split, distinct 3-grams, min-doc-id first-seen)
    reproduces every row; the doc with the smallest doc_id that has
    grams is 100% novel; n_novel sums to the distinct-gram-universe
    size (each gram is novel in exactly one doc); gram-less docs
    (<3 tokens) are absent."""
    import re

    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _ngram_novelty,
    )

    rows = {r.doc_id: r for r in _ngram_novelty(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    per_doc, first_seen = {}, {}
    for d in sorted(docs, key=lambda r: r.doc_id):
        ws = ws_re.split(d.text.lower())
        grams = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)} \
            if len(ws) >= 3 else set()
        per_doc[d.doc_id] = grams
        for g in grams:
            first_seen.setdefault(g, d.doc_id)
    expected_ids = {i for i, g in per_doc.items() if g}
    assert set(rows) == expected_ids
    for doc_id, grams in per_doc.items():
        if not grams:
            continue
        novel = sum(1 for g in grams if first_seen[g] == doc_id)
        r = rows[doc_id]
        assert (r.n_grams, r.n_novel) == (len(grams), novel)
        num, den = novel * 20000 + len(grams), 2 * len(grams)
        assert r.novelty == (num - num % den) // den / 1e4
    assert rows[min(expected_ids)].novelty == 1.0
    assert sum(r.n_novel for r in rows.values()) == len(first_seen)


def test_kaplan_meier_brute_force_replay(spark, sf_dir):
    """KM invariants: a driver-side replay over the collected events
    (per-user first/last/first-purchase µs, day durations, at-risk
    counts, the quantized-ln product) reproduces every row; survival
    is non-increasing and in [0, 1]; n_risk strictly decreases down
    the curve; row 1's n_risk counts every subject still at risk at
    the first death time."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _kaplan_meier,
    )

    rows = _kaplan_meier(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros("ts").alias("us")).collect()
    per_user = {}
    for r in ev:
        lo, hi, conv = per_user.get(r.user_id, (r.us, r.us, None))
        lo, hi = min(lo, r.us), max(hi, r.us)
        if r.event_type == "purchase":
            conv = min(conv, r.us) if conv is not None else r.us
        per_user[r.user_id] = (lo, hi, conv)
    subjects = [((conv - lo if conv is not None else hi - lo)
                 // 86400000000, conv is not None)
                for lo, hi, conv in per_user.values()]
    times = sorted({t for t, _ in subjects})
    surv, prev_risk, want = 1.0, None, []
    cum_li = 0
    for t in times:
        d = sum(1 for tt, e in subjects if tt == t and e)
        n_risk = sum(1 for tt, _ in subjects if tt >= t)
        if d == 0:
            continue
        if d == n_risk:
            s_t = 0.0
        else:
            cum_li += math.floor(math.log((n_risk - d) / n_risk)
                                 * 1e6 + 0.5)
            s_t = round(math.exp(cum_li / 1e6), 4)
        want.append((t, n_risk, d))
        if prev_risk is not None:
            assert n_risk < prev_risk
        prev_risk = n_risk
        assert 0.0 <= s_t <= surv + 1e-9
        surv = s_t
    assert [(r.t_days, r.n_risk, r.n_events) for r in rows] == want
    assert all(0.0 <= r.survival <= 1.0 for r in rows)


def test_pca_power_iter_brute_force_replay(spark, sf_dir):
    """Power-step invariants: an exact-integer driver-side replay (quantize,
    T_i, r_i = n·T_i − G, per-dim Σ r_i·q_ij in Python bigints)
    reproduces direction and share for all 64 dims; the max-|w| dim
    reports direction ±1.0 exactly; shares sum to 1 within the 64-term
    rounding slack; direction is bounded by [−1, 1]."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _pca_power_iter,
    )

    rows = {r.dim: r for r in _pca_power_iter(spark, sf_dir).collect()}
    emb = load(spark, sf_dir, "embeddings").select("embedding").collect()
    q = [[math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
         for r in emb]
    n, d = len(q), len(q[0])
    t = [sum(row) for row in q]
    g = sum(t)
    r_coef = [n * ti - g for ti in t]
    w = [sum(r_coef[i] * q[i][j] for i in range(n)) for j in range(d)]
    mx, tot = max(abs(x) for x in w), sum(abs(x) for x in w)
    assert set(rows) == set(range(d))

    def half_up(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    for j in range(d):
        got = rows[j]
        if mx == 0:
            assert got.direction is None and got.share is None
            continue
        assert got.direction == half_up(w[j], mx)
        assert got.share == half_up(abs(w[j]), tot)
        assert -1.0 <= got.direction <= 1.0
    if mx > 0:
        assert any(abs(rows[j].direction) == 1.0 for j in range(d))
        assert abs(sum(rows[j].share for j in range(d)) - 1.0) <= d * 1e-4


def test_bootstrap_ci_brute_force_replay(spark, sf_dir):
    """Poisson-bootstrap invariants: a driver-side replay of the
    public-hash weights (hashlib sha256, the same first-8-hex bucket)
    and integer-cent replicate means reproduces ci_lo/ci_hi/b_eff for
    every status; ci_lo ≤ ci_hi; the point mean is the exact cent
    ratio of the raw group."""
    import hashlib
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.sqlapi import (
        BOOT_B, POISSON_CUM, _bootstrap_ci,
    )

    rows = {r.status: r for r in _bootstrap_ci(spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice").collect()
    groups = {}
    for o in orders:
        groups.setdefault(o.o_orderstatus, []).append(
            (o.o_orderkey, math.floor(o.o_totalprice * 100 + 0.5)))

    def half_up(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    def weight(key, b):
        h = hashlib.sha256(f"{key}:{b}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 1000000
        for wv, cut in enumerate(POISSON_CUM):
            if bucket < cut:
                return wv
        return 5

    for status, rowset in groups.items():
        got = rows[status]
        assert got.n_orders == len(rowset)
        assert got.mean_price == half_up(sum(c for _, c in rowset),
                                         100 * len(rowset))
        means = []
        for b in range(1, BOOT_B + 1):
            sw = swc = 0
            for k, c in rowset:
                wv = weight(k, b)
                sw += wv
                swc += wv * c
            if sw > 0:
                means.append((half_up(swc, 100 * sw), b))
        means.sort()
        beff = len(means)
        lo = means[(beff * 25 + 999) // 1000 - 1][0]
        hi = means[(beff * 975 + 999) // 1000 - 1][0]
        assert (got.b_eff, got.ci_lo, got.ci_hi) == (beff, lo, hi)
        assert got.ci_lo <= got.ci_hi


def test_rank_fusion_brute_force_replay(spark, sf_dir):
    """RRF invariants: the fused order equals the exact-rational RRF
    order recomputed driver-side with Python Fractions from the two
    input rankings; every rrf_key is floor(num·10^12/den) of those
    rationals; a doc in both lists always outranks the same-rank
    singleton (1/(K+r) < 1/(K+r) + 1/(K+r')); fused_rnk is a dense
    1..n permutation."""
    from fractions import Fraction

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        RRF_K, RRF_SCALE, _rank_fusion,
    )

    rows = _rank_fusion(spark, sf_dir).collect()
    assert [r.fused_rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        terms = []
        if r.rank_bm25 is not None:
            terms.append(Fraction(1, RRF_K + r.rank_bm25))
        if r.rank_density is not None:
            terms.append(Fraction(1, RRF_K + r.rank_density))
        assert terms, "row in neither ranking"
        frac = sum(terms)
        assert r.rrf_key == (frac.numerator * RRF_SCALE) // frac.denominator
        num, den = frac.numerator, frac.denominator
        q = num * 20000 + den
        assert r.rrf == (q - q % (2 * den)) // (2 * den) / 1e4
    keys = [(r.rrf_key, -r.doc_id) for r in rows]
    assert keys == sorted(keys, reverse=True)
    both = {r.doc_id: r for r in rows
            if r.rank_bm25 is not None and r.rank_density is not None}
    only = [r for r in rows
            if (r.rank_bm25 is None) != (r.rank_density is None)]
    for b in both.values():
        for o in only:
            solo_rank = o.rank_bm25 if o.rank_bm25 is not None \
                else o.rank_density
            if min(b.rank_bm25, b.rank_density) <= solo_rank:
                assert b.rrf_key > o.rrf_key


def test_mutual_info_brute_force_replay(spark, sf_dir):
    """MI invariants: a driver-side replay (exact counts, the same
    micro-quantized ln terms, Python-int sums) reproduces every output
    to the digit; information-theoretic bounds hold up to the 1e-6
    quantization: 0 ≤ MI ≤ min(H) (so 0 ≤ NMI ≤ 1) and each entropy
    ≤ ln(k) of its cardinality."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _mutual_info,
    )

    row = _mutual_info(spark, sf_dir).collect()[0]
    docs = load(spark, sf_dir, "documents").select(
        "lang", "source").collect()
    n = len(docs)
    cells, nl, ns = {}, {}, {}
    for r in docs:
        cells[(r.lang, r.source)] = cells.get((r.lang, r.source), 0) + 1
        nl[r.lang] = nl.get(r.lang, 0) + 1
        ns[r.source] = ns.get(r.source, 0) + 1
    mi_q = sum(c * math.floor(math.log((c * n) / (nl[l] * ns[s]))
                              * 1e6 + 0.5)
               for (l, s), c in cells.items())
    hl_q = sum(c * math.floor(-math.log(c / n) * 1e6 + 0.5)
               for c in nl.values())
    hs_q = sum(c * math.floor(-math.log(c / n) * 1e6 + 0.5)
               for c in ns.values())

    def half_up(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    assert (row.n_docs, row.n_cells) == (n, len(cells))
    assert (row.n_langs, row.n_sources) == (len(nl), len(ns))
    assert row.mi == half_up(mi_q, n * 1000000)
    assert row.h_lang == half_up(hl_q, n * 1000000)
    assert row.h_source == half_up(hs_q, n * 1000000)
    mn = min(hl_q, hs_q)
    assert row.nmi == (half_up(mi_q, mn) if mn > 0 else None)
    assert -1e-4 <= row.mi <= min(row.h_lang, row.h_source) + 1e-4
    if row.nmi is not None:
        assert -1e-4 <= row.nmi <= 1 + 1e-4
    assert row.h_lang <= math.log(len(nl)) + 1e-4
    assert row.h_source <= math.log(len(ns)) + 1e-4


def test_seasonal_envelope_brute_force_replay(spark, sf_dir):
    """Envelope invariants: a driver-side replay (cents, sorted cell
    values, the same integer ceil ranks) reproduces every band edge
    and mean; bands are ordered p10 ≤ p50 ≤ p90 and sit inside the
    cell's [min, max]; cell counts reconcile with the filtered
    stream."""
    import math

    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        _seasonal_envelope,
    )

    rows = {(r.event_type, r.hr): r
            for r in _seasonal_envelope(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_type", F.hour("ts").alias("hr"), "value").collect()
    cells = {}
    for r in ev:
        cells.setdefault((r.event_type, r.hr), []).append(
            math.floor(r.value * 100 + 0.5))
    assert set(cells) == set(rows)
    for key, vals in cells.items():
        vals.sort()
        n = len(vals)
        got = rows[key]
        assert got.n_obs == n
        bands = [vals[(n * k + 99) // 100 - 1] for k in (10, 50, 90)]
        assert [got.p10_cents, got.p50_cents, got.p90_cents] == bands
        assert vals[0] <= bands[0] <= bands[1] <= bands[2] <= vals[-1]
        num = sum(vals) * 20000 + n * 100
        assert got.mean_value == \
            (num - num % (2 * n * 100)) // (2 * n * 100) / 1e4


def test_attribution_linear_brute_force_replay(spark, sf_dir):
    """Linear-attribution invariants: a driver-side replay (per-user
    touch lists, window filter, exact integer micro-credit floor
    division) reproduces every channel row; micro-credit totals
    conserve revenue up to the documented ≤1e-4-cent-per-cell
    truncation; shares sum to ~1; every purchase is credited in
    exactly one arm (touched xor direct)."""
    import math
    from collections import defaultdict

    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        ATTR_Q, ATTR_WINDOW_H, _attribution_linear,
    )

    rows = {r.channel: r for r in
            _attribution_linear(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us")).collect()
    touches = defaultdict(list)
    for r in ev:
        if r.event_type in ("click", "view"):
            touches[r.user_id].append((r.us, r.event_type))
    horizon = ATTR_WINDOW_H * 3600 * 1_000_000
    qs = defaultdict(int)
    n_p = defaultdict(set)
    total_cents = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        cents = math.floor(r.value * 100 + 0.5)
        total_cents += cents
        inwin = [ch for us, ch in touches[r.user_id]
                 if r.us - horizon <= us < r.us]
        if not inwin:
            qs["direct"] += cents * ATTR_Q
            n_p["direct"].add(r.event_id)
            continue
        n = len(inwin)
        for ch in set(inwin):
            k = inwin.count(ch)
            qs[ch] += (cents * k * ATTR_Q) // n
            n_p[ch].add(r.event_id)
    assert set(rows) == set(qs)
    q_total = sum(qs.values())

    def half_up(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    for ch, r in rows.items():
        assert r.n_purchases == len(n_p[ch])
        assert r.revenue_attr == half_up(qs[ch], ATTR_Q * 100)
        assert r.rev_share == half_up(qs[ch], q_total)
    # conservation: truncation loses < 1 micro-credit per (purchase,
    # channel) cell
    n_cells = sum(len(v) for v in n_p.values())
    assert 0 <= total_cents * ATTR_Q - q_total < max(n_cells, 1)
    assert abs(sum(r.rev_share for r in rows.values()) - 1.0) \
        <= len(rows) * 1e-4


def test_collapse_repeats_brute_force_replay(spark, sf_dir):
    """Collapse invariants: a driver-side replay (same WS split,
    keep-first-of-run, sha256 of the space-rejoined stream)
    reproduces every row; the transform is idempotent (collapsing the
    collapsed stream removes nothing); counts reconcile
    (n_tokens - n_collapsed = len(kept))."""
    import hashlib
    import re

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _collapse_repeats,
    )

    rows = {r.doc_id: r for r in
            _collapse_repeats(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    ws_re = re.compile("[ \t\n\x0b\f\r]+")
    assert set(rows) == {d.doc_id for d in docs}
    for d in docs:
        toks = [t for t in ws_re.split(d.text.lower()) if t]
        kept = [t for i, t in enumerate(toks)
                if i == 0 or t != toks[i - 1]]
        r = rows[d.doc_id]
        assert (r.n_tokens, r.n_collapsed) == \
            (len(toks), len(toks) - len(kept))
        assert r.cleaned_sha == hashlib.sha256(
            " ".join(kept).encode()).hexdigest()
        twice = [t for i, t in enumerate(kept)
                 if i == 0 or t != kept[i - 1]]
        assert twice == kept
        if toks:
            num = r.n_collapsed * 20000 + len(toks)
            assert r.repeat_ratio == \
                (num - num % (2 * len(toks))) // (2 * len(toks)) / 1e4
        else:
            assert r.repeat_ratio is None


def test_logit_step_brute_force_replay(spark, sf_dir):
    """Replay the whole quantized-gradient recurrence in plain Python
    integers over the collected per-doc features: per-row µ-sigmoid,
    µ-features, residual×feature products, clamped log-loss terms,
    then the exact integer ratios for grad / w_new / mean_nll — and
    require equality with every emitted cell."""
    import math

    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        LOGIT_LR_INV, QUALITY_LOGIT_W, _LOGIT_W100,
        _quality_feature_cols, _logit_step)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    assert LOGIT_LR_INV == 10
    cols = _quality_feature_cols()
    feats = load(spark, sf_dir, "documents").select(
        "lang", *[cols[c].alias(c) for c in
                  ("n_tokens", "avg_word_len", "stopword_ratio",
                   "punct_ratio", "alpha_ratio")]).collect()
    W = QUALITY_LOGIT_W
    n = len(feats)
    G = {k: 0 for k in W}
    snll = 0
    for r in feats:
        z = (W["intercept"] + W["avg_word_len"] * r.avg_word_len
             + W["stopword_ratio"] * r.stopword_ratio
             + W["punct_ratio"] * r.punct_ratio
             + W["alpha_ratio"] * r.alpha_ratio
             + W["log_tokens"] * math.log(1.0 + r.n_tokens))
        pe = math.floor((1.0 / (1.0 + math.exp(-z))) * 1e4 + 0.5)
        y = 1 if r.lang == "en" else 0
        re_ = pe - y * 10000
        xe = {"intercept": 10000,
              "avg_word_len": math.floor(r.avg_word_len * 1e4 + 0.5),
              "stopword_ratio":
                  math.floor(r.stopword_ratio * 1e4 + 0.5),
              "punct_ratio": math.floor(r.punct_ratio * 1e4 + 0.5),
              "alpha_ratio": math.floor(r.alpha_ratio * 1e4 + 0.5),
              "log_tokens": math.floor(
                  round(math.log(1.0 + r.n_tokens), 4) * 1e4 + 0.5)}
        for k in W:
            G[k] += re_ * xe[k]
        lpc = min(max(pe, 1), 9999)
        sel = lpc if y == 1 else 10000 - lpc
        snll += math.floor(-math.log(sel / 10000.0) * 1e6 + 0.5)

    def r4(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = {r.feature: r for r in _logit_step(spark, sf_dir).collect()}
    assert set(got) == set(W)
    for k, r in got.items():
        wq = _LOGIT_W100[k][0]
        assert r.n_docs == n
        assert r.w_old == wq / 100.0
        assert r.grad == r4(G[k], n * 10**8)
        assert r.w_new == r4(wq * n * 10**7 - G[k], n * 10**9)
        assert r.mean_nll == r4(snll, n * 10**6)


def test_minhash_join_is_subset_of_exact_prefix_join(spark, sf_dir):
    """The LSH pipeline may MISS similar pairs (band-collision recall
    1-(1-J^R)^B) but every pair it emits must appear, with identical
    inter/jaccard, in the theorem-complete prefix-filter join at the
    same threshold — LSH prunes candidates, never invents them."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _join_prefix_filter, _minhash_lsh_join)

    exact = {(r.doc_a, r.doc_b): (r.inter, r.jaccard)
             for r in _join_prefix_filter(spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b): (r.inter, r.jaccard)
           for r in _minhash_lsh_join(spark, sf_dir).collect()}
    assert set(lsh) <= set(exact)
    for pair, vals in lsh.items():
        assert exact[pair] == vals


def test_naive_bayes_model_is_a_valid_distribution(spark, sf_dir):
    """Model sanity over the emitted rows: priors are per-class doc
    shares that sum to ~1 (4-dp rounding slack), every smoothed
    log-likelihood is negative (a probability < 1), per-class report
    counts are non-increasing in rank, and the reported top token
    count never exceeds the class's token total."""
    from collections import defaultdict

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _naive_bayes_train)

    rows = _naive_bayes_train(spark, sf_dir).collect()
    assert rows
    by_cls = defaultdict(list)
    for r in rows:
        by_cls[r.lang].append(r)
        assert r.loglik < 0
        assert 0 < r.tok_cnt <= r.total_tokens
    assert abs(sum(c[0].prior for c in by_cls.values()) - 1.0) \
        <= 1e-4 * len(by_cls)
    for rs in by_cls.values():
        rs.sort(key=lambda r: r.rnk)
        cnts = [r.tok_cnt for r in rs]
        assert cnts == sorted(cnts, reverse=True)


def test_source_overlap_matrix_bounds(spark, sf_dir):
    """Every emitted overlap row must satisfy the set-algebra bounds:
    0 < inter <= min(na, nb), jaccard <= min(containment_a,
    containment_b) <= 1, and the pair ordering src_a < src_b."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _source_overlap)

    rows = _source_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.inter <= min(r.na, r.nb)
        assert r.jaccard <= min(r.containment_a, r.containment_b)
        assert max(r.containment_a, r.containment_b) <= 1.0


def test_agg_moments_brute_force_replay(spark, sf_dir):
    """Recompute every emitted statistic from the raw rows in plain
    Python (exact int power sums, the same double closed form) and
    require equality — including the exact-ratio mean/variance and
    the m2 = 0 NULL guard."""
    import math
    from collections import defaultdict

    from mvp_mini_etl_pipeline_1762911573_spark.operators.aggregates import (
        _agg_moments)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    raw = load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice").collect()
    sums = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in raw:
        d = math.floor(r.o_totalprice + 0.5)
        st = sums[r.o_orderstatus]
        st[0] += 1
        st[1] += d
        st[2] += d * d
        st[3] += d * d * d
        st[4] += d * d * d * d

    def r4(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = {r.status: r for r in _agg_moments(spark, sf_dir).collect()}
    assert set(got) == set(sums)
    for status, (n, s1, s2, s3, s4) in sums.items():
        r = got[status]
        assert r.n == n
        assert r.mean_dollars == r4(s1, n)
        assert r.variance == r4(s2 * n - s1 * s1, n * n)
        nD, s1D, s2D, s3D, s4D = map(float, (n, s1, s2, s3, s4))
        mu = s1D / nD
        m2 = s2D / nD - mu * mu
        if m2 <= 0:
            assert r.skewness is None and r.kurtosis_raw is None
            continue
        m3 = s3D / nD - 3.0 * mu * s2D / nD + 2.0 * mu * mu * mu
        m4 = (s4D / nD - 4.0 * mu * s3D / nD
              + 6.0 * mu * mu * s2D / nD - 3.0 * mu * mu * mu * mu)
        assert r.skewness == round(m3 / math.pow(m2, 1.5), 6)
        assert r.kurtosis_raw == round(m4 / math.pow(m2, 2.0), 6)


def test_roc_auc_brute_force_replay(spark, sf_dir):
    """Replay the AUC rank machinery in plain Python over the
    collected (label, µ-score) pairs: tie-averaged doubled ranks,
    rank-sum U statistic, then the exact half-up integer ratios —
    equality required with both emitted cells.  (The scoring stage
    itself is replayed by test_logit_step_brute_force_replay; this
    pins the rank/ratio half.)"""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _logit_scores, _roc_auc)

    rows = _logit_scores(spark, sf_dir).collect()
    n1 = sum(r.y for r in rows)
    n0 = len(rows) - n1
    from collections import Counter
    cnt = Counter(r.lp for r in rows)
    pos = Counter(r.lp for r in rows if r.y == 1)
    rs2, cum = 0, 0
    for v in sorted(cnt):
        rs2 += pos.get(v, 0) * (2 * cum + cnt[v] + 1)
        cum += cnt[v]

    def r4(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = _roc_auc(spark, sf_dir).collect()[0]
    assert got.n_pos == n1 and got.n_neg == n0
    u2 = rs2 - n1 * (n1 + 1)
    assert got.auc == r4(u2, 2 * n1 * n0)
    assert got.gini == r4(u2 - n1 * n0, n1 * n0)
    assert 0.0 <= got.auc <= 1.0
    assert -1.0 <= got.gini <= 1.0


def test_calibration_bins_brute_force_replay(spark, sf_dir):
    """Replay the reliability binning in plain Python integers over
    the collected (label, µ-score) pairs; the bin populations must
    partition the corpus and every exact ratio must match."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        CALIB_BINS, _calibration_bins, _logit_scores)

    rows = _logit_scores(spark, sf_dir).collect()
    agg = {}
    for r in rows:
        b = min(r.lp // 1000, CALIB_BINS - 1)
        n, slp, np_ = agg.get(b, (0, 0, 0))
        agg[b] = (n + 1, slp + r.lp, np_ + r.y)

    def r4(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = _calibration_bins(spark, sf_dir).collect()
    assert sum(r.n for r in got) == len(rows)
    assert [r.bin for r in got] == sorted(agg)
    for r in got:
        n, slp, np_ = agg[r.bin]
        assert (r.n, r.n_pos) == (n, np_)
        assert r.mean_pred == r4(slp, n * 10000)
        assert r.frac_pos == r4(np_, n)
        assert r.gap == round(r.mean_pred - r.frac_pos, 4)


def test_spearman_corr_monotone_and_degenerate_contracts(
        spark, tmp_path):
    """Constructed invariants: a perfectly monotone (status F) group
    yields ρ = 1, perfectly anti-monotone (O) ρ = -1, and a
    constant-measure group (P: every order has the same item count)
    yields NULL — d1 = 0 must hit the try_divide guard, not crash
    under ANSI."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        _spearman_corr)

    orders, items = [], []
    k = 0
    for st, slope in (("F", 1), ("O", -1)):
        for i in range(1, 8):
            k += 1
            orders.append((k, st, 100.0 * i))
            cnt = i if slope == 1 else 8 - i
            items.extend((k, j) for j in range(cnt))
    for i in range(1, 5):
        k += 1
        orders.append((k, "P", 50.0 * i))
        items.extend((k, j) for j in range(3))  # constant x
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderstatus string, "
                "o_totalprice double"
    ).coalesce(1).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        items, "l_orderkey long, l_linenumber int"
    ).coalesce(1).write.parquet(f"{tmp_path}/lineitem.parquet")
    got = {r.status: r for r in
           _spearman_corr(spark, str(tmp_path)).collect()}
    assert got["F"].rho == 1.0
    assert got["O"].rho == -1.0
    assert got["P"].rho is None


def test_winnow_fingerprint_brute_force_replay(spark, sf_dir):
    """Replay the whole winnowing selection in plain Python (regex
    split, sha256-prefix gram hashes, packed leftmost-min windows,
    start-row filter, dedup) over the collected texts and require the
    exact emitted row set — then check the paper's guarantee on the
    replay: every window of WINNOW_W consecutive gram positions
    contains at least one selected position."""
    import hashlib
    import re

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        WINNOW_K, WINNOW_W, WS_RUN, _WINNOW_POS_M, _winnow_fingerprint)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    expect = set()
    for d in docs:
        ws = re.split(WS_RUN, d.text.lower())
        grams = [" ".join(ws[i:i + WINNOW_K])
                 for i in range(len(ws) - WINNOW_K + 1)] \
            if len(ws) >= WINNOW_K else []
        if not grams:
            continue
        cs = [int(hashlib.sha256(g.encode()).hexdigest()[:8], 16)
              * _WINNOW_POS_M + p for p, g in enumerate(grams)]
        sel = {min(cs[s:s + WINNOW_W])
               for s in range(max(len(cs) - WINNOW_W, 0) + 1)}
        for c in sel:
            expect.add((d.doc_id, c // _WINNOW_POS_M,
                        c % _WINNOW_POS_M))
        # the winnowing coverage guarantee, on the replay
        sel_pos = {c % _WINNOW_POS_M for c in sel}
        for s in range(max(len(cs) - WINNOW_W, 0) + 1):
            assert sel_pos & set(range(s, s + WINNOW_W))
    got = {(r.doc_id, r.fp, r.pos)
           for r in _winnow_fingerprint(spark, sf_dir).collect()}
    assert got == expect


def test_winnow_fingerprints_survive_passage_relocation(spark, tmp_path):
    """The property that makes winnowing the plagiarism/dedup
    primitive: relocating a passage preserves its selected gram
    HASHES.  A document and a copy with 8 words prepended must share
    every fingerprint hash the original selected from windows fully
    interior to the copied region (boundary windows may differ)."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _winnow_fingerprint)

    body = ("the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong black coffee at dawn near "
            "the old stone bridge by the river bend every single day")
    shifted = "alpha beta gamma delta epsilon zeta eta theta " + body
    spark.createDataFrame(
        [(0, body), (1, shifted)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{tmp_path}/documents.parquet")
    rows = _winnow_fingerprint(spark, str(tmp_path)).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    shared = fps[0] & fps[1]
    # all but the first window-straddling selections must carry over
    assert len(shared) >= len(fps[0]) - 2
    assert len(shared) >= 3


def test_winnow_join_brute_force_replay(spark, sf_dir):
    """Replay the fingerprint pairing in plain Python on top of the
    (already replay-pinned) winnow selection: distinct (doc, fp),
    df-prune hot fingerprints, count shared fps per pair, threshold —
    exact row-set equality required."""
    from collections import Counter, defaultdict
    from itertools import combinations

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        WJ_DF_FLOOR, WJ_DF_FRAC, WJ_MIN_SHARED, _winnow_join,
        _winnow_rows)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    pairs_fp = {(r.doc_id, r.fp) for r in
                _winnow_rows(docs).select("doc_id", "fp").collect()}
    df = Counter(fp for _, fp in pairs_fp)
    cut = max(WJ_DF_FLOOR, WJ_DF_FRAC * n_docs)
    by_fp = defaultdict(list)
    for d, fp in pairs_fp:
        if df[fp] <= cut:
            by_fp[fp].append(d)
    shared = Counter()
    for fp, ds in by_fp.items():
        for a, b in combinations(sorted(ds), 2):
            shared[(a, b)] += 1
    expect = {(a, b, c) for (a, b), c in shared.items()
              if c >= WJ_MIN_SHARED}
    got = {(r.doc_a, r.doc_b, r.shared_fps)
           for r in _winnow_join(spark, sf_dir).collect()}
    assert got == expect
    assert got, "fixture must exercise at least one near-dup pair"


def test_zipf_fit_brute_force_replay(spark, sf_dir):
    """Replay the per-source OLS in plain Python integers: exact
    ranks, µ-nat quantized logs, closed-form slope/intercept/r² as
    half-up integer ratios — equality with every emitted cell."""
    import math
    from collections import Counter

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        ZIPF_TOPK, _tokens, _zipf_fit)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    from pyspark.sql import functions as F

    rows = (load(spark, sf_dir, "documents")
            .select("source", F.explode(_tokens(F.col("text")))
                    .alias("tok")).collect())
    cnt = Counter((r.source, r.tok) for r in rows)
    per_src = {}
    for (src, tok), c in cnt.items():
        per_src.setdefault(src, []).append((-c, tok))

    def r4(a, b):
        if b == 0:
            return None
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = {r.source: r for r in _zipf_fit(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for src, terms in per_src.items():
        terms.sort()
        head = terms[:ZIPF_TOPK]
        n = len(head)
        xs = [math.floor(math.log(float(i + 1)) * 1e4 + 0.5)
              for i in range(n)]
        ys = [math.floor(math.log(float(-c)) * 1e4 + 0.5)
              for c, _ in head]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        # the helper's own envelope (it computes a*2e4 + b internally;
        # the r8 review found the old 1e6 grid could overflow it)
        assert abs(num * num) * 20000 + abs(d1 * d2) < 10**38
        r = got[src]
        assert r.n == n
        assert r.slope == r4(num, d1)
        assert r.intercept == r4(sy * sxx - sx * sxy, d1 * 10**4)
        assert r.r2 == r4(num * num, d1 * d2)


def test_js_divergence_brute_force_replay_and_bounds(spark, sf_dir):
    """Replay the pairwise JS pipeline in plain Python (exact counts,
    µ-nat quantized shared-token terms, closed-form ln2 disjoint
    mass, half-up ratios) and pin the information-theoretic bounds:
    0 <= jsd <= ln 2 (+1 quantization ulp at 4dp)."""
    import math
    from collections import Counter

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        LN2_U, _js_divergence, _tokens)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    from pyspark.sql import functions as F

    rows = (load(spark, sf_dir, "documents")
            .select("source", F.explode(_tokens(F.col("text")))
                    .alias("tok")).collect())
    cnt = Counter((r.source, r.tok) for r in rows)
    toks = {}
    tot = Counter()
    for (src, tok), c in cnt.items():
        toks.setdefault(src, {})[tok] = c
        tot[src] += c

    def r4(a, b):
        num = a * 20000 + b
        return (num - num % (2 * b)) // (2 * b) / 1e4

    got = {(r.src_a, r.src_b): r
           for r in _js_divergence(spark, sf_dir).collect()}
    srcs = sorted(toks)
    expect_pairs = set()
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            shared_toks = set(toks[sa]) & set(toks[sb])
            if not shared_toks:
                continue  # pairs sharing no token are absent by spec
            expect_pairs.add((sa, sb))
            A, B = tot[sa], tot[sb]
            sp = sq = sha = shb = 0
            for t in shared_toks:
                a, b = toks[sa][t], toks[sb][t]
                aB, bA = a * B, b * A
                den = float(aB + bA)
                sp += a * math.floor(
                    math.log(2 * aB / den) * 1e6 + 0.5)
                sq += b * math.floor(
                    math.log(2 * bA / den) * 1e6 + 0.5)
                sha += a
                shb += b
            sp += (A - sha) * LN2_U
            sq += (B - shb) * LN2_U
            r = got[(sa, sb)]
            assert (r.tokens_a, r.tokens_b) == (A, B)
            assert r.kl_p_m == r4(sp, A * 10**6)
            assert r.kl_q_m == r4(sq, B * 10**6)
            assert r.jsd == r4(sp * B + sq * A, A * B * 2 * 10**6)
            assert -1e-4 <= r.jsd <= math.log(2) + 1e-4
    assert set(got) == expect_pairs


def test_simhash_join_banding_is_pigeonhole_complete(spark, sf_dir):
    """The completeness THEOREM behind simhash_join, machine-checked
    where all-pairs is affordable: at Hamming distance <= 3, the 4
    bands (30 bits each, 2 per 60-bit print) cannot all differ, so
    the banded bucket join must equal the unbanded all-pairs popcount
    filter exactly — same pairs, same distances."""
    from itertools import combinations

    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        SIMHASH_SHA_HAM, _simhash_join)

    out = _simhash_join(spark, sf_dir)
    # recompute the fingerprints exactly as the operator does, then
    # brute-force all pairs in Python
    from mvp_mini_etl_pipeline_1762911573_spark.operators import dedup
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    import hashlib
    import re
    from collections import Counter

    docs = load(out.sparkSession, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    bits, nprints = dedup.SIMHASH_SHA_BITS, dedup.SIMHASH_SHA_PRINTS
    prints = {}
    for d in docs:
        toks = [t for t in re.split(r"[ \t\n\x0B\f\r]+", d.text.lower())
                if t != ""]
        if not toks:
            continue
        tf = Counter(toks)
        votes = [[0] * bits for _ in range(nprints)]
        for tok, c in tf.items():
            hx = hashlib.sha256(tok.encode()).hexdigest()
            for p in range(nprints):
                h = int(hx[15 * p:15 * (p + 1)], 16)
                for i in range(bits):
                    votes[p][i] += c if (h >> i) & 1 else -c
        prints[d.doc_id] = tuple(
            sum(1 << i for i, v in enumerate(votes[p]) if v > 0)
            for p in range(nprints))
    expect = set()
    for a, b in combinations(sorted(prints), 2):
        ham = sum(bin(pa ^ pb).count("1")
                  for pa, pb in zip(prints[a], prints[b]))
        if ham <= SIMHASH_SHA_HAM:
            expect.add((a, b, ham))
    got = {(r.doc_a, r.doc_b, r.hamming) for r in out.collect()}
    assert got == expect


def test_similarity_recall_counts_the_arm_intersection(spark, sf_dir):
    """similarity_recall's hits must equal the literal intersection of
    its two arms' (q_id, n_id) sets, and the ratios must be the
    exact-integer forms of the counts — recomputed independently from
    the committed arm queries."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _similarity_ivf, _similarity_recall, _similarity_topk)

    exact = {(r.q_id, r.n_id)
             for r in _similarity_topk(spark, sf_dir).collect()}
    ivf = {(r.q_id, r.n_id)
           for r in _similarity_ivf(spark, sf_dir).collect()}
    row = _similarity_recall(spark, sf_dir).collect()[0]
    assert row.k_total == len(exact)
    assert row.hits == len(exact & ivf)
    assert 0 <= row.hits <= row.k_total
    assert 0.0 <= row.recall_at_k <= 1.0
    assert 0.0 <= row.scan_share <= 1.0
    assert row.beats_random == (
        row.hits * row.n_queries * (row.n_corpus - 1)
        > row.k_total * row.scanned)
    # the quality claim itself: the fixture index must beat random
    assert row.beats_random


def test_token_fertility_invariants(spark, sf_dir):
    """Every word costs >= 1 piece (fertility >= 1), OOV rate lives in
    [0, 1], and the per-language word counts partition the corpus
    token stream exactly."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _token_fertility, _tokens)

    rows = _token_fertility(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents")
    n_tokens = docs.select(
        F.explode(_tokens(F.col("text"))).alias("t")).count()
    assert sum(r.words for r in rows) == n_tokens
    for r in rows:
        assert r.pieces >= r.words > 0
        assert 0 <= r.oov_words <= r.words
        assert r.fertility >= 1.0
        assert 0.0 <= r.oov_rate <= 1.0


def test_novelty_delta_matches_set_difference(spark, sf_dir):
    """novelty_delta == brute-force gram set difference, doc by doc:
    batch grams never seen in the standing corpus, over the raw
    WS-split 3-gram universe."""
    import re as _re

    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        NOVELTY_BATCH_MOD, _novelty_delta)

    def grams_of(text):
        ws = _re.split(r"[ \t\n\x0B\f\r]+", text.lower())
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    corpus = set()
    for d in docs:
        if d.doc_id % NOVELTY_BATCH_MOD != 0:
            corpus |= grams_of(d.text)
    expect = {}
    for d in docs:
        if d.doc_id % NOVELTY_BATCH_MOD == 0:
            g = grams_of(d.text)
            if g:
                expect[d.doc_id] = (len(g), len(g - corpus))
    got = {r.doc_id: (r.n_grams, r.n_new)
           for r in _novelty_delta(spark, sf_dir).collect()}
    assert got == expect


def test_host_dedup_rollup_is_conservative(spark, sf_dir):
    """host_dedup's per-domain rollup must partition the corpus
    exactly (sum of pages == doc count), keep unique <= pages with
    dup = pages - unique, and — by the 25-docs-into-13-slots
    pigeonhole of the URL construction — find at least one duplicate
    in every domain at every fixture SF."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _host_dedup,
    )

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    rows = _host_dedup(spark, sf_dir).collect()
    assert sum(r.pages for r in rows) == n_docs
    for r in rows:
        assert r.unique_pages + r.dup_pages == r.pages
        assert 0 < r.unique_pages <= r.pages
        assert r.dup_pages >= 1          # pigeonhole: >13 docs/source
    assert sum(r.kept_chars for r in rows) <= total_chars


def test_winnow_coverage_guarantee_holds_corpus_wide(spark, sf_dir):
    """The MOSS density theorem, asserted on every fixture doc: each
    selected-position gap (virtual start at -1) is within WINNOW_W,
    selections never exceed grams, and the density ratio stays in
    (0, 1] against the window count — the query-shaped twin of the
    winnow_fingerprint pigeonhole pins."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _winnow_coverage)

    rows = _winnow_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.guarantee_holds, (r.doc_id, r.max_gap)
        assert 1 <= r.max_gap <= r.n_grams
        assert 1 <= r.n_fps <= r.n_grams
        assert 0.0 < r.density <= 1.0


def test_mirror_detect_finds_planted_mirrors_and_prunes_boilerplate(
        spark, tmp_path):
    """Construction test: two sources serving the SAME 8-token lead
    must surface as a mirror pair with exact page counts, while a
    boilerplate lead planted on > MIRROR_FP_MAX_DOMAINS domains must
    be df-pruned (no |domains|² pair wall from one hot lead)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        MIRROR_FP_MAX_DOMAINS, _mirror_detect)

    lead = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "terms of service apply to all pages here"
    rows, did = [], 0
    # sources s00/s01 mirror the lead (2 pages on a, 1 on b);
    # doc_id % 13 spreads page slots, irrelevant to the fingerprint
    for src, copies in [("s00", 2), ("s01", 1)]:
        for c in range(copies):
            rows.append((did, f"{lead} tail {src} {c}", "en", src, 1))
            did += 1
    # boilerplate lead on MANY domains -> pruned
    for j in range(MIRROR_FP_MAX_DOMAINS + 2):
        rows.append((did, f"{boiler} extra {j}", "en", f"b{j:02d}", 1))
        did += 1
    d = tmp_path / "mirror"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long").write.parquet(f"{d}/documents.parquet")
    got = _mirror_detect(spark, str(d)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.domain_a, r.domain_b) == ("s00.example.org",
                                        "s01.example.org")
    assert (r.shared_leads, r.pages_a, r.pages_b) == (1, 2, 1)


def test_crawl_frontier_priority_composes_the_two_shares(spark, sf_dir):
    """priority must equal round4(unique_share × good_share) as the
    ONE exact integer ratio (unique·n_good)/pages², and the rollup
    must conserve page counts against host_dedup's."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _crawl_frontier, _host_dedup)

    fr = {r.domain: r for r in _crawl_frontier(spark, sf_dir).collect()}
    hd = {r.domain: r for r in _host_dedup(spark, sf_dir).collect()}
    assert set(fr) == set(hd)
    for dom, r in fr.items():
        assert r.pages == hd[dom].pages
        assert r.unique_pages == hd[dom].unique_pages
        assert 0 <= r.n_good <= r.pages
        # half-up int-ratio replay
        num, den = r.unique_pages * r.n_good * 10**4, r.pages * r.pages
        assert abs(r.priority - ((2 * num + den) // (2 * den)) / 1e4) \
            < 1e-12


def test_source_perplexity_is_the_token_weighted_lm_score(spark, sf_dir):
    """The source rollup must be consistent with the per-doc grain:
    token counts conserve exactly, and each source's avg_nll is the
    token-weighted mean of its docs' (exact micro-nat sums share the
    same model), reproduced here from lm_score's own columns."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _lm_score, _source_perplexity)

    docs = load(spark, sf_dir, "documents")
    src_of = {r.doc_id: r.source for r in
              docs.select("doc_id", "source").collect()}
    per_doc = _lm_score(spark, sf_dir).collect()
    agg = {}
    for r in per_doc:
        s = agg.setdefault(src_of[r.doc_id], [0, 0, 0.0])
        s[0] += 1
        s[1] += r.n_tokens
        s[2] += r.avg_nll * r.n_tokens      # 4dp-rounded, approximate
    got = {r.source: r for r in
           _source_perplexity(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n_docs, n_toks, nll_sum) in agg.items():
        assert got[src].n_docs == n_docs
        assert got[src].n_tokens == n_toks
        # per-doc avg_nll is rounded to 4dp before re-weighting, so
        # agree to the accumulated rounding envelope
        assert abs(got[src].avg_nll - nll_sum / n_toks) < 1e-3


def test_ivfpq_recall_readout_is_internally_consistent(spark, sf_dir):
    """The sketch-contract columns must satisfy the containments the
    construction promises: the routing surfaces at most k_total true
    neighbors, scans at most the whole (self-excluded) corpus per
    query, and the PQ concentration claim holds on the fixtures."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        _ivfpq_recall)

    r = _ivfpq_recall(spark, sf_dir).collect()[0]
    assert 0 <= r.cand_hits <= r.k_total
    assert 0 < r.scanned <= r.n_queries * (r.n_corpus - 1)
    assert r.concentrates_hits
