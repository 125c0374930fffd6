"""Profiler tests: the repo's perf claims as executable assertions over
real SQLMetrics (not plan-string pattern matching)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.plans.profiler import profile
from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def test_profile_groupby_metrics(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    got = profile(ev.groupBy("event_type").agg(F.count("*").alias("n")))
    s = got["summary"]
    assert s["scan_rows"] == ev.count()
    assert s["scan_files"] >= 1
    # partial agg: the shuffle carries ~5 group states, not the stream
    assert s["n_shuffles"] == 1
    assert 0 < s["shuffle_records"] <= 5 * 32
    assert s["output_rows"] == 5
    assert s["spill_disk_bytes"] == 0


def test_broadcast_join_shuffles_only_group_states(spark, sf_dir):
    """The claim 'dims broadcast, the fact never shuffles for the
    JOIN' measured: join_broadcast's only shuffle is the downstream
    aggregation's partial states (records ≤ group count × partitions),
    never the joined fact stream."""
    q = all_queries()["join_broadcast"](spark, sf_dir)
    got = profile(q)
    s = got["summary"]
    n_groups = s["output_rows"]
    assert s["n_broadcasts"] >= 1
    assert s["n_shuffles"] == 1
    assert s["shuffle_records"] <= n_groups * 32
    assert s["shuffle_records"] < s["scan_rows"]


def test_decontaminate_never_shuffles_the_corpus(spark, sf_dir):
    """decontaminate's scale claim measured: the benchmark gram index
    is broadcast, so the training corpus' gram stream is consumed
    map-side — the shuffles carry only partial-aggregated pair counts
    and tiny bench/sort rows, never the exploded gram stream.  If the
    gram join ever degraded to shuffle-hash/sort-merge, shuffle_records
    would jump to >= the total gram-occurrence count asserted against
    here."""
    docs = load(spark, sf_dir, "documents")
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import DECON_N
    total_grams = docs.select(
        F.greatest(
            F.size(F.split(F.lower("text"), r"\s+")) - (DECON_N - 1),
            F.lit(0)).alias("g")).agg(F.sum("g")).first()[0]
    corpus_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    got = profile(all_queries()["decontaminate"](spark, sf_dir))
    s = got["summary"]
    assert s["n_broadcasts"] >= 2        # bench gram index + bench sizes
    assert s["shuffle_records"] < total_grams
    assert s["shuffle_bytes"] < corpus_bytes / 2


def test_ivf_cell_assignment_never_shuffles_the_corpus(spark, sf_dir):
    """assign_cells' scale claim measured (shared by similarity_ivf and
    the SemDeDup dedup family): the centroids are closure-shipped model
    parameters and assignment is one Arrow-vectorized map-side pass —
    the executed plan contains NO exchange of any kind; every corpus
    row reaches the output without being shuffled or broadcast."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        assign_cells,
    )
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    got = profile(assign_cells(emb).select("vec_id", "cell"))
    s = got["summary"]
    assert s["output_rows"] == n
    assert s["n_broadcasts"] == 0
    assert s["n_shuffles"] == 0
    assert s["shuffle_records"] == 0


def test_rolling_mau_work_bounded_by_user_days(spark, sf_dir):
    """rolling_mau's scale claim measured: after the (user, day) dedup,
    the 7x fan-out and the per-day distinct shuffle records scale with
    USER-DAYS, never with events x window — the naive per-day
    self-join over raw events would put >= |events| records through
    the exchanges."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    user_days = (ev.select("user_id", F.date_trunc("day", "ts"))
                 .distinct().count())
    got = profile(all_queries()["rolling_mau"](spark, sf_dir))
    s = got["summary"]
    # dedup partials + 7x exploded contributions + distinct partials:
    # a small multiple of user-days (fixtures: user-days << events)
    assert s["shuffle_records"] <= 10 * user_days
    assert s["spill_disk_bytes"] == 0


def test_sessionize_reuses_one_partitioning(spark, sf_dir):
    """events_sessionize's scale claim measured: the lag window, the
    cumulative-sum window, and the per-session aggregation all key on
    user_id, and HashPartitioning(user_id) satisfies the groupBy's
    (user_id, session_idx) clustering — so the WHOLE query runs on ONE
    exchange of the event stream."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["events_sessionize"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] == 1
    # the one exchange carries the event stream once, nothing more
    assert s["shuffle_records"] == n_events


def test_path_transitions_shuffle_raw_stream_once(spark, sf_dir):
    """events_path_transitions' scale claim measured: the raw stream
    crosses an exchange exactly once (the user_id window); everything
    after the lag is the k x k matrix — the later exchanges carry a
    driver-trivial number of records."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["events_path_transitions"](spark, sf_dir))
    s = got["summary"]
    # stream exchange + matrix-agg exchange + normalization window
    assert s["shuffle_records"] <= n_events + 2 * 32 * 32


def test_exact_dedup_shuffles_digests_not_documents(spark, sf_dir):
    """dedup_content_hash's scale claim measured: the shuffle carries
    one 64-byte-digest record per INPUT DOC (map-side partial agg over
    unique digests), and its total size is a small multiple of the
    digest width — far below the corpus text size."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    corpus_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    got = profile(all_queries()["dedup_content_hash"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] == 1
    assert s["shuffle_records"] <= n_docs
    assert 0 < s["shuffle_bytes"] < corpus_bytes / 2


def test_bloom_dedup_shuffles_positions_not_documents(spark, sf_dir):
    """dedup_bloom's scale claim measured: the corpus contributes only
    hash POSITIONS to the shuffle (distinct-agg partial states bounded
    by k probes per doc and by the m-position domain) and the filter
    reaches the batch as a broadcast — document text never crosses a
    shuffle.  If the membership join degraded to shuffle-hash, or the
    text column leaked into the probe shuffle, shuffle_bytes would
    exceed the corpus size asserted against here."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        BLOOM_K, BLOOM_M)

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    corpus_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    got = profile(all_queries()["dedup_bloom"](spark, sf_dir))
    s = got["summary"]
    assert s["n_broadcasts"] >= 2        # bloom table + n_existing row
    # probe/build shuffles carry at most k positions per doc plus
    # per-partition distinct states (≤ m each) — never the text stream
    assert s["shuffle_records"] <= n_docs * BLOOM_K + BLOOM_M
    assert s["shuffle_bytes"] < corpus_bytes / 2


def test_bm25_shuffles_only_matching_postings(spark, sf_dir):
    """text_bm25's scale claim measured: tokens are filtered to the
    query terms BEFORE any aggregation, so the shuffles carry matching
    postings (plus tiny df/stats aggregates), never the corpus token
    stream.  If the term filter slipped above the explode's consumer,
    shuffle_records would jump to >= the total token count asserted
    against here."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import BM25_QUERY
    docs = load(spark, sf_dir, "documents")
    total_tokens = docs.select(
        F.size(F.split(F.lower("text"), r"\s+")).alias("n")
    ).agg(F.sum("n")).first()[0]
    matching = docs.select(
        F.size(F.filter(
            F.split(F.lower("text"), r"\s+"),
            lambda t: t.isin(*BM25_QUERY))).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert matching < total_tokens / 5, "fixture should make terms rare"
    got = profile(all_queries()["text_bm25"](spark, sf_dir))
    s = got["summary"]
    # postings shuffle twice (tf agg + distinct-df agg) plus small
    # aggregate/top-k states; the corpus stream never does
    assert s["shuffle_records"] <= 4 * matching + 1000
    assert s["shuffle_records"] < total_tokens


def test_ohlc_shuffles_bucket_states_not_ticks(spark, sf_dir):
    """time_bucket_ohlc's scale claim measured: min_by/max_by make the
    rollup ONE aggregation, so the exchanges carry per-partition bucket
    states (and the final sorted bucket rows), never the raw tick
    stream — the row_number-window formulation this shape replaces
    would put all |events| rows through a sort exchange."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["time_bucket_ohlc"](spark, sf_dir))
    s = got["summary"]
    n_buckets = s["output_rows"]
    # agg-partial exchange + orderBy range exchange
    assert s["n_shuffles"] <= 2
    assert s["shuffle_records"] <= n_buckets * 32 + n_buckets
    assert s["shuffle_records"] < n_events


def test_twap_stream_crosses_one_exchange(spark, sf_dir):
    """window_twap's scale claim measured: the lead window and the
    (type, day) aggregation share one clustering, so the event stream
    is exchanged once; everything downstream is per-day rows."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["window_twap"](spark, sf_dir))
    s = got["summary"]
    n_days = s["output_rows"]
    assert s["shuffle_records"] <= n_events + n_days * 32 + n_days


def test_cusum_reuses_series_partitioning(spark, sf_dir):
    """cusum_changepoint's scale claim measured: moments come from a
    groupBy broadcast back over the stream, and the running-sum window
    and the argmax window share the event_type partitioning — the
    stream crosses ONE exchange; if the moments were computed by an
    unbounded window instead, or the two windows' clusterings
    diverged, the stream would cross twice."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["cusum_changepoint"](spark, sf_dir))
    s = got["summary"]
    assert s["n_broadcasts"] >= 1          # the 5-row moments table
    assert s["shuffle_records"] <= n_events + 5 * 32 + 5


def test_inverted_index_shuffles_triples_never_text(spark, sf_dir):
    """inverted_index's scale claim measured: the sort shuffle carries
    (term, doc_id, tf) triples (plus tf-agg partials), and document
    text never crosses an exchange — shuffle bytes stay far below the
    corpus size, and records are a small multiple of the distinct
    (term, doc) pair count, never the token stream."""
    docs = load(spark, sf_dir, "documents")
    corpus_bytes = docs.agg(F.sum(F.length("text"))).first()[0]
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import _tokens
    pairs = (docs.select("doc_id",
                         F.explode(_tokens(F.col("text"))).alias("t"))
             .distinct().count())
    total_tokens = docs.select(
        F.size(F.split(F.lower("text"), r"\s+")).alias("n")
    ).agg(F.sum("n")).first()[0]
    got = profile(all_queries()["inverted_index"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 3 * pairs
    assert s["shuffle_records"] < total_tokens
    # fixed-width triples: average shuffled row stays tens of bytes;
    # a leaked text column would push it to the per-doc average
    # (corpus_bytes / docs, ~300 B on the fixtures)
    avg_doc = corpus_bytes / docs.count()
    assert s["shuffle_bytes"] / s["shuffle_records"] < min(80, avg_doc)


def test_bitmap_days_state_is_eight_bytes_per_user(spark, sf_dir):
    """bitmap_days' scale claim measured: the aggregation state is one
    BIGINT mask per user, merged map-side — the exchange carries at
    most users x partitions partial states, never per-event or per-day
    rows (the count(distinct day) formulation would Expand the stream)."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    q = all_queries()["bitmap_days"](spark, sf_dir)
    assert q.count() == n_users
    got = profile(q)
    s = got["summary"]
    assert s["shuffle_records"] <= n_users * 32 + n_users
    assert s["shuffle_records"] < n_events


def test_skyline_window_runs_on_level_table(spark, sf_dir):
    """skyline_pareto's scale claim measured: the global-sort window
    ranks the per-balance LEVEL table (the groupBy shrink), and the
    surviving levels reach the points as a broadcast — so the
    exchanges carry the per-customer aggregation plus level rows,
    orders of magnitude below the all-pairs NOT EXISTS the oracle
    states as spec."""
    orders = load(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    got = profile(all_queries()["skyline_pareto"](spark, sf_dir))
    s = got["summary"]
    assert s["n_broadcasts"] >= 1          # surviving-level table
    # spend agg partials + join + level agg + level window + final sort
    assert s["shuffle_records"] <= 6 * n_cust + n_orders
    assert s["spill_disk_bytes"] == 0


def test_regr_is_one_pass_aggregation(spark, sf_dir):
    """regr_by_group's scale claim measured: the co-moment states are
    mergeable, so the whole fit is map-side partials plus a 5-row
    reduce — the exchanges never carry the observation stream."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["regr_by_group"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 2            # agg partials + orderBy
    assert s["shuffle_records"] <= 5 * 32 + 5
    assert s["shuffle_records"] < n_events


def test_attribution_never_self_joins(spark, sf_dir):
    """attribution's scale claim measured: the carried touchpoint is a
    window over one (user, time) ordering, so the stream crosses one
    exchange and no join of events against events exists — the
    purchases×touches formulation would fan out quadratically on
    heavy users."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    q = all_queries()["attribution"](spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    s = profile(q)["summary"]
    # stream window exchange + tiny channel/total aggregates
    assert s["shuffle_records"] <= n_events + 4 * 32 + 8


def test_ab_test_is_one_conditional_pass(spark, sf_dir):
    """ab_test's scale claim measured: both arms' counts, means and
    variances come from ONE partial-aggregated groupBy — the
    exchanges carry per-partition moment states, never the event
    stream, and there is no join between the arms."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["ab_test"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 2            # agg partials + orderBy
    assert s["shuffle_records"] <= 5 * 32 + 5
    assert s["shuffle_records"] < n_events


def test_chi_square_reduces_before_margins(spark, sf_dir):
    """chi_square's scale claim measured: the raw stream collapses to
    the k x 7 observed table in the first aggregation; the margin
    windows and the final statistic run over that driver-tiny table,
    so shuffle traffic is bounded by cells x partitions."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["chi_square"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 5 * 7 * 32 * 2
    assert s["shuffle_records"] < n_events


def test_ks_test_shuffles_buckets_not_samples(spark, sf_dir):
    """ks_test's scale claim measured: after the broadcast-grid
    bucketing, the only traffic is per-(arm, bucket) partial counts
    (<= 100 buckets x partitions) plus the exact-percentile partials
    for the grid itself — never the sample stream row-by-row.  (At
    100 TB the grid swaps to approx_percentile sketches — the
    quantile_bins precedent — same downstream plan; exactness is kept
    here for the oracle.)"""
    ev = load(spark, sf_dir, "events")
    n_rows = ev.where(F.col("event_type").isin("purchase", "click")) \
               .count()
    got = profile(all_queries()["ks_test"](spark, sf_dir))
    s = got["summary"]
    # percentile partials (1 state/partition) + bucket counts + final
    assert s["shuffle_records"] <= 100 * 32 + 3 * 32 + 100
    assert s["shuffle_records"] < n_rows


def test_gini_reduces_orders_before_joining(spark, sf_dir):
    """gini_concentration's scale claim measured: the orders stream
    collapses to per-customer DECIMAL revenue partials in its FIRST
    aggregation, so every downstream exchange (customer join, nation
    window, per-nation agg) carries customer-or-smaller cardinality —
    the order stream itself never re-shuffles."""
    n_orders = load(spark, sf_dir, "orders").count()
    n_cust = load(spark, sf_dir, "customer").count()
    got = profile(all_queries()["gini_concentration"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 5 * n_cust + 25 * 32 + 25
    assert s["shuffle_records"] < n_orders


def test_benford_is_nine_key_mapside_agg(spark, sf_dir):
    """benford_digits' scale claim measured: digit extraction is
    map-side; the partial agg reduces every partition to <= 9 digit
    states, so shuffle traffic is bounded by 9 x partitions however
    large the order table grows."""
    n_orders = load(spark, sf_dir, "orders").count()
    got = profile(all_queries()["benford_digits"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 9 * 32 + 9 * 32 + 9
    assert s["shuffle_records"] < n_orders


def test_text_entropy_is_shuffle_free_except_output_sort(spark, sf_dir):
    """text_entropy's scale claim measured: the entropy HOFs run
    entirely map-side (no explode, no per-char shuffle); the only
    exchange is the bounded output slice's ORDER BY, carrying at most
    ENTROPY_DOC_LIMIT rows."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        ENTROPY_DOC_LIMIT,
    )

    got = profile(all_queries()["text_entropy"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 1
    assert s["shuffle_records"] <= ENTROPY_DOC_LIMIT


def test_winsorize_reuses_one_pergroup_exchange(spark, sf_dir):
    """winsorize's scale claim measured (r7): both window functions,
    the bound extraction and the final agg all hang off ONE
    hash-partition-by-status exchange carrying the order rows; the
    only other exchange is the 3-group output ORDER BY.  If the agg
    re-shuffled the stream, shuffle_records would approach 2x."""
    n_orders = (load(spark, sf_dir, "orders")
                .where(F.col("o_totalprice").isNotNull()).count())
    got = profile(all_queries()["winsorize"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 2
    assert s["shuffle_records"] <= n_orders + 32


def test_quantile_normalize_is_single_ranking_exchange(spark, sf_dir):
    """quantile_normalize's scale claim measured (r7): one hash
    shuffle on event_type feeds rank(), count() and the map-side
    ratio — the same single-exchange plan as any ranking window."""
    n_vals = (load(spark, sf_dir, "events")
              .where(F.col("value").isNotNull()).count())
    got = profile(all_queries()["quantile_normalize"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] == 1
    assert s["shuffle_records"] == n_vals


def test_collocation_pmi_shuffles_reduced_states_not_bigrams(spark, sf_dir):
    """collocation_pmi's scale claim measured (r7): the three count
    aggregations are partial-agg'd, so every exchange carries
    (pair|vocab)-cardinality states — never the raw bigram stream —
    and the marginal joins hit the already-reduced pair table."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import _tokens

    docs = load(spark, sf_dir, "documents")
    ws = _tokens(F.col("text"))
    n_bigrams = (docs.where(F.size(ws) >= 2)
                 .agg(F.sum(F.size(ws) - 1)).collect()[0][0])
    got = profile(all_queries()["collocation_pmi"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] < n_bigrams / 10


def test_lang_confusion_aggregates_mapside_to_cells(spark, sf_dir):
    """lang_confusion's scale claim measured (r7): marker scoring is a
    narrow per-row expression; the groupBy partial-aggs each partition
    to <= |langs|^2 cell states and the recall window runs over the
    already-aggregated <= 25-cell table."""
    got = profile(all_queries()["lang_confusion"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 2
    assert s["shuffle_records"] <= 25 * 32 + 25


def test_gopher_rules_aggregates_mapside_to_sources(spark, sf_dir):
    """gopher_rules' scale claim measured (r7): every rule is a narrow
    per-row expression; the groupBy partial-aggs each partition down
    to <= |sources| states, so the exchange carries source-cardinality
    rows, never documents."""
    n_sources = (load(spark, sf_dir, "documents")
                 .select("source").distinct().count())
    got = profile(all_queries()["gopher_rules"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] <= 1
    assert s["shuffle_records"] <= n_sources * 32


def test_importance_sample_is_scan_bound(spark, sf_dir):
    """importance_sample's scale claim measured (r7): max_score is a
    1-row broadcast agg (32 partial states), acceptance is map-side,
    and the report groupBy partial-aggs to <= |langs| states per
    partition — no exchange ever carries the document stream."""
    got = profile(all_queries()["importance_sample"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= (5 + 1) * 32


def test_events_rate_limit_is_one_user_exchange(spark, sf_dir):
    """events_rate_limit's scale claim measured (r7): ONE hash
    exchange on user_id feeds the sort and the RANGE window; the
    filter is map-side after the window — shuffle carries each event
    exactly once."""
    n_events = load(spark, sf_dir, "events").count()
    got = profile(all_queries()["events_rate_limit"](spark, sf_dir))
    s = got["summary"]
    assert s["n_shuffles"] == 1
    assert s["shuffle_records"] == n_events


def test_sample_cap_per_group_is_one_cell_exchange(spark, sf_dir):
    """sample_cap_per_group's scale claim measured (r7): one hash
    exchange on the (lang, source) cell key feeds row_number AND both
    audit aggregates (the agg reuses the window's partitioning, no
    second shuffle of the doc stream)."""
    n_docs = load(spark, sf_dir, "documents").count()
    got = profile(all_queries()["sample_cap_per_group"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= n_docs + 100 * 32


def test_substring_dedup_shuffles_grams_linearly(spark, sf_dir):
    """substring_dedup's scale claim measured (r7): cost is linear in
    corpus grams — the gram stream is exchanged for the df aggregation
    and for the df equi-join, and the per-doc verdict agg partial-aggs
    to doc-cardinality states; nothing is ever quadratic in docs.
    Bound: a small constant multiple of the distinct-gram volume."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        SUBSTR_N, _gram_array,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), r"\s+").alias("ws"))
    n_grams = (toks.select(F.size(_gram_array("ws", SUBSTR_N))
                           .alias("n")).agg(F.sum("n")).collect()[0][0])
    got = profile(all_queries()["substring_dedup"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 4 * n_grams


def test_dedup_containment_blocks_not_cross_joins(spark, sf_dir):
    """dedup_containment's scale claim measured (r7): candidates come
    from the inverted-index equi-join on (hot-pruned) grams — the plan
    must contain no cartesian/nested-loop join, and the pair agg runs
    on already-blocked candidates."""
    df = all_queries()["dedup_containment"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are 1-ROW broadcasts: the
    # n_docs totals folded into the hot-gram threshold (the same shape
    # ngram_jaccard plans; it appears once per re-derivation of the
    # unmaterialized gram branch).  Every one must be the Cross-with-
    # tiny-build flavor; the candidate pair join itself must be a
    # hash equi-join on gram, never a nested loop over docs.
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line and "n_docs" in line, line
    assert "BroadcastHashJoin [gram" in plan


def test_cms_topk_shuffles_sketch_states_not_tokens(spark, sf_dir):
    """cms_topk's scale claim measured (r7): the sketch build
    partial-aggs each partition to <= d*w counter states before the
    exchange, and the probe join broadcasts the sketch — the exchanges
    carry sketch/vocab-cardinality states, never the *d-exploded token
    stream."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        CMS_D, CMS_W, _tokens,
    )

    docs = load(spark, sf_dir, "documents")
    n_toks = (docs.select(F.size(_tokens(F.col("text"))).alias("n"))
              .agg(F.sum("n")).collect()[0][0])
    got = profile(all_queries()["cms_topk"](spark, sf_dir))
    s = got["summary"]
    # the exploded stream is n_toks * CMS_D rows; partial agg must
    # keep the shuffle far below it (vocab + sketch states only)
    assert s["shuffle_records"] < n_toks * CMS_D / 4


def test_kmeans_step_exchanges_model_sized_state(spark, sf_dir):
    """kmeans_step's scale claim measured (r7): assignment is the
    map-side pandas-UDF quantizer (no corpus exchange); the one
    aggregation exchange carries <= K partial states per partition and
    the old-centroid join is a K-row broadcast."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        IVF_K_MAX,
    )

    got = profile(all_queries()["kmeans_step"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= IVF_K_MAX * 32


def test_join_prefix_filter_avoids_hot_gram_blowup(spark, sf_dir):
    """join_prefix_filter's scale claim measured (r7): blocking keys
    on the RAREST prefix grams only, so candidate-pair volume stays a
    tiny fraction of what the naive all-shared-grams join generates —
    the per-gram fan-out the hot-gram skew bomb exploits structurally
    cannot occur.  Measured: the total shuffle volume stays below the
    gram-stream size times a small constant (the naive join's
    candidate stream alone is a large multiple of it)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _gram_array,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), r"\s+").alias("ws"))
    n_grams = (toks.select(F.size(_gram_array("ws", 3)).alias("n"))
               .agg(F.sum("n")).collect()[0][0])
    got = profile(all_queries()["join_prefix_filter"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 8 * n_grams
    assert s["spill_disk_bytes"] == 0


def test_mann_whitney_shuffles_distinct_values_not_samples(spark, sf_dir):
    """mann_whitney's scale claim measured (r7): the rank machinery is
    a two-level distributed prefix sum over the DISTINCT-VALUE table —
    the raw sample stream collapses to per-value counts in its first
    partial aggregation and never travels again.  Every exchange
    (value partials, the bucket repartition for the within-bucket
    windows, bucket totals, the final 1-row agg) is bounded by the
    distinct-value cardinality, not the row count."""
    ev = load(spark, sf_dir, "events") \
        .where(F.col("event_type").isin("purchase", "click"))
    n_rows = ev.count()
    n_distinct = ev.select("value").distinct().count()
    got = profile(all_queries()["mann_whitney"](spark, sf_dir))
    s = got["summary"]
    # the load-bearing bound: a small multiple of DISTINCT values plus
    # constant per-partition window/bucket states.  No rows comparison:
    # the dedup win over the raw stream only materializes when values
    # repeat — on a mostly-unique fixture the scan's ~4 passes over the
    # per-value table legitimately exceed the row count, while at real
    # scale (money values, bounded palettes) distinct ≪ rows (r7
    # review find: the old `< n_rows` assertion encoded the favorable
    # case, not the invariant)
    assert s["shuffle_records"] <= 4 * n_distinct + 64 * 32
    assert n_rows > 0
    assert s["spill_disk_bytes"] == 0


def test_drift_psi_shuffles_reference_values_not_periods(spark, sf_dir):
    """drift_psi's scale claim measured (r7): boundary extraction runs
    on the reference period's distinct-value table (same prefix-sum
    shape as mann_whitney); the full two-period stream is bucketed
    MAP-SIDE against the broadcast 9-value boundary row and partial-
    aggregates to <= 10 bucket states per partition — so total shuffle
    traffic is bounded by reference distinct values plus grid-sized
    state, never the event stream."""
    ev = load(spark, sf_dir, "events")
    n_rows = ev.count()
    n_distinct_ref = ev.where("ts < timestamp '2024-01-16'") \
        .select("value").distinct().count()
    got = profile(all_queries()["drift_psi"](spark, sf_dir))
    s = got["summary"]
    # distinct-cardinality bound only — see the note in
    # test_mann_whitney_shuffles_distinct_values_not_samples for why
    # there is no rows comparison (r7 review find)
    assert s["shuffle_records"] <= 4 * n_distinct_ref + 64 * 32
    assert n_rows > 0
    assert s["spill_disk_bytes"] == 0


def test_acf_lags_reuses_series_partitioning(spark, sf_dir):
    """acf_lags's scale claim measured (r7): the moments window
    (partitionBy only), the three lead() windows (same key, ordered)
    and the final groupBy all cluster on event_type — the stream
    crosses ONE hash exchange; only the 5-row result crosses the final
    ordering exchange.  If the moment aggregation ran as a separate
    groupBy-and-rejoin, or any window picked a different clustering,
    records would cross twice."""
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value"))
    n_rows = ev.count()
    got = profile(all_queries()["acf_lags"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= n_rows + 5 * 32 + 5
    assert s["spill_disk_bytes"] == 0


def test_ngram_novelty_shuffles_pairs_never_text(spark, sf_dir):
    """ngram_novelty's scale claim measured (r7): the text stream
    collapses to distinct (gram, doc_id) pairs map-side; one gram
    exchange feeds both the min-reduce and the join back, and the
    per-doc agg moves one row per pair — total shuffle traffic is
    LINEAR in the pair count (a candidate self-join would be
    quadratic in shared grams), and whole documents never cross an
    exchange.  No bytes-vs-corpus bound: a 3-word gram key is ~3×
    its source text by construction, so pair bytes legitimately
    exceed corpus bytes on short docs — the scale lever at 100 TB is
    a 64-bit gram fingerprint as the shuffle key (same plan), kept
    as raw strings here for the collision-free oracle."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _gram_array,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import WS_RUN

    docs = load(spark, sf_dir, "documents")
    n_pairs = (docs
               .select("doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
               .select(F.explode(_gram_array("ws", 3)).alias("gram"))
               .count())
    got = profile(all_queries()["ngram_novelty"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 5 * n_pairs + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_kaplan_meier_shuffles_subjects_not_curve(spark, sf_dir):
    """kaplan_meier's scale claim measured (r7): one user_id exchange
    builds subjects (map-side partial agg bounds records by the event
    stream), the per-time agg reduces them to day-duration states, and
    the curve windows run over THAT tiny table — total shuffle traffic
    is a small multiple of the event count, never events × steps."""
    n_events = load(spark, sf_dir, "events").count()
    got = profile(all_queries()["kaplan_meier"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 2 * n_events + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_pca_power_iter_shuffles_model_not_matrix(spark, sf_dir):
    """pca_power_iter's scale claim measured (r7): the vector table is
    touched once map-side (quantize, T_i, r_i from the broadcast 1-row
    totals), and the exploded (dim, term) stream partial-aggregates to
    ≤ d states per partition before its exchange — shuffle records are
    O(d · partitions), never O(n · d)."""
    emb = load(spark, sf_dir, "embeddings")
    n, d = emb.count(), 64
    got = profile(all_queries()["pca_power_iter"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 4 * d * 32 + 64
    assert s["shuffle_records"] < n * d
    assert s["spill_disk_bytes"] == 0


def test_bootstrap_ci_never_shuffles_the_expanded_stream(spark, sf_dir):
    """bootstrap_ci's scale claim measured (r7): the n×B Poisson-
    weighted stream partial-aggregates map-side to ≤ groups×B states
    per partition, so its exchange carries O(groups·B·parts) rows; the
    point-estimate agg adds ≤ groups per partition — total shuffle is
    orders of magnitude below n×B."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.sqlapi import (
        BOOT_B,
    )

    n_orders = load(spark, sf_dir, "orders").count()
    got = profile(all_queries()["bootstrap_ci"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 4 * 3 * BOOT_B * 32 + 64 * 32
    assert s["shuffle_records"] < n_orders * BOOT_B
    assert s["spill_disk_bytes"] == 0


def test_rank_fusion_never_globally_sorts(spark, sf_dir):
    """rank_fusion's scale claim measured (r7): both input rankings
    are top-20 sort-limits over pre-reduced per-doc scores, so no
    exchange ever carries more than the per-doc score tables (bounded
    by matching docs, far below the token stream), and the fusion
    join/window moves ≤ 40 rows."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens, BM25_QUERY,
    )

    docs = load(spark, sf_dir, "documents")
    n_tokens = docs.select(
        F.size(_tokens(F.col("text"))).alias("n")).agg(F.sum("n")).first()[0]
    n_match = docs.where(
        F.size(F.filter(_tokens(F.col("text")),
                        lambda t: t.isin(*BM25_QUERY))) > 0).count()
    got = profile(all_queries()["rank_fusion"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 8 * n_match + 64 * 32
    assert s["shuffle_records"] < n_tokens
    assert s["spill_disk_bytes"] == 0


def test_mutual_info_reduces_before_term_math(spark, sf_dir):
    """mutual_info's scale claim measured (r7): the corpus reduces to
    cell/lang/source count tables via partial-agg'd groupBys, the
    quantized-term computation runs on the already-reduced cell table,
    and the final reductions are 1-row — total shuffle traffic is a
    small multiple of the corpus scans' partial states, bounded by the
    (cells + langs + sources) cardinality per partition."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_cells = docs.select("lang", "source").distinct().count()
    got = profile(all_queries()["mutual_info"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 4 * n_cells * 32 + 64 * 32
    assert s["shuffle_records"] < n_docs * 3
    assert s["spill_disk_bytes"] == 0


def test_seasonal_envelope_reuses_one_cell_partitioning(spark, sf_dir):
    """seasonal_envelope's scale claim measured (r7): ONE hash
    exchange on (event_type, hour) feeds the ranking window, the three
    band extractions and the final agg — the filtered stream crosses
    exactly once; the ≤ types×24-row result crosses the ordering
    exchange."""
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value"))
    n_rows = ev.count()
    got = profile(all_queries()["seasonal_envelope"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= n_rows + 5 * 24 * 32 + 5 * 24
    assert s["spill_disk_bytes"] == 0


def test_attribution_linear_joins_on_user_never_cartesian(spark, sf_dir):
    """attribution_linear's scale claim measured (r7): the purchase×
    touch fan-out comes from a user_id EQUI join (range predicate
    inside key groups) — each side crosses one exchange, and total
    shuffle traffic is bounded by the event stream plus the joined
    pair count; no broadcast nested loop over the streams."""
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    got = profile(all_queries()["attribution_linear"](spark, sf_dir))
    s = got["summary"]
    n_pairs = s["output_rows"]  # ≤ channels+1 rows out; use events bound
    assert s["shuffle_records"] <= 6 * n_events + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_collapse_repeats_is_pure_map(spark, sf_dir):
    """collapse_repeats' scale claim measured (r7): the transform is
    one narrow map pass (HOF filter + sha256 per doc) — the only
    exchange is the output ordering, carrying one audit row per doc,
    never document text at stream scale."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    got = profile(all_queries()["collapse_repeats"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= n_docs
    assert s["n_broadcasts"] == 0
    assert s["spill_disk_bytes"] == 0


def test_logit_step_shuffles_model_not_corpus(spark, sf_dir):
    """logit_step's scale claim measured (r8): every per-row term
    (sigmoid, feature micro-units, gradient products, log-loss)
    computes map-side in one scan; the ONLY exchange carries the
    partial-aggregated 1-row gradient state (count + 8 integer sums)
    per map partition — model-sized, never document-sized.  The
    6-row report explodes from that single row with stack(), and no
    broadcast of anything data-sized occurs."""
    got = profile(all_queries()["logit_step"](spark, sf_dir))
    s = got["summary"]
    # one partial state per map partition, far below corpus size
    assert s["shuffle_records"] <= 64
    assert s["spill_disk_bytes"] == 0


def test_naive_bayes_train_shuffles_class_vocab_not_tokens(spark, sf_dir):
    """naive_bayes_train's scale claim measured (r8): the one
    data-sized exchange carries per-partition (class, token) partial
    counts — bounded by the class-vocab cardinality per partition,
    never the token stream (repeats collapse map-side); everything
    after is classes-row / 1-row model state."""
    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import _tokens

    docs = load(spark, sf_dir, "documents")
    pairs = (docs.select("lang",
                         F.explode(_tokens(F.col("text"))).alias("t"))
             .distinct())
    n_pairs = pairs.count()
    n_tok = (docs.select(F.explode(_tokens(F.col("text"))))
             .count())
    got = profile(all_queries()["naive_bayes_train"](spark, sf_dir))
    s = got["summary"]
    # partial-agg bound: <= distinct pairs per partition, x stages
    assert s["shuffle_records"] <= 8 * n_pairs * 32
    assert s["shuffle_records"] < 4 * n_tok
    assert s["spill_disk_bytes"] == 0


def test_source_overlap_state_is_source_squared(spark, sf_dir):
    """source_overlap's scale claim measured (r8): after the linear
    distinct-(source, gram) reduce, every join/aggregate carries at
    most |sources|^2-bounded pair state per gram — the shuffle stays
    a small multiple of the distinct gram-stream size and never the
    doc-pair volume."""
    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import WS_RUN
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _gram_array)

    docs = load(spark, sf_dir, "documents")
    dg = (docs.select("source",
                      F.split(F.lower("text"), WS_RUN).alias("ws"))
          .select("source", F.explode(_gram_array("ws", 3)).alias("g"))
          .distinct())
    n_dg = dg.count()
    n_src = docs.select("source").distinct().count()
    got = profile(all_queries()["source_overlap"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 8 * n_dg + 8 * n_src * n_src * 32
    assert s["spill_disk_bytes"] == 0


def test_minhash_lsh_join_shuffles_signatures_not_pairs(spark, sf_dir):
    """minhash_lsh_join's scale claim measured (r8): the gram stream
    reduces map-side to K-slot signature state (docs x K), banding is
    linear (docs x B), and candidate volume is collision-bounded —
    nothing shuffles at doc-pair scale."""
    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import WS_RUN
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        MINHASH_B, MINHASH_K, _gram_array, _minhash_lsh_join)

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_grams = (docs.select(F.split(F.lower("text"), WS_RUN).alias("ws"))
               .select(F.explode(_gram_array("ws", 3)))
               .count())
    n_pairs = _minhash_lsh_join(spark, sf_dir).count()
    got = profile(all_queries()["minhash_lsh_join"](spark, sf_dir))
    s = got["summary"]
    bound = (8 * n_docs * (MINHASH_K + MINHASH_B)
             + 4 * n_grams + 64 * n_pairs * 32)
    assert s["shuffle_records"] <= bound
    assert s["spill_disk_bytes"] == 0


def test_agg_moments_shuffles_five_numbers_per_group(spark, sf_dir):
    """agg_moments' scale claim measured (r8): the canonical mergeable
    -moments pattern — each map partition reduces to (n, s1..s4) per
    status before the exchange, so shuffle traffic is bounded by
    groups x partitions, never rows."""
    got = profile(all_queries()["agg_moments"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 8 * 32          # statuses x parts
    assert s["spill_disk_bytes"] == 0


def test_roc_auc_shuffles_distinct_scores_not_docs(spark, sf_dir):
    """roc_auc's scale claim measured (r8): the µ-sigmoid score is an
    integer in [0, 10000], so the first partial aggregation collapses
    the corpus onto the distinct-score table (≤ 10001 rows BY
    CONSTRUCTION) and every later exchange — the prefix-scan bucket
    windows, bucket totals, the final 1-row statistic — is bounded by
    that domain, never the doc count (the mann_whitney invariant with
    a structurally capped value domain)."""
    got = profile(all_queries()["roc_auc"](spark, sf_dir))
    s = got["summary"]
    # domain-bounded: partial HashAggregates emit up to one record per
    # distinct score per MAP PARTITION per scan (the plan carries two
    # corpus scans), plus the prefix-scan stages on the reduced table —
    # so the invariant is (partitions x domain)-bounded, corpus-size-
    # independent (r8 review: the first version omitted the partition
    # factor — the favorable case, not the invariant)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert s["shuffle_records"] <= (2 * parts + 4) * 10_001 + 64 * parts
    assert s["spill_disk_bytes"] == 0


def test_calibration_bins_shuffles_ten_bins(spark, sf_dir):
    """calibration_bins' scale claim measured (r8): scoring and bin
    assignment are map-side; the ONE exchange carries ≤ CALIB_BINS
    partial states per map partition."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.analytics import (
        CALIB_BINS,
    )
    got = profile(all_queries()["calibration_bins"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= CALIB_BINS * 64
    assert s["spill_disk_bytes"] == 0


def test_spearman_corr_shuffles_orders_once(spark, sf_dir):
    """spearman_corr's scale claim measured (r8): the per-order item
    count partial-aggregates before its exchange, both rank windows
    share the ONE hash exchange on status, and the moment reduce
    carries 6 numbers per (status, partition) — so total shuffle
    traffic is a small multiple of the ORDER count (the windowed
    frame), never the lineitem count."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n_orders = orders.count()
    n_items = li.count()
    got = profile(all_queries()["spearman_corr"](spark, sf_dir))
    s = got["summary"]
    # per-order rows cross: the count partials (≤ orders), the joined
    # frame into the status exchange (≤ orders), the ranked frame into
    # the second window sort (≤ orders), plus bounded partials
    assert s["shuffle_records"] <= 4 * n_orders + 64 * 32
    assert n_items > n_orders  # the claim is meaningful: items ≫ orders
    assert s["spill_disk_bytes"] == 0


def test_winnow_fingerprint_shuffles_gram_stream_once(spark, sf_dir):
    """winnow_fingerprint's scale claim measured (r8): the positional
    gram stream crosses ONE doc_id hash exchange (both window
    functions share its sort), and the distinct on selected
    fingerprints partial-aggregates map-side first — so shuffle
    traffic is bounded by the gram stream plus the (much smaller)
    selected-fingerprint stream, with no pairwise or repeated-scan
    stage anywhere."""
    from pyspark.sql import functions as SF
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        WINNOW_K, WS_RUN,
    )
    docs = load(spark, sf_dir, "documents")
    n_grams = docs.select(
        SF.greatest(
            SF.size(SF.split(SF.lower("text"), WS_RUN)) - (WINNOW_K - 1),
            SF.lit(0)).alias("g")
    ).agg(SF.sum("g")).collect()[0][0]
    got = profile(all_queries()["winnow_fingerprint"](spark, sf_dir))
    s = got["summary"]
    # gram stream once + selected fingerprints (≤ grams) + partials
    assert s["shuffle_records"] <= 3 * n_grams + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_winnow_join_prunes_hot_fingerprints_before_pairing(spark, sf_dir):
    """winnow_join's scale claim measured (r8): the pair self-join
    keys only on df-pruned fingerprints, so shuffle traffic is the
    fingerprint stream (~2/(W+1) of the gram stream) plus candidate
    pairs whose per-fingerprint fan-out the df threshold caps — never
    a hot-bucket quadratic."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _winnow_rows)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_fps = _winnow_rows(docs).select("doc_id", "fp").distinct().count()
    got = profile(all_queries()["winnow_join"](spark, sf_dir))
    s = got["summary"]
    n_pairs = s["output_rows"]  # profile() already materialized it
    # fingerprint stream crosses a bounded number of stages (distinct
    # partials, df reduce, pair join input) plus the candidate pairs
    assert s["shuffle_records"] <= 6 * n_fps + 4 * n_pairs + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_zipf_fit_shuffles_vocab_not_tokens(spark, sf_dir):
    """zipf_fit's scale claim measured (r8): the token stream
    partial-aggregates onto the (source, token) vocabulary before its
    one exchange; the top-K window and OLS reduce run on that table
    (WindowGroupLimit forwards ~K rows per source)."""
    from pyspark.sql import functions as SF
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_vocab = (docs.select("source",
                           SF.explode(_tokens(SF.col("text")))
                           .alias("tok"))
               .select("source", "tok").distinct().count())
    n_tokens = docs.select(
        SF.sum(SF.size(_tokens(SF.col("text"))))).collect()[0][0]
    got = profile(all_queries()["zipf_fit"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 3 * n_vocab + 64 * 32
    assert n_tokens > n_vocab  # the reduction claim is meaningful
    assert s["spill_disk_bytes"] == 0


def test_js_divergence_shuffles_vocab_and_pair_cells(spark, sf_dir):
    """js_divergence's scale claim measured (r8): one (source, token)
    vocab reduce; the pair join fans each token out to at most
    |sources|² cells; everything downstream is |sources|²-row
    arithmetic with broadcast total joins."""
    from pyspark.sql import functions as SF
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_vocab = (docs.select("source",
                           SF.explode(_tokens(SF.col("text")))
                           .alias("tok"))
               .select("source", "tok").distinct().count())
    n_sources = docs.select("source").distinct().count()
    got = profile(all_queries()["js_divergence"](spark, sf_dir))
    s = got["summary"]
    # vocab crosses the reduce + both join sides; pair rows are
    # bounded by vocab * sources (each (tok, src_a) meets < |sources|
    # partners); the cell table adds |sources|^2 states per partition
    assert s["shuffle_records"] <= (3 + n_sources) * n_vocab \
        + 64 * n_sources * n_sources + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_simhash_join_shuffles_votes_and_bands_not_pairs(spark, sf_dir):
    """simhash_join's scale claim measured (r8; r9 widened to
    2x60-bit prints): the token stream partial-aggregates onto
    (doc, token) once, the 120 vote sums are one mergeable state per
    doc, banding is 4 linear rows per doc (30-bit bands — random
    bucket collisions ~n^2/2^30), and the popcount verify touches
    bucket-collision candidates only — no stage scales with doc
    pairs."""
    from pyspark.sql import functions as SF
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_doc_tok = (docs.select(
        "doc_id",
        SF.explode(SF.split(SF.lower("text"), r"[ \t\n\x0B\f\r]+"))
        .alias("tok"))
        .where(SF.col("tok") != "")
        .select("doc_id", "tok").distinct().count())
    got = profile(all_queries()["simhash_join"](spark, sf_dir))
    s = got["summary"]
    n_pairs = s["output_rows"]  # profile() already materialized it
    # (doc, tok) partials once, vote states once, 4 band rows twice
    # (both join sides), candidates + final sort
    assert s["shuffle_records"] <= 4 * n_doc_tok + 8 * n_pairs + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_token_fertility_shuffles_vocab_not_tokens(spark, sf_dir):
    """token_fertility's scale claim measured (r9): the token stream
    partial-aggregates to per-partition vocab states before its one
    exchange, the top-K vocab cut is TakeOrderedAndProject (K driver
    rows) broadcast back onto the stream, and the language agg's
    state is |langs| rows per partition — shuffle traffic is a
    small multiple of (vocab + langs) per partition, never of the
    token count.  The per-partition factor is carried explicitly
    (the r7 lesson: pins encode the invariant, not the favorable
    case)."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        FERT_VOCAB_K, _tokens)

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    v = toks.select("tok").distinct().count()
    langs = docs.select("lang").distinct().count()
    got = profile(all_queries()["token_fertility"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= \
        34 * (v + langs) + FERT_VOCAB_K + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_novelty_delta_shuffles_grams_linearly(spark, sf_dir):
    """novelty_delta's scale claim measured (r9): the corpus side
    collapses to distinct grams, the batch side to (doc, gram) pairs,
    both exchange hash-partitioned on gram (linear — never a
    candidate self-join), and the per-doc agg moves one row per
    batch pair.  Same bound family as ngram_novelty: total shuffle
    traffic is a small multiple of the full gram-pair count."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        _gram_array,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import WS_RUN

    docs = load(spark, sf_dir, "documents")
    n_pairs = (docs
               .select("doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
               .select(F.explode(_gram_array("ws", 3)).alias("gram"))
               .count())
    got = profile(all_queries()["novelty_delta"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 5 * n_pairs + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_host_dedup_aggregates_urls_never_joins(spark, sf_dir):
    """host_dedup's scale claim measured (r9): canonicalization is
    map-side, the survivor pick partial-aggregates to per-partition
    (domain, canon_url) states (≤ sources × 13 page slots by
    construction), and the rollup exchanges |domains|-sized state —
    shuffle traffic is bounded by the URL-slot universe per
    partition, independent of the document count."""
    docs = load(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    got = profile(all_queries()["host_dedup"](spark, sf_dir))
    s = got["summary"]
    # per-url states ≤ sources × 13 page slots × (www/case/query
    # collapse leaves ONE canon per slot); 34 = 32 partitions + 2
    assert s["shuffle_records"] <= 34 * (n_sources * 13 + n_sources) \
        + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_similarity_recall_costs_the_two_arms_not_more(spark, sf_dir):
    """similarity_recall's scale claim measured (r9): the readout
    adds only query-set-sized work on top of its two arms — the
    exact arm's corpus×|Q| scored stream (the documented evaluation
    harness cost) plus the IVF arm's candidate stream, then a
    broadcast k·|Q| join and 1-row aggregates.  Shuffle traffic is
    bounded by a small multiple of corpus × N_QUERIES and spills
    nothing."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        IVF_NPROBE, N_QUERIES)

    n = load(spark, sf_dir, "embeddings").count()
    got = profile(all_queries()["similarity_recall"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= (N_QUERIES + IVF_NPROBE + 6) * n \
        + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_mirror_detect_prunes_hot_leads_before_pairing(spark, sf_dir):
    """mirror_detect's scale claim measured (r10): the lead
    fingerprint is map-side, the (fp, domain) grain reduce partial-
    aggregates before its exchange, boilerplate leads are df-pruned
    BEFORE the self-join (winnow_join's discipline), and the pair
    aggregate moves candidates only — shuffle traffic is a small
    multiple of the (fp, domain) grain plus candidate pairs, never
    |domains|² per hot lead and never the document stream's text."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        MIRROR_LEAD_N, _derived_pages)
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import WS_RUN

    docs = load(spark, sf_dir, "documents")
    grain = (_derived_pages(docs)
             .where(F.col("text") != "")
             .select(F.sha2(F.concat_ws(
                 " ", F.slice(F.split(F.lower("text"), WS_RUN),
                              1, MIRROR_LEAD_N)), 256).alias("fp"),
                     "domain")
             .distinct().count())
    got = profile(all_queries()["mirror_detect"](spark, sf_dir))
    s = got["summary"]
    n_pairs = s["output_rows"]
    # grain crosses a bounded number of stages (fpd partials, hot-df
    # reduce, two pair-join inputs) plus the pair aggregate
    assert s["shuffle_records"] <= 8 * grain + 4 * n_pairs + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_crawl_frontier_aggregates_urls_never_joins(spark, sf_dir):
    """crawl_frontier's scale claim measured (r10): host_dedup's
    two-level reduce with a map-side quality predicate — per-URL
    states are bounded by the URL-slot universe (sources × 13 page
    slots), the domain rollup by |domains|, and nothing joins."""
    docs = load(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    got = profile(all_queries()["crawl_frontier"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 34 * (n_sources * 13 + n_sources) \
        + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_source_perplexity_shuffles_token_stream_linearly(spark, sf_dir):
    """source_perplexity's scale claim measured (r10): lm_score's
    vocab join (the one token-keyed exchange family — vocab partials
    plus the scored token stream) followed by a source rollup whose
    state is |sources| per partition; total shuffle traffic is a
    small multiple of the token count, never quadratic in anything."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens)

    docs = load(spark, sf_dir, "documents")
    n_toks = docs.select(
        F.size(_tokens(F.col("text"))).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    got = profile(all_queries()["source_perplexity"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 6 * n_toks + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_winnow_coverage_shuffles_gram_stream_once(spark, sf_dir):
    """winnow_coverage's scale claim measured (r10): the winnowing
    selection's one doc_id exchange (winnow_fingerprint's bound) plus
    the selection-sized lag pass and the doc-grain gram-count join —
    bounded by a small multiple of the gram stream, with the audit
    stages adding only selection-sized (~2L/(W+1)) traffic."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        WINNOW_K, WS_RUN)

    docs = load(spark, sf_dir, "documents")
    n_grams = docs.select(
        F.greatest(
            F.size(F.split(F.lower("text"), WS_RUN)) - (WINNOW_K - 1),
            F.lit(0)).alias("g")
    ).agg(F.sum("g")).collect()[0][0]
    got = profile(all_queries()["winnow_coverage"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 5 * n_grams + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_ivfpq_recall_costs_the_arms_not_more(spark, sf_dir):
    """ivfpq_recall's scale claim measured (r10): the readout pays
    its three arms — the exact corpus×|Q| evaluation stream, the IVF
    candidate stream (counted twice: once scored for `scanned`, once
    as ivfpq's ADC input), and the ids-only top-k exchanges — plus
    query-set-sized joins; PQ encode and cell assignment are
    zero-shuffle map passes (codebooks/centroids ride in UDF
    closures), so total traffic stays a small multiple of
    corpus × N_QUERIES with nothing quadratic in the corpus."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        IVF_NPROBE, N_QUERIES)

    n = load(spark, sf_dir, "embeddings").count()
    got = profile(all_queries()["ivfpq_recall"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= (N_QUERIES + 3 * IVF_NPROBE + 8) * n \
        + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_burst_detect_shuffles_hourly_summaries_not_events(
        spark, sf_dir):
    """burst_detect's scale claim measured (r11): the (type, hour)
    rate table is ONE partial-agg'd reduce — the exchanges carry
    hourly summaries (bounded by the densified per-type hour span),
    never the raw event stream."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.timeseries import (
        BURST_BUCKET_S)

    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_buckets = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / BURST_BUCKET_S)).count().count()
    got = profile(all_queries()["burst_detect"](spark, sf_dir))
    s = got["summary"]
    # cnts partials + densified series through baseline/island windows:
    # a small multiple of the BUCKET count, far under the event count
    assert s["shuffle_records"] <= 6 * n_buckets + 64 * 32
    assert s["shuffle_records"] < n_events
    assert s["spill_disk_bytes"] == 0


def test_heaps_law_shuffles_vocab_and_docs_not_tokens(spark, sf_dir):
    """heaps_law's scale claim measured (r11): first occurrences are
    doc-grain — the (source, token) reduce partial-aggregates the
    token stream map-side, and everything downstream (per-doc counts,
    the cumulative window, the bounded OLS) moves vocab- or doc-sized
    rows.  Total shuffle traffic must stay far under the token-
    instance count."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens)

    docs = load(spark, sf_dir, "documents")
    n_tokens = docs.select(
        F.size(_tokens(F.col("text"))).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    vocab = (docs.select("source",
                         F.explode(_tokens(F.col("text"))).alias("t"))
             .distinct().count())
    n_docs = docs.count()
    got = profile(all_queries()["heaps_law"](spark, sf_dir))
    s = got["summary"]
    assert s["shuffle_records"] <= 4 * vocab + 6 * n_docs + 64 * 32
    assert s["shuffle_records"] < n_tokens
    assert s["spill_disk_bytes"] == 0


def test_filter_funnel_reduces_to_one_row_without_corpus_joins(
        spark, sf_dir):
    """filter_funnel's scale claim measured (r11): the verdict flags
    are one narrow corpus pass; the shuffles carry the digest-keyed
    dedup window's survivor ids, the LM model join's token stream
    (lm_score's own bound), and a single 5-counter aggregate row —
    a small multiple of the token count, nothing quadratic."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        _tokens)

    docs = load(spark, sf_dir, "documents")
    n_tokens = docs.select(
        F.size(_tokens(F.col("text"))).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    got = profile(all_queries()["filter_funnel"](spark, sf_dir))
    s = got["summary"]
    assert s["output_rows"] >= 4          # the 4 stage rows
    assert s["shuffle_records"] <= 6 * n_tokens + 64 * 32
    assert s["spill_disk_bytes"] == 0


def test_dedup_semantic_broadcasts_centroids_and_joins_cells_only(
        spark, sf_dir):
    """dedup_semantic's scale claim measured (r11): cell assignment is
    assign_cells' zero-shuffle map pass, cent_cos is a BROADCAST join
    against the <= IVF_K_MAX centroid rows, and the pair join is the
    family's bounded within-cell equi-join — total shuffle traffic is
    a small multiple of the corpus row count (ids + cells + verdict
    flags), never Σ|cell|² payloads and never a cartesian."""
    n = load(spark, sf_dir, "embeddings").count()
    got = profile(all_queries()["dedup_semantic"](spark, sf_dir))
    s = got["summary"]
    assert s["n_broadcasts"] >= 1
    assert s["shuffle_records"] <= 8 * n + 64 * 32
    assert s["spill_disk_bytes"] == 0
