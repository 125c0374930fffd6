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


def test_new_query_goldens(spark):
    """Round-2 additions pinned at sf0.001: TPC-H shapes through the
    SQL front door, the IVF ANN path, int8 quantization, and the
    stream-stream correlation — exact values, trips before the oracle
    gate on any semantic drift."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    q = all_queries()
    sf = "/root/testdata/sf0.001"

    assert [tuple(r) for r in q["sql_q5"](spark, sf).collect()] == \
        [("NATION_12", 49750.99)]
    assert [tuple(r) for r in q["sql_q22"](spark, sf).collect()] == \
        [("FURNITURE", 1, 7234.68)]
    assert [tuple(r) for r in
            q["similarity_ivf"](spark, sf).orderBy("q_id", "rnk")
            .limit(3).collect()] == \
        [(0, 17, 0.334456, 1), (0, 225, 0.315127, 2), (0, 12, 0.311027, 3)]
    assert q["stream_correlate"](spark, sf).count() == 3
    assert [tuple(r) for r in
            q["embedding_quantize"](spark, sf).orderBy("vec_id")
            .limit(1).collect()] == \
        [(0, -0.302343, 0.256886, 67, 144, 96, 146, 0.00049694)]


def test_dedup_family_goldens(spark):
    """The round-2 dedup/quality additions pinned at sf0.001: the
    embedding near-dup pairs, their transitive clusters, the
    salt-invariant join, and the constraint audit (whose nonzero rows
    are exactly the injected user-feed dirt: 15 dups, 7 null emails,
    6 bad dates)."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from pyspark.sql import functions as F
    q = all_queries()
    sf = "/root/testdata/sf0.001"

    # SemDeDup form: pairwise within deterministic quantizer cells
    # (cross-cell pairs are out of candidate scope by design)
    de = q["dedup_embedding"](spark, sf)
    assert de.count() == 17
    assert [tuple(r) for r in de.orderBy("dup_id").limit(2).collect()] == \
        [(172, 23, 0.419052), (173, 172, 0.447646)]

    dc = q["dedup_clusters"](spark, sf)
    assert dc.count() == 33
    assert tuple(dc.orderBy(F.desc("cluster_size"), "cluster_id",
                            "doc_id").first()) == (23, 23, 3)

    assert sorted(tuple(r) for r in
                  q["join_salted"](spark, sf).collect()) == [
        ("AUTOMOBILE", 226, 56846345.81), ("BUILDING", 342, 80389802.88),
        ("FURNITURE", 403, 101849260.91), ("HOUSEHOLD", 224, 60582938.79),
        ("MACHINERY", 305, 74778443.22)]

    assert sorted(tuple(r) for r in
                  q["quality_audit"](spark, sf).collect()) == [
        ("customer_dup_pk", 0), ("customer_null_pk", 0),
        ("events_null_ts", 0), ("orders_nonpositive_total", 0),
        ("orders_null_custkey", 0), ("orders_orphan_custkey", 0),
        ("users_bad_date", 6), ("users_dup_id", 15),
        ("users_null_email", 7)]

    assert tuple(q["token_count"](spark, sf).orderBy("doc_id")
                 .first()) == (0, 23, 17, 23, 32, 128)


def test_tpch_and_pipeline_goldens(spark):
    """Late round-2 additions pinned at sf0.001: TPC-H scalar results,
    chunking/packing invariants, and the statistics battery."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from pyspark.sql import functions as F
    q = all_queries()
    sf = "/root/testdata/sf0.001"

    assert q["sql_q6"](spark, sf).first()[0] == 659204.11
    assert q["sql_q14"](spark, sf).first()[0] == 34.6313
    assert [tuple(r) for r in q["sql_q12"](spark, sf).collect()] == \
        [("A", 107, 193), ("N", 139, 195), ("R", 108, 187)]

    dc = q["doc_chunk"](spark, sf)
    assert dc.count() == 1168
    # doc 0 has 23 tokens -> exactly one (short) chunk
    assert [tuple(r) for r in
            dc.where("doc_id = 0")
              .select("chunk_id", "chunk_start", "chunk_len")
              .collect()] == [(0, 0, 23)]

    sp = q["seq_pack"](spark, sf)
    totals = sp.agg(F.sum("pack_tokens"), F.sum("n_docs")).first()
    # packing is a partition of the corpus: token and doc totals are
    # conserved exactly
    assert tuple(totals) == (27939, 500)
    assert sp.count() == 116

    # r13 exact-cents co-moment rewrite: covariances are exact 4dp
    # half-up ratios now (previously 0dp double rounds)
    assert tuple(q["agg_corr"](spark, sf)
                 .where("l_returnflag = 'A'").first()) == \
        ("A", -0.020151, -8878.6251, -8874.0998, 14.4432, 1962)

    hist = sorted(tuple(r) for r in
                  q["agg_histogram"](spark, sf).collect())
    assert hist[0] == (0, 200, 1320.51, 63618.58)
    assert sum(h[1] for h in hist) == 1500  # every order lands in a bin


def test_analytics_and_curation_goldens(spark):
    """Session-3 additions pinned at sf0.001: funnel conversion,
    decontamination hits, SCD2 interval invariants, vocab head,
    z-score outliers, cohort retention."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from pyspark.sql import functions as F
    q = all_queries()
    sf = "/root/testdata/sf0.001"

    assert [tuple(r) for r in q["funnel_steps"](spark, sf).collect()] == [
        (1, "signup", 15, 1.0, 1.0),
        (2, "view", 8, 0.5333, 0.5333),
        (3, "purchase", 2, 0.25, 0.1333),
    ]

    decon = {(r.train_doc, r.bench_doc): r.overlap
             for r in q["decontaminate"](spark, sf).collect()}
    assert len(decon) == 10
    # the planted near-dup pairs that straddle the %10 benchmark split
    # must surface as contamination with near-total gram overlap
    assert decon[(5, 450)] == 1.0 and decon[(467, 110)] == 1.0
    assert min(decon.values()) >= 0.98

    scd = q["scd2_intervals"](spark, sf)
    assert scd.count() == 59
    # exactly one open (current) interval per user in the slice
    assert scd.where("is_current").count() == 1
    # intervals tile the slice: n_events sums to the event count
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    n_ev = (load(spark, sf, "events")
            .where("user_id % 100 = 7").count())
    assert scd.agg(F.sum("n_events")).first()[0] == n_ev

    v = q["vocab_topk"](spark, sf).collect()
    assert (v[0].rnk, v[0].tok, v[0].freq) == (1, "scan", 984)
    assert len(v) == 31
    # cumulative coverage is monotone and ends at the full top-31 share
    shares = [r.cum_share for r in v]
    assert shares == sorted(shares)

    assert q["events_zscore"](spark, sf).count() == 18
    assert sorted(tuple(r) for r in
                  q["retention_cohorts"](spark, sf).collect()) == [
        ("2024-01-01", off, 15, 1.0) for off in range(5)]


def test_fallback_metrics_golden(spark):
    """The vendored etl.json fallback document must keep the
    reference's exact metric values (restart.js:12 contract)."""
    from mvp_mini_etl_pipeline_1762911573_spark.sources.static_json import (
        fallback_metrics,
    )
    assert fallback_metrics(spark).first().asDict() == {
        "rows_in": 1240, "rows_out": 1210, "dedup_removed": 30,
        "countries": 21, "duration_sec": 95, "last_user": "N/A"}
