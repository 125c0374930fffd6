"""Semantic quality of the approximate operators: LSH candidates must
actually FIND the things they exist to find (deterministic given the
pinned seeds/permutations — these are exact assertions, not flaky
statistical ones)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries


def test_minhash_recall_on_near_dups(spark, sf_dir):
    """Every exact word-3-gram-Jaccard >= 0.8 pair (the planted
    near-dups) must be recalled by the MinHash-LSH candidates: with 8
    bands of 4 rows, P(miss at j=0.8) = (1-0.8^4)^8 ≈ 0.7%^... ≈ 0.9%
    per pair — and the pinned permutations make the outcome fixed."""
    exact = all_queries()["dedup_ngram_jaccard"](spark, sf_dir)
    truth = {(r.doc_a, r.doc_b)
             for r in exact.where(F.col("jaccard") >= 0.8).collect()}
    assert truth, "testdata should contain planted near-dup docs"
    found = {(r.doc_a, r.doc_b)
             for r in all_queries()["dedup_near"](spark, sf_dir).collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.8, f"minhash recall {recall:.2f} over {len(truth)} pairs"


def test_minhash_candidate_volume_bounded(spark, sf_dir):
    """Precision companion to the recall test (round-3 verdict #7):
    the classic LSH regression is a banding bug that floods candidates
    (e.g. hashing a constant slice puts every doc in one bucket) —
    recall stays perfect, so only a VOLUME bound catches it.  Measured
    candidate:true ratios are ~1.2 (33:28 at sf0.001, 31:25 at
    sf0.01); 3x leaves noise headroom while a bucketing collapse
    (~n^2/2 pairs ≈ 125k) overshoots it by orders of magnitude."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_cand = lsh_candidate_pairs(minhash_signatures(docs)).count()
    n_true = all_queries()["dedup_ngram_jaccard"](spark, sf_dir).count()
    assert n_true > 0, "testdata should contain planted near-dup docs"
    assert n_cand <= 3 * n_true, \
        f"LSH produced {n_cand} candidates for {n_true} true pairs"
    # absolute flood guard, independent of the truth set
    assert n_cand < 0.005 * n_docs * (n_docs - 1) / 2


def test_lsh_ann_candidates_are_truly_similar(spark, sf_dir):
    """Every pair the LSH join emits must genuinely clear the cosine
    threshold (precision == 1.0 by construction — candidates are
    exact-rescored), and at sf>=0.01 it must emit something."""
    pairs = all_queries()["similarity_join"](spark, sf_dir).collect()
    for r in pairs:
        assert r.cos_sim >= 0.4
    if "0.001" not in sf_dir:
        assert pairs


def test_simhash_pairs_low_hamming(spark, sf_dir):
    got = all_queries()["dedup_simhash"](spark, sf_dir).collect()
    assert all(r.hamming <= 3 for r in got)


def test_ivf_recall_beats_random_probe(spark, sf_dir):
    """IVF semantic quality: recall@5 vs the exact brute-force top-k.
    The fixture embeddings are near-worst-case for IVF (random gaussian,
    no cluster structure), so the defensible bar is 'probing nprobe of
    K cells via the quantizer recovers MORE than nprobe/K of the true
    neighbors' — i.e. the coarse quantizer routes queries better than
    random cell choice.  Deterministic (stride seeding): measured
    recall is 0.50 at sf0.001 and 0.34 at sf0.01 vs a ~0.22 random-
    probe baseline."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        IVF_NPROBE, IVF_STRIDE,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    q = all_queries()
    exact = {(r.q_id, r.n_id)
             for r in q["similarity_topk"](spark, sf_dir).collect()}
    ivf = {(r.q_id, r.n_id)
           for r in q["similarity_ivf"](spark, sf_dir).collect()}
    recall = len(exact & ivf) / len(exact)
    n_cells = (load(spark, sf_dir, "embeddings")
               .where(F.col("vec_id") % IVF_STRIDE == 0).count())
    random_probe_baseline = IVF_NPROBE / max(n_cells, IVF_NPROBE)
    assert recall > random_probe_baseline + 0.05
    assert recall >= 0.3


def test_pq_codes_shape_and_range(spark, sf_dir):
    """PQ encoding contract: every vector compresses to exactly PQ_M
    codeword ids, each in [0, PQ_K) — i.e. 4-bit codes, the 64x
    storage cut the docstring claims (bit-packing is storage-side)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        PQ_K, PQ_M, pq_encode,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    got = pq_encode(emb)
    n = emb.count()
    assert got.count() == n
    bad = got.where(
        (F.size("codes") != PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= PQ_K)))
    assert bad.count() == 0


def test_pq_adc_recall_beats_random(spark, sf_dir):
    """PQ semantic quality, same defensible bar as the IVF test: the
    fixture embeddings are random gaussian — PQ's worst case (no
    cluster structure for the k-means codebooks to exploit) — so the
    bar is 'ADC top-k recovers an order of magnitude more of the true
    L2 top-k than random picks would'.  Deterministic (stride-seeded
    k-means init, fixed iterations): measured mean recall@5 is 0.12
    at sf0.001 and 0.30 at sf0.01 vs a ~0.01 random baseline."""
    import numpy as np

    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        N_QUERIES, TOPK, pq_search,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype="float64")
    got = pq_search(emb).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.n_id)
    recalls = []
    for q in range(N_QUERIES):
        qv = mat[ids == q][0]
        d = ((mat - qv) ** 2).sum(1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:TOPK]])
        recalls.append(len(exact & by_q.get(q, set())) / TOPK)
    mean_recall = sum(recalls) / len(recalls)
    random_baseline = TOPK / (len(ids) - 1)
    assert mean_recall >= 10 * random_baseline
    assert mean_recall >= 0.1


def test_ivfpq_prunes_and_still_routes(spark, sf_dir):
    """The composed IVF+PQ index must (a) score strictly fewer
    candidates than the exhaustive PQ scan (the pruning is real),
    (b) agree with pq_search on a meaningful share of its hits
    (the ADC scoring is the same model), and (c) stay well above the
    random-pick baseline."""
    import numpy as np

    from mvp_mini_etl_pipeline_1762911573_spark.operators.similarity import (
        IVF_NPROBE, IVF_STRIDE, N_QUERIES, TOPK, ivfpq_search, pq_search,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    got = ivfpq_search(emb).collect()
    assert got, "ivfpq must return neighbors"
    full = {(r.q_id, r.n_id) for r in pq_search(emb).collect()}
    pruned = {(r.q_id, r.n_id) for r in got}
    # per-query candidate pool is the probed cells only — with ~n/61
    # centroids and nprobe=2 the pool is a small fraction of n, so
    # full agreement with the exhaustive scan would be suspicious,
    # zero agreement means the routing is broken
    overlap = len(full & pruned) / len(pruned)
    assert 0 < overlap < 1
    # routing quality vs the true L2 top-k (same bar as the IVF test)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype="float64")
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.n_id)
    recalls = []
    for q in range(N_QUERIES):
        qv = mat[ids == q][0]
        d = ((mat - qv) ** 2).sum(1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:TOPK]])
        recalls.append(len(exact & by_q.get(q, set())) / TOPK)
    assert sum(recalls) / len(recalls) >= 5 * TOPK / (n - 1)


def test_hll_sketch_estimates_near_exact(spark, sf_dir):
    """Sketch quality under the r8 sketch-contract schema: every row's
    estimate_in_bound must hold (the operator itself asserts ≤5%
    relative error, ~6σ for lgK=14), raw per-group estimates recomputed
    here must sit within the tighter 2% at test scale, and the
    sketch-union 'ALL' row must estimate the GLOBAL distinct count
    (users appear under several event types — the union must not
    double-count them the way sum-of-groups would)."""
    from pyspark.sql import functions as F

    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    rows = {r.event_type: r
            for r in all_queries()["agg_hll_sketch"](spark, sf_dir).collect()}
    assert all(r.estimate_in_bound for r in rows.values())
    exact_all = (load(spark, sf_dir, "events")
                 .select("user_id").distinct().count())
    assert rows["ALL"].exact_users == exact_all
    # union != sum of per-group counts (overlap collapses)
    assert exact_all < sum(r.exact_users for et, r in rows.items()
                           if et != "ALL")
    # raw estimates (not part of the driver contract) at the tighter 2%
    ev = load(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.countDistinct("user_id").alias("exact"))
    for r in sk.select("event_type",
                       F.hll_sketch_estimate("sk").alias("est"),
                       "exact").collect():
        assert abs(r.est - r.exact) <= max(0.02 * r.exact, 1)
    est_all = (sk.agg(F.hll_union_agg("sk").alias("u"))
               .select(F.hll_sketch_estimate("u").alias("e"))
               .collect()[0].e)
    assert abs(est_all - exact_all) <= max(0.02 * exact_all, 1)


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    """The relational bloom filter must flag EVERY batch doc whose
    text is in the existing corpus (bloom filters cannot produce false
    negatives — every probe position of an inserted item is set by
    construction), and at the registered sizing (m=65536, k=5) the
    false-positive rate over genuinely-new docs stays under 5% on the
    fixtures."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        BLOOM_EXISTING_HI, QUERIES)

    row = QUERIES["dedup_bloom"](spark, sf_dir).collect()[0]
    assert row.n_missed == 0
    assert row.n_flagged >= row.n_true_dup
    n_new = row.n_batch - row.n_true_dup
    if n_new:
        assert row.n_false_pos / n_new <= 0.05


def test_bloom_small_filter_floods_false_positives(spark, sf_dir):
    """Sizing sanity in the other direction: an UNDERSIZED filter
    (m=64) must saturate and flag essentially everything — proving the
    fp column actually measures filter behavior rather than being
    structurally zero."""
    import pyspark.sql.functions as F
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        BLOOM_EXISTING_HI, BLOOM_BATCH_LO, _sha_bucket, bloom_flags)
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    b = docs.select("doc_id", "text",
                    _sha_bucket(F.col("doc_id"), 100).alias("bucket"))
    flags = bloom_flags(b.where(F.col("bucket") < BLOOM_EXISTING_HI),
                        b.where(F.col("bucket") >= BLOOM_BATCH_LO),
                        m=64, k=2)
    agg = flags.agg(
        F.count("*").alias("n"),
        F.sum((F.col("all_hit") == 1).cast("bigint")).alias("flagged"),
    ).collect()[0]
    assert agg.flagged >= 0.9 * agg.n


def test_priority_sample_structure_and_estimator(spark, sf_dir):
    """sample_priority structural guarantees: exactly K=5 survivors
    per stratum (every fixture stratum has > K docs), each survivor's
    Horvitz-Thompson estimate is >= its own weight (w_hat = max(w,
    tau)), and the per-stratum estimated total sum(w_hat) lands within
    a loose factor of the true total n_chars — one 5-of-25 draw is
    noisy, but an estimator bug (tau from the wrong stratum, rank off
    by one) throws it far outside [0.2x, 5x]."""
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    out = all_queries()["sample_priority"](spark, sf_dir)
    per = {r.source: r for r in out.groupBy("source").agg(
        F.count("*").alias("n"),
        F.min((F.col("w_hat") >= F.col("w")).cast("int")).alias("ht_ok"),
        F.sum("w_hat").alias("est_total")).collect()}
    truth = {r.source: r.total for r in
             load(spark, sf_dir, "documents").groupBy("source")
             .agg(F.sum("n_chars").alias("total")).collect()}
    assert set(per) == set(truth)
    for src, row in per.items():
        assert row.n == 5, f"{src}: {row.n} survivors"
        assert row.ht_ok == 1, f"{src}: w_hat < w"
        assert 0.2 * truth[src] <= row.est_total <= 5 * truth[src], (
            f"{src}: est {row.est_total} vs true {truth[src]}")


def test_heavy_hitters_candidates_cover_truth(spark, sf_dir):
    """The KPS sketch pass must return a SUPERSET of the true hitters
    (the guarantee the two-pass determinism argument rests on) while
    staying bounded at 1/support candidates."""
    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import _tokens
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    toks = load(spark, sf_dir, "documents").select(
        F.explode(_tokens(F.col("text"))).alias("tok"))
    cands = set(toks.freqItems(["tok"], support=0.01).first()[0])
    assert len(cands) <= 100 + 1
    n = toks.count()
    truth = {r.tok for r in toks.groupBy("tok").count()
             .where(F.col("count") > 0.01 * n).collect()}
    assert truth, "fixtures should contain >1% tokens"
    assert truth <= cands, f"sketch dropped true hitters: {truth - cands}"


def test_fuzzy_join_blocking_prunes_candidates(spark, sf_dir):
    """The linkage blocking must actually prune: candidate pairs
    (same block) should be a small fraction of all-pairs, else the
    levenshtein pass degenerates toward the O(n²) cross join the
    operator exists to avoid.  Also sanity-check the matches: every
    emitted pair agrees on the block token and respects the distance
    threshold."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.joins import (
        FUZZY_MAX_DIST,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load

    names = (load(spark, sf_dir, "part")
             .select("p_name").distinct()
             .withColumn("block",
                         F.regexp_extract("p_name", r"(\S+)$", 1)))
    n = names.count()
    all_pairs = n * (n - 1) // 2
    candidates = (names.groupBy("block").count()
                  .agg(F.sum(F.expr("count * (count - 1) / 2")))
                  .collect()[0][0])
    assert candidates < all_pairs / 3, (
        f"blocking kept {candidates}/{all_pairs} pairs — not pruning")

    matches = all_queries()["join_fuzzy"](spark, sf_dir).collect()
    assert matches, "fixture part names should contain near matches"
    for r in matches:
        assert r.dist <= FUZZY_MAX_DIST
        assert r.name_a.rsplit(" ", 1)[-1] == r.name_b.rsplit(" ", 1)[-1]


def test_graph_bfs_distances_are_sound(spark, sf_dir):
    """BFS output invariants: seeds (node % 100 == 0) sit at distance
    0, every distance is within the shared hop bound, each node
    appears once, and every distance-d node (d >= 1) has a neighbor at
    d-1 (the triangle-inequality witness that hop counts are real BFS
    levels, not loop artifacts)."""
    from mvp_mini_etl_pipeline_1762911573_spark.operators.dedup import (
        BFS_MAX_HOPS, TRIANGLE_THRESHOLD, _embedding_pair_edges,
    )

    rows = all_queries()["graph_bfs"](spark, sf_dir).collect()
    dist = {r.node: r.dist for r in rows}
    assert len(dist) == len(rows), "duplicate node labels"
    assert all(0 <= d <= BFS_MAX_HOPS for d in dist.values())
    assert all(dist[n] == 0 for n in dist if n % 100 == 0)

    edges = _embedding_pair_edges(spark, sf_dir,
                                  threshold=TRIANGLE_THRESHOLD).collect()
    nbrs: dict[int, set] = {}
    for e in edges:
        nbrs.setdefault(e.keep_id, set()).add(e.dup_id)
        nbrs.setdefault(e.dup_id, set()).add(e.keep_id)
    for node, d in dist.items():
        if d >= 1:
            assert any(dist.get(m) == d - 1 for m in nbrs[node]), (
                f"node {node} at dist {d} has no parent at {d - 1}")


def test_rows_only_queries_are_partition_invariant(spark, sf_dir):
    """Reshard determinism for the four rows-only queries (r10): every
    oracle-backed query is partition-invariance-proven transitively
    (green at 8 shuffle partitions in this suite and 32 in the driver,
    both against partition-independent DuckDB), but the rows-only
    four have no value-hash pin anywhere — a tie broken by arbitrary
    partition order would ship silently.  On a real cluster both the
    scan splits and the shuffle fan-out differ from local[32], so:
    collect each query, re-collect under a different shuffle count AND
    forcibly shredded scan splits (tiny maxPartitionBytes / zero open
    cost), and require the output SETS bit-identical.  Also verified
    once at sf0.01 (15/30/73/500 rows, all identical)."""
    canon = lambda df: sorted(  # noqa: E731
        tuple(str(x) for x in r) for r in df.collect())
    queries = all_queries()
    for name in ["similarity_join", "dedup_near", "dedup_simhash",
                 "bpe_encode"]:
        base = canon(queries[name](spark, sf_dir))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        try:
            pert = canon(queries[name](spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
            spark.conf.unset("spark.sql.files.openCostInBytes")
        assert base == pert, (
            f"{name} output differs under perturbed partitioning: "
            f"{len(base)} vs {len(pert)} rows; first diffs "
            f"{list(set(base) ^ set(pert))[:3]}")
