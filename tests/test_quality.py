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
