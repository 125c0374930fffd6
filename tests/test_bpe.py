"""BPE trainer invariants: deterministic merge table, sane greedy
dynamics, word-boundary respect."""

from __future__ import annotations

import pyspark.sql.functions as F

from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
    BPE_END, bpe_train,
)
from mvp_mini_etl_pipeline_1762911573_spark.tables import load

N_MERGES = 12


def test_bpe_train_deterministic_and_greedy(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=N_MERGES)
    assert 0 < len(merges) <= N_MERGES
    # deterministic: retraining yields the identical merge table
    assert bpe_train(docs, n_merges=N_MERGES) == merges
    # later merges can never beat the frequency of the pair an earlier
    # round chose AT THAT TIME only if they existed then — but a merge
    # can CREATE new high-frequency pairs, so the only safe greedy
    # invariant is positivity and the min-freq floor
    assert all(f >= 2 for (_, _, f) in merges)
    # merged symbols never span the word-end marker's right side
    # (nothing can follow </w> inside a word)
    assert all(not a.endswith(BPE_END) for (a, _, _) in merges)


def test_bpe_merges_shrink_the_corpus(spark, sf_dir):
    """Applying round k's merge must strictly shrink the total symbol
    count, by at most that round's counted pair frequency (overlapping
    runs like 'aaa' merge fewer times than they count)."""
    docs = spark.createDataFrame(
        [(1, "aa aa aaa banana banana bandana"),
         (2, "banana bandana cabana"),
         (3, "aa banana")],
        "doc_id long, text string")
    merges = bpe_train(docs, n_merges=6)
    assert merges
    # replay the trainer's state transitions locally and check counts
    words = {}
    for r in (docs.select(F.explode(F.filter(
            F.split(F.lower("text"), r"\s+"), lambda t: t != ""))
            .alias("w")).groupBy("w").count().collect()):
        words[tuple(r.w) + (BPE_END,)] = r["count"]
    for (a, b, freq) in merges:
        total_before = sum(len(s) * n for s, n in words.items())
        nxt = {}
        for s, n in words.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        words = nxt
        total_after = sum(len(s) * n for s, n in words.items())
        shrink = total_before - total_after
        assert 0 < shrink <= freq


def test_bpe_train_empty_and_degenerate_corpora(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(docs, n_merges=3) == []
    # single-character words: only (char, </w>) pairs exist; merging
    # them leaves nothing mergeable
    docs1 = spark.createDataFrame(
        [(1, "a a a b")], "doc_id long, text string")
    merges = bpe_train(docs1, n_merges=5)
    assert merges and merges[0][:2] == ("a", BPE_END)


def test_bpe_encode_differential_python_replay(spark, sf_dir):
    """The distributed encode (vocab-level Arrow UDF + broadcast join
    + integer sums) must agree doc-for-doc with a straight Python
    replay: tokenize each doc with the Java-\\s-equivalent ASCII
    split, bpe_apply each token against the SAME merge table, sum."""
    import re

    from mvp_mini_etl_pipeline_1762911573_spark.functions.text import (
        bpe_apply, bpe_merges_for)
    from mvp_mini_etl_pipeline_1762911573_spark.registry import all_queries

    docs = load(spark, sf_dir, "documents")
    merges = [(a, b) for a, b, _ in bpe_merges_for(docs)]
    assert merges

    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in all_queries()["bpe_encode"](spark, sf_dir).collect()}

    expect = {}
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in re.split(r"[ \t\n\r\f\v]+", r.text.lower())
                if t]
        if toks:
            expect[r.doc_id] = (
                len(toks),
                sum(len(bpe_apply(t, merges)) for t in toks))
    assert got == expect
