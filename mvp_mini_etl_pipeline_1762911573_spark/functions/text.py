"""Text analysis for training-data pipelines (SURVEY.md §2.8 F16 + EXT:
language-ID, quality scoring, token counting, fingerprinting).

No reference counterpart (the reference has no text corpus); mandated
by the BASELINE.json north star, exercised on the driver `documents`
table.

All built-ins (split/regexp/aggregate HOFs) — narrow maps, no shuffle,
codegen-friendly.  At 100 TB these run as pure scan+project over the
corpus; only the corpus-level stats (`text_stats` grouping) shuffle a
few aggregate states per (lang, source).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..tables import load
from .exact import (round4_ratio, round4_ratio_dec,
                    round4_ratio_dec_sql, round4_ratio_sql)

# Tiny stopword list for the quality score (public, generic).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# n-gram heuristic language markers — deterministic and public;
# a stand-in for real n-gram LM language-ID (fasttext-style) which
# would be a broadcast model + pandas UDF at production quality.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["的", "是", "在"],
}


def _tokens(col):
    return F.filter(F.split(F.lower(col), WS_RUN), lambda t: t != "")


# GPT-2-style pre-tokenizer split (public pattern family): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs.
# No lookarounds, so Java regex (Spark) and RE2 (DuckDB) agree exactly.
# Real BPE would further split these pieces against a merges table —
# the PIECE COUNT is the standard cheap upper-ish bound used for corpus
# token budgeting.
#: Whitespace, pinned to an EXPLICIT char class on BOTH engines.
#: Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB) omits \x0B
#: (vertical tab), so any '\s' shared between a Spark regex and its
#: oracle is a latent divergence on VT-bearing text (r7 review find;
#: the udtf_tokens pair pins the RE2 class instead, its own contract).
#: The explicit class keeps Spark behavior bit-identical (hashes
#: stable) and drags DuckDB onto it.
WS_CHARS = r" \t\n\x0B\f\r"
WS_RUN = f"[{WS_CHARS}]+"        # tokenizer split run (both engines)
_BPE_SPLIT = (r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
              + f"| ?[^{WS_CHARS}a-zA-Z0-9]+")


def _token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, three estimators a corpus budget actually uses:
    whitespace tokens (+ distinct), a BPE-ish pre-tokenizer regex piece
    count (_BPE_SPLIT), and the ceil(chars/4) rule-of-thumb.  All
    narrow per-row expressions — JVM regex, no shuffle, no UDF."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count("text", F.lit(_BPE_SPLIT)).alias("bpe_pieces"),
        F.ceil(F.length("text") / 4).cast("bigint").alias("est_bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


def _quality_feature_cols() -> dict:
    """The C4/Gopher-style quality signals over ``F.col("text")``,
    ratios rounded to 4dp — the SINGLE source of truth shared by the
    `text_quality` report and the `quality_logit` classifier, whose
    contract is exactly these signals (two copies once drifted a
    review; a fix to one would silently desynchronize the other)."""
    toks = _tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(
        toks, lambda t: F.array_contains(stop_arr, t)))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", ""))
    return {
        "n_tokens": n_toks,
        "avg_word_len":
            F.round(F.length("text") / F.greatest(n_toks, F.lit(1)), 4),
        "stopword_ratio":
            F.round(stop_hits / F.greatest(n_toks, F.lit(1)), 4),
        "punct_ratio":
            F.round(punct / F.greatest(F.length("text"), F.lit(1)), 4),
        "alpha_ratio":
            F.round(alpha / F.greatest(F.length("text"), F.lit(1)), 4),
    }


def _text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: mean word length, stopword ratio, punctuation
    ratio, alpha ratio — the standard cheap pre-filter signals for
    corpus cleaning (C4/Gopher-style rules, public)."""
    docs = load(spark, sf_dir, "documents")
    feats = _quality_feature_cols()
    return docs.select(
        "doc_id", "lang",
        *[feats[c].alias(c) for c in
          ("avg_word_len", "stopword_ratio", "punct_ratio",
           "alpha_ratio")],
    )


def _lang_pred_col():
    """The marker-argmax language predictor — ONE copy shared by
    `lang_id` and `lang_confusion` (the two carried hand-kept twins
    until r11).  Scores coalesce to 0 on a NULL text so prediction
    degrades to the documented lexicographic tie → 'de' on BOTH
    engines (r11 all-NULL sweep: Spark's struct-sort ordered the NULL
    scores into 'de' while the oracle's CASE, never matching a NULL
    greatest(), fell through to its ELSE arm 'zh')."""
    toks = _tokens(F.col("text"))

    def _hits(markers):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.coalesce(
            F.size(F.filter(toks,
                            lambda t: F.array_contains(arr, t))),
            F.lit(0))

    scores = [(lang, _hits(markers))
              for lang, markers in sorted(LANG_MARKERS.items())]
    # argmax via greatest over structs (score, negated-rank via name)
    return F.reverse(F.array_sort(F.array(*[
        F.struct(score.alias("s"),
                 F.lit(-i).alias("tie"),
                 F.lit(lang).alias("lang"))
        for i, (lang, score) in enumerate(scores)
    ]))).getItem(0).getField("lang")


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: score each candidate language by marker-
    token hits, pick argmax (ties → lexicographic first).  Compared
    against the table's `lang` ground truth for an accuracy column."""
    docs = load(spark, sf_dir, "documents")
    pred = _lang_pred_col()
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("correct"),
    )


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash of the token
    stream (mod-prime Horner scheme via aggregate HOF) + sha256 of the
    normalized text.  The rolling hash is order-sensitive — reordered
    words change it; the content hash is the exact-dedup key."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    prime, base = 1_000_000_007, 31
    # per-token hash = first 8 hex chars of sha256 — a PUBLIC hash both
    # engines implement identically (xxhash64 would be Spark-local and
    # forfeit the oracle); stays in [0, 2^32) so acc*31 + h is safe
    # under ANSI long arithmetic.  NOTE the oracle's trim(text, ' '):
    # Spark's trim strips ASCII 0x20 ONLY, DuckDB's default trim
    # strips Unicode whitespace (NBSP included) — the explicit charset
    # drags DuckDB onto Spark's contract (r12 unicode sweep)
    def tok_hash(t):
        return F.pmod(
            F.conv(F.substring(F.sha2(t, 256), 1, 8), 16, 10)
             .cast("long"),
            F.lit(prime))
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * base + tok_hash(t), F.lit(prime)),
    )
    return docs.select(
        "doc_id",
        rolling.alias("rolling_hash"),
        F.sha2(F.trim(F.lower("text")), 256).alias("content_sha"),
    )


WINNOW_K = 3        # word k-gram size fed to the winnower
WINNOW_W = 4        # winnowing window: hashes per selection window
_WINNOW_POS_M = 1 << 21  # pos packing modulus (docs capped ~2M grams)


def _winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): robust winnowing fingerprints (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm, public):
    hash every POSITIONAL word-3-gram, slide a window of WINNOW_W
    consecutive hashes, and keep each window's minimum — guaranteeing
    at least one fingerprint per WINNOW_W+WINNOW_K-1 words while
    selecting the SAME grams no matter where a copied passage lands
    in a document.  This is the position-robust layer between
    `doc_fingerprint` (one whole-doc rolling hash — any edit changes
    it) and the set-similarity joins (which compare whole gram SETS):
    matching fingerprint rows localize WHICH passages two docs share.

    Determinism/exactness: the gram hash is the shared sha256-prefix
    idiom (public, bit-identical on both engines); ties inside a
    window break to the LEFTMOST smallest via the packed key
    c = h·2^21 + pos (winnowing only needs a CONSISTENT tie-break;
    the original paper picks rightmost, leftmost is the same
    guarantee), and the whole selection is integer min — no floats
    anywhere.  pos stays below 2^21 by documented cap (a 2M-gram
    document would need a >10 MB text cell); the oracle packs
    identically, so even a violation diverges nowhere.

    Degenerate contract: docs shorter than WINNOW_K words produce no
    grams (they vanish from the stream, matching the oracle's empty
    generate_series); docs with fewer than WINNOW_W grams yield ONE
    window spanning what exists (the pos-0 frame min, which the
    start-row filter keeps via greatest(n-w, 0)).

    100 TB shape: the gram stream is a fused generator explode (no
    array materialization); the ONLY exchange is the hash-partition
    by doc_id that the per-doc ordered window needs, and both window
    functions (count, frame min) share that one sort; the distinct
    collapses selected duplicates per doc before the output.  Output
    is ~2·L/(W+1) rows per doc — the paper's expected density —
    never the full gram stream."""
    docs = load(spark, sf_dir, "documents")
    return _winnow_rows(docs).orderBy("doc_id", "pos")


def _winnow_selected(docs: DataFrame) -> DataFrame:
    """The winnowing selection core (doc_id, wmin, n_grams) — the ONE
    implementation mirroring the _DUCK_WINNOW_CTES oracle chain.
    n_grams (the doc's positional gram count) rides through the
    distinct unchanged (it is functionally dependent on doc_id) so
    every consumer reads the gram-count the SELECTION actually saw —
    `winnow_coverage` once re-derived it from an independent
    split-size formula, the hand-kept-copy drift class (r10
    review)."""
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # positional (NOT distinct) gram stream — _gram_array dedups, the
    # winnower must see every occurrence in order
    gram_arr = F.when(
        F.size("ws") >= WINNOW_K,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - (WINNOW_K - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("ws", i + j)
                       for j in range(WINNOW_K)]),
        )).otherwise(F.array().cast("array<string>"))
    g = toks.select(
        "doc_id", F.posexplode(gram_arr).alias("pos", "gram"))
    h = F.conv(F.substring(F.sha2(F.col("gram"), 256), 1, 8),
               16, 10).cast("long")
    c = (h * F.lit(_WINNOW_POS_M) + F.col("pos")).alias("c")
    wdoc = Window.partitionBy("doc_id")
    wmin = (Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.currentRow, WINNOW_W - 1))
    return (g.select("doc_id", "pos", c)
            .withColumn("n_grams", F.count("*").over(wdoc))
            .withColumn("wmin", F.min("c").over(wmin))
            .where(F.col("pos")
                   <= F.greatest(F.col("n_grams") - WINNOW_W, F.lit(0)))
            .select("doc_id", "wmin", "n_grams").distinct())


def _winnow_rows(docs: DataFrame) -> DataFrame:
    """The winnowing selection pipeline (doc_id, fp, pos) — shared by
    `winnow_fingerprint` (the per-doc report) and `winnow_join` (the
    fingerprint-overlap candidate join built on it); unpacks
    `_winnow_selected`'s packed minima."""
    return _winnow_selected(docs).select(
        "doc_id",
        ((F.col("wmin") - F.pmod("wmin", _WINNOW_POS_M))
         / _WINNOW_POS_M).cast("long").alias("fp"),
        F.pmod("wmin", _WINNOW_POS_M).cast("int").alias("pos"))


WJ_MIN_SHARED = 3    # near-dup candidates must share >= this many fps
WJ_DF_FLOOR = 10     # hot-fingerprint prune: df > max(floor, ...
WJ_DF_FRAC = 0.10    # ... frac * n_docs) fingerprints are dropped


def _winnow_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): fingerprint-overlap near-dup join — the MOSS
    pairing step on top of `winnow_fingerprint`: two documents are
    candidates iff they share >= WJ_MIN_SHARED distinct winnowed
    fingerprint HASHES.  This is the cheapest rung of the near-dup
    ladder: the fingerprint stream is already ~(W+1)/2× smaller than
    the gram stream the MinHash/prefix joins consume, and the
    winnowing guarantee makes the match count a length-proportional
    proxy for shared-passage volume (every >= W+K-1-word shared
    passage contributes at least one common fingerprint).

    Determinism/exactness: fingerprints are the integer sha-prefix
    hashes from `_winnow_rows` (positions dropped — relocation
    invariance is the point); counts are exact integers.  Hot
    fingerprints (boilerplate selected everywhere) are pruned by
    document frequency BEFORE the self-join — the `_pruned_gram_
    stream` discipline: df > max(WJ_DF_FLOOR, WJ_DF_FRAC·n_docs)
    drops them on BOTH engines, killing the quadratic hot-bucket
    blowup structurally (MOSS does the same: ignore fingerprints in
    too many submissions).

    100 TB shape: winnow selection is one doc exchange (see
    `winnow_fingerprint`); the distinct (doc, fp) reduce is linear;
    the df table is one partial-agg'd shuffle of it, the hot list is
    heavy-hitter-tail tiny (broadcast anti-join); the pair self-join
    keys on PRUNED fingerprints with per-fp fan-out capped by the df
    threshold, and the pair aggregate touches candidates only."""
    docs = load(spark, sf_dir, "documents")
    # r13 OPT (guide §1.2): the distinct (doc, fp) selection feeds the
    # df table and BOTH sides of the pair self-join — unmaterialized,
    # the two-window winnowing selection ran 3× (12 parquet scans in
    # the before-plan).  LAZY checkpoint (r14: the pair self-join
    # sides are concurrent arms; the eager barrier re-measured
    # slower in the warm-cache bench regime).
    f = (_winnow_rows(docs).select("doc_id", "fp").distinct()
         .localCheckpoint(eager=False))
    n_docs_df = docs.agg(F.count("*").alias("n_docs"))
    fp_df = f.groupBy("fp").agg(F.count("*").alias("df"))
    hot = (fp_df.crossJoin(F.broadcast(n_docs_df))
           .where(F.col("df") > F.greatest(
               F.lit(WJ_DF_FLOOR),
               F.col("n_docs") * F.lit(WJ_DF_FRAC)))
           .select("fp"))
    ff = f.join(F.broadcast(hot), "fp", "left_anti")
    pairs = (ff.alias("a")
             .join(ff.alias("b"),
                   (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("shared_fps")))
    return (pairs.where(F.col("shared_fps") >= WJ_MIN_SHARED)
            .orderBy("doc_a", "doc_b"))


def _winnow_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r10 debut): the winnowing GUARANTEE as a per-document
    audit query — Schleimer/Wilkerson/Aiken's theorem says every
    window of WINNOW_W consecutive gram positions contains a selected
    fingerprint, which bounds the gap between consecutive selected
    positions (counting the virtual start at -1) by WINNOW_W.  A
    plagiarism index built on fingerprints is only as good as that
    density bound: this query reports, per doc, the selection count,
    the selection density against the window count, the observed
    maximum gap, and the boolean the theorem promises — the
    index-health audit you run after (re)building a MOSS-style
    fingerprint store, and the query-shaped twin of the pytest
    pigeonhole pins.

    Determinism/exactness: positions and gaps are exact integers off
    `_winnow_rows` (the ONE winnowing implementation, mirrored by
    `_DUCK_WINNOW_CTES`); density is round4_ratio of two BIGINTs.
    Docs shorter than WINNOW_K words have no grams and drop out
    (inner semantics on both engines).  Docs with fewer than WINNOW_W
    grams yield one window spanning what exists, so their max_gap is
    their first selected position + 1 <= n_grams <= W: the guarantee
    holds degenerately.

    100 TB shape: one doc-keyed exchange (shared with the winnow
    selection's own window sort) orders each doc's ~2L/(W+1) selected
    positions; gaps come from ONE lag pass; per-doc state is the
    selection, never the gram stream.  n_grams rides on the selection
    rows themselves (`_winnow_selected` — the count the selection
    actually saw, the same single-source rule the oracle gets from
    the shared `w` CTE), so the audit needs no second scan and can
    never drift from the winnower's own tokenization."""
    docs = load(spark, sf_dir, "documents")
    sel = _winnow_selected(docs).select(
        "doc_id", "n_grams",
        F.pmod("wmin", _WINNOW_POS_M).cast("long").alias("pos"))
    w_lag = Window.partitionBy("doc_id").orderBy("pos")
    gaps = sel.select(
        "doc_id", "n_grams", "pos",
        (F.col("pos")
         - F.coalesce(F.lag("pos").over(w_lag), F.lit(-1))).alias("gap"))
    return (
        gaps.groupBy("doc_id")
        .agg(F.max("n_grams").cast("long").alias("n_grams"),
             F.count("*").cast("long").alias("n_fps"),
             F.max("gap").cast("long").alias("max_gap"))
        .select(
            "doc_id", "n_grams", "n_fps",
            round4_ratio(
                F.col("n_fps"),
                F.greatest(F.col("n_grams") - (WINNOW_W - 1), F.lit(1)))
            .alias("density"),
            "max_gap",
            (F.col("max_gap") <= WINNOW_W).alias("guarantee_holds"))
        .orderBy("doc_id"))


def _source_token_counts(docs: DataFrame) -> DataFrame:
    """(source, tok, cnt) unigram reduce — the ONE copy shared by
    `zipf_fit` and `js_divergence` (two hand-kept copies of this
    3-line pipeline are exactly the drift class the _gram_array /
    DUCK_QFEATS docstrings record), mirrored by the one
    _DUCK_SRC_TOK_CTES oracle chain."""
    return (docs.select("source",
                        F.explode(_tokens(F.col("text"))).alias("tok"))
            .groupBy("source", "tok").agg(F.count("*").alias("cnt")))


ZIPF_TOPK = 100  # vocabulary head fitted per source


def _loglog_ols_fit(pts: DataFrame, key: str,
                    n_name: str = "n") -> DataFrame:
    """Exact-integer log-log OLS shared by `zipf_fit` (frequency law)
    and `heaps_law` (growth law) — ONE copy of the closed forms so the
    two corpus-law fits cannot drift (the _source_token_counts /
    _gram_array single-copy discipline).

    Input: a points frame (key, x, y) where x and y are ALREADY
    1e-4-quantized integer log values (floor(ln(v)*1e4 + 0.5)); the
    caller owns the quantization because the overflow envelope of
    round4_ratio_dec (num²·2e4 + d inside DECIMAL(38,0)/HUGEINT) is a
    property of the caller's point count and value range — both
    callers bound points per key at 100 and values at ln(1e13)·1e4,
    giving num² ≲ 3.3e30 and d1·d2 ≲ 8e29, far inside the envelope
    (the zipf_fit docstring's r8 analysis, now shared).

    Every OLS sum (Σx, Σy, Σxy, Σx², Σy²) accumulates exactly in
    DECIMAL(38,0); slope, intercept, and r² are exact half-up integer
    ratios of the closed forms (round4_ratio_dec).  Degenerate
    contract: a key with a single distinct x has d1 = 0 → slope /
    intercept / r² NULL on both engines, never a crash.

    Returns (key, n_name, slope, intercept, r2) ordered by key."""
    def dec(c):
        return c.cast("decimal(38,0)")

    sums = (pts.groupBy(key)
            .agg(F.count("*").alias(n_name),
                 F.sum(dec(F.col("x"))).alias("sx"),
                 F.sum(dec(F.col("y"))).alias("sy"),
                 F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
                 F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
                 F.sum(dec(F.col("y")) * F.col("y")).alias("syy")))
    n = F.col(n_name).cast("decimal(38,0)")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = n * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = n * F.col("syy") - F.col("sy") * F.col("sy")
    return (sums.select(
                key, n_name,
                round4_ratio_dec(num, d1).alias("slope"),
                round4_ratio_dec(
                    (F.col("sy") * F.col("sxx")
                     - F.col("sx") * F.col("sxy")),
                    (d1 * 10_000).cast("decimal(38,0)"))
                .alias("intercept"),
                round4_ratio_dec((num * num).cast("decimal(38,0)"),
                                 (d1 * d2).cast("decimal(38,0)"))
                .alias("r2"))
            .orderBy(key))


def _loglog_ols_tail_sql(n: str = "n") -> str:
    """The DuckDB mirror of _loglog_ols_fit's readout: the three
    SELECT-list expressions (slope, intercept, r2) over a sums CTE
    with columns ({n}, sx, sy, sxy, sxx, syy) in HUGEINT."""
    return (
        f"{round4_ratio_dec_sql(f'{n} * sxy - sx * sy', f'{n} * sxx - sx * sx')}"
        " AS slope,\n       "
        f"{round4_ratio_dec_sql('sy * sxx - sx * sxy', f'({n} * sxx - sx * sx) * 10000')}"
        " AS intercept,\n       "
        f"""{round4_ratio_dec_sql(
            f'({n} * sxy - sx * sy) * ({n} * sxy - sx * sy)',
            f'({n} * sxx - sx * sx) * ({n} * syy - sy * sy)')}"""
        " AS r2")


def _zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): Zipf-law fit per source — OLS of ln(frequency)
    on ln(rank) over the top-ZIPF_TOPK vocabulary: slope (Zipf
    exponent, ~ -1 for natural language), intercept, and r² — the
    corpus-forensics query that flags machine-generated/boilerplate
    sources (their head distribution is too flat or too steep) before
    any model sees them.

    Exactness: ranks are exact integers (count desc, token asc —
    deterministic ties); x = floor(ln(rank)·1e4 + 0.5) and y =
    floor(ln(cnt)·1e4 + 0.5) quantize the one transcendental per
    term to integer 1e-4-nats (the lm_score ln idiom at a coarser
    grid — cross-engine exactness needs only a SHARED quantization,
    and the output rounds at 4dp anyway); every OLS sum (Σx, Σy,
    Σxy, Σx², Σy²) accumulates exactly in DECIMAL(38,0)/HUGEINT, and
    slope / intercept / r² are exact half-up integer ratios of the
    closed forms — slope = (nΣxy−ΣxΣy)/(nΣxx−Σx²), intercept
    likewise, r² = num²/(d1·d2).  The 1e4 grid is what keeps r²
    INSIDE the half-up helper's own envelope (it computes
    num²·2e4 + d internally): |x| <= ln(100)·1e4 < 4.7e4 and
    |y| <= ln(1e12)·1e4 < 2.8e5 at 100 TB token counts give
    |num| <= ~2.6e14, num²·2e4 <= ~1.4e33 and d1·d2 <= ~6e29 — all
    far below DECIMAL(38,0)/HUGEINT; at the old 1e6 grid num²·2e4
    could reach ~2e39 and CRASH both engines (r8 review finding).

    Degenerate contract: a source with a single distinct token has
    d1 = 0 → slope/intercept/r² NULL on both engines (zero-denominator
    NULL in the half-up helpers), never a crash.

    100 TB shape: ONE (source, token) partial-agg'd reduce carries
    the vocabulary, the per-source top-K window runs on the reduced
    table (WindowGroupLimit forwards K+ rows per source), and the OLS
    reduce is 6 numbers per source."""
    docs = load(spark, sf_dir, "documents")
    ct = _source_token_counts(docs)
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok").asc())
    top = (ct.withColumn("rnk", F.row_number().over(w))
           .where(F.col("rnk") <= ZIPF_TOPK))
    x = F.floor(F.log(F.col("rnk").cast("double")) * 1e4 + 0.5)
    y = F.floor(F.log(F.col("cnt").cast("double")) * 1e4 + 0.5)
    return _loglog_ols_fit(
        top.select("source", x.alias("x"), y.alias("y")), "source")


HEAPS_POINTS = 100  # growth-curve sample docs per source (rank-evenly
#                     spaced so the OLS point count — and with it the
#                     round4_ratio_dec overflow envelope — is bounded
#                     by a model constant, not by corpus size)


def _heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r11 debut): Heaps'-law vocabulary-growth fit per source —
    V(n) ≈ K·n^β over the cumulative (tokens seen, distinct tokens
    seen) curve in doc_id order: β (beta, ~0.4-0.6 for natural
    language), ln K (intercept), and r².  The GROWTH companion to
    `zipf_fit`'s frequency law (the two are asymptotically linked):
    a source whose vocabulary grows too slowly is template/boilerplate
    text, too fast is noise/codes — the same corpus-forensics read at
    the other end of the distribution.

    Derivation is doc-grain, never token-instance-grain: the first
    occurrence of a token is just min(doc_id) per (source, token), so
    cumulative vocabulary needs ONE vocab-sized reduce plus a per-doc
    count — no window over token instances.  The curve is then sampled
    at HEAPS_POINTS rank-evenly-spaced docs per source (the all-integer
    predicate (rnk·P) DIV n_docs > ((rnk−1)·P) DIV n_docs picks exactly
    min(P, n_docs) docs — every doc at fixture scale), which bounds
    the OLS at 100 points/source for ANY corpus — the same envelope
    discipline as ZIPF_TOPK (see _loglog_ols_fit for the shared exact
    closed forms and overflow analysis).

    100 TB shape: one (source, token) partial-agg'd reduce carries the
    vocabulary (the zipf_fit shuffle, reused shape), one per-doc
    count, a per-source cumulative window keyed on the source
    partitioning, and a 6-number OLS reduce per source.  Degenerate
    contract: a source with a single sampled point (or all-equal
    cum_toks) has d1 = 0 → beta/lnk/r2 NULL on both engines; zero-token
    docs contribute points only once cum_toks ≥ 1 (ln is never fed 0).
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    first_new = (toks.groupBy("source", "tok")
                 .agg(F.min("doc_id").alias("doc_id"))
                 .groupBy("source", "doc_id")
                 .agg(F.count("*").alias("n_new")))
    per_doc = (docs.select("source", "doc_id",
                           F.size(_tokens(F.col("text"))).alias("n_toks"))
               .join(first_new, ["source", "doc_id"], "left")
               .select("source", "doc_id", "n_toks",
                       F.coalesce("n_new", F.lit(0)).alias("n_new")))
    w = Window.partitionBy("source").orderBy("doc_id")
    cum_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = per_doc.select(
        "source",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("n_toks").over(cum_frame).alias("cum_toks"),
        F.sum("n_new").over(cum_frame).alias("cum_vocab"),
        F.count("*").over(Window.partitionBy("source")).alias("n_docs"))
    sampled = curve.where(
        (F.col("cum_toks") >= 1)
        & (F.expr(f"(rnk * {HEAPS_POINTS}) DIV n_docs")
           > F.expr(f"((rnk - 1) * {HEAPS_POINTS}) DIV n_docs")))
    x = F.floor(F.log(F.col("cum_toks").cast("double")) * 1e4 + 0.5)
    y = F.floor(F.log(F.col("cum_vocab").cast("double")) * 1e4 + 0.5)
    fit = _loglog_ols_fit(
        sampled.select("source", x.alias("x"), y.alias("y")),
        "source", n_name="n_points")
    return fit.select("source", "n_points",
                      F.col("slope").alias("beta"),
                      F.col("intercept").alias("lnk"),
                      "r2")


LN2_U = 693147  # floor(ln(2)*1e6 + 0.5): the disjoint-token JS term


def _js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): pairwise Jensen-Shannon divergence between the
    unigram word distributions of every source pair — the
    DISTRIBUTIONAL companion to `source_overlap`'s set view: overlap
    says which sources share text verbatim, JS says how differently
    they USE language (mixture planning reads this to pick diverse
    sources; drift monitoring reads it across crawls).  Symmetric and
    bounded in [0, ln 2] nats, unlike raw KL.

    Exactness (the mutual_info idiom): for shared tokens the per-term
    logs are ln of EXACT integer ratios — term_P = a·ln(2aB/(aB+bA)),
    term_Q = b·ln(2bA/(aB+bA)) with a,b the token counts and A,B the
    source totals — quantized to integer µ-nats (floor(ln·1e6+0.5) on
    one shared expression), weighted by exact counts and summed in
    DECIMAL(38,0)/HUGEINT; tokens private to one source contribute
    exactly count·ln2, folded in CLOSED FORM as (A−sha)·LN2_U — no
    outer join needed.  JSD = (S_P/A + S_Q/B)/2 is then ONE exact
    half-up ratio (S_P·B + S_Q·A) / (2AB·1e6).

    Degenerate contract: a token pair cell never divides by zero
    (aB+bA > 0 whenever the row exists); single-source corpora emit
    zero rows (no pairs).

    100 TB shape: ONE (source, token) partial-agg'd reduce (shared
    shape with zipf_fit/naive_bayes); the pair join keys on token
    with fan-out structurally <= |sources|² per token; per-source
    totals join back broadcast-sized; everything downstream is
    |sources|²-row arithmetic."""
    docs = load(spark, sf_dir, "documents")
    # r13 OPT (guide §1.2): the (source, token) reduce feeds the
    # per-source totals and BOTH sides of the token pair join —
    # unmaterialized, the corpus tokenize+reduce ran 3×.  Vocab-sized.
    # LAZY (r14: eager's barrier re-measured no faster warm-cache).
    ct = _source_token_counts(docs).localCheckpoint(eager=False)
    tot = ct.groupBy("source").agg(F.sum("cnt").alias("total"))
    a = ct.select(F.col("source").alias("src_a"), "tok",
                  F.col("cnt").alias("ca"))
    b = ct.select(F.col("source").alias("src_b"), "tok",
                  F.col("cnt").alias("cb"))
    shared = (a.join(b, "tok")
              .where(F.col("src_a") < F.col("src_b"))
              .join(F.broadcast(tot.select(
                  F.col("source").alias("src_a"),
                  F.col("total").alias("ta"))), "src_a")
              .join(F.broadcast(tot.select(
                  F.col("source").alias("src_b"),
                  F.col("total").alias("tb"))), "src_b"))
    # exact wide-int ratio arguments, ONE shared ln expression shape:
    # den = a·B + b·A; µln(2aB/den), µln(2bA/den)
    aB = F.col("ca").cast("decimal(38,0)") * F.col("tb")
    bA = F.col("cb").cast("decimal(38,0)") * F.col("ta")
    den = (aB + bA).cast("double")
    tp = F.floor(F.log((2 * aB).cast("double") / den) * 1e6 + 0.5)
    tq = F.floor(F.log((2 * bA).cast("double") / den) * 1e6 + 0.5)
    cell = shared.groupBy("src_a", "src_b").agg(
        F.sum(F.col("ca").cast("decimal(38,0)") * tp).alias("sp_sh"),
        F.sum(F.col("cb").cast("decimal(38,0)") * tq).alias("sq_sh"),
        F.sum("ca").alias("sha"), F.sum("cb").alias("shb"))
    full = (cell
            .join(F.broadcast(tot.select(
                F.col("source").alias("src_a"),
                F.col("total").alias("ta"))), "src_a")
            .join(F.broadcast(tot.select(
                F.col("source").alias("src_b"),
                F.col("total").alias("tb"))), "src_b"))
    sp = (F.col("sp_sh")
          + (F.col("ta") - F.col("sha")).cast("decimal(38,0)") * LN2_U)
    sq = (F.col("sq_sh")
          + (F.col("tb") - F.col("shb")).cast("decimal(38,0)") * LN2_U)
    return (full.select(
                "src_a", "src_b",
                F.col("ta").alias("tokens_a"),
                F.col("tb").alias("tokens_b"),
                round4_ratio_dec(
                    sp, (F.col("ta").cast("decimal(38,0)")
                         * 1_000_000).cast("decimal(38,0)"))
                .alias("kl_p_m"),
                round4_ratio_dec(
                    sq, (F.col("tb").cast("decimal(38,0)")
                         * 1_000_000).cast("decimal(38,0)"))
                .alias("kl_q_m"),
                round4_ratio_dec(
                    (sp * F.col("tb") + sq * F.col("ta"))
                    .cast("decimal(38,0)"),
                    (F.col("ta").cast("decimal(38,0)") * F.col("tb")
                     * 2_000_000).cast("decimal(38,0)"))
                .alias("jsd"))
            .orderBy("src_a", "src_b"))


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: corpus stats by (lang, source): doc count, char/token
    totals, avg doc length — the shuffle is a few agg states per
    group."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return (
        docs.select("lang", "source", F.length("text").alias("chars"),
                    F.size(toks).alias("tokens"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("docs"),
             F.sum("chars").alias("total_chars"),
             F.sum("tokens").alias("total_tokens"),
             F.round(F.avg("chars"), 2).alias("avg_chars"))
    )


def _text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 terms per document by tf·ln(N/df) — the classic
    relevance weighting, fully relational (explode → two aggs → window
    top-k), no ML-library dependency.  Ties broken lexicographically.

    Scale: one shuffle on (doc_id, term) for tf, one on term for df
    (broadcast back — the term dictionary is small relative to the
    corpus), one window top-k on doc_id.  N for ln(N/df) is a 1-row agg
    broadcast-cross-joined into the same DAG — no separate driver-side
    count() action re-scanning the corpus."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    n_docs_df = docs.agg(F.count("*").cast("double").alias("n_docs"))
    terms = docs.select(
        "doc_id",
        F.explode(_tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = (terms.select("doc_id", "term").distinct()
           .groupBy("term").agg(F.count("*").alias("df"))
           .crossJoin(F.broadcast(n_docs_df)))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .select(
            "doc_id", "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
             .alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("doc_id", "term", "tfidf", "rnk"))


def _corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT end-to-end curation job — the LLM-pipeline stages composed
    into ONE lazy DAG the way a real training-data run chains them:

      quality gates (token count ≥ 20, mean word length 3–10)
      → language filter (lang = 'en')
      → exact dedup (sha2 digest, min-doc_id survivor via min_by)
      → per-source corpus stats.

    Everything stays columnar/built-in: the only shuffles are the
    64-byte digest groupBy and the tiny per-source rollup — the
    filters run map-side ahead of both, so at 100 TB the shuffle
    carries only survivors.  Full DuckDB oracle."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_toks = F.size(toks)
    scored = docs.select(
        "doc_id", "source", "lang", "text",
        n_toks.alias("n_tokens"),
        (F.length("text") / F.greatest(n_toks, F.lit(1)))
        .alias("avg_word_len"),
    )
    kept = scored.where(
        (F.col("lang") == "en")
        & (F.col("n_tokens") >= 20)
        & (F.col("avg_word_len") >= 3)
        & (F.col("avg_word_len") <= 10))
    survivors = (
        kept.groupBy(F.sha2(F.col("text"), 256).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"),
             F.min_by("source", "doc_id").alias("source"),
             F.min_by("n_tokens", "doc_id").alias("n_tokens"))
    )
    return (
        survivors.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("n_tokens"), 2).alias("avg_tokens"))
        .orderBy("source")
    )


CHUNK_TOKENS = 40   # tokens per chunk window
CHUNK_OVERLAP = 10  # tokens shared between consecutive chunks
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def _doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: document chunking — the sliding-token-window split every
    embedding/RAG ingestion pipeline runs before vectorizing.  Chunk i
    covers tokens [i*stride, i*stride + CHUNK_TOKENS); the tail chunk
    may be short.  One narrow map + one explode per doc — the 100 TB
    shape is scan-bound, no shuffle at all (chunk rows inherit the
    input partitioning).  Guarded sequence: ANSI sequence(0, -1) is
    DESCENDING, so n_chunks is clamped to >= 1."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil(n / F.lit(CHUNK_STRIDE)).cast("int"), F.lit(1))
    # The chunk text is sliced BEFORE the explode (array-of-chunks per
    # doc, then posexplode): the r7 form exploded chunk ids first and
    # sliced afterwards, carrying the ENTIRE token array into every
    # chunk row - O(L^2/stride) bytes per doc, ~33s for a handful of
    # 30k-token docs (the r9 book-length-document sweep).  The lambda
    # slices the PROJECTED `toks` column (bound reference, not the
    # split expression) - the linear-by-measurement _gram_array
    # pattern; the tail length is clamped at 0 for the n = 0 doc,
    # whose single empty chunk the start < n_tokens filter drops
    # exactly as before.
    per_doc = docs.select(
        "doc_id", toks.alias("toks"), n.alias("n_tokens"),
        n_chunks.alias("n_chunks"))
    chunk_arr = F.transform(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda c: F.array_join(
            F.slice(F.col("toks"), c * CHUNK_STRIDE + 1,
                    F.greatest(
                        F.least(F.lit(CHUNK_TOKENS),
                                F.col("n_tokens") - c * CHUNK_STRIDE),
                        F.lit(0))),
            " "))
    with_chunks = per_doc.select(
        "doc_id", "n_tokens",
        F.posexplode(chunk_arr).alias("chunk_id", "chunk_text"))
    start = F.col("chunk_id") * CHUNK_STRIDE
    chunk_len = F.least(F.lit(CHUNK_TOKENS), F.col("n_tokens") - start)
    return (
        with_chunks
        .where(start < F.col("n_tokens"))
        .select(
            "doc_id", "chunk_id",
            start.cast("int").alias("chunk_start"),
            chunk_len.cast("int").alias("chunk_len"),
            "chunk_text",
        )
    )


PACK_TOKENS = 256  # context-window budget per pack


def _seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: sequence packing — assign documents to fixed-token-budget
    training packs (offset packing: doc d goes to pack
    floor(tokens_before_d / budget), computed from a running token
    cumsum).  Packing is per SOURCE shard, which is the point at
    100 TB: the window partitions by shard, so the cumsum is a
    parallel per-partition scan, never a global single-partition sort
    (the classic unpartitioned-window scale killer).  Integer-valued
    double division keeps floor() identical across engines (exact
    below 2^52).  Emits per-pack occupancy stats."""

    docs = load(spark, sf_dir, "documents")
    toks = F.size(_tokens(F.col("text")))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (
        docs.select("source", "doc_id", toks.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("pack_id",
                    F.floor((F.col("cum") - F.col("n_tokens"))
                            / F.lit(float(PACK_TOKENS))).cast("int"))
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("pack_tokens"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"))
    )


VOCAB_K = 40  # vocabulary entries reported


def _vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: tokenizer vocabulary build — global token frequency top-K
    with per-token corpus share and cumulative coverage (the curve a
    tokenizer team reads to size a vocab).

    100 TB shape: explode + groupBy(token) is the one shuffle (partial
    agg collapses each map partition's counts first, so the shuffle
    carries the per-partition vocab, not the token stream).  The top-K
    is orderBy+limit → TakeOrderedAndProject (per-partition heap +
    driver merge of K rows), never a global sort.  The corpus total is
    a broadcast 1-row aggregate folded into the same DAG, and the
    cumulative window — though formally global — runs over exactly K
    rows post-limit, so the single-partition window is O(K), not
    O(vocab)."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("total"))
    top = counts.orderBy(F.col("freq").desc(), F.col("tok").asc()) \
                .limit(VOCAB_K)
    w_o = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    w_cum = w_o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w_o).alias("rnk"),
            "tok", "freq",
            F.round(F.col("freq") / F.col("total"), 6).alias("share"),
            F.round(F.sum("freq").over(w_cum) / F.col("total"), 6)
             .alias("cum_share"),
        )
    )


FERT_VOCAB_K = 16       # fertility vocabulary cut: the top-K corpus
#                         tokens count as single tokenizer pieces
FERT_OOV_CHARS = 4      # chars per subword piece for an OOV word —
#                         the public ~4-chars/BPE-token budgeting
#                         heuristic; pieces(oov) = ceil(len/4)


def _token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r9 debut): tokenizer fertility per language — estimated
    tokenizer pieces per whitespace word, the number a multilingual
    data team reads next to `mix_temperature` when a language's
    token budget diverges from its document share (fertility > 1
    means the vocab under-serves that language).  A word in the
    top-FERT_VOCAB_K corpus vocabulary costs 1 piece; an
    out-of-vocabulary word falls back to subword pieces at the
    public ~4-chars-per-BPE-token budgeting heuristic
    (ceil(len/4), exact integer form (len+3) div 4).  Everything is
    exact: BIGINT counts, fertility and OOV-rate as half-up integer
    ratios (round4_ratio).

    100 TB shape: one explode + token-count agg (partial-agg
    collapses per-partition vocab first), top-K vocab cut via
    orderBy+limit → TakeOrderedAndProject (per-partition heap, K
    driver rows — the vocab_topk pattern), vocab membership as a
    BROADCAST left join onto the token stream (map-side, K rows
    shipped), then a per-language agg whose state is |langs| rows.
    The token stream never shuffles except into the (tok) partial
    agg."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    vocab = (counts.orderBy(F.col("freq").desc(), F.col("tok").asc())
             .limit(FERT_VOCAB_K)
             .select("tok", F.lit(1).alias("in_vocab")))
    pieces = F.when(F.col("in_vocab").isNotNull(), F.lit(1)).otherwise(
        F.expr(f"(length(tok) + {FERT_OOV_CHARS - 1}) "
               f"div {FERT_OOV_CHARS}")).cast("long")
    per = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang")
        .agg(F.count("*").alias("words"),
             F.sum(pieces).alias("pieces"),
             F.sum(F.col("in_vocab").isNull().cast("long"))
              .alias("oov_words")))
    return (per.select(
        "lang", "words", "pieces", "oov_words",
        round4_ratio(F.col("pieces"), F.col("words")).alias("fertility"),
        round4_ratio(F.col("oov_words"), F.col("words"))
        .alias("oov_rate"))
        .orderBy("lang"))


def _heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: two-pass distributed heavy hitters over the token stream.
    Pass 1 finds a candidate SUPERSET with the Karp-Papadimitriou-
    Shenker streaming-frequent algorithm (`DataFrame.freqItems` —
    constant 1/support counters per partition, and every item with
    frequency > support*N is guaranteed to survive).  Pass 2 re-counts
    ONLY the candidates exactly and keeps the true hitters.

    The two-pass trick is what makes the output deterministic and
    DuckDB-oracle-checkable even though KPS merge order is not: the
    sketch can only over-admit, never drop a true hitter, and the
    exact verification filter discards the over-admissions.

    100 TB shape: the candidate list is bounded at 1/support (= 100)
    items, driver-resolved like the IVF centroids and inlined into the
    verification pass's `isin` filter, so the exact groupBy shuffles
    at most 100 tokens per map partition — the full-vocab shuffle of
    `vocab_topk` never happens.  Three corpus scans total (sketch,
    1-row token count, verification), each pure map-side."""
    support = 0.01
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    cands = toks.freqItems(["tok"], support=support).first()[0]
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.where(F.col("tok").isin(list(cands)))
        .groupBy("tok").agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        .where(F.col("freq") > support * F.col("n_total"))
        .select("tok", "freq",
                F.round(F.col("freq") / F.col("n_total"), 6).alias("share"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
    )


CMS_D, CMS_W = 4, 256   # count-min sketch geometry: depth x width
CMS_TOPK = 20           # report the exact top-K with their estimates


def _cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): count-min sketch frequency estimation
    (Cormode & Muthukrishnan 2005, public) expressed relationally —
    the bounded-state mergeable sketch a streaming/multi-tenant
    pipeline keeps when even the heavy-hitter candidate list is too
    hot to re-count.  The sketch is a d×w counter matrix: token t
    increments row j at bucket h_j(t); the estimate is
    min_j counts[j][h_j(t)] — an overestimate by construction, never
    an undercount.  Emitted: the exact top-K tokens (freq desc, token
    asc — deterministic cut) with true count, CMS estimate, and the
    structural est >= true invariant as a checked column.

    Cross-engine exactness: h_j(t) = sha256(j || ':' || t) first-8-hex
    mod w — the `sample_hash` public-hash idiom, so BOTH engines build
    the IDENTICAL sketch and read the identical estimates: a FULL
    value oracle over a sketch, no accuracy-contract encoding needed
    (contrast agg_approx_percentiles, whose GK internals are
    engine-local).

    100 TB shape: the token stream is exploded ×d but partial-agg'd
    to ≤ d·w counter states per partition before the ONE tiny
    exchange (the sketch is the aggregation state — this is what
    'mergeable' buys); the top-K candidates come from the exact vocab
    count reduced the usual way, and the estimate lookup joins K·d
    rows against the d·w sketch — both model-sized."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))

    def bucket(j, tok_col):
        return F.pmod(
            F.conv(F.substring(
                F.sha2(F.concat(F.lit(f"{j}:"), tok_col), 256), 1, 8),
                16, 10).cast("long"),
            F.lit(CMS_W))

    # r13 OPT (guide §2.3 "aggregate before you shuffle"): h_j depends
    # only on the token, so the sketch is built from the VOCAB table
    # (d sha2 per distinct token, cnt = Σ freq) instead of the raw
    # occurrence stream (d sha2 per occurrence) — and the vocab reduce
    # is the same one the exact top-K branch needs, materialized once
    # instead of re-tokenizing the corpus twice.  Identical counters:
    # Σ_{tok→(j,b)} freq(tok) == #occurrences hashing to (j, b).
    vocab = (toks.groupBy("tok").agg(F.count("*").alias("freq"))
             .localCheckpoint(eager=True))
    sketch = (
        vocab.select("freq", F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     bucket(j, F.col("tok")).alias("bucket"))
            for j in range(CMS_D)])).alias("p"))
        .select("freq", F.col("p.j").alias("j"),
                F.col("p.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("freq").alias("cnt")))
    top = (vocab
           .orderBy(F.col("freq").desc(), F.col("tok").asc())
           .limit(CMS_TOPK))
    probes = top.select(
        "tok", "freq",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     bucket(j, F.col("tok")).alias("bucket"))
            for j in range(CMS_D)])).alias("p")
    ).select("tok", "freq", F.col("p.j").alias("j"),
             F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("tok", "freq")
        .agg(F.min("cnt").alias("cms_est"))
        .select("tok", "freq", "cms_est",
                (F.col("cms_est") >= F.col("freq")).alias("never_under"))
    )


def _lm_scored_tokens(docs: DataFrame) -> DataFrame:
    """The unigram-LM token-scoring chain (doc_id, source, nll_u) —
    ONE implementation behind `_lm_score` (per-doc grain) and
    `_source_perplexity` (source grain), mirroring the one
    `_DUCK_LM_SCORED_CTES` oracle chain (r10 review: the two
    hand-kept copies are exactly the drift class
    `_source_token_counts` was factored for).  p(tok) = freq/total
    over the whole corpus; per-token -ln p quantized to integer
    MICRO-NATS (floor(x*1e6 + 0.5)) so every downstream reduction is
    an exact integer sum."""
    # r13 OPT (guide §1.2/§2.3): the token stream feeds the vocab
    # reduce AND the score join — materialized once (LAZY, r14: the
    # stream is occurrence-grain and eager's barrier re-measured
    # slower warm-cache, lm_score −15%) instead of re-tokenizing the
    # corpus per consumer branch; and nll_u depends
    # only on the token, so the -ln is taken per VOCAB entry (model
    # table) instead of per occurrence, then attached with the same
    # single token-keyed join.  Identical values row for row.
    toks = docs.select(
        "doc_id", "source",
        F.explode(_tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)
    counts = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    total = counts.agg(F.sum("freq").alias("total"))
    nll_u = F.floor(
        -F.log(F.col("freq") / F.col("total")) * 1e6 + F.lit(0.5)
    ).cast("bigint")
    model = (counts.crossJoin(F.broadcast(total))
             .select("tok", nll_u.alias("nll_u")))
    return (
        toks.join(model, "tok")
        .select("doc_id", "source", "nll_u")
    )


def _lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: unigram language-model scoring — the cheap stand-in for
    the KenLM-style perplexity filter every LLM data pipeline runs
    (docs with high negative log-likelihood under a corpus LM are
    boilerplate/garbage candidates).  p(tok) = freq/total over the
    corpus itself; score = mean -ln p per doc, plus perplexity.

    Cross-engine determinism: per-token -ln p is quantized to integer
    MICRO-NATS (floor(x*1e6 + 0.5)) before summing, so the per-doc
    reduction is an exact integer sum — immune to the fp-addition-
    order differences a parallel double sum has (same trick as the
    TPC-H unit-cost quantization).  1-ulp libm ln() skew moves a
    token by at most one micro-nat, invisible at the 4dp report.

    100 TB shape: the vocab table (token, freq) is heavy-hitter
    shaped; the token→prob join shuffles the token stream once on the
    token key, then reduces per doc.  (On a real corpus the top-K
    vocab covering 99%+ of mass is broadcast and the long tail gets a
    default smoothed prob — the plan here is the general shuffle
    form.)"""
    scored = _lm_scored_tokens(load(spark, sf_dir, "documents"))
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum("nll_u").alias("sum_nll_u"))
        .select(
            "doc_id", "n_tokens",
            # exact integer-space rounding: sum/(n*1e6) can land ON a
            # 5th-decimal half (round-5 extended-seed finding on the
            # bigram sibling) where Spark's shortest-repr HALF_UP and
            # DuckDB's binary rounding disagree.  Overflow bound:
            # sum_nll_u*2e4 < 2^63 for corpora under ~2e14 micro-nats
            # per doc — unreachable (ppl stays double: exp() of a
            # rational is irrational, never on a boundary).
            round4_ratio(F.col("sum_nll_u"),
                         F.col("n_tokens") * F.lit(1_000_000))
            .alias("avg_nll"),
            F.round(F.exp(F.col("sum_nll_u")
                          / (F.col("n_tokens") * 1e6)), 2).alias("ppl"),
        )
    )


def _lm_score_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: bigram LM scoring — one order up from lm_score's unigram
    stand-in and the shape of an actual KenLM-style filter: per-doc
    mean -ln P(w2|w1) under the corpus MLE bigram model
    (P = c(w1,w2) / c(w1,·)).  Same integer micro-nat quantization as
    lm_score so the per-doc reduction is an exact integer sum.  Docs
    with fewer than two tokens have no bigrams and drop out (inner
    semantics, mirrored by the oracle).

    100 TB shape: bigram extraction is a narrow map (lockstep zip of
    two array slices); the model join shuffles the bigram stream on
    (w1, w2) then (w1) — Zipf-headed keys, same heavy-hitter caveat
    (and broadcast-top-K remedy) as lm_score's docstring."""
    docs = load(spark, sf_dir, "documents")
    ws = _tokens(F.col("text"))
    pairs = (
        docs.where(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(F.arrays_zip(
                F.slice(ws, 1, F.size(ws) - 1).alias("w1"),
                F.slice(ws, 2, F.size(ws) - 1).alias("w2"),
            )).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    )
    cbg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cw1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    nll_u = F.floor(
        -F.log(F.col("c2") / F.col("c1")) * 1e6 + F.lit(0.5)
    ).cast("bigint")
    scored = (
        pairs.join(cbg, ["w1", "w2"]).join(cw1, ["w1"])
        .select("doc_id", nll_u.alias("nll_u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.sum("nll_u").alias("sum_nll_u"))
        .select(
            "doc_id", "n_bigrams",
            # exact integer-space rounding — the round-5 extended-seed
            # sweep caught sum/(n*1e6) = 2.51075 EXACTLY (n=4): Spark's
            # shortest-repr HALF_UP said 2.5108, DuckDB's binary value
            # 2.5107.  See functions/exact.py.
            round4_ratio(F.col("sum_nll_u"),
                         F.col("n_bigrams") * F.lit(1_000_000))
            .alias("avg_nll2"),
            F.round(F.exp(F.col("sum_nll_u")
                          / (F.col("n_bigrams") * 1e6)), 2).alias("ppl2"),
        )
    )


#: Jelinek-Mercer mixture weight λ = JM_LAMBDA_NUM / JM_LAMBDA_DEN on
#: the bigram term — an EXACT RATIONAL, never a float literal, so the
#: interpolated probability stays a ratio of wide integers end to end.
JM_LAMBDA_NUM = 7
JM_LAMBDA_DEN = 10


def _lm_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r12 debut): Jelinek-Mercer interpolated bigram/unigram LM
    scoring per doc — the actual KenLM-filter shape (a pure MLE bigram
    assigns zero mass to unseen continuations; every production
    perplexity filter interpolates toward lower orders):
    P(w2|w1) = λ·c(w1,w2)/c(w1,·) + (1−λ)·freq(w2)/total, scored over
    every bigram position, composing `lm_score`'s unigram model with
    `lm_score_bigram`'s bigram model.  Docs with fewer than two tokens
    have no bigrams and drop out (inner semantics, the bigram sibling's
    contract).

    Cross-engine determinism: the interpolated probability is formed
    as ONE exact rational BEFORE any transcendental —
    num = λn·c2·total + (λd−λn)·freq·c1, den = λd·c1·total — in wide
    integer space (DECIMAL(38,0) on Spark, HUGEINT on DuckDB; the
    collocation_pmi overflow discipline: at 100 TB c2,c1 ≤ total ≈
    1e13 and freq ≤ 1e13 give num ≤ 1e27, far inside both).  num and
    den convert to double exactly-identically on both engines (exact
    wide integer → nearest double), the single IEEE division has
    identical operands, and -ln of it is the lm_score 1-ulp libm
    class, quantized to integer MICRO-NATS (floor(x·1e6 + 0.5)) so the
    per-doc reduction is an exact BIGINT sum.  p ∈ (0, 1] by
    construction (both mixture terms are ≤ their weights), so nll_u
    ≥ 0 and round4_ratio's non-negative contract holds.

    100 TB shape: the bigram stream shuffles on (w1,w2) then (w1)
    (lm_score_bigram's exchanges) plus ONE more token-keyed join
    against the unigram vocab on w2 — all Zipf-headed keys with the
    same broadcast-top-K remedy documented on lm_score; the two model
    tables are vocab-sized, not stream-sized."""
    docs = load(spark, sf_dir, "documents")
    ws = _tokens(F.col("text"))
    # r13 OPT (guide §1.2): what shipped here is the MODEL-TABLE
    # join-shape change alone — the bigram model (cbg⋈c1⋈freq⋈total at
    # bigram-vocab grain, one -ln per bigram TYPE) attaches to the
    # occurrence stream with ONE (w1, w2) join instead of three
    # stream-wide joins with per-occurrence logs.  `pairs` itself is
    # NOT checkpointed: its three readers are vocab-grain aggregates
    # whose duplicate scan branches run concurrently in local mode and
    # fold into one pass behind the model table's single join at scale
    # (r14 ADVICE fix: the previous comment claimed an eager
    # materialization that was never added).
    pairs = (
        docs.where(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(F.arrays_zip(
                F.slice(ws, 1, F.size(ws) - 1).alias("w1"),
                F.slice(ws, 2, F.size(ws) - 1).alias("w2"),
            )).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    )
    cbg = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cw1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    total = uc.agg(F.sum("freq").alias("total"))
    # Each operand is cast to DECIMAL(19,0) (exact for any BIGINT);
    # Spark then widens each 19,0 × 19,0 PRODUCT to DECIMAL(38,0),
    # which is what keeps the long×long products exact (r12 verdict:
    # the alias itself is 19,0 — only the products are 38,0).
    dec = "decimal(19,0)"
    num = ((F.col("c2") * JM_LAMBDA_NUM).cast(dec)
           * F.col("total").cast(dec)
           + (F.col("freq") * (JM_LAMBDA_DEN - JM_LAMBDA_NUM)).cast(dec)
           * F.col("c1").cast(dec)).cast("double")
    den = ((F.col("c1") * JM_LAMBDA_DEN).cast(dec)
           * F.col("total").cast(dec)).cast("double")
    nll_u = F.floor(-F.log(num / den) * 1e6 + F.lit(0.5)).cast("bigint")
    # r13 OPT (guide §2.3 "aggregate before you shuffle", applied to
    # expression work): nll_u depends only on (w1, w2) — form the
    # model TABLE first (bigram-vocab grain: c2 ⋈ c1 ⋈ freq ⋈ total,
    # one -ln per bigram TYPE), then attach it to the occurrence
    # stream with ONE (w1, w2)-keyed join.  The old shape joined the
    # full stream three times (by (w1,w2), by w1, by w2) and took the
    # log per OCCURRENCE.  Row-for-row identical values: the join is
    # inner on keys that exist by construction (cbg/cw1/uc are built
    # from the same streams), multiplicity 1 on the model side, and
    # the per-doc BIGINT sum is order-free.
    model = (
        cbg.join(cw1, ["w1"])
        .join(uc, cbg.w2 == uc.tok)
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", nll_u.alias("nll_u"))
    )
    scored = pairs.join(model, ["w1", "w2"]).select("doc_id", "nll_u")
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.sum("nll_u").alias("sum_nll_u"))
        .select(
            "doc_id", "n_bigrams",
            # exact integer-space rounding (the lm_score_bigram
            # exact-half precedent); same overflow envelope
            round4_ratio(F.col("sum_nll_u"),
                         F.col("n_bigrams") * F.lit(1_000_000))
            .alias("avg_nll_jm"),
            F.round(F.exp(F.col("sum_nll_u")
                          / (F.col("n_bigrams") * 1e6)), 2)
            .alias("ppl_jm"),
        )
    )


def _source_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r10 debut): per-SOURCE language-model perplexity rollup —
    the pipeline-level readout on top of `lm_score`'s per-doc filter:
    a crawl-source whose aggregate perplexity under the corpus unigram
    LM is far above the fleet is serving boilerplate, spam, or the
    wrong language, and gets down-weighted or recrawled (the
    CCNet/RedPajama per-shard perplexity buckets, rolled to source
    grain).  Same model as lm_score (p(tok) = freq/total over the
    whole corpus); the rollup reduces the token stream BY SOURCE
    instead of by doc and adds doc/token volume alongside the
    aggregate perplexity.

    Cross-engine determinism: identical to lm_score — per-token -ln p
    quantized to integer micro-nats, exact BIGINT sums, ONE exp at
    the end (transcendental output, never on a decimal half);
    avg_nll is round4_ratio (half-up in pure int64).

    100 TB shape: the vocab join is lm_score's one token-keyed
    shuffle (`_lm_scored_tokens`, the shared chain); the source
    rollup is a second reduce whose state is |sources| rows —
    strictly cheaper than lm_score's per-doc state.  No new shuffle
    classes, no collect."""
    scored = _lm_scored_tokens(load(spark, sf_dir, "documents"))
    return (
        scored.groupBy("source")
        .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"),
             F.count("*").cast("long").alias("n_tokens"),
             F.sum("nll_u").cast("long").alias("sum_nll_u"))
        .select(
            "source", "n_docs", "n_tokens",
            round4_ratio(F.col("sum_nll_u"),
                         F.col("n_tokens") * F.lit(1_000_000))
            .alias("avg_nll"),
            F.round(F.exp(F.col("sum_nll_u")
                          / (F.col("n_tokens") * 1e6)), 2).alias("ppl"))
        .orderBy("source"))


def _length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r12 debut): per-source document-length order statistics —
    p10/p50/p90 of `n_chars` plus the exact mean, the readout a
    curation pipeline reads to TUNE its length cutoffs per source
    (Gopher's word-count band is global; real shards need per-source
    thresholds because a code source and a news source have wildly
    different healthy lengths).  The `seasonal_envelope` idiom pointed
    at the corpus: DISCRETE order statistics at pure-integer ceil
    ranks ((n·k + 99) div 100) — never interpolated percentiles, never
    float rank arithmetic — over an already-integer measure (n_chars
    is BIGINT, so there is no cents quantization step).

    NULL-measure contract: rows with NULL n_chars are excluded up
    front on both engines (an unmeasured length can't rank); a source
    whose lengths are ALL NULL drops out entirely rather than emitting
    a row of NULLs.  The mean is an exact wide-integer half-up ratio
    (round4_ratio_dec — Σ n_chars can pass the int64·2e4 bound at
    100 TB).

    100 TB shape: ONE hash exchange on the |sources|-sized key feeds
    the ranking window, the three band extractions (same partition →
    the windows share one sort), and the final agg.  At production
    scale swap the exact order statistics for approx_percentile
    sketches — identical downstream shape; exactness kept here for the
    oracle (the winsorize/seasonal_envelope note)."""
    docs = (load(spark, sf_dir, "documents")
            .where(F.col("n_chars").isNotNull())
            .select("source", "doc_id", "n_chars"))
    part = Window.partitionBy("source")
    ranked = (docs
              .withColumn("rn", F.row_number().over(
                  part.orderBy("n_chars", "doc_id")))
              .withColumn("n", F.count("*").over(part)))
    band = lambda k: F.max(F.when(                      # noqa: E731
        F.col("rn") == F.expr(f"(n * {k} + 99) div 100"),
        F.col("n_chars"))).over(part)
    return (ranked
            .withColumn("p10", band(10))
            .withColumn("p50", band(50))
            .withColumn("p90", band(90))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.max("p10").alias("p10_chars"),
                 F.max("p50").alias("p50_chars"),
                 F.max("p90").alias("p90_chars"),
                 round4_ratio_dec(
                     F.sum(F.col("n_chars").cast("decimal(38,0)")),
                     F.count("*").cast("decimal(38,0)"))
                 .alias("mean_chars"))
            .orderBy("source"))


PMI_MIN_COUNT = 5  # collocation support floor: bigrams rarer than
#                    this carry no statistical signal and would blow
#                    the output up with hapax noise


def _collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r6 debut): collocation mining via pointwise mutual
    information — the standard phrase-detection pass (word2vec's
    phrase pre-join, topic-model vocab building) a training-data
    pipeline runs to decide which bigrams become single vocabulary
    units.  PMI(w1,w2) = ln( P(w1,w2) / (P(w1·)·P(·w2)) ) over the
    corpus bigram stream = ln( c12·N / (c1·c2) ) with positional
    marginals (c1 = w1-as-first count, c2 = w2-as-second count).

    Cross-engine exactness: every count is an exact BIGINT, and the
    products c12·N and c1·c2 are formed in WIDE integer space —
    DECIMAL(38,0) on Spark, HUGEINT on DuckDB (ADVICE r6: int64
    products overflow past ~3e9 total bigrams, an ANSI/DuckDB runtime
    error at corpus scale) — then cast to double: an exact wide
    integer's nearest-double conversion is identical on both engines
    (bit-exact below 2^53, same round-to-nearest tie rule above it),
    so the one double division has identical operands everywhere;
    ln() of that identical double is the same 1-ulp libm class as
    lm_score's ppl (transcendental output — cannot land on an exact
    decimal half; plain round(,4) per the repo rounding policy).  The PMI_MIN_COUNT floor keeps the report to
    statistically supported pairs AND bounds the output (no float
    top-k cut whose near-tie ordering could diverge cross-engine).

    100 TB shape: bigram extraction is a narrow map; the three
    aggregations are partial-agg'd counts on Zipf-headed keys (AQE
    skew-split absorbs the head); the c1/c2 marginal joins hit the
    ALREADY (w1,w2)-reduced pair table — model-sized, not
    stream-sized — so the expensive token stream is shuffled once."""
    docs = load(spark, sf_dir, "documents")
    ws = _tokens(F.col("text"))
    pairs = (
        docs.where(F.size(ws) >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice(ws, 1, F.size(ws) - 1).alias("w1"),
            F.slice(ws, 2, F.size(ws) - 1).alias("w2"))).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # r14 OPT (guide §2.3 "aggregate before you shuffle", the cms_topk
    # move): the positional marginals and the grand total are sums
    # over the (w1, w2)-reduced bigram-VOCAB table — c1(w) = Σ_{w2}
    # c12(w, w2) etc., exact integer identities — so the corpus
    # tokenize→zip→explode stream is derived and shuffled ONCE instead
    # of four times.  The vocab table is lazily checkpointed (bounded
    # by bigram-type count, not stream size); its three readers are
    # model-grain re-aggregations.
    bg = (pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
          .localCheckpoint(eager=False))
    cbg = bg.where(F.col("c12") >= PMI_MIN_COUNT)
    cw1 = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    cw2 = bg.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n_total = bg.agg(F.coalesce(F.sum("c12"), F.lit(0).cast("long"))
                     .alias("n_bigrams"))
    # operands cast to DECIMAL(19,0); each 19,0 × 19,0 product widens
    # to DECIMAL(38,0), so the long×long products are exact
    dec = "decimal(19,0)"
    num = (F.col("c12").cast(dec)
           * F.col("n_bigrams").cast(dec)).cast("double")
    den = (F.col("c1").cast(dec)
           * F.col("c2").cast(dec)).cast("double")
    return (cbg.join(cw1, "w1").join(cw2, "w2")
            .crossJoin(F.broadcast(n_total))
            .select(
                "w1", "w2", "c12",
                F.round(F.log(num / den), 4).alias("pmi")))


def _lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r6 debut): language-metadata QA — the confusion matrix
    between the DECLARED `lang` column and the n-gram-marker
    prediction (`lang_id`'s predictor, same argmax/tie rules), the
    report a curation pipeline reads to find mislabeled or
    code-switched shards before sampling by language.  Per
    (true_lang, pred_lang) cell: doc count and recall share
    (n / total docs of that true_lang — the row-normalized confusion
    matrix).  share is a ratio of integers → exact-int rounding
    (round4_ratio; the engine round() exact-half class).

    100 TB shape: the marker scoring is a narrow per-row expression
    (no shuffle), the matrix is one partial-agg'd groupBy on a
    ≤|langs|² key space, and the row totals come from a window over
    the ALREADY-aggregated 25-cell table — scan-bound end to end."""
    docs = load(spark, sf_dir, "documents")
    pred = _lang_pred_col()
    cells = (docs
             .select(F.col("lang").alias("true_lang"),
                     pred.alias("pred_lang"))
             .groupBy("true_lang", "pred_lang")
             .agg(F.count("*").alias("n_docs")))
    tot = Window.partitionBy("true_lang")  # ≤|langs|² rows: bounded
    return cells.select(
        "true_lang", "pred_lang", "n_docs",
        round4_ratio(F.col("n_docs"),
                     F.sum("n_docs").over(tot)).alias("share_of_true"))


GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WLEN, GOPHER_MAX_WLEN = 3, 10   # mean word length band
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 8, 10  # ≥80% tokens alphabetic
GOPHER_MIN_STOP = 2  # at least 2 stopword hits


def _gopher_fail_cols() -> dict:
    """The four Gopher rule FAIL predicates over ``F.col("text")`` —
    every comparison in INTEGER space by cross-multiplication (no
    float is formed anywhere; ratio thresholds on doubles are the
    documented exact-half divergence class).  Single copy shared by
    `gopher_rules` (the per-rule audit) and `filter_funnel` (stage 1
    of the curation chain), the _quality_feature_cols discipline."""
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    # total word chars = non-whitespace chars (tokens are split on \s+)
    sum_len = F.length(F.regexp_replace("text", f"[{WS_CHARS}]", ""))
    alpha_toks = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(
        toks, lambda t: F.array_contains(stop_arr, t)))
    return {
        "n_fail_nwords": (n < GOPHER_MIN_WORDS) | (n > GOPHER_MAX_WORDS),
        "n_fail_wlen": (sum_len < GOPHER_MIN_WLEN * n)
                       | (sum_len > GOPHER_MAX_WLEN * n),
        "n_fail_alpha": alpha_toks * GOPHER_ALPHA_DEN
                        < GOPHER_ALPHA_NUM * n,
        "n_fail_stop": stop_hits < GOPHER_MIN_STOP,
    }


def _gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): Gopher-style quality-rule audit (Rae et al.
    2021 §A.1.1, public) — the per-source report of how many documents
    each repetition-independent quality rule would remove: word count
    outside [50, 100k], mean word length outside [3, 10], under 80% of
    tokens containing an alphabetic character, fewer than 2 stopword
    hits.  `text_quality` emits the per-doc SIGNALS; this op applies
    the published THRESHOLDS and aggregates the verdicts — what a
    curation run actually reads before committing a filter config.

    Cross-engine exactness: every rule is evaluated in INTEGER space
    by cross-multiplication (mean_wlen < 3  ⇔  sum_len < 3·n; the
    alpha ratio via 10·alpha_toks < 8·n) — no float is formed anywhere
    except the final pass_share, which is int/int through
    ``round4_ratio``.  Ratio-threshold comparisons on doubles are the
    documented exact-half divergence class; integer cross-multiply
    sidesteps it entirely.

    100 TB shape: all rule columns are narrow per-row expressions
    (tokenize once, reuse); one partial-agg'd groupBy on the tiny
    source key — scan-bound."""
    docs = load(spark, sf_dir, "documents")
    fails = _gopher_fail_cols()
    flagged = docs.select(
        "source",
        *[F.when(c, 1).otherwise(0).alias(k) for k, c in fails.items()],
    ).withColumn(
        "passed",
        F.when(sum(F.col(k) for k in fails) == 0, 1).otherwise(0))
    return (
        flagged.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             *[F.sum(k).alias(k) for k in fails],
             F.sum("passed").alias("n_pass"))
        .select("source", "n_docs", *fails.keys(), "n_pass",
                round4_ratio(F.col("n_pass"), F.col("n_docs"))
                .alias("pass_share"))
    )


#: lm_band stage bounds in integer micro-nats (per-token mean NLL in
#: [3.390, 3.406] nats on the corpus unigram LM): the two-sided
#: perplexity band every curation run applies after dedup — too-high
#: NLL is garbage/wrong-language, too-LOW is repetitive boilerplate
#: the LM finds too easy.  Compared by cross-multiplication
#: (sum_nll_u vs n·BOUND), so the stage verdict is integer-exact.
LM_BAND_MIN_U, LM_BAND_MAX_U = 3_390_000, 3_406_000


def _filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r11 debut): per-stage attrition of the canonical curation
    chain — the funnel readout a pipeline owner reads before shipping
    a filter config (which stage is doing the removing, and is any
    stage degenerate?).  `corpus_curate` runs a chain and reports only
    the survivors; this decomposes the chain per stage:

      1 gopher_rules — all four Gopher quality rules pass
        (_gopher_fail_cols, the audit's exact integer predicates);
      2 lang_en     — language filter on the survivors;
      3 exact_dedup — sha2 content-hash dedup, min-doc_id survivor
        AMONG stage-2 survivors (dedup after filtering, the canonical
        order: why hash garbage you already dropped?);
      4 lm_band     — corpus-unigram-LM mean NLL inside
        [LM_BAND_MIN_U, LM_BAND_MAX_U] micro-nats (lm_score's model,
        integer cross-multiplied — no float threshold).

    One row per stage: (stage_idx, stage, n_in, n_out, kept_share,
    cum_share), shares exact-half-up via round4_ratio (NULL when the
    stage input is empty — the funnel's honest degenerate shape).

    100 TB shape: the flags are one narrow pass over the corpus; the
    dedup flag is a window keyed on digest (the exact-dedup shuffle,
    carrying only flagged survivors' ids in the min); the LM join is
    lm_score's token-keyed shuffle; the readout is ONE global 5-counter
    aggregate — a single row — then a 4-row stack.  Nothing scales
    with anything but the corpus scan."""
    docs = load(spark, sf_dir, "documents")
    fails = _gopher_fail_cols()
    lm = (_lm_scored_tokens(docs)
          .groupBy("doc_id")
          .agg(F.count("*").alias("n_lm"),
               F.sum("nll_u").alias("sum_nll_u")))
    flagged = (docs.select(
        "doc_id", "lang",
        F.sha2(F.col("text"), 256).alias("digest"),
        sum(F.when(c, 1).otherwise(0) for c in fails.values())
        .alias("n_fails"))
        .join(lm, "doc_id", "left"))
    # text IS NOT NULL is an explicit stage-1 conjunct (r11 advice): a
    # NULL-text doc's four Gopher FAIL predicates all fold to NULL →
    # n_fails 0, so without the guard it would sail through stages 1-3
    # and inflate survivor counts before dying at lm_band — a quality
    # funnel whose stage-1 contract is "all four rules pass" must fail
    # a doc with no text AT stage 1, on both engines
    pass_g = (F.col("n_fails") == 0) & F.col("digest").isNotNull()
    pass_l = pass_g & (F.col("lang") == "en")
    min12 = F.min(F.when(pass_l, F.col("doc_id"))).over(
        Window.partitionBy("digest"))
    # window flags must be PROJECTED before the aggregate (a window
    # function can't sit inside an agg expression), so the per-doc
    # verdicts become plain int columns first
    pass_d = pass_l & (F.col("doc_id") == min12)
    pass_m = (pass_d & F.col("sum_nll_u").isNotNull()
              & (F.col("sum_nll_u") >= F.col("n_lm") * LM_BAND_MIN_U)
              & (F.col("sum_nll_u") <= F.col("n_lm") * LM_BAND_MAX_U))
    verdicts = flagged.select(
        *[F.when(c, 1).otherwise(0).alias(k)
          for k, c in (("p_g", pass_g), ("p_l", pass_l),
                       ("p_d", pass_d), ("p_m", pass_m))])

    def cnt(c):
        # global agg: coalesce so the empty corpus yields 0, not NULL
        return F.coalesce(F.sum(c), F.lit(0)).cast("long")

    agg = verdicts.agg(
        F.count("*").alias("n0"), cnt("p_g").alias("n1"),
        cnt("p_l").alias("n2"), cnt("p_d").alias("n3"),
        cnt("p_m").alias("n4"))
    stages = agg.select(
        F.col("n0").alias("n_total"),
        F.expr("stack(4, 1, 'gopher_rules', n0, n1,"
               "         2, 'lang_en',      n1, n2,"
               "         3, 'exact_dedup',  n2, n3,"
               "         4, 'lm_band',      n3, n4)"
               " AS (stage_idx, stage, n_in, n_out)"))
    return stages.select(
        "stage_idx", "stage", "n_in", "n_out",
        round4_ratio(F.col("n_out"), F.col("n_in")).alias("kept_share"),
        round4_ratio(F.col("n_out"), F.col("n_total")).alias("cum_share"),
    ).orderBy("stage_idx")


IMP_BUCKETS = 10_000  # hash-bucket space for acceptance tests


def _importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): deterministic importance sampling — keep each
    document with probability proportional to an integer quality score
    (here: stopword hits + 1, the cheap English-likeness proxy;
    production swaps in a DSIR-style importance weight, same DAG).
    Acceptance is a HASH test, not an RNG draw: doc i is kept iff
    sha256-bucket(doc_id) < floor(B · score_i / max_score) — the same
    rows survive on every rerun, every engine, any partitioning
    (the `sample_hash` reproducibility argument, applied to
    score-proportional instead of per-stratum-constant rates).

    Cross-engine exactness: the threshold is a pure-integer floor
    division (score·B // max_score), the bucket is the first 8 hex
    chars of a public hash — no float anywhere; the output's kept
    share is int/int via ``round4_ratio``.

    100 TB shape: max_score is a 1-row agg broadcast back (no driver
    round-trip); scoring + acceptance are narrow per-row expressions;
    the report is one partial-agg'd groupBy(lang) — scan-bound."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    score = (F.size(F.filter(
        toks, lambda t: F.array_contains(stop_arr, t))) + 1
    ).cast("long")
    bucket = F.pmod(
        F.conv(F.substring(
            F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long"),
        F.lit(IMP_BUCKETS))
    scored = docs.select("lang", score.alias("score"),
                         bucket.alias("bucket"))
    mx = scored.agg(F.max("score").alias("max_score"))
    # integer floor-div threshold: (score * B) // max_score — the
    # (num - pmod) subtraction makes the one division exactly
    # divisible (same exactness argument as round4_ratio)
    num = F.col("score") * IMP_BUCKETS
    kept = (
        scored.crossJoin(F.broadcast(mx))
        .withColumn(
            "thresh",
            ((num - F.pmod(num, F.col("max_score")))
             / F.col("max_score")).cast("long"))
        .withColumn("is_kept",
                    F.when(F.col("bucket") < F.col("thresh"), 1)
                    .otherwise(0))
    )
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("is_kept").alias("n_kept"),
             F.sum(F.when(F.col("is_kept") == 1, F.col("score"))
                   .otherwise(0)).alias("kept_score_sum"))
        .select("lang", "n_docs", "n_kept", "kept_score_sum",
                round4_ratio(F.col("n_kept"), F.col("n_docs"))
                .alias("kept_share"))
    )


MIX_BUDGET_FRAC = 0.5  # token budget = this share of the corpus


def _mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: dataset-mixture planning — the step that turns "web 50%,
    books 20%, ..." domain weights into per-source sampling fractions
    for a fixed training-token budget.  Weights here are a
    deterministic function of the source name (idx % 4 + 1) so the
    whole plan is oracle-checkable; production swaps in a weights
    table, same DAG.  Emits per source: inventory (docs, tokens),
    weight, the token target (floor(x+0.5)-quantized so both engines
    agree), the sampling fraction to apply, and whether the source is
    OVERSUBSCRIBED (target > inventory — the signal to re-normalize or
    up-epoch that domain).

    One groupBy(source) over the corpus (partial-agg shrinks it to the
    source cardinality) + a broadcast 1-row totals join: the 100 TB
    cost is the single token-count scan."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.size(_tokens(F.col("text")))
                    .alias("n_tokens"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("avail_tokens"))
        # try_cast + coalesce(0): a source label with NO digits (the
        # r12 unicode CJK-replace arm) extracts '' whose strict INT
        # cast is an ANSI crash — a digit-less source gets the base
        # weight 1, same on both engines
        .withColumn("weight",
                    (F.coalesce(
                        F.regexp_extract("source", r"(\d+)", 1)
                         .try_cast("int"), F.lit(0)) % 4 + 1)
                    .cast("bigint"))
    )
    totals = per_src.agg(F.sum("avail_tokens").alias("corpus_tokens"),
                         F.sum("weight").alias("w_sum"))
    target = F.floor(
        F.col("corpus_tokens") * MIX_BUDGET_FRAC
        * F.col("weight") / F.col("w_sum") + F.lit(0.5)).cast("bigint")
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source", "n_docs", "avail_tokens", "weight",
            target.alias("target_tokens"),
            # r13 empty-keys sweep: a source whose every doc is
            # tokenless has avail_tokens = 0 — target/avail is an
            # ANSI DIVIDE_BY_ZERO crash on Spark and NULL on DuckDB;
            # the fraction is undefined, so both engines emit NULL
            # (oversubscribed still flags it when target > 0).  A
            # NULL inventory (all-NULL text) is NULL too — the when()
            # covers it, and the oracle's CASE spells IS NULL
            # explicitly because DuckDB's least() SKIPS NULLs (the
            # pre-r13 behavior emitted a phantom 1.0 there).
            F.when(F.col("avail_tokens") > 0,
                   F.round(F.least(F.lit(1.0),
                                   target / F.col("avail_tokens")), 4))
             .alias("sample_frac"),
            (target > F.col("avail_tokens")).alias("oversubscribed"),
        )
    )


def _text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: repetition signals from the Gopher-style quality filter
    family — fraction of a document's tokens consumed by its single
    most frequent token, and of its token-bigrams by the most frequent
    bigram.  High values mark degenerate/boilerplate text that length
    and stopword checks (text_quality) miss.  (The line-based Gopher
    rules are omitted deliberately: the fixture corpus has no
    newlines, so they would be vacuously zero — see bench corpus
    shape.)

    Plan: explode + two-level aggregate, everything keyed on doc_id —
    one doc-keyed shuffle, per-doc state is (count, max), never the
    token list."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 5)
    ws = _tokens(F.col("text"))
    toks = docs.select("doc_id", F.explode(ws).alias("tok"))
    tok_stats = (toks.groupBy("doc_id", "tok").count()
                 .groupBy("doc_id")
                 .agg(F.sum("count").alias("n_tok"),
                      F.max("count").alias("mx_tok")))
    # bigrams via zip_with of the array against its own 1-shifted
    # slice — per-element O(1).  The r7 form indexed element_at(ws, i)
    # on the UNPROJECTED split expression inside the lambda, which
    # Catalyst re-evaluates PER ELEMENT (O(L²): one 20k-token doc took
    # ~140s — the same book-length-document latent as
    # collapse_repeats, found by the r9 long-doc sweep).
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.concat_ws(" ", a, b)),
            ).otherwise(F.array().cast("array<string>"))).alias("bg"))
    bg_stats = (bigrams.groupBy("doc_id", "bg").count()
                .groupBy("doc_id")
                .agg(F.sum("count").alias("n_bg"),
                     F.max("count").alias("mx_bg")))
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.col("mx_tok") / F.col("n_tok"), 4)
             .alias("top_token_frac"),
            F.round(F.col("mx_bg") / F.col("n_bg"), 4)
             .alias("top_bigram_frac"),
        )
    )


BPE_END = "</w>"  # word-end marker so merges can't cross word bounds


def bpe_train(docs: DataFrame, n_merges: int = 16,
              min_freq: int = 2) -> list[tuple[str, str, int]]:
    """EXT: the FULL iterative BPE trainer (bpe_pair_stats is one step
    of this loop) — SentencePiece/GPT-2 style word-level training:

      1. reduce the corpus to the (word, frequency) table FIRST — the
         big cardinality cut; training cost then scales with VOCAB
         size, not corpus size (the standard trainer optimization);
      2. per merge round: adjacent-symbol pair frequencies (weighted
         by word freq, one narrow explode + small-key shuffle), pick
         the most frequent pair (freq desc, pair asc — deterministic),
         apply it to every word's symbol sequence (Arrow pandas UDF —
         adjacent-merge is inherently sequential per word), and
         localCheckpoint the shrinking state (same iterative-lineage
         hygiene as the CC loops).

    The per-round driver .first() is the trainer's control decision —
    one tiny row per round, the same pattern as every published
    distributed BPE/unigram trainer.  Returns the merge table
    [(left, right, freq)], the artifact a tokenizer ships."""
    from pyspark.sql.functions import pandas_udf

    words = (docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
             .groupBy("w").agg(F.count("*").alias("freq")))
    symbols = F.concat(
        F.filter(F.split("w", ""), lambda c: c != ""),
        F.array(F.lit(BPE_END)))
    state = words.select(symbols.alias("syms"), "freq") \
        .localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b"))),
        ).otherwise(F.array().cast(
            "array<struct<a:string,b:string>>"))
        best = (state.select(F.explode(pair_structs).alias("p"), "freq")
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("freq"))
                .orderBy(F.col("freq").desc(), F.col("a").asc(),
                         F.col("b").asc())
                .first())
        if best is None or best.freq < min_freq:
            break
        merges.append((best.a, best.b, int(best.freq)))
        la, lb = best.a, best.b

        @pandas_udf("array<string>")
        def merged(syms: pd.Series) -> pd.Series:
            def one(s):
                out, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == la and s[i + 1] == lb:
                        out.append(la + lb)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                return out
            return syms.map(lambda s: one(list(s)))

        state = state.select(merged("syms").alias("syms"), "freq") \
            .localCheckpoint(eager=True)
    return merges


BPE_ENCODE_MERGES = 12

#: trained merge tables memoized per (corpus fingerprint, n_merges) —
#: the trainer is a multi-job driver loop; every consumer of one
#: sf_dir's corpus (query construction, pytest, repeated driver runs)
#: should resolve the identical artifact once per process.  Same
#: inputFiles+mtime fingerprint idiom as similarity._cent_cache_key.
_BPE_MERGE_CACHE: dict = {}


def bpe_merges_for(docs: DataFrame,
                   n_merges: int = BPE_ENCODE_MERGES) -> list:
    import os
    try:
        files = tuple(sorted(docs.inputFiles()))
        stamps = tuple(os.stat(f.removeprefix("file:")).st_mtime_ns
                       for f in files if f.startswith("file:"))
        key = (files, stamps, n_merges)
    except Exception:              # non-file-backed frame: don't cache
        return bpe_train(docs, n_merges=n_merges)
    if key not in _BPE_MERGE_CACHE:
        _BPE_MERGE_CACHE[key] = bpe_train(docs, n_merges=n_merges)
    return _BPE_MERGE_CACHE[key]


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode ONE word against an ordered merge table — the exact
    per-word loop the trainer applies, replayed at inference.  Pure
    Python so the differential test and the Arrow UDF share one
    implementation (tests/test_bpe.py replays it independently)."""
    syms = list(word) + [BPE_END]
    for a, b in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: BPE tokenization APPLY — encode every document against the
    merge table ``bpe_train`` produced, reporting per-doc word count,
    BPE piece count (word-end markers included unless a merge fused
    them) and the pieces-per-word compression the tokenizer achieves.

    The scale trick is WHERE the encoding runs: per distinct WORD, not
    per token occurrence.  The corpus reduces to (doc, word, count),
    the distinct-word vocabulary is encoded once by an Arrow UDF
    (cost ∝ vocab size — Zipf-bounded — not corpus size), and the
    per-word piece counts broadcast back onto the doc-word table; the
    per-doc totals are then exact integer sums.  This is how real
    tokenizer fleets amortize encode cost over web-scale corpora.

    Driver check is rows-only BY DESIGN: the encode is an ordered
    iterative rewrite (not SQL-expressible without unrolling a
    corpus-dependent merge table); its correctness evidence is the
    differential replay in tests/test_bpe.py instead."""
    from pyspark.sql.functions import pandas_udf

    docs = load(spark, sf_dir, "documents")
    merges = [(a, b) for a, b, _ in bpe_merges_for(docs)]

    @pandas_udf("int")
    def n_pieces(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(bpe_apply(w, merges)))

    wcounts = (
        docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    )
    vocab_enc = (wcounts.select("w").distinct()
                 .withColumn("n_pieces", n_pieces("w")))
    return (
        wcounts.join(F.broadcast(vocab_enc), "w")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_words"),
             F.sum(F.col("cnt") * F.col("n_pieces"))
              .alias("n_bpe_tokens"))
        .select("doc_id", "n_words", "n_bpe_tokens",
                F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4)
                 .alias("pieces_per_word"))
    )


def _bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: the BPE-training primitive — corpus-wide adjacent
    character-pair frequencies (every merge step of byte-pair-encoding
    training is 'count adjacent pairs, merge the most frequent').  One
    explode per token occurrence into its len-1 overlapping 2-grams,
    then a plain count + deterministic top-15 (freq desc, pair asc).

    Scale: pair extraction is a narrow map (no UDF — Column.substr
    with a lambda index); the shuffle carries (pair, partial count)
    states whose cardinality is bounded by the alphabet², not the
    corpus.  A full BPE trainer iterates this exact query against a
    shrinking symbol sequence — the per-iteration plan is this one."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    pairs = toks.select(F.explode(
        F.when(
            F.length("tok") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.col("tok").substr(i, F.lit(2))),
        ).otherwise(F.array().cast("array<string>"))).alias("pair"))
    return (
        pairs.groupBy("pair").agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair").asc())
        .limit(15)
    )


def _split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: deterministic train/val/test split (90/5/5) — the step
    after curation in every training-data pipeline.  The split is a
    pure function of the document id (sha256 bucket mod 100), so it is
    partition-, engine-, and rerun-invariant: a document never migrates
    between splits when the corpus is re-sharded or a source is
    re-crawled — the property seeded randomSplit() does NOT have.
    Same public-hash idiom as sample_hash, so fully oracle-checked.
    Output: per (source, split) doc and char totals — narrow map +
    one small-key shuffle."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(
            F.sha2(F.col("doc_id").cast("string"), 256), 1, 8), 16, 10)
         .cast("long"),
        F.lit(100))
    split = (F.when(bucket < 90, "train")
             .when(bucket < 95, "val")
             .otherwise("test"))
    return (
        docs.groupBy(F.col("source"), split.alias("split"))
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
    )


#: BM25 ranking parameters (Robertson/Sparck-Jones defaults) and the
#: fixed keyword query.  Embedded as identical literals in the Spark
#: expression and the DuckDB oracle.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "window")


def _text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: BM25 ranked retrieval — score every document against a
    fixed keyword query and return the top 20, the classic
    inverted-index relevance function (and the first-stage retriever
    in most RAG / training-data search stacks).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Scale shape: tokens are filtered to the QUERY TERMS before any
    aggregation — the per-(doc,term) shuffle carries only matching
    postings (exactly what an inverted index would fetch), not the
    corpus vocabulary; df and avgdl are tiny aggregates broadcast
    back; the final top-20 is a rounded-score sort-limit
    (TakeOrderedAndProject), never a global sort.  Float parity: the
    per-doc sum over query terms is an explicit coalesce(t1)+...+tn
    chain (conditional-aggregation pivot), not a SUM whose
    accumulation order the engine picks; ordering ties break on the
    ROUNDED score then doc_id, so a 1-ulp ln() divergence between
    libm and the JVM cannot flip ranks."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(_tokens(F.col("text"))).alias("dl"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"))
    # r14 OPT (guide §1.2): the query-term stream feeds the tf table
    # AND the df table — unmaterialized, the scan+tokenize+explode
    # ran twice.  Lazy checkpoint; the stream is filtered to the
    # |BM25_QUERY| terms, so the materialization is tiny.
    terms = (docs.select("doc_id", "dl",
                         F.explode(_tokens(F.col("text"))).alias("term"))
             .where(F.col("term").isin(*BM25_QUERY))
             .localCheckpoint(eager=False))
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl"))
    df_ = (terms.select("doc_id", "term").distinct()
           .groupBy("term").agg(F.count("*").cast("double").alias("df")))
    part = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            (F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                   / (F.col("df") + 0.5))
             * (F.col("tf") * (BM25_K1 + 1.0))
             / (F.col("tf") + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))))
            .alias("s"))
    )
    per_term = [
        F.coalesce(F.max(F.when(F.col("term") == t, F.col("s"))),
                   F.lit(0.0))
        for t in BM25_QUERY]
    total = per_term[0]
    for p in per_term[1:]:
        total = total + p
    scored = part.groupBy("doc_id").agg(F.round(total, 4).alias("bm25"))
    # limit FIRST (TakeOrderedAndProject: per-partition heap + driver
    # 20-row merge), THEN rank the bounded frame — the previous
    # rank-then-filter form ranked every matching doc through one
    # partition (r13 WindowExec audit; InferWindowGroupLimit did not
    # fire on the empty-partition spec).  (bm25, doc_id) is a total
    # order, so limit-then-rank is value-identical.
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()) \
                .limit(20)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.withColumn("rnk", F.row_number().over(w))


RRF_K = 60           # the standard reciprocal-rank-fusion constant
RRF_SCALE = 10 ** 12  # exact-ordering key scale (see _rank_fusion)


def _rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): reciprocal rank fusion of two retrievers — the
    standard way a RAG / training-data search stack merges rankings
    whose scores live on incomparable scales (Cormack et al.'s RRF:
    score(d) = Σ_lists 1/(K + rank)).  List A is the BM25 top-20;
    list B is a query-term DENSITY top-20 (Σ tf_q / dl — the
    length-normalized lexical signal BM25's saturation deliberately
    dampens), so the two disagree exactly where fusion matters.

    Engine-invariance: RRF values are tiny rationals whose 4-dp
    rounding collapses distinct ranks into ties, so the FUSED ORDER
    is computed on an exact integer key instead — for ranks present
    in both lists rrf = (2K+ra+rb)/((K+ra)(K+rb)), else 1/(K+r); the
    key floor(num·10^12/den) separates ANY two distinct rationals at
    these denominators ((K+r) ≤ 80 ⇒ gaps ≥ 1/6400² ≈ 2.4e-8 ≫
    1e-12), making the integer order THE rational order.  The 4-dp
    display value rounds half-up in integer space (round4_ratio).
    Ranks are nullable BIGINTs on both engines.

    Scale: both input rankings are top-20 sort-limits
    (TakeOrderedAndProject over pre-reduced per-doc scores — never a
    global sort); the fusion itself is a 20∪20-row outer join and
    window, driver-trivial regardless of corpus size."""
    bm = _text_bm25(spark, sf_dir).select(
        "doc_id", F.col("rnk").cast("long").alias("rank_bm25"))
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("toks"))
    density = (docs
               .select("doc_id", F.size("toks").alias("dl"),
                       F.size(F.filter(
                           "toks",
                           lambda t: t.isin(*BM25_QUERY))).alias("tfq"))
               .where(F.col("tfq") > 0)
               .select("doc_id",
                       round4_ratio(F.col("tfq"), F.col("dl"))
                       .alias("density")))
    wd = Window.orderBy(F.col("density").desc(), F.col("doc_id").asc())
    dn = (density.withColumn("rnk", F.row_number().over(wd))
          .where(F.col("rnk") <= 20)
          .select("doc_id", F.col("rnk").cast("long").alias("rank_density")))
    fused = bm.join(dn, "doc_id", "full_outer")
    ka = F.lit(RRF_K) + F.col("rank_bm25")
    kb = F.lit(RRF_K) + F.col("rank_density")
    num = (F.when(ka.isNotNull() & kb.isNotNull(), ka + kb)
           .otherwise(F.lit(1)))
    den = F.coalesce(ka, F.lit(1)) * F.coalesce(kb, F.lit(1))
    key = F.expr(f"(num * {RRF_SCALE}) div den")
    wf = Window.orderBy(F.col("key").desc(), F.col("doc_id").asc())
    return (fused
            .withColumn("num", num).withColumn("den", den)
            .withColumn("key", key)
            .withColumn("fused_rnk",
                        F.row_number().over(wf).cast("long"))
            .select("doc_id", "rank_bm25", "rank_density",
                    F.col("key").alias("rrf_key"),
                    round4_ratio(F.col("num"), F.col("den")).alias("rrf"),
                    "fused_rnk")
            .orderBy("fused_rnk"))


def _collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): adjacent-repeat token collapse — runs of the
    same token squeeze to one occurrence ('the the the' → 'the'), the
    C4-style stutter cleaner that text_repetition SCORES but nothing
    yet REWRITES; this op emits the transform's audit row plus a
    sha256 of the cleaned token stream so the driver hash-verifies
    the rewritten TEXT itself, not just counts.

    Cross-engine mechanics: keep token i iff it differs from its
    predecessor.  The Spark side zips the token array against its
    own 1-shifted copy (NULL prepended) and keeps tokens whose
    predecessor is NULL or different — per-element work is O(1) by
    construction.  The r7 form was an indexed HOF filter whose
    lambda called element_at(ws, i) on the UNPROJECTED split
    expression: Catalyst evaluates an outer expression referenced
    inside a lambda PER ELEMENT, so every comparison re-split the
    whole document — O(L²), found by the r9 book-length-document
    sweep (a 30k-token doc took minutes; output pruning hid it from
    count()-based checks).  zip_with's inputs are row-level child
    expressions evaluated once per row, immune to that inlining
    regardless of optimizer choices.  DuckDB keeps the 1-based
    list_filter + ws[i-1] form (list indexing there is O(1) on a
    materialized list).  Counts are exact BIGINTs; repeat_ratio is
    an int/int round4_ratio (empty doc → 0 tokens → NULL via the
    b > 0 guard); the cleaned stream hashes through the shared
    WS_CHARS tokenizer, so both engines hash identical bytes —
    output is bit-identical to the r7 form (driver row unchanged).

    Scale: pure narrow map (HOFs + one sha256 per doc) — zero
    shuffle except the output ordering; the profiler pin asserts
    no data-sized exchange exists."""
    docs = load(spark, sf_dir, "documents")
    ws = _tokens(F.col("text"))
    # prev[i] = ws[i-1], prev[0] = NULL: shift by prepending NULL and
    # truncating to size(ws) (slice length 0 on an empty doc → [])
    prev = F.slice(
        F.concat(F.array(F.lit(None).cast("string")), ws),
        1, F.size(ws))
    keep = F.filter(
        F.zip_with(ws, prev,
                   lambda x, p: F.when(p.isNull() | (x != p), x)),
        lambda x: x.isNotNull())
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        (F.size(ws) - F.size(keep)).alias("n_collapsed"),
        round4_ratio(F.size(ws) - F.size(keep), F.size(ws))
        .alias("repeat_ratio"),
        F.sha2(F.concat_ws(" ", keep), 256).alias("cleaned_sha"),
    ).orderBy("doc_id")


def _mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): mutual information between the lang and source
    columns — the corpus-composition association audit (is language
    driven by the crawl source?  NMI → 1 means one predicts the
    other, → 0 means independent) that decides whether a mixing
    weight on source silently reweights languages.  Completes the
    association family: chi_square tests INDEPENDENCE, collocation_pmi
    scores per-pair lift, this one gives the global information-
    theoretic measures (MI, H(lang), H(source), NMI).

    Exactness: MI and both entropies are SUMS of transcendental
    terms, which floats make order-dependent — so each term runs
    through the lm_score idiom: ln of ONE IEEE division whose
    operands are exact wide-integer products cast to double
    (bit-identical both engines), quantized to integer micro-units
    (|ln|·1e6 ≤ ~4e7, inside the quantizer domain), weighted by the
    exact cell count, summed in DECIMAL(38,0).  The reported values
    divide by the shared scale n·1e6 via round4_ratio_dec; NMI is the
    exact integer ratio mi_q / min(h_q) — the scale cancels — and a
    degenerate corpus (single lang or single source → min H = 0)
    yields NULL through the b > 0 guard, never /0.

    Scale: three partial-agg'd counts over the corpus (cell/lang/
    source keys — AQE absorbs skew), the term computation on the
    ALREADY-reduced cell table (model-sized), three 1-row reductions
    crossJoined at the end.  r14 OPT (guide §1.2 step 1 — this
    docstring's own "documented variant"): the cell table and every
    marginal now come from ONE cube() pass (grouping-sets partial
    agg, a single corpus scan + one bounded shuffle) instead of four
    independent scan+agg derivations; grouping_id() separates the
    four grains, so data NULLs in lang/source stay distinct from
    grouping NULLs and every count is the exact integer the four
    separate aggregations produced."""
    docs = load(spark, sf_dir, "documents").select("lang", "source")
    cube = (docs.cube("lang", "source")
            .agg(F.count("*").alias("c"), F.grouping_id().alias("gid"))
            .localCheckpoint(eager=False))
    # gid bit per column, 1 = grouped away: 0 ⇒ (lang, source) cell,
    # 1 ⇒ lang marginal, 2 ⇒ source marginal, 3 ⇒ grand total
    cells = cube.where(F.col("gid") == 0).select(
        "lang", "source", F.col("c").alias("nxy"))
    nl = cube.where(F.col("gid") == 1).select(
        "lang", F.col("c").alias("nx"))
    ns = cube.where(F.col("gid") == 2).select(
        "source", F.col("c").alias("ny"))
    # agg + coalesce, not a bare select: cube() over an EMPTY corpus
    # emits zero rows (no grand-total row), while the old docs.agg
    # count produced one 0 — the empty-input sweep pins that shape
    tot = cube.where(F.col("gid") == 3).agg(
        F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias("n"))
    dec = "decimal(19,0)"
    num = (F.col("nxy").cast(dec) * F.col("n").cast(dec)).cast("double")
    den = (F.col("nx").cast(dec) * F.col("ny").cast(dec)).cast("double")
    li = F.floor(F.log(num / den) * 1e6 + 0.5).cast("long")
    mi = (cells.join(nl, "lang").join(ns, "source")
          .crossJoin(F.broadcast(tot))
          .agg(F.sum((F.col("nxy") * li).cast("decimal(38,0)"))
               .alias("mi_q"),
               F.count("*").alias("n_cells")))

    def h_q(counts: DataFrame, c: str):
        t = F.floor(-F.log(F.col(c) / F.col("n")) * 1e6 + 0.5) \
            .cast("long")
        return (counts.crossJoin(F.broadcast(tot))
                .agg(F.sum((F.col(c) * t).cast("decimal(38,0)"))
                     .alias(f"h_{c}"), F.count("*").alias(f"k_{c}")))

    scale = (F.col("n") * 1000000).cast("decimal(38,0)")
    return (tot.crossJoin(F.broadcast(mi))
            .crossJoin(F.broadcast(h_q(nl, "nx")))
            .crossJoin(F.broadcast(h_q(ns, "ny")))
            .select(
                F.col("n").alias("n_docs"), "n_cells",
                F.col("k_nx").alias("n_langs"),
                F.col("k_ny").alias("n_sources"),
                round4_ratio_dec(F.col("mi_q"), scale).alias("mi"),
                round4_ratio_dec(F.col("h_nx"), scale).alias("h_lang"),
                round4_ratio_dec(F.col("h_ny"), scale).alias("h_source"),
                round4_ratio_dec(
                    F.col("mi_q"),
                    F.least("h_nx", "h_ny")).alias("nmi")))


#: Fixed public logistic-regression weights for the quality
#: classifier — heuristic magnitudes in the C4/Gopher feature space
#: (more stopwords/alpha → keep; heavy punctuation → drop).  Embedded
#: as identical literals in both engines via _QUALITY_LOGIT_Z.
QUALITY_LOGIT_W = {
    "intercept": -4.4,
    "avg_word_len": 0.2,
    "stopword_ratio": 2.0,
    "punct_ratio": -4.0,
    "alpha_ratio": 2.5,
    "log_tokens": 0.35,
}
_QUALITY_LOGIT_Z = (
    f"{QUALITY_LOGIT_W['intercept']!r}"
    f" + {QUALITY_LOGIT_W['avg_word_len']!r} * avg_word_len"
    f" + {QUALITY_LOGIT_W['stopword_ratio']!r} * stopword_ratio"
    f" + {QUALITY_LOGIT_W['punct_ratio']!r} * punct_ratio"
    f" + {QUALITY_LOGIT_W['alpha_ratio']!r} * alpha_ratio"
    f" + {QUALITY_LOGIT_W['log_tokens']!r} * ln(1.0 + n_tokens)")


def _quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: model inference as a query — score every document with a
    FIXED-weight logistic quality classifier (the fastText/C4-style
    learned filter, reduced to its serving form: a dot product and a
    sigmoid over engineered features).  The point for a 100 TB
    pipeline: a trained linear filter's inference is a map-side
    expression, not a UDF and not a model server — whole-stage codegen
    applies it at scan speed, and the keep/drop decision composes with
    any downstream operator.

    Features are the `text_quality` signals ROUNDED to 4dp first, so
    both engines feed bit-identical doubles into the linear term; the
    z expression is one generated string shared verbatim with the
    oracle (the window_ewma discipline), and p = 1/(1+e^-z) rounds to
    4dp so a 1-ulp exp() divergence cannot flip the emitted value.
    The keep decision thresholds the ROUNDED p for the same reason."""
    docs = load(spark, sf_dir, "documents")
    cols = _quality_feature_cols()
    feats = docs.select(
        "doc_id", *[cols[c].alias(c) for c in
                    ("n_tokens", "avg_word_len", "stopword_ratio",
                     "punct_ratio", "alpha_ratio")])
    return feats.selectExpr(
        "doc_id",
        f"round(1.0 / (1.0 + exp(-({_QUALITY_LOGIT_Z}))), 4) AS p_keep",
        f"round(1.0 / (1.0 + exp(-({_QUALITY_LOGIT_Z}))), 4) >= 0.5"
        " AS keep",
    )


NB_TOPK = 5  # per-class report rows from the trained NB model


def _naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): multinomial naive-Bayes training as a query —
    the GENERATIVE counterpart to `logit_step`'s discriminative
    gradient (both complete the curation loop's train stage, from
    opposite modeling families): class priors and Laplace-smoothed
    token log-likelihoods ln((c_{t,cls}+1)/(T_cls+V)) for a
    language-ID / domain classifier, with the model reported as each
    class's NB_TOPK most frequent tokens (ties: count desc, token
    asc — deterministic) plus the class-level statistics.

    Exactness: counts/totals/V are exact integers; the prior is an
    int ratio → round4_ratio (engine round() on exact decimal halves
    is the r5 divergence class); the log-likelihood is ONE ln of an
    exact int ratio rounded at 6dp — a transcendental of a rational
    can't land on a rounding half (the lm_score tolerance precedent).
    Classes whose corpus has zero tokens carry no likelihood rows on
    either engine (inner-join semantics, mirrored).

    100 TB shape: tokenize-once + ONE partial-agg'd groupBy(class,
    token) shuffle is the whole training pass (the shuffle carries
    per-partition class-vocab counts, not the token stream); the
    top-K runs inside the per-class window with WindowGroupLimit
    pushing the heap map-side; class totals, doc counts, corpus size
    and vocab size are 1-row/`classes`-row broadcast aggregates.
    Model state is O(classes × vocab) — persisted, it IS the
    classifier (serving = the quality_logit map-side-expression
    shape)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("tok"))
    # r14 OPT (guide §1.2): the class-vocab table feeds the class
    # totals, the vocab count AND the top-K window — unmaterialized,
    # the corpus tokenize+reduce ran three times.  Lazy checkpoint:
    # model-sized (classes × vocab), no up-front barrier.
    cls_tok = (tok.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
               .localCheckpoint(eager=False))
    cls = cls_tok.groupBy("lang").agg(
        F.sum("cnt").alias("total_tokens"))
    cls_docs = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs_class"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    vocab = cls_tok.select("tok").distinct().agg(
        F.count("*").alias("v"))
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("tok").asc())
    top = (cls_tok.withColumn("rnk", F.row_number().over(w))
           .where(F.col("rnk") <= NB_TOPK))
    return (top.join(cls, "lang").join(cls_docs, "lang")
            .crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(vocab))
            .select(
                "lang", "n_docs_class",
                round4_ratio(F.col("n_docs_class"),
                             F.col("n_docs")).alias("prior"),
                "total_tokens", "rnk", "tok",
                F.col("cnt").alias("tok_cnt"),
                F.round(F.log((F.col("cnt") + 1)
                              / (F.col("total_tokens") + F.col("v"))),
                        6).alias("loglik"))
            .orderBy("lang", "rnk"))


# logit_step (r8 debut): one full-batch gradient-descent step of the
# quality classifier, trained as a LANGUAGE DISCRIMINATOR (y = 1 iff
# lang = 'en' — the DSIR/importance-weighting shape: a linear model
# telling in-domain from out-of-domain text).  Every per-row quantity
# is quantized to exact integers BEFORE any sum, so both engines
# accumulate bit-identical DECIMAL/HUGEINT totals in any order:
#   pe   = floor(sigmoid(z)·1e4 + 0.5)        µ-probability (0..10000)
#   xe_j = floor(x_j·1e4 + 0.5)               µ-feature units
#   G_j  = Σ (pe − y·1e4)·xe_j                gradient in 1e8-units
#   nll  = Σ floor(−ln(sel/1e4)·1e6 + 0.5)    log-loss µ-units
#          (sel = pe clamped to [1, 9999], the lm_score ln idiom)
# and the reported grad / updated weight divide exact integer ratios
# (round4_ratio_dec): grad_j = G_j/(n·1e8), w'_j = w_j − η·grad_j =
# (wq_j·n·1e7 − G_j)/(n·1e9) with η = 1/LOGIT_LR_INV and wq_j =
# w_j·100 exact (all serving weights have ≤ 2dp).  The per-row exprs
# are single strings shared verbatim with the oracle (the window_ewma
# discipline).
LOGIT_LR_INV = 10  # learning rate 1/10
_LOGIT_Y = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"
_LOGIT_PE = ("CAST(floor((1.0 / (1.0 + exp(-("
             + _QUALITY_LOGIT_Z + ")))) * 1e4 + 0.5) AS BIGINT)")
_LOGIT_XE = {
    "intercept": "CAST(10000 AS BIGINT)",
    "avg_word_len": "CAST(floor(avg_word_len * 1e4 + 0.5) AS BIGINT)",
    "stopword_ratio":
        "CAST(floor(stopword_ratio * 1e4 + 0.5) AS BIGINT)",
    "punct_ratio": "CAST(floor(punct_ratio * 1e4 + 0.5) AS BIGINT)",
    "alpha_ratio": "CAST(floor(alpha_ratio * 1e4 + 0.5) AS BIGINT)",
    "log_tokens": ("CAST(floor(round(ln(1.0 + n_tokens), 4) * 1e4"
                   " + 0.5) AS BIGINT)"),
}
_LOGIT_W100 = {k: (round(v * 100), v) for k, v in
               QUALITY_LOGIT_W.items()}


def quality_feats_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc (lang, quality-signal features) — the shared first
    stage of the supervised family: `logit_step` trains on it,
    `roc_auc` / `calibration_bins` (operators/analytics.py) evaluate
    the same µ-sigmoid score on it.  One Spark-side copy mirroring the
    one DUCK_QFEATS_CTES oracle string."""
    docs = load(spark, sf_dir, "documents")
    cols = _quality_feature_cols()
    return docs.select(
        "lang", *[cols[c].alias(c) for c in
                  ("n_tokens", "avg_word_len", "stopword_ratio",
                   "punct_ratio", "alpha_ratio")])


def _logit_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): one supervised training step as a query — the
    piece that completes the curation loop (score → sample → TRAIN →
    rescore): full-batch logistic-regression gradient descent on the
    quality-signal features, labeled by the language column.  Emits
    per feature: the current weight, the exact mean gradient, the
    post-step weight, plus the corpus size and mean log-loss — the
    numbers a training driver reads to decide whether to iterate
    (the kmeans_step/pca_power_iter idiom applied to supervised
    learning; iterating = re-running with the emitted weights as the
    new model).

    Exactness: see the module-level _LOGIT_* contract above — per-row
    sigmoid/feature/log-loss terms quantize to integers before any
    aggregation, sums accumulate in DECIMAL(38,0)/HUGEINT, and the
    reported grad / w_new / mean_nll are exact integer ratios rounded
    half-up in decimal space.  The one transcendental per row (exp in
    the sigmoid; ln in the loss) evaluates on bit-identical double
    inputs on both engines and is floor-quantized with the lm_score
    tolerance precedent.

    100 TB shape: ONE scan computes every per-row term map-side; the
    only exchange is the partial-aggregated 1-row (count + 8 integer
    sums) reduction — gradient state is MODEL-sized (6 features), not
    data-sized, the same argument as kmeans_step's K×5 state.  The
    6-row report explodes from that single row with stack();
    broadcast/driver cost is nil."""
    feats = quality_feats_frame(spark, sf_dir)
    rowterms = feats.selectExpr(
        f"{_LOGIT_Y} AS y",
        f"{_LOGIT_PE} AS lp",
        *[f"{e} AS xe_{k}" for k, e in _LOGIT_XE.items()],
    ).selectExpr(
        "y", "lp",
        "least(greatest(lp, CAST(1 AS BIGINT)), CAST(9999 AS BIGINT))"
        " AS lpc",
        *[f"xe_{k}" for k in _LOGIT_XE],
    ).selectExpr(
        "CAST(floor(-ln((CASE WHEN y = 1 THEN lpc"
        " ELSE 10000 - lpc END) / 10000.0) * 1e6 + 0.5) AS BIGINT)"
        " AS nll_u",
        "lp - y * 10000 AS re",
        *[f"xe_{k}" for k in _LOGIT_XE],
    )
    one = rowterms.agg(
        F.count("*").alias("n"),
        F.sum("nll_u").cast("decimal(38,0)").alias("snll"),
        *[F.sum((F.col("re") * F.col(f"xe_{k}"))
                .cast("decimal(38,0)")).alias(f"g_{k}")
          for k in _LOGIT_XE])
    stack = "stack({}, {}) as (feature, wq, g)".format(
        len(_LOGIT_XE),
        ", ".join(f"'{k}', CAST({_LOGIT_W100[k][0]} AS BIGINT), g_{k}"
                  for k in _LOGIT_XE))
    n8 = (F.col("n") * F.lit(100_000_000)).cast("decimal(38,0)")
    n9 = (F.col("n").cast("decimal(38,0)") * 1_000_000_000)
    wn_num = (F.col("wq").cast("decimal(38,0)")
              * F.col("n") * 10_000_000 - F.col("g"))
    return (one.selectExpr("n", "snll", stack)
            .select(
                "feature",
                (F.col("wq") / 100.0).alias("w_old"),
                round4_ratio_dec(F.col("g"), n8).alias("grad"),
                round4_ratio_dec(wn_num, n9).alias("w_new"),
                F.col("n").alias("n_docs"),
                round4_ratio_dec(
                    F.col("snll"),
                    (F.col("n") * F.lit(1_000_000)).cast("decimal(38,0)"))
                .alias("mean_nll"))
            .orderBy("feature"))


FH_BUCKETS = 64  # feature-hash dimensionality


def _feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: feature hashing (the hashing trick / HashingTF) expressed
    relationally — map each token to one of FH_BUCKETS buckets by a
    public hash and count per (doc, bucket), producing the sparse
    bag-of-words vectors a downstream linear model (see
    `quality_logit`) consumes.  No vocabulary pass, no dictionary to
    broadcast, collision-tolerant by design — which is exactly why the
    trick scales: the featurization is a stateless map over the token
    stream, and the only shuffle carries (doc, bucket) partial counts
    bounded by docs × FH_BUCKETS regardless of vocabulary size.

    The bucket hash is sha256-derived (the engine-invariant idiom
    shared with split_assign/sample_hash/dedup_bloom) rather than
    murmur3: Spark's mllib HashingTF uses murmur3, which DuckDB lacks
    — sha keeps the full cross-engine oracle.  Emitted sparse (row,
    col, count) triples ARE the matrix; a Spark ML consumer would
    assemble them per-doc with array ops."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    tok = F.explode(_tokens(F.col("text"))).alias("tok")
    bucket = F.pmod(
        F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 8), 16, 10)
         .cast("long"),
        F.lit(FH_BUCKETS))
    return (docs.select("doc_id", tok)
            .select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("cnt")))


MIX_TEMP_ALPHA = 0.7  # temperature exponent for mixture reweighting


def _mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: temperature-scaled mixture weights — the multilingual/
    multi-domain sampling scheme (weight ∝ n^alpha, alpha<1) that
    up-samples small sources and tempers head domains, companion to
    the budget-driven `mix_sources` plan.  Emits per source: token
    inventory, natural share, temperature weight, and the effective
    up/down-sampling factor the weight implies.  Same 100 TB shape as
    mix_sources: one partial-aggregated groupBy(source) scan + a
    broadcast 1-row totals join; the transcendental pow() runs over
    the source-cardinality table only, and the final rounding absorbs
    any cross-engine 1-ulp pow/sum drift."""
    docs = load(spark, sf_dir, "documents")
    per_src = (
        docs.select("source",
                    F.size(_tokens(F.col("text"))).alias("n_tokens"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("avail_tokens"))
        .withColumn("w_raw", F.pow("avail_tokens", MIX_TEMP_ALPHA))
    )
    totals = per_src.agg(F.sum("avail_tokens").alias("tok_total"),
                         F.sum("w_raw").alias("w_sum"))
    # r13 empty-keys sweep + review follow-up: every division here
    # needs a positive-denominator guard.  A source whose every doc
    # is tokenless has avail_tokens = 0 (resample undefined), and a
    # WHOLE corpus of such sources has tok_total = 0 and w_sum = 0.0
    # — Spark's ANSI division raises where DuckDB's /0 yields NULL,
    # so all three columns go NULL on both engines in that case.
    share = F.when(F.col("tok_total") > 0,
                   F.col("avail_tokens") / F.col("tok_total"))
    weight = F.when(F.col("w_sum") > 0,
                    F.col("w_raw") / F.col("w_sum"))
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select("source", "n_docs", "avail_tokens",
                F.round(share, 6).alias("nat_share"),
                F.round(weight, 6).alias("temp_weight"),
                F.when(F.col("avail_tokens") > 0,
                       F.round(weight / share, 4))
                 .alias("resample_factor"))
        .orderBy("source")
    )


INDEX_MIN_DF = 10   # index only terms appearing in >= this many docs
INDEX_BLOCK = 64    # posting-list block size (doc ids per stored row)


def _inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: inverted-index construction — per term, the sorted posting
    list of documents containing it, sharded into fixed-size blocks
    (the Lucene segment/block layout): output rows are (term,
    block_id, df, tf_block, postings[<=64]).

    The block sharding is the 100 TB point: a naive
    collect_list-per-term materializes a stopword's ENTIRE posting
    list in one aggregation buffer (easily gigabytes per executor on
    a web corpus); blocking caps every stored row at INDEX_BLOCK ids,
    so memory per aggregation state is bounded by design, skew
    included.  Plan shape: explode → (term, doc) partial-agg tf →
    one row_number window partitioned by term (the single sort
    shuffle, carrying (term, doc_id, tf) triples only — never text) →
    groupBy (term, block).  df via a window count over the same
    partitioning, reusing the exchange."""
    docs = load(spark, sf_dir, "documents")
    tf = (docs.select("doc_id",
                      F.explode(_tokens(F.col("text"))).alias("term"))
          .groupBy("term", "doc_id").agg(F.count("*").alias("tf")))
    # both windows share ONE (partition, order) spec — the df count
    # uses an explicit full frame over the ordered partition — so they
    # collapse into a single Sort + WindowExec instead of two sorts
    wo = Window.partitionBy("term").orderBy("doc_id")
    posted = (tf.withColumn(
                  "df",
                  F.count("*").over(wo.rowsBetween(
                      Window.unboundedPreceding,
                      Window.unboundedFollowing)))
              .withColumn(
                  "block_id",
                  F.floor((F.row_number().over(wo) - 1) / INDEX_BLOCK)
                  .cast("int"))
              .where(F.col("df") >= INDEX_MIN_DF))
    # postings serialized to a space-joined string: the driver
    # canonicalizes via pandas and cannot hash ARRAY cells
    return (posted.groupBy("term", "block_id")
            .agg(F.max("df").alias("df"),
                 F.sum("tf").alias("tf_block"),
                 F.array_join(F.sort_array(F.collect_list("doc_id")), " ")
                  .alias("postings"))
            .orderBy("term", "block_id"))


ENTROPY_DOC_LIMIT = 200  # bounded per-doc output slice


def _text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: character-level Shannon entropy per document — the cheap
    compression-ratio proxy the quality-filter stack uses to catch
    boilerplate, base64 blobs and keyboard-mash (low entropy = repeated
    structure, ~4.7 bits = uniform random ASCII); complements the
    token-level repetition signals in text_repetition.

    Entirely map-side HOFs — per doc: char split, distinct chars, then
    an aggregate() over the distinct set counting occurrences against
    the full char array (O(distinct x len) per row, no explode, no
    shuffle; at 100 TB this is pure scan+project).  The order-
    sensitive float sum is integer-hardened the lm_score way: each
    char's contribution cnt*log2(n/cnt) is rounded to MICRO-BITS and
    summed as BIGINT — partition/merge order cannot flip a bit, and
    the single float division at the end is exact-rational in, so the
    DuckDB oracle (different algorithm: unnest + two-level GROUP BY)
    lands the identical hash."""
    docs = (load(spark, sf_dir, "documents")
            .where((F.col("doc_id") < ENTROPY_DOC_LIMIT)
                   & (F.length("text") > 0)))
    chars = F.split(F.col("text"), "")
    d = docs.select(
        "doc_id", chars.alias("cs"),
        F.size(chars).alias("n"),
        F.array_distinct(chars).alias("dist"))
    # one char-array scan per distinct char: materialize the counts
    # array first, then aggregate over the INTS — common-subexpression
    # elimination does not reach inside HOF lambdas, so computing
    # size(filter(...)) twice per term doubled the dominant cost
    # (code-review r5)
    d = d.withColumn(
        "cnts", F.transform(
            "dist", lambda c: F.size(F.filter("cs", lambda x: x == c))))
    term = lambda cnt: F.round(  # noqa: E731 — micro-bit integer term
        F.lit(1e6) * cnt * F.log2(F.col("n") / cnt), 0).cast("long")
    # entropy rounded in exact integer space (functions/exact.py):
    # ubits/(n*1e6) is a ratio of integers that can land exactly on a
    # 5th-decimal half, where engine round() semantics diverge
    return (d.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        F.size("dist").alias("n_distinct_chars"),
        round4_ratio(
            F.aggregate("cnts", F.lit(0).cast("long"),
                        lambda acc, cnt: acc + term(cnt)),
            F.col("n").cast("long") * F.lit(1_000_000))
        .alias("entropy_bits"))
        .orderBy("doc_id"))


QUERIES = {
    "text_entropy": _text_entropy,
    "mix_temperature": _mix_temperature,
    "inverted_index": _inverted_index,
    "feature_hash": _feature_hash,
    "quality_logit": _quality_logit,
    "logit_step": _logit_step,
    "text_bm25": _text_bm25,
    "rank_fusion": _rank_fusion,
    "mutual_info": _mutual_info,
    "collapse_repeats": _collapse_repeats,
    "lm_score_bigram": _lm_score_bigram,
    "lm_interp": _lm_interp,
    "length_percentiles": _length_percentiles,
    "collocation_pmi": _collocation_pmi,
    "lang_confusion": _lang_confusion,
    "gopher_rules": _gopher_rules,
    "filter_funnel": _filter_funnel,
    "importance_sample": _importance_sample,
    "cms_topk": _cms_topk,
    "text_repetition": _text_repetition,
    "bpe_pair_stats": _bpe_pair_stats,
    "bpe_encode": _bpe_encode,
    "split_assign": _split_assign,
    "mix_sources": _mix_sources,
    "lm_score": _lm_score,
    "vocab_topk": _vocab_topk,
    "token_fertility": _token_fertility,
    "naive_bayes_train": _naive_bayes_train,
    "heavy_hitters": _heavy_hitters,
    "doc_chunk": _doc_chunk,
    "seq_pack": _seq_pack,
    "corpus_curate": _corpus_curate,
    "token_count": _token_count,
    "text_tfidf": _text_tfidf,
    "text_quality": _text_quality,
    "lang_id": _lang_id,
    "doc_fingerprint": _doc_fingerprint,
    "winnow_fingerprint": _winnow_fingerprint,
    "winnow_join": _winnow_join,
    "winnow_coverage": _winnow_coverage,
    "source_perplexity": _source_perplexity,
    "zipf_fit": _zipf_fit,
    "heaps_law": _heaps_law,
    "js_divergence": _js_divergence,
    "text_stats": _text_stats,
}

_DUCK_TOKS = ("list_filter(string_split_regex(lower(text), "
              f"'[{WS_CHARS}]+'), t -> t != '')")

#: RAW whitespace split (empty tokens kept) — mirrors the Spark-side
#: bare F.split(lower, WS_RUN) used by the gram pipelines
_DUCK_TOKS_RAW = f"string_split_regex(lower(text), '[{WS_CHARS}]+')"

#: The DuckDB mirror of `_source_token_counts` (ends defining CTE
#: `stc(source, tok, cnt)`) — shared by the zipf_fit and
#: js_divergence oracles.
_DUCK_SRC_TOK_CTES = f"""stt AS (
  SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents
), stc AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM stt GROUP BY source, tok
)"""

#: The DuckDB mirror of `_lm_scored_tokens` (ends defining CTE
#: `lm_scored(doc_id, source, nll_u)`) — shared by the lm_score and
#: source_perplexity oracles; ONE copy of the micro-nat quantization.
_DUCK_LM_SCORED_CTES = f"""lm_toks AS (
  SELECT doc_id, source, unnest({_DUCK_TOKS}) AS tok FROM documents
), lm_counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM lm_toks GROUP BY tok
), lm_total AS (
  SELECT CAST(sum(freq) AS BIGINT) AS total FROM lm_counts
), lm_scored AS (
  SELECT t.doc_id, t.source,
         CAST(floor(-ln(c.freq / lm_total.total) * 1e6 + 0.5)
              AS BIGINT) AS nll_u
  FROM lm_toks t JOIN lm_counts c ON t.tok = c.tok, lm_total
)"""

#: The DuckDB mirror of `_winnow_rows` up to the per-row window
#: minima (ends defining CTE `w` with doc_id/pos/n_grams/wmin) —
#: shared by the winnow_fingerprint and winnow_join oracles.
#: range(1, n) is end-EXCLUSIVE: i = 1..len(ws)-2 for 3-grams;
#: zipped unnests pair each gram with its 0-based position.
_DUCK_WINNOW_CTES = f"""wtoks AS (
  SELECT doc_id, {_DUCK_TOKS_RAW} AS ws FROM documents
), wg AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(ws) - 1, 1))) - 1 AS pos,
         unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           AS gram
  FROM wtoks
), wh AS (
  SELECT doc_id, pos,
         CAST(concat('0x', substr(sha256(gram), 1, 8)) AS BIGINT)
           * {_WINNOW_POS_M} + pos AS c
  FROM wg
), w AS (
  SELECT doc_id, pos, c,
         count(*) OVER (PARTITION BY doc_id) AS n_grams,
         min(c) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {WINNOW_W - 1} FOLLOWING) AS wmin
  FROM wh
)"""

#: BM25 oracle per-query-term conditional-aggregation pivot (same
#: explicit left-to-right sum as the Spark side)
_BM25_SUM = " + ".join(
    f"coalesce(max(CASE WHEN term = '{t}' THEN s END), 0.0)"
    for t in BM25_QUERY)

#: The BM25 derivation as a shared CTE chain (ends defining
#: `bm_ranked`): the text_bm25 oracle reads its top-20 off it, and the
#: rank_fusion oracle fuses it with the density ranking — ONE SQL
#: implementation, no hand-kept copy to drift.
_DUCK_BM25_CTES = f"""docs AS (
  SELECT doc_id, len({_DUCK_TOKS}) AS dl, text FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM docs
), terms AS (
  SELECT doc_id, dl, unnest({_DUCK_TOKS}) AS term FROM docs
), qterms AS (
  SELECT * FROM terms WHERE term IN {BM25_QUERY!r}
), tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM qterms GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df
  FROM (SELECT DISTINCT doc_id, term FROM qterms) GROUP BY term
), part AS (
  SELECT doc_id, term,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {BM25_K1 + 1.0!r})
           / (tf + {BM25_K1!r} * ({1.0 - BM25_B!r}
                                  + {BM25_B!r} * dl / avgdl)) AS s
  FROM tf JOIN df USING (term), stats
), scored AS (
  SELECT doc_id, round({_BM25_SUM}, 4) AS bm25
  FROM part GROUP BY doc_id
), bm_ranked AS (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
  FROM scored
)"""

ORACLES = {
    # cross-paradigm: Spark stays map-side with array HOFs; the oracle
    # explodes chars and double-GROUP-BYs.  Micro-bit integer terms
    # make the entropy sum order-free in both engines.
    "text_entropy": f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id < {ENTROPY_DOC_LIMIT} AND length(text) > 0
), ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM d
), cnts AS (
  SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
), tot AS (
  SELECT doc_id, sum(cnt) AS n FROM cnts GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(t.n AS BIGINT) AS n_chars,
       CAST(count(*) AS INTEGER) AS n_distinct_chars,
       {round4_ratio_sql(
           "CAST(sum(CAST(round(1e6 * cnt * log2(t.n / cnt))"
           " AS BIGINT)) AS BIGINT)",
           "CAST(t.n AS BIGINT) * 1000000")} AS entropy_bits
FROM cnts c JOIN tot t USING (doc_id)
GROUP BY c.doc_id, t.n
""",
    "mix_temperature": f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS avail_tokens
  FROM documents GROUP BY source
), w AS (
  SELECT *, pow(avail_tokens, {MIX_TEMP_ALPHA}) AS w_raw FROM per_src
), totals AS (
  SELECT CAST(sum(avail_tokens) AS BIGINT) AS tok_total,
         sum(w_raw) AS w_sum
  FROM w
)
SELECT source, n_docs, avail_tokens,
       round(avail_tokens / CAST(tok_total AS DOUBLE), 6) AS nat_share,
       round(w_raw / w_sum, 6) AS temp_weight,
       CASE WHEN avail_tokens = 0 THEN NULL ELSE
         round((w_raw / w_sum)
               / (avail_tokens / CAST(tok_total AS DOUBLE)), 4) END
         AS resample_factor
FROM w, totals
""",
    "inverted_index": f"""
WITH tf AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
  GROUP BY term, doc_id
), posted AS (
  SELECT term, doc_id, tf,
         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
         CAST(floor((row_number() OVER (PARTITION BY term
                                        ORDER BY doc_id) - 1)
                    / {INDEX_BLOCK}) AS INTEGER) AS block_id
  FROM tf
  QUALIFY df >= {INDEX_MIN_DF}
)
SELECT term, block_id, max(df) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_block,
       array_to_string(list(doc_id ORDER BY doc_id), ' ') AS postings
FROM posted GROUP BY term, block_id
""",
    "feature_hash": f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(concat('0x', substr(sha256(tok), 1, 8)) AS BIGINT)
         % {FH_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM toks GROUP BY doc_id, bucket
""",
    "quality_logit": f"""
WITH t AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks, length(text) AS nc
  FROM documents
), feats AS (
  SELECT doc_id, len(toks) AS n_tokens,
         round(nc / greatest(len(toks), 1), 4) AS avg_word_len,
         round(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], x)))
           / greatest(len(toks), 1), 4) AS stopword_ratio,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
           / greatest(nc, 1), 4) AS punct_ratio,
         round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
           / greatest(nc, 1), 4) AS alpha_ratio
  FROM t
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({_QUALITY_LOGIT_Z}))), 4) AS p_keep,
       round(1.0 / (1.0 + exp(-({_QUALITY_LOGIT_Z}))), 4) >= 0.5 AS keep
FROM feats
""",
    "text_bm25": None,  # assigned below from _DUCK_BM25_CTES (shared
                        # with the rank_fusion oracle)
    "heavy_hitters": f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
), n AS (
  SELECT count(*) AS n_total FROM toks
)
SELECT tok, CAST(count(*) AS BIGINT) AS freq,
       round(count(*) / any_value(n_total), 6) AS share
FROM toks, n
GROUP BY tok
HAVING count(*) > 0.01 * any_value(n_total)
ORDER BY freq DESC, tok ASC
""",
    "lm_score_bigram": f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS ws FROM documents
), bg AS (
  SELECT doc_id,
         unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM d WHERE len(ws) >= 2
), cbg AS (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
), cw1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), scored AS (
  SELECT b.doc_id,
         CAST(floor(-ln(cbg.c2 / cw1.c1) * 1e6 + 0.5) AS BIGINT)
           AS nll_u
  FROM bg b
  JOIN cbg ON cbg.w1 = b.w1 AND cbg.w2 = b.w2
  JOIN cw1 ON cw1.w1 = b.w1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {round4_ratio_sql("CAST(sum(nll_u) AS BIGINT)",
                         "count(*) * 1000000")} AS avg_nll2,
       round(exp(sum(nll_u) / (count(*) * 1e6)), 2) AS ppl2
FROM scored
GROUP BY doc_id
""",
    # lm_interp (r12): Jelinek-Mercer mixture as ONE exact rational in
    # HUGEINT (Spark DECIMAL(38,0)) before the shared micro-nat ln
    # quantization; exact BIGINT per-doc sums, round4 integer-space
    # rounding, ppl transcendental (plain round)
    "lm_interp": f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS ws FROM documents
), bg AS (
  SELECT doc_id,
         unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM d WHERE len(ws) >= 2
), cbg AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
), cw1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
), ut AS (
  SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
), uc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM ut GROUP BY tok
), tot AS (
  SELECT CAST(sum(freq) AS BIGINT) AS total FROM uc
), scored AS (
  SELECT b.doc_id,
         CAST(floor(-ln(
           CAST(CAST(cbg.c2 * {JM_LAMBDA_NUM} AS HUGEINT) * tot.total
                + CAST(uc.freq * {JM_LAMBDA_DEN - JM_LAMBDA_NUM}
                       AS HUGEINT) * cw1.c1 AS DOUBLE)
           / CAST(CAST(cw1.c1 * {JM_LAMBDA_DEN} AS HUGEINT) * tot.total
                  AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS nll_u
  FROM bg b
  JOIN cbg ON cbg.w1 = b.w1 AND cbg.w2 = b.w2
  JOIN cw1 ON cw1.w1 = b.w1
  JOIN uc ON uc.tok = b.w2, tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {round4_ratio_sql("CAST(sum(nll_u) AS BIGINT)",
                         "count(*) * 1000000")} AS avg_nll_jm,
       round(exp(sum(nll_u) / (count(*) * 1e6)), 2) AS ppl_jm
FROM scored
GROUP BY doc_id
""",
    # length_percentiles (r12): the seasonal_envelope discipline on an
    # already-integer measure — discrete order statistics at integer
    # ceil ranks, NULL lengths excluded up front, exact wide-int mean
    "length_percentiles": f"""
WITH lp AS (
  SELECT source, doc_id, n_chars
  FROM documents WHERE n_chars IS NOT NULL
), ranked AS (
  SELECT source, n_chars,
         row_number() OVER w AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM lp
  WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       max(CASE WHEN rn = (n * 10 + 99) // 100 THEN n_chars END)
         AS p10_chars,
       max(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END)
         AS p50_chars,
       max(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END)
         AS p90_chars,
       {round4_ratio_dec_sql("CAST(sum(n_chars) AS HUGEINT)",
                             "CAST(count(*) AS HUGEINT)")}
         AS mean_chars
FROM ranked GROUP BY source
ORDER BY source
""",
    # counts exact BIGINT; c12*N and c1*c2 « 2^53 so the division is
    # IEEE-identical; ln is the 1-ulp transcendental class (plain
    # round, same as lm_score's ppl)
    "collocation_pmi": f"""
WITH d AS (
  SELECT {_DUCK_TOKS} AS ws FROM documents
), bg AS (
  SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM d WHERE len(ws) >= 2
), cbg AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
  HAVING count(*) >= {PMI_MIN_COUNT}
), cw1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), cw2 AS (
  SELECT w2, count(*) AS c2 FROM bg GROUP BY w2
), n AS (SELECT count(*) AS n_bigrams FROM bg)
SELECT cbg.w1, cbg.w2, CAST(c12 AS BIGINT) AS c12,
       -- HUGEINT products (mirrors Spark's DECIMAL(38,0)): exact wide
       -- ints -> identical nearest-double conversion on both engines
       round(ln(CAST(CAST(c12 AS HUGEINT) * n_bigrams AS DOUBLE)
                / CAST(CAST(c1 AS HUGEINT) * c2 AS DOUBLE)), 4) AS pmi
FROM cbg JOIN cw1 USING (w1) JOIN cw2 USING (w2), n
""",
    # every rule in integer space by cross-multiplication — mirrors
    # the Spark side exactly; pass_share via the exact-int rounding
    "gopher_rules": f"""
WITH t AS (
  SELECT source, {_DUCK_TOKS} AS toks,
         length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS sum_len
  FROM documents
), r AS (
  SELECT source,
    CASE WHEN len(toks) < {GOPHER_MIN_WORDS}
           OR len(toks) > {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END
      AS f_nwords,
    CASE WHEN sum_len < {GOPHER_MIN_WLEN} * len(toks)
           OR sum_len > {GOPHER_MAX_WLEN} * len(toks) THEN 1 ELSE 0 END
      AS f_wlen,
    CASE WHEN len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           * {GOPHER_ALPHA_DEN} < {GOPHER_ALPHA_NUM} * len(toks)
         THEN 1 ELSE 0 END AS f_alpha,
    CASE WHEN len(list_filter(toks,
           x -> list_contains({STOPWORDS!r}, x))) < {GOPHER_MIN_STOP}
         THEN 1 ELSE 0 END AS f_stop
  FROM t
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(f_nwords) AS BIGINT) AS n_fail_nwords,
       CAST(sum(f_wlen) AS BIGINT) AS n_fail_wlen,
       CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha,
       CAST(sum(f_stop) AS BIGINT) AS n_fail_stop,
       CAST(sum(CASE WHEN f_nwords + f_wlen + f_alpha + f_stop = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       {round4_ratio_sql(
           "CAST(sum(CASE WHEN f_nwords + f_wlen + f_alpha + f_stop = 0"
           " THEN 1 ELSE 0 END) AS BIGINT)",
           "count(*)")} AS pass_share
FROM r
GROUP BY source
""",
    # filter_funnel (r11): the same integer-space Gopher predicates,
    # digest-window dedup among stage-2 survivors, the shared lm_scored
    # CTE chain rolled to doc grain with integer cross-multiplied band
    # bounds, one 5-counter aggregate, 4 stage rows
    "filter_funnel": f"""
WITH {_DUCK_LM_SCORED_CTES}, flm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lm,
         CAST(sum(nll_u) AS BIGINT) AS sum_nll_u
  FROM lm_scored GROUP BY doc_id
), ft AS (
  SELECT doc_id, lang, sha256(text) AS digest, {_DUCK_TOKS} AS toks,
         length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g'))
           AS sum_len
  FROM documents
), ff AS (
  -- pass = text present AND no rule FIRES, counted fail-side exactly
  -- like the gopher_rules oracle: a NULL text NULLs every predicate,
  -- so a fail-side CASE yields 0 fails on BOTH engines — the explicit
  -- digest IS NOT NULL conjunct (r11 advice, mirrored on the Spark
  -- side) is what makes a NULL-text doc fail AT stage 1 instead of
  -- sailing through to lm_band
  SELECT doc_id, lang, digest,
    CASE WHEN digest IS NOT NULL
         AND (CASE WHEN len(toks) < {GOPHER_MIN_WORDS}
                      OR len(toks) > {GOPHER_MAX_WORDS}
                    THEN 1 ELSE 0 END)
             + (CASE WHEN sum_len < {GOPHER_MIN_WLEN} * len(toks)
                       OR sum_len > {GOPHER_MAX_WLEN} * len(toks)
                     THEN 1 ELSE 0 END)
             + (CASE WHEN len(list_filter(toks,
                        x -> regexp_matches(x, '[a-z]')))
                        * {GOPHER_ALPHA_DEN}
                      < {GOPHER_ALPHA_NUM} * len(toks)
                     THEN 1 ELSE 0 END)
             + (CASE WHEN len(list_filter(toks,
                        x -> list_contains({STOPWORDS!r}, x)))
                      < {GOPHER_MIN_STOP}
                     THEN 1 ELSE 0 END) = 0
         THEN 1 ELSE 0 END AS pass_g
  FROM ft
), fp AS (
  SELECT f.doc_id, f.digest, f.pass_g,
         CASE WHEN f.pass_g = 1 AND f.lang = 'en' THEN 1 ELSE 0 END
           AS pass_l,
         l.n_lm, l.sum_nll_u
  FROM ff f LEFT JOIN flm l USING (doc_id)
), fd AS (
  SELECT *,
    CASE WHEN pass_l = 1 AND doc_id =
           min(CASE WHEN pass_l = 1 THEN doc_id END)
             OVER (PARTITION BY digest)
         THEN 1 ELSE 0 END AS pass_d
  FROM fp
), fm AS (
  SELECT *,
    CASE WHEN pass_d = 1 AND sum_nll_u IS NOT NULL
          AND sum_nll_u >= n_lm * {LM_BAND_MIN_U}
          AND sum_nll_u <= n_lm * {LM_BAND_MAX_U}
         THEN 1 ELSE 0 END AS pass_m
  FROM fd
), fagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(coalesce(sum(pass_g), 0) AS BIGINT) AS n1,
         CAST(coalesce(sum(pass_l), 0) AS BIGINT) AS n2,
         CAST(coalesce(sum(pass_d), 0) AS BIGINT) AS n3,
         CAST(coalesce(sum(pass_m), 0) AS BIGINT) AS n4
  FROM fm
), stages AS (
  SELECT 1 AS stage_idx, 'gopher_rules' AS stage,
         n0 AS n_in, n1 AS n_out, n0 AS n_total FROM fagg
  UNION ALL SELECT 2, 'lang_en',     n1, n2, n0 FROM fagg
  UNION ALL SELECT 3, 'exact_dedup', n2, n3, n0 FROM fagg
  UNION ALL SELECT 4, 'lm_band',     n3, n4, n0 FROM fagg
)
SELECT stage_idx, stage, n_in, n_out,
       {round4_ratio_sql('n_out', 'n_in')} AS kept_share,
       {round4_ratio_sql('n_out', 'n_total')} AS cum_share
FROM stages ORDER BY stage_idx
""",
    # identical public-hash sketch on both engines -> FULL value
    # oracle over a sketch (no accuracy contract needed); top-K cut is
    # deterministic (freq desc, token asc)
    "cms_topk": f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
), sketch AS (
  SELECT j, CAST(concat('0x', substr(sha256(CAST(j AS VARCHAR) || ':' || tok), 1, 8))
                 AS BIGINT) % {CMS_W} AS bucket,
         count(*) AS cnt
  FROM toks, range(0, {CMS_D}) r(j)
  GROUP BY 1, 2
), top AS (
  SELECT tok, count(*) AS freq FROM toks GROUP BY tok
  ORDER BY freq DESC, tok ASC LIMIT {CMS_TOPK}
), probes AS (
  SELECT tok, freq, j,
         CAST(concat('0x', substr(sha256(CAST(j AS VARCHAR) || ':' || tok), 1, 8))
              AS BIGINT) % {CMS_W} AS bucket
  FROM top, range(0, {CMS_D}) r(j)
)
SELECT p.tok, CAST(p.freq AS BIGINT) AS freq,
       CAST(min(s.cnt) AS BIGINT) AS cms_est,
       min(s.cnt) >= p.freq AS never_under
FROM probes p JOIN sketch s USING (j, bucket)
GROUP BY p.tok, p.freq
""",
    # pure-integer acceptance threshold (score*B // max_score) against
    # the public sha256 bucket — no float until the final exact ratio
    "importance_sample": f"""
WITH s AS (
  SELECT lang,
         CAST(len(list_filter({_DUCK_TOKS},
              x -> list_contains({STOPWORDS!r}, x))) + 1 AS BIGINT)
           AS score,
         CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {IMP_BUCKETS} AS bucket
  FROM documents
), mx AS (SELECT max(score) AS max_score FROM s),
k AS (
  SELECT lang, score,
         CASE WHEN bucket < (score * {IMP_BUCKETS}) // max_score
              THEN 1 ELSE 0 END AS is_kept
  FROM s, mx
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_kept) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN is_kept = 1 THEN score ELSE 0 END) AS BIGINT)
         AS kept_score_sum,
       {round4_ratio_sql("CAST(sum(is_kept) AS BIGINT)", "count(*)")}
         AS kept_share
FROM k
GROUP BY lang
""",
    # share_of_true = n/rowtotal is a ratio of integers -> exact-int
    # rounding; the predictor is lang_id's argmax verbatim
    "lang_confusion": f"""
WITH t AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
    coalesce(len(list_filter(toks,
      x -> list_contains(['the','and','of'], x))), 0) AS s_en,
    coalesce(len(list_filter(toks,
      x -> list_contains(['el','la','de'], x))), 0) AS s_es,
    coalesce(len(list_filter(toks,
      x -> list_contains(['der','die','und'], x))), 0) AS s_de,
    coalesce(len(list_filter(toks,
      x -> list_contains(['le','la','et'], x))), 0) AS s_fr,
    coalesce(len(list_filter(toks,
      x -> list_contains(['的','是','在'], x))), 0) AS s_zh
  FROM t
), p AS (
  SELECT lang AS true_lang,
         CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
           WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
           WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang
  FROM s
), cells AS (
  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY true_lang, pred_lang
)
SELECT true_lang, pred_lang, n_docs,
       {round4_ratio_sql(
           "n_docs",
           "CAST(sum(n_docs) OVER (PARTITION BY true_lang) AS BIGINT)")}
         AS share_of_true
FROM cells
""",
    "text_repetition": f"""
WITH d AS (
  SELECT doc_id, {_DUCK_TOKS} AS ws FROM documents WHERE doc_id % 10 = 5
), toks AS (
  SELECT doc_id, unnest(ws) AS tok FROM d
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), tok_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(max(c) AS BIGINT) AS mx_tok
  FROM tc GROUP BY doc_id
), bgs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM d WHERE len(ws) >= 2
), bc AS (
  SELECT doc_id, bg, count(*) AS c FROM bgs GROUP BY doc_id, bg
), bg_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
         CAST(max(c) AS BIGINT) AS mx_bg
  FROM bc GROUP BY doc_id
)
SELECT t.doc_id,
       round(t.mx_tok / t.n_tok, 4) AS top_token_frac,
       round(b.mx_bg / b.n_bg, 4) AS top_bigram_frac
FROM tok_stats t LEFT JOIN bg_stats b USING (doc_id)
""",
    "bpe_pair_stats": f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(tok)),
                               i -> substr(tok, i, 2))) AS pair
  FROM toks WHERE length(tok) >= 2
)
SELECT pair, CAST(count(*) AS BIGINT) AS freq
FROM pairs GROUP BY pair
ORDER BY freq DESC, pair ASC
LIMIT 15
""",
    "split_assign": """
SELECT source,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT source, n_chars,
         CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS b
  FROM documents)
GROUP BY 1, 2
""",
    "mix_sources": f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS avail_tokens,
         CAST(coalesce(TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                                AS INTEGER), 0) % 4
              + 1 AS BIGINT) AS weight
  FROM documents GROUP BY source
), totals AS (
  SELECT CAST(sum(avail_tokens) AS BIGINT) AS corpus_tokens,
         CAST(sum(weight) AS BIGINT) AS w_sum
  FROM per_src
)
SELECT source, n_docs, avail_tokens, weight,
       CAST(floor(corpus_tokens * {MIX_BUDGET_FRAC} * weight / w_sum
                  + 0.5) AS BIGINT) AS target_tokens,
       CASE WHEN avail_tokens IS NULL OR avail_tokens = 0 THEN NULL
         ELSE round(least(1.0,
           floor(corpus_tokens * {MIX_BUDGET_FRAC} * weight / w_sum + 0.5)
           / avail_tokens), 4) END AS sample_frac,
       floor(corpus_tokens * {MIX_BUDGET_FRAC} * weight / w_sum + 0.5)
         > avail_tokens AS oversubscribed
FROM per_src, totals
""",
    "lm_score": f"""
WITH {_DUCK_LM_SCORED_CTES}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       {round4_ratio_sql("CAST(sum(nll_u) AS BIGINT)",
                         "count(*) * 1000000")}
         AS avg_nll,
       round(exp(CAST(sum(nll_u) AS BIGINT) / (count(*) * 1e6)), 2)
         AS ppl
FROM lm_scored GROUP BY doc_id
""",
    "vocab_topk": f"""
WITH tok AS (
  SELECT unnest({_DUCK_TOKS}) AS tok FROM documents
), counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY tok
), total AS (
  SELECT CAST(sum(freq) AS BIGINT) AS total FROM counts
), top AS (
  SELECT tok, freq FROM counts
  ORDER BY freq DESC, tok ASC LIMIT {VOCAB_K}
)
SELECT CAST(row_number() OVER wo AS INTEGER) AS rnk, tok, freq,
       round(freq / total, 6) AS share,
       round(CAST(sum(freq) OVER (ORDER BY freq DESC, tok ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) / total, 6) AS cum_share
FROM top, total
WINDOW wo AS (ORDER BY freq DESC, tok ASC)
""",
    "token_fertility": f"""
WITH tok AS (
  SELECT lang, unnest({_DUCK_TOKS}) AS tok FROM documents
), counts AS (
  SELECT tok, count(*) AS freq FROM tok GROUP BY tok
), vocab AS (
  SELECT tok, 1 AS in_vocab FROM counts
  ORDER BY freq DESC, tok ASC LIMIT {FERT_VOCAB_K}
), per AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS words,
         CAST(sum(CASE WHEN v.in_vocab IS NOT NULL THEN 1
                  ELSE (length(t.tok) + {FERT_OOV_CHARS - 1})
                       // {FERT_OOV_CHARS} END) AS BIGINT) AS pieces,
         CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS oov_words
  FROM tok t LEFT JOIN vocab v USING (tok)
  GROUP BY lang
)
SELECT lang, words, pieces, oov_words,
       {round4_ratio_sql("pieces", "words")} AS fertility,
       {round4_ratio_sql("oov_words", "words")} AS oov_rate
FROM per ORDER BY lang
""",
    "doc_chunk": f"""
WITH base AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks,
         CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), exploded AS (
  SELECT doc_id, toks, n_tokens,
         unnest(list_transform(
           range(greatest(CAST(ceil(n_tokens / {CHUNK_STRIDE}.0)
                          AS INTEGER), 1)),
           i -> CAST(i AS INTEGER))) AS chunk_id
  FROM base
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS INTEGER) AS chunk_start,
       CAST(least({CHUNK_TOKENS}, n_tokens - chunk_id * {CHUNK_STRIDE})
            AS INTEGER) AS chunk_len,
       array_to_string(list_slice(
         toks, chunk_id * {CHUNK_STRIDE} + 1,
         chunk_id * {CHUNK_STRIDE}
           + least({CHUNK_TOKENS},
                   n_tokens - chunk_id * {CHUNK_STRIDE})), ' ')
         AS chunk_text
FROM exploded
WHERE chunk_id * {CHUNK_STRIDE} < n_tokens
""",
    "seq_pack": f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens
  FROM documents
), c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       CAST(floor((cum - n_tokens) / {PACK_TOKENS}.0) AS INTEGER)
         AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c
GROUP BY source, pack_id
""",
    "corpus_curate": f"""
WITH scored AS (
  SELECT doc_id, source, lang, text,
         len({_DUCK_TOKS}) AS n_tokens,
         CAST(len(text) AS DOUBLE)
           / greatest(len({_DUCK_TOKS}), 1) AS avg_word_len
  FROM documents
), kept AS (
  SELECT * FROM scored
  WHERE lang = 'en' AND n_tokens >= 20
    AND avg_word_len >= 3 AND avg_word_len <= 10
), survivors AS (
  SELECT sha256(text) AS digest,
         min(doc_id) AS doc_id,
         arg_min(source, doc_id) AS source,
         arg_min(n_tokens, doc_id) AS n_tokens
  FROM kept GROUP BY sha256(text)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 2) AS avg_tokens
FROM survivors GROUP BY source ORDER BY source
""",
    "text_tfidf": f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 100
), terms AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM docs
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term
                                    FROM terms) GROUP BY term
), scored AS (
  SELECT doc_id, tf.term AS term,
         round(tf * ln((SELECT count(*) FROM docs)::DOUBLE / df), 6)
           AS tfidf
  FROM tf JOIN df ON tf.term = df.term
)
SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY tfidf DESC, term ASC) AS rnk FROM scored)
WHERE rnk <= 3
""",
    "token_count": f"""
SELECT doc_id,
       CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct({_DUCK_TOKS})) AS INTEGER)
         AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\x0B\f\ra-zA-Z0-9]+'))
         AS INTEGER) AS bpe_pieces,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
""",
    "text_quality": f"""
WITH t AS (
  SELECT doc_id, lang, text, {_DUCK_TOKS} AS toks,
         length(text) AS nc
  FROM documents
)
SELECT doc_id, lang,
       round(nc / greatest(len(toks), 1), 4) AS avg_word_len,
       round(len(list_filter(toks, x -> list_contains(
           ['the','a','of','and','to','in','is','it'], x)))
         / greatest(len(toks), 1), 4) AS stopword_ratio,
       round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
         / greatest(nc, 1), 4) AS punct_ratio,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
         / greatest(nc, 1), 4) AS alpha_ratio
FROM t
""",
    # lang_id: marker sets are engine-shared but argmax struct-sort is
    # Spark-specific; still SQL-expressible:
    "lang_id": f"""
WITH t AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
    coalesce(len(list_filter(toks,
      x -> list_contains(['the','and','of'], x))), 0) AS s_en,
    coalesce(len(list_filter(toks,
      x -> list_contains(['el','la','de'], x))), 0) AS s_es,
    coalesce(len(list_filter(toks,
      x -> list_contains(['der','die','und'], x))), 0) AS s_de,
    coalesce(len(list_filter(toks,
      x -> list_contains(['le','la','et'], x))), 0) AS s_fr,
    coalesce(len(list_filter(toks,
      x -> list_contains(['的','是','在'], x))), 0) AS s_zh
  FROM t
)
SELECT doc_id, lang AS true_lang,
       CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
         WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
         WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
       (CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
         WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
         WHEN s_fr THEN 'fr' ELSE 'zh' END) = lang AS correct
FROM s
""",
    # the CASE guard mirrors Spark's NULL-in-NULL-out HOF fold: on a
    # NULL text, list_prepend(0, NULL) manufactures [0] and the fold
    # emitted 0 where Spark's aggregate(NULL, ...) emits NULL (r11
    # all-NULL sweep divergence); empty text stays 0 on both engines
    "doc_fingerprint": f"""
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_DUCK_TOKS},
             t -> CAST(concat('0x', substr(sha256(t), 1, 8)) AS BIGINT)
                  % 1000000007)),
         (acc, h) -> (acc * 31 + h) % 1000000007) END AS rolling_hash,
       sha256(trim(lower(text), ' ')) AS content_sha
FROM documents
""",
    # → rows-only for the hash; content_sha IS checkable but the one
    # query returns both, so it stays rows-only.
    # winnow_fingerprint (r8): the identical winnowing pipeline —
    # positional gram stream via zipped unnests, sha-prefix hash
    # packed with the position (c = h·2^21 + pos, leftmost-min
    # tie-break), frame-min windows, start-row filter, distinct;
    # the selection chain is the shared _DUCK_WINNOW_CTES
    "winnow_fingerprint": f"""
WITH {_DUCK_WINNOW_CTES}
SELECT DISTINCT doc_id,
       CAST(wmin // {_WINNOW_POS_M} AS BIGINT) AS fp,
       CAST(wmin % {_WINNOW_POS_M} AS INTEGER) AS pos
FROM w
WHERE w.pos <= greatest(n_grams - {WINNOW_W}, 0)
ORDER BY doc_id, pos
""",
    # winnow_join (r8): the same selection chain, positions dropped,
    # hot fingerprints pruned by df on BOTH engines, pair-counted
    "winnow_join": f"""
WITH {_DUCK_WINNOW_CTES}, fsel AS (
  SELECT DISTINCT doc_id,
         CAST(wmin // {_WINNOW_POS_M} AS BIGINT) AS fp
  FROM w WHERE w.pos <= greatest(n_grams - {WINNOW_W}, 0)
), fhot AS (
  SELECT fp FROM (SELECT fp, count(*) AS df FROM fsel GROUP BY fp)
  WHERE df > greatest({WJ_DF_FLOOR},
                      {WJ_DF_FRAC} * (SELECT count(*) FROM documents))
), ff AS (
  SELECT f.doc_id, f.fp FROM fsel f
  WHERE NOT EXISTS (SELECT 1 FROM fhot h WHERE h.fp = f.fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {WJ_MIN_SHARED}
ORDER BY doc_a, doc_b
""",
    # winnow_coverage (r10): the same selection chain as
    # winnow_fingerprint, gap-audited with one lag pass; every count
    # and gap is an exact BIGINT, density is round4_ratio
    "winnow_coverage": f"""
WITH {_DUCK_WINNOW_CTES}, sel AS (
  SELECT DISTINCT doc_id,
         CAST(wmin % {_WINNOW_POS_M} AS BIGINT) AS pos
  FROM w WHERE w.pos <= greatest(n_grams - {WINNOW_W}, 0)
), ng AS (
  SELECT doc_id, CAST(max(n_grams) AS BIGINT) AS n_grams
  FROM w GROUP BY doc_id
), gaps AS (
  SELECT doc_id, pos,
         pos - coalesce(lag(pos) OVER (PARTITION BY doc_id
                                       ORDER BY pos), -1) AS gap
  FROM sel
), cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
         CAST(max(gap) AS BIGINT) AS max_gap
  FROM gaps GROUP BY doc_id
)
SELECT c.doc_id, n.n_grams, c.n_fps,
       {round4_ratio_sql(
           "c.n_fps",
           f"greatest(n.n_grams - {WINNOW_W - 1}, 1)")} AS density,
       c.max_gap,
       (c.max_gap <= {WINNOW_W}) AS guarantee_holds
FROM cov c JOIN ng n ON c.doc_id = n.doc_id
ORDER BY c.doc_id
""",
    # source_perplexity (r10): lm_score's micro-nat model (the shared
    # lm_scored CTE chain), reduced by source; exact BIGINT sums, one
    # exp at the end
    "source_perplexity": f"""
WITH {_DUCK_LM_SCORED_CTES}
SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {round4_ratio_sql("CAST(sum(nll_u) AS BIGINT)",
                         "count(*) * 1000000")}
         AS avg_nll,
       round(exp(CAST(sum(nll_u) AS BIGINT) / (count(*) * 1e6)), 2)
         AS ppl
FROM lm_scored GROUP BY source
ORDER BY source
""",
    # zipf_fit (r8): identical rank/µ-nat quantization and exact OLS
    # closed forms over HUGEINT sums
    "zipf_fit": f"""
WITH {_DUCK_SRC_TOK_CTES}, ztop AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source
                            ORDER BY cnt DESC, tok ASC) AS rnk
  FROM stc
), zq AS (
  SELECT source,
         CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1e4 + 0.5) AS HUGEINT)
           AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e4 + 0.5) AS HUGEINT)
           AS y
  FROM ztop WHERE rnk <= {ZIPF_TOPK}
), zs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM zq GROUP BY source
)
SELECT source, n,
       {_loglog_ols_tail_sql('n')}
FROM zs ORDER BY source
""",
    # heaps_law (r11): doc-grain first-occurrence derivation, the
    # identical rank-even sampling predicate in integer `//`, and the
    # SAME shared OLS tail as zipf_fit (ONE copy of the closed forms)
    "heaps_law": f"""
WITH htoks AS (
  SELECT source, doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
), hfirst AS (
  SELECT source, min(doc_id) AS doc_id
  FROM htoks GROUP BY source, tok
), hnew AS (
  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_new
  FROM hfirst GROUP BY source, doc_id
), hdoc AS (
  SELECT source, doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_toks
  FROM documents
), hcurve AS (
  SELECT d.source,
         CAST(row_number() OVER w AS BIGINT) AS rnk,
         sum(d.n_toks) OVER w AS cum_toks,
         sum(coalesce(n.n_new, 0)) OVER w AS cum_vocab,
         count(*) OVER (PARTITION BY d.source) AS n_docs
  FROM hdoc d LEFT JOIN hnew n USING (source, doc_id)
  WINDOW w AS (PARTITION BY d.source ORDER BY d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), hpts AS (
  SELECT source,
         CAST(floor(ln(CAST(cum_toks AS DOUBLE)) * 1e4 + 0.5)
              AS HUGEINT) AS x,
         CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * 1e4 + 0.5)
              AS HUGEINT) AS y
  FROM hcurve
  WHERE cum_toks >= 1
    AND (rnk * {HEAPS_POINTS}) // n_docs
        > ((rnk - 1) * {HEAPS_POINTS}) // n_docs
), hs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_points,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM hpts GROUP BY source
), hfit AS (
  SELECT source, n_points,
         {_loglog_ols_tail_sql('n_points')}
  FROM hs
)
SELECT source, n_points, slope AS beta, intercept AS lnk, r2
FROM hfit ORDER BY source
""",
    # js_divergence (r8): exact-integer ratio arguments into ONE
    # shared ln shape, count-weighted µ-nat sums in HUGEINT, the
    # disjoint-token mass folded in closed form via LN2_U
    "js_divergence": f"""
WITH {_DUCK_SRC_TOK_CTES}, jtot AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS total
  FROM stc GROUP BY source
), jsh AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(a.cnt AS HUGEINT) * tb.total AS aB,
         CAST(b.cnt AS HUGEINT) * ta.total AS bA,
         a.cnt AS ca, b.cnt AS cb
  FROM stc a
  JOIN stc b ON a.tok = b.tok AND a.source < b.source
  JOIN jtot ta ON ta.source = a.source
  JOIN jtot tb ON tb.source = b.source
), jcell AS (
  SELECT src_a, src_b,
         CAST(sum(CAST(ca AS HUGEINT)
           * CAST(floor(ln(CAST(2 * aB AS DOUBLE)
                            / CAST(aB + bA AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT)) AS HUGEINT) AS sp_sh,
         CAST(sum(CAST(cb AS HUGEINT)
           * CAST(floor(ln(CAST(2 * bA AS DOUBLE)
                            / CAST(aB + bA AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT)) AS HUGEINT) AS sq_sh,
         CAST(sum(ca) AS BIGINT) AS sha,
         CAST(sum(cb) AS BIGINT) AS shb
  FROM jsh GROUP BY src_a, src_b
), jfull AS (
  SELECT c.*, ta.total AS ta, tb.total AS tb,
         c.sp_sh + CAST(ta.total - c.sha AS HUGEINT) * {LN2_U} AS sp,
         c.sq_sh + CAST(tb.total - c.shb AS HUGEINT) * {LN2_U} AS sq
  FROM jcell c
  JOIN jtot ta ON ta.source = c.src_a
  JOIN jtot tb ON tb.source = c.src_b
)
SELECT src_a, src_b, ta AS tokens_a, tb AS tokens_b,
       {round4_ratio_dec_sql('sp', 'CAST(ta AS HUGEINT) * 1000000')}
         AS kl_p_m,
       {round4_ratio_dec_sql('sq', 'CAST(tb AS HUGEINT) * 1000000')}
         AS kl_q_m,
       {round4_ratio_dec_sql(
           'sp * tb + sq * ta',
           'CAST(ta AS HUGEINT) * tb * 2000000')} AS jsd
FROM jfull ORDER BY src_a, src_b
""",
    "text_stats": f"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS total_tokens,
       round(avg(length(text)), 2) AS avg_chars
FROM documents
GROUP BY lang, source
""",
}

ORACLES["text_bm25"] = f"""
WITH {_DUCK_BM25_CTES}
SELECT doc_id, bm25, CAST(rnk AS INTEGER) AS rnk
FROM bm_ranked WHERE rnk <= 20
"""

# identical fusion recurrence off the shared BM25 CTE chain: density
# ranking via round4_ratio, exact integer RRF key, nullable BIGINT ranks
_QLIST = " + ".join(
    f"len(list_filter(toks, t -> t = '{t}'))" for t in BM25_QUERY)
ORACLES["rank_fusion"] = f"""
WITH {_DUCK_BM25_CTES}, bm AS (
  SELECT doc_id, CAST(rnk AS BIGINT) AS rank_bm25
  FROM bm_ranked WHERE rnk <= 20
), dtoks AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), dens AS (
  SELECT doc_id, len(toks) AS dl, {_QLIST} AS tfq
  FROM dtoks
), dscored AS (
  SELECT doc_id, {round4_ratio_sql("tfq", "dl")} AS density
  FROM dens WHERE tfq > 0
), dn AS (
  SELECT doc_id, CAST(rnk AS BIGINT) AS rank_density
  FROM (SELECT doc_id, row_number() OVER
          (ORDER BY density DESC, doc_id ASC) AS rnk FROM dscored)
  WHERE rnk <= 20
), fused AS (
  SELECT coalesce(bm.doc_id, dn.doc_id) AS doc_id,
         rank_bm25, rank_density,
         CASE WHEN rank_bm25 IS NOT NULL AND rank_density IS NOT NULL
              THEN ({RRF_K} + rank_bm25) + ({RRF_K} + rank_density)
              ELSE 1 END AS num,
         coalesce({RRF_K} + rank_bm25, 1)
           * coalesce({RRF_K} + rank_density, 1) AS den
  FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id
)
SELECT doc_id, rank_bm25, rank_density,
       (num * {RRF_SCALE}) // den AS rrf_key,
       {round4_ratio_sql("num", "den")} AS rrf,
       CAST(row_number() OVER
         (ORDER BY (num * {RRF_SCALE}) // den DESC, doc_id ASC)
         AS BIGINT) AS fused_rnk
FROM fused ORDER BY fused_rnk
"""

# identical information-theoretic recurrence: wide-int products -> one
# IEEE division -> ln quantized to micro-units -> count-weighted exact
# HUGEINT sums; reported values share the n*1e6 scale, NMI's cancels
ORACLES["mutual_info"] = f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS nxy
  FROM documents GROUP BY lang, source
), nl AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS nx FROM documents GROUP BY lang
), ns AS (
  SELECT source, CAST(count(*) AS BIGINT) AS ny
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), mi AS (
  SELECT sum(CAST(nxy AS HUGEINT) * CAST(floor(ln(
           CAST(CAST(nxy AS HUGEINT) * n AS DOUBLE)
           / CAST(CAST(nx AS HUGEINT) * ny AS DOUBLE)) * 1e6 + 0.5)
           AS BIGINT)) AS mi_q,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cells JOIN nl USING (lang) JOIN ns USING (source), tot
), hl AS (
  SELECT sum(CAST(nx AS HUGEINT)
             * CAST(floor(-ln(nx / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                    AS BIGINT)) AS h_nx,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM nl, tot
), hs AS (
  SELECT sum(CAST(ny AS HUGEINT)
             * CAST(floor(-ln(ny / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                    AS BIGINT)) AS h_ny,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM ns, tot
)
SELECT n AS n_docs, n_cells, n_langs, n_sources,
       {round4_ratio_dec_sql("mi_q", "CAST(n AS HUGEINT) * 1000000")}
         AS mi,
       {round4_ratio_dec_sql("h_nx", "CAST(n AS HUGEINT) * 1000000")}
         AS h_lang,
       {round4_ratio_dec_sql("h_ny", "CAST(n AS HUGEINT) * 1000000")}
         AS h_source,
       {round4_ratio_dec_sql("mi_q", "least(h_nx, h_ny)")} AS nmi
FROM tot, mi, hl, hs
"""

# identical keep-first-of-run recurrence: 1-based indexed list_filter
# (the NULL predecessor at i=1 absorbed by OR), shared tokenizer,
# sha256 of the space-rejoined cleaned stream.  COALESCE on the
# rejoin: DuckDB's array_to_string([]) is NULL while Spark's
# concat_ws of an empty array is '' — a 0-token (empty/whitespace)
# doc must hash sha256('') on both engines (r7 differential find;
# the fixtures have no empty docs, the adversarial corpora do)
ORACLES["collapse_repeats"] = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS ws FROM documents
), k AS (
  SELECT doc_id, ws,
         list_filter(ws, (x, i) -> i = 1 OR x != ws[i - 1]) AS keep
  FROM t
)
SELECT doc_id,
       CAST(len(ws) AS INTEGER) AS n_tokens,
       CAST(len(ws) - len(keep) AS INTEGER) AS n_collapsed,
       {round4_ratio_sql("len(ws) - len(keep)", "len(ws)")}
         AS repeat_ratio,
       sha256(COALESCE(array_to_string(keep, ' '), '')) AS cleaned_sha
FROM k ORDER BY doc_id
"""


# logit_step oracle (r8): identical integer micro-unit recurrence —
# per-row sigmoid/feature/log-loss quantization shared VERBATIM with
# the Spark side via the _LOGIT_* expression strings; gradient and
# weight-update sums in HUGEINT; per-feature UNION branches generated
# from the same QUALITY_LOGIT_W constants so the sides cannot drift
_LOGIT_XE_SQL = ",\n         ".join(
    f"{e} AS xe_{k}" for k, e in _LOGIT_XE.items())
_LOGIT_G_SQL = ",\n         ".join(
    f"CAST(sum(CAST(re * xe_{k} AS HUGEINT)) AS HUGEINT) AS g_{k}"
    for k in _LOGIT_XE)
_LOGIT_BRANCHES = "\nUNION ALL\n".join(
    f"""SELECT '{k}' AS feature, {_LOGIT_W100[k][1]!r} AS w_old,
       {round4_ratio_dec_sql(f'g_{k}', 'n * 100000000')} AS grad,
       {round4_ratio_dec_sql(
           f'CAST({_LOGIT_W100[k][0]} AS HUGEINT) * n * 10000000'
           f' - g_{k}', 'n * 1000000000')} AS w_new,
       n AS n_docs,
       {round4_ratio_dec_sql('snll', 'n * 1000000')} AS mean_nll
FROM g"""
    for k in _LOGIT_XE)
# Shared quality-feature CTE chain for the supervised family —
# logit_step (training), roc_auc and calibration_bins (evaluation,
# operators/analytics.py) all start from these per-doc features, one
# string so the three oracles cannot drift from each other or from
# the Spark-side _quality_feature_cols contract
DUCK_QFEATS_CTES = f"""t AS (
  SELECT doc_id, text, lang, {_DUCK_TOKS} AS toks, length(text) AS nc
  FROM documents
), feats AS (
  SELECT lang, len(toks) AS n_tokens,
         round(nc / greatest(len(toks), 1), 4) AS avg_word_len,
         round(len(list_filter(toks, x -> list_contains(
             ['the','a','of','and','to','in','is','it'], x)))
           / greatest(len(toks), 1), 4) AS stopword_ratio,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
           / greatest(nc, 1), 4) AS punct_ratio,
         round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
           / greatest(nc, 1), 4) AS alpha_ratio
  FROM t
)"""

ORACLES["logit_step"] = f"""
WITH {DUCK_QFEATS_CTES}, rt AS (
  SELECT {_LOGIT_Y} AS y, {_LOGIT_PE} AS lp,
         {_LOGIT_XE_SQL}
  FROM feats
), rt2 AS (
  SELECT y, lp,
         least(greatest(lp, CAST(1 AS BIGINT)), CAST(9999 AS BIGINT))
           AS lpc,
         lp - y * 10000 AS re,
         {", ".join(f"xe_{k}" for k in _LOGIT_XE)}
  FROM rt
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(-ln((CASE WHEN y = 1 THEN lpc
             ELSE 10000 - lpc END) / 10000.0) * 1e6 + 0.5) AS BIGINT))
           AS HUGEINT) AS snll,
         {_LOGIT_G_SQL}
  FROM rt2
)
{_LOGIT_BRANCHES}
ORDER BY feature
"""

# naive_bayes_train oracle (r8): same exact-count pipeline — one
# class×token aggregation, Laplace-smoothed ln of an int ratio at 6dp,
# int-ratio prior via the shared half-up helper, deterministic
# (count desc, token asc) per-class top-K
ORACLES["naive_bayes_train"] = f"""
WITH tok AS (
  SELECT lang, unnest({_DUCK_TOKS}) AS tok FROM documents
), ct AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY lang, tok
), cls AS (
  SELECT lang, CAST(sum(cnt) AS BIGINT) AS total_tokens
  FROM ct GROUP BY lang
), cd AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_class
  FROM documents GROUP BY lang
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), v AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM ct
), top AS (
  SELECT lang, tok, cnt,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY cnt DESC, tok ASC) AS INTEGER) AS rnk
  FROM ct
)
SELECT t.lang, cd.n_docs_class,
       {round4_ratio_sql('cd.n_docs_class', 'nd.n_docs')} AS prior,
       cls.total_tokens, t.rnk, t.tok, t.cnt AS tok_cnt,
       round(ln((t.cnt + 1) / (cls.total_tokens + v.v)), 6) AS loglik
FROM top t
JOIN cls USING (lang)
JOIN cd USING (lang), nd, v
WHERE t.rnk <= {NB_TOPK}
ORDER BY lang, rnk
"""

