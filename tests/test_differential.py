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
             "stream_tumbling", "events_sessionize",
             # r7: duplicate-value rank ties (the exact-duplicate value
             # clusters) are quantile_normalize's tie-safety surface
             "quantile_normalize",
             # r7: burst corpora put many simultaneous events inside
             # one user's trailing window — exactly the RANGE-frame
             # peer semantics events_rate_limit must keep engine-equal
             "events_rate_limit",
             # r7: exact-duplicate value clusters are the tie surface
             # of the doubled-average-rank arithmetic, and a corpus
             # whose dates never cross the PSI split makes the whole
             # current period empty — the add-one-smoothing edge
             "mann_whitney", "drift_psi",
             # r7: same-µs timestamp ties make the (ts, event_id) lag
             # ordering tie-break load-bearing, and duplicate-value
             # clusters stress the all-integer mean-centering — the
             # exact shapes acf_lags's lead() recurrence must keep
             # engine-equal
             "acf_lags",
             # r7: purchase-free corpora make every subject censored
             # (zero death rows → empty curve on both engines), and
             # single-event users land whole day-0 tie clusters on the
             # first KM step — the d = n_risk exact-zero edge
             "kaplan_meier",
             # r7: duplicate-value clusters land the ceil-rank band
             # edges ON ties, and sparse (type, hour) cells hit the
             # n = 1 order-statistic degenerate (all three bands equal)
             "seasonal_envelope",
             # r7: burst corpora put MANY touches in one purchase's
             # window (fan-out + varying credit denominators) while
             # touch-free purchases exercise the direct anti-join arm
             "attribution_linear",
             # r11: burst corpora ARE the operator's subject — many
             # same-hour events spike single buckets off a sparse
             # baseline, the short generated span exercises the
             # warm-up exclusion, and hour gaps pin the densified
             # zero-count baseline arithmetic on both engines
             "burst_detect"]

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


#: document operators under differential test — tokenization-,
#: hashing- and stats-sensitive surfaces
DOC_OPS = ["text_stats", "text_quality", "token_count", "lang_id",
           "doc_fingerprint", "doc_chunk", "seq_pack", "vocab_topk",
           "dedup_ngram_jaccard", "decontaminate", "split_assign",
           "mix_sources", "mix_temperature", "inverted_index",
           "text_repetition", "lm_score", "lm_score_bigram",
           "text_tfidf", "text_bm25", "corpus_curate",
           "udtf_tokens", "feature_hash", "bpe_pair_stats",
           "quality_logit",
           # r8: empty/whitespace docs zero every feature (sigmoid of
           # the bare intercept), the mixed en/de/fr labels make both
           # gradient signs live, and degenerate texts land pe at the
           # [1, 9999] log-loss clamp — logit_step's quantized
           # gradient recurrence must keep all of it engine-equal
           "logit_step",
           # r8: heavy-repetition docs concentrate class-token counts
           # into tie clusters (the top-K tie-break surface), empty
           # docs exercise the zero-token class-prior split, and the
           # 3-class labels keep all priors live
           "naive_bayes_train",
           # r8: the 4-source corpora share most grams (near-complete
           # overlap matrix) while empty/whitespace docs produce
           # gram-free rows on both engines
           "source_overlap",
           # r8: repetition docs collapse to tiny gram sets whose
           # sha-slot minima collide across docs — the band-bucket
           # tie surface; NBSP/tab corpora pin the tokenizer parity
           # the signatures inherit
           "minhash_lsh_join",
           # r5: empty/whitespace/NBSP/repetition docs are exactly the
           # entropy edge cases (0-entropy runs, unicode char split)
           "text_entropy",
           # r7: repetition storms (bigram count concentration) and
           # NBSP-glued tokens hit collocation_pmi's support floor and
           # marginals; lang_confusion's marker argmax sees empty/
           # whitespace docs (all-zero scores -> tie rule)
           "collocation_pmi", "lang_confusion",
           # r7: empty/whitespace docs (gram-less under the <n-token
           # ANSI guard), NBSP-glued tokens and repetition storms are
           # the shared-gram surface of the substring/containment
           # audits; the rule thresholds and integer cross-multiplied
           # ratios of gopher_rules see the same degenerate docs, and
           # the two hash samplers exercise score=NULL/empty strata
           "substring_dedup", "dedup_containment", "gopher_rules",
           "importance_sample", "sample_cap_per_group",
           # r7: the sketch and its probes must stay bit-identical on
           # NBSP/empty/repetition corpora (hash-input surface)
           "cms_topk",
           # r7: prefix-filter completeness vs the naive-spec oracle on
           # adversarial corpora — repetition storms make near-dup sets,
           # empty/short docs stress the p = n - ceil(tn) + 1 edge
           "join_prefix_filter",
           # r7: repetition storms collapse the gram universe (many
           # docs, few grams → novelty concentrates in the lowest
           # doc_ids) and empty/whitespace docs fall out gram-less —
           # the min-doc tie and absent-row edges of ngram_novelty
           "ngram_novelty",
           # r7: repetition storms make DENSITY ties (many docs with
           # the identical tfq/dl rational) and corpora where <20 docs
           # match a query term exercise the one-list-only RRF branch
           # and the short-list integer-key ordering
           "rank_fusion",
           # r7: generated corpora concentrate lang×source into few
           # cells (near-deterministic association → NMI ~ 1, min-H
           # denominators tiny) — the quantized-term sums and the
           # b>0 NULL guard under near-degenerate marginals
           "mutual_info",
           # r7: repetition storms ARE the collapse surface (whole-doc
           # runs of one token → near-total collapse), empty/whitespace
           # docs hit the 0-token NULL-ratio arm, and the cleaned-text
           # sha pins the rewrite byte-for-byte on every shape
           "collapse_repeats",
           # r8: degenerate texts concentrate the µ-sigmoid into few
           # distinct scores (massive rank ties — the tie-averaged-rank
           # surface of AUC) and the en/de/fr label mix keeps both
           # classes live; the same score collisions pile rows into
           # few calibration bins, exercising bin-boundary clamping
           # and the exact mean_pred/frac_pos ratios on tiny n
           "roc_auc", "calibration_bins",
           # r8: repetition storms produce runs of IDENTICAL gram
           # hashes (the winnower's tie surface — packed-pos minima
           # must break ties identically), empty/whitespace/short docs
           # hit the no-gram and fewer-grams-than-window degenerate
           # windows, and NBSP corpora pin tokenizer parity upstream
           "winnow_fingerprint",
           # r8: the 120-doc corpora push shared boilerplate
           # fingerprints over the df prune threshold (both engines
           # must drop the SAME hot list) while repetition families
           # produce genuinely-shared fingerprints over the >= 3 cut
           "winnow_join",
           # r8: tiny vocabularies (n << TOPK), count-tie clusters
           # (the rank tie-break surface), and repetition storms where
           # one token carries most mass (near-degenerate d2) — plus
           # single-token sources landing on the d1 = 0 NULL guard
           "zipf_fit",
           # r8: 4-source corpora with near-identical vocabularies
           # (JSD ~ 0: the µ-quantized terms hover at 0 boundary) and
           # sources dominated by disjoint repetition tokens (the
           # closed-form ln2 mass) — both KL halves and the pooled
           # ratio must stay engine-equal on every shape
           "js_divergence",
           # r8: repetition docs concentrate tf mass onto one token
           # (votes dominated by a single hash — band buckets collide
           # heavily) and empty/whitespace docs vanish pre-vote; every
           # stage (votes, sign packing, bands, popcount) must stay
           # bit-equal on the adversarial shapes
           "simhash_join",
           # r9: tiny adversarial vocabularies sit mostly INSIDE the
           # top-16 fertility vocab (OOV mass comes from NBSP-glued
           # and punctuation-storm tokens — the length surface of the
           # ceil(len/4) piece estimate), and count ties at the
           # vocab cut exercise the (freq, tok) ordering on both
           # engines
           "token_fertility",
           # r9: repetition storms collapse the corpus gram index to
           # a handful of grams (batch docs all-novel or all-seen),
           # empty/whitespace batch docs fall out gram-less, and the
           # %10 split leaves some corpora with an EMPTY standing
           # corpus (every batch gram novel — the left-join-all-NULL
           # arm)
           "novelty_delta",
           # r9: the derived-URL pathologies (www/case/query planting
           # + %13 page slots) over adversarial doc_id layouts — the
           # canonicalization and min_by survivor pick must stay
           # engine-equal when n_chars repeats and copies tie
           "host_dedup",
           # r10: repetition docs give IDENTICAL 8-token leads across
           # sources (genuine mirror pairs), empty docs are excluded
           # on both engines, short docs fingerprint fewer-than-8
           # tokens, and the tiny shared vocabulary pushes some leads
           # over the 12-domain df prune — both engines must drop the
           # SAME hot-lead list before pairing
           "mirror_detect",
           # r10: adversarial corpora where most docs are OUTSIDE the
           # [20, 5000] good-token band (empty/whitespace/single-token
           # → n_good = 0 numerators) and heavy URL aliasing drives
           # unique_share down — the priority int ratio and its
           # DESC-order tie-breaks must stay engine-equal
           "crawl_frontier",
           # r10: single-doc and empty sources (n_tokens edge), NBSP
           # tokenizer parity upstream of the micro-nat sums, and
           # repetition corpora where one token carries ~all mass
           # (nll_u near 0 — the floor(+0.5) boundary)
           "source_perplexity",
           # r10: repetition storms make runs of identical gram hashes
           # (leftmost-min tie chains → sparse selections with MAXIMAL
           # gaps — the guarantee boundary), short docs land in the
           # one-window degenerate branch, and gram-less docs must
           # drop out of BOTH engines identically
           "winnow_coverage",
           # r11: empty/whitespace docs contribute zero-token curve
           # points (the cum_toks >= 1 guard), repetition docs flatten
           # cumulative vocabulary (x advances, y stalls — the d2 = 0
           # direction), tiny sources land n_points = 1 (d1 = 0 →
           # NULL fit), and the 120-doc corpora keep every doc a
           # sample point — the DIV predicate's n_docs <= P branch
           "heaps_law",
           # r11: most generated docs fail the Gopher word-count rule
           # (stage-1 attrition near total — funnel stages that empty
           # exercise the NULL kept_share arm), repetition docs are
           # exact-duplicate groups (the stage-3 window actually
           # prunes here, unlike the dup-free fixtures), and the LM
           # band verdict runs off degenerate micro-nat sums
           "filter_funnel"]
# scrub_pii is excluded: it joins the customer table (its PII name
# dictionary), which these documents-only corpora don't materialize

WORDS = ["spark", "join", "window", "the", "of", "and", "data",
         "stream", "table", "query", "scan", "merge", "shuffle"]


def _gen_docs(seed: int, n: int = 120):
    """Adversarial documents: empty text, whitespace-only, single
    token, NBSP-joined words (unicode-vs-ASCII whitespace split
    divergence — the round-3 udtf latent), tab/newline separators,
    heavy repetition, quote/punctuation storms, PII-looking strings —
    plus enough normal docs that df thresholds and vocab tops engage."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.random()
        if k < 0.04:
            text = ""
        elif k < 0.08:
            text = "   \t  \n "
        elif k < 0.12:
            text = rng.choice(WORDS)
        elif k < 0.16:
            text = " ".join(rng.choices(WORDS, k=4))  # NBSP glue
        elif k < 0.20:
            text = "\t".join(rng.choices(WORDS, k=6)) + "\n" \
                + " ".join(rng.choices(WORDS, k=3))
        elif k < 0.26:
            text = " ".join([rng.choice(WORDS)] * rng.randint(8, 30))
        elif k < 0.30:
            text = 'he said "stop, now!" -- twice?! (really; truly...)'
        elif k < 0.34:
            text = ("reach me at bob@example.com or 555-0101 "
                    + " ".join(rng.choices(WORDS, k=5)))
        elif k < 0.38:
            # astral-plane emoji (UTF-16 surrogate pairs on the JVM),
            # CJK, and combining marks: pins that every tokenizer/
            # length/char-split surface counts CODEPOINTS identically
            # on both engines (probed equal; this keeps it that way)
            text = ("naïve café \U0001F600\U0001F680 "
                    + "中文 文本 " + "\U0001F44D" * rng.randint(1, 4)
                    + " " + " ".join(rng.choices(WORDS, k=3)))
        else:
            text = " ".join(rng.choices(WORDS, k=rng.randint(5, 60)))
        rows.append((i, text, rng.choice(["en", "de", "fr"]),
                     f"src{rng.randint(1, 4)}", len(text)))
    return rows


@pytest.fixture(scope="module")
def diff_doc_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (7, 8):
        d = tmp_path_factory.mktemp(f"diffdoc{seed}")
        df = spark.createDataFrame(
            _gen_docs(seed),
            "doc_id long, text string, lang string, source string, "
            "n_chars long")
        df.coalesce(2).write.parquet(f"{d}/documents.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", DOC_OPS)
@pytest.mark.parametrize("seed", [7, 8])
def test_differential_on_generated_docs(spark, diff_doc_dirs, name, seed):
    dirs, con = diff_doc_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS documents")
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf_dir}/documents.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


#: embedding operators under differential test — float-parity-
#: sensitive surfaces (left-to-right accumulation contracts)
EMB_OPS = ["array_cosine", "embedding_normalize", "embedding_quantize",
           "similarity_topk", "embedding_centroids", "similarity_ivf",
           # r7: one Lloyd step over the same quantizer cells
           "kmeans_step",
           # r7: constant/duplicate vectors zero the centered terms
           # (all-zero w → NULL direction/share via the b>0 guard) and
           # extreme coordinates stress the DECIMAL(38,0) per-dim sums
           "pca_power_iter",
           # r9: exact scaled copies make round-6 cosine TIES at 1.0
           # (the id tie-break surface of BOTH top-k arms) and the
           # 300-vector corpora give a degenerate few-cell quantizer —
           # the recall counts, scan shares and the beats_random
           # cross-multiplication must stay engine-equal on all of it
           "similarity_recall"]
# ivfpq_recall is deliberately NOT in this tier: its concentrates_hits
# column is a sketch-contract LITERAL (oracle emits TRUE; the PQ side
# is not SQL-replayable), and unlike cms_topk's never_under — a
# theorem — ADC concentration is an empirical property that adversarial
# tie-heavy corpora (exact scaled copies, constant vectors) can
# legitimately break.  Its claim is pinned on the committed fixtures
# (all 3 SFs) by the driver window and scripts/check_query.py.


def _gen_embeddings(seed: int, n: int = 300, dim: int = 64):
    """Adversarial vectors: near-duplicates (scaled copies — cosine
    exactly 1), axis-aligned unit vectors, constant vectors, value
    extremes, and everything float32-quantized through the parquet
    round-trip like the real table.  Zero vectors are excluded: the
    engines' NaN ORDERING conventions differ and the operators
    document finite-norm inputs."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.random()
        if k < 0.05:
            v = [0.0] * dim
            v[rng.randrange(dim)] = 1.0          # axis unit
        elif k < 0.10:
            v = [1.0] * dim                      # constant
        elif k < 0.20 and rows:
            base = rows[rng.randrange(len(rows))][1]
            v = [x * 2.0 for x in base]          # exact scaled copy
        else:
            v = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        rows.append((i, v, rng.randint(0, 9)))
    return rows


@pytest.fixture(scope="module")
def diff_emb_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (11, 12):
        d = tmp_path_factory.mktemp(f"diffemb{seed}")
        df = spark.createDataFrame(
            _gen_embeddings(seed),
            "vec_id long, embedding array<float>, label int")
        df.coalesce(2).write.parquet(f"{d}/embeddings.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", EMB_OPS)
@pytest.mark.parametrize("seed", [11, 12])
def test_differential_on_generated_embeddings(spark, diff_emb_dirs,
                                              name, seed):
    dirs, con = diff_emb_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS embeddings")
    con.execute(f"CREATE VIEW embeddings AS SELECT * "
                f"FROM '{sf_dir}/embeddings.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


#: SemDeDup-family operators (documents ⋈ embeddings): the adversarial
#: embedding corpus paired with a PARTIAL documents table (every other
#: vec_id has a doc row — the doc-join prune arm both operators carry).
#: r11: exact scaled copies make round-6 cosine ties at 1.0 on BOTH
#: the pair threshold AND dedup_semantic's cent_cos comparison — the
#: tie-prunes-the-higher-vec_id branch is live, and constant/axis
#: vectors land whole cells on one centroid
SEM_OPS = ["dedup_semantic", "dedup_embedding"]


@pytest.fixture(scope="module")
def diff_sem_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (21, 22):
        d = tmp_path_factory.mktemp(f"diffsem{seed}")
        emb = _gen_embeddings(seed)
        (spark.createDataFrame(
            emb, "vec_id long, embedding array<float>, label int")
         .coalesce(2).write.parquet(f"{d}/embeddings.parquet"))
        docs = [(i, f"doc {i}", "en", f"src{i % 3}", 6)
                for (i, _, _) in emb if i % 2 == 0]
        (spark.createDataFrame(
            docs, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
         .coalesce(2).write.parquet(f"{d}/documents.parquet"))
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", SEM_OPS)
@pytest.mark.parametrize("seed", [21, 22])
def test_differential_on_semantic_dedup(spark, diff_sem_dirs, name,
                                        seed):
    dirs, con = diff_sem_dirs
    sf_dir = dirs[seed]
    for t in ("embeddings", "documents"):
        con.execute(f"DROP VIEW IF EXISTS {t}")
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


#: additional events-only operators folded into the generated-events
#: sweep — windows, funnels, CDC replay: all tie/ordering-sensitive
EVENT_OPS_EXTRA = ["cdc_apply", "window_lag", "window_running_sum",
                   "window_ewma", "window_range_frame", "gap_fill",
                   "retention_cohorts", "funnel_steps", "events_zscore",
                   "events_anomaly_mad", "rolling_mau",
                   "events_path_transitions", "window_rolling_median",
                   "stream_sliding", "stream_session", "agg_group_count",
                   # r5: duplicate values put exact ECDF steps ON the
                   # percentile grid points — the KS tie adversary
                   "ks_test"]


#: time-arithmetic operators under the PRE-1970 corpus (r7, per the
#: r6 verdict's standing suggestion): negative epoch seconds/µs cross
#: zero mid-corpus, so any truncate-vs-floor division, sign-unsafe
#: mod, or epoch-aligned bucketing divergence between the engines
#: surfaces here.  Ops with hardcoded 2024 period constants (drift_psi,
#: funnel windows) stay out — they'd compare empty-vs-empty.
NEG_EPOCH_OPS = ["time_bucket_ohlc", "window_twap", "cusum_changepoint",
                 "events_debounce", "events_rate_limit", "stream_tumbling",
                 "stream_sliding", "stream_session", "gap_fill",
                 "events_sessionize", "rolling_mau", "acf_lags",
                 "kaplan_meier", "stream_ohlc", "window_fill_forward",
                 "mann_whitney", "events_zscore", "attribution",
                 # hour() on pre-1970 wall clocks feeds the envelope key
                 "seasonal_envelope"]


def _gen_events_pre1970(seed: int, n: int = 400):
    """The _gen_events shapes shifted to straddle the epoch: base
    1969-12-28, ~9 days of traffic crossing 1970-01-01 00:00:00 UTC —
    negative unix_timestamp/unix_micros before the boundary, positive
    after, plus the same same-µs ties and duplicate-value clusters."""
    rng = random.Random(seed)
    base = dt.datetime(1969, 12, 28)
    rows = []
    ts = base
    for i in range(n):
        if rng.random() < 0.8:
            ts = ts + dt.timedelta(microseconds=rng.randint(1, 2_000_000_000))
        value = rng.choice([
            round(rng.uniform(0, 100), 2),
            10.0, 10.004, 0.0,
            round(rng.uniform(150000, 200000), 2),
        ])
        rows.append((i, ts, rng.randint(1, 8), rng.choice(TYPES),
                     value, '{"k": %d}' % rng.randint(0, 99)))
    return rows


@pytest.fixture(scope="module")
def diff_neg_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (41, 42):
        d = tmp_path_factory.mktemp(f"diffneg{seed}")
        df = spark.createDataFrame(
            _gen_events_pre1970(seed),
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        df.coalesce(2).write.parquet(f"{d}/events.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", NEG_EPOCH_OPS)
@pytest.mark.parametrize("seed", [41, 42])
def test_differential_on_pre1970_events(spark, diff_neg_dirs, name, seed):
    dirs, con = diff_neg_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS events")
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf_dir}/events.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@neg{seed}")


@pytest.mark.parametrize("name", EVENT_OPS_EXTRA)
@pytest.mark.parametrize("seed", [1, 2])
def test_differential_extra_event_ops(spark, diff_dirs, name, seed):
    dirs, con = diff_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS events")
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf_dir}/events.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


#: value-quantizing / value-ranking operators under the HOSTILE value
#: corpus (r8, pinning the r7 ADVICE latents): NULL, NaN, ±Inf,
#: magnitudes at and beyond the floor-cents quantizer's 9e14 safety
#: bound, and NEGATIVE values (refunds) — outside the guard Spark's
#: floor(DOUBLE)→LONG saturates at ±2^63 while DuckDB's BIGINT cast
#: raises, and DuckDB's bare // truncates toward zero where Spark's
#: num − pmod floor division floors (attribution_linear's credits).
#: Every op here must either guard-filter or raw-passthrough these
#: rows identically on both engines.
HOSTILE_VALUE_OPS = ["attribution_linear", "acf_lags",
                     "seasonal_envelope", "quantile_normalize",
                     "mann_whitney", "drift_psi"]


def _gen_events_hostile(seed: int, n: int = 300):
    """_gen_events shapes with a hostile value column: ~1/3 of rows
    draw from {NULL, NaN, +Inf, -Inf, ±(9e14±ε), ±9.5e18, negatives},
    the rest normal finite values (so guarded ops still have data)."""
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    hostile = [None, float("nan"), float("inf"), float("-inf"),
               9e14, -9e14, 8.999999e14, 9.5e18, -9.5e18,
               -123.45, -0.005, 1.7e308]
    rows = []
    ts = base
    for i in range(n):
        if rng.random() < 0.8:
            ts = ts + dt.timedelta(microseconds=rng.randint(1, 3_000_000_000))
        if rng.random() < 0.35:
            value = rng.choice(hostile)
        else:
            value = rng.choice([
                round(rng.uniform(0, 100), 2), 10.0, 10.004, 0.0,
                round(rng.uniform(150000, 200000), 2),
            ])
        rows.append((i, ts, rng.randint(1, 8), rng.choice(TYPES),
                     value, '{"k": %d}' % rng.randint(0, 99)))
    return rows


@pytest.fixture(scope="module")
def diff_hostile_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (71, 72):
        d = tmp_path_factory.mktemp(f"diffhostile{seed}")
        df = spark.createDataFrame(
            _gen_events_hostile(seed),
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string")
        df.coalesce(2).write.parquet(f"{d}/events.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", HOSTILE_VALUE_OPS)
@pytest.mark.parametrize("seed", [71, 72])
def test_differential_on_hostile_values(spark, diff_hostile_dirs, name,
                                        seed):
    dirs, con = diff_hostile_dirs
    sf_dir = dirs[seed]
    con.execute("DROP VIEW IF EXISTS events")
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{sf_dir}/events.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@hostile{seed}")


#: relational operators on generated orders/customer — null keys,
#: orphan references, out-of-domain statuses, negative prices and
#: heavy price/date ties (quantile and recency tie-breaks)
REL_OPS = ["rfm_segments", "agg_histogram", "table_diff", "dq_check",
           "skyline_pareto", "merge_upsert",
           # r5: negative/zero prices (benford's >0 filter), null and
           # orphan custkeys (gini's join-drop path), single-customer
           # nations (gini = 0 degenerate)
           "benford_digits", "gini_concentration",
           # r7: winsorize's discrete order-statistic bounds landing ON
           # tied cent values (the tiny price palette) and clip counts
           # with negative/zero prices are this corpus's exact shapes
           "winsorize",
           # r7: the tiny price palette makes replicate means COLLIDE
           # (the (m, b) rank tie-break goes load-bearing) and small
           # strata stress the integer-ceil CI ranks at b_eff edges
           "bootstrap_ci",
           # r8: negative prices sign the odd power sums (s1, s3),
           # constant-price palettes land m2 on the = 0 NULL guard,
           # and tiny groups make the exact-ratio mean/variance land
           # on short-decimal values — agg_moments' divergence surface
           "agg_moments"]

STATUSES = ["F", "O", "P", "F", "O", "P", "Q"]  # Q = domain violation
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]


def _gen_orders_customer(seed: int, n_orders: int = 400,
                         n_cust: int = 60):
    rng = random.Random(seed)
    cust = [(c, f"Customer#{c:09d}", rng.randrange(25),
             round(rng.uniform(-999.99, 9999.99), 2),
             rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"]))
            for c in range(1, n_cust + 1)]
    # heavy ties: prices from a tiny palette, dates from few days
    prices = [round(rng.uniform(900, 1000), 2) for _ in range(6)] \
        + [-5.0, 0.0]
    days = [dt.datetime(1995, 1, 1) + dt.timedelta(days=rng.randrange(30))
            for _ in range(8)]
    orders = []
    for k in range(1, n_orders + 1):
        r = rng.random()
        if r < 0.03:
            ck = None                       # null key (dq not-null)
        elif r < 0.08:
            ck = n_cust + rng.randrange(50) + 1   # orphan reference
        else:
            ck = rng.randrange(1, n_cust + 1)
        orders.append((k, ck, rng.choice(STATUSES),
                       rng.choice(prices), rng.choice(days),
                       rng.choice(PRIORITIES)))
    return orders, cust


@pytest.fixture(scope="module")
def diff_rel_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (21, 22):
        d = tmp_path_factory.mktemp(f"diffrel{seed}")
        orders, cust = _gen_orders_customer(seed)
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long, "
                    "o_orderstatus string, o_totalprice double, "
                    "o_orderdate timestamp_ntz, o_orderpriority string"
        ).coalesce(2).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            cust, "c_custkey long, c_name string, c_nationkey int, "
                  "c_acctbal double, c_mktsegment string"
        ).coalesce(1).write.parquet(f"{d}/customer.parquet")
        # 25 nations over 60 customers: some nations get a single
        # customer (gini degenerate G=0), some none at all
        spark.createDataFrame(
            [(i, f"NATION{i:02d}", i % 5) for i in range(25)],
            "n_nationkey int, n_name string, n_regionkey int"
        ).coalesce(1).write.parquet(f"{d}/nation.parquet")
        # dq_check audits events.value_finite (r12) — give it the
        # hostile events corpus so the finite-violation counter's
        # non-zero path is exercised in the relational family too
        # (r13 advice item: this previously wrote the all-finite
        # corpus despite the comment)
        spark.createDataFrame(
            _gen_events_hostile(seed),
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        ).coalesce(2).write.parquet(f"{d}/events.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", REL_OPS)
@pytest.mark.parametrize("seed", [21, 22])
def test_differential_on_generated_orders(spark, diff_rel_dirs, name, seed):
    dirs, con = diff_rel_dirs
    sf_dir = dirs[seed]
    for t in ("orders", "customer", "nation", "events"):
        con.execute(f"DROP VIEW IF EXISTS {t}")
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


#: lineitem/part operators — percentile-boundary, correlation and
#: support-count tie sensitivity
LINE_OPS = ["quantile_bins", "agg_corr", "agg_stats", "basket_pairs",
            # r8: the integer quantity palette and ~5 items/order make
            # MASSIVE basket-size rank ties (the doubled tie-averaged
            # rank surface), the tiny price palette ties y ranks too,
            # constant-measure groups land on the d=0 NULL guard, and
            # itemless/orderless keys exercise the inner-join edge
            "spearman_corr"]
PART_OPS = ["join_range", "join_range_binned"]


def _gen_lineitem(seed: int, n: int = 600):
    """Heavy ties on quantity (integer palette — exact percentile
    boundaries land ON repeated values), constant-price runs (zero
    variance inside a flag group stresses corr/stddev), small
    basket universe so pair supports tie."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ok = rng.randrange(1, 120)
        qty = float(rng.choice([1, 1, 5, 5, 5, 10, 10, 25, 50]))
        price = rng.choice([100.0, 100.0, 250.5, 999.99,
                            round(rng.uniform(10, 2000), 2)])
        rows.append((ok, rng.randrange(1, 25), rng.randrange(1, 10),
                     i % 7 + 1, qty, price,
                     round(rng.choice([0.0, 0.05, 0.1]), 2),
                     round(rng.choice([0.0, 0.08]), 2),
                     rng.choice(["A", "N", "R"]),
                     rng.choice(["F", "O"]),
                     dt.datetime(1995, 1, 1)
                     + dt.timedelta(days=rng.randrange(60))))
    return rows


def _gen_part(seed: int, n: int = 80):
    """Retail prices sitting EXACTLY on the band edges (933.0, 966.0)
    — the half-open [lo, hi) boundary is where a binned rewrite and
    the nested-loop original can disagree."""
    rng = random.Random(seed)
    return [(p, f"part {p}", f"Brand#{rng.randrange(1, 6)}",
             rng.choice(["STEEL", "BRASS", "COPPER"]),
             rng.randrange(1, 50),
             rng.choice([933.0, 966.0, 932.99, 965.99, 966.01,
                         round(rng.uniform(850, 1050), 2)]))
            for p in range(1, n + 1)]


@pytest.fixture(scope="module")
def diff_line_dirs(spark, tmp_path_factory):
    out = {}
    con = duckdb.connect()
    for seed in (31, 32):
        d = tmp_path_factory.mktemp(f"diffline{seed}")
        spark.createDataFrame(
            _gen_lineitem(seed),
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, "
            "l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp_ntz"
        ).coalesce(2).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            _gen_part(seed),
            "p_partkey long, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double"
        ).coalesce(1).write.parquet(f"{d}/part.parquet")
        # orders for spearman_corr: keys 1..140 over lineitem's
        # 1..119 range — itemless orders (120..140, dropped by the
        # inner join on both engines), a tiny tie-heavy price palette
        # including zero and negative totals, and statuses so one
        # group can go constant-measure
        rng = random.Random(seed * 100)
        spark.createDataFrame(
            [(k, rng.choice(["F", "O", "P"]),
              rng.choice([100.0, 100.0, 0.0, -5.0, 250.5,
                          round(rng.uniform(10, 2000), 2)]))
             for k in range(1, 141)],
            "o_orderkey long, o_orderstatus string, "
            "o_totalprice double"
        ).coalesce(1).write.parquet(f"{d}/orders.parquet")
        out[seed] = str(d)
    return out, con


@pytest.mark.parametrize("name", LINE_OPS + PART_OPS)
@pytest.mark.parametrize("seed", [31, 32])
def test_differential_on_generated_lineitem(spark, diff_line_dirs,
                                            name, seed):
    dirs, con = diff_line_dirs
    sf_dir = dirs[seed]
    for t in ("lineitem", "part", "orders"):
        con.execute(f"DROP VIEW IF EXISTS {t}")
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet/*.parquet'")
    df = all_queries()[name](spark, sf_dir)
    compare(df, con, all_oracles()[name], f"{name}@seed{seed}")


def test_ohlc_stream_converges_on_adversarial_events(spark, diff_dirs):
    """Stream==batch on the tie-heavy generated corpus: the candle
    state (decoded min/max of the packed key) must merge identically
    across micro-batch boundaries even when the ties it resolves span
    batches — the fixed-fixture convergence test never exercises
    same-microsecond/same-cents ties."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming import jobs
    from mvp_mini_etl_pipeline_1762911573_spark.streaming.batch_equiv import (
        ohlc_rollup,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    dirs, _ = diff_dirs
    # the corpus is a 2-part parquet DIRECTORY, which events_stream
    # feeds as one micro-batch per part file — so candle state for the
    # windows spanning both parts genuinely MERGES across batches
    sf_dir = dirs[1]
    batch = ohlc_rollup(load(spark, sf_dir, "events"))
    stream = jobs.ohlc_stream(jobs.events_stream(spark, sf_dir))
    got = jobs.run_to_memory(stream, "t_ohlc_adv", "complete")
    cols = ["window_start", "event_type", "open", "high", "low",
            "close", "volume", "n_ticks"]
    a = sorted(tuple(r) for r in got.select(*cols).collect())
    b = sorted(tuple(r) for r in batch.select(*cols).collect())
    assert a == b


@pytest.mark.parametrize("flavor", ["tumbling", "sliding"])
def test_windowed_streams_converge_on_adversarial_events(
        spark, diff_dirs, flavor):
    """Tumbling/sliding window state must also merge across the
    2-part micro-batches of the tie-heavy corpus."""
    from mvp_mini_etl_pipeline_1762911573_spark.streaming import jobs
    from mvp_mini_etl_pipeline_1762911573_spark.streaming import (
        batch_equiv as be,
    )
    from mvp_mini_etl_pipeline_1762911573_spark.tables import load
    dirs, _ = diff_dirs
    sf_dir = dirs[2]
    ev = load(spark, sf_dir, "events")
    if flavor == "tumbling":
        batch = be.tumbling_counts(ev)
        stream = jobs.tumbling_stream(jobs.events_stream(spark, sf_dir))
        cols = ["window_start", "event_type", "cnt", "total_value"]
    else:
        batch = be.sliding_counts(ev)
        stream = jobs.sliding_stream(jobs.events_stream(spark, sf_dir))
        cols = ["window_start", "cnt"]
    got = jobs.run_to_memory(stream, f"t_adv_{flavor}", "complete")
    a = sorted(tuple(r) for r in got.select(*cols).collect())
    b = sorted(tuple(r) for r in batch.select(*cols).collect())
    assert a == b
