"""Deduplication operators (SURVEY.md §2.10 D1-D3 + EXT LLM-pipeline
dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Reference parity: the declared-but-unimplemented `dedup_removed` metric
(src/mock-data/etl.json:5) is the only dedup in the reference; the EXT
family is the BASELINE.json north-star requirement for training-data
pipelines at 100 TB.

Scale notes (100 TB):
* D1/D2 exact dedup = hash shuffle on the dedup key.  At 100 TB dedup
  on a narrow key (id / content-hash) — never the full row; we dedup
  documents by sha2(text) so the shuffle carries a 64-byte digest, not
  the document.
* D3 MinHash: per-doc signature is a narrow map-side computation
  (shingle → 64-bit hashes → k mins).  LSH banding turns all-pairs
  O(n²) into groupBy(band_hash) — only same-bucket pairs are compared.
  Band width r=4, b=8 bands over k=32 minhashes targets Jaccard ≳ 0.6
  (P(collide) = 1-(1-s^r)^b).  The candidate self-join is keyed on
  (band_id, band_hash) — the bucket sizes, not n², bound the work.
* SimHash: one 48-bit fingerprint per doc (SIMHASH_BITS — downsized
  from the textbook 64 so every shift/literal stays ANSI-safe in both
  engines); near-dup = Hamming distance ≤ 3, found by pigeonhole:
  split the fingerprint into 4 12-bit chunks, any pair within
  distance 3 shares ≥1 exact chunk → equi-join per chunk, then exact
  Hamming check.  All equi-joins, zero cross product.
* All-pairs n-gram Jaccard is exposed for oracle-checkability at test
  scale; its candidate generation (token → inverted index → pair
  counts) is the scalable path (prefix filtering would prune further).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import round4_ratio, round4_ratio_sql
from ..functions.text import (WS_CHARS, WS_RUN, _loglog_ols_tail_sql,
                              _tokens)
from ..oracles import USERS_CTE
from ..tables import load, users_valid
from .similarity import DUCK_CELLS_CTE, SIM_THRESHOLD

# MinHash parameters (see module docstring for the banding math).
MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = 4  # k = bands * rows
SHINGLE_N = 3  # word shingles (3-grams of tokens): ~4x fewer elements
#               than char 5-grams at equal dup-detection power on word-
#               level corpora, so ~4x less hashing in the hot map stage

# Prime hash space for the affine minhash permutations — small enough
# that (h*a + b) never overflows signed 64-bit under ANSI mode
# (h < 2^30, a < 2^7, b < 2^27 → product < 2^37).
_PRIME = 1_000_000_007


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: dropDuplicates(['id']) — realizes the reference's declared
    dedup_removed semantics.  Duplicates are verbatim copies, so the
    survivor is well-defined."""
    return (
        users_valid(spark, sf_dir)
        .dropDuplicates(["id"])
        .select("custkey", "id", "email", "country",
                F.date_format("registered_ts", "yyyy-MM-dd HH:mm:ss")
                 .alias("registered"))
    )


def _dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: full-row distinct on a narrow projection."""
    return (
        users_valid(spark, sf_dir)
        .select("id", "email", "country", "city")
        .distinct()
    )


def _dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup on documents: group by sha2(text) — the
    narrow-digest shuffle pattern for 100 TB corpora.  Keeps the min
    doc_id as survivor, counts the group."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("survivor_doc_id"),
             F.count("*").alias("copies"))
    )


def _gram_array(ws_col: str, n: int):
    """Guarded word-n-gram array over a pre-split token array column —
    the ONE implementation behind _shingled, _dedup_ngram_jaccard and
    _decontaminate (three hand-kept copies once drifted a review).
    Guards the <n-token edge: sequence(1, size-n+1<1) would be
    DESCENDING in Spark and out-of-range element_at throws under ANSI;
    the when() sidesteps both (DuckDB's generate_series(1, n<1) is
    naturally empty, so the oracles need no guard).  Tokenization is
    deliberately the CALLER's choice: _shingled filters empty tokens,
    while the jaccard/decontaminate paths keep the raw split to stay
    bit-identical with their oracles' string_split_regex."""
    return F.when(
        F.size(ws_col) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(ws_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws_col, i + j) for j in range(n)]),
        )),
    ).otherwise(F.array().cast("array<string>"))


def _shingled(docs: DataFrame) -> DataFrame:
    """Word n-gram shingle set per document (narrow, map-side)."""
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), WS_RUN),
                 lambda t: t != "").alias("ws"),
    )
    return toks.select(
        "doc_id", _gram_array("ws", SHINGLE_N).alias("shingles"))


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-minhash signature per doc via affine permutations
    h_i(x) = (a_i * xxhash64(x) + b_i) mod M over shingle hashes.
    Shingling and the shingle xxhash64 stay in codegen; the k
    permutation-min folds run as ONE Arrow pass (r14 OPT, guide §4.2):
    the HOF form evaluated k × |shingles| interpreted lambda ops per
    doc (higher-order functions are not whole-stage-codegen'd), this
    does the same arithmetic as three vectorized numpy ops per batch —
    measured 1.53 s → 1.16 s on the sf0.1 signature build (4/4
    interleaved in-session reps ≤ baseline), output bit-identical
    (integer arithmetic: h < 1e9+7 and a ≤ 2k+1 keep h·a+b far below
    int64 overflow on both runtimes, and numpy % equals pmod on
    non-negative operands).  Strictly map-side — mapInArrow runs on
    the scan partitions, no exchange added.

    NOTE for consumers (unchanged contract): docs too short to form
    one shingle (< SHINGLE_N tokens) carry an all-NULL signature —
    filter them AFTER materializing (see _dedup_near_minhash); an
    expression-level filter here gets substituted below the
    projections and re-evaluates the shingle+hash chain per row
    (measured 6x+ on dedup_near before the checkpoint-side filter)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    shingled = _shingled(docs)
    hashed = shingled.select(
        "doc_id",
        F.transform("shingles",
                    lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME)))
         .alias("hs"),
    )
    a_vec = np.array([2 * i + 1 for i in range(k)], dtype=np.int64)
    b_vec = np.array([1_000_003 * (i + 1) for i in range(k)],
                     dtype=np.int64)

    def mins(it):
        for batch in it:
            t = pa.Table.from_batches([batch])
            doc = t.column("doc_id")
            hs = t.column("hs")
            if isinstance(hs, pa.ChunkedArray):
                hs = hs.combine_chunks()
            lens = (pc.list_value_length(hs)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            flat = (hs.flatten()
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            n = len(lens)
            nz = lens > 0
            out = np.zeros((n, k), dtype=np.int64)
            if len(flat):
                perm = (flat[:, None] * a_vec[None, :]
                        + b_vec[None, :]) % _PRIME
                # reduceat segment i spans starts_nz[i]..starts_nz[i+1]-1;
                # empty docs contribute no flat elements, so the
                # nonempty docs' starts are exactly the boundaries
                starts = np.cumsum(lens) - lens
                out[nz] = np.minimum.reduceat(perm, starts[nz], axis=0)
            # shingle-less docs keep the all-NULL signature the HOF
            # form produced (array_min over an empty array)
            mask = np.repeat(~nz, k)
            values = pa.array(out.ravel(), mask=mask)
            offs = pa.array(np.arange(n + 1, dtype=np.int32) * k)
            sig = pa.ListArray.from_arrays(offs, values)
            yield pa.RecordBatch.from_arrays(
                [doc.combine_chunks()
                 if isinstance(doc, pa.ChunkedArray) else doc, sig],
                names=["doc_id", "sig"])

    return hashed.mapInArrow(mins, "doc_id long, sig array<long>")


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """The LSH candidate-generation stage: band the signatures, hash
    each band, equi-join on (band, bucket).  Exposed as its own step so
    candidate VOLUME is testable — the classic LSH regression is a
    banding bug that floods candidates (precision collapse) while
    recall stays perfect; tests/test_quality.py bounds the candidate
    count against the true-pair count."""
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * LSH_ROWS + 1, LSH_ROWS))
                     .alias("bucket"),
                )
                for b in range(LSH_BANDS)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    return (
        bands.alias("l")
        .join(bands.alias("r"),
              (F.col("l.band") == F.col("r.band"))
              & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def _dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: MinHash+LSH near-duplicate candidate pairs.  Bands of the
    signature are hashed; docs sharing any band bucket become
    candidates; estimated Jaccard = fraction of matching minhashes.
    Rows-only check (hash-permutation specifics are engine-local)."""
    docs = load(spark, sf_dir, "documents")
    # the signature frame feeds candidate generation AND both sides of
    # the rescoring join — materialize so minhashing runs once, not 3x
    # (at 100 TB you'd write signatures to storage for the same reason:
    # they're the reusable index, the corpus scan is the cost).
    # localCheckpoint over persist(): cached plans pinned by persist()
    # live in the CacheManager until the session dies (they leaked
    # across driver sweeps / bench / pytest in round 1); checkpoint
    # blocks are reference-tracked and freed when this DataFrame is
    # garbage-collected.
    sigs = (minhash_signatures(docs).localCheckpoint(eager=True)
            # drop sub-shingle docs (< SHINGLE_N tokens — titles,
            # near-empty crawl pages): their all-NULL signatures would
            # share ONE bucket in every band and flood candidate
            # generation with m²/2 pairs that rescore to 0.0 — the
            # precision collapse lsh_candidate_pairs' docstring warns
            # about.  They have no near-dup signal at this gram size
            # by definition, so exclusion is semantics-preserving.
            # Filtered AFTER the checkpoint: the barrier stops
            # predicate pushdown from substituting the signature
            # expressions back into the scan (see minhash_signatures).
            .where(F.element_at("sig", 1).isNotNull()))

    pairs = lsh_candidate_pairs(sigs)

    sl = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("sig").alias("sig_a"))
    sr = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("sig").alias("sig_b"))
    return (
        pairs.join(sl, "doc_a").join(sr, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                        lambda a, b: a == b),
                             lambda x: x))
             / F.lit(MINHASH_K)).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# Hot-gram pruning thresholds for _dedup_ngram_jaccard: drop grams with
# df > max(FLOOR, FRAC * n_docs).  FRAC=1% is the scale-invariant rule;
# the floor keeps tiny corpora from over-pruning.
NGRAM_DF_FLOOR = 5
NGRAM_DF_FRAC = 0.01

SIMHASH_BITS = 48  # 4 chunks × 12 bits; 48 keeps every shift/literal
#                    well inside signed-64 under ANSI mode


def _simhash_fp_arrow(tok_hash: DataFrame, hash_cols: list[str],
                      bits: int) -> DataFrame:
    """(doc_id, fp0[, fp1, ...]) SimHash fingerprints from a
    (doc_id, tf, h*) token-hash stream via ONE Arrow segmented
    reduce — r14 OPT (guide §4.2 / §1.2 step 2: the per-task work was
    the wall).  The previous all-JVM pipeline projected `prints*bits`
    sum(when(bit, +tf, -tf)) columns and hash-aggregated them per doc:
    every token row evaluated 120 shift/branch expressions and every
    doc carried a 120-long aggregation buffer — measured 4.1s for the
    sf0.1 fp table, vs 0.8s for this shape (5x), output bit-identical.

    Values are EXACT by integer arithmetic: vote_i = Σ±tf > 0
    ⟺ 2*Σ(tf·bit_i) > Σtf, all int64 sums (order-free), and numpy's
    >> on int64 is the same arithmetic shift as F.shiftright — the
    xxhash64 flavor's negative hashes extract identical bits.

    Shape at 100 TB: the (doc_id, tf, h*) rows are repartitioned by
    doc once (narrow — ids and longs only, no text) and each task
    reduces its docs in a handful of vectorized numpy passes.  This
    trades a ~3x wider doc-keyed exchange (pairs instead of packed
    vote states) for ~60x less per-token expression work; per-task
    memory is one partition's pair rows (bounded by shuffle partition
    sizing, guide §2.2)."""
    import numpy as np
    import pyarrow as pa

    out_names = ["doc_id"] + [f"fp{i}" for i in range(len(hash_cols))]
    schema = ", ".join(f"{n} long" for n in out_names)
    cols = ["doc_id", "tf", *hash_cols]

    def votes(it):
        chunks = list(it)
        if not chunks:
            return
        t = pa.Table.from_batches(chunks)
        doc = t.column("doc_id").to_numpy()
        if len(doc) == 0:
            return
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        tf = t.column("tf").to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        total = np.add.reduceat(tf, starts)
        arrays = [pa.array(doc[starts])]
        for c in hash_cols:
            h = t.column(c).to_numpy()[order]
            fp = np.zeros(len(starts), dtype=np.int64)
            for i in range(bits):
                s = np.add.reduceat(tf * ((h >> i) & 1), starts)
                fp |= (2 * s > total).astype(np.int64) << i
            arrays.append(pa.array(fp))
        yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return (tok_hash.select(*cols).repartition("doc_id")
            .mapInArrow(votes, schema))


def simhash_fingerprints(docs: DataFrame,
                         bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash per doc from word tokens: each token votes its hash bits
    ±tf; fingerprint = sign vector packed into a long.  Tokenize, tf
    reduce and xxhash64 stay in codegen; the 48 per-bit vote sums run
    as one Arrow segmented reduce (see _simhash_fp_arrow — r14, 5x on
    the 120-bit sibling, bit-identical)."""
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), WS_RUN)).alias("tok"),
    ).where(F.col("tok") != "")
    tok_hash = tokens.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf")).withColumn("h", F.xxhash64("tok"))
    return (_simhash_fp_arrow(tok_hash, ["h"], bits)
            .withColumnRenamed("fp0", "simhash"))


def _dedup_near_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance ≤ 3 via the
    4×12-bit-chunk pigeonhole equi-join (any pair within distance 3
    matches exactly on ≥1 of 4 chunks).  Rows-only BY DESIGN (final):
    the signature depends on xxhash64 bit patterns, which no other
    engine reproduces — DuckDB has no xxhash64, and any reimplemented
    hash would be testing the test, not the operator.  Semantics are
    pinned instead by the recall pytest (test_quality.py) against
    exact token-Jaccard on planted near-duplicates."""
    docs = load(spark, sf_dir, "documents")
    # r13 OPT (guide §1.2): both sides of the chunk self-join re-derived
    # the 48-column vote pipeline; fp is |docs| × 2 columns.  LAZY
    # checkpoint (the simhash_join finding): eager serializes the DAG
    # behind a materialization barrier, lazy folds the single
    # derivation into the first consuming job.
    fp = simhash_fingerprints(docs).localCheckpoint(eager=False)
    chunks = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright("simhash", c * 12)
                 .bitwiseAND(F.lit(0xFFF)).alias("chunk"),
            )
            for c in range(4)
        ])).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk_id", "cc.chunk")

    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"),
              (F.col("l.chunk_id") == F.col("r.chunk_id"))
              & (F.col("l.chunk") == F.col("r.chunk"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("l.simhash").alias("fp_a"),
                F.col("r.simhash").alias("fp_b"))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


SIMHASH_SHA_BITS = 60    # bits PER PRINT: 15 sha hex chars stay a
#                          positive BIGINT on both engines (16 would
#                          hit the sign bit)
SIMHASH_SHA_PRINTS = 2   # two BIGINT prints = 120 fingerprint bits;
#                          print p hashes sha hex chars [15p+1, 15p+15]
SIMHASH_BAND_BITS = 30   # 4 bands x 30 bits (2 per print).  The r8
#                          form was 4x15-bit bands over ONE print —
#                          random bucket collisions ~n^2/2^15, the
#                          r8 verdict's one scale-weak item.  30-bit
#                          bands push that to n^2/2^30 (Manku '07
#                          w ~ 2*log2 n sizing, good past 10^8 docs)
#                          with the SAME pigeonhole guarantee: 4
#                          bands of any width are complete at HAM<=3.
SIMHASH_SHA_HAM = 3      # Hamming cut over the 120 concatenated bits


def _simhash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): deterministic SimHash near-dup join WITH a
    full oracle — the sha-derived counterpart to the rows-only
    `dedup_simhash`, exactly the relationship `minhash_lsh_join` has
    to `dedup_near`: swapping xxhash64 (Spark-local bit patterns) for
    the public sha256-prefix hash makes signatures, band buckets,
    candidates and verified pairs engine-identical, so the driver
    certifies the ENTIRE Charikar recipe — votes, sign packing,
    banding, popcount verify — on real data.

    Completeness is a theorem, not a recall curve: 120-bit prints
    (two BIGINTs of 60 bits — 16+ hex chars would hit the BIGINT
    sign bit, so the print WIDENS by adding columns, not bits per
    column) in 4 bands of 30 bits — any pair at Hamming distance
    <= 3 differs in at most 3 bands, so at least one band matches
    exactly (pigeonhole) and the bucket join CANNOT miss a
    qualifying pair.  The DuckDB oracle replays the banded recipe AS
    SPEC (the minhash_lsh_join contract — engine parity of every
    stage); the pigeonhole claim itself is machine-checked where
    all-pairs is affordable: tests/test_properties.py compares the
    banded join to the UNBANDED all-pairs popcount at sf0.001 and
    requires exact equality.  Vote ties (sum == 0) pack bit 0 under
    the shared `> 0` rule.

    100 TB shape: one (doc, token) reduce, 120 integer vote states
    per doc (mergeable partial agg), 4 band keys per doc (linear),
    popcount verify on candidate rows only.  Band width IS the scale
    lever (Manku et al. '07, w ~ 2*log2 n): with w-bit bands, RANDOM
    bucket collisions contribute ~n^2/2^w candidate pairs.  The r8
    form banded ONE 60-bit print into 4x15 — quadratic past ~10^8
    docs (the r8 verdict's scale-weak item); these 30-bit bands hold
    to ~10^9, and the print widens further by appending BIGINT
    columns (the pigeonhole guarantee needs only HAM+1 bands of ANY
    width, so widening never changes completeness).  Cross-shard
    linearity is now pinned by the 10x growth test in test_scale.py.
    (Contrast `minhash_lsh_join`, whose band keys concatenate R
    32-bit slots — collision space 2^64 — and need no such lever.)"""
    docs = load(spark, sf_dir, "documents")
    bits, prints = SIMHASH_SHA_BITS, SIMHASH_SHA_PRINTS
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), WS_RUN)).alias("tok"),
    ).where(F.col("tok") != "")
    tok_hash = tokens.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf")).select(
        "doc_id", "tf",
        *[F.conv(F.substring(F.sha2(F.col("tok"), 256), 15 * p + 1, 15),
                 16, 10).cast("long").alias(f"h{p}")
          for p in range(prints)])
    # r14 OPT: the 120 sum(when(...)) vote columns + packing now run
    # as one Arrow segmented reduce (_simhash_fp_arrow) — measured 5x
    # on the fp-table build, output bit-identical (integer votes).
    # LAZY checkpoint kept: the band self-join's two sides would each
    # re-derive the pipeline otherwise, and an eager barrier was
    # measured slower (concurrent branches; the r13 finding).  At
    # 100 TB the fingerprint table is the reusable index you'd WRITE
    # TO STORAGE once and join against.
    fp = _simhash_fp_arrow(tok_hash, [f"h{p}" for p in range(prints)],
                           bits).localCheckpoint(eager=False)
    # 4 bands of 30 bits: band 2p   = low 30 bits of print p,
    #                     band 2p+1 = high 30 bits of print p
    band_mask = (1 << SIMHASH_BAND_BITS) - 1
    chunks = fp.select(
        "doc_id", "fp0", "fp1",
        F.explode(F.array(*[
            F.struct(
                F.lit(2 * p + half).alias("chunk_id"),
                F.shiftright(f"fp{p}", half * SIMHASH_BAND_BITS)
                 .bitwiseAND(F.lit(band_mask)).alias("chunk"),
            )
            for p in range(prints) for half in range(2)
        ])).alias("cc"),
    ).select("doc_id", "fp0", "fp1", "cc.chunk_id", "cc.chunk")
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"),
              (F.col("l.chunk_id") == F.col("r.chunk_id"))
              & (F.col("l.chunk") == F.col("r.chunk"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .select(F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
                F.col("l.fp0").alias("fp0_a"),
                F.col("l.fp1").alias("fp1_a"),
                F.col("r.fp0").alias("fp0_b"),
                F.col("r.fp1").alias("fp1_b"))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("fp0_a").bitwiseXOR(F.col("fp0_b")))
            + F.bit_count(F.col("fp1_a").bitwiseXOR(F.col("fp1_b"))))
        .where(F.col("hamming") <= SIMHASH_SHA_HAM)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def _pruned_gram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) stream of word-3-grams with corpus-frequent
    (stopword-like) grams pruned — the ONE candidate-generation
    implementation behind `_dedup_ngram_jaccard` AND
    `_dedup_containment` (r7 review: the two hand-kept copies of the
    df-threshold block are exactly the drift class the `_gram_array`
    docstring records; the containment-⊇-Jaccard property test
    depends on both ops sharing one gram universe).

    Pruning: df per gram, hot list = df > max(NGRAM_DF_FLOOR,
    NGRAM_DF_FRAC·n_docs); n_docs is folded into the same DAG via a
    broadcast 1-row agg (no separate driver-side count action), and
    the hot list is tiny (heavy-hitter tail) → broadcast anti-join,
    no extra shuffle of the gram index."""
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the raw gram stream feeds the df table and
    # the returned anti-joined stream, whose consumers (Jaccard /
    # containment) each read it 3× more — one LAZY materialization
    # (r14 flip: occurrence-grain stream, no up-front barrier)
    # here collapses every downstream re-derivation of the
    # scan→split→gram-explode chain; the broadcast anti-join replay
    # per consumer is cheap against the checkpointed stream.
    grams = toks.select(
        "doc_id", F.explode(_gram_array("ws", 3)).alias("gram")
        ).localCheckpoint(eager=False)
    n_docs_df = docs.agg(F.count("*").alias("n_docs"))
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("df"))
    hot = (
        gram_df.crossJoin(F.broadcast(n_docs_df))
        .where(F.col("df") > F.greatest(
            F.lit(NGRAM_DF_FLOOR),
            F.col("n_docs") * F.lit(NGRAM_DF_FRAC)))
        .select("gram")
    )
    return grams.join(F.broadcast(hot), "gram", "left_anti")


#: The DuckDB mirror of _pruned_gram_stream, shared by the jaccard and
#: containment oracles (ends defining CTE `gramsf`).
DUCK_PRUNED_GRAMS_CTE = f"""toks AS (
  SELECT doc_id, string_split_regex(lower(text),
                                    '[ \\t\\n\\x0B\\f\\r]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(ws) - 1, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
  FROM toks
), hot AS (
  SELECT gram FROM (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
  WHERE df > greatest({NGRAM_DF_FLOOR},
                      {NGRAM_DF_FRAC} * (SELECT count(*) FROM documents))
), gramsf AS (
  SELECT g.doc_id, g.gram FROM grams g
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.gram = g.gram)
)"""


def _dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity for doc pairs sharing ≥1
    gram (inverted-index candidate generation — equi-join on gram, no
    cross product).  Fully SQL-expressible → DuckDB oracle.

    Hot-gram pruning: a gram shared by k docs yields k² candidate rows
    in the inverted-index self-join — stopword-like grams are a skew
    bomb on a real corpus.  Grams with document frequency above
    max(NGRAM_DF_FLOOR, NGRAM_DF_FRAC·n_docs) are dropped from the gram
    universe (both intersection AND per-doc sizes, so Jaccard stays a
    true Jaccard over the filtered universe).  Bound: a near-dup pair at
    Jaccard ≥ 0.2 shares ≥ 0.2·max(|A|,|B|) grams; corpus-frequent
    grams are by definition shared with ≥1% of ALL docs too, so they
    carry no pair-specific signal — planted ~0.98-Jaccard dup pairs
    lose at most the same few grams from numerator and denominator and
    stay ≳0.97.  The hot list is tiny (heavy-hitter tail) → broadcast
    anti-join, no extra shuffle of the gram index.  Candidate
    generation + pruning shared with `_dedup_containment` via
    `_pruned_gram_stream`."""
    docs = load(spark, sf_dir, "documents")
    grams = _pruned_gram_stream(docs)
    gram_counts = grams.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"))
    inter = (
        grams.alias("l")
        .join(grams.alias("r"),
              (F.col("l.gram") == F.col("r.gram"))
              & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("doc_a"),
                 F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    ca = gram_counts.select(F.col("doc_id").alias("doc_a"),
                            F.col("n_grams").alias("na"))
    cb = gram_counts.select(F.col("doc_id").alias("doc_b"),
                            F.col("n_grams").alias("nb"))
    return (
        inter.join(ca, "doc_a").join(cb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("inter")
                    / (F.col("na") + F.col("nb") - F.col("inter")), 4)
             .alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
    )


SUBSTR_N = 8  # substring-dedup gram width (words): long enough that a
#               shared gram is near-certain copied text, short enough
#               to catch partial/boilerplate duplication inside
#               otherwise-distinct documents


def _substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): exact substring-duplication audit — for every
    document, the share of its distinct word-8-grams that also occur
    in at least one OTHER document.  This is the per-doc signal behind
    exact substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): whole-doc dedup
    misses boilerplate, licenses and quoted passages COPIED INTO
    otherwise-unique documents; a high dup_share on a long doc says
    "trim or drop", invisible to MinHash at the doc level.

    Cross-engine exactness: gram extraction is the shared
    ``_gram_array`` (ANSI-guarded <n-token edge); all outputs are
    exact BIGINT counts plus one ratio through ``round4_ratio``
    (n_dup <= n_grams << the int64*20000 bound).

    100 TB shape: the gram stream is shuffled ONCE into the
    document-frequency table (partial-agg'd count on gram — the Zipf
    head is absorbed map-side, AQE skew-split catches the rest); the
    dup indicator then comes from an equi-join of the doc-gram stream
    against that already-reduced df table — never doc-to-doc pairs, so
    cost is linear in corpus grams, not quadratic in documents.
    Reference parity: dedup-removed accounting at
    src/lib/pipeline.js:31-36 is whole-row; this is the substring
    generalization a training pipeline needs."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the gram stream feeds the df table AND the
    # join-back — unmaterialized, the scan→split→8-gram-explode chain
    # ran twice (6 parquet scans in the before-plan).  LAZY
    # materialization (r14: −7% vs eager in the warm-cache bench
    # regime, and the 8-gram stream is occurrence-grain — no
    # up-front executor-storage barrier).
    grams = toks.select(
        "doc_id", F.explode(_gram_array("ws", SUBSTR_N)).alias("gram")
        ).localCheckpoint(eager=False)
    # grams are distinct per doc (_gram_array array_distincts), so
    # count(*) per gram == number of documents containing it
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
              .alias("n_dup"),)
        .select(
            "doc_id", "n_grams", "n_dup",
            round4_ratio(F.col("n_dup"), F.col("n_grams"))
            .alias("dup_share"),
        )
    )


CONTAIN_MIN = 0.6  # containment report floor: C(A->B) >= 0.6 means
#                    most of A's shingle set re-occurs inside B


def _dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): asymmetric containment dedup —
    C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| over word-3-gram sets,
    reported for ordered pairs (doc_a ≠ doc_b) with C ≥ CONTAIN_MIN.
    Jaccard (``dedup_ngram_jaccard``) misses subset duplication: a
    short doc fully embedded in a long one has Jaccard |A|/|B| → 0 but
    containment 1.0 — the classic quote/excerpt/boilerplate case a
    training-data pipeline must catch (Broder's containment measure,
    public).

    Same candidate generation + hot-gram pruning as the Jaccard op
    (inverted-index equi-join on gram; corpus-frequent grams dropped
    from the WHOLE gram universe so the ratio stays a true containment
    over the filtered universe — df-based pruning bounds the k² blowup
    per gram).  The ratio is int/int through ``round4_ratio``
    (exact-half safe); thresholding happens on the already-quantized
    4-dp value so both engines cut the identical set.

    100 TB shape: identical to the Jaccard audit — one shuffle of the
    gram stream to build df, a broadcast anti-join against the tiny
    hot list, one equi-join on gram (never a cross product), pair agg
    on already-blocked candidates.  Candidate generation + pruning
    shared with `_dedup_ngram_jaccard` via `_pruned_gram_stream`."""
    docs = load(spark, sf_dir, "documents")
    grams = _pruned_gram_stream(docs)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    inter = (
        grams.alias("l")
        .join(grams.alias("r"),
              (F.col("l.gram") == F.col("r.gram"))
              & (F.col("l.doc_id") != F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("doc_a"),
                 F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .select(
            "doc_a", "doc_b", "inter",
            F.col("n_grams").alias("na"),
            round4_ratio(F.col("inter"), F.col("n_grams"))
            .alias("containment"),
        )
        .where(F.col("containment") >= CONTAIN_MIN)
    )


PREFIX_JACCARD_T = 0.5  # similarity threshold for the prefix-filter join


def _join_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): prefix-filtering set-similarity self-join
    (Chaudhuri et al. SSJoin / Bayardo AllPairs, public) — the
    candidate-generation algorithm that replaces the full inverted
    index when the threshold is high: order the gram universe by
    ascending document frequency, and block each document ONLY on the
    first |G| − ceil(t·|G|) + 1 grams of its set in that order (its
    RAREST grams).  The prefix-filter theorem guarantees completeness:
    two sets with Jaccard ≥ t must share at least one prefix gram
    under a common global ordering — so the result EQUALS the naive
    all-shared-grams join, while candidates shrink by orders of
    magnitude AND the skew bomb disappears structurally (hot grams are
    by definition never in a prefix).

    Cross-paradigm oracle: DuckDB computes the SPEC — the unpruned
    inverted-index join over full gram sets with the same threshold —
    so the driver compare IS the completeness theorem checked on real
    data.  Verification arithmetic: candidate pairs join the two
    docs' full gram ARRAYS (array_intersect, map-side) and the final
    Jaccard is int/int via `round4_ratio`, thresholded on the
    quantized value (identical cut set cross-engine).

    100 TB shape: df table = one partial-agg'd shuffle of the gram
    stream; the global (df, gram) rank joins back against the
    already-reduced df table; prefix extraction is one bounded
    per-doc sort (array-sized, map-side after a collect_list per
    doc); the candidate join keys on RARE grams only — per-gram
    fan-out is capped by rarity, the quadratic hot-gram blowup of the
    naive index cannot occur.  The verify step touches candidates ×
    two array lookups, not the corpus."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the gram stream feeds the df table, the
    # rank join, the per-doc arrays AND both verify sides —
    # unmaterialized, the scan→split→gram-explode chain ran 5× (16
    # parquet scans in the before-plan).  LAZY checkpoint, on purpose:
    # the consumers include concurrent self-join sides, where an eager
    # barrier serializes the DAG and was measured slower (the r13
    # simhash_join finding); lazy folds the single materialization
    # into the first consuming job.
    grams = toks.select(
        "doc_id", F.explode(_gram_array("ws", 3)).alias("gram")
        ).localCheckpoint(eager=False)
    df_tbl = grams.groupBy("gram").agg(F.count("*").alias("df"))
    # global rarity order: (df asc, gram asc) — total and shared by
    # every document, the precondition of the prefix theorem
    ranked = grams.join(df_tbl, "gram").select(
        "doc_id", "gram",
        F.struct(F.col("df").alias("df"), F.col("gram").alias("g"))
        .alias("key"))
    per_doc = (ranked.groupBy("doc_id")
               .agg(F.array_sort(F.collect_list("key")).alias("keys"))
               .select(
                   "doc_id",
                   F.transform("keys", lambda k: k.getField("g"))
                   .alias("grams"),
                   F.size("keys").alias("n_grams")))
    # The verifier accepts iff round-half-up-4dp(I/U) >= t, which for
    # t = 0.5 is EXACTLY the integer condition Q*I >= P*U with
    # P = 49995, Q = 100000 (J = 0.49995 rounds UP to 0.5000) and
    # U = na + nb - I.  Every prune below is derived from THAT
    # condition, not from the nominal t — a prune derived from t = 1/2
    # over-prunes the 4-dp boundary band once sets are large enough
    # for the 0.00005 gap to exceed one gram (r8 review finding:
    # the old one-unit alpha slack failed at na+nb >~ 45k, the old
    # 2*min >= max length filter at max >~ 20k).
    #
    # prefix length: acceptance forces I(P+Q) >= P(na+nb) and nb >= I,
    # hence Q*I >= P*na, i.e. I >= ceil(P*n/Q) for EVERY eligible
    # partner — so blocking on the first n - ceil(P*n/Q) + 1 grams of
    # the global (df, gram) order keeps the smallest common gram (at
    # position <= n - I + 1) inside both prefixes.  Pure integer
    # ceil: (P*n + Q - 1) div Q via the sign-safe x - pmod(x, Q).
    PJ_P, PJ_Q = 49995, 100000
    pn = F.col("n_grams") * PJ_P + (PJ_Q - 1)
    p = (F.col("n_grams")
         - ((pn - F.pmod(pn, PJ_Q)) / PJ_Q).cast("int") + 1)
    prefixes = per_doc.select(
        "doc_id", "n_grams",
        F.posexplode(F.slice("grams", 1, p)).alias("pos", "gram"))
    # Two prunes inside the candidate join, both BEFORE the
    # distinct/verify work:
    # * PPJoin length filter: max J over partners is min/max (full
    #   containment), so acceptance is possible iff Q*min >= P*max;
    # * PPJoin POSITION filter (r8, cut verify volume ~20x): for the
    #   SMALLEST common gram (global (df, gram) order), every other
    #   common gram sorts after it in BOTH arrays, so the distinct
    #   overlap I <= 1 + min(na - i, nb - j) at its 1-based positions
    #   (i, j) — and the prefix argument above guarantees that gram
    #   sits inside both prefixes, so the pair ALWAYS survives via
    #   that row (any-match semantics through the distinct): rows for
    #   later common grams may fail the bound, the first-common row
    #   cannot.  Acceptance forces I >= alpha = ceil(P*(na+nb)/(P+Q))
    #   exactly — no hand slack needed (and on small docs this is
    #   TIGHTER than the old floor(s/3) - 1), no over-prune possible
    #   (ub >= I >= alpha on the first-common row of any accepting
    #   pair).  posexplode's pos is 0-based: na - i = na - pos - 1.
    #   Completeness stays machine-checked: the DuckDB oracle is the
    #   UNPRUNED naive spec, so an over-prune here is a driver hash
    #   mismatch, and the differential doc corpora replay the compare
    #   on adversarial shapes.
    ub = F.lit(1) + F.least(
        F.col("l.n_grams") - F.col("l.pos") - 1,
        F.col("r.n_grams") - F.col("r.pos") - 1)
    s = F.col("l.n_grams") + F.col("r.n_grams")
    sn = s * PJ_P + (PJ_P + PJ_Q - 1)
    alpha = (sn - F.pmod(sn, PJ_P + PJ_Q)) / (PJ_P + PJ_Q)
    cand = (prefixes.alias("l")
            .join(prefixes.alias("r"),
                  (F.col("l.gram") == F.col("r.gram"))
                  & (F.col("l.doc_id") < F.col("r.doc_id"))
                  & (F.col("l.n_grams") * PJ_Q >= F.col("r.n_grams") * PJ_P)
                  & (F.col("r.n_grams") * PJ_Q >= F.col("l.n_grams") * PJ_P)
                  & (ub >= alpha))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .distinct())
    return _verify_gram_pairs(grams, cand)


def _verify_gram_pairs(grams: DataFrame, cand: DataFrame) -> DataFrame:
    """Shared exact-Jaccard verifier for candidate doc pairs, on the
    GRAM STREAM: join-count of shared distinct grams == the
    array_intersect size, the same shape the DuckDB oracles use.
    Used by both `join_prefix_filter` and `minhash_lsh_join` — one
    copy makes their documented 'same verify arithmetic' contract
    structural instead of hand-synchronized (r8 review finding; the
    subset property between the two joins is pinned in
    tests/test_properties.py).

    Rejoining a per-doc ARRAY table twice would re-run its
    collect_list+sort derivation per side — the stream join re-reads
    only the already-exploded gram pipeline and carries (pair, gram)
    matches, never arrays (r8, with the position filter:
    7.7 s -> ~3.5 s at sf0.1)."""
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    inter = (cand
             .join(grams.select(F.col("doc_id").alias("doc_a"),
                                "gram"), "doc_a")
             .join(grams.select(F.col("doc_id").alias("doc_b"),
                                "gram"), ["doc_b", "gram"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("inter")))
    verified = (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_grams").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_grams").alias("nb")), "doc_b")
    )
    return (
        verified
        .select("doc_a", "doc_b", "inter",
                round4_ratio(
                    F.col("inter"),
                    F.col("na") + F.col("nb") - F.col("inter"))
                .alias("jaccard"))
        .where(F.col("jaccard") >= PREFIX_JACCARD_T)
    )


def _embedding_pair_edges(spark: SparkSession, sf_dir: str,
                          threshold: float | None = None) -> DataFrame:
    """Document pairs (keep_id < dup_id) whose embedding cosine
    (rounded to 6dp so both engines threshold identical values) reaches
    similarity.SIM_THRESHOLD — candidates restricted to pairs sharing a
    deterministic coarse-quantizer cell (similarity.assign_cells), i.e.
    SemDeDup proper: cluster the embedding space, score pairwise ONLY
    within clusters.  Shared candidate source for dedup_embedding
    (best-antecedent policy) and dedup_clusters (transitive closure).

    100 TB shape: the pairwise join is an EQUI-join on cell (no
    cartesian anywhere — the quantizer bounds candidate counts by
    Σ|cell|², exactly the SemDeDup paper's k-means trade-off: near-dup
    pairs straddling a cell boundary are missed by design, tuned via
    centroid count).  The quantizer is the stride-seeded argmax-cosine
    assignment — deterministic, so the WHOLE family keeps full DuckDB
    oracles (rare for semantic dedup)."""
    from .similarity import (_CENT_CACHE, SIM_THRESHOLD, _cent_cache_key,
                             assign_cells, pairwise_cosine_exact_udf)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    emb = load(spark, sf_dir, "embeddings")
    if threshold is None:
        threshold = SIM_THRESHOLD
        # opt-in materialization (warm_edges_cache): the candidate-edge
        # table is the shared input of the whole SemDeDup family
        # (dedup_embedding, both CC flavors, keep-best) — a batch
        # session materializes it once, exactly as a production run
        # writes the edge table before clustering.  Default threshold
        # only: a custom threshold is a different edge set.
        cached = _CENT_CACHE.get(_cent_cache_key(emb) + ("edges",))
        if cached is not None:
            return cached
    vecs = (docs.join(emb, docs.doc_id == emb.vec_id)
            .select("vec_id", "embedding"))
    celled = assign_cells(emb, vecs)
    a = celled.select(F.col("vec_id").alias("keep_id"),
                      F.col("embedding").alias("va"), "cell")
    b = celled.select(F.col("vec_id").alias("dup_id"),
                      F.col("embedding").alias("vb"), "cell")
    # pairwise scoring is the family's hot loop (Σ|cell|² pairs) —
    # Arrow-vectorized but BIT-EXACT vs round(cosine(a,b), 6), so the
    # whole family's DuckDB oracles are untouched
    pcos6 = pairwise_cosine_exact_udf()
    return (
        a.join(b, ["cell"])
        .where(F.col("keep_id") < F.col("dup_id"))
        .select("keep_id", "dup_id",
                pcos6("va", "vb").alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def warm_edges_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-in materialization of the SemDeDup candidate-edge table
    (default threshold) — the dedup-family analogue of
    tables.warm_users_cache: four registry queries re-derive the
    within-cell cosine join otherwise; a batch consumer (bench, a real
    dedup run) pays it once.  Keyed and evicted through similarity's
    _CENT_CACHE, inheriting its application-lifetime contract.  The
    edge table is tiny (pairs over SIM_THRESHOLD), so the eager
    localCheckpoint is one small job."""
    from .similarity import _CENT_CACHE, _cent_cache_key, _cent_cache_put

    emb = load(spark, sf_dir, "embeddings")
    key = _cent_cache_key(emb) + ("edges",)
    if key not in _CENT_CACHE:
        _cent_cache_put(
            key, _embedding_pair_edges(spark, sf_dir)
            .localCheckpoint(eager=True))
    return _CENT_CACHE[key]


def _dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT D3: embedding-cosine near-dup (SemDeDup-style semantic
    dedup) — the embedding-space member of the dedup family.  A
    document is a duplicate of the lowest-id earlier document whose
    embedding cosine-similarity (rounded to 6dp, so both engines
    threshold the identical value) reaches SIM_THRESHOLD; emits each
    removed doc with its kept antecedent and the similarity, best
    (highest-cosine, then lowest keep id) antecedent per dup.

    Candidate pairs come from the deterministic coarse-quantizer
    cells (see _embedding_pair_edges) — the SemDeDup cluster-then-
    pairwise structure, an equi-join on cell with no cartesian, which
    is the same plan shape a 1000-executor run would use (swap the
    stride quantizer for trained k-means centroids; the dedup decision
    below never changes)."""
    from pyspark.sql import Window

    pairs = _embedding_pair_edges(spark, sf_dir)
    w = Window.partitionBy("dup_id").orderBy(
        F.col("cos_sim").desc(), F.col("keep_id").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("dup_id", F.col("keep_id").alias("dup_of"), "cos_sim")
    )


def _dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r11 debut): SemDeDup with the paper's OWN survivor policy —
    keep the member CLOSEST TO ITS CELL CENTROID (Abbas et al. 2023
    §3: "we keep the example with the lowest cosine distance to the
    cluster centroid"), where `dedup_embedding` keeps the lowest id.
    The two policies differ materially: centroid-nearest keeps the
    most REPRESENTATIVE member of each duplicate neighborhood, which
    is what you want feeding a training mix; lowest-id keeps the
    earliest-crawled.  Emitted as the full kept/pruned verdict table —
    (vec_id, cell, cent_cos, kept) — one row per corpus vector, so a
    downstream job applies the dedup as one semi-join.

    Decision rule, fully deterministic: for every within-cell pair at
    cosine >= SIM_THRESHOLD (the shared _embedding_pair_edges
    candidate set — SemDeDup's cluster-then-pairwise structure, no
    cartesian anywhere), the member with the LOWER 6dp cosine to the
    cell centroid is pruned; on an exact tie the higher vec_id is
    pruned.  A vector survives iff no pair prunes it, so the verdict
    is independent of evaluation order.

    Pruning is deliberately TRANSITIVE (r11 advice, documented): a
    vector can be pruned by a neighbor that is itself pruned — in a
    chain a–b–c with rising cent_cos, both a and b are pruned even
    when a and c are not directly similar — so a pruned member is not
    guaranteed a SURVIVING similar neighbor, only a similar neighbor
    closer to the centroid.  This is one-pass-stricter than a
    keep-one-per-connected-group reading of the paper (that policy is
    `dedup_clusters` + `dedup_keep_best`); the survivor set here is
    exactly the pairwise-undominated members, which is what "prune
    the farther of every similar pair" means executed as a set rule.
    The oracle mirrors the rule verbatim, so parity is unaffected.

    100 TB shape: cell assignment is assign_cells' map-side
    model-parameter pass (zero shuffle); cent_cos is one broadcast
    join against the K <= IVF_K_MAX centroid rows; candidate scoring
    is the family's bounded within-cell equi-join (Σ|cell|² pairs,
    the quantizer's tuning knob); the loser set is a distinct over
    above-threshold pairs — tiny — and the final verdict a left join
    of ids.  Nothing scales super-linearly in the corpus."""
    from .similarity import (_ivf_stride_for, assign_cells, cosine)

    docs = load(spark, sf_dir, "documents").select("doc_id")
    emb = load(spark, sf_dir, "embeddings")
    vecs = (docs.join(emb, docs.doc_id == emb.vec_id)
            .select("vec_id", "embedding"))
    celled = assign_cells(emb, vecs)
    # embedding IS NOT NULL: the same exclusion the oracle's cents CTE
    # and assign_cells' seeding apply — without it the invariant that
    # no vector lands in a NULL-vec cell is re-established two modules
    # away instead of locally (r11 review finding)
    cents = (emb.where((F.col("vec_id") % _ivf_stride_for(emb) == 0)
                       & F.col("embedding").isNotNull())
             .select(F.col("vec_id").alias("cell"),
                     F.col("embedding").alias("c_vec")))
    # r13 OPT (guide §1.2): members feeds the keep-side join, the
    # dup-side join AND the final verdict left-join — unmaterialized,
    # the assign_cells Arrow pass + centroid-cosine ran 3× (34 parquet
    # scans in the before-plan).  |corpus| rows of (ids, double).
    # LAZY (r14: eager's barrier re-measured no faster warm-cache).
    members = (celled.join(F.broadcast(cents), "cell")
               .select("vec_id", "cell",
                       F.round(cosine("embedding", "c_vec"), 6)
                       .alias("cent_cos"))
               .localCheckpoint(eager=False))
    pairs = _embedding_pair_edges(spark, sf_dir)
    scored = (pairs
              .join(members.select(F.col("vec_id").alias("keep_id"),
                                   F.col("cent_cos").alias("cc_a")),
                    "keep_id")
              .join(members.select(F.col("vec_id").alias("dup_id"),
                                   F.col("cent_cos").alias("cc_b")),
                    "dup_id"))
    losers = (scored.select(
        F.when(F.col("cc_a") < F.col("cc_b"), F.col("keep_id"))
         .otherwise(F.col("dup_id")).alias("vec_id"))
        .distinct()
        .withColumn("pruned", F.lit(1)))
    return (members.join(losers, "vec_id", "left")
            .select("vec_id", "cell", "cent_cos",
                    F.when(F.col("pruned").isNotNull(), 0)
                     .otherwise(1).alias("kept"))
            .orderBy("vec_id"))


CC_MAX_ITERS = 20  # safety bound; min-label propagation converges in
#                    O(component diameter) rounds — planted near-dup
#                    clusters are tiny, real corpora's dup clusters too.


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT D3: duplicate CLUSTERS via connected components — the real
    dedup decision at corpus scale, where near-dup is transitive in
    practice (A≈B, B≈C ⇒ keep one of {A,B,C}).  Pairwise keep-lowest-id
    (dedup_embedding) under-removes on chains; clustering is what
    production pipelines run on the candidate-pair graph.

    Implementation: iterative min-label propagation as pure DataFrame
    ops — each round joins current labels onto the (undirected) edge
    list, takes min(neighbor label, own label) per node, and stops at
    fixpoint (distributed count of changed labels; bounded by
    CC_MAX_ITERS).  localCheckpoint per round cuts the growing lineage
    — the classic iterative-algorithm footgun on Spark.  At 100 TB
    you'd switch to the large-star/small-star formulation (same
    join+agg primitives, provably O(log n) rounds) and checkpoint to
    object storage; the loop shape is identical.

    Output: every doc belonging to a >1-member cluster, its cluster id
    (= min doc_id reachable) and the cluster size.  Full oracle: DuckDB
    recursive-CTE transitive closure over the same 6dp-rounded edges.
    """
    edges = (_embedding_pair_edges(spark, sf_dir)
             .select(F.col("keep_id").alias("src"),
                     F.col("dup_id").alias("dst")))
    # undirected: propagate labels both ways
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    # r13 OPT: seed labels with min(self, min neighbor) in ONE
    # aggregation over sym instead of identity labels — this IS the
    # first propagation round, computed without the per-round
    # join+agg+join chain (the identity seed spent a full round
    # discovering it).  Same fixpoint: min-label propagation is
    # monotone and label(u) starts at min(N(u) ∪ {u}) ≥ the component
    # min, so the converged labels — and the emitted clusters — are
    # unchanged; planted diameter-≈2 clusters now converge in 1-2
    # loop rounds instead of 2-3.
    labels = (sym.groupBy(F.col("src").alias("node"))
              .agg(F.min("dst").alias("m"))
              .select("node", F.least("node", "m").alias("label"))
              .localCheckpoint(eager=True))
    for _ in range(CC_MAX_ITERS):
        neigh_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # fold the convergence signal into the label frame itself
        # (round 2 paid a second join+count job per round), and — r14
        # — fold the MATERIALIZATION into the probe too: the
        # checkpoint is LAZY and the full count("changed") below is
        # the action that computes-and-persists every partition, so
        # each round runs ONE Spark job instead of a
        # materialize-then-probe pair.  (A limit(1) probe would no
        # longer do: it could stop short of computing — and therefore
        # persisting — every partition of the lazy checkpoint.)
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nlabel", "label"))
                 .alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label"))
                 .alias("changed"))
        ).localCheckpoint(eager=False)
        changed = new_labels.where("changed").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        # ADVICE r3: exhausting the cap without a fixpoint means some
        # component is deeper than CC_MAX_ITERS — labels are only
        # partially converged.  Loud, not silent: the oracle would be
        # the only other thing to catch it.
        warnings.warn(
            f"_dedup_clusters hit CC_MAX_ITERS={CC_MAX_ITERS} without "
            "converging; emitted clusters may be under-merged "
            "(component diameter exceeds the iteration cap)",
            RuntimeWarning, stacklevel=2)

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .where(F.col("cluster_size") > 1)
        .select(F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_id"),
                "cluster_size")
    )


def _dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT D3 (scale flavor): the SAME duplicate-cluster output as
    dedup_clusters, computed with alternating large-star/small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — provably O(log n) rounds on any graph, vs min-label
    propagation's O(diameter).  dedup_clusters' docstring has named
    this as the 100 TB form since round 2; this IS that form, checked
    against the identical recursive-CTE oracle.

    Crossover note (measured, sf0.1): label propagation wins on THIS
    corpus (~5s vs ~7s) because planted dup clusters have diameter ≈ 2
    — propagation converges in 2-3 rounds and each star iteration runs
    two groupBy+distinct passes.  The star form wins when components
    are deep (chain-of-near-dups, crawl-mirror graphs): rounds grow
    O(log n) instead of O(diameter).  Both are benched side by side so
    the trade is data, not folklore.

    Per round (pure join-free groupBy/agg + explode — no join at all
    inside a star operation):
      large-star: for every node u, attach each neighbor v > u to
        m(u) = min(N(u) ∪ {u});
      small-star: attach each neighbor v <= u (and u itself) to m(u).
    Edges live as (src, dst) rows; each star is one groupBy(src) with
    min + collect_set, then an explode — shuffle keyed on node id,
    record width constant.  Fixpoint detection: (count,
    bit_xor(xxhash64(src, dst))) signature of the canonicalized edge
    set (xor, not sum: xxhash64 spans the full long range and an
    ANSI-mode sum overflows) —
    one cheap agg action per round over a localCheckpoint'ed frame
    (collision odds ~2^-64; a false convergence would be caught by the
    oracle hash-match).  At 100 TB: replace localCheckpoint with
    storage checkpoints; the loop shape is unchanged.
    """
    # checkpoint the pair computation ONCE: nodes, the loop seed and
    # (via the loop) every round all read this materialization — an
    # un-checkpointed `pairs` would re-run the within-cell cosine join
    # for each derived frame
    pairs = (_embedding_pair_edges(spark, sf_dir)
             .select(F.col("keep_id").alias("src"),
                     F.col("dup_id").alias("dst"))
             .localCheckpoint(eager=True))
    nodes = (pairs.select(F.col("src").alias("node"))
             .union(pairs.select(F.col("dst").alias("node")))
             .distinct())

    def star(edges: DataFrame, large: bool) -> DataFrame:
        # symmetric neighborhood view, self-edges dropped
        sym = (edges.union(edges.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
               .where(F.col("src") != F.col("dst")))
        grouped = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.col("src")).alias("m"),
            F.collect_set("dst").alias("nbrs"))
        keep = (lambda v: v > F.col("src")) if large \
            else (lambda v: v <= F.col("src"))
        arr = F.filter("nbrs", keep)
        if not large:
            # small-star also re-links u itself to the min
            arr = F.array_union(arr, F.array(F.col("src")))
        out = grouped.select(F.explode(arr).alias("v"), F.col("m"))
        out = (out.where(F.col("v") != F.col("m"))
               .select(F.col("v").alias("src"), F.col("m").alias("dst")))
        # dedup only after the small star (once per iteration): the
        # large star's duplicate emissions collapse inside the next
        # groupBy/collect_set anyway, and the signature check needs a
        # canonical set only at iteration boundaries — this drops one
        # shuffle per round
        return out if large else out.distinct()

    edges = pairs
    prev_sig = None
    for _ in range(CC_MAX_ITERS):
        # LAZY checkpoint: the signature agg below is the action that
        # materializes it, so each round runs ONE job, not a
        # materialize-then-scan pair
        edges = star(star(edges, large=True), large=False) \
            .localCheckpoint(eager=False)
        # bit_xor, not sum: xxhash64 values span the full long range
        # and an ANSI-mode sum overflows; xor is order-independent and
        # safe on the distinct()-ed edge set (no duplicate rows to
        # self-cancel)
        sig = tuple(edges.agg(
            F.count("*"),
            F.expr("bit_xor(xxhash64(src, dst))")).first())
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        warnings.warn(
            f"_dedup_clusters_star hit CC_MAX_ITERS={CC_MAX_ITERS} "
            "without the edge-set signature reaching a fixpoint; "
            "emitted clusters may be under-merged",
            RuntimeWarning, stacklevel=2)

    # converged star graph: every non-root points at its component min
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("cluster_id"))
    roots = (nodes.join(labels, "node", "left_anti")
             .select("node", F.col("node").alias("cluster_id")))
    all_labels = labels.union(roots)
    sizes = all_labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (
        all_labels.join(sizes, "cluster_id")
        .where(F.col("cluster_size") > 1)
        .select(F.col("node").alias("doc_id"), "cluster_id",
                "cluster_size")
    )


# Decontamination parameters: gram width (long grams ≈ verbatim
# overlap, the standard benchmark-contamination signal) and the
# reported-overlap floor.
DECON_N = 5
DECON_MIN_OVERLAP = 0.10


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: benchmark decontamination — the pass every LLM training-
    data pipeline runs before training: find training documents that
    contain verbatim n-gram overlap with a held-out benchmark/eval set,
    so they can be dropped (test-set leakage).  Here the benchmark
    split is doc_id % 10 == 0 and the train split is the rest; overlap
    is the fraction of a benchmark doc's distinct word-5-grams that
    appear in a given training doc.

    100 TB shape: the benchmark side is SMALL at any corpus scale
    (eval suites are MBs) → its gram index is broadcast, so the
    train-corpus gram stream is scanned map-side with NO shuffle of
    the corpus; the only shuffle is the partial-aggregated
    (train_doc, bench_doc) pair counts, bounded by actual collisions.
    Skew is bounded too: a hot gram contributes at most
    (its benchmark df) rows per train occurrence, and benchmark df is
    capped by the tiny benchmark corpus."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the 5-gram stream feeds the benchmark
    # index (twice: sizes + the broadcast join side) and the train
    # side — one EAGER materialization instead of three
    # scan→gram-explode derivations.
    grams = toks.select(
        "doc_id",
        F.explode(_gram_array("ws", DECON_N)).alias("gram"),
    ).localCheckpoint(eager=True)
    bench = grams.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_doc"), "gram")
    train = grams.where(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_doc"), "gram")
    bench_sizes = bench.groupBy("bench_doc").agg(
        F.count("*").alias("bench_grams"))
    shared = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(bench_sizes), "bench_doc")
        .select(
            "train_doc", "bench_doc", "n_shared", "bench_grams",
            F.round(F.col("n_shared") / F.col("bench_grams"), 4)
             .alias("overlap"),
        )
        .where(F.col("overlap") >= DECON_MIN_OVERLAP)
        .orderBy("train_doc", "bench_doc")
    )


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT D3 policy layer: given the duplicate clusters, keep the
    HIGHEST-QUALITY member (longest text, ties to lowest doc_id) and
    drop the rest — the policy production dedup actually applies
    (keep-lowest-id is a determinism convention, not a data decision:
    the canonical crawl of a page usually isn't its first-seen copy).
    One row per cluster: the survivor, the member count, and the chars
    reclaimed by dropping the rest.

    Plan: cluster labels (min-label propagation) joined to the narrow
    (doc_id, n_chars) projection, one window argmax per cluster —
    adds a single label-keyed shuffle over rows ALREADY bounded by
    cluster membership (never the corpus)."""
    from pyspark.sql import Window

    clusters = _dedup_clusters(spark, sf_dir)
    quality = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    members = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        members.withColumn("rn", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
             .alias("keep_doc"),
            F.count("*").alias("cluster_size"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars"))
                  .otherwise(F.lit(0))).alias("chars_dropped"),
        )
    )


def _decontaminate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: the decontamination pass applied — the clean training
    corpus after dropping every train doc flagged by _decontaminate
    (any benchmark 5-gram overlap >= the floor).  The flagged set is
    bounded by bench collisions (tiny at any corpus scale), so it
    broadcasts and the anti-join is map-side: the training corpus is
    scanned once and never shuffled; the only shuffle carries the
    per-source rollup states."""
    docs = load(spark, sf_dir, "documents")
    flagged = (_decontaminate(spark, sf_dir)
               .select(F.col("train_doc").alias("doc_id")).distinct())
    return (
        docs.where(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(flagged), "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("clean_docs"),
             F.sum("n_chars").alias("clean_chars"))
    )


TRIANGLE_THRESHOLD = 0.25  # affinity-graph cosine cutoff (see below)


def _graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (registered for the round-5 window): triangle enumeration
    over the SemDeDup candidate-edge graph — the standard graph-mining
    primitive (clustering coefficient, dense-dup-blob detection: a
    near-dup CLUSTER whose members are all pairwise-similar is a
    mirror farm; a sparse chain is drift).

    Implementation: the id-ordered two-path + closing-edge join.
    Edges arrive oriented low->high (keep_id < dup_id), so each
    triangle a<b<c is found exactly once as (a,b)+(b,c) closed by
    (a,c) — no symmetry factor, no post-dedup.  At 100 TB you'd orient
    edges by DEGREE instead of id (bounds two-path fan-out by the
    squared degrees of low-degree endpoints — the classic MapReduce
    triangle trick); id-orientation keeps the oracle exact here and
    the join shape is identical.

    Scale: two shuffles (join on b, join on (a, c)) over the EDGE
    list — corpus embeddings never re-shuffle; the edge list is the
    SemDeDup candidate output, already Σ|cell|²-bounded, and is
    checkpointed once to feed all three join sides.

    Threshold: the AFFINITY graph (0.25) is deliberately denser than
    the dedup cutoff (0.4) — at the dedup threshold the fixture graph
    is triangle-free (components are pairs/stars), which is exactly
    why clustering-coefficient analysis runs on a softer graph."""
    edges = (_embedding_pair_edges(spark, sf_dir,
                                   threshold=TRIANGLE_THRESHOLD)
             .select("keep_id", "dup_id").localCheckpoint(eager=True))
    e1 = edges.select(F.col("keep_id").alias("a"),
                      F.col("dup_id").alias("b"))
    e2 = edges.select(F.col("keep_id").alias("b"),
                      F.col("dup_id").alias("c"))
    e3 = edges.select(F.col("keep_id").alias("a"),
                      F.col("dup_id").alias("c"))
    return (e1.join(e2, "b").join(e3, ["a", "c"])
            .select("a", "b", "c").orderBy("a", "b", "c"))


PR_ITERS = 5
PR_UNIT = 1_000_000          # integer mass units per node
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as a ratio


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """EXT: PageRank over an undirected edge list in INTEGER
    arithmetic — each node starts with PR_UNIT mass; per round every
    node keeps 15% of a unit as base and receives
    (neighbor_mass * 85 // 100) // degree from each neighbor (floor
    division; remainders evaporate deterministically).  Integer sums
    are order-independent, so the result is bit-identical under any
    partitioning or aggregation order — the same engine-invariance
    trick as lm_score's micro-nat sums, applied to an iterative graph
    algorithm (float PageRank differs in the last ulps between
    engines and run-to-run; this one never does, and the differential
    test replays it in plain Python).

    Scale: per round ONE join (mass onto edges, keyed on node id) and
    one groupBy — the textbook distributed PageRank; localCheckpoint
    per round for lineage (storage checkpoints at 100 TB).  Degrees
    are computed once and cached with the symmetric edge list."""
    sym = (edges.union(edges.select(
               F.col("dst").alias("src"), F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree"))
    mass = deg.select("node", F.lit(PR_UNIT).cast("bigint").alias("mass"),
                      "degree").localCheckpoint(eager=True)
    base = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    for _ in range(iters):
        contrib = (sym.join(mass, sym.src == mass.node)
                   .select(F.col("dst").alias("node"),
                           # integer `div`, not `/`: float division
                           # would reintroduce the engine-dependent
                           # rounding this design exists to avoid
                           F.expr(f"(mass * {PR_DAMP_NUM}) "
                                  f"div {PR_DAMP_DEN} div degree")
                           .alias("c")))
        mass = (deg.join(
                    contrib.groupBy("node").agg(F.sum("c").alias("rec")),
                    "node", "left")
                .select("node",
                        (F.lit(base)
                         + F.coalesce("rec", F.lit(0))).alias("mass"),
                        "degree")
                .localCheckpoint(eager=True))
    return mass.select("node", "mass")


def _graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: PageRank over the SemDeDup affinity graph (same 0.25-cosine
    edge set as graph_triangles) — node centrality inside near-dup
    neighborhoods ranks the 'canonical' member of a mirror farm.

    Fully oracle-checked DESPITE being iterative: the integer-mass
    formulation (see ``pagerank``) makes every round an exact integer
    recurrence, and the iteration count is a fixed constant
    (PR_ITERS), so the DuckDB oracle simply UNROLLS the five rounds as
    chained CTEs — bit-identical to the Spark loop under any
    partitioning.  This is the pattern that turns 'iterative algos
    are rows-only by nature' into a hash-tier check whenever the
    iteration count is a spec constant."""
    edges = (_embedding_pair_edges(spark, sf_dir,
                                   threshold=TRIANGLE_THRESHOLD)
             .select(F.col("keep_id").alias("src"),
                     F.col("dup_id").alias("dst")))
    return pagerank(edges)


BFS_MAX_HOPS = 8  # shared hop bound: Spark loop cap == oracle's
#                   recursion guard, so both sides compute exactly
#                   "min hops within 8" (diameter here is ~2-3; the
#                   loop exits early on an empty frontier)


def _graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: multi-source BFS — hop distance from a seed set over the
    SemDeDup affinity graph (same 0.25-cosine edges as
    graph_triangles/pagerank).  The training-data reading: seeds are
    the labeled/curated docs, and distance-to-seed grades the rest of
    the corpus by affinity-graph proximity (label propagation's
    skeleton).

    Iterative frontier expansion, the textbook distributed BFS: each
    round joins the CURRENT frontier (not the settled set) to the
    edge list, anti-joins already-settled nodes, and unions the new
    hop in — per-round work ∝ frontier × degree, the same join+agg
    round shape as `dedup_clusters`, with localCheckpoint cutting the
    growing lineage and an early exit when the frontier empties.
    Unreachable-within-BFS_MAX_HOPS nodes are excluded on BOTH sides
    by the shared bound, which is also what makes the recursive-CTE
    oracle terminate on this CYCLIC graph (UNION-distinct alone
    cannot: (node, dist) pairs keep growing around a cycle).  A
    cross-PARADIGM differential check, like chain_rcte: iterative
    DataFrame algorithm vs bounded recursive CTE + min()."""
    edges = (_embedding_pair_edges(spark, sf_dir,
                                   threshold=TRIANGLE_THRESHOLD)
             .select(F.col("keep_id").alias("src"),
                     F.col("dup_id").alias("dst")))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    seeds = (sym.select(F.col("src").alias("node")).distinct()
             .where(F.col("node") % 100 == 0))
    dist = (seeds.select("node", F.lit(0).alias("dist"))
            .localCheckpoint(eager=True))
    frontier = dist.select("node")
    for hop in range(1, BFS_MAX_HOPS + 1):
        # r14: lazy checkpoints + a count() probe fold each hop's
        # materialize-then-probe job pair into ONE job; the union
        # frame persists inside the next hop's first consuming job
        # (both union inputs are already-persisted RDDs).
        nxt = (frontier.join(sym, frontier["node"] == sym["src"])
               .select(F.col("dst").alias("node")).distinct()
               .join(dist, "node", "left_anti")
               .select("node", F.lit(hop).alias("dist"))
               .localCheckpoint(eager=False))
        if nxt.count() == 0:
            break
        dist = dist.union(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return dist


# -- bloom-filter incremental dedup ----------------------------------
#
# The 100 TB motivation: checking a new crawl batch against an
# existing corpus with an anti-join shuffles the CORPUS on the join
# key every ingest.  A bloom filter compresses the corpus's content
# hashes into a fixed bit array built with ONE aggregation pass; each
# batch then probes the broadcast array map-side — the corpus is
# never re-read, never re-shuffled.  Here the filter is expressed
# RELATIONALLY: the bit array is the distinct set of hash positions
# (≤ BLOOM_M rows — a broadcast-sized table no matter how large the
# corpus), membership = "all K positions present", via a left join +
# min().  No UDF, no driver state, and — because positions come from
# sha256, a public cross-engine hash — a full DuckDB oracle, false
# positives and all (both engines compute the IDENTICAL filter, so
# fp counts match exactly).
#
# Sizing: BLOOM_M=65536 positions / K=5 probes keeps the fill factor
# < 0.3 at sf0.1 (≈4k docs) for a sub-0.2% fp rate; production sizing
# is m ≈ 10 bits per corpus item (the helper takes m and k as
# arguments — the registered constants are fixture-scale).
BLOOM_M = 65536          # position domain (bits)
BLOOM_K = 5              # hash probes per item
BLOOM_EXISTING_HI = 80   # corpus = sha-bucket 0..79 (80%)
BLOOM_BATCH_LO = 70      # re-crawl batch = bucket 70..99 (30%):
#                          the 70..79 overlap is the planted truth —
#                          re-crawled shards genuinely re-contain docs


def _sha_bucket(col, mod: int):
    """sha256-derived bucket in [0, mod) — the engine-invariant
    split/sample idiom shared with split_assign and sample_hash."""
    return F.pmod(
        F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8),
               16, 10).cast("long"),
        F.lit(mod))


def bloom_positions(text_col, m: int = BLOOM_M, k: int = BLOOM_K):
    """Array of k sha256-derived positions in [0, m) for one item —
    k independent draws via seed-suffixed hashing."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(
            F.conv(F.substring(
                F.sha2(F.concat(text_col, F.lit("|"),
                                i.cast("string")), 256), 1, 8),
                16, 10).cast("long"),
            F.lit(m)))


def bloom_flags(existing: DataFrame, batch: DataFrame,
                m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Per-batch-row bloom membership: batch columns + ``all_hit``
    (1 iff every probe position is set in the existing-side filter).
    ``existing``/``batch`` need a ``text`` column."""
    bloom = (existing
             .select(F.explode(bloom_positions(F.col("text"), m, k))
                     .alias("pos"))
             .distinct()
             .withColumn("hit", F.lit(1)))
    probes = batch.select(
        "*", F.explode(bloom_positions(F.col("text"), m, k)).alias("pos"))
    # group keys exclude the text payload — the post-probe shuffle
    # carries ids + positions, not document bodies
    keys = [c for c in batch.columns if c != "text"]
    return (probes.join(F.broadcast(bloom), "pos", "left")
            .groupBy(*keys)
            .agg(F.min(F.coalesce("hit", F.lit(0))).alias("all_hit")))


def _dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: incremental-batch dedup via a relational bloom filter —
    flag re-crawled docs already in the corpus without ever shuffling
    the corpus (see module comment above for the construction).  The
    single-row audit output reports the filter's confusion counts;
    ``n_missed`` is structurally 0 (bloom filters have no false
    negatives) and the oracle + pytest pin that."""
    # NULL text carries nothing to fingerprint — excluded on both
    # sides (a NULL reaching the position hash NULLed every Spark
    # position while DuckDB's concat() SKIPPED the NULL into an
    # unparseable '0x' literal; r11 all-NULL sweep)
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    b = docs.select("doc_id", "text",
                    _sha_bucket(F.col("doc_id"), 100).alias("bucket"))
    existing = b.where(F.col("bucket") < BLOOM_EXISTING_HI)
    batch = b.where(F.col("bucket") >= BLOOM_BATCH_LO) \
             .select("doc_id", "bucket", "text")
    flags = bloom_flags(existing, batch)
    n_exist = existing.agg(F.count("*").alias("n_existing"))
    truth = F.col("bucket") < BLOOM_EXISTING_HI
    flagged = F.col("all_hit") == 1
    counts = flags.agg(
        F.count("*").alias("n_batch"),
        F.sum(flagged.cast("bigint")).alias("n_flagged"),
        F.sum(truth.cast("bigint")).alias("n_true_dup"),
        F.sum((flagged & ~truth).cast("bigint")).alias("n_false_pos"),
        F.sum((~flagged & truth).cast("bigint")).alias("n_missed"),
    )
    return (counts.crossJoin(F.broadcast(n_exist))
            .select("n_existing", "n_batch", "n_flagged",
                    "n_true_dup", "n_false_pos", "n_missed"))


def _ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r7 debut): per-document n-gram novelty — the fraction of a
    doc's distinct word-3-grams whose FIRST corpus occurrence (min
    doc_id over the whole corpus) is this doc.  The curation signal
    between exact dedup and near-dup: a scraped page that is 90%
    boilerplate scores near 0 without needing any pairwise comparison,
    and an incremental crawl can rank each batch by how much genuinely
    new text it contributes.

    Unlike the jaccard/containment family this needs NO hot-gram
    pruning: the per-gram reduce is an aggregation (min + count), so a
    stopword-gram shared by k docs costs k partial-agg rows and k join
    rows — linear, never the k² a candidate self-join pays.  The gram
    universe therefore stays complete (true novelty, no df-threshold
    parameter).

    All outputs exact: counts are BIGINTs, the single ratio rounds
    half-up in pure integer space (round4_ratio, zero-gram docs are
    absent by construction — a <3-token doc has no grams).

    Scale: text collapses to distinct (gram, doc_id) pairs map-side
    (_gram_array is per-doc distinct); ONE hash exchange on gram feeds
    both the min-reduce and the join back (same key → Catalyst reuses
    the partitioning); the per-doc agg shuffles one row per pair.
    Document text never crosses an exchange."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the gram stream feeds the first-occurrence
    # table AND the join-back — one LAZY materialization (r14:
    # eager's barrier re-measured no faster warm-cache; the gram
    # stream is occurrence-grain) instead of re-running the
    # scan→gram-explode chain twice (8 parquet scans before).
    grams = toks.select(
        "doc_id", F.explode(_gram_array("ws", 3)).alias("gram")
        ).localCheckpoint(eager=False)
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum((F.col("doc_id") == F.col("first_doc"))
                   .cast("long")).alias("n_novel"))
        .select("doc_id", "n_grams", "n_novel",
                round4_ratio(F.col("n_novel"), F.col("n_grams"))
                .alias("novelty"))
        .orderBy("doc_id")
    )


#: deterministic MinHash-LSH geometry: K = B·R signature slots, sha-
#: derived hash family h_i(g) = int64(sha256(i ':' g)[:8 hex]) — the
#: PUBLIC hash both engines bit-agree on, which is what turns MinHash
#: LSH from a rows-only op (Spark ML's engine-local permutations,
#: `dedup_near`) into a FULL-oracle one: signatures, band buckets,
#: candidates and verified pairs are all engine-identical by
#: construction.
MINHASH_B = 4   # bands
MINHASH_R = 3   # rows (signature slots) per band
MINHASH_K = MINHASH_B * MINHASH_R


def _minhash_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): MinHash-LSH near-dup self-join AS SPEC — the
    whole banding pipeline (signature → band buckets → candidate
    pairs → exact-Jaccard verify at PREFIX_JACCARD_T) is
    deterministic and oracle-checked end to end, including its
    recall misses: the driver compare certifies the exact LSH
    pipeline, not just 'some plausible near-dups'.  Companion to
    `join_prefix_filter` (same threshold, same verify arithmetic):
    the prefix join is EXACT (theorem-complete candidates), this is
    the sub-linear probabilistic recipe you run when even the
    prefix-join's candidate volume is too hot; emitted pairs are a
    subset of the prefix join's by construction (pinned in
    tests/test_properties.py), with band-collision recall
    1 − (1 − J^R)^B.

    100 TB shape: signatures reduce map-side (min per slot — K
    BIGINTs per doc, mergeable agg state); banding explodes each doc
    to B bucket keys (linear); candidates come from bucket-equality
    joins, fan-out bounded per bucket by collision count (tune B·R
    to cap it — the standard LSH lever); the verify joins touch
    candidates × gram arrays only.  No stage scales with doc-pairs.

    Exactness: min over int64 sha slots is order-free; band keys are
    string concat of exact ints; verify counts distinct shared grams
    on the GRAM STREAM (join-count — identical to array_intersect on
    the distinct arrays, and the same shape the oracle uses) with
    round4_ratio Jaccard.

    Plan note: the gram stream comes from a DIRECT generator explode
    (`explode(_gram_array(...))` fused into the scan) — materializing
    the array column, size-filtering, then exploding re-evaluates the
    array-build chain per reference and blocks generator fusion,
    measured 20× slower at sf0.1 (0.7 s → 14.5 s for the identical
    260k-row stream).  Zero-gram docs vanish from the stream
    naturally, so the explicit size filter bought nothing."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the gram stream feeds the signature agg
    # AND both sides of the verify join — unmaterialized, the
    # scan→split→gram-explode chain ran 3× (12 parquet scans in the
    # before-plan).  LAZY checkpoint, on purpose: the verify self-join
    # sides are concurrent, where an eager barrier was measured slower
    # (the r13 simhash_join finding); lazy folds the single
    # materialization into the first consuming job.
    grams = toks.select("doc_id",
                        F.explode(_gram_array("ws", 3)).alias("gram")
                        ).localCheckpoint(eager=False)

    def slot(i):
        return F.min(
            F.conv(F.substring(
                F.sha2(F.concat(F.lit(f"{i}:"), F.col("gram")), 256),
                1, 8), 16, 10).cast("long")).alias(f"s{i}")

    sig = grams.groupBy("doc_id").agg(*[slot(i)
                                        for i in range(MINHASH_K)])
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(":", *[
                    F.col(f"s{b * MINHASH_R + r}").cast("string")
                    for r in range(MINHASH_R)]).alias("key"))
            for b in range(MINHASH_B)])).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.key") == F.col("b.key"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    return (_verify_gram_pairs(grams, cand)
            .orderBy("doc_a", "doc_b"))


def _source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r8 debut): pairwise corpus-overlap matrix — for every
    source pair, the Jaccard and both containments of their DISTINCT
    word-3-gram sets.  The dedup-PLANNING query: before spending a
    cross-corpus near-dup pass, this matrix says which source pairs
    actually share text (mirror sites, syndication, scraped copies)
    and in which direction the containment runs — decontaminate asks
    'is the benchmark in the training set', this asks the same of
    every source against every other, symmetrically.

    100 TB shape: the (source, gram) distinct reduce is LINEAR in the
    gram stream (one partial-agg'd shuffle); the overlap self-join
    keys on gram with per-gram fan-out structurally bounded by
    |sources|² (a gram shared by every source still yields ≤
    |sources|² pairs — nothing scales with doc count); the result and
    every later join are |sources|²-row model-sized tables.  Compare
    join_prefix_filter, where candidates are doc-level and need the
    prefix theorem — source-level overlap needs no pruning at all.

    Exactness: distinct-gram counts are exact integers; Jaccard and
    containments are int ratios via round4_ratio (half-up in int64;
    engine round() diverges on exact decimal halves).  Pairs sharing
    zero grams are absent on both engines (inner-join semantics)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source",
                       F.split(F.lower("text"), WS_RUN).alias("ws"))
    # r13 OPT (guide §1.2): the distinct (source, gram) set feeds the
    # per-source sizes and BOTH sides of the overlap self-join —
    # unmaterialized, the scan→gram-explode→distinct chain ran 3× (8
    # parquet scans in the before-plan).  LAZY materialization
    # (r14: −7% vs eager in the warm-cache bench regime).
    dg = (toks.select("source",
                      F.explode(_gram_array("ws", 3)).alias("gram"))
          .distinct().localCheckpoint(eager=False))
    per_src = dg.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (dg.alias("a")
             .join(dg.alias("b"),
                   (F.col("a.gram") == F.col("b.gram"))
                   & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("src_a"),
                      F.col("b.source").alias("src_b"))
             .agg(F.count("*").alias("inter")))
    return (pairs
            .join(per_src.select(F.col("source").alias("src_a"),
                                 F.col("n").alias("na")), "src_a")
            .join(per_src.select(F.col("source").alias("src_b"),
                                 F.col("n").alias("nb")), "src_b")
            .select("src_a", "src_b", "na", "nb", "inter",
                    round4_ratio(
                        F.col("inter"),
                        F.col("na") + F.col("nb") - F.col("inter"))
                    .alias("jaccard"),
                    round4_ratio(F.col("inter"), F.col("na"))
                    .alias("containment_a"),
                    round4_ratio(F.col("inter"), F.col("nb"))
                    .alias("containment_b"))
            .orderBy("src_a", "src_b"))


#: novelty_delta's crawl-batch split: doc_id % 10 == 0 is the incoming
#: batch, the rest is the standing corpus — the SAME convention as
#: decontaminate's benchmark split, so the two queries read as one
#: story (what's contaminated, what's new) over one partition of the
#: corpus.
NOVELTY_BATCH_MOD = 10


def _novelty_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r9 debut): incremental-crawl novelty delta — for each doc
    in the incoming batch (doc_id % 10 == 0), the fraction of its
    distinct word-3-grams NEVER seen in the standing corpus (the
    other 90%).  `ngram_novelty` ranks docs inside one corpus by
    first-occurrence; this is its incremental sibling: the
    batch-over-corpus readout a recrawl pipeline uses to decide
    whether a fetch brought new text or re-downloaded the web it
    already has (refresh-policy signal, dedup-before-ingest gate).

    100 TB shape: the corpus side collapses to DISTINCT grams (the
    persisted gram index of an incremental pipeline — built once,
    reused every batch); the batch joins it on gram — declared as a
    plain equi-join, per-gram fan-out = #batch docs sharing the gram
    (a reduce input, never a pair explosion).  The join strategy is
    deliberately LEFT TO AQE: at fixture scale the distinct-gram
    index is tiny and AQE broadcasts it (PLANS_r09 shows
    BroadcastHashJoin); at corpus scale the index grows with the
    corpus and AQE falls back to the linear hash-shuffle join — no
    explicit broadcast() hint that would OOM at 100 TB.  The per-doc
    agg state is batch-sized.

    Exactness: BIGINT counts; the ratio is round4_ratio (half-up in
    int64).  Batch docs with <3 tokens have no grams and are absent
    on both engines."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), WS_RUN).alias("ws"))
    grams = toks.select(
        "doc_id", F.explode(_gram_array("ws", 3)).alias("gram"))
    corpus = (grams.where(F.col("doc_id") % NOVELTY_BATCH_MOD != 0)
              .select("gram").distinct()
              .withColumn("seen", F.lit(1)))
    batch = grams.where(F.col("doc_id") % NOVELTY_BATCH_MOD == 0)
    return (
        batch.join(corpus, "gram", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"),
             F.sum(F.col("seen").isNull().cast("long")).alias("n_new"))
        .select("doc_id", "n_grams", "n_new",
                round4_ratio(F.col("n_new"), F.col("n_grams"))
                .alias("novelty_delta"))
        .orderBy("doc_id"))


def _derived_pages(docs: DataFrame) -> DataFrame:
    """The ONE derived-URL canonicalization pipeline (doc_id, n_chars,
    source, text, domain, canon_url) behind `host_dedup` (r9),
    `mirror_detect` and `crawl_frontier` (r10) — mirrored by
    `_DUCK_PAGES_CTES`.  The documents table carries no URL column, so
    the page URL derives deterministically from (doc_id, source) with
    the three classic alias pathologies planted — www. prefixes
    (doc_id%3), uppercase hosts (doc_id%5), utm query strings
    (doc_id%4) — and doc_id%13 page slots per source, so every source
    has genuine same-canonical-URL collisions by pigeonhole at any
    fixture SF and any id layout.  Spark canonicalizes with the real
    `parse_url` (HOST/PATH); the oracle mirrors with regexes (exact
    for these generated URLs).  All map-side string work.

    The hostname fragment is SANITIZED to RFC-hostname characters
    before the URL is built (r12 string sweeps: a source value with
    spaces/unicode made parse_url throw INVALID_URL and killed the
    whole family) — exactly what a real URL deriver does with a junk
    shard label.  A source that sanitizes to EMPTY gets the 'unknown'
    placeholder label (r12 review: 'https://.example.org/...' is a
    host Spark's parse_url rejects to NULL while the oracle's regex
    would extract it — a placeholder keeps the two engines on one
    canonical URL and is what a crawler does with an unlabelable
    shard anyway)."""
    clean = F.regexp_replace("source", "[^A-Za-z0-9.-]", "")
    src_host = F.when(clean == "", F.lit("unknown")).otherwise(clean)
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
         .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.upper(src_host))
         .otherwise(src_host),
        F.lit(".example.org/page-"),
        (F.col("doc_id") % 13).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=feed"))
         .otherwise(F.lit("")))
    pages = docs.select("doc_id", "n_chars", "source", "text",
                        url.alias("url"))
    host = F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    domain = F.regexp_replace(host, r"^www\.", "")
    canon = F.concat(domain, F.parse_url(F.col("url"), F.lit("PATH")))
    return pages.select("doc_id", "n_chars", "source", "text",
                        domain.alias("domain"), canon.alias("canon_url"))


def _host_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r9 debut): URL canonicalization + host-level dedup with a
    per-domain rollup — the crawl-frontier hygiene pass that runs
    BEFORE any content dedup: strip tracking queries, drop the www.
    alias, lowercase the host, then keep one doc per canonical URL
    and report per-domain page/duplicate counts and surviving
    content volume.  The documents table carries no URL column, so
    the page URL is DERIVED deterministically from (doc_id, source,
    lang) with the three classic alias pathologies planted — www.
    prefixes (doc_id%3), uppercase hosts (doc_id%5), utm query
    strings (doc_id%4) — and doc_id%13 page slots per source, so
    every source has genuine same-canonical-URL collisions by
    pigeonhole at any fixture SF and any id layout.

    Spark side uses the real `parse_url` (HOST/PATH extraction, the
    F11 `scalar_url` machinery); the oracle mirrors it with regexes
    (DuckDB has no parse_url) — exact for these generated URLs.

    100 TB shape: canonicalization is map-side string work; the
    per-URL survivor pick is one hash agg keyed (domain, canon_url)
    — min_by with a SCALAR BIGINT ordering key (a struct key would
    fall back to SortAggregate, the r4 trap); the rollup reduces
    URL-grain rows to |domains|.  No joins at all."""
    per_url = (
        _derived_pages(load(spark, sf_dir, "documents"))
        .groupBy("domain", "canon_url")
        .agg(F.count("*").alias("copies"),
             F.min("doc_id").alias("kept_doc"),
             F.min_by("n_chars", "doc_id").alias("kept_chars")))
    return (
        per_url.groupBy("domain")
        .agg(F.sum("copies").cast("long").alias("pages"),
             F.count("*").cast("long").alias("unique_pages"),
             F.sum(F.col("copies") - 1).cast("long").alias("dup_pages"),
             F.sum("kept_chars").cast("long").alias("kept_chars"),
             F.min("kept_doc").alias("first_doc"))
        .select("domain", "pages", "unique_pages", "dup_pages",
                round4_ratio(F.col("dup_pages"), F.col("pages"))
                .alias("dup_rate"),
                "kept_chars", "first_doc")
        .orderBy("domain"))


MIRROR_LEAD_N = 8        # lead-fingerprint length (first N tokens)
MIRROR_FP_MAX_DOMAINS = 12   # df prune: a lead on more domains than
#                              this is boilerplate, not mirroring


def _mirror_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r10 debut): cross-domain mirror matrix — which PAIRS of
    domains serve the same content under different canonical URLs.
    `host_dedup` collapses aliases of one URL; `dedup_content_hash`
    collapses byte-identical docs anywhere; this composes the two
    into the crawl-ops readout between them: per domain pair, how
    many distinct content leads both serve (mirror farms, syndication
    networks, proxies — the duplication that survives URL
    canonicalization because the HOSTS differ).

    The content key is a LEAD FINGERPRINT — sha-prefix hash of the
    first MIRROR_LEAD_N whitespace tokens — rather than a whole-text
    hash: mirrors re-serve the lead verbatim while injecting their
    own boilerplate further down (and the fixtures carry shared leads
    at every SF where byte-identical cross-source texts only appear
    at sf0.1).  60-bit prints (15 hex chars — 16 would hit the BIGINT
    sign bit, the r8 simhash lesson).

    Determinism/exactness: tokenization is the raw lowercase split
    both gram pipelines use; the hash is the public sha256-prefix
    idiom, bit-identical on both engines; every count is BIGINT.

    100 TB shape: the fingerprint is map-side; the (fp, domain) grain
    reduce is linear; leads on > MIRROR_FP_MAX_DOMAINS domains are
    df-pruned BEFORE the self-join (`winnow_join`'s discipline — a
    boilerplate lead spanning the whole web would otherwise explode
    |domains|² pairs), so per-fp fan-out is capped by a constant and
    the pair aggregate only touches genuine mirror candidates."""
    pages = _derived_pages(load(spark, sf_dir, "documents"))
    toks = F.split(F.lower("text"), WS_RUN)
    lead = F.concat_ws(
        " ", F.slice(toks, 1, MIRROR_LEAD_N))
    fp = F.conv(F.substring(F.sha2(lead, 256), 1, 15), 16, 10) \
          .cast("long")
    # r13 OPT (guide §1.2): the (fp, domain) rollup feeds the hot-fp
    # list and BOTH sides of the domain-pair self-join —
    # unmaterialized, the sha2-lead fingerprint scan ran 3× (8 parquet
    # scans in the before-plan).  LAZY materialization (r14: −11%
    # vs eager in the warm-cache bench regime).
    fpd = (pages.where(F.col("text") != "")
           .select(fp.alias("fp"), "domain")
           .groupBy("fp", "domain")
           .agg(F.count("*").cast("long").alias("pages"))
           .localCheckpoint(eager=False))
    hot = (fpd.groupBy("fp")
           .agg(F.count("*").alias("n_domains"))
           .where(F.col("n_domains") > MIRROR_FP_MAX_DOMAINS)
           .select("fp"))
    ff = fpd.join(F.broadcast(hot), "fp", "left_anti")
    return (
        ff.alias("a")
        .join(ff.alias("b"),
              (F.col("a.fp") == F.col("b.fp"))
              & (F.col("a.domain") < F.col("b.domain")))
        .groupBy(F.col("a.domain").alias("domain_a"),
                 F.col("b.domain").alias("domain_b"))
        .agg(F.count("*").cast("long").alias("shared_leads"),
             F.sum("a.pages").cast("long").alias("pages_a"),
             F.sum("b.pages").cast("long").alias("pages_b"))
        .orderBy("domain_a", "domain_b"))


FRONTIER_GOOD_MIN = 20    # crawl-quality predicate: token count in
FRONTIER_GOOD_MAX = 5000  # [MIN, MAX] marks a page worth refetching


def _crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r10 debut): host-level crawl-frontier priority — the
    score a recrawl scheduler uses to decide which domains deserve
    fetch budget: domains whose pages are mostly UNIQUE (low
    alias-duplication under `host_dedup`'s canonicalization) and
    mostly GOOD (token count inside the Gopher-ish usable band) rank
    first; domains serving utm-splintered duplicates of thin pages
    rank last.  priority = unique_share × good_share, formed as ONE
    exact integer ratio (unique_pages·n_good) / pages² so the 4-dp
    report is round4_ratio-safe (int ratios CAN land on decimal
    halves — the r5 divergence class).

    100 TB shape: the quality predicate and canonicalization are
    map-side; ONE hash agg to (domain, canon_url) grain (distinct
    URLs + per-URL goodness), ONE to domain grain — the same
    two-level reduce as host_dedup, no joins; output is |domains|
    rows sorted by the exact-rounded score."""
    pages = _derived_pages(load(spark, sf_dir, "documents"))
    n_toks = F.size(_tokens(F.col("text")))
    # when/otherwise, not bool.cast: a NULL text NULLs the band
    # predicate, and cast would propagate NULL through sum(good) into
    # a NULL n_good/priority where the oracle's CASE counts 0 (r11
    # all-NULL sweep); a page with no text is NOT good — count it 0
    good = F.when((n_toks >= FRONTIER_GOOD_MIN)
                  & (n_toks <= FRONTIER_GOOD_MAX),
                  F.lit(1)).otherwise(F.lit(0)).cast("long")
    per_url = (
        pages.select("domain", "canon_url", good.alias("good"))
        .groupBy("domain", "canon_url")
        .agg(F.count("*").alias("copies"), F.sum("good").alias("n_good")))
    return (
        per_url.groupBy("domain")
        .agg(F.sum("copies").cast("long").alias("pages"),
             F.count("*").cast("long").alias("unique_pages"),
             F.sum("n_good").cast("long").alias("n_good"))
        .select("domain", "pages", "unique_pages", "n_good",
                round4_ratio(
                    F.col("unique_pages") * F.col("n_good"),
                    F.col("pages") * F.col("pages")).alias("priority"))
        .orderBy(F.col("priority").desc(), "domain"))


DEGREE_TOPK = 100  # degree-histogram head fitted (envelope discipline:
#                    bounds the OLS point count by a model constant —
#                    the ZIPF_TOPK/HEAPS_POINTS contract on
#                    _loglog_ols_fit — and the power-law head lives at
#                    the low degrees anyway)


def _degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r12 debut): degree-distribution power-law fit of the
    similarity graph — the THIRD corpus law after `zipf_fit`
    (frequency) and `heaps_law` (growth), read off the dedup graph
    itself: n_nodes(degree) ≈ C·degree^(−α) over the
    `_embedding_pair_edges` near-dup graph.  The dedup-graph HEALTH
    readout: a natural near-dup graph is heavy-tailed (α ≈ 1–3);
    a flat or bumpy degree histogram means template farms or a broken
    embedding space, and a missing tail means the similarity threshold
    is too tight — all visible in (alpha, r2) before any dedup policy
    runs.  SIGN CONVENTION (r13 advice item): the emitted `alpha`
    column is the RAW log-log OLS slope, exactly like `zipf_fit`'s
    `slope` — i.e. ≈ −α of the law above, NEGATIVE for a healthy
    heavy tail (alpha ≈ −1 … −3).  Kept raw rather than negated so
    the three corpus-law readouts (zipf/heaps/degree) share one
    convention: read the magnitude as the exponent.

    Exactness: degrees and histogram counts are exact BIGINTs; the fit
    is the shared `_loglog_ols_fit` (ONE copy of the exact
    DECIMAL(38,0)/HUGEINT closed forms with 1e-4-quantized ln points).
    The fitted head is the DEGREE_TOPK LOWEST degrees — deterministic
    (degree is the sort key and is unique per histogram row), and the
    bounded point count is what keeps the OLS inside the
    round4_ratio_dec overflow envelope (see _loglog_ols_fit).
    Degenerate contract: an empty edge set yields zero rows; a
    single-degree histogram has d1 = 0 → alpha/lnc/r2 NULL on both
    engines.

    100 TB shape: edges come from the cell-bounded equi-join
    (Σ|cell|², no cartesian — the SemDeDup family's shared candidate
    source); degree is one hash agg on node, the histogram one more on
    degree (both partial-agg'd); the fitted head is ≤ DEGREE_TOPK rows
    via TakeOrderedAndProject, and the OLS reduce is 6 numbers."""
    from ..functions.text import _loglog_ols_fit

    edges = _embedding_pair_edges(spark, sf_dir)
    nodes = edges.select(F.col("keep_id").alias("node")).unionAll(
        edges.select(F.col("dup_id").alias("node")))
    deg = nodes.groupBy("node").agg(F.count("*").alias("deg"))
    hist = (deg.groupBy("deg").agg(F.count("*").alias("n_nodes"))
            .orderBy("deg").limit(DEGREE_TOPK))
    x = F.floor(F.log(F.col("deg").cast("double")) * 1e4 + 0.5)
    y = F.floor(F.log(F.col("n_nodes").cast("double")) * 1e4 + 0.5)
    fit = _loglog_ols_fit(
        hist.select(F.lit("similarity").alias("graph"),
                    x.alias("x"), y.alias("y")),
        "graph", n_name="n_points")
    return fit.select("graph", "n_points",
                      F.col("slope").alias("alpha"),
                      F.col("intercept").alias("lnc"),
                      "r2")


def _dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT (r12 debut): per-source duplication-rate rollup — the
    per-shard dedup dashboard row, composing `dedup_content_hash`'s
    grain (byte-identical text anywhere in the corpus) with
    `host_dedup`'s grain (same canonical URL after alias stripping):
    for each source, how many of its docs would a content dedup
    remove, and how many would URL canonicalization alone remove.
    The two rates bracket a shard's redundancy — alias dups are cheap
    to kill upstream (crawl config), content dups cost a digest
    shuffle — so the pair tells crawl ops WHERE to fix each source.

    A doc counts as a dup iff it is not the min-doc_id survivor of its
    group (exactly the survivor rule of both composed operators), so
    sum(per-source dups) over sources == each operator's global
    removed count.  Rates are exact-int half-up ratios (round4_ratio).
    NULL-text docs share one NULL digest group on both engines (SQL
    one-NULL-partition window semantics, pinned by the all-NULL tier).

    100 TB shape: both dup verdicts are min-over-partition windows
    keyed on a DIGEST (64-hex sha256 / canonical URL) — the exchanges
    carry (doc_id, source, digest), never text; the rollup then
    reduces doc-grain rows to |sources|.  No self-joins, no collect;
    the same narrow-digest-shuffle pattern as dedup_content_hash."""
    from pyspark.sql import Window

    pages = _derived_pages(load(spark, sf_dir, "documents"))
    wc = Window.partitionBy("chash")
    wu = Window.partitionBy("domain", "canon_url")
    flagged = (
        pages.select("doc_id", "source",
                     F.sha2(F.col("text"), 256).alias("chash"),
                     "domain", "canon_url")
        .select("doc_id", "source",
                (F.col("doc_id") != F.min("doc_id").over(wc))
                .cast("long").alias("content_dup"),
                (F.col("doc_id") != F.min("doc_id").over(wu))
                .cast("long").alias("alias_dup")))
    return (
        flagged.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("content_dup").cast("long").alias("content_dups"),
             F.sum("alias_dup").cast("long").alias("alias_dups"))
        .select("source", "n_docs", "content_dups",
                round4_ratio(F.col("content_dups"), F.col("n_docs"))
                .alias("content_dup_rate"),
                "alias_dups",
                round4_ratio(F.col("alias_dups"), F.col("n_docs"))
                .alias("alias_dup_rate"))
        .orderBy("source"))


def _dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT D62 (r13 debut): duplicate-cluster SIZE histogram + tail
    stats off `dedup_clusters`' connected components — the dedup
    SIZING readout a pipeline owner consults before running the
    policy: how much would transitive dedup remove, and is the
    removal mass spread across many small pairs (healthy crawl) or
    concentrated in a few giant clusters (a template farm / mirror
    run that one upstream fix would kill)?  Per size: how many
    clusters, how many docs they hold, how many docs a keep-one
    policy removes, the cumulative removed count from the LARGEST
    size down (the tail-concentration curve), and each size's exact
    share of total removals.

    Exactness: every count is an exact BIGINT off the CC labels;
    `removed_share` is the shared exact-int half-up ratio
    (round4_ratio) — no doubles form before the final /1e4.
    Degenerate contract: an empty edge set yields zero rows;
    cluster_size is the (unique) histogram key, so the cumulative
    frame is tie-free and RANGE/ROWS framing coincide on both
    engines.

    100 TB shape: reuses `_dedup_clusters` (cell-bounded edges +
    checkpointed min-label fixpoint — see its docstring for the
    large-star switch at scale); this readout adds one distinct on
    (cluster_id, size) — cardinality = #clusters, already a tiny
    fraction of the corpus — then a hash-agg to #distinct-sizes rows.
    The two windows run over THAT bounded histogram (≤ max cluster
    size rows, a model-sized frame — the seasonal_envelope idiom), so
    their single partition is by construction, not by accident; both
    are in tests/test_plans.py's WindowExec allow-list."""
    from pyspark.sql import Window

    clusters = _dedup_clusters(spark, sf_dir)
    hist = (clusters.select("cluster_id", "cluster_size").distinct()
            .groupBy("cluster_size")
            .agg(F.count("*").cast("long").alias("n_clusters")))
    w_top = (Window.orderBy(F.col("cluster_size").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy()
    n_removed = ((F.col("cluster_size") - 1) * F.col("n_clusters"))
    return (
        hist.select(
            "cluster_size", "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long")
            .alias("n_docs"),
            n_removed.cast("long").alias("n_removed"))
        .select(
            "cluster_size", "n_clusters", "n_docs", "n_removed",
            F.sum("n_removed").over(w_top).cast("long")
            .alias("removed_cum_top"),
            round4_ratio(F.col("n_removed"),
                         F.sum("n_removed").over(w_all))
            .alias("removed_share"))
        .orderBy("cluster_size"))


QUERIES = {
    "graph_pagerank": _graph_pagerank,
    "graph_bfs": _graph_bfs,
    "source_overlap": _source_overlap,
    "minhash_lsh_join": _minhash_lsh_join,
    "simhash_join": _simhash_join,
    "dedup_bloom": _dedup_bloom,
    "graph_triangles": _graph_triangles,
    "decontaminate": _decontaminate,
    "decontaminate_filter": _decontaminate_filter,
    "dedup_keep_best": _dedup_keep_best,
    "dedup_clusters": _dedup_clusters,
    "dedup_clusters_star": _dedup_clusters_star,
    "dedup_embedding": _dedup_embedding,
    "dedup_semantic": _dedup_semantic,
    "dedup_exact": _dedup_exact,
    "dedup_distinct": _dedup_distinct,
    "dedup_content_hash": _dedup_content_hash,
    "dedup_near": _dedup_near_minhash,
    "dedup_simhash": _dedup_near_simhash,
    "dedup_ngram_jaccard": _dedup_ngram_jaccard,
    "substring_dedup": _substring_dedup,
    "dedup_containment": _dedup_containment,
    "join_prefix_filter": _join_prefix_filter,
    "ngram_novelty": _ngram_novelty,
    "novelty_delta": _novelty_delta,
    "host_dedup": _host_dedup,
    "mirror_detect": _mirror_detect,
    "crawl_frontier": _crawl_frontier,
    "degree_powerlaw": _degree_powerlaw,
    "dup_rate_by_source": _dup_rate_by_source,
    "dup_cluster_sizes": _dup_cluster_sizes,
}

ORACLES = {
    "decontaminate": f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(ws) - {DECON_N - 2}, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                || ws[i+3] || ' ' || ws[i+4]))) AS gram
  FROM toks
), bench AS (
  SELECT doc_id AS bench_doc, gram FROM grams WHERE doc_id % 10 = 0
), train AS (
  SELECT doc_id AS train_doc, gram FROM grams WHERE doc_id % 10 != 0
), bench_sizes AS (
  SELECT bench_doc, count(*) AS bench_grams FROM bench GROUP BY bench_doc
), shared AS (
  SELECT t.train_doc, b.bench_doc, count(*) AS n_shared
  FROM train t JOIN bench b ON t.gram = b.gram
  GROUP BY t.train_doc, b.bench_doc
)
SELECT s.train_doc, s.bench_doc, s.n_shared, z.bench_grams,
       round(s.n_shared / z.bench_grams, 4) AS overlap
FROM shared s JOIN bench_sizes z ON z.bench_doc = s.bench_doc
WHERE round(s.n_shared / z.bench_grams, 4) >= {DECON_MIN_OVERLAP}
""",
    # bounded recursive CTE over the same 0.25-threshold edge set;
    # min(dist) per node == the Spark loop's first-reach hop, and the
    # shared BFS_MAX_HOPS bound is what terminates recursion on a
    # cyclic graph
    "graph_bfs": f"""
WITH RECURSIVE {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {TRIANGLE_THRESHOLD}
), edges AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
), seeds AS (
  SELECT DISTINCT src AS node FROM edges WHERE src % 100 = 0
), walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {BFS_MAX_HOPS}
)
SELECT node, CAST(min(dist) AS INTEGER) AS dist
FROM walk GROUP BY node
""",
    # transitive closure of the same 6dp-rounded within-cell edge set
    # via recursive CTE; component label = min reachable doc_id
    "graph_triangles": f"""
WITH {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {TRIANGLE_THRESHOLD}
)
SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
FROM pairs e1
JOIN pairs e2 ON e2.src = e1.dst
JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
ORDER BY 1, 2, 3
""",
    "dedup_clusters": f"""
WITH RECURSIVE {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {SIM_THRESHOLD}
), edges AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), labels AS (
  SELECT node, min(r) AS cluster_id FROM (
    SELECT src AS node, dst AS r FROM reach
    UNION ALL
    SELECT DISTINCT src AS node, src AS r FROM edges
  ) GROUP BY node
)
SELECT l.node AS doc_id, l.cluster_id, s.cluster_size
FROM labels l
JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id) s USING (cluster_id)
WHERE s.cluster_size > 1
""",
    "dedup_embedding": f"""
WITH {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), pairs AS (
  SELECT a.doc_id AS keep_id, b.doc_id AS dup_id,
         round(
           list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
           (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
            sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
           6) AS cos_sim
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
)
SELECT dup_id, keep_id AS dup_of, cos_sim
FROM (SELECT *, row_number() OVER (PARTITION BY dup_id
            ORDER BY cos_sim DESC, keep_id ASC) AS rn
      FROM pairs WHERE cos_sim >= {SIM_THRESHOLD})
WHERE rn = 1
""",
    # dedup_semantic (r11): the same quantizer cells and 6dp-rounded
    # within-cell pair set; survivor policy = centroid-nearest (lower
    # cent_cos pruned, tie prunes the higher vec_id)
    "dedup_semantic": f"""
WITH {DUCK_CELLS_CTE}, members AS (
  SELECT d.doc_id AS vec_id, c.cell, e.embedding,
         round(
           list_dot_product(e.embedding::DOUBLE[], ct.c_vec::DOUBLE[]) /
           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
            sqrt(list_dot_product(ct.c_vec::DOUBLE[], ct.c_vec::DOUBLE[]))),
           6) AS cent_cos
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
  JOIN cents ct ON ct.c_id = c.cell
), spairs AS (
  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
         a.cent_cos AS cc_a, b.cent_cos AS cc_b
  FROM members a JOIN members b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {SIM_THRESHOLD}
), losers AS (
  SELECT DISTINCT CASE WHEN cc_a < cc_b THEN keep_id ELSE dup_id END
    AS vec_id
  FROM spairs
)
SELECT m.vec_id, m.cell, m.cent_cos,
       CASE WHEN l.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM members m LEFT JOIN losers l USING (vec_id)
ORDER BY m.vec_id
""",
    "dedup_exact": USERS_CTE + """
SELECT custkey, id, email, country,
       strftime(registered_ts, '%Y-%m-%d %H:%M:%S') AS registered
FROM (SELECT *, row_number() OVER (PARTITION BY id
                                   ORDER BY custkey) AS rn
      FROM users_valid)
WHERE rn = 1
""",
    "dedup_distinct": USERS_CTE + """
SELECT DISTINCT id, email, country, city FROM users_valid
""",
    "dedup_content_hash": """
SELECT sha256(text) AS content_hash,
       min(doc_id) AS survivor_doc_id,
       CAST(count(*) AS BIGINT) AS copies
FROM documents
GROUP BY sha256(text)
""",
    # dedup_near / dedup_simhash: rows-only (engine-local hash perms)
    "dedup_ngram_jaccard": f"""
WITH {DUCK_PRUNED_GRAMS_CTE}, gram_counts AS (
  SELECT doc_id, count(*) AS n_grams FROM gramsf GROUP BY doc_id
), inter AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS inter
  FROM gramsf l JOIN gramsf r
    ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
)
SELECT doc_a, doc_b,
       round(inter / (ca.n_grams + cb.n_grams - inter), 4) AS jaccard
FROM inter
JOIN gram_counts ca ON ca.doc_id = doc_a
JOIN gram_counts cb ON cb.doc_id = doc_b
WHERE round(inter / (ca.n_grams + cb.n_grams - inter), 4) >= 0.2
""",
    # df is distinct-doc count because grams are list_distinct'd per
    # doc; dup_share goes through the exact-int rounding mirror
    "substring_dedup": f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(ws) - {SUBSTR_N - 2}, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' '
                || ws[i+6] || ' ' || ws[i+7]))) AS gram
  FROM toks
), gram_df AS (
  SELECT gram, count(*) AS df FROM grams GROUP BY gram
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       {round4_ratio_sql(
           "CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)",
           "count(*)")} AS dup_share
FROM grams g JOIN gram_df d USING (gram)
GROUP BY g.doc_id
""",
    # cross-paradigm: the oracle states the SPEC (unpruned inverted-
    # index join over FULL gram sets), the Spark side runs prefix
    # filtering — the driver compare checks the completeness theorem
    # on real data.  No hot pruning on either side (pruning would
    # change the answer; prefix filtering provably does not).
    "join_prefix_filter": f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text),
                                    '[ \\t\\n\\x0B\\f\\r]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(ws) - 1, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
  FROM toks
), sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
), inter AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS inter
  FROM grams l JOIN grams r
    ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id
)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       {round4_ratio_sql("inter", "sa.n_grams + sb.n_grams - inter")}
         AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {round4_ratio_sql("inter", "sa.n_grams + sb.n_grams - inter")}
      >= {PREFIX_JACCARD_T}
""",
    # same gram universe + hot pruning as the jaccard oracle; the
    # asymmetric ratio divides by the LEFT doc's gram count only and
    # thresholds on the 4-dp-quantized value (identical cut set)
    "dedup_containment": f"""
WITH {DUCK_PRUNED_GRAMS_CTE}, sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM gramsf GROUP BY doc_id
), inter AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*) AS inter
  FROM gramsf l JOIN gramsf r
    ON l.gram = r.gram AND l.doc_id != r.doc_id
  GROUP BY l.doc_id, r.doc_id
)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       CAST(s.n_grams AS BIGINT) AS na,
       {round4_ratio_sql("inter", "s.n_grams")} AS containment
FROM inter JOIN sizes s ON s.doc_id = doc_a
WHERE {round4_ratio_sql("inter", "s.n_grams")} >= {CONTAIN_MIN}
""",
}

# the star-CC flavor computes the SAME clusters from the SAME edge set
# — one oracle, two distributed algorithms checked against it
ORACLES["dedup_clusters_star"] = ORACLES["dedup_clusters"]

# keep-best policy over those clusters: wrap the cluster oracle and
# pick the (n_chars desc, doc_id asc) survivor per cluster
ORACLES["dedup_keep_best"] = f"""
WITH clusters AS ({ORACLES["dedup_clusters"]}),
members AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT cluster_id,
       max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_dropped
FROM members
GROUP BY cluster_id
"""

# cluster-size histogram + tail stats: wraps the cluster oracle (one
# source of truth for the transitive-closure semantics), reduces to
# one row per cluster then per size; cumulative frame is tie-free
# (cluster_size is the unique key) so the default RANGE frame matches
# Spark's explicit ROWS frame
ORACLES["dup_cluster_sizes"] = f"""
WITH clusters AS ({ORACLES["dedup_clusters"]}),
per_cluster AS (
  SELECT DISTINCT cluster_id, cluster_size FROM clusters
),
hist AS (
  SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
         CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removed
  FROM per_cluster GROUP BY cluster_size
)
SELECT cluster_size, n_clusters, n_docs, n_removed,
       CAST(sum(n_removed) OVER (ORDER BY cluster_size DESC)
            AS BIGINT) AS removed_cum_top,
       {round4_ratio_sql("n_removed",
                         "CAST(sum(n_removed) OVER () AS BIGINT)")}
         AS removed_share
FROM hist
ORDER BY cluster_size
"""

# wraps the decontaminate oracle verbatim (one source of truth for the
# tokenize/gram/overlap semantics) and anti-joins the flagged set
ORACLES["decontaminate_filter"] = f"""
WITH flagged AS (
  SELECT DISTINCT train_doc FROM ({ORACLES["decontaminate"]})
)
SELECT source, CAST(count(*) AS BIGINT) AS clean_docs,
       CAST(sum(n_chars) AS BIGINT) AS clean_chars
FROM documents
WHERE doc_id % 10 != 0
  AND doc_id NOT IN (SELECT train_doc FROM flagged)
GROUP BY source
"""

# PageRank oracle: the integer-mass recurrence UNROLLED as PR_ITERS
# chained CTEs over the same affinity edge set the triangles oracle
# derives (iteration count is a spec constant, so iterative != non-
# SQL-expressible here — see _graph_pagerank's docstring)
_PR_BASE = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN


def _duck_pagerank_sql() -> str:
    rounds = [f"m0 AS (SELECT node, CAST({PR_UNIT} AS BIGINT) AS mass,"
              " degree FROM deg)"]
    for r in range(1, PR_ITERS + 1):
        rounds.append(f"""m{r} AS (
  SELECT d.node, CAST({_PR_BASE} + coalesce(r.rec, 0) AS BIGINT) AS mass,
         d.degree
  FROM deg d LEFT JOIN (
    SELECT s.dst AS node,
           sum((m.mass * {PR_DAMP_NUM}) // {PR_DAMP_DEN} // m.degree)
             AS rec
    FROM sym s JOIN m{r - 1} m ON s.src = m.node
    GROUP BY s.dst) r ON r.node = d.node)""")
    return f"""
WITH {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {TRIANGLE_THRESHOLD}
), sym AS (
  SELECT src, dst FROM pairs UNION SELECT dst AS src, src AS dst FROM pairs
), deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY src
), {", ".join(rounds)}
SELECT node, CAST(mass AS BIGINT) AS mass FROM m{PR_ITERS}
"""


ORACLES["graph_pagerank"] = _duck_pagerank_sql()

# bloom-filter dedup oracle: both engines build the IDENTICAL filter
# (sha256-derived positions), so even the false-positive count is an
# exact cross-engine match
_DUCK_BLOOM_POS = (
    "CAST(concat('0x', substr(sha256(text || '|' || CAST(i AS VARCHAR)"
    f"), 1, 8)) AS BIGINT) % {BLOOM_M}")

ORACLES["dedup_bloom"] = f"""
WITH b AS (
  SELECT doc_id, text,
         CAST(concat('0x', substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS bucket
  FROM documents WHERE text IS NOT NULL
), existing AS (SELECT * FROM b WHERE bucket < {BLOOM_EXISTING_HI}),
batch AS (SELECT * FROM b WHERE bucket >= {BLOOM_BATCH_LO}),
seeds AS (SELECT unnest(range({BLOOM_K})) AS i),
bloom AS (
  SELECT DISTINCT {_DUCK_BLOOM_POS} AS pos FROM existing, seeds
), bpos AS (
  SELECT doc_id, bucket, {_DUCK_BLOOM_POS} AS pos FROM batch, seeds
), flags AS (
  SELECT p.doc_id, p.bucket,
         min(CASE WHEN bl.pos IS NULL THEN 0 ELSE 1 END) AS all_hit
  FROM bpos p LEFT JOIN bloom bl ON p.pos = bl.pos
  GROUP BY p.doc_id, p.bucket
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM existing) AS n_existing,
       CAST(count(*) AS BIGINT) AS n_batch,
       CAST(sum(all_hit) AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN bucket < {BLOOM_EXISTING_HI} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_dup,
       CAST(sum(CASE WHEN all_hit = 1 AND bucket >= {BLOOM_EXISTING_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN all_hit = 0 AND bucket < {BLOOM_EXISTING_HI}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
FROM flags
"""

# the per-doc distinct word-3-gram stream as ONE DuckDB CTE block —
# the oracle mirror of the Spark-side `_gram_array` centralization
# (whose docstring records the drift that three hand-kept copies once
# caused); shared by the ngram_novelty and novelty_delta oracles,
# which consume the identical raw-WS-split gram universe.  (The other
# gram oracles differ structurally: decontaminate is 5-grams,
# source_overlap keys on source — they keep their own blocks.)
_DUCK_GRAMS3_CTES = """toks AS (
  SELECT doc_id, string_split_regex(lower(text),
                                    '[ \\t\\n\\x0B\\f\\r]+') AS ws
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(ws) - 1, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
  FROM toks
)"""

# identical recurrence over the UNPRUNED distinct gram universe (the
# min+count reduce is linear in shared grams, so novelty needs no
# df-threshold — see _ngram_novelty); tokenization is the raw
# WS_CHARS split shared with the jaccard oracles
ORACLES["ngram_novelty"] = f"""
WITH {_DUCK_GRAMS3_CTES}, first AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       {round4_ratio_sql(
           "CAST(sum(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)",
           "CAST(count(*) AS BIGINT)")} AS novelty
FROM grams g JOIN first f USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""

# source_overlap oracle (r8): identical distinct-(source, gram)
# reduce, gram-keyed pair join, exact int counts, shared half-up
# int-ratio rounding
ORACLES["source_overlap"] = f"""
WITH toks AS (
  SELECT source, string_split_regex(lower(text),
                                    '[ \\t\\n\\x0B\\f\\r]+') AS ws
  FROM documents
), dg AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source, unnest(list_distinct(list_transform(
             range(1, greatest(len(ws) - 1, 1)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
    FROM toks)
), ps AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY source
), pr AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM dg a JOIN dg b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT pr.src_a, pr.src_b, pa.n AS na, pb.n AS nb, pr.inter,
       {round4_ratio_sql('pr.inter', 'pa.n + pb.n - pr.inter')}
         AS jaccard,
       {round4_ratio_sql('pr.inter', 'pa.n')} AS containment_a,
       {round4_ratio_sql('pr.inter', 'pb.n')} AS containment_b
FROM pr
JOIN ps pa ON pa.source = pr.src_a
JOIN ps pb ON pb.source = pr.src_b
ORDER BY src_a, src_b
"""


# minhash_lsh_join oracle (r8): the identical deterministic pipeline —
# sha-slot signatures (min per slot), band keys, bucket-equality
# candidates, exact-Jaccard verify via the distinct-gram stream join
# (== array_intersect on distinct arrays); slot and band SQL generated
# from the same MINHASH_* constants as the Spark side
_MH_SLOTS_SQL = ",\n         ".join(
    f"min(CAST(concat('0x', substr(sha256('{i}:' || gram), 1, 8)) "
    f"AS BIGINT)) AS s{i}"
    for i in range(MINHASH_K))
_MH_BANDS_SQL = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, {b} AS band, "
    + " || ':' || ".join(f"CAST(s{b * MINHASH_R + r} AS VARCHAR)"
                         for r in range(MINHASH_R))
    + " AS key FROM sig"
    for b in range(MINHASH_B))
ORACLES["minhash_lsh_join"] = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text),
                                    '[ \\t\\n\\x0B\\f\\r]+') AS ws
  FROM documents
), pd AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(ws) - 1, 1)),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS grams
  FROM toks
), pdn AS (
  SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n_grams
  FROM pd WHERE len(grams) > 0
), dg AS (
  SELECT doc_id, unnest(grams) AS gram FROM pdn
), sig AS (
  SELECT doc_id,
         {_MH_SLOTS_SQL}
  FROM dg GROUP BY doc_id
), bands AS (
  {_MH_BANDS_SQL}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), ver AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN dg ga ON ga.doc_id = c.doc_a
  JOIN dg gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
  GROUP BY c.doc_a, c.doc_b
), res AS (
  SELECT v.doc_a, v.doc_b, v.inter,
         {round4_ratio_sql('v.inter',
                            'pa.n_grams + pb.n_grams - v.inter')}
           AS jaccard
  FROM ver v
  JOIN pdn pa ON pa.doc_id = v.doc_a
  JOIN pdn pb ON pb.doc_id = v.doc_b
)
SELECT doc_a, doc_b, inter, jaccard
FROM res WHERE jaccard >= {PREFIX_JACCARD_T}
ORDER BY doc_a, doc_b
"""

# simhash_join oracle (r8; r9 widened): the identical banded Charikar
# recipe — two sha-prefix 60-bit token hashes, per-bit tf votes, `> 0`
# sign packing over 120 bits, 4x30 band buckets, popcount verify —
# generated from the same SIMHASH_* constants so the sides cannot drift
_SH_VOTES_SQL = ",\n         ".join(
    f"sum(CASE WHEN (h{p} >> {i}) & 1 = 1 THEN tf ELSE -tf END) "
    f"AS b{p}_{i}"
    for p in range(SIMHASH_SHA_PRINTS) for i in range(SIMHASH_SHA_BITS))
_SH_PACK_SQL = ",\n         ".join(
    "\n           + ".join(
        f"CASE WHEN b{p}_{i} > 0 THEN CAST({1 << i} AS BIGINT) "
        "ELSE 0 END"
        for i in range(SIMHASH_SHA_BITS)) + f" AS fp{p}"
    for p in range(SIMHASH_SHA_PRINTS))
_SH_BANDS_SQL = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, fp0, fp1, {2 * p + half} AS chunk_id, "
    f"(fp{p} >> {half * SIMHASH_BAND_BITS}) & "
    f"{(1 << SIMHASH_BAND_BITS) - 1} AS chunk FROM fp"
    for p in range(SIMHASH_SHA_PRINTS) for half in range(2))
ORACLES["simhash_join"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text),
             '[ \\t\\n\\x0B\\f\\r]+'), t -> t != '')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf,
         CAST(concat('0x', substr(sha256(tok), 1, 15)) AS BIGINT) AS h0,
         CAST(concat('0x', substr(sha256(tok), 16, 15)) AS BIGINT) AS h1
  FROM toks GROUP BY doc_id, tok
), votes AS (
  SELECT doc_id,
         {_SH_VOTES_SQL}
  FROM th GROUP BY doc_id
), fp AS (
  SELECT doc_id,
         {_SH_PACK_SQL}
  FROM votes
), ch AS (
  {_SH_BANDS_SQL}
), cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         l.fp0 AS fp0_a, l.fp1 AS fp1_a, r.fp0 AS fp0_b, r.fp1 AS fp1_b
  FROM ch l JOIN ch r
    ON l.chunk_id = r.chunk_id AND l.chunk = r.chunk
   AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fp0_a, fp0_b))
            + bit_count(xor(fp1_a, fp1_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(fp0_a, fp0_b)) + bit_count(xor(fp1_a, fp1_b))
      <= {SIMHASH_SHA_HAM}
ORDER BY doc_a, doc_b
"""

# novelty_delta oracle (r9): identical batch-over-corpus gram join —
# the corpus side is the DISTINCT gram index, the batch side the raw
# per-doc distinct gram stream, novelty = grams with no index hit
ORACLES["novelty_delta"] = f"""
WITH {_DUCK_GRAMS3_CTES}, corpus AS (
  SELECT DISTINCT gram FROM grams
  WHERE doc_id % {NOVELTY_BATCH_MOD} != 0
), batch AS (
  SELECT doc_id, gram FROM grams WHERE doc_id % {NOVELTY_BATCH_MOD} = 0
), per AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN c.gram IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM batch b LEFT JOIN corpus c USING (gram)
  GROUP BY b.doc_id
)
SELECT doc_id, n_grams, n_new,
       {round4_ratio_sql("n_new", "n_grams")} AS novelty_delta
FROM per ORDER BY doc_id
"""

# host_dedup oracle (r9): the same derived URLs; HOST/PATH extraction
# mirrored with regexes (DuckDB has no parse_url) — exact for the
# generated https://host/path[?query] shape
#: DuckDB mirror of `_derived_pages` (ends defining CTE
#: `canon(doc_id, n_chars, source, text, domain, canon_url)`) —
#: shared by the host_dedup, mirror_detect and crawl_frontier oracles.
_DUCK_PAGES_CTES = """pages AS (
  SELECT doc_id, n_chars, source, text,
         'https://'
         || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN upper(CASE WHEN regexp_replace(source,
                                  '[^A-Za-z0-9.-]', '', 'g') = ''
                            THEN 'unknown'
                            ELSE regexp_replace(source,
                                  '[^A-Za-z0-9.-]', '', 'g') END)
                 ELSE CASE WHEN regexp_replace(source,
                               '[^A-Za-z0-9.-]', '', 'g') = ''
                      THEN 'unknown'
                      ELSE regexp_replace(source,
                               '[^A-Za-z0-9.-]', '', 'g') END
            END
         || '.example.org/page-' || CAST(doc_id % 13 AS VARCHAR)
         || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END
           AS url
  FROM documents
), canon AS (
  SELECT doc_id, n_chars, source, text,
         regexp_replace(lower(regexp_extract(url,
             'https://([^/]+)/', 1)), '^www\\.', '') AS domain,
         regexp_replace(lower(regexp_extract(url,
             'https://([^/]+)/', 1)), '^www\\.', '')
         || regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS canon_url
  FROM pages
)"""

ORACLES["host_dedup"] = f"""
WITH {_DUCK_PAGES_CTES}, per_url AS (
  SELECT domain, canon_url,
         CAST(count(*) AS BIGINT) AS copies,
         min(doc_id) AS kept_doc,
         min_by(n_chars, doc_id) AS kept_chars
  FROM canon GROUP BY domain, canon_url
), roll AS (
  SELECT domain,
         CAST(sum(copies) AS BIGINT) AS pages,
         CAST(count(*) AS BIGINT) AS unique_pages,
         CAST(sum(copies - 1) AS BIGINT) AS dup_pages,
         CAST(sum(kept_chars) AS BIGINT) AS kept_chars,
         min(kept_doc) AS first_doc
  FROM per_url GROUP BY domain
)
SELECT domain, pages, unique_pages, dup_pages,
       {round4_ratio_sql("dup_pages", "pages")} AS dup_rate,
       kept_chars, first_doc
FROM roll ORDER BY domain
"""

# degree_powerlaw (r12): the same quantizer cells + 6dp-rounded
# within-cell edge set as the SemDeDup family; degree/histogram exact
# BIGINTs, lowest-DEGREE_TOPK head, and the SAME shared OLS tail as
# zipf_fit/heaps_law (ONE copy of the closed forms)
ORACLES["degree_powerlaw"] = f"""
WITH {DUCK_CELLS_CTE}, vecs AS (
  SELECT d.doc_id, e.embedding, c.cell
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id
  JOIN cells c ON c.vec_id = d.doc_id
), dpairs AS (
  SELECT a.doc_id AS keep_id, b.doc_id AS dup_id
  FROM vecs a JOIN vecs b
    ON a.cell = b.cell AND a.doc_id < b.doc_id
  WHERE round(
          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
          6) >= {SIM_THRESHOLD}
), dnodes AS (
  SELECT keep_id AS node FROM dpairs
  UNION ALL SELECT dup_id FROM dpairs
), ddeg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM dnodes GROUP BY node
), dhist AS (
  SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
  FROM ddeg GROUP BY deg ORDER BY deg LIMIT {DEGREE_TOPK}
), dpts AS (
  SELECT 'similarity' AS graph,
         CAST(floor(ln(CAST(deg AS DOUBLE)) * 1e4 + 0.5) AS HUGEINT) AS x,
         CAST(floor(ln(CAST(n_nodes AS DOUBLE)) * 1e4 + 0.5) AS HUGEINT)
           AS y
  FROM dhist
), ds AS (
  SELECT graph, CAST(count(*) AS BIGINT) AS n_points,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM dpts GROUP BY graph
), dfit AS (
  SELECT graph, n_points,
         {_loglog_ols_tail_sql('n_points')}
  FROM ds
)
SELECT graph, n_points, slope AS alpha, intercept AS lnc, r2
FROM dfit ORDER BY graph
"""

# dup_rate_by_source (r12): min-over-group survivor verdicts on the
# sha256(text) and (domain, canon_url) grains off _DUCK_PAGES_CTES,
# rolled to source; rates are exact-int half-up ratios
ORACLES["dup_rate_by_source"] = f"""
WITH {_DUCK_PAGES_CTES}, flagged AS (
  SELECT source,
         CASE WHEN doc_id != min(doc_id) OVER (PARTITION BY sha256(text))
              THEN 1 ELSE 0 END AS content_dup,
         CASE WHEN doc_id != min(doc_id)
                            OVER (PARTITION BY domain, canon_url)
              THEN 1 ELSE 0 END AS alias_dup
  FROM canon
), roll AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(content_dup) AS BIGINT) AS content_dups,
         CAST(sum(alias_dup) AS BIGINT) AS alias_dups
  FROM flagged GROUP BY source
)
SELECT source, n_docs, content_dups,
       {round4_ratio_sql("content_dups", "n_docs")} AS content_dup_rate,
       alias_dups,
       {round4_ratio_sql("alias_dups", "n_docs")} AS alias_dup_rate
FROM roll ORDER BY source
"""

# mirror_detect (r10): lead-fingerprint × domain grain, df-pruned,
# self-joined — winnow_join's pair discipline over _DUCK_PAGES_CTES
ORACLES["mirror_detect"] = f"""
WITH {_DUCK_PAGES_CTES}, fpd AS (
  SELECT CAST(concat('0x', substr(sha256(array_to_string(
             string_split_regex(lower(text),
                                '[{WS_CHARS}]+')[1:{MIRROR_LEAD_N}],
             ' ')), 1, 15)) AS BIGINT) AS fp,
         domain, CAST(count(*) AS BIGINT) AS pages
  FROM canon WHERE text != ''
  GROUP BY 1, 2
), hot AS (
  SELECT fp FROM (SELECT fp, count(*) AS n_domains FROM fpd GROUP BY fp)
  WHERE n_domains > {MIRROR_FP_MAX_DOMAINS}
), ff AS (
  SELECT f.fp, f.domain, f.pages FROM fpd f
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.fp = f.fp)
)
SELECT a.domain AS domain_a, b.domain AS domain_b,
       CAST(count(*) AS BIGINT) AS shared_leads,
       CAST(sum(a.pages) AS BIGINT) AS pages_a,
       CAST(sum(b.pages) AS BIGINT) AS pages_b
FROM ff a JOIN ff b ON a.fp = b.fp AND a.domain < b.domain
GROUP BY 1, 2
ORDER BY domain_a, domain_b
"""

# crawl_frontier (r10): the host_dedup two-level reduce with a
# quality predicate; priority as ONE exact integer ratio
ORACLES["crawl_frontier"] = f"""
WITH {_DUCK_PAGES_CTES}, good AS (
  SELECT domain, canon_url,
         CASE WHEN len(list_filter(string_split_regex(lower(text),
                  '[{WS_CHARS}]+'), t -> t != ''))
                  BETWEEN {FRONTIER_GOOD_MIN} AND {FRONTIER_GOOD_MAX}
              THEN 1 ELSE 0 END AS good
  FROM canon
), per_url AS (
  SELECT domain, canon_url, CAST(count(*) AS BIGINT) AS copies,
         CAST(sum(good) AS BIGINT) AS n_good
  FROM good GROUP BY domain, canon_url
), roll AS (
  SELECT domain, CAST(sum(copies) AS BIGINT) AS pages,
         CAST(count(*) AS BIGINT) AS unique_pages,
         CAST(sum(n_good) AS BIGINT) AS n_good
  FROM per_url GROUP BY domain
)
SELECT domain, pages, unique_pages, n_good,
       {round4_ratio_sql("unique_pages * n_good", "pages * pages")}
         AS priority
FROM roll
ORDER BY priority DESC, domain
"""

