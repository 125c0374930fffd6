"""Parquet loaders + the canonical ``users`` derivation.

The reference's one core entity is the ``user`` record produced by its
Extract+Transform steps (reference: src/lib/randomuser.js:49-57).  The
driver testdata has no users table, so — per SURVEY.md §1.3 / FIXTURES.md —
``customer ⋈ nation ⋈ region`` plays the user/country entity, with the
"registered" timestamp derived from each customer's first order date.

To exercise the reference's cleaning semantics (null-guards
randomuser.js:99-104, lenient date parse :105-111, dedup_removed metric
etl.json:5) the derivation deterministically injects dirty data:

* ``email`` is NULL when ``custkey % 20 == 19``       (null-guard path)
* ``registered_raw`` is the unparseable string ``'not-a-date'`` when
  ``custkey % 25 == 13``                              (lenient-parse path)
* rows with ``custkey % 10 == 0`` are duplicated verbatim (dedup path)

The identical derivation exists as a SQL CTE in ``oracles.USERS_CTE`` so
every downstream query can be checked against DuckDB.

Scale note (100 TB): every step here is a narrow projection plus two
broadcast joins (nation=25, region=5 rows) and one aggregation on
``orders`` keyed by ``o_custkey`` — the single shuffle.  The duplicate
injection is a union of a filtered scan, not a self-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Pinned "current year" so avg_registration_years is deterministic
# (the reference uses wall-clock `new Date().getFullYear()`,
# randomuser.js:108; we pin per SURVEY.md §7 hard-point (3)).
CURRENT_YEAR = 2026


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensively set here, not only in session.py: the round driver
    # may hand us a SparkSession it built itself; without nanosAsLong
    # the NANOS-timestamped events parquet fails to read at all, and a
    # non-UTC session tz would shift every date_format vs the oracle
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # the driver writes `events.ts` as parquet TIMESTAMP(NANOS), which
    # Spark reads (under spark.sql.legacy.parquet.nanosAsLong) as a
    # nanos-since-epoch long; convert to a proper timestamp with the
    # same micros truncation DuckDB applies
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            # integer `div`, NOT `/`: nanos ~1.7e18 exceeds double's
            # exact-integer range, float division would corrupt micros
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.dataType.simpleString() == "timestamp_ntz":
            # driver testdata may also carry TIMESTAMP(MICROS,
            # isAdjustedToUTC=false), which Spark infers as
            # TIMESTAMP_NTZ.  Normalize to TIMESTAMP: with the session
            # tz pinned UTC above, the cast keeps the same wall-clock
            # values (matching DuckDB's naive read) while restoring
            # the instant semantics the engine relies on
            # (unix_micros range frames, watermarks, window()).
            df = df.withColumn(f.name,
                               F.col(f.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


# Opt-in materialization of the canonical users entity.  Every
# users-derived query re-runs customer⋈nation⋈region⋈first-order from
# scratch (correct, and what the driver's per-query correctness sweep
# should measure) — but a batch consumer running MANY users queries in
# one session (bench.py, a real dashboard refresh) should pay the
# derivation once.  warm_users_cache() pins the entity; users_base()
# then serves it to every downstream derivation.  At 100 TB the same
# role is played by materializing the entity to parquet/a table once
# per pipeline run — persist() is the single-session flavor.
_USERS_CACHE: dict = {}
_USERS_CLEAN_CACHE: dict = {}  # users_clean tier, pinned by the same warm


def _users_cache_key(spark: SparkSession, sf_dir: str) -> tuple:
    """(applicationId, path, source mtimes) — the same key shape as
    similarity._cent_cache_key (ADVICE r3): applicationId is stable
    per SparkContext and never recycled the way id(session) can be
    after a stopped session is GC'd (a recycled id would serve a
    checkpointed frame whose RDD blocks belong to a DEAD context),
    and the mtime fingerprint invalidates the entry when the parquet
    under an unchanged path is rewritten."""
    root = os.path.abspath(sf_dir)
    try:
        stamps = tuple(sorted(
            (f, os.stat(os.path.join(root, f)).st_mtime_ns)
            for f in os.listdir(root) if f.endswith(".parquet")))
    except OSError:
        stamps = ()
    return (spark.sparkContext.applicationId, root, stamps)


def warm_users_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = _users_cache_key(spark, sf_dir)
    if key not in _USERS_CACHE:
        # localCheckpoint over persist(MEMORY_AND_DISK) or a temp
        # parquet round-trip: measured at sf0.1, persist+count ~3.5s
        # (columnar cache encode) and write+read ~3.7s (commit
        # overhead) vs ~0.6s for the repartitioned checkpoint below.
        # The repartition matters: AQE coalesces the small build to
        # ONE partition, and checkpointing that plan serializes the
        # whole derivation (broadcast joins + first-order agg + regex
        # dirt injection) into a single task (~2.6s measured);
        # spreading to defaultParallelism first runs it wide — the
        # same reason a cluster materialization writes N files, not 1.
        # Row order is a physical detail here: every consumer either
        # aggregates or sorts explicitly (oracle compares are
        # order-insensitive).  Lineage truncation is fine for this
        # opt-in single-session cache (blocks freed on GC); a
        # long-lived cluster entity would persist or write a table.
        _USERS_CACHE[key] = (
            users_base(spark, sf_dir)
            .repartition(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=True))
        # ... and the CLEAN entity on top of it: the r4 shared-
        # derivation refactor left only the base pinned, so every
        # clean consumer re-paid explode + validity + distinct per
        # run (the r4->r5 window_rank bench drift).  Both pins are
        # the single-session flavor of the same 100 TB move —
        # materialize each entity tier once per pipeline run.
        _USERS_CLEAN_CACHE[key] = (
            clean_from(users_raw(spark, sf_dir))
            .localCheckpoint(eager=True))
    return _USERS_CACHE[key]


def clear_users_cache() -> None:
    # checkpointed blocks are freed when the DataFrames are GC'd;
    # dropping the refs is the cleanup
    _USERS_CACHE.clear()
    _USERS_CLEAN_CACHE.clear()


def users_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clean canonical user entity, one row per customer (no dirt)."""
    cached = _USERS_CACHE.get(_users_cache_key(spark, sf_dir))
    if cached is not None:
        return cached
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")

    first_order = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order_ts")
    )

    joined = (
        customer
        .join(F.broadcast(nation),
              customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey, "left")
        .join(first_order,
              customer.c_custkey == first_order.o_custkey, "left")
    )

    ck = F.col("c_custkey")
    return joined.select(
        ck.alias("custkey"),
        ck.cast("string").alias("id"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_first"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_last"),
        F.when(ck % 20 == 19, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lower(F.expr("replace(c_name, '#', '.')")),
                             F.lit("@example.com")))
         .alias("email"),
        F.lpad((ck % 100).cast("string"), 2, "0").alias("phone"),
        F.col("n_name").alias("country"),
        F.concat(F.col("n_name"), F.lit(" City "),
                 (ck % 3).cast("string")).alias("city"),
        F.when(ck % 25 == 13, F.lit("not-a-date"))
         .otherwise(F.date_format("first_order_ts", "yyyy-MM-dd'T'HH:mm:ss"))
         .alias("registered_raw"),
        F.col("r_name").alias("region"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.concat(F.lit("https://pics.example.com/"), ck.cast("string"),
                 F.lit(".jpg")).alias("thumbnail"),
    )


def users_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users_base plus verbatim duplicates of every 10th customer —
    the pipeline's dirty input (rows_in).

    Implemented as explode-of-copies, not union-of-two-scans: one pass
    over the join pipeline produces both copies, halving scan+join work
    everywhere users_raw is consumed (the oracle's UNION ALL is the
    semantic spec; this is the cheaper physical plan)."""
    base = users_base(spark, sf_dir)
    copies = F.when(F.col("custkey") % 10 == 0,
                    F.array(F.lit(0), F.lit(1))).otherwise(F.array(F.lit(0)))
    return (base.withColumn("_copy", F.explode(copies))
            .drop("_copy"))


def valid_predicate():
    """THE validity rule (reference P4-P6): non-null email/id and a
    parseable registration timestamp (as the already-derived
    ``registered_ts`` column).  Single source of truth shared by
    valid_from, the P6 funnel counter (core._validity_filter_counts)
    and the single-pass flagship — a hand-kept copy of the conjuncts
    once drifted (the counter dropped `id IS NOT NULL`, so its
    rows_valid could exceed the users_valid count feeding rows_out)."""
    return (F.col("email").isNotNull()
            & F.col("id").isNotNull()
            & F.col("registered_ts").isNotNull())


def valid_from(raw: DataFrame) -> DataFrame:
    """Validity filter (reference P4-P6) applied to a GIVEN raw frame.
    Adds ``registered_ts``.  Frame-based so pipelines with an injected
    source derive every downstream stage from the SAME extract
    (run_pipeline once mixed an injected extract's rows_in with the
    default source's transform counts)."""
    with_ts = raw.withColumn(
        "registered_ts", F.try_to_timestamp(F.col("registered_raw"))
    )
    return with_ts.where(valid_predicate())


def clean_from(raw: DataFrame) -> DataFrame:
    """Valid + exact-deduped (reference D1, `dedup_removed`) from a
    GIVEN raw frame.  FULL-ROW distinct, not dropDuplicates(['id']):
    it is the oracle spec verbatim (oracles.USERS_CTE: ``SELECT
    DISTINCT * FROM users_valid``) — identical on the fixture either
    way since duplicates are verbatim copies, but distinct() also
    matches the spec on a hostile input where two DIFFERENT rows share
    an id — and it compiles to a pure HashAggregate (grouping keys
    only, no agg buffers).  dropDuplicates(['id']) planned as first()
    aggregates, whose var-length string buffers force the
    SortAggregate fallback: two extra sorts per run, the r4->r5
    window_rank bench regression."""
    return valid_from(raw).distinct()


def users_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return valid_from(users_raw(spark, sf_dir))


def users_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    cached = _USERS_CLEAN_CACHE.get(_users_cache_key(spark, sf_dir))
    if cached is not None:
        return cached
    return clean_from(users_raw(spark, sf_dir))
