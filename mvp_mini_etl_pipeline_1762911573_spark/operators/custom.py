"""Custom operators Spark lacks as built-ins (SURVEY.md §2.11 + §2.3):
as-of join, a pandas-UDF scalar, and an applyInPandas grouped UDAF.

Policy (SURVEY.md §2.11): built-ins first — the as-of join is a pure
composition of union + partitioned window (no UDF at all); Python
crosses the Arrow boundary only in the two demos that exist to prove
the vectorized-UDF surface.

Scale notes (100 TB):
* As-of join via union+window is the shuffle-minimal pattern: ONE hash
  shuffle on the join key, then a per-key sorted traversal (the same
  plan a native as-of operator would pick; Flink/Pandas merge_asof
  equivalents).  No range cross-join, no per-row probe.
* pandas UDFs move Arrow batches, not rows; still JVM→Python→JVM — so
  they appear ONLY where built-ins can't express the math (here: demo;
  the cosine built-in in similarity.py is the production path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf

from ..tables import load


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (direction='backward') or the earliest right
    row with right_ts >= left_ts (direction='forward') within the same
    key.  Composition: tag both sides, union, per-key window ordered by
    (ts, tag) carrying the right payload across, keep left rows.

    Equivalent to DuckDB/QuestDB ASOF JOIN (either inequality
    direction) and pandas merge_asof — one shuffle on `key`, linear
    scan per partition.

    The right payload travels as ONE struct column, not per-column
    last(ignorenulls) carries: carrying columns independently would
    let a NULL in one payload field of the matched row be filled from
    a DIFFERENT (farther) right row, stitching together a row that
    never existed."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got "
            f"{direction!r}")
    payload_t = ", ".join(
        f"{c}: {right.schema[c].dataType.simpleString()}"
        for c in right_cols)
    lt = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"), "*",
        F.lit(None).cast(f"struct<{payload_t}>").alias("_payload"),
    )
    # JOIN semantics for NULLs (r11 all-NULL sweep): a NULL key or
    # NULL timestamp matches NOTHING in an as-of join — but Spark
    # windows GROUP NULL partition keys and sort NULL timestamps
    # first, so without these guards a NULL-keyed left row stitched a
    # payload from the NULL-key "partition" and a NULL-ts right row
    # became visible to every left row.  Right rows with NULL key/ts
    # are dropped from the carry stream; left rows always survive
    # (left-join contract) with their payload masked below.
    rt = right.where(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
        F.struct(*right_cols).alias("_payload"),
    )
    merged = lt.unionByName(rt)
    if direction == "backward":
        # right rows sort before left rows at equal ts (tag 0 < 1) so a
        # same-timestamp right row IS visible to the left row (<=)
        w = (Window.partitionBy("_k")
             .orderBy("_ts", "_is_left")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last
    else:
        # forward: left rows sort before right rows at equal ts (tag
        # desc) so a same-timestamp right row is visible looking ahead
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_ts").asc(), F.col("_is_left").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first
    carried = merged.select(
        "*",
        pick("_payload", ignorenulls=True).over(w).alias("_asof"),
    )
    matchable = F.col("_k").isNotNull() & F.col("_ts").isNotNull()
    return (
        carried.where(F.col("_is_left") == 1)
        .select(*[f.name for f in left.schema.fields],
                *[F.when(matchable, F.col("_asof")[c]).alias(c)
                  for c in right_cols])
    )


def _asof_inputs(spark: SparkSession, sf_dir: str):
    """Shared inputs for both as-of query flavors: the order subset,
    and the event stream made unique per (uid, ts) for determinism
    (keep max event_id among same-timestamp events) — one definition
    so backward and forward can never disagree about which events
    exist."""
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        (F.col("o_custkey") % 500).alias("uid"),
        F.col("o_orderdate"))
    events = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 500).alias("uid"),
        F.col("ts"), F.col("event_id"), F.col("event_type"))
    dedup_w = Window.partitionBy("uid", "ts").orderBy(
        F.col("event_id").desc())
    events_u = (events.withColumn("_rn", F.row_number().over(dedup_w))
                .where(F.col("_rn") == 1).drop("_rn"))
    return orders, events_u


def _asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each order picks the user's latest event at or
    before the order date (events.user_id ≡ customer key space mod)."""
    orders, events_u = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        orders, events_u, key="uid",
        left_ts="o_orderdate", right_ts="ts",
        right_cols=["event_id", "event_type"],
    )
    return joined.select(
        "o_orderkey", "uid",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate"),
        "event_id", "event_type",
    )


def _asof_forward_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with a 30-day tolerance cap: each order picks the
    user's EARLIEST event at or after the order date; matches farther
    than 30 days out are nulled (tolerance semantics, like pandas
    merge_asof(tolerance=...)).  Same union+window single-shuffle plan
    as the backward flavor — the cap is a post-join null-out, not a
    range join."""
    orders, events_u = _asof_inputs(spark, sf_dir)
    joined = asof_join(
        orders, events_u, key="uid",
        left_ts="o_orderdate", right_ts="ts",
        right_cols=["ts", "event_id", "event_type"],
        direction="forward",
    )
    in_tol = F.col("ts") <= F.col("o_orderdate") + F.expr(
        "INTERVAL 30 DAYS")
    return joined.select(
        "o_orderkey", "uid",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate"),
        F.when(in_tol, F.col("event_id")).alias("event_id"),
        F.when(in_tol, F.col("event_type")).alias("event_type"),
        F.when(in_tol, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
         .alias("evt_ts"),
    )


def _udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 pandas-UDF demo: cosine of each embedding against the
    all-ones vector, vectorized over Arrow batches in numpy."""

    @pandas_udf("double")
    def cos_ones(v: pd.Series) -> pd.Series:
        import numpy as np
        # batch-level conversion, not a per-row lambda (see
        # similarity._f64_matrix — same 8x measured win, same values)
        m = np.array(v.to_list(), dtype="float64")
        dot = m.sum(axis=1)
        return pd.Series(
            dot / (np.linalg.norm(m, axis=1) * np.sqrt(m.shape[1])))

    # NULL embeddings are excluded BEFORE the UDF (np.stack over a None
    # crashes the Python worker — the r11 all-NULL sweep's crash class;
    # the embedding family's shared exclusion contract, see
    # similarity.assign_cells); the oracle carries the same predicate
    emb = load(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull())
    return emb.select(
        "vec_id", F.round(cos_ones("embedding"), 6).alias("cos_to_ones"))


MODE_SCHEMA = "user_id bigint, mode_type string, n_events bigint"


def _udaf_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 applyInPandas grouped-UDAF demo: per-user modal event
    type (ties → lexicographically smallest).  The oracle uses a
    window-count argmax with the same tie rule."""

    def mode_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = (pdf.groupby("event_type").size()
                  .reset_index(name="n")
                  .sort_values(["n", "event_type"],
                               ascending=[False, True]))
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "mode_type": [counts["event_type"].iloc[0]],
            "n_events": [len(pdf)],
        })

    ev = load(spark, sf_dir, "events").where(F.col("user_id") % 10 == 1)
    return (ev.select("user_id", "event_type")
            .groupBy("user_id").applyInPandas(mode_fn, MODE_SCHEMA))


def _udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 Python UDTF demo (completes the UDF/UDAF/UDTF triad): a
    table function exploding each document into (pos, token) rows,
    consumed via a correlated LATERAL join.  Arrow-optimized
    (useArrow=True) so the exec node is ArrowEvalPythonUDTF — batches,
    not rows, cross the Python boundary (the engine-wide plan test
    bans BatchEvalPython).

    A UDTF is the right shape when one input row yields a variable
    number of output rows AND the expansion logic needs Python; for
    plain whitespace tokens the built-in posexplode(split()) is the
    production path — this demo exists to prove the surface, like
    udf_cosine.  Scale: the lateral expansion is map-side (no
    shuffle); output partitioning inherits the input's."""
    from pyspark.sql.functions import udtf

    import re

    @udtf(returnType="pos int, token string", useArrow=True)
    class TokenizeUDTF:
        # EXACTLY RE2's \s class [\t\n\f\r ], matching the DuckDB
        # oracle's '\s+' — Python str.split() would also split on
        # NBSP/U+2009 etc., and Python's \s (or an ASCII class with
        # \v) splits on vertical tab where RE2 does not.  Pinned by
        # tests/test_latents.py on NBSP/thin-space/VT documents.
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(
                        t for t in re.split(r"[ \t\n\r\f]+", text) if t):
                    yield i + 1, tok

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql("""
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t
    """)


def _asof_nearest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (third flavor, pandas merge_asof
    direction='nearest'): each order picks the user's event CLOSEST in
    time, either side; equidistant ties go backward (the earlier
    event — decided, documented, and mirrored in the oracle).

    Plan: ONE union + ONE key shuffle + ONE sort evaluates BOTH
    directions — the backward carry (last over the preceding frame)
    and the forward carry (first over the following frame) are two
    window functions sharing a single (partition, order) spec, so
    WindowExec computes them in the same pass; `nearest` then is a
    map-side CASE on the two candidates' microsecond distances.  The
    one ordering (_ts, right-before-left at equal ts) makes a
    same-timestamp event visible to the BACKWARD carry only — harmless
    for nearest: its distance is 0, so backward wins regardless.

    The DuckDB oracle runs two native ASOF JOINs (<= and >=) and the
    same tie CASE — a different algorithm entirely (DuckDB's
    interpolated-search asof vs this union-window carry), which is the
    cross-paradigm check worth having for join semantics."""
    orders, events_u = _asof_inputs(spark, sf_dir)
    payload_t = ("ts: timestamp, event_id: bigint, event_type: string")
    lt = orders.select(
        F.col("uid").alias("_k"), F.col("o_orderdate").alias("_ts"),
        F.lit(1).alias("_is_left"), "o_orderkey", "uid", "o_orderdate",
        F.lit(None).cast(f"struct<{payload_t}>").alias("_payload"))
    # same NULL-join contract as asof_join: NULL-keyed/NULL-ts events
    # can never be anyone's nearest, and NULL-keyed/NULL-dated orders
    # match nothing (masked below)
    rt = events_u.where(
        F.col("uid").isNotNull() & F.col("ts").isNotNull()).select(
        F.col("uid").alias("_k"), F.col("ts").alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("bigint").alias("uid"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.struct("ts", "event_id", "event_type").alias("_payload"))
    merged = lt.unionByName(rt)
    wb = (Window.partitionBy("_k").orderBy("_ts", "_is_left")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("_k").orderBy("_ts", "_is_left")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    carried = merged.select(
        "*",
        F.last("_payload", ignorenulls=True).over(wb).alias("_prev"),
        F.first("_payload", ignorenulls=True).over(wf).alias("_next"))
    lts = F.unix_micros("o_orderdate")
    prev_d = lts - F.unix_micros(F.col("_prev")["ts"])
    next_d = F.unix_micros(F.col("_next")["ts"]) - lts
    take_prev = F.col("_next").isNull() | (
        F.col("_prev").isNotNull() & (prev_d <= next_d))
    matchable = F.col("_k").isNotNull() & F.col("_ts").isNotNull()
    chosen = F.when(
        matchable,
        F.when(take_prev, F.col("_prev")).otherwise(F.col("_next")))
    return (
        carried.where(F.col("_is_left") == 1)
        .select(
            "o_orderkey", "uid",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
             .alias("odate"),
            chosen["event_id"].alias("event_id"),
            chosen["event_type"].alias("event_type"),
            F.when(chosen.isNotNull(),
                   F.when(take_prev, "backward").otherwise("forward"))
             .alias("side"))
    )


QUERIES = {
    "asof_join": _asof_query,
    "asof_forward": _asof_forward_query,
    "asof_nearest": _asof_nearest_query,
    "udf_cosine": _udf_cosine,
    "udaf_mode": _udaf_mode,
    "udtf_tokens": _udtf_tokens,
}

ORACLES = {
    "asof_nearest": """
WITH o AS (
  SELECT o_orderkey, o_custkey % 500 AS uid, o_orderdate
  FROM orders WHERE o_orderkey % 50 = 0
), e AS (
  SELECT uid, ts, event_id, event_type FROM (
    SELECT user_id % 500 AS uid, ts, event_id, event_type,
           row_number() OVER (PARTITION BY user_id % 500, ts
                              ORDER BY event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
), both_sides AS (
  SELECT o.o_orderkey, o.uid AS uid, o.o_orderdate,
         b.ts AS b_ts, b.event_id AS b_id, b.event_type AS b_type,
         f.ts AS f_ts, f.event_id AS f_id, f.event_type AS f_type
  FROM o
  ASOF LEFT JOIN e b ON o.uid = b.uid AND b.ts <= o.o_orderdate
  ASOF LEFT JOIN e f ON o.uid = f.uid AND f.ts >= o.o_orderdate
)
SELECT o_orderkey, uid,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
       CASE WHEN take_prev THEN b_id ELSE f_id END AS event_id,
       CASE WHEN take_prev THEN b_type ELSE f_type END AS event_type,
       CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
            WHEN take_prev THEN 'backward' ELSE 'forward'
       END AS side
FROM (
  SELECT *,
         f_ts IS NULL OR (b_ts IS NOT NULL AND
           epoch_us(o_orderdate) - epoch_us(b_ts)
             <= epoch_us(f_ts) - epoch_us(o_orderdate)) AS take_prev
  FROM both_sides)
""",
    "asof_join": """
WITH o AS (
  SELECT o_orderkey, o_custkey % 500 AS uid, o_orderdate
  FROM orders WHERE o_orderkey % 50 = 0
), e AS (
  SELECT uid, ts, event_id, event_type FROM (
    SELECT user_id % 500 AS uid, ts, event_id, event_type,
           row_number() OVER (PARTITION BY user_id % 500, ts
                              ORDER BY event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
)
SELECT o_orderkey, o.uid AS uid,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
       e.event_id, e.event_type
FROM o ASOF LEFT JOIN e
  ON o.uid = e.uid AND e.ts <= o.o_orderdate
""",
    "udf_cosine": """
SELECT vec_id,
       round(
         list_sum(embedding::DOUBLE[]) /
         (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
          * sqrt(len(embedding))), 6) AS cos_to_ones
FROM embeddings WHERE embedding IS NOT NULL
""",
    "udaf_mode": """
SELECT user_id, mode_type, n_events FROM (
  SELECT user_id, event_type AS mode_type,
         CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type ASC) AS rn
  FROM (SELECT user_id, event_type, count(*) AS cnt
        FROM events WHERE user_id % 10 = 1
        GROUP BY user_id, event_type)
) WHERE rn = 1
""",
    "asof_forward": """
WITH o AS (
  SELECT o_orderkey, o_custkey % 500 AS uid, o_orderdate
  FROM orders WHERE o_orderkey % 50 = 0
), e AS (
  SELECT uid, ts, event_id, event_type FROM (
    SELECT user_id % 500 AS uid, ts, event_id, event_type,
           row_number() OVER (PARTITION BY user_id % 500, ts
                              ORDER BY event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
)
SELECT o_orderkey, o.uid AS uid,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
       CASE WHEN e.ts <= o.o_orderdate + INTERVAL 30 DAY
            THEN e.event_id END AS event_id,
       CASE WHEN e.ts <= o.o_orderdate + INTERVAL 30 DAY
            THEN e.event_type END AS event_type,
       CASE WHEN e.ts <= o.o_orderdate + INTERVAL 30 DAY
            THEN strftime(e.ts, '%Y-%m-%d %H:%M:%S') END AS evt_ts
FROM o ASOF LEFT JOIN e
  ON o.uid = e.uid AND e.ts >= o.o_orderdate
""",
    # Python str.split() ≡ split-on-whitespace-runs with no empty
    # tokens; the list_filter drops the empties DuckDB's regex split
    # keeps at string edges
    "udtf_tokens": r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE doc_id % 20 = 0)
SELECT doc_id,
       CAST(unnest(range(1, len(toks)+1)) AS INT) AS pos,
       unnest(toks) AS token
FROM d
""",
}
