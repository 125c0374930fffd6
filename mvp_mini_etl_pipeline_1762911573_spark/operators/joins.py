"""Join operators (SURVEY.md §2.3 J1-J4).

The reference has no joins (single-entity pipeline, 651 LoC, none of
hash/merge/broadcast appears); these realize its user⋈country semantics
over the driver star schema, as SURVEY.md §2.3 mandates.

Scale notes (100 TB):
* J1/J2 — nation (25 rows) and region (5 rows) are always broadcast;
  customer⋈orders is the real shuffle.  We broadcast explicitly so the
  plan is stable even if stats are missing; Catalyst+AQE would pick the
  same under CBO.
* J3 left join keeps the big probe side un-shuffled when the build side
  broadcasts.
* J4 semi/anti joins never materialize the right side's payload columns
  — at scale prefer them over `IN (subquery)`/`EXISTS` rewrites you'd
  hand-roll; Catalyst plans them as BroadcastHashJoin(LeftSemi/LeftAnti)
  when the right side is small after aggregation-pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import finite_or_null, money_sum, money_sum_sql
from ..tables import load


def _join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: customer ⋈ nation ⋈ region, revenue per region-nation from
    orders — a 3-way equi join ending in a grouped agg."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    orders = load(spark, sf_dir, "orders")
    joined = (
        orders
        .join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .join(F.broadcast(nation),
              customer.c_nationkey == nation.n_nationkey, "inner")
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey, "inner")
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"),
                       F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("order_cnt"),
             money_sum("o_totalprice").alias("revenue"))
    )


def _join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: explicit broadcast of the small dim — supplier⋈nation with
    per-nation supplier account balance."""
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supplier.join(F.broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey, "inner")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("suppliers"),
             money_sum("s_acctbal").alias("total_acctbal"))
    )


def _join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer — every customer with order count (0 for none)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"),
        money_sum("o_totalprice").alias("spent"))
    return (
        customer.join(per_cust,
                      customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.coalesce("cnt", F.lit(0)).alias("order_cnt"),
            F.coalesce("spent", F.lit(0.0)).alias("total_spent"),
        )
    )


def _join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4a: left semi — customers having at least one 'F' order."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    f_orders = orders.where(F.col("o_orderstatus") == "F")
    return (
        customer.join(f_orders,
                      customer.c_custkey == f_orders.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"),
                F.col("c_name").alias("name"))
    )


def _join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b: left anti — customers with no URGENT order (every customer
    has some order in the testdata, so the unfiltered anti is vacuous;
    the predicate keeps the result non-degenerate at every sf)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(orders,
                      customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"),
                F.col("c_name").alias("name"),
                F.col("c_mktsegment").alias("segment"))
    )


def _join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: bucket each part into a price band table.
    Catalyst executes as BroadcastNestedLoopJoin (bands tiny == fine);
    at scale, bin the probe side first to make it an equi join."""
    part = load(spark, sf_dir, "part")
    bands = _price_bands(spark)   # shared with _join_range_binned
    return (
        part.join(F.broadcast(bands),
                  (part.p_retailprice >= bands.lo)
                  & (part.p_retailprice < bands.hi), "inner")
        .groupBy("band")
        .agg(F.count("*").alias("parts"),
             F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
    )


BIN_WIDTH = 50.0  # price units per bin for the binned range join.
#                   Size so a typical band spans O(1..100) bins: the
#                   replicated side grows by (band_width / BIN_WIDTH)
#                   rows per band, the probe side never replicates.


def _join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale rewrite `_join_range`'s docstring promises: turn the
    non-equi band join into an EQUI join on an integer price bin.

    BroadcastNestedLoopJoin evaluates bands × parts predicates — fine
    for 3 bands, quadratic death if the bands table grows (think 10^5
    dynamic pricing tiers × 10^10 parts).  Instead:

      1. probe side: bin = floor(price / W)  (narrow map, no shuffle)
      2. build side: explode each band into the bins it overlaps —
         sequence(floor(lo/W), floor((hi-ε)/W)), with `hi` clamped to
         the observed domain max (a 1-row broadcast agg, folded into
         the same DAG — no driver-side action) so an open-ended band
         like [966, 1e9) replicates to ~25 bins, not 2×10^7
      3. equi-join on bin (hash/broadcast — Catalyst's choice),
         re-check the exact lo/hi predicate to trim bin-edge spill

    Result provably equals the BNLJ plan — the oracle is the plain
    range join, same as `join_range`'s.
    """
    # r11 extreme-doubles sweep + r12: floor(inf / W) overflows the
    # INT bin cast — and so does a FINITE price past the top band's
    # 1e9 ceiling.  Prices >= 1e9 match NO band (the open band is
    # [966, 1e9)), so pre-filtering them is the join's own drop moved
    # ahead of the bin arithmetic; the plain range-join oracle drops
    # them naturally, so semantics are untouched
    part = load(spark, sf_dir, "part").where(
        finite_or_null("p_retailprice")
        & (F.col("p_retailprice").isNull()
           | (F.col("p_retailprice") < 1e9)))
    return range_binned_join(part, _price_bands(spark))


def _price_bands(spark: SparkSession) -> DataFrame:
    return spark.sql("""
        SELECT * FROM VALUES
          ('low', 0.0D, 933.0D), ('mid', 933.0D, 966.0D),
          ('high', 966.0D, 1e9D)
        AS bands(band, lo, hi)
    """)


def binned_bands(bands: DataFrame, maxp: DataFrame) -> DataFrame:
    """Explode each [lo, hi) band into the integer price bins it
    overlaps, with ``hi`` clamped to the observed domain max (``maxp``
    is a 1-row max_price aggregate kept in the DAG via broadcast
    crossJoin).  Factored out of the query so the impossible-band guard
    is testable in isolation (tests/test_latents.py)."""
    start_bin = F.floor(F.col("lo") / BIN_WIDTH).cast("int")
    stop_bin = (F.floor(F.least(F.col("hi") - F.lit(1e-9),
                                F.col("max_price")) / BIN_WIDTH)
                .cast("int"))
    return (
        bands.crossJoin(F.broadcast(maxp))
        # drop bands whose lo exceeds the clamped stop BEFORE exploding:
        # sequence(start, stop) with start > stop generates a DESCENDING
        # range, silently replicating an impossible band into bins below
        # its own lo (the exact re-check keeps results correct, but the
        # replication bound this rewrite exists for would be violated)
        .where(start_bin <= stop_bin)
        .withColumn("bin", F.explode(F.sequence(start_bin, stop_bin)))
        .select("band", "lo", "hi", "bin")
    )


def range_binned_join(part: DataFrame, bands: DataFrame) -> DataFrame:
    """The bin-explode equi-join rewrite over an arbitrary bands table
    (see _join_range_binned for the full rationale)."""
    # domain max as a 1-row DF: crossJoin(broadcast) keeps it in the
    # DAG (one extra scan of one column, map-side min/max — cheap) vs
    # a driver-side .collect() that would serialize the pipeline
    maxp = part.agg(F.max("p_retailprice").alias("max_price"))
    binned_part = part.withColumn(
        "bin", F.floor(F.col("p_retailprice") / BIN_WIDTH).cast("int"))
    return (
        binned_part.join(F.broadcast(binned_bands(bands, maxp)), "bin")
        .where((F.col("p_retailprice") >= F.col("lo"))
               & (F.col("p_retailprice") < F.col("hi")))
        .groupBy("band")
        .agg(F.count("*").alias("parts"),
             F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
    )


SALT_BUCKETS = 8  # fan-out for the salted join below.  Size to the
#                   observed skew: hot-key rows / target-partition-rows.


def _join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: skew-mitigated (salted) equi join — the manual remedy when
    one join key dominates (a 100 TB fact table where a handful of
    customers hold 1% of all orders each would stall its sort-merge
    reducers).  AQE's skewJoin handles detected skew automatically at
    runtime; the explicit salt is for skew known a priori, for
    broadcast-ineligible build sides, or when AQE is off.

    Shape: the fact side tags each row with a deterministic salt
    pmod(hash(orderkey), S); the dim side replicates S× (explode of a
    0..S-1 sequence); the join key widens to (custkey, salt) so one hot
    custkey's rows spread across S reducers instead of one.  The
    replicated dim carries only the columns the query needs (S× a
    narrow projection, not S× the table).  Results are provably
    salt-invariant — the oracle is the PLAIN join, which is exactly the
    point."""
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders")
    salted_orders = orders.withColumn(
        "salt", F.pmod(F.hash("o_orderkey"), F.lit(SALT_BUCKETS)))
    salted_customer = customer.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    return (
        salted_orders.join(
            salted_customer,
            (salted_orders.o_custkey == salted_customer.c_custkey)
            & (salted_orders.salt == salted_customer.salt))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("order_cnt"),
             money_sum("o_totalprice").alias("revenue"))
    )


def _merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) semantics without a table format: full-outer
    join on the key + coalesce picks the update when matched, the
    target otherwise, and keeps unmatched inserts.  The exact pattern a
    lakehouse MERGE compiles to; with Delta/Iceberg available you'd
    write `MERGE INTO` and the format would also skip untouched files.
    Updates = +100 acctbal for custkey%7==0; inserts = synthetic new
    customers (custkey+1000000, segment NEW).  Output is the per-segment
    post-merge rollup so the result is deterministic and hashable.

    Scale: one shuffle on the merge key for both sides; the rollup
    reuses nothing wider than (segment, acctbal)."""
    customer = load(spark, sf_dir, "customer")
    updates = (
        customer.where(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey").alias("u_key"),
                (F.col("c_acctbal") + 100).alias("u_acctbal"))
        .unionByName(
            customer.where(F.col("c_custkey") % 97 == 0)
            .select((F.col("c_custkey") + 1000000).alias("u_key"),
                    F.lit(50.0).alias("u_acctbal")))
    )
    merged = (
        customer.join(updates,
                      customer.c_custkey == updates.u_key, "full_outer")
        .select(
            F.coalesce(F.col("u_key"), F.col("c_custkey")).alias("custkey"),
            F.coalesce(F.col("u_acctbal"), F.col("c_acctbal"))
             .alias("acctbal"),
            F.coalesce(F.col("c_mktsegment"), F.lit("NEW")).alias("segment"),
        )
    )
    return (
        merged.groupBy("segment")
        .agg(F.count("*").alias("rows"),
             money_sum("acctbal").alias("total_acctbal"))
        .orderBy("segment")
    )


def _join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): two per-key
    aggregates of the events table joined on a key that is NULL for
    'error' rows — a plain = join would silently drop the NULL group
    from both sides; <=> matches NULL with NULL and stays a hash join
    (the null-safe comparator is still an equi key, so Catalyst keeps
    broadcast/sort-merge eligibility — no fallback to BNLJ)."""
    ev = load(spark, sf_dir, "events")
    key = F.when(F.col("event_type") != "error", F.col("event_type"))
    a = (ev.where(F.col("event_id") % 7 == 0)
         .groupBy(key.alias("k"))
         .agg(F.count("*").alias("cnt_a"),
              money_sum("value").alias("val_a")))
    b = (ev.where(F.col("event_id") % 5 == 0)
         .groupBy(key.alias("k"))
         .agg(F.count("*").alias("cnt_b"),
              money_sum("value").alias("val_b")))
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]), "full_outer")
        .select(F.coalesce(a["k"], b["k"]).alias("key_type"),
                "cnt_a", "val_a", "cnt_b", "val_b")
    )


FUZZY_MAX_DIST = 3  # edit-distance threshold for a candidate match


def _join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: blocked fuzzy-match join (record linkage / entity
    resolution) — find near-identical part names by edit distance.
    The naive formulation is an all-pairs cross join with a
    levenshtein predicate, which is O(n²) comparisons and a cartesian
    plan — a scale-killer.  The standard linkage rewrite used here is
    BLOCKING: derive a cheap deterministic block key (the name's last
    token — linkage folklore: compare only records that already agree
    on something), equi-join on it so Catalyst plans a plain hash
    join, and run the expensive levenshtein only within blocks.  At
    100 TB the block key is what turns entity resolution from
    impossible into one shuffle; skewed blocks get the same salting
    treatment as any skewed join key (`join_salted`).

    Names are deduped (with partkey counts) BEFORE pairing — linkage
    runs over the distinct-entity table, not the raw rows, which is
    both semantics (entities, not mentions) and a large input cut.
    levenshtein() is a JVM built-in with identical plain-edit-distance
    semantics in DuckDB; `<` on the name pair keeps each unordered
    pair once."""
    names = (load(spark, sf_dir, "part")
             .groupBy("p_name").agg(F.count("*").alias("n_parts")))
    blocked = names.select(
        F.col("p_name").alias("name"), "n_parts",
        F.regexp_extract("p_name", r"(\S+)$", 1).alias("block"))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, "block")
        .where(F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"),
                F.levenshtein("a.name", "b.name").alias("dist"),
                F.col("a.n_parts").alias("parts_a"),
                F.col("b.n_parts").alias("parts_b"))
        .where(F.col("dist") <= FUZZY_MAX_DIST)
    )


ER_MAX_ITERS = 10  # safety bound; fuzzy-match components live inside
#                    one block (names agreeing on the last token), so
#                    diameter is bounded by the block's variant count
#                    and propagation converges in 2-3 rounds here


def _entity_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: entity canonicalization — the last stage of the record-
    linkage pipeline that `join_fuzzy` starts: fuzzy matches form an
    equivalence graph over the distinct part names; connected
    components merge transitively-linked variants into one entity; the
    lexicographically smallest member becomes the canonical name every
    variant maps to (the merge a master-data/dedup system applies).

    Same iterative min-label propagation as `dedup_clusters` (string
    min instead of integer min): per round, each node takes the min of
    its label and its neighbors' labels — one equi-join + one groupBy
    per round, O(diameter) rounds, fixpoint detected by a changed-row
    count (with the same capped-loop warning discipline).  The edge
    table and each round's labels are localCheckpointed (the
    dedup_clusters discipline): without it, round r's `changed`
    action re-executes the blocked levenshtein fuzzy join and all
    r-1 prior rounds from scratch — O(rounds²) fuzzy joins and
    unbounded lineage depth; with it, each round is one bounded job
    over materialized inputs.  The label table is over distinct
    ENTITIES, not rows, so it stays broadcast-small relative to the
    corpus even at 100 TB.  Names with no fuzzy match are their own
    canonical and
    are excluded here (mirrors dedup_clusters' members-only output;
    the identity mapping adds nothing).

    Oracle: recursive-CTE transitive closure + min over reachable
    names — closed-form recursion vs iterative loop, the same
    cross-paradigm differential as dedup_clusters."""
    import warnings

    matches = _join_fuzzy(spark, sf_dir)
    sym = (matches.select(F.col("name_a").alias("src"),
                          F.col("name_b").alias("dst"))
           .union(matches.select(F.col("name_b").alias("src"),
                                 F.col("name_a").alias("dst")))
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint(eager=True))
    for _ in range(ER_MAX_ITERS):
        nbr = (sym.join(labels, sym["dst"] == labels["node"])
               .groupBy(F.col("src").alias("node"))
               .agg(F.min("label").alias("nbr_min")))
        # r14 (the dedup_clusters discipline, both halves): the
        # convergence signal rides the label frame itself — changed ⟺
        # a strictly smaller neighbor label arrived — instead of a
        # separate old-vs-new join job, and the LAZY checkpoint
        # materializes inside the probing count, so each round is ONE
        # Spark job instead of three (ckpt + probe-join + count).
        new_labels = (
            labels.join(nbr, "node", "left")
            .select("node",
                    F.least("label", F.coalesce("nbr_min", "label"))
                     .alias("label"),
                    (F.coalesce("nbr_min", "label") < F.col("label"))
                     .alias("changed"))
            .localCheckpoint(eager=False))
        changed = new_labels.where("changed").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        warnings.warn(
            f"_entity_canonical hit ER_MAX_ITERS={ER_MAX_ITERS} without "
            "converging; labels are only locally consistent",
            stacklevel=2)
    sizes = labels.groupBy(F.col("label").alias("canonical")).agg(
        F.count("*").alias("cluster_size"))
    return (labels
            .select(F.col("node").alias("name"),
                    F.col("label").alias("canonical"))
            .join(sizes, "canonical")
            .select("name", "canonical", "cluster_size"))


QUERIES = {
    "join_fuzzy": _join_fuzzy,
    "entity_canonical": _entity_canonical,
    "join_salted": _join_salted,
    "merge_upsert": _merge_upsert,
    "join_null_safe": _join_null_safe,
    "join_equi": _join_equi,
    "join_broadcast": _join_broadcast,
    "join_left": _join_left,
    "join_semi": _join_semi,
    "join_anti": _join_anti,
    "join_range": _join_range,
    "join_range_binned": _join_range_binned,
}

ORACLES = {
    "entity_canonical": f"""
WITH RECURSIVE names AS (
  SELECT p_name FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name AS name,
         regexp_extract(p_name, '(\\S+)$', 1) AS block
  FROM names
), pairs AS (
  SELECT a.name AS src, b.name AS dst
  FROM blocked a JOIN blocked b ON a.block = b.block AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
), edges AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), labels AS (
  SELECT node, min(r) AS canonical FROM (
    SELECT src AS node, dst AS r FROM reach
    UNION ALL
    SELECT DISTINCT src AS node, src AS r FROM edges
  ) GROUP BY node
)
SELECT l.node AS name, l.canonical, s.cluster_size
FROM labels l
JOIN (SELECT canonical, CAST(count(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY canonical) s USING (canonical)
""",
    "join_fuzzy": f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
), blocked AS (
  SELECT p_name AS name, n_parts,
         regexp_extract(p_name, '(\\S+)$', 1) AS block
  FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
       a.n_parts AS parts_a, b.n_parts AS parts_b
FROM blocked a JOIN blocked b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
""",
    "join_null_safe": f"""
WITH a AS (
  SELECT CASE WHEN event_type != 'error' THEN event_type END AS k,
         CAST(count(*) AS BIGINT) AS cnt_a,
         {money_sum_sql("value")} AS val_a
  FROM events WHERE event_id % 7 = 0 GROUP BY 1
), b AS (
  SELECT CASE WHEN event_type != 'error' THEN event_type END AS k,
         CAST(count(*) AS BIGINT) AS cnt_b,
         {money_sum_sql("value")} AS val_b
  FROM events WHERE event_id % 5 = 0 GROUP BY 1
)
SELECT coalesce(a.k, b.k) AS key_type, cnt_a, val_a, cnt_b, val_b
FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    # the salted plan must produce the PLAIN join's result — the oracle
    # is deliberately salt-free
    "join_salted": f"""
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    "merge_upsert": f"""
WITH updates AS (
  SELECT c_custkey AS u_key, c_acctbal + 100 AS u_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 50.0
  FROM customer WHERE c_custkey % 97 = 0
), merged AS (
  SELECT coalesce(u.u_key, t.c_custkey) AS custkey,
         coalesce(u.u_acctbal, t.c_acctbal) AS acctbal,
         coalesce(t.c_mktsegment, 'NEW') AS segment
  FROM customer t FULL OUTER JOIN updates u ON t.c_custkey = u.u_key
)
SELECT segment, CAST(count(*) AS BIGINT) AS rows,
       {money_sum_sql("acctbal")} AS total_acctbal
FROM merged GROUP BY segment ORDER BY segment
""",
    "join_equi": f"""
SELECT r_name AS region, n_name AS nation,
       CAST(count(*) AS BIGINT) AS order_cnt,
       {money_sum_sql("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "join_broadcast": f"""
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS suppliers,
       {money_sum_sql("s_acctbal")} AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
    "join_left": f"""
SELECT c_custkey AS custkey, c_mktsegment AS segment,
       CAST(coalesce(cnt, 0) AS BIGINT) AS order_cnt,
       coalesce(spent, 0.0) AS total_spent
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt, {money_sum_sql("o_totalprice")} AS spent
  FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
""",
    "join_semi": """
SELECT c_custkey AS custkey, c_name AS name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
    "join_anti": """
SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
""",
    "join_range": """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 933.0), ('mid', 933.0, 966.0), ('high', 966.0, 1e9)
)
SELECT band, CAST(count(*) AS BIGINT) AS parts,
       round(avg(p_retailprice), 2) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
    # the binned equi-join rewrite must produce the PLAIN range join's
    # result — the oracle is deliberately bin-free (same as join_range)
    "join_range_binned": """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 933.0), ('mid', 933.0, 966.0), ('high', 966.0, 1e9)
)
SELECT band, CAST(count(*) AS BIGINT) AS parts,
       round(avg(p_retailprice), 2) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
""",
}
