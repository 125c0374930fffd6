"""Sinks: CSV with the reference's exact formatting, JSON API payload.

Reference CSV export (pages/index.js:107-133, escaping :446-450):
8 flat columns, header row, every value quoted with `""` escaping,
nulls as empty string, ISO-8601 timestamps.  Spark's csv writer with
quoteAll reproduces this distributed (one file per partition; at 100 TB
you never single-file — the reference's in-browser Blob obviously
doesn't scale past RAM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CSV_COLUMNS = ["id", "name_first", "name_last", "email", "phone",
               "country", "city", "registered_date"]


def flatten_for_csv(users: DataFrame) -> DataFrame:
    """Flatten + null-default projection (reference P3,
    pages/index.js:112-119): every cell coalesced to '' and the
    timestamp rendered ISO-8601 with milliseconds (index.js:119)."""
    cols = {
        "id": F.col("id"),
        "name_first": F.col("name_first"),
        "name_last": F.col("name_last"),
        "email": F.col("email"),
        "phone": F.col("phone"),
        "country": F.col("country"),
        "city": F.col("city"),
        "registered_date": F.date_format(
            "registered_ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
    }
    return users.select(
        *[F.coalesce(expr.cast("string"), F.lit("")).alias(name)
          for name, expr in cols.items()]
    )


def timestamped_path(base_dir: str, now=None) -> str:
    """Reference filename convention (pages/index.js:127):
    `mini-etl-users-${Date.now()}.csv` — epoch milliseconds.  Pass a
    datetime `now` for determinism; defaults to wall-clock like the
    reference.  (Spark writes a DIRECTORY of part files, so the `.csv`
    suffix names the output dir; at 100 TB you never single-file.)"""
    from datetime import datetime, timezone
    epoch_ms = int((now or datetime.now(timezone.utc)).timestamp() * 1000)
    return f"{base_dir}/mini-etl-users-{epoch_ms}.csv"


def write_users_csv(users: DataFrame, path: str) -> None:
    # skip re-flattening ONLY for a conforming frame: every CSV column
    # present as a string (already coalesced/ISO-formatted by
    # flatten_for_csv) — reordered columns are just re-selected into
    # CSV order.  The earlier set-equality check silently accepted a
    # mis-ordered column list (wrong CSV layout) and non-string types
    # (timestamp rendering / unquoted nulls diverge from the
    # reference's coalesced quoted "" cells); a non-conforming hybrid
    # now goes through flatten_for_csv, which fails loudly if the raw
    # source columns are missing rather than writing a bad file.
    all_strings = all(t == "string" for _, t in users.dtypes)
    if users.columns == CSV_COLUMNS and all_strings:
        flat = users
    elif set(users.columns) == set(CSV_COLUMNS) and all_strings:
        flat = users.select(*CSV_COLUMNS)
    else:
        flat = flatten_for_csv(users)
    (flat.write.mode("overwrite")
     .option("header", True)
     .option("quoteAll", True)       # reference quotes every cell
     .option("escapeQuotes", True)   # '"' -> '""' (index.js:448)
     .option("escape", '"')
     # the writer TRIMS cell whitespace by default; the reference's
     # escapeCsv preserves values verbatim (index.js:446-450)
     .option("ignoreLeadingWhiteSpace", False)
     .option("ignoreTrailingWhiteSpace", False)
     .csv(path))


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      dynamic: bool = True) -> None:
    """Partitioned parquet sink with dynamic-partition-overwrite — the
    one write pattern a 100 TB pipeline lives on: an incremental run
    overwrites ONLY the partitions it produced (e.g. today's dates),
    leaving the rest of the table untouched; readers prune scans by
    partition column (PartitionFilters in the read plan, verified in
    tests/test_sinks.py).

    STATIC mode (dynamic=False) is the whole-table replace.  The
    reference has no incremental sink (its export rewrites one CSV blob
    per click, pages/index.js:107-133); this is the scale-path upgrade
    of that sink."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                   "dynamic" if dynamic else "static")
    try:
        (df.write.mode("overwrite")
         .partitionBy(*partition_by)
         .parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(spark, path: str, target_rows_per_file: int) -> int:
    """Small-file compaction — the maintenance job every long-lived
    100 TB table needs: streaming/incremental writers leave thousands
    of KB-sized files per partition, and scan cost becomes dominated by
    file-open overhead and footer reads instead of data.  Rewrites the
    table at ``path`` into ⌈rows / target_rows_per_file⌉ files via a
    staging swap: write _next, move old to _prev, move _next in, drop
    _prev.  Readers never see a HALF-WRITTEN table, but the swap is
    NOT atomic — POSIX cannot exchange two directories in one rename —
    so a reader racing the two moves can hit path-not-found, and a
    crash between them strands the data in _prev; the recovery step
    below restores it on the next run.  True atomicity is table-format
    commit-protocol territory: sources/versioned.py does it properly
    (manifest link-publish), and Iceberg's rewrite_data_files is the
    production equivalent — this function is the pre-table-format
    maintenance flavor.  Row-count equality is the caller's invariant
    (asserted in tests).  Returns the new file count.

    repartition (round-robin shuffle), not coalesce: coalesce(n) caps
    parallelism of everything UPSTREAM of the write and can produce
    skewed files from skewed input partitions; compaction wants evenly
    sized output files, which is worth the one shuffle — this job runs
    off the hot path."""
    import os
    import shutil

    staged = path.rstrip("/") + "_next"
    backup = path.rstrip("/") + "_prev"
    if os.path.exists(backup) and not os.path.exists(path):
        # crashed between the two moves last run: the backup IS the
        # table — restore before compacting
        shutil.move(backup, path)

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(staged)
    shutil.rmtree(backup, ignore_errors=True)
    shutil.move(path, backup)
    shutil.move(staged, path)
    shutil.rmtree(backup, ignore_errors=True)
    return n_files


Z_BITS = 8  # bits per dimension interleaved into the z-value


def zorder_write(df: DataFrame, path: str, col_a: str, col_b: str,
                 n_files: int = 8) -> None:
    """M-EXT: Z-order clustered write — the data-skipping layout
    (Delta OPTIMIZE ZORDER / Iceberg sort orders) that makes parquet
    min/max footer stats selective on TWO columns at once.  A table
    sorted on only col_a gives col_b full-range stats in every file,
    so predicates on col_b prune nothing; interleaving the bits of
    both rank spaces into one z-value and range-partitioning on it
    gives every file a tight bounding BOX in (a, b) space — filters on
    EITHER column skip most files.  At 100 TB the scan savings are the
    whole game: row groups that can't match never leave storage.

    Implementation: per-column quantile BOUNDARIES via one
    approx-percentile aggregate, broadcast back over the stream
    (rank-based, not value-based — z-ordering needs uniform bit
    spread, and quantile ranks are distribution-free).  NOT a global
    percent_rank() window: an unpartitioned window serializes the
    whole table through one task — the exact anti-pattern the
    analytics operators document; the boundary join keeps every step
    map-side.  Bit interleave via shifts/ors in pure built-ins, then
    repartitionByRange + sortWithinPartitions on the z-value.  The z
    column is dropped on write; the layout IS the artifact.
    tests/test_sinks.py asserts per-file footer ranges shrink on both
    columns vs an unclustered write."""
    scale = (1 << Z_BITS) - 1
    qs = [i / (scale + 1) for i in range(1, scale + 1)]
    bounds = df.agg(
        F.percentile_approx(col_a, qs).alias("_ba"),
        F.percentile_approx(col_b, qs).alias("_bb"))
    ranked = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_ra", F.size(F.filter(
            "_ba", lambda b: b <= F.col(col_a))).cast("bigint"))
        .withColumn("_rb", F.size(F.filter(
            "_bb", lambda b: b <= F.col(col_b))).cast("bigint"))
        .drop("_ba", "_bb"))
    interleaved = F.lit(0).cast("bigint")
    for bit in range(Z_BITS):
        interleaved = (
            interleaved
            .bitwiseOR(F.shiftleft(
                F.shiftright("_ra", bit).bitwiseAND(F.lit(1)),
                2 * bit + 1))
            .bitwiseOR(F.shiftleft(
                F.shiftright("_rb", bit).bitwiseAND(F.lit(1)),
                2 * bit)))
    (ranked.withColumn("_z", interleaved)
     .repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_ra", "_rb", "_z")
     .write.mode("overwrite").parquet(path))


def to_json_payload(users: DataFrame, metrics: dict,
                    source_url: str, fallback_used: bool,
                    fetched_at: str, limit: int = 500) -> dict:
    """JSON API sink (reference S6, pages/api/etl/restart.js:14-20)."""
    rows = [r.asDict(recursive=True) for r in users.limit(limit).collect()]
    return {
        "users": rows,
        "metrics": metrics,
        "fallbackUsed": fallback_used,
        "sourceUrl": source_url,
        "fetchedAt": fetched_at,
    }
