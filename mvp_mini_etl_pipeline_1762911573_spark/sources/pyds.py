"""Custom parallel source via the Spark 4 Python Data Source API
(SURVEY.md §2.1 S-EXT): a deterministic synthetic "crawl shard" feed.

The reference's only source beyond HTTP JSON is its synthetic fallback
generator (/root/reference/src/lib/randomuser.js:3-28) — a driver-side
loop.  This is the SCALE form of that idea: `partitions()` declares one
input split per crawl shard, Spark schedules `read()` per split on the
executors, so generation (or, in a real source: fetching, decoding,
cursor-paging) runs in PARALLEL with no driver bottleneck and no
post-hoc repartition.  That executor-side parallelism is exactly what
separates a DataSource implementation from a createDataFrame shim.

Every record is a pure function of its global id, so the source is
engine-invariant and the consuming query keeps a full DuckDB oracle
(the oracle regenerates the feed from range()) — the same
determinism-over-RNG policy as sources/synthetic.py.

At 100 TB: shards map to crawl segments/WARC files; `partitions()`
returns one split per segment and the cluster fans out.  The API also
supports pushdown-free simple batch readers like this one, and
streaming readers (simpleStreamReader) for incremental feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CRAWL_SHARDS = 4
CRAWL_PER_SHARD = 250
CRAWL_SCHEMA = ("shard int, rec int, url string, status int, "
                "nbytes bigint")


def _crawl_record(shard: int, rec: int, per_shard: int):
    """One crawl record as a pure function of its coordinates —
    shared by the executor-side reader and (via the oracle's range()
    mirror) DuckDB."""
    gid = shard * per_shard + rec
    return (
        shard,
        rec,
        f"https://crawl.example.com/page/{gid}",
        404 if gid % 7 == 0 else 200,
        (gid * 37) % 1000,
    )


def _crawl_record_gid(gid: int, per_shard: int):
    return _crawl_record(gid // per_shard, gid % per_shard, per_shard)


def make_crawl_datasource():
    """Build the DataSource class lazily: pyspark.sql.datasource is a
    Spark 4 module; the import lives inside so the rest of the package
    stays importable on older runtimes."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        InputPartition,
                                        SimpleDataSourceStreamReader)

    class CrawlShardReader(DataSourceReader):
        def __init__(self, options):
            self.n_shards = int(options.get("shards", CRAWL_SHARDS))
            self.per_shard = int(options.get("pershard",
                                             CRAWL_PER_SHARD))

        def partitions(self):
            # one input split per shard — this is the parallelism
            # contract: Spark runs read() per split on executors
            return [InputPartition(i) for i in range(self.n_shards)]

        def read(self, partition):
            shard = partition.value
            for rec in range(self.per_shard):
                yield _crawl_record(shard, rec, self.per_shard)

    class CrawlStreamReader(SimpleDataSourceStreamReader):
        """Incremental flavor: offsets are plain record ids, each
        micro-batch pulls the next `perbatch` records until `cap` —
        a FINITE stream, so Trigger.AvailableNow drains it and the
        result must equal the batch reader's (the stream==batch
        convergence the rest of streaming/ holds itself to).
        readBetweenOffsets replays any offset range deterministically:
        that replayability is the exactly-once contract a real
        incremental source (cursor-paged API, log tail) must keep."""

        def __init__(self, options):
            self.per_shard = int(options.get("pershard",
                                             CRAWL_PER_SHARD))
            self.per_batch = int(options.get("perbatch", 100))
            self.cap = int(options.get(
                "cap", CRAWL_SHARDS * CRAWL_PER_SHARD))

        def initialOffset(self):
            return {"gid": 0}

        def read(self, start):
            s = int(start["gid"])
            if s >= self.cap:          # drained: no offset progress
                return iter([]), start
            e = min(s + self.per_batch, self.cap)
            return (iter([_crawl_record_gid(g, self.per_shard)
                          for g in range(s, e)]), {"gid": e})

        def readBetweenOffsets(self, start, end):
            return iter([_crawl_record_gid(g, self.per_shard)
                         for g in range(int(start["gid"]),
                                        int(end["gid"]))])

    class CrawlDataSource(DataSource):
        @classmethod
        def name(cls):
            return "crawl_shards"

        def schema(self):
            return CRAWL_SCHEMA

        def reader(self, schema):
            return CrawlShardReader(self.options)

        def simpleStreamReader(self, schema):
            return CrawlStreamReader(self.options)

    return CrawlDataSource


def _ensure_registered(spark: SparkSession) -> None:
    """Register the data source on THIS session, idempotently.
    Registration is per-SparkSession state (a sibling
    spark.newSession() shares the applicationId but NOT the data-
    source registry, so an applicationId-keyed memo skipped the
    registration the new session needed and the load failed);
    re-registering the same name simply replaces the entry, so no
    memo is needed at all — shared by both entry points so the two
    can never diverge."""
    spark.dataSource.register(make_crawl_datasource())


def crawl_frame(spark: SparkSession, shards: int = CRAWL_SHARDS,
                per_shard: int = CRAWL_PER_SHARD) -> DataFrame:
    _ensure_registered(spark)
    return (spark.read.format("crawl_shards")
            .option("shards", shards)
            .option("pershard", per_shard)
            .load())


def crawl_stream(spark: SparkSession,
                 per_batch: int = 100) -> DataFrame:
    """The same feed as readStream — finite (capped at the batch
    reader's extent), so AvailableNow drains it."""
    _ensure_registered(spark)
    return (spark.readStream.format("crawl_shards")
            .option("perbatch", per_batch)
            .load())


def _source_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-EXT: per-shard ingest health report off the custom source —
    record counts, ok-rate, byte totals.  sf_dir is unused (the source
    is synthetic); the oracle regenerates the identical feed from
    range()."""
    from pyspark.sql import functions as F

    df = crawl_frame(spark)
    return (
        df.groupBy("shard")
        .agg(F.count("*").alias("n_recs"),
             F.sum((F.col("status") == 200).cast("bigint")).alias("n_ok"),
             F.sum("nbytes").alias("total_bytes"),
             F.min("url").alias("first_url"))
    )


QUERIES = {
    "source_crawl": _source_crawl,
}

ORACLES = {
    "source_crawl": f"""
WITH feed AS (
  SELECT CAST(gid // {CRAWL_PER_SHARD} AS INTEGER) AS shard,
         CAST(gid % {CRAWL_PER_SHARD} AS INTEGER) AS rec,
         'https://crawl.example.com/page/' || CAST(gid AS VARCHAR) AS url,
         CASE WHEN gid % 7 = 0 THEN 404 ELSE 200 END AS status,
         (gid * 37) % 1000 AS nbytes
  FROM (SELECT unnest(range({CRAWL_SHARDS * CRAWL_PER_SHARD})) AS gid)
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_recs,
       CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ok,
       CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       min(url) AS first_url
FROM feed
GROUP BY shard
""",
}
