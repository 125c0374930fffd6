"""HTTP JSON source with synthetic fallback (reference S1-S3,
src/lib/randomuser.js:30-62).

Spark has no native HTTP source; the scale-correct pattern is
land-to-object-storage then `spark.read.json`.  For parity with the
reference's single-request source we do a driver-side fetch ->
`spark.createDataFrame`; on ANY error (non-2xx, bad payload, no
network) we fall back to the deterministic synthetic generator exactly
like the reference's try/catch (randomuser.js:59-62).

No third-party HTTP lib: stdlib urllib, gated so offline environments
(like this container) always exercise the fallback path.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .synthetic import synthetic_users

DEFAULT_URL = "https://randomuser.me/api/?results=500"

RAW_USER_SCHEMA = T.StructType([
    T.StructField("id", T.StructType([T.StructField("value", T.StringType())])),
    T.StructField("login", T.StructType([T.StructField("uuid", T.StringType())])),
    T.StructField("name", T.StructType([
        T.StructField("first", T.StringType()),
        T.StructField("last", T.StringType()),
    ])),
    T.StructField("email", T.StringType()),
    T.StructField("phone", T.StringType()),
    T.StructField("location", T.StructType([
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
    ])),
    T.StructField("registered", T.StructType([T.StructField("date", T.StringType())])),
    T.StructField("picture", T.StructType([T.StructField("thumbnail", T.StringType())])),
])


def load_users_http(spark: SparkSession, url: str | None = None,
                    timeout: float = 5.0) -> tuple[DataFrame, dict]:
    """Extract step.  Returns (df, provenance) where provenance mirrors
    the reference's {sourceUrl, fallbackUsed, fetchedAt}
    (randomuser.js:31-34,64-67)."""
    source_url = url or DEFAULT_URL
    fetched_at = datetime.now(timezone.utc).isoformat()
    error = None
    try:
        # non-2xx raises HTTPError from urlopen itself (default
        # opener), landing in the same fallback path with its status
        # in the recorded error string
        with urllib.request.urlopen(source_url, timeout=timeout) as resp:
            payload = json.loads(resp.read())
        results = payload.get("results")
        if not isinstance(results, list):
            raise RuntimeError("Invalid data shape: no results array")
        df = spark.createDataFrame(results, schema=RAW_USER_SCHEMA)
        df = transform_raw_users(df)
        fallback = False
    except Exception as exc:  # noqa: BLE001 — reference catch-all
        # record WHY in the provenance: a silent fallback makes an
        # upstream contract change (field renamed, shape shifted)
        # indistinguishable from a transient network outage
        df = synthetic_users(spark, 50)
        fallback = True
        error = f"{type(exc).__name__}: {exc}"
    prov = {"sourceUrl": source_url, "fallbackUsed": fallback,
            "fetchedAt": fetched_at}
    if error is not None:
        prov["error"] = error
    return df, prov


def transform_raw_users(raw: DataFrame) -> DataFrame:
    """Transform projection (reference randomuser.js:49-57): nested
    restructuring with the id coalesce (P1+P2)."""
    return raw.select(
        F.coalesce(F.col("id.value"), F.col("login.uuid")).alias("mock_id"),
        F.col("name.first").alias("name_first"),
        F.col("name.last").alias("name_last"),
        F.col("email"),
        F.col("phone"),
        F.col("location.country").alias("country"),
        F.col("location.city").alias("city"),
        F.col("registered.date").alias("registered_date"),
        F.col("picture.thumbnail").alias("thumbnail"),
    )
