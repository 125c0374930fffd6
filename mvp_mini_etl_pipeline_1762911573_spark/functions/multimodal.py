"""Multimodal columns (SURVEY.md §2.10 D5 + EXT north star): image /
audio / video as opaque binary columns with typed metadata, processed
by Arrow-batched pandas functions over mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind `_decode_stub` (clearly marked; swap for
PIL/librosa/av on a real cluster).  Everything Spark-side — schema,
binary generation, partitioning, UDF signature, Arrow batch shape —
is real and tested.

Scale notes (100 TB of media):
* media bytes ride as `binary` columns in parquet — columnar pages,
  scan-prunable metadata beside them; never row-at-a-time driver I/O.
* mapInPandas streams Arrow record batches through Python — batch
  size via spark.sql.execution.arrow.maxRecordsPerBatch; the pattern
  costs one serialization boundary, which is why metadata-only ops
  (filtering by width, bucketing by duration) stay in JVM columns and
  only the codec call crosses into Python.
* derived features (embedding array, dims) land back as typed columns
  — downstream joins/dedup reuse the relational operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes long, "
    "checksum string, thumb_w int, thumb_h int, feature array<float>"
)


def synthetic_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic fake media table: payload = repeated hash bytes,
    metadata derived from the id.  Generated distributed via
    spark.range — no driver materialization."""
    i = F.col("id")
    return spark.range(n).select(
        i.alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"),
                             F.lit("video")),
                     (i % 3 + 1).cast("int")).alias("kind"),
        F.to_binary(
            F.repeat(F.sha2(F.concat(F.lit("media-"), i.cast("string")),
                            256), 4),
            F.lit("hex")).alias("payload"),
        (F.lit(64) + (i % 16).cast("int") * 8).cast("int").alias("width"),
        (F.lit(64) + (i % 9).cast("int") * 8).cast("int").alias("height"),
        F.when(i % 3 == 0, F.lit(None).cast("int"))
         .otherwise(((i % 30).cast("int") + 1) * 1000).alias("duration_ms"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB: stands in for the real codec (PIL.Image.open /
    soundfile.read / av.open).  Deterministic on the payload bytes so
    tests are stable.  Raises for unknown kinds exactly as a real
    decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    # fake "decoded signal": byte histogram moments
    total = sum(payload)
    return {
        "mean_byte": total / max(len(payload), 1),
        "peak_byte": max(payload) if payload else 0,
    }


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """The mapInPandas decode→feature pipeline: binary payload in,
    typed feature columns out.  Arrow batches keep transfer vectorized;
    per-batch pandas ops keep Python amortized."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats, checks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                sig = _decode_stub(bytes(payload), kind)
                base = sig["mean_byte"]
                feats.append(
                    [round((base * (d + 1)) % 251, 3)
                     for d in range(feat_dim)])
                checks.append(
                    hashlib.sha256(bytes(payload)).hexdigest()[:16])
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "checksum": checks,
                "thumb_w": (pdf["width"] // 2).astype("int32"),
                "thumb_h": (pdf["height"] // 2).astype("int32"),
                "feature": feats,
            })
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def _multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 query: generate media, extract features via mapInPandas,
    then aggregate per kind — JVM→Arrow→Python→Arrow→JVM round trip
    ending in a relational agg.

    Fully DuckDB-oracled (was rows-only through round 3): every emitted
    value is a pure function of the deterministic payload bytes, which
    the oracle replays string-side from the same sha256 hex.  The
    feature aggregate is quantized to exact milli-unit integers BEFORE
    summing — float f0 values round-trip Python round(x,3) → float32 →
    ×1000 to an exact integer, so the sum is order-independent and
    engine-invariant (same trick as lm_score's micro-nat sums).  The
    oracle reproduces Python's banker's rounding with round_even():
    mean_byte = s/32 is an exact binary fraction, so the only half-way
    cases are exact and round-half-even on both sides."""
    media = synthetic_media(spark, 200)
    feats = extract_features(media)
    f0_milli = F.round(F.element_at("feature", 1) * 1000, 0).cast("bigint")
    return (
        feats.groupBy("kind")
        .agg(F.count("*").alias("n"),
             F.sum("n_bytes").alias("total_bytes"),
             F.sum(f0_milli).alias("sum_f0_milli"))
        .orderBy("kind")
    )


def _multimodal_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 schema smoke: one DataFrame carrying struct metadata, binary
    payload, and an embedding array side by side (checkable: the typed
    metadata projection has a SQL oracle on deterministic fields)."""
    media = synthetic_media(spark, 200)
    return media.select(
        "media_id", "kind",
        F.length("payload").alias("payload_bytes"),
        "width", "height", "duration_ms",
        (F.col("width") * F.col("height")).alias("pixels"),
    )


FRAME_SCHEMA = ("media_id bigint, frame_idx int, frame_ms int, "
                "frame_sig string")


def sample_frames(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sampling over video payloads via mapInPandas: one output
    row per sampled frame (1 fps), each with a deterministic signature
    derived from the payload hex + frame index.  The real decoder
    (e.g. PyAV keyframe iteration) slots into the same loop; the
    Spark-side contract — binary in, exploded typed frame rows out —
    is exactly this."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [],
                   "frame_sig": []}
            for mid, kind, payload, dur in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["duration_ms"]):
                if kind != "video" or pd.isna(dur):
                    continue
                hexs = bytes(payload).hex()
                n_frames = max(int(math.ceil(dur / 1000.0 * fps)), 1)
                for f in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["frame_ms"].append(int(f * 1000 / fps))
                    out["frame_sig"].append(hashlib.sha256(
                        f"{hexs}:{f}".encode()).hexdigest()[:16])
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_ms": pd.Series(out["frame_ms"], dtype="int32"),
                "frame_sig": pd.Series(out["frame_sig"], dtype="object"),
            })

    return media.mapInPandas(batches, FRAME_SCHEMA)


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 frame-sample query: the mapInPandas decode loop is Python,
    but every emitted value is a pure function of the deterministic
    payload, so DuckDB can replay it string-side — a FULL oracle for a
    binary-column pipeline."""
    media = synthetic_media(spark, 200)
    return sample_frames(media)


QUERIES = {
    "multimodal_pipeline": _multimodal_pipeline,
    "multimodal_schema": _multimodal_schema,
    "multimodal_frames": _multimodal_frames,
}

ORACLES = {
    # multimodal_pipeline: the payload is 4 repeats of the 32-byte
    # sha256 digest, so mean_byte = s32/32 (s32 = digest byte sum,
    # decoded here from the hex chars) and
    # f0 = pyround((s32/32) % 251, 3).  f0*1000 = 125*r/4 with
    # r = s32 % 8032, an exact quarter-integer — banker's rounding
    # (round_even) at the integer level is exactly Python's
    # round-half-even at the 3rd decimal of the exact binary fraction.
    "multimodal_pipeline": """
WITH m AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         sha256('media-' || i) AS h
  FROM generate_series(0, 199) AS t(i)
), bytes AS (
  SELECT i, kind,
         SUM((strpos('0123456789abcdef', substr(h, 2*j+1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(h, 2*j+2, 1)) - 1))
           AS s32
  FROM m, (SELECT unnest(range(0, 32)) AS j)
  GROUP BY i, kind
), f0 AS (
  SELECT kind,
         CAST(round_even(125.0 * (s32 % 8032) / 4, 0) AS BIGINT)
           AS f0_milli
  FROM bytes
)
SELECT kind, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * 128 AS BIGINT) AS total_bytes,
       CAST(SUM(f0_milli) AS BIGINT) AS sum_f0_milli
FROM f0 GROUP BY kind ORDER BY kind
""",
    "multimodal_frames": """
WITH vids AS (
  SELECT i, unnest(range(0, (i % 30) + 1)) AS f
  FROM generate_series(0, 199) AS t(i)
  WHERE i % 3 = 2
)
SELECT i AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * 1000 AS INTEGER) AS frame_ms,
       substr(sha256(repeat(sha256('media-' || i), 4)
                     || ':' || f), 1, 16) AS frame_sig
FROM vids
""",
    "multimodal_schema": """
SELECT i AS media_id,
       CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(128 AS INTEGER) AS payload_bytes,
       CAST(64 + (i % 16) * 8 AS INTEGER) AS width,
       CAST(64 + (i % 9) * 8 AS INTEGER) AS height,
       CASE WHEN i % 3 = 0 THEN NULL
            ELSE CAST(((i % 30) + 1) * 1000 AS INTEGER) END AS duration_ms,
       CAST((64 + (i % 16) * 8) * (64 + (i % 9) * 8) AS INTEGER) AS pixels
FROM generate_series(0, 199) AS t(i)
""",
}
