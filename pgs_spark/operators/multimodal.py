"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns with a
typed metadata struct — the pass-through-userData pattern of the reference
(PShapeData carried through conversions, PGS_Conversion.java:391-393,399-409).

The Spark-side plumbing (schemas, batch iteration, partition-sized decode) is
real and tested; the actual codec calls are stubbed behind a deterministic
fake because no image/audio libraries exist in this container — swap
`_decode_stub` for PIL/librosa/ffmpeg calls in production; nothing else
changes (same mapInPandas signature, same output schema).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<double>"
FEATURE_DIM = 8


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 512).cast("binary").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return df


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for decode + feature extraction.

    Production: image → PIL.Image.open + resize + embed; audio → resample +
    mel features; video → frame-sample then per-frame image path. This stub
    hashes the payload into FEATURE_DIM floats so tests exercise exact,
    reproducible values through the full distributed path.
    """
    h = hashlib.sha256(payload + kind.encode()).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas —
    Arrow-sized batches, one Python pass, no row-at-a-time UDF."""

    def _run(batches):
        for pdf in batches:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)
