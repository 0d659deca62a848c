"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators via ``mapInPandas``. The decode libraries (PIL/ffmpeg/
librosa) are NOT in this container, so the actual codec step is stubbed
(`_decode_image_real` raises NotImplementedError); ``FAKE_DECODE=True``
routes to a deterministic fake so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested.

Scale shape: mapInPandas streams Arrow batches; binary payloads never
pass through Python row-at-a-time, and per-batch vectorized numpy work
is the pattern a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FAKE_DECODE = True

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("first_byte", IntegerType()),
        StructField("feature_norm", DoubleType()),
    ]
)


def _decode_image_real(payload: bytes) -> object:
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed in this container); "
        "set FAKE_DECODE=True for the deterministic stand-in"
    )


def _fake_features(payload: bytes) -> tuple[int, float, int, float]:
    """Deterministic fake 'decoder': simple byte statistics standing in for
    pixel statistics. Same signature/shape a real decoder would fill."""
    n = len(payload)
    if n == 0:
        return 0, 0.0, -1, 0.0
    total = sum(payload)
    mean = total / n
    return n, mean, payload[0], (total % 997) / 997.0


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in for an
    encoded payload (the container has no real image fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    from distributed_computing_platform_mapreduce_spark.shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p) if FAKE_DECODE else _decode_image_real(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "byte_mean", "first_byte", "feature_norm"]
            )
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (decode itself stubbed — payload passed through)."""
    return media.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        F.col("payload"),
    )
