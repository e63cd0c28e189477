"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
shapes, Arrow-batched ``mapInPandas`` UDFs — while the codec step is a
deterministic stub (no image/audio libraries in this container; swap
``_fake_decode`` for PIL/librosa/ffmpeg calls in production).

At 100 TB: binary payloads dominate bytes but not rows; keep them in
their own column so column pruning skips them for metadata-only
queries, and size ``maxPartitionBytes`` so one task holds a few
thousand blobs, not one giant one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_max", DoubleType()),
        StructField("frame_count", LongType()),
    ]
)


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in corpus: encode each document's text as the binary
    payload with deterministic fake dimensions. Real deployments read
    (path, binary) via ``spark.read.format('binaryFile')``."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        (F.col("doc_id") % 640 + 32).alias("width"),
        (F.col("doc_id") % 480 + 32).alias("height"),
    )


def _fake_decode(content: bytes) -> list[int]:
    """STUB for the codec: deterministic 'pixels' = the first 256 raw
    byte values (0..255).

    Production: ``PIL.Image.open(io.BytesIO(content))`` /
    ``librosa.load`` — this stub keeps the boundary explicit while the
    container lacks the media libs.
    """
    return list(content[:256])


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so one Python worker sees a whole Arrow batch of
    blobs (amortized serialization), yields the typed feature frame.

    Feature math is exact-integer sums with ONE final double division
    (sum(px)/(255·n), max(px)/255) so the DuckDB oracle reproduces the
    values bit-for-bit — no float-accumulation drift across engines.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feat_mean": px.map(
                        lambda v: sum(v) / (255.0 * len(v)) if v else 0.0
                    ),
                    "feat_max": px.map(lambda v: max(v) / 255.0 if v else 0.0),
                    "frame_count": (pdf["doc_id"] % 30 + 1).astype("int64"),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame
    index per clip (the decode of each frame is the stubbed step)."""
    frames = F.sequence(F.lit(0), F.col("doc_id") % 30, F.lit(every_nth))
    return media.filter(F.col("media_type") == "video").select(
        "doc_id", F.explode(frames).alias("frame_idx"), F.col("width"), F.col("height")
    )


def resize_plan(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize is metadata-only until the codec runs: compute scale
    factors JVM-side; the pixel op is the stubbed decode."""
    return media.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        (F.lit(target_w) / F.col("width")).alias("scale_x"),
        (F.lit(target_h) / F.col("height")).alias("scale_y"),
    )
