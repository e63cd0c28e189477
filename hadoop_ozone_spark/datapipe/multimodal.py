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
# video clips carry ≤ 30 frames whose rasters are stride-1 windows of
# the text — the pad must cover the last frame's window (29 + 60)
_MAX_FRAMES = 30


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Media corpus over the documents table. Image docs carry a REAL
    binary PPM (P6) payload — ``P6\\n<w> <h>\\n255\\n`` header followed
    by w·h·3 raw RGB bytes (pixels = the document's leading bytes,
    '='-padded) — so the decode stage parses an actual image format.
    Video docs carry a PPM STREAM: ``doc_id % 30 + 1`` complete PPM
    frames concatenated back-to-back (frame *f*'s raster = the text
    window starting at byte *f*, '='-padded) — the self-describing
    concatenated-frames layout of formats like y4m/MJPEG. Audio docs
    carry the raw byte stream (headerless u8 PCM). Real deployments
    read (path, binary) via ``spark.read.format('binaryFile')``; this
    synthesizer only stands the driver corpus in for that reader.

    ``width``/``height`` stay the CLAIMED metadata columns (what a
    catalog would record); the decoder reports ``decoded_*`` from the
    actual header so the two can be cross-checked.
    """
    doc_id = F.col("doc_id")
    w = doc_id % 4 + 1
    h = doc_id % 5 + 1
    npx = w * h * 3
    header = F.concat(F.lit("P6\n"), w, F.lit(" "), h, F.lit("\n255\n"))
    pixel_str = F.concat(
        F.col(text_col), F.lit("=" * _MAX_PPM_PIXEL_BYTES)
    ).substr(F.lit(1), npx)
    ppm = F.encode(F.concat(header, pixel_str), "UTF-8")
    vid_padded = F.concat(
        F.col(text_col), F.lit("=" * (_MAX_FRAMES - 1 + _MAX_PPM_PIXEL_BYTES))
    )
    ppm_stream = F.encode(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), doc_id % 30),
                lambda f: F.concat(header, vid_padded.substr(f + F.lit(1), npx)),
            ),
            "",
        ),
        "UTF-8",
    )
    return docs.select(
        "doc_id",
        F.when(doc_id % 3 == 0, F.lit("image"))
        .when(doc_id % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.when(doc_id % 3 == 0, ppm)
        .when(doc_id % 3 == 1, F.encode(F.col(text_col), "UTF-8"))
        .otherwise(ppm_stream)
        .alias("content"),
        (doc_id % 640 + 32).alias("width"),
        (doc_id % 480 + 32).alias("height"),
    )


def _parse_ppm_header(content: bytes, pos: int) -> tuple[int, int, int]:
    """Parse one P6 header starting at ``pos``: magic, whitespace/
    comment-tolerant (width, height, maxval) fields. Returns
    (width, height, raster_start). Raises ValueError on malformed
    input — decode errors are data-quality signal, not silent zeros."""
    if content[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = pos + 2, []
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
    return width, height, pos


def decode_ppm(content: bytes) -> tuple[int, int, list[int]]:
    """Real PPM (P6) parser: one header + w·h·3 raw sample bytes.
    Returns (width, height, pixels)."""
    width, height, pos = _parse_ppm_header(content, 0)
    n = width * height * 3
    raster = content[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated raster: {len(raster)} of {n} bytes")
    return width, height, list(raster)


def decode_ppm_stream(
    content: bytes,
    wanted: set[int] | None = None,
    stride: int | None = None,
) -> tuple[int, dict[int, tuple[int, int, list[int]]]]:
    """Video codec: a clip is complete PPM frames concatenated
    back-to-back. Walks the stream header-by-header, SKIPPING the
    raster bytes of non-selected frames (seek-don't-decode — the
    per-row cost of sampling every Nth frame is headers + wanted
    rasters, not the whole clip) and decoding the selected ones.

    Selection: ``wanted`` is an explicit index set; ``stride=N``
    selects every Nth frame (idx % N == 0) in the same single pass —
    no pre-pass to learn the frame count. Both None decodes all.

    Returns (frame_count, {frame_idx: (width, height, pixels)}).
    Raises ValueError on a malformed or truncated frame."""
    frames: dict[int, tuple[int, int, list[int]]] = {}
    pos, idx = 0, 0
    while pos < len(content):
        width, height, raster_start = _parse_ppm_header(content, pos)
        n = width * height * 3
        end = raster_start + n
        if end > len(content):
            raise ValueError(f"truncated frame {idx}: {len(content) - raster_start} of {n} bytes")
        take = (
            (wanted is None or idx in wanted)
            and (stride is None or idx % stride == 0)
        )
        if take:
            frames[idx] = (width, height, list(content[raster_start:end]))
        pos, idx = end, idx + 1
    return idx, frames


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
    video blobs through the PPM stream codec (frame_count is COUNTED by
    parsing every frame header; features come from the first frame's
    decoded raster — bounded per-row cost regardless of clip length);
    audio through the PCM window. ``decoded_width/height`` come from
    the parsed header (0 for audio).

    Feature math is exact-integer sums with ONE final double division
    (sum(px)/(255·n), max(px)/255) so the DuckDB oracle reproduces the
    values bit-for-bit — no float-accumulation drift across engines.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # route on the typed media_type column, not content sniffing
            # — a PCM payload that happens to start with 'P6' must not
            # reach the image parser
            decoded = []
            frame_counts = []
            for did, mt, c in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                b = bytes(c)
                if mt == "image":
                    decoded.append(decode_ppm(b))
                    frame_counts.append(int(did) % 30 + 1)  # claimed metadata
                elif mt == "video":
                    n_frames, frames = decode_ppm_stream(b, wanted={0})
                    decoded.append(frames[0])
                    frame_counts.append(n_frames)  # counted, not claimed
                else:
                    decoded.append((0, 0, decode_pcm_u8(b)))
                    frame_counts.append(int(did) % 30 + 1)
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
                    "frame_count": pd.Series(frame_counts, dtype="int64"),
                    "decoded_width": pd.Series(
                        [d[0] for d in decoded], dtype="int64"
                    ),
                    "decoded_height": pd.Series(
                        [d[1] for d in decoded], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_w", LongType()),
        StructField("frame_h", LongType()),
        StructField("frame_mean", DoubleType()),
        StructField("frame_max", DoubleType()),
    ]
)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame sampling with REAL pixel decode: every Nth frame of
    each clip is located by walking the PPM-stream headers (non-sampled
    rasters are skipped, not decoded) and its raster is decoded to
    per-frame integer-exact features.

    Arrow ``mapInPandas`` over the video rows only — the binary column
    never leaves the executor; output is the typed per-frame feature
    frame. Feature math matches ``extract_features`` (one final double
    division) so the DuckDB oracle replays it bit-for-bit.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for did, c in zip(pdf["doc_id"], pdf["content"]):
                _, frames = decode_ppm_stream(bytes(c), stride=every_nth)
                for idx in sorted(frames):
                    w, h, px = frames[idx]
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(idx)
                    out["frame_w"].append(w)
                    out["frame_h"].append(h)
                    out["frame_mean"].append(
                        sum(px) / (255.0 * len(px)) if px else 0.0
                    )
                    out["frame_max"].append(max(px) / 255.0 if px else 0.0)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").select(
        "doc_id", "content"
    ).mapInPandas(run, FRAME_SCHEMA)


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
