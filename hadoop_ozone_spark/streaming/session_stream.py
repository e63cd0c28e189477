"""Streaming gap-sessionization — the streaming twin of
operators/temporal.py ``sessionize``.

The batch operator and this stream share ONE aggregate expression
(``_session_agg``): ``F.session_window`` merges events into gap
sessions inside the aggregation operator, so the identical query runs
over ``spark.read`` (batch reprocess) and ``spark.readStream`` with a
watermark (incremental). That process ≡ reprocess equivalence is the
repo's streaming-parity contract (streaming/maintenance.py preamble),
pinned by tests/test_session_stream.py — including a session MERGE
across micro-batches, the stateful behavior a lag/cumsum rewrite
cannot express incrementally.

Watermark semantics: a session closes (append mode emits it) once the
watermark passes ``session_end = last_event_ts + gap``; events later
than the watermark delay are dropped — the standard late-data trade,
sized by the source's disorder bound.

Scale: state is per-(user, open-session) — bounded by ACTIVE users in
the gap horizon, not corpus size; the shuffle is keyed on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from hadoop_ozone_spark.operators import temporal

CLICK_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_click_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The events table as a file-micro-batch stream (Kafka-shaped at
    deployment; same plan either way)."""
    return (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def session_stream(
    clicks: DataFrame, gap_minutes: int = 30, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming gap sessions: open sessions absorb (and merge with)
    events from later micro-batches until the watermark closes them."""
    return temporal.session_agg(
        clicks.withWatermark("ts", watermark), gap_minutes=gap_minutes
    )


def session_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The batch reprocess of the same law (no watermark; equals
    operators/temporal.py sessionize minus the session_seq ordinal)."""
    return temporal.session_agg(events, gap_minutes=gap_minutes)
