"""CDC / change-stream operators (batch semantics; streaming variants in
``streaming/``).

S4 event model (OMDBUpdateEvent.java:28-160): (seqno, op∈{PUT,DELETE,
UPDATE}, key, value, old_value). SO1 cache⊕DB merge and F4 tombstone
suppression (OmMetadataManagerImpl.java:888-946) become one relational
idea: **latest-op-wins compaction** — for each key keep the event with
max seqno, then drop keys whose latest op is DELETE. A2/A4 incremental
counts (FileSizeCountTask.java:115-157, TableCountTask.java:114-140)
become signed aggregations over the event stream.

Scale: compaction is one shuffle on the key hash; with the event log
bucketed by key it is shuffle-free. The window-rank form compiles to a
single sort-based aggregation per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_state(
    events: DataFrame, key_col: str = "row_key", seq_col: str = "seqno", op_col: str = "op"
) -> DataFrame:
    """SO1+F4: compact an event log to current namespace state.

    max_by-style rank on seqno per key; keys whose last op is DELETE are
    tombstones and suppressed (ref cache-merge skips null cache values,
    OmMetadataManagerImpl.java:909-915).
    """
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(F.col(op_col) != "DELETE")
    )


def merge_snapshot_with_tail(
    snapshot: DataFrame, tail_events: DataFrame, key_col: str = "row_key"
) -> DataFrame:
    """SO1: read-your-writes view = base snapshot MERGE uncompacted tail.

    Cache (tail) wins on key collision; DELETE tombstones in the tail
    suppress snapshot rows (ref TreeMap union :888-946). Columns of the
    snapshot are aligned by name with the tail's ``value`` payload.
    """
    tail = latest_state(tail_events, key_col=key_col)  # PUT/UPDATE survivors
    deleted = (
        tail_events.groupBy(key_col)
        .agg(F.max_by("op", "seqno").alias("last_op"))
        .filter(F.col("last_op") == "DELETE")
        .select(key_col)
    )
    common = [c for c in snapshot.columns if c in tail.columns]
    base = (
        snapshot.join(tail.select(key_col), key_col, "left_anti")  # cache wins
        .join(deleted, key_col, "left_anti")  # tombstones
        .select(*common)
    )
    return base.unionByName(tail.select(*common))


def signed_counts(events: DataFrame, *group_cols: str) -> DataFrame:
    """A2/A4 incremental maintenance as a batch-checkable aggregate:
    PUT → +1, DELETE → −1, UPDATE → 0 net count (retract+emit).

    Byte semantics follow the retract+emit law of the streaming twin
    (streaming/maintenance.size_delta): when the feed carries an
    ``old_size`` column, an UPDATE contributes ``data_size −
    coalesce(old_size, 0)``; feeds without old values (e.g. the driver's
    om_events) fall back to counting the full new size, which equals the
    law under the assumption old_size is unknown-zero. Replaying one
    feed through batch and streaming therefore yields identical
    net_bytes.
    """
    delta = (
        F.when(F.col("op") == "PUT", 1).when(F.col("op") == "DELETE", -1).otherwise(0)
    )
    update_bytes = (
        F.col("data_size") - F.coalesce(F.col("old_size"), F.lit(0))
        if "old_size" in events.columns
        else F.col("data_size")
    )
    size_delta = (
        F.when(F.col("op") == "DELETE", -F.col("data_size"))
        .when(F.col("op") == "UPDATE", update_bytes)
        .otherwise(F.col("data_size"))
    )
    return (
        events.groupBy(*group_cols)
        .agg(
            F.sum(delta).alias("net_count"),
            F.count(F.lit(1)).alias("event_count"),
            F.sum(size_delta).alias("net_bytes"),
        )
        .orderBy(*group_cols)
    )


def daily_growth(events: DataFrame, ts_col: str = "event_time") -> DataFrame:
    """A7: CLUSTER_GROWTH_DAILY-style time series
    (UtilizationSchemaDefinition.java:74-87) — daily event volume and
    net byte growth, an append-only windowed aggregate."""
    return (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(
                F.when(F.col("op") == "DELETE", -F.col("data_size")).otherwise(
                    F.col("data_size")
                )
            ).alias("net_bytes"),
        )
        .orderBy("day")
    )
