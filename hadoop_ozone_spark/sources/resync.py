"""S5 snapshot-fallback resync — the Recon sync controller.

Reference: ``OzoneManagerServiceProviderImpl.syncDataFromOM``
(hadoop-ozone/recon/src/main/java/org/apache/hadoop/ozone/recon/spi/impl/
OzoneManagerServiceProviderImpl.java:389-430): steady state polls
``getDBUpdates(lastAppliedSeqno)``; when the OM's WAL no longer holds
that seqno (consumer lagged past the retention window) Recon falls back
to a FULL snapshot bootstrap (:291-330) and resumes deltas from the
snapshot's sequence number.

Spark shape: the "WAL" is the events table (retention = whatever the
producer keeps); the "snapshot" is the partitioned parquet namespace.
The controller is pure decision + two batch programs:

- DELTA: events with ``last_applied < seqno <= head`` MERGEd into the
  snapshot (sources/upsert.py — rewrite touched partitions only).
- SNAPSHOT: rebuild from the authoritative snapshot table and resume
  from its seqno — the cost is a full table write, which is exactly
  why the decision matters: a 100 TB engine must take DELTA whenever
  the tail is intact and pay SNAPSHOT only on true retention loss.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.sources import upsert


@dataclass
class SyncPlan:
    mode: str  # "delta" | "snapshot" | "noop"
    from_seqno: int  # exclusive lower bound of events to apply
    to_seqno: int  # inclusive upper bound (new last_applied)


def plan_sync(available: DataFrame, last_applied: int, seq_col: str = "seqno") -> SyncPlan:
    """Decide delta-vs-snapshot from the retained event range.

    The tail is intact iff every event after ``last_applied`` is still
    retained, i.e. min(retained seqno) <= last_applied + 1. A retained
    range starting later means events were truncated unseen → full
    snapshot fallback (reference: the InvalidProtocolBufferException /
    sequence-number-mismatch path in syncDataFromOM).
    """
    row = available.agg(
        F.min(seq_col).alias("lo"), F.max(seq_col).alias("hi")
    ).first()
    lo, hi = row["lo"], row["hi"]
    if hi is None or hi <= last_applied:
        return SyncPlan("noop", last_applied, last_applied)
    if lo > last_applied + 1:
        return SyncPlan("snapshot", lo - 1, hi)
    return SyncPlan("delta", last_applied, hi)


def run_sync(
    spark: SparkSession,
    snapshot_dir: str,
    authoritative: DataFrame,
    authoritative_seqno: int,
    events: DataFrame,
    last_applied: int,
    seq_col: str = "seqno",
) -> SyncPlan:
    """Execute a sync round against the materialized snapshot.

    ``authoritative`` is the full-bootstrap source (the OM checkpoint
    analogue), consistent as of ``authoritative_seqno``; it is read
    only on snapshot fallback, where the checkpoint must cover the
    truncated range (``authoritative_seqno >= min(retained) - 1``,
    which the reference guarantees — the checkpoint is always newer
    than the WAL's tail). Returns the executed plan; the caller
    persists ``plan.to_seqno`` as the new checkpoint.
    """
    plan = plan_sync(events, last_applied, seq_col)
    if plan.mode == "noop":
        return plan
    if plan.mode == "snapshot":
        if authoritative_seqno < plan.from_seqno:
            raise ValueError(
                f"bootstrap checkpoint at seqno {authoritative_seqno} does not "
                f"cover the truncated range (needs >= {plan.from_seqno})"
            )
        # full bootstrap: overwrite everything, then apply the retained
        # tail ABOVE the checkpoint in the same round. Overwrite mode is
        # pinned static PER-WRITE: if a prior delta/compaction on this
        # session left dynamic mode behind, a dynamic bootstrap would
        # only replace partitions present in `authoritative`, so a
        # partition whose keys were all deleted upstream would survive —
        # deleted keys resurrect.
        (
            authoritative.repartition("volume", "bucket")
            .sortWithinPartitions("key")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("volume", "bucket")
            .parquet(snapshot_dir)
        )
        plan = SyncPlan("snapshot", authoritative_seqno, plan.to_seqno)
    tail = events.filter(F.col(seq_col) > plan.from_seqno)
    if tail.limit(1).count() > 0:
        upsert.apply_events_to_snapshot(spark, snapshot_dir, tail)
    return plan
