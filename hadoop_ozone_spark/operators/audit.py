"""A8/X11 — SQL over audit logs (ref ozone auditparser).

Templates (tools/src/main/resources/commands.properties:20-22):
top-5 users, top-5 ops, top-5 per-second activity buckets. All are
groupBy + TakeOrderedAndProject top-k; ties broken by group key so the
cut is deterministic (the reference's SQLite templates under-specify
order on ties — we pin it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_users(audit: DataFrame, k: int = 5) -> DataFrame:
    return (
        audit.groupBy("user")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.desc("total"), F.asc("user"))
        .limit(k)
    )


def top_ops(audit: DataFrame, k: int = 5) -> DataFrame:
    return (
        audit.groupBy("op")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.desc("total"), F.asc("op"))
        .limit(k)
    )


def busiest_seconds(audit: DataFrame, k: int = 5, ts_col: str = "datetime") -> DataFrame:
    """X11: per-second activity bucket (ref template uses substr to the
    comma — i.e. truncate to seconds)."""
    sec = F.date_trunc("second", F.col(ts_col)).alias("second")
    return (
        audit.groupBy(sec)
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.desc("total"), F.asc("second"))
        .limit(k)
    )


def failure_rate(audit: DataFrame) -> DataFrame:
    """Per-op success/failure split (auditparser ad-hoc query surface)."""
    return (
        audit.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("result") == "FAILURE", 1).otherwise(0)).alias("failures"),
        )
        .orderBy("op")
    )


def access_heatmap(audit: DataFrame) -> DataFrame:
    """Namespace access heatmap: hierarchical access counts per
    volume → bucket → top-level dir, from the audit log's resource
    params — the tree the Recon read-access heatmap renders (a
    later-Ozone endpoint; beyond this reference version, included for
    the operations surface). One ROLLUP pass gives every tree level:
    NULL components mark the subtotal rows (volume-level, bucket-level,
    grand total).

    Scale: rollup compiles to a single Expand + partial/final
    HashAggregate — one shuffle over (volume, bucket, dir), map-side
    combinable; no per-level re-scan.
    """
    return (
        audit.rollup("volume", "bucket", "key_dir")
        .agg(
            F.count(F.lit(1)).alias("access_count"),
            F.countDistinct("user").alias("distinct_users"),
        )
        .orderBy(
            F.col("volume").asc_nulls_first(),
            F.col("bucket").asc_nulls_first(),
            F.col("key_dir").asc_nulls_first(),
        )
    )


def rate_spikes(
    audit: DataFrame,
    z_threshold: float = 2.0,
    ts_col: str = "datetime",
) -> DataFrame:
    """Per-user request-rate anomaly detection over the audit feed —
    the ops question on top of A8's top-k views: which (user, bucket)
    activity bursts stand out against that user's own baseline.
    Beyond-reference analytics (the reference ships raw top-k SQL
    templates only, commands.properties:20-22), built on the same
    audit table.

    z-score per (user, time-bucket): z = (cnt − mean) / σ_pop over the
    user's buckets; flagged when z ≥ threshold and σ > 0. All moments
    derive from EXACT integer sums (count / Σcnt / Σcnt²), so the
    doubles are single IEEE divisions — engine-stable, oracle-matched
    at 6dp. Two map-side-combinable aggregates (events → buckets →
    user moments), the user-moment dim rides a broadcast back onto the
    bucket counts.
    """
    counts = audit.groupBy("user", F.col(ts_col).alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.groupBy("user").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
    )
    mean = F.col("total") / F.col("n_buckets")
    var = F.col("sumsq") / F.col("n_buckets") - mean * mean
    std = F.sqrt(var)
    z = (F.col("cnt") - mean) / std
    return (
        counts.join(F.broadcast(stats), "user")
        .filter((var > 0) & (z >= z_threshold))
        .select(
            "user",
            "bucket_ts",
            "cnt",
            F.round(mean, 6).alias("user_mean"),
            F.round(std, 6).alias("user_std"),
            F.round(z, 6).alias("z_score"),
        )
        .orderBy("user", "bucket_ts")
    )
