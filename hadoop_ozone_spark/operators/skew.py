"""Skew-handling utilities for hot-key aggregations.

The realistic skew at 100 TB is one hot ``(volume, bucket)`` (or one
hot container) dominating a shuffle. AQE's skew-join splitting covers
joins; for *aggregations* over pathologically hot groups, two-phase
salted aggregation bounds any single reducer's input:

    phase 1: groupBy(key, salt = pmod(hash(row-identity), S)) — partial
    phase 2: groupBy(key) over the S partials — final

Only algebraic aggregates (sum/count/min/max) can be salted this way;
that covers every reference aggregate (SURVEY §2.4 — all running
counters and sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    sum_col: str,
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-phase skew-proof ``groupBy(group_cols).agg(sum, count)``.

    Identical result to the direct aggregation; the salt bounds the
    largest phase-1 reducer to ~|hot group| / salt_buckets rows.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(sum_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").alias(f"sum_{sum_col}"),
        F.sum("_pcnt").alias("cnt"),
    )
