"""S8 — freon-style synthetic load generators.

Reference: RandomKeyGenerator (``-numOfVolumes 10 -numOfBuckets 1000
-numOfKeys 500000``, RandomKeyGenerator.java:119-143) and friends
synthesize namespace load. Spark-first: ``spark.range(n)`` +
deterministic column expressions — fully parallel, no Python, and the
same generator law is replayable in SQL for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_keys(
    spark: SparkSession,
    num_volumes: int = 10,
    num_buckets: int = 100,
    num_keys: int = 100_000,
    key_size: int = 10_240,
) -> DataFrame:
    """RandomKeyGenerator law: key i lands in volume i%V, bucket
    (i/V)%B, with a deterministic pseudo-size spread around key_size."""
    i = F.col("id")
    return spark.range(num_keys).select(
        F.concat(F.lit("vol"), i % num_volumes).alias("volume"),
        # integer div, not (i / V).cast — fractional double→long casts
        # are the exact cross-engine hazard model.py's rules forbid
        F.concat(F.lit("bucket"), F.expr(f"id div {num_volumes}") % num_buckets).alias(
            "bucket"
        ),
        F.concat(F.lit("key"), i).alias("key"),
        (F.lit(key_size) + (i * 37) % 1024).alias("data_size"),
        i.alias("object_id"),
    )


def generator_report(keys: DataFrame) -> DataFrame:
    """Freon's report vocabulary (RandomKeyGenerator.java:475-491):
    keys added per volume + byte totals."""
    return (
        keys.groupBy("volume")
        .agg(
            F.count(F.lit(1)).alias("keys_added"),
            F.sum("data_size").alias("total_bytes"),
            F.countDistinct("bucket").alias("buckets_used"),
        )
        .orderBy("volume")
    )
