"""Rolling sketch state: the streaming twin of datapipe/sketches.

Sketches are the textbook write-time artifact — each micro-batch lands
its OWN sketch zone (idempotent overwrite, the span/dedup/search-stream
recipe), and reads fold the zones with the sketch's merge law:

- HLL registers merge by MAX per bucket;
- Count-Min counters merge by SUM per (row, bucket);
- Bloom bits merge by UNION DISTINCT.

Because every merge is associative+commutative and per-batch inputs are
disjoint doc sets, stream ≡ batch holds exactly (pinned in
tests/test_sketch_stream.py), replay is a zone overwrite, and at 100 TB
the same fold runs over per-partition/per-day zones with a
constant-size shuffle (256 / 4096 / ≤32768 rows per zone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.datapipe import sketches
from hadoop_ozone_spark.streaming import zones


def process_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str, col: str
) -> None:
    """Land one batch's HLL / CM / Bloom zones (idempotent overwrite)."""
    sketches.hll_registers(batch, col).write.mode("overwrite").parquet(
        f"{state_dir}/hll/batch={batch_id}"
    )
    sketches.cm_counters(batch, col).write.mode("overwrite").parquet(
        f"{state_dir}/cm/batch={batch_id}"
    )
    sketches.bloom_bits(batch, col).write.mode("overwrite").parquet(
        f"{state_dir}/bloom/batch={batch_id}"
    )


def read_hll_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    """MAX-merged registers over every landed zone."""
    zones.assert_zones_clean(spark, state_dir, ("hll",))
    return (
        spark.read.parquet(f"{state_dir}/hll")
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )


def read_cm_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """SUM-merged counters over every landed zone."""
    zones.assert_zones_clean(spark, state_dir, ("cm",))
    return (
        spark.read.parquet(f"{state_dir}/cm")
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_bloom_bits(spark: SparkSession, state_dir: str) -> DataFrame:
    """UNION-DISTINCT-merged bit set over every landed zone."""
    zones.assert_zones_clean(spark, state_dir, ("bloom",))
    return spark.read.parquet(f"{state_dir}/bloom").select("bit").distinct()


def process_numeric_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str, num_col: str
) -> None:
    """Land one batch's quantile-sketch zone (idempotent overwrite) —
    the (bin, cnt) log-width histogram SUM-merges exactly like the
    Count-Min counters."""
    sketches.qsketch_counts(batch, num_col).write.mode("overwrite").parquet(
        f"{state_dir}/qs/batch={batch_id}"
    )


def read_qsketch_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """SUM-merged quantile-sketch bins over every landed zone."""
    zones.assert_zones_clean(spark, state_dir, ("qs",))
    return (
        spark.read.parquet(f"{state_dir}/qs")
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
