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


def process_set_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str, col: str
) -> None:
    """Land one batch's KMV and Misra-Gries zones (idempotent
    overwrite) — the set-operation / heavy-hitter members of the
    rolling sketch family:

    - KMV zones merge by union-then-k-smallest, which is EXACT
      (stream ≡ batch, pinned): a globally-k-smallest hash is k-smallest
      within its own batch too;
    - MG zones merge by summing per-key counts and re-truncating; the
      merged bound is Σ per-zone thresholds + the re-truncation's own
      (the mg_merge law). Each zone carries a NULL-key sentinel so an
      empty summary still records its threshold."""
    sketches.kmv_sketch(batch, col).write.mode("overwrite").parquet(
        f"{state_dir}/kmv/batch={batch_id}"
    )
    sketches.mg_zone(batch, col).write.mode("overwrite").parquet(
        f"{state_dir}/mg/batch={batch_id}"
    )


def read_kmv_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union-then-k-smallest over every landed zone — identical to the
    batch sketch of the concatenated input (pinned)."""
    zones.assert_zones_clean(spark, state_dir, ("kmv",))
    return (
        spark.read.parquet(f"{state_dir}/kmv")
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(sketches.KMV_K)
    )


def read_mg_summary(spark: SparkSession, state_dir: str, k: int = sketches.MG_K) -> DataFrame:
    """ZONE-form fold of every landed MG zone (ADVICE r9): sum per-key
    counts (sentinels drop from the counts, their thresholds don't),
    re-truncate by the summed set's (k+1)-th largest, and append the
    NULL-key sentinel row carrying the folded bound — mg_threshold
    everywhere = Σ zone thresholds + the re-truncation's own, the
    one-sided bound vs the exact counts of the concatenated stream
    (pinned). Returning zone form keeps the fold compose-safe (the
    mg_merge contract): an all-truncated fold still records its
    accumulated error, and the result can be re-landed / re-merged
    without dropping its bound. Filter ``key IS NOT NULL`` for the
    display summary."""
    zones.assert_zones_clean(spark, state_dir, ("mg",))
    z = spark.read.parquet(f"{state_dir}/mg")
    t_in = (
        z.groupBy("batch")
        .agg(F.max("mg_threshold").alias("t"))
        .agg(F.coalesce(F.sum("t"), F.lit(0)).alias("t_in"))
    )
    summed = (
        z.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("mg_count").alias("cnt"))
    )
    top = summed.orderBy(F.desc("cnt"), F.asc("key")).limit(k + 1)
    tm = top.agg(
        F.when(F.count(F.lit(1)) > F.lit(k), F.min("cnt"))
        .otherwise(F.lit(0))
        .alias("tm")
    )
    bound = tm.crossJoin(F.broadcast(t_in)).select(
        (F.col("tm") + F.col("t_in")).alias("tb"),
        F.col("tm").alias("tm"),
    )
    out = (
        summed.crossJoin(F.broadcast(bound))
        .filter(F.col("cnt") > F.col("tm"))
        .select(
            F.col("key").cast("string").alias("key"),
            (F.col("cnt") - F.col("tm")).cast("long").alias("mg_count"),
            F.col("tb").cast("long").alias("mg_threshold"),
        )
    )
    sentinel = bound.select(
        F.lit(None).cast("string").alias("key"),
        F.lit(0).cast("long").alias("mg_count"),
        F.col("tb").cast("long").alias("mg_threshold"),
    )
    return out.unionByName(sentinel)


def run_set_sketch_stream(
    df_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
):
    """foreachBatch driver wiring ``process_set_batch`` (KMV + MG
    zones) to a stream — the deployment entry point (the
    run_span_ingest_stream shape)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_set_batch(batch.sparkSession, batch, batch_id, state_dir, col)

    return (
        df_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_sketch_stream(
    df_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
):
    """foreachBatch driver wiring ``process_batch`` (HLL/CM/Bloom
    zones) to a stream — the deployment entry point."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_batch(batch.sparkSession, batch, batch_id, state_dir, col)

    return (
        df_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_numeric_sketch_stream(
    df_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    num_col: str,
):
    """foreachBatch driver wiring ``process_numeric_batch`` (quantile
    sketch zones) to a stream — the deployment entry point."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_numeric_batch(
            batch.sparkSession, batch, batch_id, state_dir, num_col
        )

    return (
        df_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_sample_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str,
    k: int = sketches.RSV_K,
    seed: str = "rsv",
) -> None:
    """Land one batch's reservoir zone (idempotent overwrite): the
    batch's own bottom-k draws. Zones fold by union-then-k-smallest,
    which is EXACT (the KMV merge argument applied to row identity):
    a globally k-smallest draw is k-smallest within its own batch.
    (No SparkSession parameter: unlike the numeric/sketch batch
    processors, the reservoir build needs only the batch frame —
    ADVICE r11.)"""
    sketches.reservoir_sample(batch, id_col, k, seed).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/rsv/batch={batch_id}")


def read_reservoir(
    spark: SparkSession, state_dir: str, k: int = sketches.RSV_K
) -> DataFrame:
    """Union-then-k-smallest over every landed reservoir zone —
    identical to the batch sample of the concatenated input (pinned):
    the rolling exact-k uniform sample of everything ingested so far."""
    zones.assert_zones_clean(spark, state_dir, ("rsv",))
    return (
        spark.read.parquet(f"{state_dir}/rsv")
        .select("h", "doc_id")
        .orderBy("h", "doc_id")
        .limit(k)
    )


def process_weighted_sample_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str,
    weight_col: str,
    k: int = sketches.RSV_K,
    seed: str = "wrsv",
) -> None:
    """Land one batch's WEIGHTED reservoir zone (idempotent overwrite):
    the batch's k smallest exponential race keys, key kept — the
    A-ExpJ merge needs it. Zones fold by union-then-k-smallest-keys,
    EXACT by the same argument as the uniform reservoir (a globally
    k-smallest key is k-smallest within its own batch); Spark writes
    and re-reads the double key, so the fold compares the exact bits
    the build computed."""
    sketches.weighted_reservoir_bottomk(
        batch, id_col, weight_col, k, seed
    ).write.mode("overwrite").parquet(f"{state_dir}/wrsv/batch={batch_id}")


def read_weighted_reservoir(
    spark: SparkSession, state_dir: str, k: int = sketches.RSV_K
) -> DataFrame:
    """Union-then-k-smallest-keys over every landed weighted zone —
    identical to the batch weighted sample of the concatenated input
    (pinned): the rolling ES weighted k-sample of everything ingested
    so far, in the batch output contract (doc_id, weight)."""
    zones.assert_zones_clean(spark, state_dir, ("wrsv",))
    return (
        spark.read.parquet(f"{state_dir}/wrsv")
        .select("_key", "doc_id", "weight")
        .orderBy("_key", "doc_id")
        .limit(k)
        .select("doc_id", "weight")
        .orderBy("doc_id")
    )


def run_weighted_reservoir_stream(
    df_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str,
    weight_col: str,
    k: int = sketches.RSV_K,
    seed: str = "wrsv",
):
    """foreachBatch driver wiring ``process_weighted_sample_batch`` to
    a stream — the deployment entry point (the run_sketch_stream
    shape)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_weighted_sample_batch(
            batch, batch_id, state_dir, id_col, weight_col, k, seed
        )

    return (
        df_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_reservoir_stream(
    df_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str,
    k: int = sketches.RSV_K,
    seed: str = "rsv",
):
    """foreachBatch driver wiring ``process_sample_batch`` to a stream
    — the deployment entry point (the run_sketch_stream shape)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_sample_batch(batch, batch_id, state_dir, id_col, k, seed)

    return (
        df_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
