"""Rolling-ingest dedup: the streaming twin of
``dedup.minhash_incremental_pairs``.

Each micro-batch of new documents is checked against a persisted
dedup INDEX (band table + hashed-shingle table, both parquet), the
confirmed pairs are appended, and the index is extended with the
batch — so corpus state never recomputes and a batch's cost is
O(|batch| + matched buckets). Batch/stream equivalence is the law
``pairs(corpus ∪ batches) = Σ incremental(state_i, batch_i)``
(pinned by test_streaming_dedup_matches_batch), which holds because
signatures are per-doc and banding is an equi-join — exactly the
argument that makes A2's process≡reprocess law hold for counters.

Crash-safety mirrors the versioned-mart recipe (maintenance.py):
appends of pairs and index rows land in per-batch subdirectories named
by batch_id, so a replayed batch overwrites its own directory instead
of double-appending (idempotent foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.datapipe import dedup
from hadoop_ozone_spark.streaming import zones

INDEX_SCHEMA = "doc_id long, h0 array<long>"
BANDS_SCHEMA = "doc_id long, band_id int, band_hash string"


def _read_state(
    spark: SparkSession, path: str, schema: str, before_batch: int
) -> DataFrame:
    """Index rows from batches STRICTLY BEFORE ``before_batch`` — so a
    replayed batch sees exactly the state its original run saw, no
    matter when the replay happens (idempotence at any point), and its
    own half-written landing zone can never feed back into itself."""
    cols = [c.split()[0] for c in schema.split(", ")]
    # First-batch missing path → empty index; any other failure must
    # propagate (a swallowed read error would dedup against nothing and
    # silently violate the replay-idempotence law pinned in tests).
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.parquet(path)
            .filter(F.col("batch") < before_batch)
            .select(*cols)
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    threshold: float = 0.5,
    portable: bool = True,
) -> None:
    """One micro-batch: pairs vs state + within-batch, then extend state."""
    hashed = dedup.hashed_shingle_df(batch, portable=portable).persist()
    hashed = hashed.filter(F.size("h0") > 0)
    bands = dedup.band_table(
        dedup.signatures_from_hashed(hashed, portable=portable), portable=portable
    ).persist()

    # crash atomicity: a half-committed index zone would dedup against
    # a silently partial corpus — fail loudly; this batch's own
    # (being-rewritten) zones are excluded via before_batch
    zones.assert_zones_clean(
        spark, state_dir, ("hashed", "bands"), before_batch=batch_id
    )
    state_h = _read_state(spark, f"{state_dir}/hashed", INDEX_SCHEMA, batch_id)
    state_b = _read_state(spark, f"{state_dir}/bands", BANDS_SCHEMA, batch_id)

    d = bands.withColumn("is_delta", F.lit(True)).alias("a")
    all_b = (
        state_b.withColumn("is_delta", F.lit(False))
        .unionByName(bands.withColumn("is_delta", F.lit(True)))
        .alias("b")
    )
    cand = (
        d.join(
            all_b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sets = state_h.unionByName(hashed).withColumnRenamed("h0", "sh")
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    # idempotent per-batch landing zones: a replay rewrites, never appends
    pairs.write.mode("overwrite").parquet(f"{state_dir}/pairs/batch={batch_id}")
    hashed.write.mode("overwrite").parquet(f"{state_dir}/hashed/batch={batch_id}")
    bands.write.mode("overwrite").parquet(f"{state_dir}/bands/batch={batch_id}")
    hashed.unpersist()
    bands.unpersist()


def run_dedup_stream(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """availableNow foreachBatch wiring over a documents stream."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        process_batch(
            batch.sparkSession, batch, batch_id, state_dir, threshold=threshold
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    zones.assert_zones_clean(spark, state_dir, ("pairs",))
    return spark.read.parquet(f"{state_dir}/pairs")


LABELS_SCHEMA = "doc_id long, cluster_id long, cluster_size long, keep boolean"


def update_clusters(spark: SparkSession, state_dir: str, batch_id: int) -> None:
    """Roll the cluster-label state: labels(N) = incremental CC over
    labels(latest zone < N) contracted to star edges + batch N's landed
    pairs (dedup.dedup_clusters_incremental). Replay-idempotent — both
    inputs are stable zones, so re-running batch N rewrites
    labels/batch=N with identical rows; stream ≡ batch is the
    contraction law applied inductively (pinned in
    test_streaming_clusters_match_batch)."""
    from pyspark.errors import AnalysisException

    # inputs: earlier label zones + THIS batch's landed pairs zone — a
    # torn pairs zone means process_batch died mid-commit; replay it
    # first
    zones.assert_zones_clean(
        spark, state_dir, ("labels",), before_batch=batch_id
    )
    zones.assert_zones_clean(spark, state_dir, ("pairs",), only_batch=batch_id)
    try:
        landed = (
            spark.read.option("basePath", f"{state_dir}/labels")
            .parquet(f"{state_dir}/labels")
            .filter(F.col("batch") < batch_id)
        )
        mx = landed.agg(F.max("batch").alias("_mx"))
        prior = (
            landed.crossJoin(F.broadcast(mx))
            .filter(F.col("batch") == F.col("_mx"))
            .select("doc_id", "cluster_id", "cluster_size", "keep")
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            prior = spark.createDataFrame([], LABELS_SCHEMA)
        else:
            raise
    pairs = spark.read.parquet(f"{state_dir}/pairs/batch={batch_id}").select(
        "doc_a", "doc_b"
    )
    labels = dedup.dedup_clusters_incremental(prior, pairs)
    labels.write.mode("overwrite").parquet(f"{state_dir}/labels/batch={batch_id}")


def read_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest landed cluster-label table."""
    zones.assert_zones_clean(spark, state_dir, ("labels",))
    landed = spark.read.option("basePath", f"{state_dir}/labels").parquet(
        f"{state_dir}/labels"
    )
    mx = landed.agg(F.max("batch").alias("_mx"))
    return (
        landed.crossJoin(F.broadcast(mx))
        .filter(F.col("batch") == F.col("_mx"))
        .select("doc_id", "cluster_id", "cluster_size", "keep")
    )
