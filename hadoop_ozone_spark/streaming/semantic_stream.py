"""Rolling-ingest SEMANTIC dedup: the streaming twin of
``similarity.semantic_dedup_pairs``.

Each micro-batch of new vectors is assigned to the FIXED broadcast
codebook (the same centroids every batch — train once, persist), then
compared only against same-cluster vectors from the persisted index ∪
the batch itself; flagged duplicates append and the index extends with
the batch. A batch's cost is O(|batch| × cluster occupancy), never a
corpus rescan.

Batch/stream equivalence (pinned by test_semantic_stream): with
batches arriving in vec_id order and one codebook throughout,

    pairs(corpus) = Σ_i incremental(state_i, batch_i)

because cluster assignment is per-vector (order-free) and the batch
law's canonical ``dup_of`` is the LOWEST matching vec_id — which, for
any vector, is already present in (state ∪ its own batch) by the time
it arrives.

Crash-safety follows dedup_stream's recipe: per-batch landing zones
keyed by batch_id (replays rewrite, never double-append) and state
reads filtered to batches strictly before the current one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_ozone_spark.datapipe.similarity import as_double, cosine
from hadoop_ozone_spark.streaming import zones

VEC_STATE_SCHEMA = "list_id long, vec_id long, v array<double>, n double"


def _read_state(
    spark: SparkSession, path: str, before_batch: int
) -> DataFrame:
    # Only the first-batch missing-path case maps to an empty index.
    # Any OTHER read failure must propagate and abort the batch —
    # swallowing it would silently dedup against nothing and break the
    # pinned stream≡batch equivalence without surfacing an error.
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.parquet(path)
            .filter(F.col("batch") < before_batch)
            .select("list_id", "vec_id", "v", "n")
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], VEC_STATE_SCHEMA)
        raise


def assign_batch(
    batch: DataFrame, centroids: DataFrame, vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(list_id, vec_id, v, n): nearest-centroid assignment + norm —
    the same law as ivf_index/semantic_dedup_pairs (rounded cosine,
    ties → lowest list_id)."""
    from hadoop_ozone_spark.datapipe.similarity import (
        hoist_norm,
        hoisted_cosine,
        norm,
    )

    score = hoisted_cosine("_hd", "_hn", "cvec", "_chn", round_digits)
    scored = (
        hoist_norm(batch, vec_col, "_hd", "_hn")
        .crossJoin(F.broadcast(centroids.withColumn("_chn", norm(F.col("cvec")))))
        .select(
            "vec_id",
            F.col("_hd").alias("v"),
            (-F.col("list_id")).alias("neg_list"),
            score.alias("score"),
        )
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct("score", "neg_list", F.col("v").alias("v"))).alias("m")
    )
    return best.select(
        (-F.col("m.neg_list")).cast("long").alias("list_id"),
        "vec_id",
        F.col("m.v").alias("v"),
    ).withColumn("n", norm(F.col("v")))


def process_vec_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    centroids: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> None:
    """One micro-batch: flag each new vector's lowest-id semantic
    duplicate among same-cluster predecessors (state ∪ batch), then
    extend the cluster index."""
    assigned = assign_batch(batch, centroids, vec_col, round_digits).persist()
    # crash atomicity: refuse a half-committed index zone (earlier
    # batches only — this batch's own zones are about to be rewritten)
    zones.assert_zones_clean(
        spark, state_dir, ("index", "pairs"), before_batch=batch_id
    )
    state = _read_state(spark, f"{state_dir}/index", batch_id)
    every = state.unionByName(assigned)
    a = every.select(
        "list_id", F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"), F.col("n").alias("na"),
    )
    b = assigned.select(
        "list_id", F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"), F.col("n").alias("nb"),
    )
    from hadoop_ozone_spark.datapipe.similarity import dot

    sim = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        round_digits,
    )
    pairs = (
        b.join(a, "list_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("list_id", "vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
    flagged = (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_b").orderBy("vec_a")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "list_id",
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("dup_of"),
            "cosine_sim",
        )
    )
    flagged.write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    assigned.write.mode("overwrite").parquet(
        f"{state_dir}/index/batch={batch_id}"
    )
    assigned.unpersist()


def run_semantic_stream(
    vec_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    threshold: float = 0.9,
):
    """foreachBatch driver wiring ``process_vec_batch`` to a vector
    stream — the deployment entry point."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_vec_batch(
            batch.sparkSession, batch, batch_id, state_dir, centroids,
            threshold,
        )

    return (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
