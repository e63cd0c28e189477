"""Rolling-ingest IVFPQ index maintenance: the streaming twin of
``similarity.ivfpq_index``.

Each micro-batch of new vectors is assigned to the FIXED coarse
codebook and PQ-encoded against the FIXED residual codebooks (train
once, persist — the IVFADC deployment shape), then APPENDED to the
persisted code table partitioned by list_id. A batch's cost is
O(|batch| × (n_lists + m·n_codes)) — the corpus is never re-encoded,
matching the repo's delta-driven doctrine (minhash delta probe,
semantic-dedup stream, RM re-planning).

Stream≡batch (pinned by test_ann_stream): under one codebook pair,

    ivfpq_index(corpus) = ⋃_i ivfpq_index(batch_i)

because assignment and encode are per-vector and order-free. Searches
over the incrementally-built persisted index therefore equal searches
over an inline full-corpus build.

Crash-safety follows dedup_stream's recipe: per-batch landing zones
keyed by batch subdirectory (replays rewrite, never double-append).
The reader unions every landed batch; a replayed batch overwrites its
own zone, so the union is idempotent at any replay point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_ozone_spark.datapipe.similarity import ivfpq_index

CODES_SCHEMA = "list_id long, vec_id long, codes array<int>"


def process_vec_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    n_lists: int = 16,
    m: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    vec_col: str = "embedding",
) -> None:
    """One micro-batch: encode the new vectors against the fixed
    codebooks and land their codes in the batch's own zone, partitioned
    by list_id (the probe-prunable layout)."""
    codes = ivfpq_index(
        batch, n_lists, m, n_codes, dims, vec_col,
        centroids=centroids, codebooks=codebooks,
    )
    codes.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{state_dir}/codes/batch={batch_id}"
    )


def read_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The incrementally-built code table (list_id, vec_id, codes) —
    drop-in for ``ivfpq_topk(index=...)``. Partition pruning on
    list_id still applies: list_id is a partition column of every
    batch zone."""
    from pyspark.errors import AnalysisException

    from hadoop_ozone_spark.streaming import zones

    # crash atomicity (the spans/search/sketch/dedup contract): a
    # half-committed code zone would silently drop vectors from the
    # searchable index — fail loudly; repair = replay the batch
    zones.assert_zones_clean(spark, state_dir, ("codes",))
    try:
        return (
            spark.read.option("basePath", f"{state_dir}/codes")
            .parquet(f"{state_dir}/codes")
            .select("list_id", "vec_id", "codes")
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], CODES_SCHEMA)
        raise


def run_ann_ingest_stream(
    vec_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    codebooks: DataFrame,
):
    """foreachBatch driver wiring ``process_vec_batch`` to a vector
    stream — the deployment entry point."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_vec_batch(
            batch.sparkSession, batch, batch_id, state_dir,
            centroids, codebooks,
        )

    return (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
