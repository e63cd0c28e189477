"""S9 — materialized analytic marts (the Recon serving tables).

Reference: Recon persists FILE_COUNT_BY_SIZE / GLOBAL_STATS rows in SQL
and nsSummary/containerKey CFs in RocksDB, then REST endpoints serve
them with residual filters (SURVEY §3.3 step 4-5). Here each mart is a
parquet table, partitioned so endpoint-style residual queries prune:

- file_count_by_size: partitioned by volume (filters volume/bucket/size)
- namespace_du:       partitioned by (volume, bucket)
- container_key_index: unpartitioned (point lookups by container range
  use row-group stats on the sorted container_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadoop_ozone_spark.operators import recon


def materialize_marts(spark: SparkSession, keys: DataFrame, out_dir: str) -> dict[str, str]:
    paths = {}
    hist = recon.file_size_histogram(keys)
    p = f"{out_dir}/file_count_by_size"
    hist.write.mode("overwrite").partitionBy("volume").parquet(p)
    paths["file_count_by_size"] = p

    du = recon.namespace_du(keys)
    p = f"{out_dir}/namespace_du"
    du.write.mode("overwrite").partitionBy("volume", "bucket").parquet(p)
    paths["namespace_du"] = p

    idx = recon.container_key_index(keys)
    p = f"{out_dir}/container_key_index"
    idx.sortWithinPartitions("container_id").write.mode("overwrite").parquet(p)
    paths["container_key_index"] = p
    return paths


def file_count_endpoint(
    spark: SparkSession,
    mart_dir: str,
    volume: str | None = None,
    bucket: str | None = None,
    file_size: int | None = None,
) -> DataFrame:
    """/utilization/fileCount with residual filters (ref
    UtilizationEndpoint.java:65-101 — its hand-rolled if-ladder is just
    predicate pushdown, which the partitioned mart gives for free)."""
    df = spark.read.parquet(f"{mart_dir}/file_count_by_size")
    if volume is not None:
        df = df.filter(df.volume == volume)
    if bucket is not None:
        df = df.filter(df.bucket == bucket)
    if file_size is not None:
        df = df.filter(df.file_size == file_size)
    return df


def task_status(spark: SparkSession, mart_dirs: dict[str, str]) -> DataFrame:
    """/task/status (TaskStatusService.java:35-55): one row per Recon
    maintenance task with its last successful run marker. Our tasks are
    the versioned streaming marts (streaming/maintenance.py
    run_foreachbatch_merge): the marker is the newest complete version
    directory — -1 when the task has never completed a run.
    """
    from hadoop_ozone_spark.streaming.maintenance import _mart_versions

    rows = []
    for task, d in sorted(mart_dirs.items()):
        versions = _mart_versions(spark, d)
        rows.append(
            (task, versions[-1] if versions else -1, len(versions))
        )
    return spark.createDataFrame(
        rows, "task_name string, last_version long, versions_retained long"
    )
