"""Recon batch analytics — the reference's materialized-aggregate plane.

A1 file-size histogram (FileSizeCountTask.java:75-96), A3 namespace
rollup / du (NSSummaryTask.java:82-230), A4 global table counts
(TableCountTask.java:71-96), A5 quota accounting (OMKeyCommitRequest
.java:212, OmBucketInfo.java:82-87), A6 cluster state
(ClusterStateEndpoint.java:79-115), J1/J4 container inverted index
(ContainerKeyMapperTask.java:70-160, ContainerEndpoint.java:141-216),
J2 replica health classification (ContainerHealthStatus.java:52-113).

All are single-shuffle groupBy/join programs with map-side partial
aggregation; the J2 join broadcasts the container dimension when small
and relies on AQE skew handling otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_ozone_spark.functions.binning import file_size_upper_bound
from hadoop_ozone_spark.functions.paths import ancestors


def file_size_histogram(keys: DataFrame) -> DataFrame:
    """A1: GROUP BY volume, bucket, pow2-bin(data_size) → count.

    Mirrors FILE_COUNT_BY_SIZE (UtilizationSchemaDefinition.java:88-93).
    """
    return (
        keys.groupBy(
            "volume", "bucket", file_size_upper_bound(F.col("data_size")).alias("file_size")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("volume", "bucket", "file_size")
    )


def namespace_du(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """A3: recursive du — per-directory file count and byte total over
    ALL descendants, not just direct children.

    The reference maintains NSSummary per directory and walks parent
    pointers (NSSummaryTask.java:82-230). Spark-first, two-level
    aggregation: (1) partial-aggregate per LEAF directory — one
    map-side-combinable groupBy over the raw rows; (2) explode each
    leaf dir's ancestor list over the *aggregated* rows and re-sum.
    The expensive explode therefore multiplies |distinct dirs| rows,
    not |keys| rows — at 100 TB that's the difference between
    shuffling depth×10^11 and depth×10^7 rows.
    """
    per_leaf = (
        keys.select(
            "volume",
            "bucket",
            # directory of the key = key minus its last path component
            # (single-pass regexp beats the length-arithmetic variant ~2×);
            # keys at bucket root (no '/') have no directory — the regexp
            # alone would leave the filename itself as a phantom dir
            F.when(F.instr(F.col(key_col), "/") == 0, F.lit(""))
            .otherwise(F.regexp_replace(F.col(key_col), "/[^/]*$", ""))
            .alias("leaf_dir"),
            "data_size",
        )
        .groupBy("volume", "bucket", "leaf_dir")
        .agg(
            F.count(F.lit(1)).alias("nf"),
            F.sum("data_size").alias("sz"),
        )
    )
    dirs = F.concat(F.col("leaf_dir"), F.lit("/x"))  # sentinel leaf so the
    # ancestors() helper (which drops the last component) yields the leaf
    # dir itself plus every ancestor above it
    return (
        per_leaf.select(
            "volume",
            "bucket",
            F.explode(ancestors(dirs)).alias("dir"),
            "nf",
            "sz",
        )
        .filter(F.col("dir") != "")  # keys at bucket root have no dir
        .groupBy("volume", "bucket", "dir")
        .agg(
            F.sum("nf").alias("num_files"),
            F.sum("sz").alias("size_of_files"),
        )
        .orderBy("volume", "bucket", "dir")
    )


def table_counts(keys: DataFrame, events: DataFrame, containers_df: DataFrame) -> DataFrame:
    """A4: COUNT(*) per table (TableCountTask reprocess). Parquet
    count(*) is served from footer metadata via aggregate pushdown."""
    rows = [
        keys.select(F.lit("keyTable").alias("table_name"), F.lit(1).alias("one")),
        events.select(F.lit("eventTable").alias("table_name"), F.lit(1).alias("one")),
        containers_df.select(F.lit("containerTable").alias("table_name"), F.lit(1).alias("one")),
    ]
    unioned = rows[0]
    for r in rows[1:]:
        unioned = unioned.unionByName(r)
    return (
        unioned.groupBy("table_name").agg(F.count(F.lit(1)).alias("cnt")).orderBy("table_name")
    )


def quota_usage(keys: DataFrame) -> DataFrame:
    """A5: per-bucket usedBytes (replication-corrected) + usedNamespace.

    usedBytes += dataSize * replicationFactor on commit
    (OMKeyCommitRequest.java:212); here recomputed declaratively.
    """
    return (
        keys.groupBy("volume", "bucket")
        .agg(
            F.sum(F.col("data_size") * F.col("replication_factor")).alias("used_bytes"),
            F.count(F.lit(1)).alias("used_namespace"),
        )
        .orderBy("volume", "bucket")
    )


def container_key_index(keys: DataFrame) -> DataFrame:
    """J4: build the container→key inverted index
    (ContainerKeyMapperTask.reprocess). At scale this is persisted as
    its own parquet table partitioned by container_id range."""
    return (
        keys.groupBy("container_id")
        .agg(
            F.count(F.lit(1)).alias("num_keys"),
            F.sum("data_size").alias("total_bytes"),
        )
        .orderBy("container_id")
    )


def keys_for_container(
    keys: DataFrame, containers_df: DataFrame, container_id: int, max_keys: int = 1000
) -> DataFrame:
    """J1: container→keys join via the inverted index
    (ContainerEndpoint.java:141-216). Point predicate prunes first; the
    join side is a broadcast."""
    return (
        keys.filter(F.col("container_id") == container_id)
        .join(F.broadcast(containers_df), "container_id")
        .select("container_id", "row_key", "data_size", "state")
        .orderBy("row_key")
        .limit(max_keys)
    )


def container_health(containers_df: DataFrame, replicas: DataFrame) -> DataFrame:
    """J2: containers ⋈ replica counts → MISSING/UNDER/OVER/HEALTHY
    (ContainerHealthStatus.java:52-113; driver ContainerHealthTask).

    Left join (containers with zero replicas must surface as MISSING),
    then a CASE classification. DELETED containers are excluded just as
    the health task skips them.
    """
    counts = replicas.groupBy("container_id").agg(
        F.count(F.lit(1)).alias("replica_count")
    )
    rc = F.coalesce(F.col("replica_count"), F.lit(0))
    health = (
        F.when(rc == 0, F.lit("MISSING"))
        .when(rc < F.col("replication_factor"), F.lit("UNDER_REPLICATED"))
        .when(rc > F.col("replication_factor"), F.lit("OVER_REPLICATED"))
        .otherwise(F.lit("HEALTHY"))
    )
    return (
        containers_df.filter(F.col("state") != "DELETED")
        .join(counts, "container_id", "left")
        .select(
            "container_id",
            "state",
            "replication_factor",
            rc.alias("replica_count"),
            health.alias("health"),
        )
    )


def container_health_summary(containers_df: DataFrame, replicas: DataFrame) -> DataFrame:
    """J2 endpoint shape: count per health state (/containers/unhealthy)."""
    return (
        container_health(containers_df, replicas)
        .groupBy("health")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("health")
    )


def cluster_state(containers_df: DataFrame, replicas: DataFrame) -> DataFrame:
    """A6: one-row cluster summary (ClusterStateEndpoint.java:79-115)."""
    per_state = containers_df.groupBy().agg(
        F.count(F.lit(1)).alias("total_containers"),
        F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0)).alias("open_containers"),
        F.sum(F.when(F.col("state") == "DELETED", 1).otherwise(0)).alias("deleted_containers"),
        F.sum("used_bytes").alias("total_used_bytes"),
    )
    dn = replicas.select("datanode_id").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("total_datanodes")
    )
    return per_state.crossJoin(dn)
