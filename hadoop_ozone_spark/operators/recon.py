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

from pyspark.sql import DataFrame, Window
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


def _leaf_dir(key_col: str) -> F.Column:
    """Directory of a key = key minus its last path component ('' at
    bucket root)."""
    return (
        F.when(F.instr(F.col(key_col), "/") == 0, F.lit(""))
        .otherwise(F.regexp_replace(F.col(key_col), "/[^/]*$", ""))
    )


def namespace_histogram(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """A3 NSSummary histogram, long format: per-directory DIRECT-file
    pow2 size distribution (volume, bucket, dir, file_size, cnt).

    The reference keeps a 41-bin ``int[] fileSizeBucket`` per directory
    (NSSummary.java:31-35, bins ReconConstants.java:61-67); pivoted long
    format is the Spark-preferred shape (SURVEY §1.2) — one map-side
    combinable groupBy, no wide rows, and the Recon UI's per-dir
    distribution is a prefix-pruned slice of it.
    """
    return (
        keys.groupBy(
            "volume",
            "bucket",
            _leaf_dir(key_col).alias("dir"),
            file_size_upper_bound(F.col("data_size")).alias("file_size"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("volume", "bucket", "dir", "file_size")
    )


def namespace_summary(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """A3 NSSummary parity, struct form: one row per directory with
    DIRECT num_files / size_of_files, the 42-slot bin-count array
    (41 pow2 bins + overflow, ReconUtils bit-count boundary semantics),
    and the immediate child-directory set — the full NSSummary record
    (NSSummary.java:31-35) including intermediate dirs with no direct
    files and the bucket root ('').

    Shape: one groupBy over the keys (42 conditional sums fold into the
    bin array), then dir-graph derivation over the DISTINCT dir set —
    the explode multiplies |dirs|, never |keys|.
    """
    from hadoop_ozone_spark.functions.binning import LONG_MAX, UPPER_BOUNDS

    bins = [*UPPER_BOUNDS, LONG_MAX]
    tagged = keys.select(
        "volume",
        "bucket",
        _leaf_dir(key_col).alias("dir"),
        "data_size",
        file_size_upper_bound(F.col("data_size")).alias("_ub"),
    )
    stats = (
        tagged.groupBy("volume", "bucket", "dir")
        .agg(
            F.count(F.lit(1)).alias("num_files"),
            F.sum("data_size").alias("size_of_files"),
            *[
                F.sum(F.when(F.col("_ub") == b, 1).otherwise(0)).alias(f"_bin{i}")
                for i, b in enumerate(bins)
            ],
        )
        .select(
            "volume",
            "bucket",
            "dir",
            "num_files",
            "size_of_files",
            F.array(*[F.col(f"_bin{i}").cast("long") for i in range(len(bins))]).alias(
                "file_size_bins"
            ),
        )
    )
    # every ancestor of every populated dir + the bucket root: the node
    # set includes intermediate dirs that hold no direct files
    nodes = (
        stats.select(
            "volume",
            "bucket",
            F.explode(
                F.concat(
                    F.array(F.lit("")),
                    ancestors(F.concat(F.col("dir"), F.lit("/x"))),
                )
            ).alias("dir"),
        )
        .distinct()
    )
    parent = (
        F.when(F.instr(F.col("dir"), "/") == 0, F.lit(""))
        .otherwise(F.regexp_replace(F.col("dir"), "/[^/]*$", ""))
    )
    child_sets = (
        nodes.filter(F.col("dir") != "")
        .select("volume", "bucket", parent.alias("parent_dir"), F.col("dir").alias("child"))
        .groupBy("volume", "bucket", "parent_dir")
        .agg(F.array_sort(F.collect_set("child")).alias("child_dirs"))
        .withColumnRenamed("parent_dir", "dir")
    )
    zeros = F.array(*[F.lit(0).cast("long") for _ in bins])
    return (
        nodes.join(stats, ["volume", "bucket", "dir"], "left")
        .join(child_sets, ["volume", "bucket", "dir"], "left")
        .select(
            "volume",
            "bucket",
            "dir",
            F.coalesce(F.col("num_files"), F.lit(0)).alias("num_files"),
            F.coalesce(F.col("size_of_files"), F.lit(0)).alias("size_of_files"),
            F.coalesce(F.col("file_size_bins"), zeros).alias("file_size_bins"),
            F.coalesce(F.col("child_dirs"), F.array().cast("array<string>")).alias(
                "child_dirs"
            ),
        )
        .orderBy("volume", "bucket", "dir")
    )


def cluster_growth_daily(keys: DataFrame) -> DataFrame:
    """A7 parity: CLUSTER_GROWTH_DAILY keyed by (timestamp, datanode_id)
    (UtilizationSchemaDefinition.java:74-87, PK at :83-84) — per-day
    per-datanode used bytes, container count, block count. One shuffle
    keyed (day, datanode); countDistinct is a partial-agg pair."""
    return (
        keys.groupBy(
            F.date_trunc("day", F.col("creation_time")).alias("day"), "datanode_id"
        )
        .agg(
            F.sum("data_size").alias("used_size"),
            F.countDistinct("container_id").alias("container_count"),
            F.count(F.lit(1)).alias("block_count"),
        )
        .orderBy("day", "datanode_id")
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


def container_health(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame | None = None,
) -> DataFrame:
    """J2: containers ⋈ replica counts (⋈ rack topology) →
    MISSING/UNDER/OVER/MIS_REPLICATED/HEALTHY
    (ContainerHealthStatus.java:52-113; ContainerHealthTask.java:324-336).

    Left join (containers with zero replicas must surface as MISSING),
    then a CASE classification. DELETED containers are excluded just as
    the health task skips them.

    Placement (rack-scatter policy, SCMCommonPlacementPolicy.java:288-320 +
    ContainerPlacementStatusDefault.java): a container's replicas must span
    ``expected_racks = least(replication_factor, total_racks)`` distinct
    racks; fewer → MIS_REPLICATED with the reference's ``misReplicatedDelta``
    and reason string. ``replication_factor = 1`` is always satisfied
    (SCMCommonPlacementPolicy.java:292). Replica-count states take
    precedence in the single ``health`` column — ``is_mis_replicated`` is
    reported alongside because the reference records the placement state
    independently of the replication state.

    Shape: one shuffle (replica groupBy container); the datanode rack dim
    is broadcast into the replica agg; the total-rack scalar is a
    broadcast cross join. At 100 TB the replica table shuffles once on
    container_id and everything else stays map-side.
    """
    if datanodes_df is None:
        counts = replicas.groupBy("container_id").agg(
            F.count(F.lit(1)).alias("replica_count")
        )
        total_racks = None
    else:
        counts = (
            # LEFT join: a replica on an unregistered datanode still
            # counts toward replica_count (countDistinct skips its null
            # rack — unknown topology can't satisfy placement)
            replicas.join(
                F.broadcast(datanodes_df.select("datanode_id", "rack")),
                "datanode_id",
                "left",
            )
            .groupBy("container_id")
            .agg(
                F.count(F.lit(1)).alias("replica_count"),
                F.countDistinct("rack").alias("distinct_racks"),
            )
        )
        # size(collect_set) not countDistinct: the dim is dozens of rows,
        # so one partial-merge pass (Exchange SinglePartition) beats the
        # two-phase distinct's hashpartitioning(rack) shuffle — keeps the
        # whole J2 plan free of hash Exchanges under the bucketed layout
        total_racks = datanodes_df.agg(
            F.size(F.collect_set("rack")).cast("long").alias("total_racks")
        )

    rc = F.coalesce(F.col("replica_count"), F.lit(0))
    base = containers_df.filter(F.col("state") != "DELETED").join(
        counts, "container_id", "left"
    )
    if total_racks is None:
        health = (
            F.when(rc == 0, F.lit("MISSING"))
            .when(rc < F.col("replication_factor"), F.lit("UNDER_REPLICATED"))
            .when(rc > F.col("replication_factor"), F.lit("OVER_REPLICATED"))
            .otherwise(F.lit("HEALTHY"))
        )
        return base.select(
            "container_id",
            "state",
            "replication_factor",
            rc.alias("replica_count"),
            health.alias("health"),
        )

    base = base.crossJoin(F.broadcast(total_racks))
    racks = F.coalesce(F.col("distinct_racks"), F.lit(0))
    expected = F.least(F.col("replication_factor"), F.col("total_racks"))
    is_mis = (rc > 0) & (F.col("replication_factor") > 1) & (racks < expected)
    health = (
        F.when(rc == 0, F.lit("MISSING"))
        .when(rc < F.col("replication_factor"), F.lit("UNDER_REPLICATED"))
        .when(rc > F.col("replication_factor"), F.lit("OVER_REPLICATED"))
        .when(is_mis, F.lit("MIS_REPLICATED"))
        .otherwise(F.lit("HEALTHY"))
    )
    reason = F.when(
        is_mis,
        F.concat(
            F.lit("The container is mis-replicated as it is on "),
            racks,
            F.lit(" racks but should be on "),
            expected,
            F.lit(" racks."),
        ),
    )
    return base.select(
        "container_id",
        "state",
        "replication_factor",
        rc.alias("replica_count"),
        (F.col("replication_factor") - rc).alias("replica_delta"),
        racks.alias("actual_placement_count"),
        expected.alias("expected_placement_count"),
        is_mis.alias("is_mis_replicated"),
        F.when(is_mis, expected - racks).otherwise(F.lit(0)).alias(
            "mis_replicated_delta"
        ),
        reason.alias("mis_replicated_reason"),
        health.alias("health"),
    )


def container_health_summary(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame | None = None,
) -> DataFrame:
    """J2 endpoint shape: count per health state (/containers/unhealthy)."""
    return (
        container_health(containers_df, replicas, datanodes_df)
        .groupBy("health")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("health")
    )


def replica_history(
    observations: DataFrame, datanodes_df: DataFrame | None = None
) -> DataFrame:
    """Container replica history (ContainerHistory.java:26-80 fields;
    upsert law ReconContainerManager.java:289-336,428-450): per
    (container, datanode) the first and last time a replica was
    reported — first_seen is fixed at the first sighting, last_seen
    advances with every report, i.e. min/max over the sighting feed.
    Hostname resolves from the node table with the reference's 'N/A'
    fallback (ReconContainerManager.java:380-390).

    Shape: one map-side-combinable groupBy on (container, datanode);
    the node dim is broadcast. At 100 TB the sightings feed shuffles
    once on the pair key — the same key the history CF is stored under.
    """
    hist = observations.groupBy("container_id", "datanode_id").agg(
        F.min("seen_time").alias("first_seen"),
        F.max("seen_time").alias("last_seen"),
    )
    if datanodes_df is not None:
        hist = hist.join(
            F.broadcast(datanodes_df.select("datanode_id", "hostname")),
            "datanode_id",
            "left",
        ).withColumn("datanode_host", F.coalesce(F.col("hostname"), F.lit("N/A")))
    else:
        hist = hist.withColumn("datanode_host", F.lit("N/A"))
    return hist.select(
        "container_id", "datanode_id", "datanode_host", "first_seen", "last_seen"
    ).orderBy("container_id", "datanode_id")


def latest_replica_history(
    observations: DataFrame,
    container_id: int,
    limit: int,
    datanodes_df: DataFrame | None = None,
) -> DataFrame:
    """getLatestContainerHistory (ReconContainerManager.java:399-405):
    one container's history, most-recently-seen datanodes first, capped
    at the replication factor."""
    return (
        replica_history(
            observations.filter(F.col("container_id") == container_id), datanodes_df
        )
        .orderBy(F.desc("last_seen"), "datanode_id")
        .limit(limit)
    )


def missing_containers(
    containers_df: DataFrame,
    replicas: DataFrame,
    keys: DataFrame,
    observations: DataFrame,
    datanodes_df: DataFrame | None = None,
) -> DataFrame:
    """/containers/missing (ContainerEndpoint.java:239-270,
    MissingContainerMetadata.java:32-57): for every non-deleted
    container with ZERO live replicas — its key count and bytes (the
    J4 index), its pipeline, the most recent time any replica was seen
    (missing-since analogue), and the last-known datanode locations
    from the history CF capped at the replication factor
    (getLatestContainerHistory, ReconContainerManager.java:399-405).

    Shape: the missing set is containers ANTI-JOIN live replicas (dim
    sized — broadcast everywhere below); the key rollup is the one
    fact-sized aggregation (bucketed/co-located in deployment); the
    history window partitions by container over the history of missing
    containers only (semi-join prunes it first).
    """
    missing = containers_df.filter(F.col("state") != "DELETED").join(
        replicas.select("container_id"), "container_id", "left_anti"
    )
    # prune the fact rollup to missing ids BEFORE aggregating — the J4
    # index over ALL containers would be too big to broadcast at scale;
    # the missing subset is dim-sized by definition
    key_counts = (
        keys.join(F.broadcast(missing.select("container_id")), "container_id", "left_semi")
        .groupBy("container_id")
        .agg(
            F.count(F.lit(1)).alias("key_count"),
            F.sum("data_size").alias("total_bytes"),
        )
    )
    hist = replica_history(
        observations.join(
            F.broadcast(missing.select("container_id")), "container_id", "left_semi"
        ),
        datanodes_df,
    )
    w = Window.partitionBy("container_id").orderBy(
        F.desc("last_seen"), F.asc("datanode_id")
    )
    latest = (
        hist.withColumn("_rn", F.row_number().over(w))
        .join(
            F.broadcast(
                missing.select("container_id", "replication_factor")
            ),
            "container_id",
        )
        .filter(F.col("_rn") <= F.col("replication_factor"))
        .groupBy("container_id")
        .agg(
            F.max("last_seen").alias("last_seen_max"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("datanode_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("last_known_datanodes"),
        )
    )
    return (
        missing.join(F.broadcast(key_counts), "container_id", "left")
        .join(F.broadcast(latest), "container_id", "left")
        .select(
            "container_id",
            "pipeline_id",
            "replication_factor",
            F.coalesce(F.col("key_count"), F.lit(0)).alias("key_count"),
            F.coalesce(F.col("total_bytes"), F.lit(0)).alias("total_bytes"),
            "last_seen_max",
            F.coalesce(F.col("last_known_datanodes"), F.lit("")).alias(
                "last_known_datanodes"
            ),
        )
        .orderBy("container_id")
    )


def datanode_listing(
    datanodes_df: DataFrame,
    replicas: DataFrame,
    containers_df: DataFrame,
    pipelines_df: DataFrame,
    members: DataFrame,
) -> DataFrame:
    """/datanodes (NodeEndpoint.java:83-160): one row per registered
    datanode — state, storage report, pipeline membership count, leader
    count, container counts.

    The reference walks per-node in-memory maps; relationally each
    facet is a groupBy over its plane, left-joined back onto the node
    dim. used_bytes aggregates the bytes of containers replicated on
    the node (the node-report analogue derivable from the planes);
    remaining = capacity - used. Every facet aggregate is
    datanode-keyed and small — all joins broadcast; the only fact-sized
    shuffle is the replicas groupBy.
    """
    per_node_containers = (
        replicas.join(
            F.broadcast(containers_df.select("container_id", "state", "used_bytes")),
            "container_id",
            "left",
        )
        .groupBy("datanode_id")
        .agg(
            F.count(F.lit(1)).alias("container_count"),
            F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0)).alias(
                "open_container_count"
            ),
            F.sum(F.coalesce(F.col("used_bytes"), F.lit(0))).alias("used_bytes"),
        )
    )
    per_node_pipelines = members.groupBy("datanode_id").agg(
        F.count(F.lit(1)).alias("pipeline_count")
    )
    leader_counts = pipelines_df.groupBy(
        F.col("leader_datanode_id").alias("datanode_id")
    ).agg(F.count(F.lit(1)).alias("leader_count"))
    return (
        datanodes_df.join(F.broadcast(per_node_containers), "datanode_id", "left")
        .join(F.broadcast(per_node_pipelines), "datanode_id", "left")
        .join(F.broadcast(leader_counts), "datanode_id", "left")
        .select(
            "datanode_id",
            "hostname",
            "rack",
            "node_state",
            "capacity_bytes",
            F.coalesce(F.col("used_bytes"), F.lit(0)).alias("used_bytes"),
            (
                F.col("capacity_bytes") - F.coalesce(F.col("used_bytes"), F.lit(0))
            ).alias("remaining_bytes"),
            F.coalesce(F.col("pipeline_count"), F.lit(0)).alias("pipeline_count"),
            F.coalesce(F.col("leader_count"), F.lit(0)).alias("leader_count"),
            F.coalesce(F.col("container_count"), F.lit(0)).alias("container_count"),
            F.coalesce(F.col("open_container_count"), F.lit(0)).alias(
                "open_container_count"
            ),
        )
        .orderBy("datanode_id")
    )


def pipeline_listing(
    pipelines_df: DataFrame,
    members: DataFrame,
    datanodes_df: DataFrame,
    containers_df: DataFrame,
) -> DataFrame:
    """/pipelines (PipelineEndpoint.java:73-135): one row per pipeline —
    state, replication factor, member datanodes (sorted id list),
    leader hostname, container count.

    member_ids is the deterministic comma-joined sorted id list (the
    reference returns the hostname array; ids keep the column
    hash-stable across engines). All sides are dim-sized; the member
    rollup is the only groupBy.
    """
    member_agg = members.groupBy("pipeline_id").agg(
        F.count(F.lit(1)).alias("datanode_count"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("datanode_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("member_ids"),
    )
    container_counts = containers_df.groupBy("pipeline_id").agg(
        F.count(F.lit(1)).alias("container_count")
    )
    leader = datanodes_df.select(
        F.col("datanode_id").alias("leader_datanode_id"),
        F.col("hostname").alias("leader_host"),
    )
    return (
        pipelines_df.join(F.broadcast(member_agg), "pipeline_id", "left")
        .join(F.broadcast(container_counts), "pipeline_id", "left")
        .join(F.broadcast(leader), "leader_datanode_id", "left")
        .select(
            "pipeline_id",
            "state",
            "replication_factor",
            "leader_datanode_id",
            F.coalesce(F.col("leader_host"), F.lit("N/A")).alias("leader_host"),
            F.coalesce(F.col("datanode_count"), F.lit(0)).alias("datanode_count"),
            F.coalesce(F.col("member_ids"), F.lit("")).alias("member_ids"),
            F.coalesce(F.col("container_count"), F.lit(0)).alias("container_count"),
        )
        .orderBy("pipeline_id")
    )


def cluster_state(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame | None = None,
    pipelines_df: DataFrame | None = None,
) -> DataFrame:
    """A6: one-row cluster summary (ClusterStateEndpoint.java:79-115):
    container totals + datanode totals (with the healthy count,
    :83-86) + pipeline totals (:82,108). Volume/bucket/key counts are
    served by A4 ``table_counts`` (the reference reads the same
    GlobalStats rows). Each plane is a scalar aggregate; the cross
    joins are single-row broadcasts.
    """
    per_state = containers_df.groupBy().agg(
        F.count(F.lit(1)).alias("total_containers"),
        F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0)).alias("open_containers"),
        F.sum(F.when(F.col("state") == "DELETED", 1).otherwise(0)).alias("deleted_containers"),
        F.sum("used_bytes").alias("total_used_bytes"),
    )
    if datanodes_df is None:
        dn = replicas.select("datanode_id").distinct().groupBy().agg(
            F.count(F.lit(1)).alias("total_datanodes")
        )
    else:
        dn = datanodes_df.groupBy().agg(
            F.count(F.lit(1)).alias("total_datanodes"),
            F.sum(
                F.when(F.col("node_state") == "HEALTHY", 1).otherwise(0)
            ).alias("healthy_datanodes"),
        )
    out = per_state.crossJoin(F.broadcast(dn))
    if pipelines_df is not None:
        pl = pipelines_df.groupBy().agg(
            F.count(F.lit(1)).alias("total_pipelines"),
            F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0)).alias(
                "open_pipelines"
            ),
        )
        out = out.crossJoin(F.broadcast(pl))
    return out


def container_listing(
    keys: DataFrame, prev_key: int = 0, limit: int = 100
) -> DataFrame:
    """/containers (ContainerEndpoint.java:101-129): ContainerMetadata
    page — container id + key count, id-ordered, resuming after
    ``prev_key`` (which is excluded), capped at ``limit``.

    The reference iterates Recon's container→keyCount map, which is
    itself built from the OM key table (ContainerKeyMapperTask), so the
    listing derives straight from the key plane: one map-side-combinable
    groupBy, then a TakeOrdered cut — no global sort materialization.
    """
    return (
        keys.groupBy("container_id")
        .agg(F.count(F.lit(1)).alias("number_of_keys"))
        .filter(F.col("container_id") > prev_key)
        .orderBy("container_id")
        .limit(limit)
    )


def pipeline_rack_spread(
    pipelines_df: DataFrame, members: DataFrame, datanodes_df: DataFrame
) -> DataFrame:
    """Per-pipeline rack-placement validation — the pipeline analogue of
    the J2 container placement check (SCMCommonPlacementPolicy.java:
    288-320 via ContainerPlacementStatusDefault: expected rack count =
    min(replication, total racks); PipelinePlacementPolicy seeks
    rack-scattered nodes for RATIS factor-3 pipelines).

    Emits actual vs expected distinct member racks and the violation
    flag. Members and racks are dim-sized: broadcast join + one small
    groupBy; the rack total is a 1-row broadcast.
    """
    racks = datanodes_df.select("datanode_id", "rack")
    total_racks = datanodes_df.agg(
        F.countDistinct("rack").alias("total_racks")
    )
    spread = (
        members.join(F.broadcast(racks), "datanode_id")
        .groupBy("pipeline_id")
        .agg(
            F.count(F.lit(1)).alias("member_count"),
            F.countDistinct("rack").alias("actual_racks"),
        )
    )
    return (
        pipelines_df.join(F.broadcast(spread), "pipeline_id", "left")
        .crossJoin(F.broadcast(total_racks))
        .select(
            "pipeline_id",
            "state",
            "replication_factor",
            F.coalesce(F.col("member_count"), F.lit(0)).alias("member_count"),
            F.coalesce(F.col("actual_racks"), F.lit(0)).alias("actual_racks"),
            F.least(F.col("replication_factor").cast("long"), F.col("total_racks")).alias(
                "expected_racks"
            ),
            (
                F.coalesce(F.col("actual_racks"), F.lit(0))
                < F.least(F.col("replication_factor").cast("long"), F.col("total_racks"))
            ).alias("mis_replicated"),
        )
        .orderBy("pipeline_id")
    )
