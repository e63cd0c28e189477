"""SCM service-plane analytics: container balancer, decommission
monitor, and the deleted-block log.

Reference laws (re-expressed relationally, not ported):

- ContainerBalancer.java:169-233 — classify IN_SERVICE+HEALTHY nodes
  against cluster-average utilization ± threshold; per-node over/under
  loaded bytes via ratioToBytes (capacity × ratio).
- DatanodeAdminMonitorImpl.java:273-300 — a node can complete
  decommission/maintenance-entry iff every container replicated on it
  is sufficiently replicated and healthy.
- ContainerReplicaCount.java:206-241 — the sufficiency law: missing
  replicas after maintenance credit, floored by the min-healthy-for-
  maintenance requirement.
- DeletedBlockLogImpl.java:148-201,405-445 — txns with retry −1 are
  the failed set; eligible txns (retry ≥ 0, ≤ maxRetry, container not
  open) fan out to the datanodes holding replicas.

Scale shape: every query here does exactly one fact-sized shuffle (a
groupBy on its keyed plane); node/container dims ride broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DECOM_STATES = ("DECOMMISSIONING", "DECOMMISSIONED")
_MAINT_STATES = ("IN_MAINTENANCE", "ENTERING_MAINTENANCE")


def balancer_utilization(
    datanodes_df: DataFrame,
    replicas: DataFrame,
    containers_df: DataFrame,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-datanode utilization classification, the balancer's
    initializeIteration() view (ContainerBalancer.java:169-233).

    Scope is IN_SERVICE + HEALTHY nodes only (SCMNodeManager.java:
    676-688). utilization = used/capacity where used aggregates the
    bytes of containers replicated on the node (the node-report
    analogue); the cluster average is sum(used)/sum(capacity) over the
    in-scope nodes (ContainerBalancer.java:315-339). Nodes above
    avg+threshold are OVER_UTILIZED with bytes_over_upper =
    capacity·utilization − capacity·upper (ratioToBytes law,
    ContainerBalancer.java:304-312); below avg−threshold,
    UNDER_UTILIZED with the mirrored bytes_under_lower.

    Plan: replicas groupBy(datanode) is the only fact shuffle;
    containers ride a broadcast; the cluster totals are a 1-row
    broadcast cross join.
    """
    scope = datanodes_df.filter(
        (F.col("node_state") == "HEALTHY") & (F.col("op_state") == "IN_SERVICE")
    ).select("datanode_id", "hostname", "capacity_bytes")
    per_node_used = (
        replicas.join(
            F.broadcast(containers_df.select("container_id", "used_bytes")),
            "container_id",
        )
        .groupBy("datanode_id")
        .agg(F.sum("used_bytes").alias("used_bytes"))
    )
    nodes = scope.join(F.broadcast(per_node_used), "datanode_id", "left").select(
        "datanode_id",
        "hostname",
        "capacity_bytes",
        F.coalesce(F.col("used_bytes"), F.lit(0)).alias("used_bytes"),
    )
    totals = nodes.agg(
        F.sum("used_bytes").alias("cluster_used"),
        F.sum("capacity_bytes").alias("cluster_capacity"),
    )
    avg = F.col("cluster_used") / F.col("cluster_capacity")
    upper = avg + F.lit(threshold)
    lower = avg - F.lit(threshold)
    util = F.col("used_bytes") / F.col("capacity_bytes")
    return (
        nodes.crossJoin(F.broadcast(totals))
        .select(
            "datanode_id",
            "hostname",
            "capacity_bytes",
            "used_bytes",
            util.alias("utilization"),
            avg.alias("cluster_avg_utilization"),
            F.when(util > upper, F.lit("OVER_UTILIZED"))
            .when(util < lower, F.lit("UNDER_UTILIZED"))
            .otherwise(F.lit("WITHIN_THRESHOLD"))
            .alias("classification"),
            F.when(
                util > upper,
                F.col("capacity_bytes") * util - F.col("capacity_bytes") * upper,
            )
            .otherwise(F.lit(0.0))
            .alias("bytes_over_upper"),
            F.when(
                util < lower,
                F.col("capacity_bytes") * lower - F.col("capacity_bytes") * util,
            )
            .otherwise(F.lit(0.0))
            .alias("bytes_under_lower"),
        )
        .orderBy("datanode_id")
    )


def container_sufficiency(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame,
    min_healthy_for_maintenance: int = 2,
) -> DataFrame:
    """Per-container replica sufficiency under operational states —
    ContainerReplicaCount.java:52-74 (state bucketing) and 206-241
    (the missing-replica law with maintenance credit).

    healthy counts replicas whose datanode op_state is neither
    decommission- nor maintenance-flavored; a replica on an
    unregistered datanode has no op_state and counts healthy (left
    join — same stance as the J2 classifier). missing replicas:

        delta = rf − healthy
        delta>0 → max(max(0, min(rf, minHealthy) − healthy),
                      max(0, delta − maintenance))

    sufficient ⇔ missing ≤ 0 (no in-flight ops in the model).
    healthy_state mirrors isHealthy()'s container-state gate
    (ContainerReplicaCount.java:263-270); the replica-state match is
    not modeled (no per-replica state plane).
    """
    op_states = datanodes_df.select("datanode_id", "op_state")
    counts = (
        replicas.join(F.broadcast(op_states), "datanode_id", "left")
        .groupBy("container_id")
        .agg(
            F.sum(
                F.when(F.col("op_state").isin(*_DECOM_STATES), 1).otherwise(0)
            ).alias("decommission_count"),
            F.sum(
                F.when(F.col("op_state").isin(*_MAINT_STATES), 1).otherwise(0)
            ).alias("maintenance_count"),
            F.sum(
                F.when(
                    F.col("op_state").isin(*_DECOM_STATES, *_MAINT_STATES), 0
                ).otherwise(1)
            ).alias("healthy_count"),
        )
    )
    joined = containers_df.select(
        "container_id", "state", "replication_factor"
    ).join(counts, "container_id", "left")
    healthy = F.coalesce(F.col("healthy_count"), F.lit(0))
    maint = F.coalesce(F.col("maintenance_count"), F.lit(0))
    min_healthy = F.least(
        F.col("replication_factor"), F.lit(min_healthy_for_maintenance)
    )
    delta = F.col("replication_factor") - healthy
    missing = F.when(delta < 0, delta).otherwise(
        F.greatest(
            F.greatest(F.lit(0), min_healthy - healthy),
            F.greatest(F.lit(0), delta - maint),
        )
    )
    return joined.select(
        "container_id",
        "state",
        "replication_factor",
        healthy.alias("healthy_count"),
        F.coalesce(F.col("decommission_count"), F.lit(0)).alias("decommission_count"),
        maint.alias("maintenance_count"),
        missing.alias("missing_replicas"),
        (missing <= 0).alias("sufficiently_replicated"),
        F.col("state").isin("CLOSED", "QUASI_CLOSED").alias("healthy_state"),
    )


def decommission_status(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame,
    min_healthy_for_maintenance: int = 2,
) -> DataFrame:
    """Per-node admin-workflow readiness —
    DatanodeAdminMonitorImpl.java:273-300: for each node in
    DECOMMISSIONING or ENTERING_MAINTENANCE, count its containers'
    sufficiency; the workflow completes iff under_replicated == 0 and
    unhealthy == 0.

    Replicas whose container is absent from the container plane are
    skipped (the monitor's ContainerNotFoundException branch — the
    inner join). Plan: the monitored-container id set is broadcast to
    semi-prune the replica and container planes BEFORE the sufficiency
    groupBy, so every stage costs O(containers on draining nodes) —
    scan-side fact work is the one pruned replicas pass.
    """
    monitored = datanodes_df.filter(
        F.col("op_state").isin("DECOMMISSIONING", "ENTERING_MAINTENANCE")
    ).select("datanode_id", "hostname", "op_state")
    on_node_replicas = replicas.join(F.broadcast(monitored), "datanode_id")
    # prune before the expensive sufficiency aggregation: only the
    # containers replicated on a monitored node matter, and that set is
    # bounded by the few draining nodes' container counts — so the
    # per-container counts and the containers join cost O(|containers
    # on draining nodes|), not O(|cluster|), at any scale. The pruned
    # replica set still holds EVERY replica of each such container, so
    # the sufficiency law sees full counts.
    monitored_containers = on_node_replicas.select("container_id").distinct()
    pruned_replicas = replicas.join(
        F.broadcast(monitored_containers), "container_id", "leftsemi"
    )
    pruned_containers = containers_df.join(
        F.broadcast(monitored_containers), "container_id", "leftsemi"
    )
    suff = container_sufficiency(
        pruned_containers, pruned_replicas, datanodes_df, min_healthy_for_maintenance
    ).select("container_id", "sufficiently_replicated", "healthy_state")
    on_node = on_node_replicas.join(F.broadcast(suff), "container_id")
    per_node = on_node.groupBy("datanode_id").agg(
        F.count(F.lit(1)).alias("container_count"),
        F.sum(F.when(F.col("sufficiently_replicated"), 1).otherwise(0)).alias(
            "sufficiently_replicated"
        ),
        F.sum(F.when(F.col("sufficiently_replicated"), 0).otherwise(1)).alias(
            "under_replicated"
        ),
        F.sum(F.when(F.col("healthy_state"), 0).otherwise(1)).alias("unhealthy"),
    )
    # left join from the monitored node set: a draining node holding
    # ZERO containers must still report (0, 0, 0, 0, can_complete=true)
    # — the monitor declares exactly those nodes complete immediately
    # (DatanodeAdminMonitorImpl.java:300 with an empty container set)
    return (
        monitored.join(F.broadcast(per_node), "datanode_id", "left")
        .select(
            "datanode_id",
            "hostname",
            "op_state",
            F.coalesce(F.col("container_count"), F.lit(0)).alias("container_count"),
            F.coalesce(F.col("sufficiently_replicated"), F.lit(0)).alias(
                "sufficiently_replicated"
            ),
            F.coalesce(F.col("under_replicated"), F.lit(0)).alias("under_replicated"),
            F.coalesce(F.col("unhealthy"), F.lit(0)).alias("unhealthy"),
            (
                (F.coalesce(F.col("under_replicated"), F.lit(0)) == 0)
                & (F.coalesce(F.col("unhealthy"), F.lit(0)) == 0)
            ).alias("can_complete"),
        )
        .orderBy("datanode_id")
    )


def pending_deletion_by_datanode(
    txns: DataFrame,
    replicas: DataFrame,
    containers_df: DataFrame,
    max_retry: int = 4096,
) -> DataFrame:
    """Per-datanode pending block-deletion load — the relational view
    of DeletedBlockLogImpl.getTransactions (DeletedBlockLogImpl.java:
    405-445): a txn is eligible when retry ∈ [0, maxRetry] and its
    container is not open (isOpen ⇔ OPEN|CLOSING,
    ContainerInfo.java:462-465); each eligible txn is dispatched to
    every datanode holding a replica (DatanodeDeletedBlockTransactions).

    The reference drains in txid order up to a per-round block limit;
    this is the steady-state backlog view (no cursor), which is what a
    capacity dashboard needs. One shuffle: the join+groupBy on
    container_id/datanode_id (co-located under the bucketed layout).
    """
    eligible = txns.filter(
        (F.col("retry_count") >= 0) & (F.col("retry_count") <= max_retry)
    ).join(
        containers_df.select("container_id", "state"),
        "container_id",
    ).filter(~F.col("state").isin("OPEN", "CLOSING"))
    return (
        eligible.join(replicas, "container_id")
        .groupBy("datanode_id")
        .agg(
            F.count(F.lit(1)).alias("txn_count"),
            F.sum("block_count").alias("block_count"),
            F.countDistinct("container_id").alias("container_count"),
        )
        .orderBy("datanode_id")
    )


def failed_deletion_txns(
    txns: DataFrame, containers_df: DataFrame, limit: int = 100
) -> DataFrame:
    """Retry-exhausted deletion txns for admin inspection —
    getFailedTransactions (DeletedBlockLogImpl.java:148-163 returns
    txns whose count == −1; 194-201 is where the count is latched to
    −1 past maxRetry). Listed in txid (RocksDB key) order with the
    container's current state, bounded like the CLI pager.
    """
    return (
        txns.filter(F.col("retry_count") == -1)
        .join(
            F.broadcast(containers_df.select("container_id", "state")),
            "container_id",
            "left",
        )
        .select(
            "txid",
            "container_id",
            F.coalesce(F.col("state"), F.lit("NOT_FOUND")).alias("container_state"),
            "block_count",
        )
        .orderBy("txid")
        .limit(limit)
    )


def safe_mode_status(
    containers_df: DataFrame,
    replicas: DataFrame,
    datanodes_df: DataFrame,
    pipelines_df: DataFrame,
    members: DataFrame,
) -> DataFrame:
    """SCM safe-mode exit rules (SCMSafeModeManager.java), one row per
    rule with exact-integer threshold arithmetic:

    - CONTAINER (ContainerSafeModeRule.java:75-119): of the
      CLOSED/QUASI_CLOSED containers, the fraction with ≥1 reported
      replica must reach 99% (HDDS_SCM_SAFEMODE_THRESHOLD_PCT 0.99).
    - DATANODE (DataNodeSafeModeRule.java:60-68): registered datanodes
      ≥ 1 (HDDS_SCM_SAFEMODE_MIN_DATANODE).
    - HEALTHY_PIPELINE (HealthyPipelineSafeModeRule.java:93-148): open
      RATIS-THREE pipelines ≥ 10% of the factor-THREE pipeline count.
    - ONE_REPLICA_PIPELINE (OneReplicaPipelineSafeModeRule.java:90-124):
      factor-THREE open pipelines with ≥1 healthy member reported ≥ 90%
      of the factor-THREE count.

    required_count = ceil(pct·total) computed as (p·total + q−1) div q
    in integers, and satisfied compares counts — no float thresholds,
    so the oracle replays exactly. 'Reported' maps to the model's
    heartbeat signal: a replica row (container rule) / a HEALTHY member
    (pipeline rule). Plan: each rule is a tiny aggregate; the only
    fact-sized pass is the replica distinct for the container rule.
    """
    reported = replicas.select("container_id").distinct()
    scope = containers_df.filter(F.col("state").isin("CLOSED", "QUASI_CLOSED"))
    container_rule = (
        scope.select("container_id")
        .join(reported.withColumn("seen", F.lit(1)), "container_id", "left")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.sum(F.coalesce(F.col("seen"), F.lit(0))).alias("current_count"),
        )
        .select(
            F.lit("CONTAINER").alias("rule"),
            "current_count",
            F.expr("(total_count * 99 + 99) div 100").alias("required_count"),
            "total_count",
        )
    )
    dn_rule = datanodes_df.agg(
        F.count(F.lit(1)).alias("current_count")
    ).select(
        F.lit("DATANODE").alias("rule"),
        "current_count",
        F.lit(1).cast("long").alias("required_count"),
        F.col("current_count").alias("total_count"),
    )
    f3 = pipelines_df.filter(F.col("replication_factor") == 3)
    hp_rule = f3.agg(
        F.count(F.lit(1)).alias("total_count"),
        F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0)).alias(
            "current_count"
        ),
    ).select(
        F.lit("HEALTHY_PIPELINE").alias("rule"),
        "current_count",
        F.expr("(total_count * 10 + 99) div 100").alias("required_count"),
        "total_count",
    )
    healthy_members = members.join(
        F.broadcast(
            datanodes_df.filter(F.col("node_state") == "HEALTHY").select(
                "datanode_id"
            )
        ),
        "datanode_id",
    ).select("pipeline_id").distinct()
    or_rule = (
        f3.join(healthy_members.withColumn("seen", F.lit(1)), "pipeline_id", "left")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.sum(
                F.when(
                    (F.col("state") == "OPEN") & (F.col("seen") == 1), 1
                ).otherwise(0)
            ).alias("current_count"),
        )
        .select(
            F.lit("ONE_REPLICA_PIPELINE").alias("rule"),
            "current_count",
            F.expr("(total_count * 90 + 99) div 100").alias("required_count"),
            "total_count",
        )
    )
    out = container_rule.unionByName(dn_rule).unionByName(hp_rule).unionByName(or_rule)
    return out.select(
        "rule",
        "current_count",
        "required_count",
        "total_count",
        (F.col("current_count") >= F.col("required_count")).alias("satisfied"),
    ).orderBy("rule")
