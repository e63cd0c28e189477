"""J2 health classification incl. rack placement — mirrors the
reference's TestContainerHealthTask scenarios (ContainerHealthStatus
.java:52-113, SCMCommonPlacementPolicy.java:288-320,
ContainerPlacementStatusDefault.java)."""

from __future__ import annotations

import pytest

from hadoop_ozone_spark.operators import recon

# 3 racks, 2 datanodes each
DATANODES = [
    (1, "r0", "HEALTHY"), (2, "r0", "HEALTHY"),
    (3, "r1", "HEALTHY"), (4, "r1", "STALE"),
    (5, "r2", "HEALTHY"), (6, "r2", "DEAD"),
]

CONTAINERS = [
    # (container_id, state, replication_factor, used_bytes)
    (1, "CLOSED", 3, 100),   # 3 replicas / 3 racks      → HEALTHY
    (2, "CLOSED", 3, 100),   # 3 replicas / 2 racks      → MIS_REPLICATED
    (3, "OPEN", 3, 100),     # 2 replicas / 2 racks      → UNDER + mis flag
    (4, "CLOSED", 3, 100),   # 4 replicas / 3 racks      → OVER_REPLICATED
    (5, "CLOSED", 3, 100),   # 0 replicas                → MISSING
    (6, "CLOSED", 1, 100),   # rf=1: placement always satisfied → HEALTHY
    (7, "DELETED", 3, 100),  # excluded, like the health task
]

REPLICAS = [
    (1, 1), (1, 3), (1, 5),
    (2, 1), (2, 2), (2, 3),
    (3, 1), (3, 3),
    (4, 1), (4, 3), (4, 5), (4, 6),
    (6, 1),
    (7, 1), (7, 3), (7, 5),
]


@pytest.fixture(scope="module")
def health(spark):
    containers = spark.createDataFrame(
        CONTAINERS, "container_id long, state string, replication_factor int, used_bytes long"
    )
    replicas = spark.createDataFrame(REPLICAS, "container_id long, datanode_id long")
    dns = spark.createDataFrame(DATANODES, "datanode_id long, rack string, node_state string")
    rows = recon.container_health(containers, replicas, dns).collect()
    return {r["container_id"]: r for r in rows}


def test_all_five_states_and_deleted_excluded(health):
    assert 7 not in health
    assert {cid: r["health"] for cid, r in health.items()} == {
        1: "HEALTHY",
        2: "MIS_REPLICATED",
        3: "UNDER_REPLICATED",
        4: "OVER_REPLICATED",
        5: "MISSING",
        6: "HEALTHY",
    }


def test_mis_replicated_delta_and_reason(health):
    r = health[2]
    assert r["is_mis_replicated"]
    assert r["actual_placement_count"] == 2
    assert r["expected_placement_count"] == 3
    assert r["mis_replicated_delta"] == 1
    assert r["mis_replicated_reason"] == (
        "The container is mis-replicated as it is on 2 racks "
        "but should be on 3 racks."
    )


def test_replica_states_independent_of_placement(health):
    # under-replicated containers also fail placement (reference records
    # both states); the single health column keeps count precedence
    assert health[3]["is_mis_replicated"]
    assert health[3]["replica_delta"] == 1
    # over-replicated on all racks: placement fine
    assert not health[4]["is_mis_replicated"]
    assert health[4]["replica_delta"] == -1
    # missing: no placement check (isMisReplicated requires !isMissing)
    assert not health[5]["is_mis_replicated"]
    assert health[5]["mis_replicated_reason"] is None


def test_rf1_always_placement_satisfied(health):
    # SCMCommonPlacementPolicy.java:292 — replicas == 1 short-circuits
    r = health[6]
    assert r["health"] == "HEALTHY" and not r["is_mis_replicated"]


def test_summary_counts(spark):
    containers = spark.createDataFrame(
        CONTAINERS, "container_id long, state string, replication_factor int, used_bytes long"
    )
    replicas = spark.createDataFrame(REPLICAS, "container_id long, datanode_id long")
    dns = spark.createDataFrame(DATANODES, "datanode_id long, rack string, node_state string")
    out = {
        r["health"]: r["cnt"]
        for r in recon.container_health_summary(containers, replicas, dns).collect()
    }
    assert out == {
        "HEALTHY": 2,
        "MIS_REPLICATED": 1,
        "UNDER_REPLICATED": 1,
        "OVER_REPLICATED": 1,
        "MISSING": 1,
    }


def test_cluster_state_with_pipelines(spark):
    containers = spark.createDataFrame(
        CONTAINERS, "container_id long, state string, replication_factor int, used_bytes long"
    )
    replicas = spark.createDataFrame(REPLICAS, "container_id long, datanode_id long")
    dns = spark.createDataFrame(DATANODES, "datanode_id long, rack string, node_state string")
    pipelines = spark.createDataFrame(
        [(1, "OPEN", 3, 1), (2, "CLOSED", 3, 2), (3, "OPEN", 1, 3)],
        "pipeline_id long, state string, replication_factor int, leader_datanode_id long",
    )
    row = recon.cluster_state(containers, replicas, dns, pipelines).collect()[0]
    assert row["total_containers"] == 7
    assert row["deleted_containers"] == 1
    assert row["total_datanodes"] == 6
    assert row["healthy_datanodes"] == 4
    assert row["total_pipelines"] == 3
    assert row["open_pipelines"] == 2


def test_unregistered_datanode_counts_replica_not_rack(spark):
    # replica on an unknown datanode: still replicated, but its rack
    # can't satisfy placement
    containers = spark.createDataFrame(
        [(1, "CLOSED", 3, 100)],
        "container_id long, state string, replication_factor int, used_bytes long",
    )
    replicas = spark.createDataFrame(
        [(1, 1), (1, 3), (1, 99)], "container_id long, datanode_id long"
    )
    dns = spark.createDataFrame(DATANODES, "datanode_id long, rack string, node_state string")
    r = recon.container_health(containers, replicas, dns).collect()[0]
    assert r["replica_count"] == 3          # not under-replicated
    assert r["actual_placement_count"] == 2  # unknown rack excluded
    assert r["health"] == "MIS_REPLICATED"
