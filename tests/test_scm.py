"""SCM service-plane laws on synthetic frames: balancer utilization
classification (ContainerBalancer.java:169-233), the
ContainerReplicaCount sufficiency law (206-241), decommission
readiness (DatanodeAdminMonitorImpl.java:273-300), and deleted-block
log eligibility (DeletedBlockLogImpl.java:405-445)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark.operators import scm


def _datanodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )


def _containers(spark, rows):
    return spark.createDataFrame(
        rows,
        "container_id long, state string, replication_factor int, "
        "used_bytes long, pipeline_id long",
    )


def _replicas(spark, rows):
    return spark.createDataFrame(rows, "container_id long, datanode_id long")


# --- balancer -------------------------------------------------------------

def test_balancer_classifies_against_cluster_average(spark):
    # three nodes, equal capacity 100; used 90/50/10 → avg 0.5;
    # threshold 0.1 → node1 over (0.9 > 0.6), node3 under (0.1 < 0.4)
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
            (3, "n3", "r0", "HEALTHY", "IN_SERVICE", 100),
        ],
    )
    cts = _containers(
        spark,
        [(10, "CLOSED", 3, 90, 0), (20, "CLOSED", 3, 50, 0), (30, "CLOSED", 3, 10, 0)],
    )
    reps = _replicas(spark, [(10, 1), (20, 2), (30, 3)])
    rows = {
        r.datanode_id: r
        for r in scm.balancer_utilization(dns, reps, cts, threshold=0.1).collect()
    }
    assert rows[1].classification == "OVER_UTILIZED"
    assert rows[2].classification == "WITHIN_THRESHOLD"
    assert rows[3].classification == "UNDER_UTILIZED"
    assert rows[1].cluster_avg_utilization == pytest.approx(0.5)
    # ratioToBytes law: 100·0.9 − 100·0.6 = 30 over; 100·0.4 − 100·0.1 = 30 under
    assert rows[1].bytes_over_upper == pytest.approx(30.0)
    assert rows[3].bytes_under_lower == pytest.approx(30.0)
    assert rows[2].bytes_over_upper == 0.0 and rows[2].bytes_under_lower == 0.0


def test_balancer_scopes_to_in_service_healthy_nodes(spark):
    # SCMNodeManager.java:676-688: STALE/DEAD or non-IN_SERVICE nodes
    # are outside the iteration AND outside the cluster average
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "STALE", "IN_SERVICE", 100),
            (3, "n3", "r0", "HEALTHY", "DECOMMISSIONING", 100),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 3, 40, 0)])
    reps = _replicas(spark, [(10, 1), (10, 2), (10, 3)])
    out = scm.balancer_utilization(dns, reps, cts).collect()
    assert [r.datanode_id for r in out] == [1]
    assert out[0].cluster_avg_utilization == pytest.approx(0.4)


def test_balancer_counts_zero_replica_nodes(spark):
    # a registered empty node must drag the average down and classify
    # UNDER (that's the node the balancer wants to move data onto)
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 3, 80, 0)])
    reps = _replicas(spark, [(10, 1)])
    rows = {r.datanode_id: r for r in scm.balancer_utilization(dns, reps, cts).collect()}
    assert rows[2].used_bytes == 0
    assert rows[2].classification == "UNDER_UTILIZED"
    assert rows[1].classification == "OVER_UTILIZED"


# --- sufficiency / decommission ------------------------------------------

def _suff_map(spark, dns, cts, reps, **kw):
    return {
        r.container_id: r
        for r in scm.container_sufficiency(cts, reps, dns, **kw).collect()
    }


def test_sufficiency_maintenance_credit_and_min_healthy(spark):
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "HEALTHY", "IN_MAINTENANCE", 100),
            (3, "n3", "r0", "HEALTHY", "IN_MAINTENANCE", 100),
            (4, "n4", "r0", "HEALTHY", "DECOMMISSIONING", 100),
        ],
    )
    cts = _containers(
        spark,
        [(10, "CLOSED", 3, 1, 0), (20, "CLOSED", 3, 1, 0), (30, "CLOSED", 3, 1, 0)],
    )
    # c10: 1 healthy + 2 maintenance → delta 2 fully credited, but
    # minHealthyForMaintenance=2 requires one more healthy → missing 1
    # (ContainerReplicaCount.java:206-222 example)
    # c20: 1 healthy + 1 maintenance → delta 2, credit 1, minHealthy
    # needs 1 → missing max(1, 1) = 1
    # c30: decommission replicas give NO credit → missing 2
    reps = _replicas(spark, [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (30, 1), (30, 4)])
    out = _suff_map(spark, dns, cts, reps)
    assert out[10].missing_replicas == 1 and not out[10].sufficiently_replicated
    assert out[20].missing_replicas == 1
    assert out[30].missing_replicas == 2
    assert out[30].decommission_count == 1
    # with minHealthyForMaintenance=1, c10 becomes sufficient
    relaxed = _suff_map(spark, dns, cts, reps, min_healthy_for_maintenance=1)
    assert relaxed[10].missing_replicas == 0 and relaxed[10].sufficiently_replicated


def test_sufficiency_over_replicated_and_unregistered(spark):
    dns = _datanodes(spark, [(1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100)])
    cts = _containers(spark, [(10, "CLOSED", 1, 1, 0), (20, "OPEN", 3, 1, 0)])
    # c10: rf=1, 2 healthy (datanode 9 unregistered → healthy, the J2
    # left-join stance) → missing −1, still "sufficient"
    reps = _replicas(spark, [(10, 1), (10, 9), (20, 1), (20, 9), (20, 8)])
    out = _suff_map(spark, dns, cts, reps)
    assert out[10].missing_replicas == -1 and out[10].sufficiently_replicated
    assert out[20].healthy_count == 3 and out[20].sufficiently_replicated
    assert not out[20].healthy_state  # OPEN container fails the state gate


def test_decommission_readiness_per_node(spark):
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "DECOMMISSIONING", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
            (3, "n3", "r0", "HEALTHY", "IN_SERVICE", 100),
            (4, "n4", "r0", "HEALTHY", "ENTERING_MAINTENANCE", 100),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 3, 1, 0), (20, "CLOSED", 3, 1, 0)])
    # c10 has 3 in-service-ish replicas... decommissioning n1 excluded
    # from healthy → healthy=2 < rf=3 → under-replicated → n1 not ready.
    # c20 on n4 has rf=3 but 3 healthy besides n4's maintenance copy →
    # sufficient → n4 ready.
    reps = _replicas(
        spark, [(10, 1), (10, 2), (10, 3), (20, 4), (20, 1), (20, 2), (20, 3)]
    )
    out = {r.datanode_id: r for r in scm.decommission_status(cts, reps, dns).collect()}
    assert set(out) == {1, 4}
    assert out[1].under_replicated >= 1 and not out[1].can_complete
    assert out[4].under_replicated == 0 and out[4].can_complete


def test_decommission_skips_unknown_containers(spark):
    # the monitor's ContainerNotFoundException branch: replicas whose
    # container is missing from the container plane don't count
    dns = _datanodes(spark, [(1, "n1", "r0", "HEALTHY", "DECOMMISSIONING", 100)])
    cts = _containers(spark, [(10, "CLOSED", 1, 1, 0)])
    reps = _replicas(spark, [(10, 1), (99, 1)])
    out = scm.decommission_status(cts, reps, dns).collect()
    assert len(out) == 1 and out[0].container_count == 1


# --- deleted-block log ----------------------------------------------------

def _txns(spark, rows):
    return spark.createDataFrame(
        rows, "txid long, container_id long, block_count long, retry_count int"
    )


def test_pending_deletion_eligibility_and_fanout(spark):
    cts = _containers(
        spark,
        [(10, "CLOSED", 3, 1, 0), (20, "OPEN", 3, 1, 0), (30, "CLOSING", 3, 1, 0)],
    )
    reps = _replicas(spark, [(10, 1), (10, 2), (20, 1), (30, 1)])
    txns = _txns(
        spark,
        [
            (1, 10, 5, 0),     # eligible, fans out to datanodes 1 and 2
            (2, 20, 7, 0),     # container OPEN → ineligible
            (3, 30, 7, 2),     # container CLOSING → ineligible (isOpen law)
            (4, 10, 9, -1),    # retry-exhausted → ineligible
            (5, 10, 2, 5000),  # past maxRetry → ineligible
        ],
    )
    out = {r.datanode_id: r for r in scm.pending_deletion_by_datanode(txns, reps, cts).collect()}
    assert set(out) == {1, 2}
    assert out[1].txn_count == 1 and out[1].block_count == 5
    assert out[2].container_count == 1


def test_failed_txns_listing(spark):
    cts = _containers(spark, [(10, "CLOSED", 3, 1, 0)])
    txns = _txns(spark, [(3, 10, 5, -1), (1, 99, 2, -1), (2, 10, 4, 0)])
    out = scm.failed_deletion_txns(txns, cts).collect()
    assert [r.txid for r in out] == [1, 3]  # txid order
    assert out[0].container_state == "NOT_FOUND"  # purged container
    assert out[1].container_state == "CLOSED"


def test_balancer_plan_broadcasts_dims(spark):
    # plan pin: the only fact shuffle is the replicas groupBy — the
    # containers dim and the 1-row totals ride broadcast joins
    dns = _datanodes(spark, [(1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100)])
    cts = _containers(spark, [(10, "CLOSED", 3, 40, 0)])
    reps = _replicas(spark, [(10, 1)])
    plan = scm.balancer_utilization(dns, reps, cts)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# --- safe mode ------------------------------------------------------------

def _pipelines(spark, rows):
    return spark.createDataFrame(
        rows,
        "pipeline_id long, state string, replication_factor int, "
        "leader_datanode_id long",
    )


def _members(spark, rows):
    return spark.createDataFrame(rows, "pipeline_id long, datanode_id long")


def test_safemode_rules(spark):
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "IN_SERVICE", 100),
            (2, "n2", "r0", "DEAD", "IN_SERVICE", 100),
        ],
    )
    # container rule scope: only CLOSED/QUASI_CLOSED; 1 of 2 reported → 50% < 99%
    cts = _containers(
        spark,
        [
            (10, "CLOSED", 3, 1, 0),
            (20, "QUASI_CLOSED", 3, 1, 0),
            (30, "OPEN", 3, 1, 0),  # out of scope
        ],
    )
    reps = _replicas(spark, [(10, 1), (30, 1)])
    # factor-3 pipelines: 3 total (p5 is factor-1, ignored); 1 open →
    # healthy rule needs ceil(0.10·3)=1 ✓; one-replica rule needs
    # ceil(0.90·3)=3, only p100 is open+reported → 1 < 3 ✗
    pls = _pipelines(
        spark,
        [
            (100, "OPEN", 3, 1),
            (101, "CLOSED", 3, 1),
            (102, "DORMANT", 3, 1),
            (5, "OPEN", 1, 1),
        ],
    )
    mem = _members(spark, [(100, 1), (101, 2), (102, 1), (5, 1)])
    out = {r.rule: r for r in scm.safe_mode_status(cts, reps, dns, pls, mem).collect()}
    c = out["CONTAINER"]
    assert (c.total_count, c.current_count, c.required_count) == (2, 1, 2)
    assert not c.satisfied
    d = out["DATANODE"]
    assert d.current_count == 2 and d.satisfied
    h = out["HEALTHY_PIPELINE"]
    assert (h.total_count, h.current_count, h.required_count) == (3, 1, 1)
    assert h.satisfied
    o = out["ONE_REPLICA_PIPELINE"]
    # p101's member n2 is DEAD (not reported) and p101/p102 aren't open
    assert (o.total_count, o.current_count, o.required_count) == (3, 1, 3)
    assert not o.satisfied


def test_decommission_zero_container_node_reports_complete(spark):
    # a draining node holding no containers must still report, as
    # immediately complete (the monitor's empty-set fast path)
    dns = _datanodes(
        spark,
        [
            (1, "n1", "r0", "HEALTHY", "DECOMMISSIONING", 100),
            (2, "n2", "r0", "HEALTHY", "IN_SERVICE", 100),
        ],
    )
    cts = _containers(spark, [(10, "CLOSED", 1, 1, 0)])
    reps = _replicas(spark, [(10, 2)])
    out = scm.decommission_status(cts, reps, dns).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.datanode_id, r.container_count, r.can_complete) == (1, 0, True)


def test_dn_block_deletion_plan_greedy_law(spark):
    """TopNOrderedContainerDeletionChoosingPolicy replayed in pure
    Python: per datanode, sort by pending desc (container asc ties),
    take greedily under the budget, clamp the last pick, drop
    zero-allocation containers."""
    from hadoop_ozone_spark.operators import scm as scm_ops

    rows = [
        # dn 1: 60 + 30 + clamp(25 -> 10) = budget 100; 5 excluded
        (1, 101, 60), (1, 102, 30), (1, 103, 25), (1, 104, 5),
        # dn 2: a single giant container clamps to the full budget
        (2, 201, 400),
        # dn 3: ties on pending broken by container_id ascending
        (3, 301, 50), (3, 302, 50), (3, 303, 50),
    ]
    cands = spark.createDataFrame(
        rows, "datanode_id long, container_id long, pending long"
    )
    got = {
        (r.datanode_id, r.container_id): r.num_blocks_to_delete
        for r in scm_ops.dn_block_deletion_plan(cands, 100).collect()
    }
    assert got == {
        (1, 101): 60, (1, 102): 30, (1, 103): 10,
        (2, 201): 100,
        (3, 301): 50, (3, 302): 50,
    }
    # budget conservation: no datanode exceeds the interval limit
    per_dn: dict = {}
    for (dn, _), n in got.items():
        per_dn[dn] = per_dn.get(dn, 0) + n
    assert all(v <= 100 for v in per_dn.values())


def test_dn2_scanner_rollup_invariants(spark, sf_dir):
    """Data-scan eligibility is a subset of metadata scans, and every
    eligible container either fails the full check or gets its scan
    timestamp refreshed (ContainerDataScanner.java:95-121)."""
    from hadoop_ozone_spark import model
    from hadoop_ozone_spark.plans.scm_queries import dn2_scanner_rollup

    rows = dn2_scanner_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_data_scanned <= r.n_meta_scanned
        assert r.n_data_unhealthy + r.n_ts_updated == r.n_data_scanned
        assert r.n_meta_unhealthy <= r.n_meta_scanned
    # pure-Python replay over the replica plane
    reps = model.rm_replica_details(spark, sf_dir).collect()
    want = {}
    for rep in reps:
        d = want.setdefault(rep.datanode_id, [0, 0, 0, 0, 0])
        d[0] += 1
        if (rep.container_id * 31 + rep.datanode_id) % 101 == 0:
            d[1] += 1
        if rep.replica_state in ("CLOSED", "QUASI_CLOSED"):
            d[2] += 1
            if (rep.container_id * 17 + rep.datanode_id) % 53 == 0:
                d[3] += 1
            else:
                d[4] += 1
    got = {
        r.datanode_id: [r.n_meta_scanned, r.n_meta_unhealthy, r.n_data_scanned,
                        r.n_data_unhealthy, r.n_ts_updated]
        for r in rows
    }
    assert got == want
