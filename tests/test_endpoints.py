"""Endpoint facade: each reference query signature answers and agrees
with the underlying operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.endpoints import OzoneAnalytics


@pytest.fixture(scope="module")
def api(spark, sf_dir):
    return OzoneAnalytics(
        spark,
        keys=model.om_keys(spark, sf_dir),
        containers=model.containers(spark, sf_dir),
        replicas=model.container_replicas(spark, sf_dir),
        datanodes=model.datanodes(spark, sf_dir),
        pipelines=model.pipelines(spark, sf_dir),
        pipeline_members=model.pipeline_members(spark, sf_dir),
        replica_observations=model.replica_observations(spark, sf_dir),
        deleted_block_txns=model.deleted_block_txns(spark, sf_dir),
        audit=model.audit_log(spark, sf_dir),
    )


def test_list_keys_endpoint(api):
    page = api.list_keys("vol_r", "bkt_o", max_keys=10).collect()
    assert len(page) == 10
    assert all(r["row_key"].startswith("/vol_r/bkt_o/") for r in page)


def test_lookup_and_list_status(api):
    first = api.list_keys("vol_r", "bkt_o", max_keys=1).first()
    assert api.lookup_key(first["row_key"]).count() == 1
    children = api.list_status("vol_r", "bkt_o", "dir1").collect()
    assert children and all(r["is_dir"] for r in children)


def test_s3_and_utilization(api):
    out = api.list_objects_v2("vol_a", "bkt_f", prefix="dir1/").collect()
    assert {r["entry_type"] for r in out} == {"PREFIX"}
    hist = api.utilization_file_count(volume="vol_a", bucket="bkt_f").collect()
    assert hist and all(r["volume"] == "vol_a" for r in hist)


def test_cluster_endpoints(api):
    state = api.cluster_state().collect()
    assert len(state) == 1
    assert state[0]["total_pipelines"] > 0 and state[0]["healthy_datanodes"] > 0
    unhealthy = api.unhealthy_containers()
    assert unhealthy.filter(F.col("health") == "HEALTHY").count() == 0
    # per-state endpoint filter (MIS_REPLICATED itself is exercised on
    # synthetic fixtures in test_container_health — at sf0.001 the
    # sparse replica sample may not produce a placement violation)
    some_state = unhealthy.first()["health"]
    scoped = api.unhealthy_containers(state=some_state).collect()
    assert scoped and {r["health"] for r in scoped} == {some_state}


def test_scm_admin_endpoints(api):
    bal = api.balancer_utilization().collect()
    assert bal and all(
        r["classification"] in ("OVER_UTILIZED", "UNDER_UTILIZED", "WITHIN_THRESHOLD")
        for r in bal
    )
    decom = api.decommission_status().collect()
    assert all(r["op_state"] in ("DECOMMISSIONING", "ENTERING_MAINTENANCE") for r in decom)
    pending = api.pending_block_deletions().collect()
    assert pending and all(r["txn_count"] > 0 for r in pending)
    failed = api.failed_block_deletions(limit=5).collect()
    assert len(failed) <= 5


def test_safemode_endpoint(api):
    rules = {r["rule"] for r in api.safe_mode_status().collect()}
    assert rules == {
        "CONTAINER", "DATANODE", "HEALTHY_PIPELINE", "ONE_REPLICA_PIPELINE"
    }


def test_container_page_and_rack_spread(api):
    page = api.list_containers(prev_key=10, limit=5).collect()
    assert len(page) == 5
    assert all(r["container_id"] > 10 for r in page)
    ids = [r["container_id"] for r in page]
    assert ids == sorted(ids)
    spread = api.pipeline_rack_spread().collect()
    assert spread and all(r["actual_racks"] <= r["member_count"] for r in spread)


def test_heatmap_endpoint(api):
    hm = api.access_heatmap().collect()
    grand = [r for r in hm if r["volume"] is None]
    assert len(grand) == 1
    assert grand[0]["access_count"] == sum(
        r["access_count"] for r in hm if r["volume"] is not None and r["bucket"] is None
    )


def test_replication_planner_endpoints(api, spark, sf_dir):
    actions = api.replication_actions()
    kinds = {r["action"] for r in actions.select("action").distinct().collect()}
    assert kinds <= {
        "MISSING", "NO_HEALTHY_SOURCE", "ADD_REPLICA", "DELETE_REPLICA"
    }
    usage = api.datanode_usage(count=5).collect()
    assert len(usage) == 5
    # most-used ordering is by remaining-to-capacity RATIO ascending
    # (DatanodeUsageInfo.compareByRemainingRatio), not absolute bytes
    ratios = [r.remaining_bytes / r.capacity_bytes for r in usage]
    assert all(ratios[i] <= ratios[i + 1] for i in range(len(ratios) - 1))
    closes = api.close_actions(
        model.rm_container_details(spark, sf_dir),
        model.rm_replica_details(spark, sf_dir),
    )
    kinds = {r["action"] for r in closes.select("action").distinct().collect()}
    assert kinds <= {"CLOSE", "FORCE_CLOSE", "DELETE_UNHEALTHY"}
