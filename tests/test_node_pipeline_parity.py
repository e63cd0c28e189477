"""Round-4 parity operators: replica history (ContainerEndpoint.java:
225-238), datanode listing (NodeEndpoint.java:83-160), pipeline listing
(PipelineEndpoint.java:73-135), M5 ETag validation
(S3MultipartUploadCompleteRequest.java:399-450).

Laws are checked on small synthetic fixtures where every edge case is
forced, plus cross-checks against the model planes at sf0.001.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.endpoints import OzoneAnalytics
from hadoop_ozone_spark.operators import mutations, recon


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def obs(spark):
    # container 1 on nodes 10 (seen 3×) and 20 (once); container 2 on
    # node 99 which is NOT in the node table (hostname fallback)
    rows = [
        (1, 10, _ts(1)),
        (1, 10, _ts(5)),
        (1, 10, _ts(3)),
        (1, 20, _ts(2)),
        (2, 99, _ts(4)),
    ]
    return spark.createDataFrame(
        rows, "container_id long, datanode_id long, seen_time timestamp"
    )


@pytest.fixture(scope="module")
def nodes(spark):
    rows = [
        (10, "host-a", "rack_0", "HEALTHY", 10_000),
        (20, "host-b", "rack_1", "STALE", 20_000),
    ]
    return spark.createDataFrame(
        rows,
        "datanode_id long, hostname string, rack string, node_state string,"
        " capacity_bytes long",
    )


def test_replica_history_first_last_seen(obs, nodes):
    out = {
        (r["container_id"], r["datanode_id"]): r
        for r in recon.replica_history(obs, nodes).collect()
    }
    assert len(out) == 3
    r = out[(1, 10)]
    # first_seen pinned to the earliest report, last_seen advances
    # (ReconContainerManager.java:300-310 upsert law)
    assert r["first_seen"] == _ts(1) and r["last_seen"] == _ts(5)
    assert r["datanode_host"] == "host-a"
    assert out[(1, 20)]["first_seen"] == out[(1, 20)]["last_seen"] == _ts(2)
    # unregistered datanode keeps its history with the 'N/A' hostname
    # fallback (ReconContainerManager.java:380-390)
    assert out[(2, 99)]["datanode_host"] == "N/A"


def test_latest_replica_history_orders_and_caps(obs, nodes):
    out = recon.latest_replica_history(obs, 1, limit=1, datanodes_df=nodes).collect()
    assert len(out) == 1
    # node 10 was seen last (day 5) — it is the latest known location
    assert out[0]["datanode_id"] == 10 and out[0]["last_seen"] == _ts(5)


def test_datanode_listing_facets(spark, sf_dir):
    out = recon.datanode_listing(
        model.datanodes(spark, sf_dir),
        model.container_replicas(spark, sf_dir),
        model.containers(spark, sf_dir),
        model.pipelines(spark, sf_dir),
        model.pipeline_members(spark, sf_dir),
    )
    rows = out.collect()
    dn = model.datanodes(spark, sf_dir).count()
    assert len(rows) == dn  # every registered node listed, even idle ones
    byid = {r["datanode_id"]: r for r in rows}
    # leader counts must total the pipeline count (every pipeline has
    # exactly one leader and leader ids are registered nodes 1..7)
    assert sum(r["leader_count"] for r in rows) == model.pipelines(
        spark, sf_dir
    ).count()
    # facet cross-check against a directly-computed witness node
    some = (
        model.container_replicas(spark, sf_dir)
        .groupBy("datanode_id")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert byid[some["datanode_id"]]["container_count"] == some["count"]
    for r in rows:
        assert r["remaining_bytes"] == r["capacity_bytes"] - r["used_bytes"]
        assert r["pipeline_count"] >= 1  # primary membership always exists


def test_pipeline_listing_members_sorted(spark, sf_dir):
    rows = recon.pipeline_listing(
        model.pipelines(spark, sf_dir),
        model.pipeline_members(spark, sf_dir),
        model.datanodes(spark, sf_dir),
        model.containers(spark, sf_dir),
    ).collect()
    assert len(rows) == model.pipelines(spark, sf_dir).count()
    for r in rows:
        ids = [int(x) for x in r["member_ids"].split(",")] if r["member_ids"] else []
        assert ids == sorted(ids)
        assert len(ids) == r["datanode_count"]
        assert r["leader_host"] != ""  # leaders 1..7 resolve to suppliers


def test_multipart_etag_check_laws(spark):
    declared = spark.createDataFrame(
        [
            # upload 1: valid — parts 1..2 stored with matching etags
            (1, 1, "e11"),
            (1, 2, "e12"),
            # upload 2: gap (declares 1,3)
            (2, 1, "e21"),
            (2, 3, "e23"),
            # upload 3: part 2 missing from the store
            (3, 1, "e31"),
            (3, 2, "e32"),
            # upload 4: part 1 etag mismatch
            (4, 1, "e41"),
        ],
        "upload_id long, part_number int, etag string",
    )
    stored = spark.createDataFrame(
        [
            (1, 1, "e11", 100),
            (1, 2, "e12", 200),
            (2, 1, "e21", 100),
            (2, 3, "e23", 300),
            (3, 1, "e31", 100),
            (4, 1, "XXX", 100),
        ],
        "upload_id long, part_number int, etag string, data_size long",
    )
    out = {
        r["upload_id"]: r
        for r in mutations.multipart_complete_etag_check(declared, stored).collect()
    }
    assert out[1]["is_valid"] and out[1]["total_size"] == 300
    assert not out[2]["is_valid"]  # gap-free law still enforced
    assert not out[3]["is_valid"] and out[3]["missing_parts"] == 1
    assert not out[4]["is_valid"] and out[4]["etag_mismatches"] == 1


def test_missing_containers_law(spark):
    # containers: 1 MISSING with history, 2 healthy, 3 MISSING without
    # history, 4 DELETED (excluded even with zero replicas)
    containers = spark.createDataFrame(
        [
            (1, "CLOSED", 2, 7),
            (2, "CLOSED", 3, 7),
            (3, "OPEN", 3, 8),
            (4, "DELETED", 3, 9),
        ],
        "container_id long, state string, replication_factor int, pipeline_id long",
    )
    replicas = spark.createDataFrame([(2, 10)], "container_id long, datanode_id long")
    keys = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "container_id long, data_size long"
    )
    obs = spark.createDataFrame(
        # container 1 was seen on nodes 10 (latest), 20, 30 — rf=2 caps
        # the last-known list to the two most recent
        [
            (1, 10, _ts(9)),
            (1, 20, _ts(5)),
            (1, 30, _ts(2)),
            (2, 10, _ts(1)),
        ],
        "container_id long, datanode_id long, seen_time timestamp",
    )
    out = {
        r["container_id"]: r
        for r in recon.missing_containers(containers, replicas, keys, obs).collect()
    }
    assert set(out) == {1, 3}  # healthy and DELETED excluded
    r = out[1]
    assert r["key_count"] == 2 and r["total_bytes"] == 300
    assert r["pipeline_id"] == 7
    assert r["last_seen_max"] == _ts(9)
    assert r["last_known_datanodes"] == "10,20"  # rf=2 cap, latest first
    assert out[3]["key_count"] == 0 and out[3]["last_known_datanodes"] == ""
    assert out[3]["last_seen_max"] is None


def test_new_endpoints(spark, sf_dir):
    api = OzoneAnalytics(
        spark,
        keys=model.om_keys(spark, sf_dir),
        containers=model.containers(spark, sf_dir),
        replicas=model.container_replicas(spark, sf_dir),
        datanodes=model.datanodes(spark, sf_dir),
        pipelines=model.pipelines(spark, sf_dir),
        pipeline_members=model.pipeline_members(spark, sf_dir),
        replica_observations=model.replica_observations(spark, sf_dir),
    )
    assert api.list_datanodes().count() == model.datanodes(spark, sf_dir).count()
    assert api.list_pipelines().count() == model.pipelines(spark, sf_dir).count()
    probe = model.replica_observations(spark, sf_dir).first()
    hist = api.container_replica_history(probe["container_id"]).collect()
    assert hist and all(r["container_id"] == probe["container_id"] for r in hist)
    latest = api.latest_container_history(probe["container_id"], limit=3)
    assert latest.count() <= 3
    missing = api.missing_containers()
    assert "last_known_datanodes" in missing.columns
