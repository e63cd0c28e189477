"""applyInPandasWithState custom stateful operator: streaming latest-
state ≡ batch compaction after full replay."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark.operators import cdc
from hadoop_ozone_spark.streaming import maintenance, stateful

EVENTS = [
    (1, "PUT", "/v/b/k1", 100, None, "2024-01-01 00:00:01"),
    (2, "PUT", "/v/b/k2", 200, None, "2024-01-01 00:00:02"),
    (3, "UPDATE", "/v/b/k1", 150, 100, "2024-01-01 00:00:03"),
    (4, "DELETE", "/v/b/k2", 200, None, "2024-01-01 00:00:04"),
    (5, "PUT", "/v/b/k3", 300, None, "2024-01-01 00:00:05"),
    (6, "DELETE", "/v/b/k3", 300, None, "2024-01-01 00:00:06"),
    (7, "PUT", "/v/b/k3", 350, None, "2024-01-01 00:00:07"),
]


def test_stateful_stream_equals_batch_compaction(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_state_")
    try:
        df = spark.createDataFrame(
            EVENTS,
            "seqno long, op string, row_key string, data_size long, old_size long, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = maintenance.read_event_stream(spark, f"{tmp}/events", max_files_per_trigger=10)
        out = stateful.stateful_latest_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("state_test")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["row_key"]: (r["live"], r["data_size"], r["last_seqno"])
            for r in spark.sql(
                "SELECT * FROM state_test"
            ).collect()
        }
        batch = cdc.latest_state(df.select("seqno", "op", "row_key", "data_size"))
        live_batch = {r["row_key"]: r["data_size"] for r in batch.collect()}
        # streaming state agrees with batch compaction on live keys
        assert {k for k, v in got.items() if v[0]} == set(live_batch)
        for k, size in live_batch.items():
            assert got[k][1] == size
        assert got["/v/b/k2"] == (False, 0, 4)
        assert got["/v/b/k3"] == (True, 350, 7)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


REPLICA_REPORTS = [
    # container 10 (rf 3): ends with replicas on nodes 1,3 → under by 1
    (1, "ADD", 10, 1, "2024-01-01 00:00:01"),
    (2, "ADD", 10, 2, "2024-01-01 00:00:02"),
    (3, "ADD", 10, 3, "2024-01-01 00:00:03"),
    (4, "REMOVE", 10, 2, "2024-01-01 00:00:04"),
    # container 20 (rf 1): ends with replicas on 4,5 → over by 1
    (5, "ADD", 20, 4, "2024-01-01 00:00:05"),
    (6, "ADD", 20, 5, "2024-01-01 00:00:06"),
    # container 30 (rf 3): added then fully removed → MISSING
    (7, "ADD", 30, 6, "2024-01-01 00:00:07"),
    (8, "REMOVE", 30, 6, "2024-01-01 00:00:08"),
]


def test_streaming_action_planning_equals_batch(spark):
    """streaming_live_replicas replay + plan_actions_batch ≡ the batch
    replication_actions over the same final replica set — the
    incremental ReplicationMonitor contract."""
    from hadoop_ozone_spark.operators import scm

    tmp = tempfile.mkdtemp(prefix="ozspark_rm_")
    try:
        df = spark.createDataFrame(
            REPLICA_REPORTS,
            "seqno long, op string, container_id long, datanode_id long, "
            "event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.mode("overwrite").parquet(f"{tmp}/reports")
        stream = maintenance.read_replica_report_stream(
            spark, f"{tmp}/reports", max_files_per_trigger=10
        )
        q = (
            maintenance.streaming_live_replicas(stream)
            .writeStream.format("memory")
            .queryName("live_replicas")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        live = spark.sql(
            "SELECT container_id, datanode_id FROM live_replicas WHERE is_live"
        )
        assert {(r.container_id, r.datanode_id) for r in live.collect()} == {
            (10, 1), (10, 3), (20, 4), (20, 5)
        }

        containers = spark.createDataFrame(
            [(10, "CLOSED", 3, 50, 0), (20, "CLOSED", 1, 60, 0),
             (30, "CLOSED", 3, 70, 0)],
            "container_id long, state string, replication_factor int, "
            "used_bytes long, pipeline_id long",
        )
        datanodes = spark.createDataFrame(
            [(i, f"n{i}", f"r{i % 3}", "HEALTHY", "IN_SERVICE", 100)
             for i in range(1, 7)],
            "datanode_id long, hostname string, rack string, "
            "node_state string, op_state string, capacity_bytes long",
        )
        touched = spark.createDataFrame(
            [(10,), (20,), (30,)], "container_id long"
        )
        incremental = maintenance.plan_actions_batch(
            live, touched, containers, datanodes
        ).collect()
        batch = scm.replication_actions(containers, live, datanodes).collect()
        key = lambda r: (r.container_id, r.action, r.datanode_id)
        assert sorted(map(key, incremental)) == sorted(map(key, batch))
        kinds = {r.container_id: r.action for r in incremental
                 if r.action in ("MISSING", "ADD_REPLICA", "DELETE_REPLICA")}
        assert kinds[30] == "MISSING"
        assert any(r.action == "ADD_REPLICA" and r.container_id == 10
                   for r in incremental)
        assert any(r.action == "DELETE_REPLICA" and r.container_id == 20
                   for r in incremental)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STATE_REPORTS = [
    # container 10 CLOSED seq 9: replica 1 reports OPEN then CLOSED
    # (stabilizes); replica 2 stays OPEN; replica 3 UNHEALTHY
    (1, 10, 1, "OPEN", 9, "2024-01-01 00:00:01"),
    (2, 10, 2, "OPEN", 9, "2024-01-01 00:00:02"),
    (3, 10, 3, "UNHEALTHY", 9, "2024-01-01 00:00:03"),
    (4, 10, 1, "CLOSED", 9, "2024-01-01 00:00:04"),
    # container 20 QUASI_CLOSED seq 7: two QC replicas (quorum for
    # rf 3) at BCSIDs 7 and 6 → force close only the max
    (5, 20, 4, "QUASI_CLOSED", 7, "2024-01-01 00:00:05"),
    (6, 20, 5, "QUASI_CLOSED", 6, "2024-01-01 00:00:06"),
]


def test_streaming_close_dispatch_equals_batch(spark):
    from hadoop_ozone_spark.operators import scm

    tmp = tempfile.mkdtemp(prefix="ozspark_close_")
    try:
        df = spark.createDataFrame(
            STATE_REPORTS,
            "seqno long, container_id long, datanode_id long, "
            "replica_state string, sequence_id long, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.mode("overwrite").parquet(f"{tmp}/reports")
        stream = maintenance.read_replica_state_stream(
            spark, f"{tmp}/reports", max_files_per_trigger=10
        )
        q = (
            maintenance.streaming_replica_states(stream)
            .writeStream.format("memory")
            .queryName("replica_states")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        states = spark.sql(
            "SELECT container_id, datanode_id, replica_state, sequence_id "
            "FROM replica_states"
        )
        # latest report won for replica (10, 1)
        got = {(r.container_id, r.datanode_id): r.replica_state
               for r in states.collect()}
        assert got[(10, 1)] == "CLOSED"

        cdetails = spark.createDataFrame(
            [(10, "CLOSED", 3, 9), (20, "QUASI_CLOSED", 3, 7)],
            "container_id long, state string, replication_factor int, "
            "sequence_id long",
        )
        touched = spark.createDataFrame([(10,), (20,)], "container_id long")
        incremental = maintenance.plan_close_batch(
            states, touched, cdetails
        ).collect()
        batch = scm.close_actions(cdetails, states).collect()
        key = lambda r: (r.container_id, r.action, r.datanode_id)
        assert sorted(map(key, incremental)) == sorted(map(key, batch))
        got = sorted(map(key, incremental))
        # container 10 (CLOSED, exactly replicated, unstable): OPEN
        # replica 2 → CLOSE; UNHEALTHY replica 3 → the one delete
        # container 20: force-close only the max-BCSID QC replica (4)
        assert got == [
            (10, "CLOSE", 2),
            (10, "DELETE_UNHEALTHY", 3),
            (20, "FORCE_CLOSE", 4),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_delete_plane_equals_batch(spark):
    """RM4 stream≡batch (VERDICT r5 #6): plan_delete_batch over the
    maintained replica-state set + touched ids ≡ the batch delete plane
    restricted to the same containers — including the key-plane
    emptiness gate surviving the semi-prune."""
    from hadoop_ozone_spark.operators import scm
    from hadoop_ozone_spark.streaming import maintenance

    states = spark.createDataFrame(
        [
            # 30: DELETING with replicas -> resend deletes
            (30, 1, "CLOSED"), (30, 2, "OPEN"),
            # 40: CLOSED + all replicas CLOSED + NO live keys -> empty
            (40, 1, "CLOSED"), (40, 3, "CLOSED"),
            # 50: CLOSED + all CLOSED but HAS live keys -> no action
            (50, 2, "CLOSED"),
            # 60: untouched this batch — must NOT appear incrementally
            (60, 4, "CLOSED"),
        ],
        "container_id long, datanode_id long, replica_state string",
    )
    cdetails = spark.createDataFrame(
        [
            (30, "DELETING", 3, 0), (35, "DELETING", 3, 0),  # 35: no reps
            (40, "CLOSED", 3, 0), (50, "CLOSED", 3, 0),
            (60, "DELETING", 3, 0),
        ],
        "container_id long, state string, replication_factor int, "
        "sequence_id long",
    )
    keys = spark.createDataFrame(
        [(50, "/v/b/k1"), (50, "/v/b/k2"), (99, "/v/b/k3")],
        "container_id long, row_key string",
    )
    touched = spark.createDataFrame(
        [(30,), (35,), (40,), (50,)], "container_id long"
    )
    incremental = maintenance.plan_delete_batch(
        states, touched, cdetails, keys
    ).collect()
    batch = [
        r for r in scm.delete_actions(cdetails, states, keys).collect()
        if r.container_id in {30, 35, 40, 50}
    ]
    key = lambda r: (r.container_id, r.action, r.datanode_id)
    assert sorted(map(key, incremental)) == sorted(map(key, batch))
    got = sorted(map(key, incremental))
    assert got == [
        (30, "DELETE_REPLICA", 1),
        (30, "DELETE_REPLICA", 2),
        (35, "CLEANUP", None),
        (40, "CLEANUP", None),
        (40, "DELETE_EMPTY", 1),
        (40, "DELETE_EMPTY", 3),
    ]
    # untouched container 60 is absent incrementally but present in the
    # full batch plane — the prune is the only difference
    full = {r.container_id for r in
            scm.delete_actions(cdetails, states, keys).collect()}
    assert 60 in full
