"""S5 snapshot-fallback resync: delta when the event tail is intact,
full-bootstrap when retention truncated past the checkpoint, noop when
caught up — and the end state matches relational replay either way."""

from __future__ import annotations

import shutil
import tempfile

from hadoop_ozone_spark.sources import resync, snapshot

SCHEMA = "volume string, bucket string, key string, row_key string, data_size long"
EV_SCHEMA = (
    "seqno long, op string, volume string, bucket string, key string,"
    " row_key string, data_size long"
)

BASE = [
    ("v1", "b1", "k1", "/v1/b1/k1", 10),
    ("v1", "b1", "k2", "/v1/b1/k2", 20),
]


def _state(spark, path):
    return {r["row_key"]: r["data_size"] for r in spark.read.parquet(path).collect()}


def test_plan_modes(spark):
    ev = spark.createDataFrame(
        [(5, "PUT", "v1", "b1", "k9", "/v1/b1/k9", 9)], EV_SCHEMA
    )
    assert resync.plan_sync(ev, last_applied=4).mode == "delta"
    assert resync.plan_sync(ev, last_applied=3).mode == "snapshot"  # seqno 4 lost
    assert resync.plan_sync(ev, last_applied=5).mode == "noop"
    empty = spark.createDataFrame([], EV_SCHEMA)
    assert resync.plan_sync(empty, last_applied=7).mode == "noop"


def test_delta_sync_applies_tail(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_resync_")
    try:
        snapshot.write_snapshot(spark.createDataFrame(BASE, SCHEMA), f"{tmp}/snap")
        events = spark.createDataFrame(
            [
                (3, "PUT", "v1", "b1", "k3", "/v1/b1/k3", 30),
                (4, "DELETE", "v1", "b1", "k1", "/v1/b1/k1", 0),
                (5, "UPDATE", "v1", "b1", "k2", "/v1/b1/k2", 25),
            ],
            EV_SCHEMA,
        )
        auth = spark.createDataFrame([], SCHEMA)  # must not be consulted
        plan = resync.run_sync(
            spark, f"{tmp}/snap", auth, authoritative_seqno=0,
            events=events, last_applied=2,
        )
        assert (plan.mode, plan.to_seqno) == ("delta", 5)
        assert _state(spark, f"{tmp}/snap") == {"/v1/b1/k2": 25, "/v1/b1/k3": 30}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_snapshot_fallback_bootstraps_then_applies_tail(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_resync_")
    try:
        snapshot.write_snapshot(spark.createDataFrame(BASE, SCHEMA), f"{tmp}/snap")
        # consumer at seqno 2; retention now starts at 10 → events 3..9 lost
        events = spark.createDataFrame(
            [(10, "PUT", "v2", "b1", "k5", "/v2/b1/k5", 50)], EV_SCHEMA
        )
        # checkpoint as of seqno 9: k1 deleted, k4 added meanwhile
        auth = spark.createDataFrame(
            [("v1", "b1", "k2", "/v1/b1/k2", 20), ("v1", "b2", "k4", "/v1/b2/k4", 40)],
            SCHEMA,
        )
        plan = resync.run_sync(
            spark, f"{tmp}/snap", auth, authoritative_seqno=9,
            events=events, last_applied=2,
        )
        assert (plan.mode, plan.from_seqno, plan.to_seqno) == ("snapshot", 9, 10)
        assert _state(spark, f"{tmp}/snap") == {
            "/v1/b1/k2": 20, "/v1/b2/k4": 40, "/v2/b1/k5": 50,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bootstrap_is_static_even_with_dynamic_session_conf(spark):
    """Regression: a session whose conf was left in dynamic
    partition-overwrite mode (e.g. by an earlier delta sync or
    compaction) must STILL fully replace the snapshot on bootstrap —
    a partition absent from `authoritative` (all its keys deleted
    upstream) must not survive and resurrect deleted keys."""
    tmp = tempfile.mkdtemp(prefix="ozspark_resync_")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        stale = BASE + [("v9", "b9", "kz", "/v9/b9/kz", 99)]  # doomed partition
        snapshot.write_snapshot(spark.createDataFrame(stale, SCHEMA), f"{tmp}/snap")
        events = spark.createDataFrame(
            [(10, "PUT", "v1", "b1", "k5", "/v1/b1/k5", 50)], EV_SCHEMA
        )
        # checkpoint as of 9: the v9/b9 partition no longer exists upstream
        auth = spark.createDataFrame(BASE, SCHEMA)
        resync.run_sync(
            spark, f"{tmp}/snap", auth, authoritative_seqno=9,
            events=events, last_applied=2,
        )
        assert _state(spark, f"{tmp}/snap") == {
            "/v1/b1/k1": 10, "/v1/b1/k2": 20, "/v1/b1/k5": 50,
        }
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(tmp, ignore_errors=True)


def test_snapshot_fallback_rejects_stale_checkpoint(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_resync_")
    try:
        snapshot.write_snapshot(spark.createDataFrame(BASE, SCHEMA), f"{tmp}/snap")
        events = spark.createDataFrame(
            [(10, "PUT", "v1", "b1", "k9", "/v1/b1/k9", 9)], EV_SCHEMA
        )
        auth = spark.createDataFrame(BASE, SCHEMA)
        try:
            resync.run_sync(
                spark, f"{tmp}/snap", auth, authoritative_seqno=5,
                events=events, last_applied=2,
            )
            raise AssertionError("expected ValueError for uncovered gap")
        except ValueError:
            pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
