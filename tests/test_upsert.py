"""Dynamic-partition MERGE: only touched partitions rewritten; result
equals relational replay. Plus bucketed co-located join (no shuffle)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark.sources import snapshot, upsert

SNAP_ROWS = [
    # volume, bucket, key, row_key, data_size
    ("v1", "b1", "a/k1", "/v1/b1/a/k1", 10),
    ("v1", "b1", "a/k2", "/v1/b1/a/k2", 20),
    ("v1", "b2", "a/k3", "/v1/b2/a/k3", 30),
    ("v2", "b1", "a/k4", "/v2/b1/a/k4", 40),
]
SCHEMA = "volume string, bucket string, key string, row_key string, data_size long"


def test_apply_events_merges_only_touched_partitions(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_upsert_")
    try:
        snap_df = spark.createDataFrame(SNAP_ROWS, SCHEMA)
        snapshot.write_snapshot(snap_df, f"{tmp}/snap")
        untouched_files = set(
            os.listdir(f"{tmp}/snap/volume=v2/bucket=b1")
        )
        events = spark.createDataFrame(
            [
                (1, "UPDATE", "v1", "b1", "a/k1", "/v1/b1/a/k1", 15),
                (2, "DELETE", "v1", "b1", "a/k2", "/v1/b1/a/k2", 0),
                (3, "PUT", "v1", "b1", "a/k9", "/v1/b1/a/k9", 99),
            ],
            "seqno long, op string, volume string, bucket string, key string, row_key string, data_size long",
        )
        upsert.apply_events_to_snapshot(spark, f"{tmp}/snap", events)
        got = {
            r["row_key"]: r["data_size"]
            for r in spark.read.parquet(f"{tmp}/snap").collect()
        }
        assert got == {
            "/v1/b1/a/k1": 15,   # updated
            "/v1/b1/a/k9": 99,   # inserted
            "/v1/b2/a/k3": 30,   # untouched partition
            "/v2/b1/a/k4": 40,   # untouched partition
        }
        # dynamic overwrite left the untouched partition's files alone
        assert set(os.listdir(f"{tmp}/snap/volume=v2/bucket=b1")) == untouched_files
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_delete_emptying_partition_does_not_resurrect(spark):
    """A DELETE batch that empties a partition must remove it — dynamic
    overwrite alone leaves zero-output partitions' old files in place."""
    tmp = tempfile.mkdtemp(prefix="ozspark_empty_")
    try:
        snap_df = spark.createDataFrame(SNAP_ROWS, SCHEMA)
        snapshot.write_snapshot(snap_df, f"{tmp}/snap")
        events = spark.createDataFrame(
            [(1, "DELETE", "v1", "b2", "a/k3", "/v1/b2/a/k3", 0)],
            "seqno long, op string, volume string, bucket string, key string, row_key string, data_size long",
        )
        upsert.apply_events_to_snapshot(spark, f"{tmp}/snap", events)
        got = sorted(
            r["row_key"] for r in spark.read.parquet(f"{tmp}/snap").collect()
        )
        assert got == ["/v1/b1/a/k1", "/v1/b1/a/k2", "/v2/b1/a/k4"]
        assert not os.path.exists(f"{tmp}/snap/volume=v1/bucket=b2")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_avoids_shuffle(spark):
    """Pre-bucketed tables co-locate the join: no Exchange in the plan
    (the 100 TB answer for repeated J1-style container joins)."""
    tmp = tempfile.mkdtemp(prefix="ozspark_bucket_")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    try:
        left = spark.range(10000).select(
            F.col("id").alias("container_id"), (F.col("id") * 7).alias("bytes")
        )
        right = spark.range(2000).select(
            F.col("id").alias("container_id"), F.lit("OPEN").alias("state")
        )
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
        left.write.bucketBy(8, "container_id").sortBy("container_id").mode(
            "overwrite"
        ).saveAsTable("bkt_left")
        right.write.bucketBy(8, "container_id").sortBy("container_id").mode(
            "overwrite"
        ).saveAsTable("bkt_right")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "container_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
        shutil.rmtree(tmp, ignore_errors=True)
