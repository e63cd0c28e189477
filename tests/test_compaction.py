"""Compaction: fragmented partitions get rewritten key-sorted and
right-sized; healthy partitions' files are left byte-identical."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark.sources import compaction, snapshot

SCHEMA = "volume string, bucket string, key string, row_key string, data_size long"


def _files(path):
    return sorted(
        f for f in os.listdir(path) if not f.startswith("_") and not f.startswith(".")
    )


def test_compact_fragmented_partition_only(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_compact_")
    snap_dir = f"{tmp}/snap"
    try:
        base = spark.createDataFrame(
            [("v1", "b1", f"k{i:04d}", f"/v1/b1/k{i:04d}", i) for i in range(50)]
            + [("v2", "b1", f"k{i:04d}", f"/v2/b1/k{i:04d}", i) for i in range(50)],
            SCHEMA,
        )
        snapshot.write_snapshot(base, snap_dir)
        # fragment v1/b1 with 12 tiny append-mode writes — the shape an
        # append-mode streaming sink (foreachBatch mart writer) leaves
        # behind; note the partition-rewriting MERGE (upsert.py) does
        # NOT fragment, it emits one file per touched partition
        for batch in range(12):
            spark.createDataFrame(
                [("v1", "b1", f"new{batch:02d}", f"/v1/b1/new{batch:02d}", 1000 + batch)],
                SCHEMA,
            ).write.mode("append").partitionBy("volume", "bucket").parquet(snap_dir)
        healthy_before = _files(f"{snap_dir}/volume=v2/bucket=b1")
        frag_files = len(_files(f"{snap_dir}/volume=v1/bucket=b1"))
        assert frag_files > 8  # genuinely fragmented
        before = {r["row_key"]: r["data_size"] for r in spark.read.parquet(snap_dir).collect()}

        picked = compaction.compact(spark, snap_dir, max_files=8)

        assert [(s.volume, s.bucket) for s in picked] == [("v1", "b1")]
        assert len(_files(f"{snap_dir}/volume=v1/bucket=b1")) <= 2
        assert _files(f"{snap_dir}/volume=v2/bucket=b1") == healthy_before
        after = {r["row_key"]: r["data_size"] for r in spark.read.parquet(snap_dir).collect()}
        assert after == before  # lossless

        # rewritten partition is key-sorted within its file(s)
        got = [
            r["key"]
            for r in spark.read.parquet(f"{snap_dir}/volume=v1/bucket=b1").collect()
        ]
        # per-file sortedness: collect preserves within-file order per split
        assert sorted(got) == sorted(set(got))  # no dupes introduced
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_plan_compaction_spares_legitimately_large_partitions(spark):
    stats = [
        compaction.PartitionStats("v1", "b1", 20, 20 * 128 * 1024 * 1024),  # big: ok
        compaction.PartitionStats("v1", "b2", 20, 1024),  # tiny: fragmented
        compaction.PartitionStats("v1", "b3", 3, 1024),  # few files: ok
    ]
    picked = compaction.plan_compaction(stats, max_files=8)
    assert [(s.volume, s.bucket) for s in picked] == [("v1", "b2")]


def test_compact_noop_when_healthy(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_compact_")
    try:
        base = spark.createDataFrame(
            [("v1", "b1", "k1", "/v1/b1/k1", 1)], SCHEMA
        )
        snapshot.write_snapshot(base, f"{tmp}/snap")
        assert compaction.compact(spark, f"{tmp}/snap") == []
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
