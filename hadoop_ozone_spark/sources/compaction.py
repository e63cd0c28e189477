"""Snapshot compaction — the small-files maintenance job.

Two layout pathologies accumulate in a live deployment: append-mode
streaming sinks (foreachBatch mart writers) accrete one small unsorted
file per micro-batch, and hash-repartitioned bulk writes emit ONE file
per (volume, bucket) however large the bucket — eroding scan
throughput (file-open overhead), parallelism (a 10 GB file is one
split per row-group run), and the row-group min/max skipping the
prefix-seek analogue depends on (sources/snapshot.py). The
partition-rewriting MERGE (sources/upsert.py) does not fragment — it
emits one file per touched partition — but inherits the oversize
problem. The reference's counterpart is RocksDB's background
compaction, free from the storage engine; on immutable parquet it must
be an explicit job.

Design: measure per-partition file counts/bytes from the filesystem
(driver-side listing of partition dirs — O(#partitions), not O(data)),
pick partitions over the fragmentation threshold, and rewrite ONLY
those, coalesced to ``ceil(bytes / target_file_bytes)`` key-sorted
files via dynamic partition overwrite. Cost is proportional to
fragmented data, never table size — at 100 TB a nightly compaction
touches the day's hot buckets only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionStats:
    volume: str
    bucket: str
    num_files: int
    total_bytes: int


def partition_stats(spark: SparkSession, snapshot_dir: str) -> list[PartitionStats]:
    """Per-(volume,bucket) data-file counts and bytes via the Hadoop FS
    API (works the same on local/HDFS/S3A). Driver-side, O(#partitions
    + #files) metadata ops — no data read."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(snapshot_dir)
    fs = root.getFileSystem(hconf)
    out: list[PartitionStats] = []
    for vol_status in fs.listStatus(root):
        if not vol_status.isDirectory():
            continue
        vol_name = vol_status.getPath().getName()
        if not vol_name.startswith("volume="):
            continue
        for bkt_status in fs.listStatus(vol_status.getPath()):
            if not bkt_status.isDirectory():
                continue
            bkt_name = bkt_status.getPath().getName()
            if not bkt_name.startswith("bucket="):
                continue
            n, total = 0, 0
            for f in fs.listStatus(bkt_status.getPath()):
                name = f.getPath().getName()
                if f.isFile() and not name.startswith("_") and not name.startswith("."):
                    n += 1
                    total += f.getLen()
            out.append(
                PartitionStats(
                    vol_name.split("=", 1)[1], bkt_name.split("=", 1)[1], n, total
                )
            )
    return out


def plan_compaction(
    stats: list[PartitionStats],
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> list[PartitionStats]:
    """A partition needs compaction when it holds more files than
    ``max(max_files, ideal)`` where ideal = bytes/target — a partition
    legitimately large enough to need many files is not 'fragmented'."""
    picked = []
    for s in stats:
        ideal = max(1, math.ceil(s.total_bytes / target_file_bytes))
        if s.num_files > max(max_files, ideal):
            picked.append(s)
    return picked


def compact(
    spark: SparkSession,
    snapshot_dir: str,
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str = "key",
) -> list[PartitionStats]:
    """Rewrite fragmented partitions key-sorted and right-sized.

    Returns the partitions compacted. Untouched partitions' files are
    untouched (dynamic partition overwrite), so the job is safe to run
    concurrently with readers — parquet snapshots are immutable and
    listings are point-in-time.
    """
    picked = plan_compaction(
        partition_stats(spark, snapshot_dir), max_files, target_file_bytes
    )
    if not picked:
        return picked
    touched = spark.createDataFrame(
        [(s.volume, s.bucket) for s in picked], "volume string, bucket string"
    )
    snap = spark.read.parquet(snapshot_dir)
    fragmented = snap.join(F.broadcast(touched), ["volume", "bucket"], "left_semi")
    # one output file per target_file_bytes of input, never zero
    n_out = max(
        1, math.ceil(sum(s.total_bytes for s in picked) / target_file_bytes)
    )
    # range-partition on (volume, bucket, key) so an oversized bucket
    # splits into multiple CONTIGUOUS key-range files (hash repartition
    # would glue each bucket to one task → one giant file) and every
    # output file covers a disjoint range → max-quality min/max stats
    (
        fragmented.repartitionByRange(n_out, "volume", "bucket", sort_col)
        .sortWithinPartitions("volume", "bucket", sort_col)
        .write.mode("overwrite")
        # scoped to this write — never mutate the shared session conf
        # (a later static full-bootstrap overwrite must not inherit it)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("volume", "bucket")
        .parquet(snapshot_dir)
    )
    return picked
