"""CDC → snapshot maintenance: dynamic-partition MERGE.

The reference applies cache mutations to RocksDB via batched
WriteBatches (OzoneManagerDoubleBuffer.java:187-300). On immutable
parquet the equivalent is: take the micro-batch of events, find the
``(volume, bucket)`` partitions it touches, rewrite ONLY those
partitions as (old rows − deleted − replaced) ∪ upserts, using Spark's
dynamic partition overwrite so untouched partitions are untouched
files. At 100 TB a micro-batch touches a handful of hot buckets —
the rewrite is proportional to touched data, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark.operators import cdc


def apply_events_to_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    events: DataFrame,
    key_col: str = "row_key",
) -> None:
    """MERGE a batch of CDC events into the partitioned snapshot.

    events: (seqno, op, row_key, volume, bucket, key, data_size, ...)
    — latest-op-wins within the batch, DELETE drops the row, PUT/UPDATE
    upserts the payload.
    """
    compacted = cdc.latest_state(events, key_col=key_col)  # PUT/UPDATE survivors
    # Touched-partition set stays a DataFrame — no driver collect of the
    # (unbounded at 100× namespace breadth) partition list. Dynamic
    # partition overwrite is scoped to THIS write via the writer option,
    # never the shared session conf (a later static full-bootstrap
    # overwrite on the same session must not inherit dynamic mode).
    touched_df = events.select("volume", "bucket").distinct().persist()
    snap = spark.read.parquet(snapshot_dir)
    affected_old = snap.join(F.broadcast(touched_df), ["volume", "bucket"], "left_semi")
    all_batch_keys = events.select(key_col).distinct()
    kept = affected_old.join(all_batch_keys, key_col, "left_anti")
    cols = snap.columns
    merged = (
        kept.select(*cols).unionByName(compacted.select(*cols)).persist()
    )
    (
        merged.repartition("volume", "bucket")
        .sortWithinPartitions("key")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("volume", "bucket")
        .parquet(snapshot_dir)
    )
    # Dynamic overwrite only replaces partitions PRESENT in the written
    # data. A touched partition whose every row was deleted produces no
    # output rows, so its old files would survive — deleted keys would
    # resurrect. Remove those partition directories explicitly (Hadoop
    # FS API, so HDFS/S3A work the same as local). The collect here is
    # bounded by the EMPTIED-partition count (normally ~0), not the
    # touched count.
    emptied = (
        touched_df.join(
            merged.select("volume", "bucket").distinct(), ["volume", "bucket"], "left_anti"
        ).collect()
    )
    merged.unpersist()
    touched_df.unpersist()
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for r in emptied:
        path = jvm.org.apache.hadoop.fs.Path(
            f"{snapshot_dir}/volume={r['volume']}/bucket={r['bucket']}"
        )
        fs = path.getFileSystem(hconf)
        fs.delete(path, True)
