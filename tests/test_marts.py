"""Materialized marts (S9) + endpoint residual filters + windowed
streaming aggregation with watermark."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import recon
from hadoop_ozone_spark.sources import marts
from hadoop_ozone_spark.streaming import maintenance


def test_marts_roundtrip_and_endpoint(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="ozspark_marts_")
    try:
        keys = model.om_keys(spark, sf_dir)
        paths = marts.materialize_marts(spark, keys, tmp)
        assert set(paths) == {"file_count_by_size", "namespace_du", "container_key_index"}
        # endpoint residual filter ≡ recompute
        got = marts.file_count_endpoint(spark, tmp, volume="vol_r", bucket="bkt_o")
        expected = recon.file_size_histogram(keys).filter(
            (F.col("volume") == "vol_r") & (F.col("bucket") == "bkt_o")
        )
        g = {(r["file_size"]): r["cnt"] for r in got.collect()}
        e = {(r["file_size"]): r["cnt"] for r in expected.collect()}
        assert g == e and g
        # partition pruning on the mart
        p = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in p
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_streaming_agg_with_watermark(spark):
    """Tumbling-window counts with watermark over the CDC stream —
    append-mode time-series (the A7 growth mart as a stream)."""
    tmp = tempfile.mkdtemp(prefix="ozspark_window_")
    try:
        rows = [
            (i, "PUT", f"/v/b/k{i}", 100, None, f"2024-01-01 00:{i:02d}:00")
            for i in range(1, 31)
        ]
        df = spark.createDataFrame(
            rows,
            "seqno long, op string, row_key string, data_size long, old_size long, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = maintenance.read_event_stream(spark, f"{tmp}/events", max_files_per_trigger=100)
        windowed = (
            stream.withWatermark("event_time", "10 minutes")
            .groupBy(F.window("event_time", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("data_size").alias("bytes"))
        )
        q = (
            windowed.writeStream.format("memory")
            .queryName("window_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            str(r["w"]["start"]): r["cnt"]
            for r in spark.sql("SELECT * FROM window_test").collect()
        }
        # events at minutes 1..30 → windows 00:00 (9), 00:10 (10), 00:20 (10), 00:30 (1)
        assert sum(got.values()) == 30
        assert got["2024-01-01 00:00:00"] == 9
        assert got["2024-01-01 00:10:00"] == 10
        assert got["2024-01-01 00:30:00"] == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_task_status_reports_mart_versions(spark, tmp_path):
    from hadoop_ozone_spark.sources import marts

    # one mart with two complete versions, one never-run task
    d = str(tmp_path / "file_counts")
    for v in (0, 1):
        spark.range(3).write.mode("overwrite").parquet(f"{d}/batch-{v}")
    out = {
        r.task_name: (r.last_version, r.versions_retained)
        for r in marts.task_status(
            spark, {"file_counts": d, "never_ran": str(tmp_path / "nope")}
        ).collect()
    }
    assert out["file_counts"] == (1, 2)
    assert out["never_ran"] == (-1, 0)
