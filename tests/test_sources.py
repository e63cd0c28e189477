"""Sources: snapshot layout (partition pruning!), audit round-trip,
freon generators, FSO path materialization."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import fso
from hadoop_ozone_spark.sources import audit as audit_src
from hadoop_ozone_spark.sources import generators, snapshot


def test_snapshot_partition_pruning(spark, sf_dir):
    """The written snapshot must prune partitions for volume/bucket
    predicates — the RocksDB prefix-seek analogue (SURVEY §4)."""
    tmp = tempfile.mkdtemp(prefix="ozspark_snap_")
    try:
        keys = model.om_keys(spark, sf_dir)
        snapshot.write_snapshot(keys, tmp)
        back = snapshot.read_snapshot(spark, tmp)
        assert back.count() == keys.count()
        scoped = back.filter((F.col("volume") == "vol_r") & (F.col("bucket") == "bkt_o"))
        plan = scoped._jdf.queryExecution().executedPlan().toString()
        # partition filters must appear as PartitionFilters, not data filters
        assert "PartitionFilters" in plan
        assert scoped.count() == keys.filter(
            (F.col("volume") == "vol_r") & (F.col("bucket") == "bkt_o")
        ).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_audit_line_roundtrip_exact(spark):
    df = spark.createDataFrame(
        [("2021-03-04 05:06:07", "alice", "4-NOT SPECIFIED", "SUCCESS", 1.0)],
        "datetime string, user string, op string, result string, o_totalprice double",
    ).withColumn("datetime", F.to_timestamp("datetime"))
    parsed = audit_src.parse_audit_lines(audit_src.format_audit_lines(df)).first()
    assert parsed["user"] == "alice"
    assert parsed["op"] == "4-NOT SPECIFIED"
    assert parsed["result"] == "SUCCESS"
    assert str(parsed["datetime"]) == "2021-03-04 05:06:07"
    assert parsed["level"] == "INFO" and parsed["logger"] == "OMAudit"


def test_generator_shape(spark):
    keys = generators.generate_keys(spark, num_volumes=3, num_buckets=4, num_keys=1000)
    report = generators.generator_report(keys).collect()
    assert len(report) == 3
    assert sum(r["keys_added"] for r in report) == 1000
    assert all(r["buckets_used"] <= 4 for r in report)


def test_fso_materialize_paths(spark):
    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b"), (3, 2, "c"), (4, 1, "d"), (5, 0, "e")],
        "object_id long, parent_object_id long, name string",
    )
    got = {r["object_id"]: (r["path"], r["depth"]) for r in fso.materialize_paths(dirs).collect()}
    assert got == {
        1: ("a", 0), 2: ("a/b", 1), 3: ("a/b/c", 2), 4: ("a/d", 1), 5: ("e", 0)
    }


def test_fso_resolve_files(spark):
    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b")], "object_id long, parent_object_id long, name string"
    )
    files = spark.createDataFrame(
        [(2, "x.txt", 10)], "parent_object_id long, name string, data_size long"
    )
    paths = fso.materialize_paths(dirs)
    got = fso.resolve_files(files, paths).first()
    assert got["path"] == "a/b/x.txt"
