"""Unit tests for scalar functions (SURVEY §2.7), mirroring the
reference's operator-level tests (TestFileSizeCountTask bin assertions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_ozone_spark.functions.binning import (
    LONG_MAX,
    NUM_BINS,
    file_size_upper_bound,
    file_size_upper_bound_py,
)
from hadoop_ozone_spark.functions.paths import (
    ancestors,
    build_row_key,
    immediate_child,
    is_file,
    normalize_key,
    row_key_bucket,
    row_key_key,
    row_key_volume,
)

# boundary sizes from the reference tests: 0, sub-1KB, exact powers,
# power+1, huge overflow (ReconUtils.java:303-331)
BOUNDARY_SIZES = [0, 1, 1000, 1023, 1024, 1025, 2048, 2049, 2**20, 2**20 + 1, 2**50, 2**50 + 1, 2**62]


def test_pow2_bins_python():
    # reference semantics (ReconUtils.getFileSizeUpperBound via bit
    # count): an exact power of two lands in the NEXT bin, and
    # size >= 2^50 (inclusive) overflows to Long.MAX_VALUE
    assert file_size_upper_bound_py(0) == 1024
    assert file_size_upper_bound_py(1023) == 1024
    assert file_size_upper_bound_py(1024) == 2048
    assert file_size_upper_bound_py(1025) == 2048
    assert file_size_upper_bound_py(2**50 - 1) == 2**50
    assert file_size_upper_bound_py(2**50) == LONG_MAX
    assert file_size_upper_bound_py(2**50 + 1) == LONG_MAX
    assert NUM_BINS == 42  # 41 pow2 bins + overflow


def test_pow2_bins_spark_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in BOUNDARY_SIZES], "size long")
    got = {
        r["size"]: r["ub"]
        for r in df.select("size", file_size_upper_bound(F.col("size")).alias("ub")).collect()
    }
    assert got == {s: file_size_upper_bound_py(s) for s in BOUNDARY_SIZES}


def test_path_roundtrip(spark):
    df = spark.createDataFrame([("v1", "b1", "a/b/c.txt")], "v string, b string, k string")
    row = df.select(
        build_row_key(F.col("v"), F.col("b"), F.col("k")).alias("rk")
    ).select(
        "rk",
        row_key_volume(F.col("rk")).alias("vol"),
        row_key_bucket(F.col("rk")).alias("bkt"),
        row_key_key(F.col("rk")).alias("key"),
    ).first()
    assert row["rk"] == "/v1/b1/a/b/c.txt"
    assert (row["vol"], row["bkt"], row["key"]) == ("v1", "b1", "a/b/c.txt")


def test_immediate_child_and_is_file(spark):
    df = spark.createDataFrame([("a/b/c/d.txt",), ("a/x/",)], "k string")
    rows = df.select(
        immediate_child(F.col("k"), "a/").alias("child"),
        is_file(F.col("k")).alias("is_file"),
    ).collect()
    assert rows[0]["child"] == "b" and rows[0]["is_file"]
    assert rows[1]["child"] == "x" and not rows[1]["is_file"]


def test_normalize_key(spark):
    df = spark.createDataFrame([("//a//b///c",), ("./x/y",)], "k string")
    got = [r["n"] for r in df.select(normalize_key(F.col("k")).alias("n")).collect()]
    assert got == ["a/b/c", "x/y"]


def test_ancestors(spark):
    df = spark.createDataFrame([("a/b/c/file",), ("file",)], "k string")
    got = [r["a"] for r in df.select(ancestors(F.col("k")).alias("a")).collect()]
    assert got[0] == ["a", "a/b", "a/b/c"]
    assert got[1] == []


def test_register_views_sql_front_door(spark, sf_dir):
    from hadoop_ozone_spark import model

    names = model.register_views(spark, sf_dir)
    assert "lineitem" in names and "om_keys" in names
    # raw and derived views answer SQL directly
    n_keys = spark.sql("SELECT count(*) AS n FROM om_keys").first()["n"]
    assert n_keys > 0
    top = spark.sql(
        "SELECT volume, count(*) AS n FROM om_keys GROUP BY volume ORDER BY n DESC LIMIT 1"
    ).first()
    assert top["n"] > 0
