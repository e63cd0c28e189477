"""A3 NSSummary parity — mirrors the reference's TestNSSummaryTask
scenarios: per-directory DIRECT file counts/bytes, the 42-slot pow2 bin
array (ReconUtils bit-count boundary semantics), and childDir sets,
including intermediate dirs with no direct files and the bucket root."""

from __future__ import annotations

import pytest

from hadoop_ozone_spark.functions.binning import LONG_MAX, NUM_BINS
from hadoop_ozone_spark.operators import recon

KEYS = [
    # volume, bucket, key, data_size
    ("v", "b", "root.txt", 100),
    ("v", "b", "a/f1", 1500),
    ("v", "b", "a/f2", 500),
    ("v", "b", "a/b/f3", 1024),       # exact power of two → NEXT bin
    ("v", "b", "c/d/e/f4", 2**50),    # >= 2^50 → overflow bin
]


@pytest.fixture(scope="module")
def summary(spark):
    keys = spark.createDataFrame(
        KEYS, "volume string, bucket string, key string, data_size long"
    )
    return {
        r["dir"]: r for r in recon.namespace_summary(keys).collect()
    }


def test_all_dirs_present_including_intermediates(summary):
    assert set(summary) == {"", "a", "a/b", "c", "c/d", "c/d/e"}


def test_direct_file_stats(summary):
    assert (summary[""]["num_files"], summary[""]["size_of_files"]) == (1, 100)
    assert (summary["a"]["num_files"], summary["a"]["size_of_files"]) == (2, 2000)
    assert (summary["a/b"]["num_files"], summary["a/b"]["size_of_files"]) == (1, 1024)
    assert (summary["c"]["num_files"], summary["c"]["size_of_files"]) == (0, 0)
    assert (summary["c/d/e"]["num_files"], summary["c/d/e"]["size_of_files"]) == (
        1,
        2**50,
    )


def test_bin_arrays(summary):
    for row in summary.values():
        assert len(row["file_size_bins"]) == NUM_BINS
        assert sum(row["file_size_bins"]) == row["num_files"]
    # bin 0 (ub 1024) holds sizes < 1024; bin 1 (ub 2048) holds
    # 1024 <= size < 2048 — the exact-power key lands here
    a = summary["a"]["file_size_bins"]
    assert a[0] == 1 and a[1] == 1
    ab = summary["a/b"]["file_size_bins"]
    assert ab[0] == 0 and ab[1] == 1
    # 2^50 lands in the overflow (Long.MAX_VALUE) slot
    assert summary["c/d/e"]["file_size_bins"][NUM_BINS - 1] == 1
    assert LONG_MAX == 9223372036854775807


def test_child_dir_sets(summary):
    assert summary[""]["child_dirs"] == ["a", "c"]
    assert summary["a"]["child_dirs"] == ["a/b"]
    assert summary["a/b"]["child_dirs"] == []
    assert summary["c"]["child_dirs"] == ["c/d"]
    assert summary["c/d"]["child_dirs"] == ["c/d/e"]
    assert summary["c/d/e"]["child_dirs"] == []


def test_histogram_long_format_consistent_with_summary(spark, summary):
    """namespace_histogram (the oracle-checked long format) must agree
    with the per-dir bin arrays wherever a count is non-zero."""
    keys = spark.createDataFrame(
        KEYS, "volume string, bucket string, key string, data_size long"
    )
    long_rows = {
        (r["dir"], r["file_size"]): r["cnt"]
        for r in recon.namespace_histogram(keys).collect()
    }
    assert long_rows[("a", 2048)] == 1
    assert long_rows[("a", 1024)] == 1
    assert long_rows[("a/b", 2048)] == 1
    assert long_rows[("c/d/e", LONG_MAX)] == 1
    assert long_rows[("", 1024)] == 1
    assert sum(long_rows.values()) == len(KEYS)


def test_fso_du_subtree_totals(spark):
    from hadoop_ozone_spark.operators import fso

    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")],
        "object_id long, parent_object_id long, name string",
    )
    files = spark.createDataFrame(
        [(10, 1, "f1", 5), (11, 2, "f2", 7), (12, 3, "f3", 11)],
        "object_id long, parent_object_id long, name string, data_size long",
    )
    out = {r.path: (r.num_files, r.size_of_files)
           for r in fso.namespace_du_fso(dirs, files).collect()}
    assert out["a"] == (2, 12)      # own file + subtree b
    assert out["a/b"] == (1, 7)
    assert out["c"] == (1, 11)
