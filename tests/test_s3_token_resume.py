"""FIXTURES §10.2 golden scenario: S3 ListObjectsV2 ContinueToken resume
— concatenating token-resumed pages ≡ one full listing, with prefixes
and keys both counting toward max-keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import s3


@pytest.fixture(scope="module")
def bucket_keys(spark, sf_dir):
    return (
        model.om_keys(spark, sf_dir)
        .filter((F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f"))
        .cache()
    )


def _collect_names(df):
    return [(r["name"], r["entry_type"]) for r in df.collect()]


def test_token_resume_equals_full_listing(bucket_keys):
    full = _collect_names(
        s3.list_objects_v2(bucket_keys, prefix="dir2/", delimiter="/", max_keys=100000)
    )
    paged, token = [], None
    while True:
        page = _collect_names(
            s3.list_objects_v2(
                bucket_keys, prefix="dir2/", delimiter="/",
                start_after=token, max_keys=7,
            )
        )
        if not page:
            break
        paged.extend(page)
        token = page[-1][0]
    assert paged == full
    assert len(full) >= 5


def test_mixed_contents_and_prefixes_resume(spark):
    """Pages mixing Contents and CommonPrefixes must resume exactly —
    including a page that ends ON a CommonPrefix (the lastDir case)."""
    keys = spark.createDataFrame(
        [("a.txt", 1), ("b/x", 2), ("b/y", 3), ("c.txt", 4),
         ("d/z/deep", 5), ("e.txt", 6), ("f/1", 7)],
        "key string, data_size long",
    )
    full = _collect_names(s3.list_objects_v2(keys, prefix="", delimiter="/", max_keys=100))
    assert full == [
        ("a.txt", "KEY"), ("b/", "PREFIX"), ("c.txt", "KEY"),
        ("d/", "PREFIX"), ("e.txt", "KEY"), ("f/", "PREFIX"),
    ]
    for page_size in (1, 2, 3):
        paged, token = [], None
        while True:
            page = _collect_names(
                s3.list_objects_v2(keys, prefix="", delimiter="/",
                                   start_after=token, max_keys=page_size)
            )
            if not page:
                break
            paged.extend(page)
            token = page[-1][0]
        assert paged == full, f"page_size={page_size}"


def test_leaf_level_token_resume(bucket_keys):
    """At leaf level (no prefixes) resume must be exact, no dedup needed."""
    full = _collect_names(
        s3.list_objects_v2(bucket_keys, prefix="dir2/sub1/", delimiter="/", max_keys=100000)
    )
    paged, token = [], None
    while True:
        page = _collect_names(
            s3.list_objects_v2(
                bucket_keys, prefix="dir2/sub1/", delimiter="/",
                start_after=token, max_keys=5,
            )
        )
        if not page:
            break
        paged.extend(page)
        token = page[-1][0]
    assert paged == full
