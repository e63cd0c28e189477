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


def test_continue_token_roundtrip_and_tamper(spark):
    """X7 encode→decode round-trip recovers the key; a tampered payload
    or digest is rejected (ref ContinueToken.java:85-130: decode hex,
    recompute sha256, throw on mismatch)."""
    last = spark.createDataFrame([("dir1/sub2/f_42",)], "name string")
    tok = s3.continue_token(last)
    decoded = s3.decode_continue_token(tok).first()
    assert decoded["token_valid"] is True
    assert decoded["last_key"] == "dir1/sub2/f_42"
    # tamper with the hex payload (different key, original digest)
    tampered_payload = tok.withColumn(
        "token_payload", F.lower(F.hex(F.encode(F.lit("dir1/sub2/f_43"), "UTF-8")))
    )
    bad = s3.decode_continue_token(tampered_payload).first()
    assert bad["token_valid"] is False and bad["last_key"] is None
    # tamper with the digest (original payload, wrong digest)
    tampered_digest = tok.withColumn("token_digest", F.sha2(F.lit("evil"), 256))
    bad2 = s3.decode_continue_token(tampered_digest).first()
    assert bad2["token_valid"] is False and bad2["last_key"] is None


def test_list_uploads_marker_resume_equals_full(spark):
    """listMultipartUploads pagination: concatenating
    (key-marker, upload-id-marker)-resumed pages ≡ one full listing —
    including resume WITHIN a key that has multiple uploads."""
    rows = [
        ("a/k1", "u1", 1), ("a/k1", "u3", 2), ("a/k1", "u2", 3),
        ("a/k2", "u9", 4), ("b/k3", "u4", 5), ("b/k3", "u5", 6),
        ("c/k4", "u6", 7),
    ]
    uploads = spark.createDataFrame(rows, "key string, upload_id string, data_size long")
    full = [
        (r["key"], r["upload_id"])
        for r in s3.list_multipart_uploads(uploads, max_uploads=100).collect()
    ]
    assert full[:3] == [("a/k1", "u1"), ("a/k1", "u2"), ("a/k1", "u3")]
    for page_size in (1, 2, 3):
        paged, km, um = [], None, None
        while True:
            page = [
                (r["key"], r["upload_id"])
                for r in s3.list_multipart_uploads(
                    uploads, key_marker=km, upload_id_marker=um,
                    max_uploads=page_size,
                ).collect()
            ]
            if not page:
                break
            paged.extend(page)
            km, um = page[-1]
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


def test_v1_marker_pagination_equals_full_listing(spark):
    """V1 dialect resume law: walking the listing with marker =
    last-returned name, page by page, reproduces the one-shot listing
    exactly — including the seek-past-subtree rule when the marker is
    a CommonPrefix."""
    from hadoop_ozone_spark.operators import s3

    rows = [
        (f"dir1/sub{i}/k{j}", 10 + i * 10 + j)
        for i in range(4) for j in range(3)
    ] + [(f"dir1/leaf{i}", 100 + i) for i in range(4)]
    keys = spark.createDataFrame(rows, "key string, data_size long")
    full = [
        (r.name, r.entry_type)
        for r in s3.list_objects_v1(
            keys, prefix="dir1/", delimiter="/", max_keys=1000
        ).collect()
    ]
    paged, marker = [], None
    for _ in range(20):
        page = s3.list_objects_v1(
            keys, prefix="dir1/", delimiter="/", marker=marker, max_keys=3
        ).collect()
        if not page:
            break
        paged.extend((r.name, r.entry_type) for r in page)
        marker = page[-1].name
    assert paged == full and len(full) == 8  # 4 prefixes + 4 leaves


def test_v1_precedence_continuation_beats_marker(spark):
    """BucketEndpoint.java:139-148: a continuation token wins over
    start-after/marker when both are supplied."""
    from hadoop_ozone_spark.operators import s3

    keys = spark.createDataFrame(
        [(f"k{i}", i) for i in range(10)], "key string, data_size long"
    )
    got = [
        r.name
        for r in s3.list_objects_v1(
            keys, marker="k1", continuation_last_key="k7", max_keys=100
        ).collect()
    ]
    assert got == ["k8", "k9"]
