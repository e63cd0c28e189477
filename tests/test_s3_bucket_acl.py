"""S3 bucket ACL surface laws — BucketEndpoint.getAcl/putAcl
(BucketEndpoint.java:383-500) and the S3↔native grant translation
(S3Acl.java:175-345)."""

from __future__ import annotations

from hadoop_ozone_spark.operators import s3


def _acls(spark, rows):
    return spark.createDataFrame(
        rows,
        "volume string, bucket string, type string, name string, "
        "rights long, scope string",
    )


def _grants(spark, rows):
    return spark.createDataFrame(rows, "grantee_id string, permission string")


def test_get_if_ladder_priority(spark):
    # ALL beats WRITE_ACL beats READ_ACL beats WRITE-triple beats
    # READ-pair — one grant per native row, by the reference's order
    rows = [
        ("v", "b", "USER", "u_all", 128 + 64, "ACCESS"),
        ("v", "b", "USER", "u_wacp", 64 + 32, "ACCESS"),
        ("v", "b", "USER", "u_racp", 32 + 1, "ACCESS"),
        ("v", "b", "USER", "u_write", 2 + 4 + 16, "ACCESS"),
        ("v", "b", "USER", "u_read", 1 + 8, "ACCESS"),
    ]
    got = {
        (r.grantee_id, r.permission)
        for r in s3.bucket_acl_grants(_acls(spark, rows)).collect()
    }
    assert got == {
        ("u_all", "FULL_CONTROL"), ("u_wacp", "WRITE_ACP"),
        ("u_racp", "READ_ACP"), ("u_write", "WRITE"), ("u_read", "READ"),
    }


def test_get_drops_non_user_unmappable_and_dedups_scopes(spark):
    rows = [
        ("v", "b", "GROUP", "eng", 128, "ACCESS"),    # not CanonicalUser
        ("v", "b", "WORLD", "", 128, "ACCESS"),       # not CanonicalUser
        ("v", "b", "USER", "u_ro", 1, "ACCESS"),      # READ w/o LIST: no map
        ("v", "b", "USER", "u_w", 2, "ACCESS"),       # WRITE w/o triple
        ("v", "b", "USER", "own", 128, "ACCESS"),
        ("v", "b", "USER", "own", 128, "DEFAULT"),    # scope dup collapses
    ]
    got = s3.bucket_acl_grants(_acls(spark, rows)).collect()
    assert [(r.grantee_id, r.permission) for r in got] == [
        ("own", "FULL_CONTROL")
    ]
    assert got[0].grantee_type == "CanonicalUser"
    assert got[0].owner_id == "owner-v"


def test_put_replaces_target_bucket_only(spark):
    base = [
        ("v", "b", "USER", "old", 128, "ACCESS"),
        ("v", "b", "USER", "old", 128, "DEFAULT"),
        ("v", "b2", "USER", "keep", 128, "ACCESS"),
    ]
    new = s3.put_bucket_acl(
        _acls(spark, base),
        _grants(spark, [("alice", "READ"), ("bob", "FULL_CONTROL")]),
        "v", "b",
    ).collect()
    target = sorted(
        (r.name, r.rights, r.scope) for r in new if r.bucket == "b"
    )
    # each grant expands to an ACCESS+DEFAULT pair; old rows are gone
    assert target == [
        ("alice", 9, "ACCESS"), ("alice", 9, "DEFAULT"),
        ("bob", 128, "ACCESS"), ("bob", 128, "DEFAULT"),
    ]
    other = [(r.name, r.rights) for r in new if r.bucket == "b2"]
    assert other == [("keep", 128)]


def test_put_then_get_round_trips(spark):
    base = [("v", "b", "USER", "old", 1 + 8, "ACCESS")]
    grants = [("alice", "WRITE"), ("carol", "READ_ACP")]
    new = s3.put_bucket_acl(_acls(spark, base), _grants(spark, grants), "v", "b")
    got = {
        (r.grantee_id, r.permission)
        for r in s3.bucket_acl_grants(new).collect()
    }
    assert got == set(grants)


def test_volume_rights_least_privilege(spark):
    # S3Acl.getOzoneAclOnVolumeFromS3Permission: the volume side never
    # receives WRITE-class data rights below FULL_CONTROL
    df = spark.createDataFrame(
        [("FULL_CONTROL",), ("WRITE_ACP",), ("READ_ACP",), ("WRITE",),
         ("READ",)],
        "p string",
    ).select(
        "p", s3.s3_permission_to_volume_rights(
            __import__("pyspark.sql.functions", fromlist=["col"]).col("p")
        ).alias("r")
    )
    got = {r.p: r.r for r in df.collect()}
    assert got == {
        "FULL_CONTROL": 1 + 2 + 32 + 64,
        "WRITE_ACP": 1 + 32 + 64,
        "READ_ACP": 1 + 32,
        "WRITE": 1 + 2,
        "READ": 1,
    }
