"""W1/W2/W3 listing semantics — the golden scenarios from FIXTURES.md §10:
pagination-resume ≡ full listing; delimiter grouping; fake-dir synthesis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import listing, s3


@pytest.fixture(scope="module")
def keys(spark, sf_dir):
    return model.om_keys(spark, sf_dir).cache()


def test_pagination_resume_equals_full_listing(keys):
    """Concatenating pages (token = last key of previous page) must equal
    the single full listing (ref OmMetadataManagerImpl seek-resume)."""
    full = [
        r["row_key"]
        for r in listing.list_keys(keys, volume="vol_r", bucket="bkt_o", max_keys=100_000).collect()
    ]
    paged, token = [], None
    while True:
        page = listing.list_keys(
            keys, volume="vol_r", bucket="bkt_o", start_key=token, max_keys=7
        ).collect()
        if not page:
            break
        paged.extend(r["row_key"] for r in page)
        token = page[-1]["row_key"]
    assert paged == full
    assert len(full) > 20


def test_list_keys_prefix_and_start_interplay(keys):
    """startKey exclusive + prefix filter (truth table :867-884)."""
    rows = listing.list_keys(
        keys,
        volume="vol_r",
        bucket="bkt_o",
        prefix="/vol_r/bkt_o/dir3/",
        start_key="/vol_r/bkt_o/dir3/sub1/",
        max_keys=50,
    ).collect()
    assert all(r["row_key"].startswith("/vol_r/bkt_o/dir3/") for r in rows)
    assert all(r["row_key"] > "/vol_r/bkt_o/dir3/sub1/" for r in rows)
    assert rows == sorted(rows, key=lambda r: r["row_key"])


def test_s3_delimiter_grouping(keys):
    """Contents vs CommonPrefixes split (ref BucketEndpoint.java:177-209)."""
    scoped = keys.filter((F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f"))
    top = s3.list_objects_v2(scoped, prefix="", delimiter="/", max_keys=1000).collect()
    assert all(r["entry_type"] == "PREFIX" for r in top)  # nothing at root level
    assert [r["name"] for r in top] == sorted(r["name"] for r in top)
    leaves = s3.list_objects_v2(scoped, prefix="dir1/sub2/", delimiter="/", max_keys=10).collect()
    assert all(r["entry_type"] == "KEY" for r in leaves)
    assert len(leaves) <= 10


def test_s3_max_keys_counts_both(keys):
    """Prefixes and keys both count toward max-keys (W2)."""
    scoped = keys.filter((F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f"))
    out = s3.list_objects_v2(scoped, prefix="dir1/", delimiter="/", max_keys=3).collect()
    assert len(out) == 3


def test_continue_token_shape(spark):
    df = spark.createDataFrame([("dir1/sub2/",)], "name string")
    row = s3.continue_token(df).first()
    assert row["token_payload"] == "dir1/sub2/".encode().hex()
    assert len(row["token_digest"]) == 64


def test_list_status_fake_dirs(keys):
    """Non-recursive listStatus collapses descendants into fake dirs
    (ref KeyManagerImpl.java:2357-2411)."""
    scoped = keys.filter((F.col("volume") == "vol_n") & (F.col("bucket") == "bkt_o")).select(
        "key", "data_size"
    )
    rows = listing.list_status(scoped, "dir4").collect()
    assert all(r["is_dir"] for r in rows)  # all children are subX dirs
    assert {r["name"] for r in rows} <= {f"dir4/sub{i}" for i in range(5)}
    total = sum(r["num_files"] for r in rows)
    direct = scoped.filter(F.col("key").startswith("dir4/")).count()
    assert total == direct


def test_fso_list_children_mixed_and_resume(spark):
    from hadoop_ozone_spark.operators import fso

    dirs = spark.createDataFrame(
        [(10, 1, "alpha"), (11, 1, "gamma"), (12, 2, "other")],
        "object_id long, parent_object_id long, name string",
    )
    files = spark.createDataFrame(
        [(100, 1, "beta.txt", 7), (101, 2, "x", 9)],
        "object_id long, parent_object_id long, name string, data_size long",
    )
    out = fso.list_children(dirs, files, parent_object_id=1).collect()
    assert [(r.name, r.is_dir, r.data_size) for r in out] == [
        ("alpha", True, 0), ("beta.txt", False, 7), ("gamma", True, 0),
    ]
    page2 = fso.list_children(dirs, files, 1, start_name="beta.txt").collect()
    assert [r.name for r in page2] == ["gamma"]
    assert fso.list_children(dirs, files, 1, limit=2).count() == 2


def test_sorted_read_locations_topology_order(spark):
    from hadoop_ozone_spark.operators import listing as listing_ops

    page = spark.createDataFrame(
        [("/v/b/k1", 10)], "row_key string, container_id long"
    )
    replicas = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (10, 99)],
        "container_id long, datanode_id long",
    )
    dns = spark.createDataFrame(
        [
            (1, "h1", "rack_a", "HEALTHY", "IN_SERVICE", 1),
            (2, "h2", "rack_a", "HEALTHY", "IN_SERVICE", 1),
            (3, "h3", "rack_b", "HEALTHY", "IN_SERVICE", 1),
            # 99 unregistered
        ],
        "datanode_id long, hostname string, rack string, node_state string, "
        "op_state string, capacity_bytes long",
    )
    out = listing_ops.sorted_read_locations(page, replicas, dns, client_datanode_id=1).collect()
    # same node (0) < same rack (2) < other rack (4) < unregistered (MAX)
    assert [(r.datanode_id, r.distance_cost) for r in out] == [
        (1, 0), (2, 2), (3, 4), (99, 2147483647),
    ]
    assert [r.read_rank for r in out] == [1, 2, 3, 4]
    assert out[3].hostname == "UNKNOWN"


def test_fso_rename_dir_moves_subtree_with_one_row(spark):
    from hadoop_ozone_spark.operators import fso

    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "sub")],
        "object_id long, parent_object_id long, name string",
    )
    moved = fso.rename_dir(dirs, object_id=3, new_parent_object_id=2, new_name="m")
    paths = {r.object_id: r.path for r in fso.materialize_paths(moved).collect()}
    assert paths[3] == "b/m"          # subtree re-roots via one row
    assert paths[1] == "a" and paths[2] == "b"  # everything else untouched
    files = spark.createDataFrame(
        [(9, 3, "f.txt", 1)],
        "object_id long, parent_object_id long, name string, data_size long",
    )
    resolved = fso.resolve_files(files, fso.materialize_paths(moved)).collect()
    assert resolved[0].path == "b/m/f.txt"


def test_get_file_status_classification(spark):
    from hadoop_ozone_spark.operators import listing as listing_ops

    keys = spark.createDataFrame(
        [("/v/b/d/f1", 10), ("/v/b/d/sub/f2", 20), ("/v/b/top", 5)],
        "row_key string, data_size long",
    )
    probes = spark.createDataFrame(
        [("/v/b/d",), ("/v/b/top",), ("/v/b/nope",), ("/v/b/d/sub",)],
        "probe_path string",
    )
    out = {r.probe_path: (r.status, r.data_size)
           for r in listing_ops.get_file_status(keys, probes).collect()}
    assert out["/v/b/d"] == ("DIRECTORY", None)
    assert out["/v/b/d/sub"] == ("DIRECTORY", None)
    assert out["/v/b/top"] == ("FILE", 5)
    assert out["/v/b/nope"] == ("NOT_FOUND", None)


def test_fso_rename_rejects_cycles_and_name_clash(spark):
    import pytest as _pytest
    from hadoop_ozone_spark.operators import fso

    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")],
        "object_id long, parent_object_id long, name string",
    )
    with _pytest.raises(ValueError, match="inside the moved subtree"):
        fso.rename_dir(dirs, object_id=1, new_parent_object_id=2, new_name="x")
    with _pytest.raises(ValueError, match="already exists"):
        fso.rename_dir(dirs, object_id=3, new_parent_object_id=1, new_name="b")
    # a legal move still works (and validate=False skips the checks)
    assert fso.rename_dir(dirs, 3, 1, "d").count() == 3
    assert fso.rename_dir(dirs, 1, 2, "x", validate=False).count() == 3


def test_fso_rename_clash_includes_file_plane(spark):
    import pytest as _pytest
    from hadoop_ozone_spark.operators import fso

    dirs = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b")],
        "object_id long, parent_object_id long, name string",
    )
    files = spark.createDataFrame(
        [(9, 1, "taken", 5)],
        "object_id long, parent_object_id long, name string, data_size long",
    )
    # FSO files share the parentId/name keyspace with dirs
    # (OMDBDefinition.java:147-172) — a rename landing on an existing
    # FILE name must be rejected like a dir clash
    with _pytest.raises(ValueError, match="already exists"):
        fso.rename_dir(dirs, 2, 1, "taken", files=files)
    # same name under a different parent is fine
    assert fso.rename_dir(dirs, 2, 0, "taken", files=files).count() == 2


def test_fso_rename_cycle_check_is_distributed(spark):
    """The ancestor walk must reject cycles WITHOUT collecting the dir
    plane: validate against a wide namespace (100k sibling dirs) where
    a full-plane collect would be the old driver-memory bottleneck —
    only the O(depth) chain of the destination parent is touched."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from hadoop_ozone_spark.operators import fso

    # a 30-deep chain (ids 1..30, parent = id-1) under 100k siblings
    chain = spark.range(1, 31).select(
        F.col("id").alias("object_id"),
        (F.col("id") - 1).alias("parent_object_id"),
        F.concat(F.lit("c"), F.col("id")).alias("name"),
    )
    wide = spark.range(1000, 101000).select(
        F.col("id").alias("object_id"),
        F.lit(0).alias("parent_object_id"),
        F.concat(F.lit("w"), F.col("id")).alias("name"),
    )
    dirs = chain.unionByName(wide)
    # moving the chain head under its own deep descendant is a cycle
    with _pytest.raises(ValueError, match="inside the moved subtree"):
        fso.rename_dir(dirs, object_id=5, new_parent_object_id=30, new_name="x")
    # moving a leaf of the chain under root is legal
    assert fso.rename_dir(dirs, 30, 0, "legal").count() == dirs.count()
    # unknown destination parent is rejected
    with _pytest.raises(ValueError, match="unknown parent"):
        fso.rename_dir(dirs, 30, 999999, "x")


def test_bucket_link_resolution(spark):
    """OzoneManager.resolveBucketLink parity: chains follow to the
    non-link source; loops are flagged (DETECTED_LOOP_IN_BUCKET_LINKS);
    non-links resolve to themselves."""
    from hadoop_ozone_spark.operators import listing as listing_ops

    buckets = spark.createDataFrame(
        [
            # chain: v/l1 -> v/l2 -> v/real
            ("v", "l1", "v", "l2"),
            ("v", "l2", "v", "real"),
            ("v", "real", None, None),
            # loop: v/a -> v/b -> v/a
            ("v", "a", "v", "b"),
            ("v", "b", "v", "a"),
            # cross-volume single hop
            ("w", "alias", "v", "real"),
        ],
        "volume string, bucket string, source_volume string, source_bucket string",
    )
    out = {
        (r.volume, r.bucket): r
        for r in listing_ops.resolve_bucket_links(buckets).collect()
    }
    assert (out[("v", "l1")].resolved_volume, out[("v", "l1")].resolved_bucket) == ("v", "real")
    assert out[("v", "l1")].depth == 2 and not out[("v", "l1")].is_loop
    assert (out[("v", "l2")].resolved_bucket, out[("v", "l2")].depth) == ("real", 1)
    assert (out[("w", "alias")].resolved_volume, out[("w", "alias")].depth) == ("v", 1)
    # non-link resolves to itself at depth 0
    assert out[("v", "real")].resolved_bucket == "real"
    assert out[("v", "real")].depth == 0 and not out[("v", "real")].is_loop
    # the loop pair is flagged, never "resolved"
    assert out[("v", "a")].is_loop and out[("v", "b")].is_loop


def test_bucket_link_resolution_random_graph_equivalence(spark):
    """Random link graphs: the fixpoint resolver must agree with a
    direct Python implementation of the reference's visited-set walk
    (resolve to the first non-link; any revisit ⇒ loop)."""
    import random

    from hadoop_ozone_spark.operators import listing as listing_ops

    rng = random.Random(11)
    names = [f"b{i}" for i in range(60)]
    rows = []
    link_of = {}
    for n in names:
        if rng.random() < 0.5:
            tgt = rng.choice(names)  # may self-link or form cycles
            rows.append(("v", n, "v", tgt))
            link_of[n] = tgt
        else:
            rows.append(("v", n, None, None))
    buckets = spark.createDataFrame(
        rows,
        "volume string, bucket string, source_volume string, source_bucket string",
    )

    def walk(start):
        seen, cur = set(), start
        while cur in link_of:
            if cur in seen:
                return None  # loop
            seen.add(cur)
            cur = link_of[cur]
        return cur

    got = {
        r.bucket: (None if r.is_loop else r.resolved_bucket)
        for r in listing_ops.resolve_bucket_links(buckets).collect()
    }
    for n in names:
        assert got[n] == walk(n), f"bucket {n}"
