"""M2/M3/M5 mutation-as-transform semantics (FIXTURES §10.7/10.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_ozone_spark.operators import mutations, s3


def test_rename_prefix(spark):
    keys = spark.createDataFrame(
        [("/v/b/src/a",), ("/v/b/src/b/c",), ("/v/b/other",)], "row_key string"
    )
    got = sorted(
        r["row_key"] for r in mutations.rename_prefix(keys, "/v/b/src/", "/v/b/dst/").collect()
    )
    assert got == ["/v/b/dst/a", "/v/b/dst/b/c", "/v/b/other"]


def test_delete_prefix(spark):
    keys = spark.createDataFrame([("/v/b/x/1",), ("/v/b/x/2",), ("/v/b/y",)], "row_key string")
    got = [r["row_key"] for r in mutations.delete_prefix(keys, "/v/b/x/").collect()]
    assert got == ["/v/b/y"]


def test_multipart_gap_detection(spark):
    """Gap sequences must fail completion
    (ref S3MultipartUploadCompleteRequest.java:399-450)."""
    parts = spark.createDataFrame(
        [("u1", 1, 10), ("u1", 2, 10), ("u1", 3, 10),
         ("u2", 1, 10), ("u2", 2, 10), ("u2", 4, 10),   # gap: 3 missing
         ("u3", 2, 10), ("u3", 3, 10)],                  # doesn't start at 1
        "upload_id string, part_number int, data_size long",
    )
    got = {r["upload_id"]: r["is_valid"] for r in mutations.multipart_complete_check(parts).collect()}
    assert got == {"u1": True, "u2": False, "u3": False}


def test_multi_delete_split(spark):
    keys = spark.createDataFrame([("/v/b/a",), ("/v/b/b",)], "row_key string")
    targets = spark.createDataFrame([("/v/b/b",), ("/v/b/missing",)], "row_key string")
    new_state, deleted, errors = s3.multi_delete(keys, targets)
    assert [r["row_key"] for r in new_state.collect()] == ["/v/b/a"]
    assert [r["row_key"] for r in deleted.collect()] == ["/v/b/b"]
    assert [r["row_key"] for r in errors.collect()] == ["/v/b/missing"]


def test_gc_expired_batch(spark):
    deleted = spark.createDataFrame(
        [(f"/v/b/k{i}", i * 1000) for i in range(10)], "row_key string, deletion_time long"
    )
    got = mutations.gc_expired(deleted, now_epoch_ms=10_000, ttl_ms=4000, batch=3).collect()
    # expired = deletion_time < 6000 → k0..k5; oldest-first batch of 3
    assert [r["row_key"] for r in got] == ["/v/b/k0", "/v/b/k1", "/v/b/k2"]


def test_trash_checkpoint_classification(spark):
    from hadoop_ozone_spark.operators import mutations

    trash = spark.createDataFrame(
        [
            ("v", "b", ".Trash/user_0/Current/dir/f1", 10),
            ("v", "b", ".Trash/user_0/Current/dir/f2", 20),
            ("v", "b", ".Trash/user_0/970101000000/dir/f3", 5),   # expired
            ("v", "b", ".Trash/user_1/980101000000/dir/f4", 7),   # retained
        ],
        "volume string, bucket string, key string, data_size long",
    )
    out = {
        (r.trash_user, r.checkpoint): r
        for r in mutations.trash_checkpoint_status(trash, "971203000000").collect()
    }
    cur = out[("user_0", "Current")]
    assert cur.action == "TO_CHECKPOINT" and cur.n_keys == 2 and cur.total_bytes == 30
    assert out[("user_0", "970101000000")].action == "DELETE"
    assert out[("user_1", "980101000000")].action == "RETAIN"


def test_upload_part_copy_range_clamp(spark):
    from hadoop_ozone_spark.operators import s3

    keys = spark.createDataFrame(
        [("/v/b/k1", 50), ("/v/b/k2", 500)], "row_key string, data_size long"
    )
    reqs = spark.createDataFrame(
        [
            ("u1", 1, "/v/b/k1", 10, 200),   # end overruns → clamp to 49
            ("u1", 2, "/v/b/k1", None, None),  # whole object
            ("u2", 1, "/v/b/k2", 0, 99),
        ],
        "upload_id string, part_number int, source_row_key string, "
        "range_start long, range_end long",
    )
    out = {(r.upload_id, r.part_number): r.data_size
           for r in s3.upload_part_copy(keys, reqs).collect()}
    assert out[("u1", 1)] == 40    # bytes 10..49 inclusive
    assert out[("u1", 2)] == 50
    assert out[("u2", 1)] == 100


def test_m9_volume_lifecycle_laws(spark):
    """Volume request ladder (OMVolumeCreateRequest.java:151-162,
    OMVolumeDeleteRequest.java:110-112, OMVolumeSetOwnerRequest.java:
    132-155) replayed in pure Python against the synthesized plane."""
    from hadoop_ozone_spark.plans import coverage_queries as cq

    sf = "/root/testdata/sf0.001"
    store = {r.volume: r for r in cq._m9_store(spark, sf).collect()}
    counts: dict = {}
    for r in store.values():
        counts[r.owner] = counts.get(r.owner, 0) + 1
    rows = cq.m9_volume_lifecycle(spark, sf).collect()
    lanes = set()
    for row in rows:
        uid = int(row.volume.split("_")[1])
        requester = f"user_{uid}"
        s = store.get(row.volume)
        if row.op == "CREATE":
            if s is not None:
                want = "VOLUME_ALREADY_EXISTS"
            elif counts.get(requester, 0) >= cq.M9_MAX_USER_VOLUME:
                want = "USER_TOO_MANY_VOLUMES"
            else:
                want = "CREATED"
        elif row.op == "DELETE":
            if s is None:
                want = "VOLUME_NOT_FOUND"
            elif s.non_empty:
                want = "VOLUME_NOT_EMPTY"
            else:
                want = "DELETED"
        else:
            if s is None:
                want = "VOLUME_NOT_FOUND"
            elif s.owner == row.new_owner:
                want = "OK_NOOP"
            elif counts.get(row.new_owner, 0) >= cq.M9_MAX_USER_VOLUME:
                want = "USER_TOO_MANY_VOLUMES"
            else:
                want = "TRANSFERRED"
        assert row.decision == want, (row, want)
        lanes.add((row.op, row.decision))
    # every ladder lane occurs in the plane
    assert {
        ("CREATE", "CREATED"),
        ("CREATE", "VOLUME_ALREADY_EXISTS"),
        ("CREATE", "USER_TOO_MANY_VOLUMES"),
        ("DELETE", "DELETED"),
        ("DELETE", "VOLUME_NOT_EMPTY"),
        ("DELETE", "VOLUME_NOT_FOUND"),
        ("SET_OWNER", "TRANSFERRED"),
        ("SET_OWNER", "OK_NOOP"),
        ("SET_OWNER", "VOLUME_NOT_FOUND"),
        ("SET_OWNER", "USER_TOO_MANY_VOLUMES"),
    } <= lanes

    # userTable rollup conserves volumes: Σ after == Σ before + ΣCREATED
    # − ΣDELETED (transfers conserve)
    lst = cq.m9_user_volume_list(spark, sf).collect()
    created = sum(1 for r in rows if r.decision == "CREATED")
    deleted = sum(1 for r in rows if r.decision == "DELETED")
    assert sum(r.after_cnt for r in lst) == (
        sum(r.before_cnt for r in lst) + created - deleted
    )


def test_m10_bucket_create_ladder(spark):
    """Bucket-create ladder (OMBucketCreateRequest.java:190-215,
    checkQuotaBytesValid :335-381, checkQuotaInNamespace :319-333)
    replayed in pure Python, including the bytes-before-namespace
    check order."""
    from hadoop_ozone_spark.plans import coverage_queries as cq

    sf = "/root/testdata/sf0.001"
    rows = cq.m10_bucket_create(spark, sf).collect()
    lanes = {r.decision for r in rows}
    assert lanes == {
        "VOLUME_NOT_FOUND", "BUCKET_ALREADY_EXISTS",
        "QUOTA_BYTES_INVALID", "QUOTA_EXCEEDED", "CREATED",
    }
    store = {r.volume: r for r in cq._m9_store(spark, sf).collect()}
    for r in rows:
        uid = int(r.volume.split("_")[1])
        if r.volume.endswith("_ghost"):
            assert r.decision == "VOLUME_NOT_FOUND"
            continue
        slot = int(r.volume.split("_")[2])
        assert r.volume in store
        n_b = (uid + slot) % 3 + 1
        quota_sum = 60 * sum(1 for b in range(n_b) if b % 2 == 1)
        quota_bytes = -1 if uid % 5 == 0 else 100
        quota_ns = [-1, 1, 5, 5][uid % 4]
        if r.bucket == "b_0":
            want = "BUCKET_ALREADY_EXISTS"
        elif r.req_qb > 0 and quota_bytes != -1 and quota_sum + r.req_qb > quota_bytes:
            want = "QUOTA_BYTES_INVALID"
        elif quota_ns > 0 and n_b + 1 > quota_ns:
            want = "QUOTA_EXCEEDED"
        else:
            want = "CREATED"
        assert r.decision == want, (r, want)


# --- M11/M12: ancestor walk + create ladders (round 7) ---------------------


def _walk_frames(spark):
    files = spark.createDataFrame(
        [("v", "b", "a/b/f"), ("v", "b", "t")], ["volume", "bucket", "key"]
    )
    dirs = spark.createDataFrame(
        [("v", "b", "a"), ("v", "b", "a/b"), ("v", "b", "x"), ("v", "b", "t")],
        ["volume", "bucket", "key"],
    )
    return files, dirs


def test_ancestor_walk_classification(spark):
    """The deepest entry wins; files win depth ties; missing parents are
    the strict ancestors between hit and leaf (OMFileRequest.java:80-149)."""
    from hadoop_ozone_spark.operators.mutations import ancestor_walk

    files, dirs = _walk_frames(spark)
    reqs = spark.createDataFrame(
        [
            ("r1", "v", "b", "a/b/f"),      # leaf file
            ("r2", "v", "b", "a/b/f/c"),    # file mid-chain
            ("r3", "v", "b", "a/b"),        # leaf dir
            ("r4", "v", "b", "a/b/c/d"),    # dir at depth 2, 1 missing
            ("r5", "v", "b", "z/y/w"),      # all fresh, 2 missing
            ("r6", "v", "b", "x"),          # top-level dir hit
            ("r7", "v", "b", "t"),          # file AND dir at leaf: file wins
            ("r8", "v2", "b", "a/b"),       # other volume: no hits
        ],
        ["req_id", "volume", "bucket", "path"],
    )
    got = {
        r.req_id: (r.hit_depth, r.hit_is_file, r.n_missing)
        for r in ancestor_walk(reqs, files, dirs).collect()
    }
    assert got == {
        "r1": (3, True, 0),
        "r2": (3, True, 0),
        "r3": (2, False, 0),
        "r4": (2, False, 1),
        "r5": (0, False, 2),
        "r6": (1, False, 0),
        "r7": (1, True, 0),
        "r8": (0, False, 1),
    }


def _kj(path):
    parts = path.split("/")
    k = int(parts[0][3:])
    j = int(parts[1][3:]) if len(parts) > 1 and parts[1].startswith("sub") else None
    return k, j


def test_m11_dir_create_lane_outcomes(spark, sf_dir):
    """Pure-Python replay of the mkdir ladder per lane
    (OMDirectoryCreateRequest.java:125-230, :261-275)."""
    from hadoop_ozone_spark.plans.coverage_queries import m11_dir_create

    rows = m11_dir_create(spark, sf_dir).collect()
    assert rows
    lanes = {r.lane for r in rows}
    assert lanes == {
        "self", "under_file", "top", "fresh", "ghost_vol", "ghost_bkt",
        "root", "deep",
    }
    for r in rows:
        if r.lane == "root":
            want, parents = "CANNOT_CREATE_DIRECTORY_AT_ROOT", 0
        elif r.lane == "ghost_vol":
            want, parents = "VOLUME_NOT_FOUND", 0
        elif r.lane == "ghost_bkt":
            want, parents = "BUCKET_NOT_FOUND", 0
        elif r.lane in ("self", "under_file"):
            want, parents = "FILE_ALREADY_EXISTS", 0
        elif r.lane == "deep":
            want, parents = "INVALID_KEY_NAME", 0  # 256 missing > 255
        elif r.lane == "top":
            k, _ = _kj(r.path)
            want = "DIRECTORY_ALREADY_EXISTS" if k % 2 == 0 else "CREATED"
            parents = 0
        else:  # fresh: dirK/subJ/nd_*
            k, j = _kj(r.path)
            want = "CREATED"
            parents = 0 if (k + j) % 3 == 0 else (1 if k % 2 == 0 else 2)
        assert (r.decision, r.created_parents) == (want, parents), r


def test_m12_file_create_lane_outcomes(spark, sf_dir):
    """Pure-Python replay of the createFile ladder with the
    overWrite/recursive flags (OMFileCreateRequest.java:214-218,
    :353-369, :378-388)."""
    from hadoop_ozone_spark.plans.coverage_queries import m12_file_create

    rows = m12_file_create(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        if r.lane == "empty":
            want, parents = "NOT_A_FILE", 0
        elif r.lane == "ghost_vol":
            want, parents = "VOLUME_NOT_FOUND", 0
        elif r.lane == "ghost_bkt":
            want, parents = "BUCKET_NOT_FOUND", 0
        elif r.lane == "self":
            want = "OVERWRITTEN" if r.overwrite else "FILE_ALREADY_EXISTS"
            parents = 0
        elif r.lane == "under_file":
            want, parents = "NOT_A_FILE", 0
        elif r.lane == "dir_target":
            k, _ = _kj(r.path)
            want = "NOT_A_FILE" if k % 2 == 0 else "CREATED"
            parents = 0
        else:  # fresh / fresh_deep under dirK/subJ
            k, j = _kj(r.path)
            missing = 0 if (k + j) % 3 == 0 else (1 if k % 2 == 0 else 2)
            if r.lane == "fresh_deep":
                missing += 1
            if missing == 0:
                want, parents = "CREATED", 0
            elif r.recursive:
                want, parents = "CREATED", missing
            else:
                want, parents = "DIRECTORY_NOT_FOUND", 0
        seen.add((r.lane, r.decision))
        assert (r.decision, r.created_parents) == (want, parents), r
    # the flag plane actually exercises both flag branches
    decisions = {d for _, d in seen}
    assert "DIRECTORY_NOT_FOUND" in decisions
    assert "CREATED" in decisions


def test_m13_bucket_set_property_replay(spark, sf_dir):
    """Pure-Python replay of the setBucketProperty ladder
    (OMBucketSetPropertyRequest.java:128-190, :247-297)."""
    from hadoop_ozone_spark.plans.coverage_queries import m13_bucket_set_property

    rows = m13_bucket_set_property(spark, sf_dir).collect()
    assert rows
    for r in rows:
        uid = int(r.volume.split("_")[1])
        slot = int(r.volume.split("_")[2])
        vol_qb = -1 if uid % 5 == 0 else 100
        n_b = (uid + slot) % 3 + 1
        others = 60 * sum(1 for b in range(n_b) if b % 2 == 1)
        req_qb = [-1, 0, 50, 200][uid % 4]
        req_qns = [-1, 0, 7][uid % 3]
        if r.bucket == "b_ghost":
            want = "BUCKET_NOT_FOUND"
        elif req_qb == -1 and vol_qb != -1:
            want = "QUOTA_ERROR"
        elif req_qb > 0 and vol_qb != -1 and others + req_qb > vol_qb:
            want = "QUOTA_BYTES_INVALID"
        else:
            want = "SET"
        assert r.decision == want, (r, want)
        if want == "SET":
            assert r.qb_after == (
                req_qb if (req_qb > 0 or (req_qb == -1 and vol_qb == -1)) else -1
            )
            assert r.qns_after == (req_qns if req_qns != 0 else -1)
            assert r.versioning_after == (uid % 2 == 0)
            assert r.storage_after == ("SSD" if uid % 3 == 0 else "DISK")
        else:
            assert (r.qb_after, r.qns_after, r.versioning_after,
                    r.storage_after) == (-1, -1, False, "DISK")
    decisions = {r.decision for r in rows}
    assert {"BUCKET_NOT_FOUND", "QUOTA_ERROR", "SET"} <= decisions


def test_m14_bulk_rename_lane_replay(spark, sf_dir):
    """Per-entry replay of the bulk-rename law, including the reference
    quirk that a to-exists entry is recorded un-renamed but still
    applied when the from key exists, and double-recorded when the from
    key is also missing (OMKeysRenameRequest.java — no `continue` after
    the to-exists branch)."""
    from hadoop_ozone_spark.plans.coverage_queries import m14_bulk_rename

    rows = m14_bulk_rename(spark, sf_dir).collect()
    assert rows
    want = {
        "plain": ("RENAMED", 0, True),
        "to_exists": ("UNRENAMED_BUT_APPLIED", 1, True),
        "from_missing": ("UNRENAMED_FROM_MISSING", 1, False),
        "empty": ("UNRENAMED_EMPTY", 1, False),
        "both": ("UNRENAMED_BOTH", 2, False),
    }
    for r in rows:
        assert (r.decision, r.unrenamed_entries, r.applied) == want[r.lane], r
    assert {r.lane for r in rows} == set(want)


def test_m15_bulk_delete_batches(spark, sf_dir):
    """The all-present batch reports OK and releases every sampled
    byte; the ghost-laced batch reports PARTIAL_DELETE with one
    undeleted row per sampled key (OMKeysDeleteRequest.java:54-104)."""
    from hadoop_ozone_spark.plans.coverage_queries import m15_bulk_delete

    rows = m15_bulk_delete(spark, sf_dir).collect()
    assert rows
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r)
    for r in by_batch["all_present"]:
        assert r.status == "OK" and r.n_undeleted == 0
        assert r.used_ns_delta == -r.n_deleted
    for r in by_batch["with_ghosts"]:
        assert r.status == "PARTIAL_DELETE"
        assert r.n_undeleted == r.n_deleted  # one ghost per sampled key
    ok = {(r.volume, r.bucket): r for r in by_batch["all_present"]}
    for r in by_batch["with_ghosts"]:
        twin = ok[(r.volume, r.bucket)]
        assert r.bytes_released == twin.bytes_released
