"""Native-authorizer chain: bit semantics, bypasses, prefix gate
(ref OzoneNativeAuthorizer.java:76-166, OzoneAclUtil.java:91-154,
PrefixManagerImpl.java:230-256)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import acl


def _keys(spark):
    rows = [
        ("vol_a", "bkt_f", "k1", "/vol_a/bkt_f/k1"),
        ("vol_a", "bkt_f", "k2", "/vol_a/bkt_f/k2"),
        ("vol_b", "bkt_f", "k3", "/vol_b/bkt_f/k3"),
    ]
    return spark.createDataFrame(rows, "volume string, bucket string, key string, row_key string")


def _acl(spark, rows, cols="row_key string, type string, name string, rights long, scope string"):
    return spark.createDataFrame(rows, cols)


def test_parent_right_mapping():
    # OzoneNativeAuthorizer.java:117-127
    assert acl.parent_acl_right(acl.ACL_CREATE) == acl.ACL_WRITE
    assert acl.parent_acl_right(acl.ACL_DELETE) == acl.ACL_WRITE
    assert acl.parent_acl_right(acl.ACL_WRITE_ACL) == acl.ACL_WRITE
    assert acl.parent_acl_right(acl.ACL_LIST) == acl.ACL_READ
    assert acl.parent_acl_right(acl.ACL_READ_ACL) == acl.ACL_READ
    assert acl.parent_acl_right(acl.ACL_READ) == acl.ACL_READ
    assert acl.parent_acl_right(acl.ACL_WRITE) == acl.ACL_WRITE


def _chain(spark, keys, key_acls, bucket_acls, volume_acls, prefix_acls, **kw):
    out = acl.effective_key_access(
        keys, key_acls, bucket_acls, volume_acls, prefix_acls,
        user="alice", groups=["eng"], right=acl.ACL_DELETE, **kw
    )
    return {r["row_key"]: (r["allowed"], r["deny_reason"]) for r in out.collect()}


def test_chain_and_reasons(spark):
    keys = _keys(spark)
    key_acls = _acl(spark, [
        ("/vol_a/bkt_f/k1", "USER", "alice", 1 << 4, "ACCESS"),   # DELETE
        ("/vol_a/bkt_f/k2", "WORLD", "", 1, "ACCESS"),            # READ only
        ("/vol_b/bkt_f/k3", "USER", "alice", 1 << 7, "ACCESS"),   # ALL
    ])
    bucket_acls = _acl(spark, [
        ("vol_a", "bkt_f", "GROUP", "eng", 1 << 1, "ACCESS"),     # WRITE
        ("vol_b", "bkt_f", "WORLD", "", 1 << 7, "ACCESS"),
    ], "volume string, bucket string, type string, name string, rights long, scope string")
    volume_acls = _acl(spark, [
        ("vol_a", "USER", "alice", 1 << 1, "ACCESS"),
        ("vol_b", "WORLD", "", 1 << 8, "ACCESS"),                 # NONE denies
    ], "volume string, type string, name string, rights long, scope string")
    prefix_acls = _acl(spark, [], "prefix string, type string, name string, rights long, scope string")
    got = _chain(spark, keys, key_acls, bucket_acls, volume_acls, prefix_acls)
    assert got["/vol_a/bkt_f/k1"] == (True, None)
    assert got["/vol_a/bkt_f/k2"] == (False, "key")      # READ doesn't grant DELETE
    assert got["/vol_b/bkt_f/k3"] == (False, "volume")   # NONE bit wins at volume


def test_prefix_exact_match_gate(spark):
    """PrefixManagerImpl.java:230-256: only a stored prefix EXACTLY
    equal to the object path gates it — and then its acls decide."""
    keys = _keys(spark)
    key_acls = _acl(spark, [
        ("/vol_a/bkt_f/k1", "USER", "alice", 1 << 4, "ACCESS"),
        ("/vol_a/bkt_f/k2", "USER", "alice", 1 << 4, "ACCESS"),
    ])
    allow_all = [("vol_a", "bkt_f", "WORLD", "", 1 << 7, "ACCESS")]
    bucket_acls = _acl(spark, allow_all,
        "volume string, bucket string, type string, name string, rights long, scope string")
    volume_acls = _acl(spark, [("vol_a", "WORLD", "", 1 << 7, "ACCESS")],
        "volume string, type string, name string, rights long, scope string")
    prefix_acls = _acl(spark, [
        ("/vol_a/bkt_f/k2", "USER", "alice", 1 << 8, "ACCESS"),   # NONE on exact path
        ("/vol_a/bkt_f/", "WORLD", "", 1 << 8, "ACCESS"),         # dir prefix: ignored
    ], "prefix string, type string, name string, rights long, scope string")
    got = _chain(spark, keys, key_acls, bucket_acls, volume_acls, prefix_acls)
    assert got["/vol_a/bkt_f/k1"] == (True, None)        # dir-style prefix doesn't gate
    assert got["/vol_a/bkt_f/k2"] == (False, "prefix")   # exact match + NONE denies


def test_admin_and_owner_bypass(spark):
    keys = _keys(spark)
    empty = _acl(spark, [])
    b = _acl(spark, [], "volume string, bucket string, type string, name string, rights long, scope string")
    v = _acl(spark, [], "volume string, type string, name string, rights long, scope string")
    p = _acl(spark, [], "prefix string, type string, name string, rights long, scope string")
    admin = _chain(spark, keys, empty, b, v, p, admin=True)
    assert all(a for a, _ in admin.values())
    owner = _chain(spark, keys, empty, b, v, p, owner_volumes=["vol_b"])
    assert owner["/vol_b/bkt_f/k3"] == (True, None)      # owner bypass
    assert owner["/vol_a/bkt_f/k1"][0] is False          # empty acls deny


def test_registered_query_reasons(spark, sf_dir):
    from hadoop_ozone_spark.plans import policy_queries
    rows = policy_queries.acl_effective_access(spark, sf_dir).collect()
    reasons = {(r["volume"], r["bucket"], r["allowed"], r["deny_reason"]) for r in rows}
    # alice owns data_size%3==0 keys; chain outcomes per fixture design
    assert ("vol_a", "bkt_f", True, None) in reasons
    assert ("vol_a", "bkt_o", False, "bucket") in reasons
    assert ("vol_n", "bkt_f", True, None) in reasons
    assert any(v == "vol_r" and r == "volume" for v, _, a, r in reasons if not a)
    assert any(r == "key" for _, _, a, r in reasons if not a)


def test_acl_mutation_laws(spark):
    """OzoneAclUtil add/remove/set laws on a crafted plane: bit-OR on
    match, append on miss, AND-NOT on remove with entry drop when the
    bitset empties, no-op removes, wholesale set replacement."""
    from hadoop_ozone_spark.operators import acl as acl_ops

    schema = "obj string, type string, name string, scope string, rights long"
    base = spark.createDataFrame(
        [
            ("o1", "USER", "alice", "ACCESS", 17),
            ("o1", "WORLD", "", "ACCESS", 1),
            ("o2", "USER", "bob", "ACCESS", 2),
        ],
        schema,
    )
    patch = spark.createDataFrame(
        [
            ("o1", "USER", "alice", "ACCESS", 16),   # subset: 17|16 = 17 (no change)
            ("o1", "GROUP", "eng", "ACCESS", 3),     # append
            ("o2", "USER", "bob", "ACCESS", 5),      # 2|5 = 7
        ],
        schema,
    )
    added = {
        (r.obj, r.type, r.name, r.rights)
        for r in acl_ops.add_acls(base, patch, ["obj"]).collect()
    }
    assert added == {
        ("o1", "USER", "alice", 17),
        ("o1", "WORLD", "", 1),
        ("o1", "GROUP", "eng", 3),
        ("o2", "USER", "bob", 7),
    }
    rm = spark.createDataFrame(
        [
            ("o1", "WORLD", "", "ACCESS", 1),      # empties -> dropped
            ("o1", "USER", "alice", "ACCESS", 16), # 17 & ~16 = 1
            ("o2", "USER", "carol", "ACCESS", 7),  # no match -> no-op
        ],
        schema,
    )
    removed = {
        (r.obj, r.type, r.name, r.rights)
        for r in acl_ops.remove_acls(base, rm, ["obj"]).collect()
    }
    assert removed == {("o1", "USER", "alice", 1), ("o2", "USER", "bob", 2)}
    setp = spark.createDataFrame(
        [("o1", "GROUP", "eng", "ACCESS", 128)], schema
    )
    after_set = {
        (r.obj, r.type, r.name, r.rights)
        for r in acl_ops.set_acls(base, setp, ["obj"]).collect()
    }
    assert after_set == {("o1", "GROUP", "eng", 128), ("o2", "USER", "bob", 2)}


def test_acl_mutation_randomized_python_replay(spark):
    """Randomized sweep: add_acls/remove_acls equal a pure-Python
    replay of OzoneAclUtil.addAcl/removeAcl over random planes and
    patches (random bitmasks, overlapping identities, multi-object)."""
    import random

    from hadoop_ozone_spark.operators import acl as acl_ops

    rng = random.Random(31)
    schema = "obj string, type string, name string, scope string, rights long"
    idents = [
        (o, t, nm, sc)
        for o in ("o1", "o2", "o3")
        for t, nm in (("USER", "u1"), ("USER", "u2"), ("GROUP", "g1"), ("WORLD", ""))
        for sc in ("ACCESS", "DEFAULT")
    ]
    for trial in range(3):
        base_rows = [
            (*i, rng.randint(1, 511))
            for i in rng.sample(idents, rng.randint(4, 12))
        ]
        patch_rows = [
            (*i, rng.randint(1, 511))
            for i in rng.sample(idents, rng.randint(4, 12))
        ]
        base_map = {r[:4]: r[4] for r in base_rows}
        patch_map = {r[:4]: r[4] for r in patch_rows}

        exp_add = dict(base_map)
        for k, bits in patch_map.items():
            exp_add[k] = exp_add.get(k, 0) | bits
        exp_rm = {}
        for k, bits in base_map.items():
            left = bits & ~patch_map.get(k, 0)
            if left:
                exp_rm[k] = left

        base = spark.createDataFrame(base_rows, schema)
        patch = spark.createDataFrame(patch_rows, schema)
        got_add = {
            (r.obj, r.type, r.name, r.scope): r.rights
            for r in acl_ops.add_acls(base, patch, ["obj"]).collect()
        }
        got_rm = {
            (r.obj, r.type, r.name, r.scope): r.rights
            for r in acl_ops.remove_acls(base, patch, ["obj"]).collect()
        }
        assert got_add == exp_add, f"trial {trial} add"
        assert got_rm == exp_rm, f"trial {trial} remove"


def test_acl_mutation_duplicate_patch_identities(spark):
    """N patch rows for one identity net to their bit-union (the
    reference applies ACLs one at a time) — never a fan-out into
    duplicate entries."""
    from hadoop_ozone_spark.operators import acl as acl_ops

    schema = "obj string, type string, name string, scope string, rights long"
    base = spark.createDataFrame([("o1", "USER", "u1", "ACCESS", 5)], schema)
    patch = spark.createDataFrame(
        [
            ("o1", "USER", "u1", "ACCESS", 2),
            ("o1", "USER", "u1", "ACCESS", 8),
            ("o2", "USER", "u2", "ACCESS", 1),
            ("o2", "USER", "u2", "ACCESS", 4),
        ],
        schema,
    )
    added = sorted(
        (r.obj, r.type, r.name, r.rights)
        for r in acl_ops.add_acls(base, patch, ["obj"]).collect()
    )
    assert added == [("o1", "USER", "u1", 15), ("o2", "USER", "u2", 5)]
    rm = spark.createDataFrame(
        [("o1", "USER", "u1", "ACCESS", 1), ("o1", "USER", "u1", "ACCESS", 4)],
        schema,
    )
    removed = [
        (r.obj, r.rights)
        for r in acl_ops.remove_acls(base, rm, ["obj"]).collect()
    ]
    # 5 & ~(1|4) = 0 -> the entry is dropped entirely
    assert removed == []
