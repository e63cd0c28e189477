"""Delegation-token lifecycle + S3 secret plane laws
(OzoneDelegationTokenSecretManager.java:285-327 renew ladder,
:347-396 cancel ladder, :594-615 expiry sweep;
S3SecretManagerImpl.java:60-84 / S3GetSecretRequest.java:73-81 /
S3RevokeSecretRequest.java:114-123).

The DuckDB oracle gate covers value equality; these tests pin the
*law* itself: a pure-Python replay of the renew ladder over the real
plane, renewal-cap invariants, cancel authorization, and the sweep's
partition property.
"""

from __future__ import annotations

from hadoop_ozone_spark.plans import security_queries as sq

SF = "/root/testdata/sf0.001"


def _now_ms():
    import datetime

    d = datetime.date.fromisoformat(sq.NOW_DAY) - datetime.date(1970, 1, 1)
    return d.days * sq.DAY_MS


def test_renew_ladder_pure_python_replay(spark):
    store = {r.token_id: r for r in sq.token_store(spark, SF).collect()}
    now = _now_ms()
    got = sq.tok_renew_decisions(spark, SF).collect()
    assert len(got) > len(store)  # phantoms present
    for row in got:
        s = store.get(row.token_id)
        claimed_max = s.max_ms if s else now + sq.DAY_MS
        if claimed_max < now:
            want = "TOKEN_EXPIRED"
        elif s is None:
            want = "INVALID_NOT_FOUND"
        elif s.renew_ms < now:
            want = "INVALID_EXPIRED"
        elif s.renewer == "":
            want = "ACCESS_DENIED_NO_RENEWER"
        elif s.renewer != row.caller:
            want = "ACCESS_DENIED_RENEWER_MISMATCH"
        else:
            want = "RENEWED"
        assert row.decision == want, (row, s)
        if want == "RENEWED":
            # :314 — the new renewDate never passes maxDate and never
            # moves backwards past the evaluation instant
            assert row.new_renew_ms == min(s.max_ms, now + sq.RENEW_INTERVAL_MS)
            assert row.new_renew_ms <= s.max_ms
            assert row.new_renew_ms >= now
        else:
            assert row.new_renew_ms is None


def test_every_renew_lane_populated(spark):
    lanes = {
        r.decision for r in sq.tok_renew_decisions(spark, SF).collect()
    }
    assert lanes == {
        "TOKEN_EXPIRED",
        "INVALID_NOT_FOUND",
        "INVALID_EXPIRED",
        "ACCESS_DENIED_NO_RENEWER",
        "ACCESS_DENIED_RENEWER_MISMATCH",
        "RENEWED",
    }


def test_cancel_authorization_law(spark):
    store = {r.token_id: r for r in sq.token_store(spark, SF).collect()}
    got = sq.tok_cancel_decisions(spark, SF).collect()
    lanes = set()
    for row in got:
        s = store.get(row.token_id)
        lanes.add(row.decision)
        if row.decision == "CANCELLED":
            # :360-369 — only the owner or the non-empty renewer cancels
            assert s is not None
            assert row.caller == s.owner or (
                s.renewer != "" and row.caller == s.renewer
            )
        elif row.decision == "INVALID_NOT_FOUND":
            assert s is None
        elif row.decision == "ACCESS_DENIED":
            assert s is not None
            assert row.caller != s.owner
            assert s.renewer == "" or row.caller != s.renewer
    assert lanes == {"CANCELLED", "ACCESS_DENIED", "INVALID_NOT_FOUND"}


def test_expiry_sweep_partitions_store(spark):
    # swept + live == per-owner store counts; the sweep predicate is
    # exactly renew_ms < now (:594-615)
    store = sq.token_store(spark, SF).collect()
    now = _now_ms()
    per_owner: dict[str, list[int]] = {}
    for r in store:
        c = per_owner.setdefault(r.owner, [0, 0, None])
        if r.renew_ms < now:
            c[0] += 1
        else:
            c[1] += 1
            c[2] = r.renew_ms if c[2] is None else min(c[2], r.renew_ms)
    got = {r.owner: r for r in sq.tok_expiry_sweep(spark, SF).collect()}
    assert set(got) == set(per_owner)
    for owner, (swept, live, deadline) in per_owner.items():
        assert got[owner].swept_cnt == swept
        assert got[owner].live_cnt == live
        assert got[owner].next_deadline_ms == deadline


def test_s3_secret_lifecycle(spark):
    rows = sq.s3_secret_plane(spark, SF).collect()
    by = {(r.kerberos_id, r.op): r for r in rows}
    ids = {r.kerberos_id for r in rows}
    assert len(ids) == 37 and len(rows) == 4 * 37
    for kid in ids:
        get_self = by[(kid, "GET_SELF")]
        get_admin = by[(kid, "GET_ADMIN")]
        get_other = by[(kid, "GET_OTHER")]
        revoke = by[(kid, "REVOKE")]
        # non-self non-admin caller is always denied (:73-81)
        assert get_other.status == "ACCESS_DENIED"
        assert get_other.aws_secret is None
        # get-or-create: self and admin see the same outcome + secret
        assert get_self.status in ("EXISTING", "CREATED")
        assert get_self.status == get_admin.status
        assert get_self.aws_secret == get_admin.aws_secret
        assert get_self.aws_secret is not None
        # revoke succeeds exactly when the secret pre-existed
        assert (revoke.status == "REVOKED") == (get_self.status == "EXISTING")
        assert (revoke.status == "S3_SECRET_NOT_FOUND") == (
            get_self.status == "CREATED"
        )
