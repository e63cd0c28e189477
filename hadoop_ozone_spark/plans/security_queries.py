"""Security bookkeeping planes: delegation-token lifecycle and the S3
secret table — the last two OM column families without query coverage
(``dTokenTable`` / ``s3SecretTable``, OMDBDefinition.java:120-145).

Reference laws re-expressed (all file:line cites relative to
/root/reference):

* Token create: initial renewDate = issueDate + renewInterval
  (``ozone-manager/.../security/OzoneDelegationTokenSecretManager.java:196``);
  defaults renew-interval 24h / max-lifetime 7d (Hadoop delegation-token
  defaults, ``DelegationTokenManager``).
* Token renew ladder (``OzoneDelegationTokenSecretManager.java:285-327``):
  maxDate < now → TOKEN_EXPIRED (:296-301); store miss →
  INVALID_NOT_FOUND (validateToken :417-424); renewDate < now →
  INVALID_EXPIRED (:425-429); empty renewer → ACCESS_DENIED_NO_RENEWER
  (:303-307); renewer ≠ caller → ACCESS_DENIED_RENEWER_MISMATCH
  (:308-312); else renewed with newRenewDate = min(maxDate,
  now + renewInterval) (:314).
* Token cancel ladder (``OzoneDelegationTokenSecretManager.java:347-396``):
  caller must be the owner, or the (non-empty) renewer (:360-369,
  ACCESS_DENIED otherwise); then store miss → INVALID_NOT_FOUND
  (:379-382); else CANCELLED.  (The owner-null lane :356-358 cannot
  occur in this plane — every synthesized token carries an owner —
  and is documented rather than populated.)
* Expiry sweep (``OzoneDelegationTokenSecretManager.java:594-615``):
  every store row with renewDate < now is removed.
* S3 secret get = create-if-absent (``ozone-manager/.../om/
  S3SecretManagerImpl.java:60-84``); caller must equal the requested
  kerberosID unless an S3 admin (``.../request/s3/security/
  S3GetSecretRequest.java:73-81``); revoke deletes iff present else
  S3_SECRET_NOT_FOUND (``S3RevokeSecretRequest.java:114-123``).
  The reference's secret bytes are random (DigestUtils.sha256Hex of a
  fresh SHA digest, S3SecretManagerImpl.java:70-72); this plane uses a
  deterministic md5-of-id synthesis so the DuckDB oracle can replay the
  created secret byte-for-byte — the *lifecycle law* (create-if-absent /
  return-existing / revoke-if-present) is the reference behavior under
  test, not the RNG.

Scale shape: the token store and request planes are key-keyed
(token_id) derivations of ``orders``; every decision is one equi-join
on token_id (AQE-broadcastable at bench scale, plain hash join at
cluster scale — no window, no skew: token_id is unique per plane).
The S3 secret plane is 37 identities × 4 request lanes — a broadcast
dim by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import security

# Fixed evaluation instant (mid driver date range, orders span
# 1995-01-01..2001-08-01, so expired, stale and live tokens all exist
# at every sf): 1998-06-17 in epoch-day ms.  The reference defaults
# (renew-interval 24h, max-lifetime 7d) are config values; the plane
# scales them to the data's multi-year date span (180d / 900d) so every
# ladder lane is populated — the *formulas* (renew = issue + interval,
# max = issue + lifetime, renewals capped at max) are the laws under
# test, not the config constants.  Each token has already been renewed
# (token_id % 5) times, so store renewDates are staggered the way a
# live store's are.
NOW_DAY = "1998-06-17"
DAY_MS = 86_400_000
RENEW_INTERVAL_MS = 180 * DAY_MS
MAX_LIFETIME_MS = 900 * DAY_MS


def _day_ms(col):
    """Date → epoch ms via day arithmetic (timezone-free in both engines)."""
    return F.datediff(col, F.lit("1970-01-01")).cast("long") * DAY_MS


def _now_ms() -> int:
    import datetime

    d = datetime.date.fromisoformat(NOW_DAY) - datetime.date(1970, 1, 1)
    return d.days * DAY_MS


def token_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dTokenTable plane: ¼ of orders (o_orderkey % 4 == 1) become live
    identifiers.  renew_ms = issue + (1 + prior_renewals) * interval
    capped at max_ms (create law :196 composed with the :314 renewal
    cap, prior_renewals = token_id % 5); max_ms = issue + lifetime.
    o_orderkey % 5 == 0 rows carry an empty renewer (the
    ACCESS_DENIED_NO_RENEWER lane)."""
    o = model.load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 1)
    issue = _day_ms(F.col("o_orderdate"))
    max_ms = issue + F.lit(MAX_LIFETIME_MS)
    renewals = F.lit(1) + F.col("o_orderkey") % 5
    return o.select(
        F.col("o_orderkey").alias("token_id"),
        F.concat(F.lit("user_"), F.col("o_custkey") % 37).alias("owner"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("rn_"), F.col("o_orderkey") % 3)
        ).alias("renewer"),
        issue.alias("issue_ms"),
        F.least(max_ms, issue + renewals * F.lit(RENEW_INTERVAL_MS)).alias(
            "renew_ms"
        ),
        max_ms.alias("max_ms"),
    )


TOKEN_STORE_CTE = f"""
token_store AS (
  SELECT o_orderkey AS token_id,
         concat('user_', o_custkey % 37) AS owner,
         CASE WHEN o_orderkey % 5 = 0 THEN ''
              ELSE concat('rn_', o_orderkey % 3) END AS renewer,
         datediff('day', DATE '1970-01-01', o_orderdate) * {DAY_MS} AS issue_ms,
         least(
           datediff('day', DATE '1970-01-01', o_orderdate) * {DAY_MS}
             + {MAX_LIFETIME_MS},
           datediff('day', DATE '1970-01-01', o_orderdate) * {DAY_MS}
             + (1 + o_orderkey % 5) * {RENEW_INTERVAL_MS}::BIGINT) AS renew_ms,
         datediff('day', DATE '1970-01-01', o_orderdate) * {DAY_MS}
           + {MAX_LIFETIME_MS} AS max_ms
  FROM orders WHERE o_orderkey % 4 = 1
)"""

NOW_MS_SQL = f"datediff('day', DATE '1970-01-01', DATE '{NOW_DAY}') * {DAY_MS}"


def tok_renew_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renew-request plane → the :285-327 decision ladder.  One renew
    request per store token (caller = rn_{(token_id % 7) % 3}, so
    matching and mismatched renewers both occur) plus phantom requests
    (token_id + 10M for token_id % 40 == 1) that present a live claimed
    maxDate and land in the INVALID_NOT_FOUND lane."""
    store = token_store(spark, sf_dir)
    base = store.select(
        "token_id",
        F.concat(F.lit("rn_"), (F.col("token_id") % 7) % 3).alias("caller"),
    )
    phantom = store.filter(F.col("token_id") % 40 == 1).select(
        (F.col("token_id") + 10_000_000).alias("token_id"),
        F.lit("rn_0").alias("caller"),
    )
    req = base.unionByName(phantom)
    return security.renew_decisions(
        store, req, _now_ms(), RENEW_INTERVAL_MS,
        default_claimed_max_ms=_now_ms() + DAY_MS,
    ).orderBy("token_id", "caller")


TOK_RENEW_SQL = model.with_ctes(
    TOKEN_STORE_CTE,
    body=f""", requests AS (
  SELECT token_id, concat('rn_', (token_id % 7) % 3) AS caller FROM token_store
  UNION ALL
  SELECT token_id + 10000000, 'rn_0' FROM token_store WHERE token_id % 40 = 1
)
SELECT r.token_id, r.caller,
  CASE
    WHEN coalesce(s.max_ms, {NOW_MS_SQL} + {DAY_MS}) < {NOW_MS_SQL}
      THEN 'TOKEN_EXPIRED'
    WHEN s.owner IS NULL THEN 'INVALID_NOT_FOUND'
    WHEN s.renew_ms < {NOW_MS_SQL} THEN 'INVALID_EXPIRED'
    WHEN s.renewer = '' THEN 'ACCESS_DENIED_NO_RENEWER'
    WHEN s.renewer <> r.caller THEN 'ACCESS_DENIED_RENEWER_MISMATCH'
    ELSE 'RENEWED'
  END AS decision,
  CASE
    WHEN coalesce(s.max_ms, {NOW_MS_SQL} + {DAY_MS}) >= {NOW_MS_SQL}
         AND s.owner IS NOT NULL AND s.renew_ms >= {NOW_MS_SQL}
         AND s.renewer <> '' AND s.renewer = r.caller
      THEN least(s.max_ms, {NOW_MS_SQL} + {RENEW_INTERVAL_MS})
  END AS new_renew_ms
FROM requests r LEFT JOIN token_store s USING (token_id)
ORDER BY r.token_id, r.caller""",
)


def tok_cancel_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cancel-request plane → the :347-396 ladder.  Caller lanes per
    token: % 6 in (0,1) → the owner (always authorized), (2,3) → the
    stored renewer value (authorized iff non-empty), else a third party
    (ACCESS_DENIED).  Phantoms (token_id + 20M) present themselves as
    their own owner so the auth gate passes and the store miss surfaces
    as INVALID_NOT_FOUND — matching the reference's check order (auth
    at :360-369 runs before the store removal at :379-382)."""
    store = token_store(spark, sf_dir)
    lane = F.col("token_id") % 6
    base = store.select(
        "token_id",
        F.when(lane <= 1, F.col("owner"))
        .when(lane <= 3, F.col("renewer"))
        .otherwise(F.lit("intruder")).alias("caller"),
    )
    phantom = store.filter(F.col("token_id") % 40 == 21).select(
        (F.col("token_id") + 20_000_000).alias("token_id"),
        F.lit("self_owner").alias("caller"),
    )
    req = base.unionByName(phantom)
    return security.cancel_decisions(store, req).orderBy("token_id", "caller")


TOK_CANCEL_SQL = model.with_ctes(
    TOKEN_STORE_CTE,
    body=""", requests AS (
  SELECT token_id,
         CASE WHEN token_id % 6 <= 1 THEN owner
              WHEN token_id % 6 <= 3 THEN renewer
              ELSE 'intruder' END AS caller
  FROM token_store
  UNION ALL
  SELECT token_id + 20000000, 'self_owner' FROM token_store
  WHERE token_id % 40 = 21
)
SELECT r.token_id, r.caller,
  CASE
    WHEN r.caller <> coalesce(s.owner, r.caller)
         AND (coalesce(s.renewer, '') = ''
              OR r.caller <> coalesce(s.renewer, ''))
      THEN 'ACCESS_DENIED'
    WHEN s.owner IS NULL THEN 'INVALID_NOT_FOUND'
    ELSE 'CANCELLED'
  END AS decision
FROM requests r LEFT JOIN token_store s USING (token_id)
ORDER BY r.token_id, r.caller""",
)


def tok_expiry_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """removeExpiredToken (:594-615) as a per-owner rollup: how many of
    each owner's tokens the sweep removes (renew_ms < now) vs keeps,
    and the earliest surviving renewal deadline (the next sweep's
    candidate).  Map-side combinable groupBy on owner — no window."""
    store = token_store(spark, sf_dir)
    return security.expiry_sweep(store, _now_ms()).orderBy("owner")


TOK_SWEEP_SQL = model.with_ctes(
    TOKEN_STORE_CTE,
    body=f"""SELECT owner,
  CAST(SUM(CASE WHEN renew_ms < {NOW_MS_SQL} THEN 1 ELSE 0 END) AS BIGINT)
    AS swept_cnt,
  CAST(SUM(CASE WHEN renew_ms >= {NOW_MS_SQL} THEN 1 ELSE 0 END) AS BIGINT)
    AS live_cnt,
  MIN(CASE WHEN renew_ms >= {NOW_MS_SQL} THEN renew_ms END)
    AS next_deadline_ms
FROM token_store GROUP BY owner ORDER BY owner""",
)


def s3_secret_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s3SecretTable lifecycle: 37 kerberos identities (the audit/user
    universe), store pre-populated for uid % 3 != 0.  Four request
    lanes per identity: GET_SELF (create-if-absent law), GET_OTHER
    (non-admin, non-self → ACCESS_DENIED), GET_ADMIN (S3 admin may
    fetch any user's secret), REVOKE (delete-if-present).  Secrets are
    the deterministic md5 synthesis documented in the module header."""
    uids = (
        model.load(spark, sf_dir, "customer")
        .select((F.col("c_custkey") % 37).alias("uid"))
        .distinct()
    )
    users = uids.select(F.concat(F.lit("user_"), F.col("uid")).alias("kerberos_id"),
                        (F.col("uid") % 3 != 0).alias("in_store"))
    ops = spark.createDataFrame(
        [("GET_SELF",), ("GET_OTHER",), ("GET_ADMIN",), ("REVOKE",)], "op string"
    )
    req = users.crossJoin(F.broadcast(ops))
    secret = F.md5(F.concat(F.lit("s3secret:"), F.col("kerberos_id")))
    status = (
        F.when(F.col("op") == "GET_OTHER", F.lit("ACCESS_DENIED"))
        .when((F.col("op") == "REVOKE") & F.col("in_store"), F.lit("REVOKED"))
        .when(F.col("op") == "REVOKE", F.lit("S3_SECRET_NOT_FOUND"))
        .when(F.col("in_store"), F.lit("EXISTING"))
        .otherwise(F.lit("CREATED"))
    )
    return req.select(
        "kerberos_id",
        "op",
        status.alias("status"),
        F.when(status.isin("EXISTING", "CREATED"), secret).alias("aws_secret"),
    ).orderBy("kerberos_id", "op")


S3_SECRET_SQL = """
WITH users AS (
  SELECT DISTINCT concat('user_', c_custkey % 37) AS kerberos_id,
         (c_custkey % 37) % 3 <> 0 AS in_store
  FROM customer
), req AS (
  SELECT * FROM users
  CROSS JOIN (VALUES ('GET_SELF'), ('GET_OTHER'), ('GET_ADMIN'), ('REVOKE'))
    AS ops(op)
)
SELECT kerberos_id, op,
  CASE
    WHEN op = 'GET_OTHER' THEN 'ACCESS_DENIED'
    WHEN op = 'REVOKE' AND in_store THEN 'REVOKED'
    WHEN op = 'REVOKE' THEN 'S3_SECRET_NOT_FOUND'
    WHEN in_store THEN 'EXISTING'
    ELSE 'CREATED'
  END AS status,
  CASE
    WHEN op <> 'REVOKE' AND op <> 'GET_OTHER'
      THEN md5(concat('s3secret:', kerberos_id))
  END AS aws_secret
FROM req ORDER BY kerberos_id, op"""


QUERIES = {
    "tok_renew_decisions": tok_renew_decisions,
    "tok_cancel_decisions": tok_cancel_decisions,
    "tok_expiry_sweep": tok_expiry_sweep,
    "sec_s3_secret_plane": s3_secret_plane,
}

ORACLES = {
    "tok_renew_decisions": TOK_RENEW_SQL,
    "tok_cancel_decisions": TOK_CANCEL_SQL,
    "tok_expiry_sweep": TOK_SWEEP_SQL,
    "sec_s3_secret_plane": S3_SECRET_SQL,
}
