"""Delegation-token + S3-secret decision transforms — the reusable
operator layer behind plans/security_queries.py's planes.

Reference laws (cites relative to /root/reference):

* renew ladder — ``ozone-manager/.../security/
  OzoneDelegationTokenSecretManager.java:285-327`` (order: maxDate
  expiry :296-301 → store miss / renewDate expiry, validateToken
  :417-429 → empty renewer :303-307 → renewer mismatch :308-312 →
  renewed, newRenewDate = min(maxDate, now + interval) :314).
* cancel ladder — ``:347-396`` (owner-or-nonempty-renewer auth
  :360-369 BEFORE the store-miss check :379-382).
* expiry sweep — ``:594-615`` (remove every renewDate < now row).

All three are single equi-joins / one map-side-combinable groupBy on
the token plane — the 100 TB shape is trivially safe (token_id is
unique, every dim broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def renew_decisions(
    store: DataFrame,
    requests: DataFrame,
    now_ms: int,
    renew_interval_ms: int,
    default_claimed_max_ms: int | None = None,
) -> DataFrame:
    """Apply the renewToken ladder to a batch of (token_id, caller)
    requests against the (token_id, owner, renewer, renew_ms, max_ms)
    store. Requests for unknown token_ids present a client-claimed
    maxDate (``default_claimed_max_ms``, default now + interval) so
    they reach the store-miss lane the way a forged identifier would."""
    claimed_default = (
        default_claimed_max_ms
        if default_claimed_max_ms is not None
        else now_ms + renew_interval_ms
    )
    j = requests.join(store, "token_id", "left")
    claimed_max = F.coalesce(F.col("max_ms"), F.lit(claimed_default))
    decision = (
        F.when(claimed_max < now_ms, F.lit("TOKEN_EXPIRED"))
        .when(F.col("owner").isNull(), F.lit("INVALID_NOT_FOUND"))
        .when(F.col("renew_ms") < now_ms, F.lit("INVALID_EXPIRED"))
        .when(F.col("renewer") == "", F.lit("ACCESS_DENIED_NO_RENEWER"))
        .when(
            F.col("renewer") != F.col("caller"),
            F.lit("ACCESS_DENIED_RENEWER_MISMATCH"),
        )
        .otherwise(F.lit("RENEWED"))
    )
    return j.select(
        "token_id",
        "caller",
        decision.alias("decision"),
        F.when(
            decision == "RENEWED",
            F.least(F.col("max_ms"), F.lit(now_ms + renew_interval_ms)),
        ).alias("new_renew_ms"),
    )


def cancel_decisions(store: DataFrame, requests: DataFrame) -> DataFrame:
    """Apply the cancelToken ladder: auth (caller is the claimed owner
    or the non-empty renewer) before the store-miss check, matching the
    reference's order. Unknown token_ids claim the caller as owner."""
    j = requests.join(store, "token_id", "left")
    owner_c = F.coalesce(F.col("owner"), F.col("caller"))
    renewer_c = F.coalesce(F.col("renewer"), F.lit(""))
    decision = (
        F.when(
            (F.col("caller") != owner_c)
            & ((renewer_c == "") | (F.col("caller") != renewer_c)),
            F.lit("ACCESS_DENIED"),
        )
        .when(F.col("owner").isNull(), F.lit("INVALID_NOT_FOUND"))
        .otherwise(F.lit("CANCELLED"))
    )
    return j.select("token_id", "caller", decision.alias("decision"))


def expiry_sweep(store: DataFrame, now_ms: int) -> DataFrame:
    """removeExpiredToken as a per-owner rollup: swept vs live counts
    and the earliest surviving renewal deadline."""
    swept = F.col("renew_ms") < now_ms
    return store.groupBy("owner").agg(
        F.sum(swept.cast("long")).alias("swept_cnt"),
        F.sum((~swept).cast("long")).alias("live_cnt"),
        F.min(F.when(~swept, F.col("renew_ms"))).alias("next_deadline_ms"),
    )
