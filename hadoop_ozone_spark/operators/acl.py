"""Longest-prefix ACL matching — the reference's in-memory RadixTree
(PrefixManagerImpl.java:50-59,259-280) re-expressed relationally.

The prefix table is tiny (ACL'd prefixes) next to the key table, so:
broadcast the prefixes, theta-join on ``startswith``, keep the longest
match per key via ``max_by``. One broadcast, one map-side-combinable
aggregation — no shuffle of the key table beyond the final groupBy,
which AQE coalesces. (A RadixTree is the single-node answer; the
broadcast theta-join is the 1000-executor one.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def longest_prefix_acl(
    keys: DataFrame,
    prefixes: DataFrame,
    key_col: str = "key",
    prefix_col: str = "prefix",
) -> DataFrame:
    """For each key: the longest ACL prefix that covers it (or none).

    prefixes: (prefix, acl). Returns (key_col, matched_prefix, acl).
    """
    joined = keys.join(
        F.broadcast(prefixes),
        F.col(key_col).startswith(F.col(prefix_col)),
        "left",
    )
    return (
        joined.groupBy(key_col)
        .agg(
            F.max_by(prefix_col, F.length(prefix_col)).alias("matched_prefix"),
            F.max_by("acl", F.length(prefix_col)).alias("acl"),
        )
    )


# ---------------------------------------------------------------------------
# Native authorizer: effective-permission resolution
#
# Reference semantics, mirrored exactly:
# - ACLType ordinals (IAccessAuthorizer.java:48-57):
#   READ=0 WRITE=1 CREATE=2 LIST=3 DELETE=4 READ_ACL=5 WRITE_ACL=6
#   ALL=7 NONE=8
# - bit check (OzoneAclUtil.java:145-154): a right r is granted by a
#   rights bitset iff (bit r set OR bit ALL set) AND bit NONE not set.
# - principal match (OzoneAclUtil.java:91-112): USER matches by name,
#   GROUP by membership, anything else (WORLD/ANONYMOUS) matches all.
# - object allow (OzoneAclUtil.java:126-137): OR over the object's acl
#   rows; an empty acl list denies.
# - parent-right refinement (OzoneNativeAuthorizer.java:104-127):
#   CREATE/DELETE/WRITE_ACL check WRITE on parents; LIST/READ_ACL check
#   READ; READ/WRITE check themselves.
# - KEY decision chain (OzoneNativeAuthorizer.java:153-166): admin
#   bypass, volume-owner bypass, then
#   keyAcls(right) AND prefixAcls(parent) AND bucketAcls(parent) AND
#   volumeAcls(parent).
# - prefix gate (PrefixManagerImpl.java:230-256): only an acl'd prefix
#   EXACTLY equal to the object path gates it; otherwise the prefix
#   level passes.
# ---------------------------------------------------------------------------

ACL_READ, ACL_WRITE, ACL_CREATE, ACL_LIST, ACL_DELETE = 0, 1, 2, 3, 4
ACL_READ_ACL, ACL_WRITE_ACL, ACL_ALL, ACL_NONE = 5, 6, 7, 8


def parent_acl_right(right: int) -> int:
    """OzoneNativeAuthorizer.java:117-127 refinement table."""
    if right in (ACL_CREATE, ACL_DELETE, ACL_WRITE_ACL):
        return ACL_WRITE
    if right in (ACL_LIST, ACL_READ_ACL):
        return ACL_READ
    return right


def bit_allows(rights, right: int):
    """(bit r OR bit ALL) AND NOT bit NONE — OzoneAclUtil.java:145-154."""
    r = F.col(rights) if isinstance(rights, str) else rights
    return (
        (F.shiftright(r, right).bitwiseAND(F.lit(1)) == 1)
        | (F.shiftright(r, ACL_ALL).bitwiseAND(F.lit(1)) == 1)
    ) & (F.shiftright(r, ACL_NONE).bitwiseAND(F.lit(1)) == 0)


def principal_matches(user: str, groups: list[str]):
    """OzoneAclUtil.java:91-112: USER by name, GROUP by membership,
    default (WORLD etc.) matches everyone."""
    return (
        ((F.col("type") == "USER") & (F.col("name") == user))
        | ((F.col("type") == "GROUP") & F.col("name").isin(groups))
        | (~F.col("type").isin("USER", "GROUP"))
    )


def acl_allows(
    acls: DataFrame, obj_cols: list[str], user: str, groups: list[str], right: int
) -> DataFrame:
    """Per object: OR over its acl rows of (principal match AND bit
    grant) — (obj_cols..., allowed). Objects absent from ``acls`` are
    absent here too; the caller's left join + coalesce(False) mirrors
    'empty acl list denies'."""
    grant = (principal_matches(user, groups) & bit_allows("rights", right)).cast("int")
    return (
        acls.groupBy(*obj_cols)
        .agg(F.max(grant).alias("_g"))
        .select(*obj_cols, (F.col("_g") == 1).alias("allowed"))
    )


def effective_key_access(
    keys: DataFrame,
    key_acls: DataFrame,
    bucket_acls: DataFrame,
    volume_acls: DataFrame,
    prefix_acls: DataFrame,
    user: str,
    groups: list[str],
    right: int,
    admin: bool = False,
    owner_volumes: list[str] | None = None,
) -> DataFrame:
    """keys + (allowed, deny_reason) for one principal and one ACLType,
    the full OzoneNativeAuthorizer KEY chain as ONE declarative plan.

    Shape: the volume/bucket allow tables aggregate to a handful of
    rows → broadcast joins; key_acls is keyed by row_key → one keyed
    shuffle (groupBy) + one equi-join with the key table, both on the
    same key → AQE reuses the partitioning. Nothing driver-side.

    deny_reason is the FIRST failing level in the reference's
    evaluation order (key → prefix → bucket → volume), NULL when
    allowed. ``admin`` and ``owner_volumes`` mirror the two bypasses
    (OzoneNativeAuthorizer.java:92-95,155-158).
    """
    if admin:
        return keys.select(
            "*", F.lit(True).alias("allowed"),
            F.lit(None).cast("string").alias("deny_reason"),
        )
    parent = parent_acl_right(right)
    k_allow = acl_allows(key_acls, ["row_key"], user, groups, right)
    b_allow = acl_allows(bucket_acls, ["volume", "bucket"], user, groups, parent)
    v_allow = acl_allows(volume_acls, ["volume"], user, groups, parent)
    p_allow = acl_allows(prefix_acls, ["prefix"], user, groups, parent).select(
        F.col("prefix").alias("row_key"), F.col("allowed").alias("_p_ok")
    )
    out = (
        keys.join(
            k_allow.withColumnRenamed("allowed", "_k_ok"), "row_key", "left"
        )
        .join(F.broadcast(p_allow), "row_key", "left")
        .join(
            F.broadcast(b_allow.withColumnRenamed("allowed", "_b_ok")),
            ["volume", "bucket"],
            "left",
        )
        .join(
            F.broadcast(v_allow.withColumnRenamed("allowed", "_v_ok")),
            "volume",
            "left",
        )
    )
    is_owner = (
        F.col("volume").isin(owner_volumes) if owner_volumes else F.lit(False)
    )
    k_ok = F.coalesce(F.col("_k_ok"), F.lit(False))
    p_ok = F.coalesce(F.col("_p_ok"), F.lit(True))  # no exact-path prefix → pass
    b_ok = F.coalesce(F.col("_b_ok"), F.lit(False))
    v_ok = F.coalesce(F.col("_v_ok"), F.lit(False))
    allowed = is_owner | (k_ok & p_ok & b_ok & v_ok)
    deny = (
        F.when(allowed, F.lit(None).cast("string"))
        .when(~k_ok, F.lit("key"))
        .when(~p_ok, F.lit("prefix"))
        .when(~b_ok, F.lit("bucket"))
        .otherwise(F.lit("volume"))
    )
    return out.select(
        *[c for c in keys.columns],
        allowed.alias("allowed"),
        deny.alias("deny_reason"),
    )


# ---------------------------------------------------------------------------
# ACL mutation plane: addAcl / removeAcl / setAcl as dataset transforms
# (OzoneAclUtil.java:215-236 addAcl, :244-269 removeAcl, :276-287
# setAcl — the law behind `ozone sh volume|bucket|key|prefix
# addacl/removeacl/setacl` and every OM Add/Remove/SetAcl request).
#
# Identity law: entries match on (object, type, name, scope).
#   add    → matched entries OR the rights bitsets; unmatched patch
#            rows append.
#   remove → matched entries AND-NOT the patch bits; entries whose
#            bitset empties are dropped (the reference's isEmpty()
#            removal); unmatched patch rows are no-ops.
#   set    → the target objects' entry lists are replaced wholesale.
#
# Scale shape: each transform is ONE equi-join keyed by the identity
# columns — the patch side is an admin command batch (broadcast) in
# the CLI case, or an arbitrary derived frame (shuffle join, AQE
# skew-safe) for fleet-wide policy rollouts. No windows, no driver
# loops.
# ---------------------------------------------------------------------------


def _normalize_patch(patch: DataFrame, keys: list[str]) -> DataFrame:
    """Collapse duplicate patch identities to their bit-union — the
    reference applies ACLs one at a time, so N patch rows for one
    (obj, type, name, scope) net to OR-ing all their bits (for add)
    and removing all their bits (for remove). Without this, the merge
    joins would FAN OUT duplicated identities into duplicate entries."""
    return patch.groupBy(*keys).agg(F.bit_or("rights").alias("rights"))


def add_acls(acls: DataFrame, patch: DataFrame, obj_cols: list[str]) -> DataFrame:
    """OzoneAclUtil.addAcl over a whole ACL plane: OR the rights of
    matching (obj, type, name, scope) entries, append the rest."""
    keys = [*obj_cols, "type", "name", "scope"]
    patch = _normalize_patch(patch, keys)
    merged = acls.alias("a").join(patch.alias("p"), keys, "full_outer")
    rights = F.when(
        F.col("a.rights").isNotNull() & F.col("p.rights").isNotNull(),
        F.col("a.rights").bitwiseOR(F.col("p.rights")),
    ).otherwise(F.coalesce(F.col("a.rights"), F.col("p.rights")))
    return merged.select(*keys, rights.alias("rights"))


def remove_acls(acls: DataFrame, patch: DataFrame, obj_cols: list[str]) -> DataFrame:
    """OzoneAclUtil.removeAcl: AND-NOT the patch bits out of matching
    entries; drop entries whose bitset empties; patch rows matching
    nothing are no-ops."""
    keys = [*obj_cols, "type", "name", "scope"]
    patch = _normalize_patch(patch, keys)
    merged = acls.alias("a").join(patch.alias("p"), keys, "left")
    rights = F.when(
        F.col("p.rights").isNotNull(),
        F.col("a.rights").bitwiseAND(F.bitwise_not(F.col("p.rights"))),
    ).otherwise(F.col("a.rights"))
    return merged.select(*keys, rights.alias("rights")).filter(
        F.col("rights") != 0
    )


def set_acls(acls: DataFrame, patch: DataFrame, obj_cols: list[str]) -> DataFrame:
    """OzoneAclUtil.setAcl: replace the entry lists of every object
    the patch touches; other objects keep theirs."""
    targets = patch.select(*obj_cols).distinct()
    kept = acls.join(targets, obj_cols, "left_anti")
    cols = [*obj_cols, "type", "name", "scope", "rights"]
    return kept.select(*cols).unionByName(patch.select(*cols))
