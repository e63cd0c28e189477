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
