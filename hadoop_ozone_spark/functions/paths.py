"""X1-X4 — key-path scalar functions, all built-in Column expressions.

Reference: path build/split ``OmMetadataManagerImpl.java:531-590`` (X1),
``OzoneFSUtils.getImmediateChild`` (:66-81, X2), ``isFile`` /
``addTrailingSlashIfNeeded`` (:83-96, X3), ``OmUtils.normalizeKey``
(X4, via KeyManagerImpl.java:954-956).

Everything stays inside whole-stage codegen — no UDFs (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OM_KEY_PREFIX = "/"


def build_row_key(volume: Column, bucket: Column, key: Column) -> Column:
    """X1: '/vol/bucket/key' (ref getOzoneKey)."""
    return F.concat_ws(OM_KEY_PREFIX, F.lit(""), volume, bucket, key)


def row_key_volume(row_key: Column) -> Column:
    return F.element_at(F.split(row_key, "/"), 2)


def row_key_bucket(row_key: Column) -> Column:
    return F.element_at(F.split(row_key, "/"), 3)


def row_key_key(row_key: Column) -> Column:
    """Key path = everything after the 3rd '/' (key itself may contain '/')."""
    parts = F.split(row_key, "/")
    return F.array_join(F.slice(parts, 4, 1_000_000), "/")


def immediate_child(key: Column, ancestor_prefix: Column | str) -> Column:
    """X2: first path component of ``key`` below ``ancestor_prefix``.

    ref OzoneFSUtils.getImmediateChild: strip the ancestor prefix then
    take the first '/'-separated component.
    """
    prefix = F.lit(ancestor_prefix) if isinstance(ancestor_prefix, str) else ancestor_prefix
    rel = F.substring(key, F.length(prefix) + 1, F.lit(1_000_000))
    return F.substring_index(rel, "/", 1)


def is_file(key: Column) -> Column:
    """X3: keys not ending in '/' are files (ref OzoneFSUtils.isFile)."""
    return ~F.endswith(key, F.lit("/"))


def add_trailing_slash(key: Column) -> Column:
    return F.when(F.endswith(key, F.lit("/")), key).otherwise(F.concat(key, F.lit("/")))


def normalize_key(key: Column) -> Column:
    """X4: collapse duplicate separators, drop leading './' and leading '/'."""
    k = F.regexp_replace(key, "/{2,}", "/")
    k = F.regexp_replace(k, "^\\./", "")
    return F.regexp_replace(k, "^/", "")


def ancestors(key: Column, max_depth: int = 16) -> Column:
    """All ancestor directory paths of a '/'-separated key, as an array.

    ``a/b/c/file`` → ``['a', 'a/b', 'a/b/c']``. Used by A3's recursive du
    (explode + groupBy replaces the reference's per-dir NSSummary walk,
    NSSummaryTask.java:82-230). Depth capped so the row multiplier is
    bounded at scale (SURVEY §7 "what's hard" (c)).
    """
    parts = F.slice(F.split(key, "/"), 1, max_depth)
    dirs = F.slice(parts, 1, F.greatest(F.size(parts) - 1, F.lit(0)))
    # guard: sequence(1, 0) counts DOWN in Spark, so empty dirs needs an
    # explicit empty result (keys at bucket root have no ancestors)
    return F.when(F.size(dirs) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(dirs)),
            lambda i: F.array_join(F.slice(dirs, 1, i), "/"),
        )
    )
