"""Mutations as declarative transforms (SURVEY §2.8).

M2 prefix rename (BasicOzoneFileSystem.RenameIterator:273-308 — the
reference pages 1000 keys at a time and rewrites each; relationally it
is one projection over the prefix-filtered set), M3 recursive delete
(:456-520 — an anti-filter), M5 multipart complete validation
(S3MultipartUploadCompleteRequest.java:165-260 — strictly ascending,
gap-free part numbers, ETag match), M4 deferred GC
(KeyDeletingService.java:68-250 — age-based drain of the tombstone
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rename_prefix(
    keys: DataFrame, src: str, dst: str, key_col: str = "row_key"
) -> DataFrame:
    """M2: rename every key under ``src`` to live under ``dst``.

    One whole-stage-codegen projection — no per-key RPC loop. The
    reference's batched iterator exists only because its store mutates
    in place; immutable parquet turns rename into rewrite-on-read or a
    new snapshot write. Derived path columns (volume/bucket/key) are
    recomputed so cross-bucket renames stay internally consistent.
    """
    from hadoop_ozone_spark.functions import paths

    c = F.col(key_col)
    out = keys.withColumn(
        key_col,
        F.when(
            c.startswith(src),
            F.concat(F.lit(dst), F.substring(c, len(src) + 1, 1_000_000)),
        ).otherwise(c),
    )
    if key_col == "row_key":
        for col, fn in (
            ("volume", paths.row_key_volume),
            ("bucket", paths.row_key_bucket),
            ("key", paths.row_key_key),
        ):
            if col in keys.columns:
                out = out.withColumn(col, fn(F.col(key_col)))
    return out


def delete_prefix(keys: DataFrame, prefix: str, key_col: str = "row_key") -> DataFrame:
    """M3: recursive delete = anti-filter on the subtree prefix."""
    return keys.filter(~F.col(key_col).startswith(prefix))


def gc_expired(
    deleted_keys: DataFrame,
    now_epoch_ms: int,
    ttl_ms: int,
    ts_col: str = "deletion_time",
    batch: int = 20000,
) -> DataFrame:
    """M4: select the GC batch — tombstones older than the TTL, oldest
    first, capped at the per-task limit (OZONE_KEY_DELETING_LIMIT_PER_TASK
    = 20000, OMConfigKeys.java:88)."""
    return (
        deleted_keys.filter(F.col(ts_col) < F.lit(now_epoch_ms - ttl_ms))
        .orderBy(ts_col)
        .limit(batch)
    )


def multipart_complete_check(
    parts: DataFrame,
    upload_col: str = "upload_id",
    part_col: str = "part_number",
) -> DataFrame:
    """M5: per-upload validation — part numbers must be strictly
    ascending with no gaps starting at 1
    (S3MultipartUploadCompleteRequest.java:399-450).

    A part list is valid iff sorted part_number == row_number, i.e.
    count == max(part_number) and min == 1 with distinct parts. Returns
    (upload_id, num_parts, max_part, min_part, is_valid, total_size).
    """
    w = Window.partitionBy(upload_col).orderBy(part_col)
    ranked = parts.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(upload_col)
        .agg(
            F.count(F.lit(1)).alias("num_parts"),
            F.max(part_col).alias("max_part"),
            F.min(part_col).alias("min_part"),
            F.sum("data_size").alias("total_size"),
            F.max(F.when(F.col(part_col) != F.col("_rn"), 1).otherwise(0)).alias("_gap"),
        )
        .select(
            upload_col,
            "num_parts",
            "max_part",
            "min_part",
            "total_size",
            ((F.col("_gap") == 0) & (F.col("min_part") == 1)).alias("is_valid"),
        )
        .orderBy(upload_col)
    )


def multipart_complete_etag_check(
    declared: DataFrame,
    stored: DataFrame,
    upload_col: str = "upload_id",
    part_col: str = "part_number",
    etag_col: str = "etag",
) -> DataFrame:
    """M5 full law: the client's declared part list must (a) be strictly
    ascending and gap-free from 1 AND (b) name parts that exist in the
    multipart-info table with MATCHING ETags
    (S3MultipartUploadCompleteRequest.java:399-450 — a missing part key
    or a partName/ETag mismatch fails the complete with INVALID_PART).

    ``declared``: (upload, part_number, etag) from the CompleteMultipart
    request body; ``stored``: (upload, part_number, etag, data_size)
    from the part-key table. One join on the (upload, part) pair, then
    one upload-keyed aggregate — both map-side combinable; at scale the
    pair join shuffles each side once on the same key.

    Returns per-upload: part/gap stats, missing_parts, etag_mismatches,
    total_size (stored bytes of matched parts), and is_valid covering
    the whole law.
    """
    w = Window.partitionBy(upload_col).orderBy(part_col)
    st = stored.select(
        F.col(upload_col).alias("_s_upload"),
        F.col(part_col).alias("_s_part"),
        F.col(etag_col).alias("_s_etag"),
        F.col("data_size").alias("_s_size"),
    )
    joined = (
        declared.withColumn("_rn", F.row_number().over(w))
        .join(
            st,
            (F.col(upload_col) == F.col("_s_upload"))
            & (F.col(part_col) == F.col("_s_part")),
            "left",
        )
    )
    missing = F.col("_s_etag").isNull()
    mismatch = (~missing) & (F.col("_s_etag") != F.col(etag_col))
    return (
        joined.groupBy(upload_col)
        .agg(
            F.count(F.lit(1)).alias("num_parts"),
            F.max(part_col).alias("max_part"),
            F.min(part_col).alias("min_part"),
            F.sum(F.coalesce(F.col("_s_size"), F.lit(0))).alias("total_size"),
            F.max(F.when(F.col(part_col) != F.col("_rn"), 1).otherwise(0)).alias("_gap"),
            F.sum(F.when(missing, 1).otherwise(0)).alias("missing_parts"),
            F.sum(F.when(mismatch, 1).otherwise(0)).alias("etag_mismatches"),
        )
        .select(
            upload_col,
            "num_parts",
            "max_part",
            "min_part",
            "total_size",
            "missing_parts",
            "etag_mismatches",
            (
                (F.col("_gap") == 0)
                & (F.col("min_part") == 1)
                & (F.col("missing_parts") == 0)
                & (F.col("etag_mismatches") == 0)
            ).alias("is_valid"),
        )
        .orderBy(upload_col)
    )


def trash_checkpoint_status(
    trash_keys: DataFrame, expired_before_ckpt: str
) -> DataFrame:
    """Trash-emptier checkpoint classification (TrashPolicyOzone.java:
    188-247 Emptier loop; 285-331 deleteCheckpoint). Trash keys live at
    ``.Trash/<user>/<checkpoint>/<orig-path>`` where checkpoint is
    ``Current`` (still accumulating) or a ``yyMMddHHmmss`` stamp. Per
    emptier pass: checkpoints older than now − deletionInterval are
    deleted; ``Current`` is rolled into a new checkpoint
    (createCheckpoint, :255-283).

    The reference parses each checkpoint name back to a Date; since the
    compact format is lexicographically chronological (within a
    century), the age test here is a string compare against the
    pre-formatted threshold ``expired_before_ckpt`` — keeps the oracle
    engine-portable (two-digit-year parse pivots differ across
    engines). One groupBy over the trash subtree; the path splits are
    codegen'd Column ops.
    """
    parts = F.split(F.col("key"), "/")
    classified = trash_keys.select(
        "volume",
        "bucket",
        parts.getItem(1).alias("trash_user"),
        parts.getItem(2).alias("checkpoint"),
        "data_size",
    )
    action = (
        F.when(F.col("checkpoint") == "Current", F.lit("TO_CHECKPOINT"))
        .when(F.col("checkpoint") < expired_before_ckpt, F.lit("DELETE"))
        .otherwise(F.lit("RETAIN"))
    )
    return (
        classified.groupBy("volume", "bucket", "trash_user", "checkpoint")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("data_size").alias("total_bytes"),
        )
        .select(
            "volume",
            "bucket",
            "trash_user",
            "checkpoint",
            "n_keys",
            "total_bytes",
            action.alias("action"),
        )
        .orderBy("volume", "bucket", "trash_user", "checkpoint")
    )


# ---------------------------------------------------------------------------
# M11/M12: the OBS-layout path walk behind createDirectory / createFile
# (OMFileRequest.verifyFilesInPath, request/file/OMFileRequest.java:80-149).
# ---------------------------------------------------------------------------

def ancestor_walk(
    requests: DataFrame, file_keys: DataFrame, dir_keys: DataFrame
) -> DataFrame:
    """Deepest-entry classification of a requested path's ancestor chain.

    The reference walks the path from leaf to root, probing the keyTable
    for a file entry then a dir entry at each level, and returns at the
    FIRST (deepest) hit — files win depth ties because they are probed
    first (``OMFileRequest.verifyFilesInPath``, OMFileRequest.java:80-149).
    Levels visited before the hit, excluding the requested path itself,
    are the "missing parents" (:139-141), later materialized by
    ``OMDirectoryCreateRequest.getAllParentInfo`` (:250-290).

    Relationally: explode each request into its (depth, ancestor-path)
    chain and take per-request ``max(depth)`` over inner joins against
    the file and dir entry planes:

    - ``hit_depth``   deepest existing entry (0 = chain is all-fresh)
    - ``hit_is_file`` the entry at ``hit_depth`` is a file (tie → file)
    - ``n_missing``   ``max(n_comp - 1 - hit_depth, 0)`` — the strict
      ancestors between the hit and the requested leaf

    Scale shape: the exploded chain is |requests| × path-depth rows and
    is the broadcast build side of both joins — the keyTable plane is
    streamed once per probe and never shuffled; the per-request
    aggregates are broadcast back onto the request grid.

    ``requests``: (req_id, volume, bucket, path); ``file_keys`` /
    ``dir_keys``: (volume, bucket, key) — dir entries WITHOUT the
    trailing slash the RocksDB encoding adds.
    """
    comps = F.split(F.col("path"), "/")
    anc = (
        requests.select("req_id", "volume", "bucket", comps.alias("comps"))
        .select(
            "req_id",
            "volume",
            "bucket",
            "comps",
            F.explode(F.sequence(F.lit(1), F.size("comps"))).alias("depth"),
        )
        .select(
            "req_id",
            "volume",
            "bucket",
            "depth",
            F.concat_ws("/", F.slice("comps", F.lit(1), F.col("depth"))).alias(
                "anc_path"
            ),
        )
    )

    def deepest(entries: DataFrame, out_col: str) -> DataFrame:
        hits = F.broadcast(anc).join(
            entries.select("volume", "bucket", F.col("key").alias("anc_path")),
            ["volume", "bucket", "anc_path"],
        )
        return hits.groupBy("req_id").agg(F.max("depth").alias(out_col))

    file_d = deepest(file_keys, "file_depth")
    dir_d = deepest(dir_keys, "dir_depth")
    fd = F.coalesce(F.col("file_depth"), F.lit(0))
    dd = F.coalesce(F.col("dir_depth"), F.lit(0))
    hit = F.greatest(fd, dd)
    n_comp = F.size(F.split(F.col("path"), "/"))
    return (
        requests.join(F.broadcast(file_d), "req_id", "left")
        .join(F.broadcast(dir_d), "req_id", "left")
        .select(
            *requests.columns,
            hit.alias("hit_depth"),
            ((fd >= dd) & (fd > 0)).alias("hit_is_file"),
            F.greatest(n_comp - 1 - hit, F.lit(0)).alias("n_missing"),
            n_comp.alias("n_comp"),
        )
    )
