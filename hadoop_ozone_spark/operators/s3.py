"""S3 gateway listing semantics.

W2 ListObjectsV2 delimiter grouping (ref BucketEndpoint.java:90-228):
split the ordered key stream into Contents (leaf keys) and
CommonPrefixes (first delimiter segment after the prefix, deduped), both
counting toward max-keys; truncation yields a ContinueToken.
X7/X8 ContinueToken encode (ref ContinueToken.java:57-130): hex payload
+ sha256 integrity digest.
SO3 multi-delete (ref BucketEndpoint.java:341-420).
M6 server-side copy (ref ObjectEndpoint.java:574-660).

Scale shape: grouping is a map-side derived column + groupBy on it; the
final order-by-name cut is a top-k (`TakeOrderedAndProject`), so listing
a 10^9-key bucket moves only ``max_keys`` rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def list_objects_v2(
    keys: DataFrame,
    prefix: str = "",
    delimiter: str = "/",
    start_after: str | None = None,
    max_keys: int = 1000,
    key_col: str = "key",
    size_col: str = "data_size",
) -> DataFrame:
    """W2: one row per Contents entry or CommonPrefix, ordered by name.

    Returns (name, entry_type['KEY'|'PREFIX'], size). The reference
    walks the sorted stream once, deduping consecutive dir prefixes
    (BucketEndpoint.java:177-209); relationally that is: group leaf keys
    under their first-delimiter-segment, emit the segment once.
    """
    out = keys
    if prefix:
        out = out.filter(F.col(key_col).startswith(prefix))
    if start_after:
        resume = F.col(key_col) > start_after
        if start_after.endswith(delimiter):
            # token was a CommonPrefix: skip the entire already-emitted
            # subtree, not just keys sorting after the prefix string —
            # the reference's ContinueToken(lastKey, lastDir) seek-past
            # (BucketEndpoint.java:173-223, ContinueToken.java:35-130);
            # without this, resume re-derives the same prefix forever
            resume = resume & ~F.col(key_col).startswith(start_after)
        out = out.filter(resume)
    rel = F.substring(F.col(key_col), len(prefix) + 1, 1_000_000)
    grp = F.when(
        F.instr(rel, delimiter) > 0,
        F.concat(F.lit(prefix), F.substring_index(rel, delimiter, 1), F.lit(delimiter)),
    )
    tagged = out.select(
        grp.alias("common_prefix"), F.col(key_col).alias("key"), F.col(size_col).alias("sz")
    )
    prefixes = (
        tagged.filter(F.col("common_prefix").isNotNull())
        .groupBy("common_prefix")
        .agg(F.count(F.lit(1)))
        .select(
            F.col("common_prefix").alias("name"),
            F.lit("PREFIX").alias("entry_type"),
            F.lit(0).cast("long").alias("size"),
        )
    )
    contents = tagged.filter(F.col("common_prefix").isNull()).select(
        F.col("key").alias("name"),
        F.lit("KEY").alias("entry_type"),
        F.col("sz").cast("long").alias("size"),
    )
    return prefixes.unionByName(contents).orderBy("name").limit(max_keys)


def continue_token(last_key: DataFrame, key_col: str = "name") -> DataFrame:
    """X7: token = hex(lastKey) + sha256 digest (ref ContinueToken.java:57-130).

    Input: a 1-row DF holding the last emitted name of a truncated page.
    """
    k = F.col(key_col)
    payload = F.lower(F.hex(F.encode(k, "UTF-8")))
    return last_key.select(
        k.alias("last_key"),
        payload.alias("token_payload"),
        F.sha2(k, 256).alias("token_digest"),
    )


def decode_continue_token(
    tokens_df: DataFrame,
    payload_col: str = "token_payload",
    digest_col: str = "token_digest",
) -> DataFrame:
    """X7 decode + integrity verification (ref ContinueToken.java:85-130):
    unhex the payload back to the key, recompute the sha256 digest of
    the decoded key, and reject tampering.

    Returns (last_key, token_valid): a tampered payload or digest yields
    token_valid=false and a null last_key — the relational analogue of
    the reference throwing INVALID_ARGUMENT on digest mismatch.
    """
    decoded = F.decode(F.unhex(F.upper(F.col(payload_col))), "UTF-8")
    valid = F.sha2(decoded, 256) == F.col(digest_col)
    return tokens_df.select(
        F.when(valid, decoded).alias("last_key"),
        F.coalesce(valid, F.lit(False)).alias("token_valid"),
    )


def list_multipart_uploads(
    uploads: DataFrame,
    prefix: str = "",
    key_marker: str | None = None,
    upload_id_marker: str | None = None,
    max_uploads: int = 1000,
    key_col: str = "key",
    upload_col: str = "upload_id",
) -> DataFrame:
    """listMultipartUploads (ref KeyManagerImpl.java:1364): in-progress
    uploads in a bucket under ``prefix``, ordered by (key, uploadId),
    resuming after the (key-marker, upload-id-marker) pair.

    Marker semantics mirror the reference's seek: with an upload-id
    marker the resume point is exclusive WITHIN the marker key
    (key == marker AND uploadId > idMarker) and exclusive beyond it;
    without one, strictly after the marker key. The page cut is a
    top-k (TakeOrderedAndProject) — a 10⁹-upload table moves only
    ``max_uploads`` rows.
    """
    out = uploads
    if prefix:
        out = out.filter(F.col(key_col).startswith(prefix))
    if key_marker is not None:
        if upload_id_marker is not None:
            out = out.filter(
                (F.col(key_col) > key_marker)
                | (
                    (F.col(key_col) == key_marker)
                    & (F.col(upload_col) > upload_id_marker)
                )
            )
        else:
            out = out.filter(F.col(key_col) > key_marker)
    return out.orderBy(key_col, upload_col).limit(max_uploads)


def multi_delete(
    keys: DataFrame, targets: DataFrame, key_col: str = "row_key"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """SO3: S3 ?delete batch. Returns (new_state, deleted, errors):
    new_state = keys ∖ targets; deleted = matched targets; errors =
    targets that did not exist."""
    on = keys[key_col] == targets[key_col]
    new_state = keys.join(targets, on, "left_anti")
    deleted = targets.join(keys, on, "left_semi")
    errors = targets.join(keys, on, "left_anti")
    return new_state, deleted, errors


def copy_object(
    keys: DataFrame, src_prefix: str, dst_prefix: str, key_col: str = "row_key"
) -> DataFrame:
    """M6: server-side copy — duplicate rows under a new key prefix and
    append to the namespace (ref ObjectEndpoint x-amz-copy-source).

    Derived path columns (volume/bucket/key) are recomputed from the new
    row_key so a cross-bucket copy stays internally consistent — stale
    source columns would mis-attribute quota/partition downstream.
    """
    from hadoop_ozone_spark.functions import paths

    copied = keys.filter(F.col(key_col).startswith(src_prefix)).withColumn(
        key_col,
        F.concat(F.lit(dst_prefix), F.substring(F.col(key_col), len(src_prefix) + 1, 1_000_000)),
    )
    if key_col == "row_key":
        for col, fn in (
            ("volume", paths.row_key_volume),
            ("bucket", paths.row_key_bucket),
            ("key", paths.row_key_key),
        ):
            if col in keys.columns:
                copied = copied.withColumn(col, fn(F.col(key_col)))
    return keys.unionByName(copied)


def upload_part_copy(
    keys: DataFrame,
    requests: DataFrame,
) -> DataFrame:
    """S3 UploadPartCopy: register a multipart part whose bytes come
    from an existing object, optionally a byte range
    (ObjectEndpoint.createMultipartKey copy path, :573-650;
    CopyPartResult carries the part's ETag). ``requests`` rows:
    (upload_id, part_number, source_row_key, range_start, range_end) —
    range columns NULL for whole-object copies.

    Part size follows the range parser's clamp (RangeHeaderParserUtil:
    bytes=a-b inclusive, end clamped to size−1; the reference copies
    end−start+1 bytes after skipping start). ETag is the deterministic
    part name md5 — both engines replay it. Source lookup is a join on
    row_key (the reference's getKey) — requests are tiny, so broadcast.
    """
    src = keys.select(
        F.col("row_key").alias("source_row_key"),
        F.col("data_size").alias("source_size"),
    )
    start = F.coalesce(F.col("range_start"), F.lit(0))
    end_clamped = F.least(
        F.coalesce(F.col("range_end"), F.col("source_size") - 1),
        F.col("source_size") - 1,
    )
    return (
        src.join(F.broadcast(requests), "source_row_key")
        # a start beyond the (clamped) end is an unsatisfiable range —
        # the gateway answers 416 InvalidRange and registers no part
        # (S3 semantics via RangeHeaderParserUtil); relationally the
        # request row is excluded rather than yielding a negative size
        .filter(start <= end_clamped)
        .select(
            "upload_id",
            "part_number",
            "source_row_key",
            (end_clamped - start + 1).alias("data_size"),
            F.md5(
                F.concat(
                    F.col("source_row_key"), F.lit("#"),
                    F.col("upload_id"), F.lit("#"),
                    F.col("part_number").cast("string"),
                )
            ).alias("etag"),
        )
        .orderBy("upload_id", "part_number")
    )


def stale_multipart_uploads(
    uploads: DataFrame,
    parts: DataFrame,
    expire_before: str,
    created_col: str = "created",
) -> DataFrame:
    """Expired-MPU backlog: in-flight multipart uploads created before
    ``expire_before`` with their reclaimable part bytes — the
    storage-cost view behind aborting stale uploads
    (S3MultipartUploadAbortRequest.java:157-170 walks partKeyInfoMap to
    subtract exactly these bytes; the reference has no TTL sweeper at
    this version, so the backlog query is the admin's surface).

    ``uploads``: (key, upload_id, created); ``parts``: (upload_id,
    part_number, part_size). One upload-keyed aggregate over the part
    plane (map-side combinable) joined to the TTL-filtered upload rows
    — the MPU planes are orders of magnitude smaller than the
    namespace, so both shuffles are on the small tables.
    """
    part_stats = parts.groupBy("upload_id").agg(
        F.count(F.lit(1)).alias("part_count"),
        F.sum("part_size").alias("reclaimable_bytes"),
    )
    return (
        uploads.filter(F.col(created_col) < F.to_date(F.lit(expire_before)))
        .join(part_stats, "upload_id", "left")
        .select(
            "key",
            "upload_id",
            F.col(created_col).alias("created"),
            F.coalesce(F.col("part_count"), F.lit(0)).alias("part_count"),
            F.coalesce(F.col("reclaimable_bytes"), F.lit(0)).alias(
                "reclaimable_bytes"
            ),
        )
        .orderBy("key", "upload_id")
    )


def abort_expired_uploads(
    uploads: DataFrame,
    parts: DataFrame,
    expire_before: str,
    created_col: str = "created",
) -> DataFrame:
    """Abort-as-transform for every expired upload, summarized per
    top-level directory: the multipartInfo rows are dropped (anti-join
    — S3MultipartUploadAbortRequest.java:171-181 removes the cache
    row) and their part bytes released (semi-join against the part
    plane, the :157-170 byte subtraction), with per-dir accounting:

        (dir, remaining_uploads, aborted_uploads, released_bytes)

    The transform is the anti/semi-join pair; the rollup is one
    combinable groupBy per side over the (small) MPU planes.
    """
    dir_col = F.substring_index(F.col("key"), "/", 1).alias("dir")
    expired = uploads.filter(
        F.col(created_col) < F.to_date(F.lit(expire_before))
    ).select("key", "upload_id")
    expired_ids = expired.select("upload_id")
    remaining = uploads.join(expired_ids, "upload_id", "left_anti")
    rem = remaining.select(dir_col).groupBy("dir").agg(
        F.count(F.lit(1)).alias("remaining_uploads")
    )
    ab = expired.select(dir_col, "upload_id")
    aborted = ab.groupBy("dir").agg(F.count(F.lit(1)).alias("aborted_uploads"))
    released = (
        parts.join(ab, "upload_id")
        .groupBy("dir")
        .agg(F.sum("part_size").alias("released_bytes"))
    )
    return (
        rem.join(aborted, "dir", "full")
        .join(released, "dir", "full")
        .select(
            "dir",
            F.coalesce(F.col("remaining_uploads"), F.lit(0)).alias(
                "remaining_uploads"
            ),
            F.coalesce(F.col("aborted_uploads"), F.lit(0)).alias("aborted_uploads"),
            F.coalesce(F.col("released_bytes"), F.lit(0)).alias("released_bytes"),
        )
        .orderBy("dir")
    )


def head_object(keys: DataFrame, probes: DataFrame) -> DataFrame:
    """S3 HEAD Object (ObjectEndpoint.java:356-395): 200 with
    Content-Length / ETag / Last-Modified for an existing key, 404 for
    a missing one. The reference (at this version) sets the ETag header
    from the key's modification time (:373 — not a content hash);
    modeled from the key plane's creation_time analogously.

    ``probes``: (volume, bucket, key) rows. One broadcast of the probe
    set against the key plane — the point-lookup path (partition-pruned
    + row-group-skipped under the snapshot layout).
    """
    hit = keys.select(
        "volume", "bucket", "key",
        F.col("data_size").alias("content_length"),
        F.col("creation_time").alias("last_modified"),
    )
    return (
        probes.select("volume", "bucket", "key")
        .join(hit, ["volume", "bucket", "key"], "left")
        .select(
            "volume",
            "bucket",
            "key",
            F.when(F.col("content_length").isNull(), F.lit(404))
            .otherwise(F.lit(200))
            .alias("status"),
            "content_length",
            F.col("last_modified").cast("string").alias("etag"),
            "last_modified",
        )
        .orderBy("volume", "bucket", "key")
    )


def initiate_multipart_upload(
    requests: DataFrame, storage_class_col: str = "storage_class"
) -> DataFrame:
    """S3 InitiateMultipartUpload (ObjectEndpoint.java:463-505 →
    S3InitiateMultipartUploadRequest): mint a deterministic uploadID
    per (bucket, key) request and resolve the storage class to the
    replication config (S3StorageType.java:30-31 — STANDARD →
    RATIS/THREE, REDUCED_REDUNDANCY → RATIS/ONE; absent/empty →
    STANDARD, :476-481).

    ``requests``: (volume, bucket, key[, storage_class]) rows. Pure
    map-side projection — the multipartInfo-row insert is the union of
    this output with the existing uploads plane.
    """
    sc = (
        F.coalesce(F.col(storage_class_col), F.lit("STANDARD"))
        if storage_class_col in requests.columns
        else F.lit("STANDARD")
    )
    sc = F.when(sc == "", F.lit("STANDARD")).otherwise(sc)
    return requests.select(
        "volume",
        "bucket",
        "key",
        F.substring(
            F.md5(
                F.concat(
                    F.lit("/"), F.col("volume"), F.lit("/"), F.col("bucket"),
                    F.lit("/"), F.col("key"), F.lit("#init#"), sc,
                )
            ),
            1,
            16,
        ).alias("upload_id"),
        F.lit("RATIS").alias("replication_type"),
        F.when(sc == "REDUCED_REDUNDANCY", F.lit(1))
        .otherwise(F.lit(3))
        .alias("replication_factor"),
    ).orderBy("volume", "bucket", "key")


# --- S3 bucket ACL surface (GET/PUT /bucket?acl) ---------------------------

# ACLType bitmask ordinals (IAccessAuthorizer.java:48-57), as in
# operators/acl.py: READ=1 WRITE=2 CREATE=4 LIST=8 DELETE=16 READ_ACL=32
# WRITE_ACL=64 ALL=128.
_B_READ, _B_WRITE, _B_CREATE, _B_LIST, _B_DELETE = 1, 2, 4, 8, 16
_B_READ_ACL, _B_WRITE_ACL, _B_ALL = 32, 64, 128


def _has(bits: int):
    return F.col("rights").bitwiseAND(F.lit(bits)) == bits


def bucket_acl_grants(native_acls: DataFrame) -> DataFrame:
    """`GET /bucket?acl` — translate each bucket's native OzoneAcl rows
    into S3 grants (BucketEndpoint.getAcl, BucketEndpoint.java:383-421;
    S3Acl.ozoneNativeAclToS3Acl, S3Acl.java:175-219):

    - only USER identities map ("CanonicalUser" is the single supported
      grantee type, S3Acl.java:96-99); GROUP/WORLD rows drop.
    - permission by the reference's if-ladder priority: ALL →
      FULL_CONTROL; else WRITE_ACL → WRITE_ACP; else READ_ACL →
      READ_ACP; else WRITE∧DELETE∧CREATE → WRITE; else READ∧LIST →
      READ; anything else is unmappable and logged+dropped.
    - grants dedup across ACCESS/DEFAULT scopes (the gateway's
      grantSet, BucketEndpoint.java:396-401).

    Owner rides along as the volume owner surrogate
    (BucketEndpoint.java:390-392 uses the volume owner until bucket
    owners exist). Map-only projection + a distinct on the tiny ACL
    plane — no fact-table touch.
    """
    permission = (
        F.when(_has(_B_ALL), F.lit("FULL_CONTROL"))
        .when(_has(_B_WRITE_ACL), F.lit("WRITE_ACP"))
        .when(_has(_B_READ_ACL), F.lit("READ_ACP"))
        .when(
            _has(_B_WRITE | _B_DELETE | _B_CREATE), F.lit("WRITE")
        )
        .when(_has(_B_READ | _B_LIST), F.lit("READ"))
    )
    return (
        native_acls.filter(F.col("type") == "USER")
        .select(
            "volume",
            "bucket",
            F.concat(F.lit("owner-"), F.col("volume")).alias("owner_id"),
            F.col("name").alias("grantee_id"),
            F.col("name").alias("grantee_display_name"),
            F.lit("CanonicalUser").alias("grantee_type"),
            permission.alias("permission"),
        )
        .filter(F.col("permission").isNotNull())
        .distinct()
        .orderBy("volume", "bucket", "grantee_id", "permission")
    )


def s3_permission_to_bucket_rights(permission) -> "F.Column":
    """S3 permission string → native bucket-ACL bitmask
    (S3Acl.getOzoneAclOnBucketFromS3Permission, S3Acl.java:253-284)."""
    p = F.lit(permission) if isinstance(permission, str) else permission
    return (
        F.when(p == "FULL_CONTROL", F.lit(_B_ALL))
        .when(p == "WRITE_ACP", F.lit(_B_WRITE_ACL))
        .when(p == "READ_ACP", F.lit(_B_READ_ACL))
        .when(p == "WRITE", F.lit(_B_WRITE | _B_DELETE | _B_CREATE))
        .when(p == "READ", F.lit(_B_READ | _B_LIST))
        .cast("long")
    )


def s3_permission_to_volume_rights(permission) -> "F.Column":
    """S3 permission → the least-privilege volume-ACL bitmask the put
    also applies on the parent volume
    (S3Acl.getOzoneAclOnVolumeFromS3Permission, S3Acl.java:313-345)."""
    p = F.lit(permission) if isinstance(permission, str) else permission
    return (
        F.when(
            p == "FULL_CONTROL",
            F.lit(_B_READ | _B_WRITE | _B_READ_ACL | _B_WRITE_ACL),
        )
        .when(p == "WRITE_ACP", F.lit(_B_READ | _B_READ_ACL | _B_WRITE_ACL))
        .when(p == "READ_ACP", F.lit(_B_READ | _B_READ_ACL))
        .when(p == "WRITE", F.lit(_B_READ | _B_WRITE))
        .when(p == "READ", F.lit(_B_READ))
        .cast("long")
    )


def put_bucket_acl(
    native_acls: DataFrame, grants: DataFrame, volume: str, bucket: str
) -> DataFrame:
    """`PUT /bucket?acl` as a transform — BucketEndpoint.putAcl
    (BucketEndpoint.java:427-500): the target bucket's native ACL list
    is REPLACED (bucket.setAcl) by the translated grants, each grant
    expanding to an ACCESS + DEFAULT scope pair
    (S3Acl.s3AclToOzoneNativeAclOnBucket, S3Acl.java:221-251); every
    other bucket's rows pass through untouched.

    ``grants``: (grantee_id, permission) rows. Returns the new native
    ACL plane. Anti-filter on the target + a union of the tiny
    translated set — map-only.
    """
    new_rows = grants.select(
        F.lit(volume).alias("volume"),
        F.lit(bucket).alias("bucket"),
        F.lit("USER").alias("type"),
        F.col("grantee_id").alias("name"),
        s3_permission_to_bucket_rights(F.col("permission")).alias("rights"),
        F.explode(F.array(F.lit("ACCESS"), F.lit("DEFAULT"))).alias("scope"),
    )
    untouched = native_acls.filter(
        ~((F.col("volume") == volume) & (F.col("bucket") == bucket))
    )
    return untouched.unionByName(new_rows)


def list_objects_v1(
    keys: DataFrame,
    prefix: str = "",
    delimiter: str = "/",
    marker: str | None = None,
    start_after: str | None = None,
    continuation_last_key: str | None = None,
    max_keys: int = 1000,
    key_col: str = "key",
    size_col: str = "data_size",
) -> DataFrame:
    """S3 ListObjects V1/V2 resume-parameter compatibility — the
    BucketEndpoint.get precedence ladder (BucketEndpoint.java:134-148):
    a V1 ``marker`` is assigned to ``start-after`` when the latter is
    absent, and a decoded continuation token beats start-after when
    both arrive. The resolved resume key then drives the SAME listing
    program as V2 (delimiter grouping, consecutive-prefix dedup,
    maxKeys cut) — one surface, two API dialects.
    """
    if start_after is None and marker is not None:
        start_after = marker
    resume = (
        continuation_last_key if continuation_last_key is not None
        else start_after
    )
    return list_objects_v2(
        keys, prefix, delimiter, resume, max_keys, key_col, size_col
    )
