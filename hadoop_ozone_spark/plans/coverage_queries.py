"""Final §2 coverage: S5 snapshot⊕tail merge (SO1), SO3 multi-delete,
M4 deferred GC, M6 copy, X1-X4 path functions, X6 range read."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.functions import paths
from hadoop_ozone_spark.functions.binning import file_size_upper_bound_sql
from hadoop_ozone_spark.operators import cdc, mutations, s3


def s5_snapshot_tail_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/SO1: read-your-writes view = snapshot MERGE uncompacted CDC
    tail (ref OzoneManagerServiceProviderImpl bootstrap + TableCache
    merge, OmMetadataManagerImpl.java:888-946).

    Snapshot = state compacted from the first half of the event log;
    tail = second half; result = merged current state aggregated per op.
    """
    ev = model.om_events(spark, sf_dir)
    mid = ev.agg(F.floor(F.max("seqno") / 2).alias("mid"))
    ev_m = ev.join(F.broadcast(mid), F.lit(True))
    first_half = ev_m.filter(F.col("seqno") <= F.col("mid")).drop("mid")
    tail = ev_m.filter(F.col("seqno") > F.col("mid")).drop("mid")
    snapshot = cdc.latest_state(first_half).select("row_key", "data_size")
    merged = cdc.merge_snapshot_with_tail(snapshot, tail)
    return (
        merged.groupBy()
        .agg(
            F.count(F.lit(1)).alias("live_keys"),
            F.sum("data_size").alias("live_bytes"),
        )
    )


S5_SQL = model.with_ctes(
    model.OM_EVENTS_CTE,
    body="""SELECT count(*) AS live_keys, CAST(SUM(data_size) AS BIGINT) AS live_bytes
FROM (
  SELECT row_key, data_size FROM (
    SELECT row_key, data_size, op,
           row_number() OVER (PARTITION BY row_key ORDER BY seqno DESC) AS rn
    FROM om_events
  ) WHERE rn = 1 AND op <> 'DELETE'
)""",
)


def so3_multi_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO3: S3 ?delete batch — targets split into Deleted vs Error
    (ref BucketEndpoint.java:341-420). Targets: every key of dir5 plus
    synthetic misses."""
    keys = model.om_keys(spark, sf_dir)
    hits = keys.filter(F.col("key").startswith("dir5/")).select("row_key")
    misses = spark.range(5).select(
        F.concat(F.lit("/vol_x/bkt_x/missing_"), F.col("id")).alias("row_key")
    )
    targets = hits.unionByName(misses)
    new_state, deleted, errors = s3.multi_delete(keys, targets)
    return (
        new_state.groupBy().agg(F.count(F.lit(1)).alias("remaining"))
        .crossJoin(F.broadcast(deleted.groupBy().agg(F.count(F.lit(1)).alias("deleted"))))
        .crossJoin(F.broadcast(errors.groupBy().agg(F.count(F.lit(1)).alias("errors"))))
    )


SO3_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT
  (SELECT count(*) FROM om_keys WHERE NOT starts_with(key, 'dir5/')) AS remaining,
  (SELECT count(*) FROM om_keys WHERE starts_with(key, 'dir5/')) AS deleted,
  CAST(5 AS BIGINT) AS errors""",
)


def m4_gc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: deferred-deletion GC batch — tombstones older than the TTL,
    oldest first, capped at 20000/task (ref KeyDeletingService.java:
    68-250, OMConfigKeys OZONE_KEY_DELETING_LIMIT_PER_TASK).

    Tombstones = DELETE events; 'now' = max event time; TTL = 7 days.
    """
    ev = model.om_events(spark, sf_dir)
    deleted = ev.filter(F.col("op") == "DELETE").select(
        "row_key", "seqno", F.unix_millis("event_time").alias("deletion_time")
    )
    now = ev.agg(F.unix_millis(F.max("event_time")).alias("now_ms"))
    ttl_ms = 7 * 24 * 3600 * 1000
    batch = (
        deleted.join(F.broadcast(now), F.lit(True))
        .filter(F.col("deletion_time") < F.col("now_ms") - ttl_ms)
        .orderBy("deletion_time", "seqno")
        .limit(20000)
        .select("row_key", "seqno", "deletion_time")
    )
    return batch


M4_SQL = model.with_ctes(
    model.OM_EVENTS_CTE,
    body="""SELECT row_key, seqno, epoch_ms(event_time) AS deletion_time
FROM om_events
WHERE op = 'DELETE'
  AND epoch_ms(event_time) < (SELECT epoch_ms(max(event_time)) FROM om_events)
                              - 7 * 24 * 3600 * 1000
ORDER BY deletion_time, seqno LIMIT 20000""",
)


def m4_open_key_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 open-key variant: expire abandoned openKeyTable rows whose
    age exceeds the threshold (OpenKeyCleanupService.java:39-90 →
    OmMetadataManagerImpl.getExpiredOpenKeys:1124-1150: age = now −
    creationTime ≥ ozone.open.key.expire.threshold, default 1 day,
    capped at the task batch size; iterator order = row-key order).

    Open rows = the M1 open-key law (orderkey%5==1 embedded in the
    filename); 'now' = the corpus's max creation_time. Same TTL-filter
    + bounded-drain shape as the deletedTable GC — one broadcast scalar
    join, filter, order, limit.
    """
    keys = model.om_keys(spark, sf_dir)
    open_keys = keys.filter(
        F.split(F.col("key"), "_")[1].cast("long") % 5 == 1
    ).select(
        "row_key",
        "data_size",
        F.unix_millis(F.col("creation_time").cast("timestamp")).alias("creation_ms"),
    )
    now = keys.agg(
        F.unix_millis(F.max(F.col("creation_time").cast("timestamp"))).alias("now_ms")
    )
    ttl_ms = 24 * 3600 * 1000  # OZONE_OPEN_KEY_EXPIRE_THRESHOLD default
    return (
        open_keys.join(F.broadcast(now), F.lit(True))
        .filter(F.col("creation_ms") <= F.col("now_ms") - ttl_ms)
        .select(
            "row_key",
            "data_size",
            "creation_ms",
            (F.col("now_ms") - F.col("creation_ms")).alias("age_ms"),
        )
        .orderBy("row_key")
        .limit(20000)
    )


M4_OPEN_KEY_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT row_key, data_size,
       epoch_ms(CAST(creation_time AS TIMESTAMP)) AS creation_ms,
       (SELECT epoch_ms(CAST(max(creation_time) AS TIMESTAMP)) FROM om_keys)
         - epoch_ms(CAST(creation_time AS TIMESTAMP)) AS age_ms
FROM om_keys
WHERE CAST(split_part(key, '_', 2) AS BIGINT) % 5 = 1
  AND epoch_ms(CAST(creation_time AS TIMESTAMP))
      <= (SELECT epoch_ms(CAST(max(creation_time) AS TIMESTAMP)) FROM om_keys)
         - 24 * 3600 * 1000
ORDER BY row_key LIMIT 20000""",
)


def m6_copy_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: server-side copy of dir6 into a backup prefix; result = per-
    volume counts of the post-copy namespace (ref ObjectEndpoint copy)."""
    keys = model.om_keys(spark, sf_dir).select("row_key", "volume", "data_size")
    after = s3.copy_object(keys, "/vol_r/bkt_o/dir6/", "/vol_r/bkt_o/backup6/")
    return (
        after.groupBy("volume")
        .agg(F.count(F.lit(1)).alias("n_keys"), F.sum("data_size").alias("total_bytes"))
        .orderBy("volume")
    )


M6_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume, count(*) AS n_keys, CAST(SUM(data_size) AS BIGINT) AS total_bytes
FROM (
  SELECT volume, data_size FROM om_keys
  UNION ALL
  SELECT volume, data_size FROM om_keys WHERE starts_with(row_key, '/vol_r/bkt_o/dir6/')
) GROUP BY volume ORDER BY volume""",
)


def x_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X4 in one projection: row-key build/split round-trip,
    immediate child below the top dir, file predicate, normalization."""
    keys = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f")
    )
    rebuilt = paths.build_row_key(F.col("volume"), F.col("bucket"), F.col("key"))
    top_dir = F.concat(F.substring_index("key", "/", 1), F.lit("/"))
    return keys.select(
        "row_key",
        paths.row_key_volume(F.col("row_key")).alias("vol_part"),
        paths.row_key_bucket(F.col("row_key")).alias("bkt_part"),
        paths.row_key_key(F.col("row_key")).alias("key_part"),
        (rebuilt == F.col("row_key")).alias("roundtrip_ok"),
        paths.immediate_child(F.col("key"), top_dir).alias("child"),
        paths.is_file(F.col("key")).alias("is_file"),
        paths.normalize_key(F.concat(F.lit("//"), F.col("key"))).alias("normalized"),
    )


X_PATH_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT row_key,
       split_part(row_key, '/', 2) AS vol_part,
       split_part(row_key, '/', 3) AS bkt_part,
       key AS key_part,
       TRUE AS roundtrip_ok,
       split_part(key, '/', 2) AS child,
       NOT (key LIKE '%/') AS is_file,
       key AS normalized
FROM om_keys WHERE volume = 'vol_a' AND bucket = 'bkt_f'""",
)


def x6_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: HTTP Range semantics (bytes=a-b inclusive; ref
    RangeHeaderParserUtil.java:42-90) as substring over a binary
    payload — here bytes 10-49 of each document's content."""
    docs = model.load(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    sliced = F.substring(content, 11, 40)  # bytes=10-49 → 1-based offset 11
    return docs.select(
        "doc_id",
        F.length(content).alias("full_len"),
        F.decode(sliced, "UTF-8").alias("range_text"),
        F.length(sliced).alias("range_len"),
    )


# DuckDB substring() has no BLOB overload; the corpus is ASCII so the
# string form is byte-equivalent for the oracle
X6_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS full_len,
       substring(text, 11, 40) AS range_text,
       CAST(length(substring(text, 11, 40)) AS BIGINT) AS range_len
FROM documents
"""


QUERIES = {
    "s5_snapshot_tail_merge": s5_snapshot_tail_merge,
    "so3_multi_delete": so3_multi_delete,
    "m4_gc_batch": m4_gc_batch,
    "m4_open_key_expiry": m4_open_key_expiry,
    "m6_copy_object": m6_copy_object,
    "x_path_functions": x_path_functions,
    "x6_range_read": x6_range_read,
}

ORACLES = {
    "s5_snapshot_tail_merge": S5_SQL,
    "so3_multi_delete": SO3_SQL,
    "m4_gc_batch": M4_SQL,
    "m4_open_key_expiry": M4_OPEN_KEY_SQL,
    "m6_copy_object": M6_SQL,
    "x_path_functions": X_PATH_SQL,
    "x6_range_read": X6_SQL,
}


# --- S10: key→chunk-location debug map (round 7) --------------------------

def s10_chunk_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ozone debug chunkinfo`` ∘ fsck ContainerMapper (VERDICT r6 #3):
    a 20-key page resolved to every replica-holding datanode's chunk
    FILE path under the reference's exact layout law
    (operators/listing.py chunk_locations —
    KeyValueContainerLocationUtil.java:78-103 base dir,
    ChunkLayOutVersion.java:48-53 FILE_PER_BLOCK naming)."""
    from hadoop_ozone_spark.operators import listing as listing_ops

    page = (
        model.om_keys(spark, sf_dir)
        .filter(F.col("row_key").startswith("/vol_r/bkt_o/dir3/"))
        .orderBy("row_key")
        .limit(20)
    )
    return listing_ops.chunk_locations(
        page,
        model.container_replicas(spark, sf_dir),
        model.datanodes(spark, sf_dir),
    )


S10_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    model.CONTAINER_REPLICAS_CTE,
    model.DATANODES_CTE,
    """s10_page AS (
  SELECT row_key, key, container_id,
         CAST(split_part(key, '_', 2) AS BIGINT) AS local_id
  FROM om_keys
  WHERE starts_with(row_key, '/vol_r/bkt_o/dir3/')
  ORDER BY row_key LIMIT 20
)""",
    body="""SELECT p.row_key, p.container_id, p.local_id, r.datanode_id,
       COALESCE(d.hostname, 'UNKNOWN') AS hostname,
       concat('/data/dn_', r.datanode_id, '/hdds/CID-cluster/current/',
              'containerDir', (p.container_id >> 9) & 255, '/',
              p.container_id, '/chunks/', p.local_id, '.block') AS chunk_file
FROM s10_page p
JOIN container_replicas r USING (container_id)
LEFT JOIN datanodes d ON r.datanode_id = d.datanode_id
ORDER BY p.row_key, r.datanode_id""",
)

QUERIES["s10_chunk_locations"] = s10_chunk_locations
ORACLES["s10_chunk_locations"] = S10_SQL


# --- nested locations + metadata map (OmKeyInfo's nested model) -----------

def nested_locations_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the OmKeyInfo nested shape — object → sorted array of
    version structs (version, size, container) — then explode it back
    (J4's explode path over real ArrayType(StructType)) and derive W6
    latest-version facts. Oracle computes the same facts windowed,
    proving build→explode loses nothing (SURVEY §1.2 nested mapping).
    """
    li = model.load(spark, sf_dir, "lineitem")
    flat = li.select(
        F.col("l_orderkey").alias("object_id"),
        F.struct(
            F.col("l_linenumber").alias("version"),
            F.floor(F.col("l_extendedprice") * 100).alias("size"),
            F.col("l_partkey").alias("container_id"),
        ).alias("loc"),
    )
    nested = flat.groupBy("object_id").agg(
        F.sort_array(F.collect_list("loc")).alias("locations")
    )
    exploded = nested.select(
        "object_id", F.size("locations").alias("n_versions"), F.explode("locations").alias("l")
    )
    return (
        exploded.groupBy("object_id", "n_versions")
        .agg(
            F.max("l.version").alias("max_version"),
            F.sum("l.size").alias("total_bytes"),
            F.countDistinct("l.container_id").alias("n_containers"),
        )
        .orderBy("object_id")
    )


NESTED_SQL = """
SELECT l_orderkey AS object_id,
       count(*) AS n_versions,
       max(l_linenumber) AS max_version,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_bytes,
       count(DISTINCT l_partkey) AS n_containers
FROM lineitem
GROUP BY l_orderkey ORDER BY object_id
"""


def gdpr_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata map column (OmKeyInfo Map<String,String>, gdprEnabled
    flag — OzoneConsts.java:372): build a real MapType column, filter
    on element_at, aggregate. The oracle computes the same partition
    arithmetic directly (the map is a Spark-side representation check)."""
    keys = model.om_keys(spark, sf_dir)
    oid = F.split(F.col("key"), "_")[1].cast("long")
    meta = F.create_map(
        F.lit("gdprEnabled"),
        F.when(oid % 3 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("owner"),
        F.concat(F.lit("user_"), oid % 37),
    )
    tagged = keys.withColumn("metadata", meta)
    return (
        tagged.filter(F.element_at("metadata", "gdprEnabled") == "true")
        .groupBy("volume")
        .agg(F.count(F.lit(1)).alias("gdpr_keys"), F.sum("data_size").alias("gdpr_bytes"))
        .orderBy("volume")
    )


GDPR_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume, count(*) AS gdpr_keys,
       CAST(SUM(data_size) AS BIGINT) AS gdpr_bytes
FROM om_keys
WHERE CAST(split_part(key, '_', 2) AS BIGINT) % 3 = 0
GROUP BY volume ORDER BY volume""",
)

QUERIES["nested_locations_stats"] = nested_locations_stats
QUERIES["gdpr_metadata_filter"] = gdpr_metadata_filter
ORACLES["nested_locations_stats"] = NESTED_SQL
ORACLES["gdpr_metadata_filter"] = GDPR_SQL


# --- T1: trash emptier checkpoint pass (TrashPolicyOzone.java) ------------
#
# Trash subtree synthesized from the namespace: keys on the
# data_size%13 lane live under .Trash/user_<datanode%3>/<checkpoint>/,
# where checkpoint is 'Current' (data_size%3==0) or the creation
# date's compact yyMMddHHmmss stamp — the layout TrashOzoneFileSystem
# serves. Emptier 'now' is fixed at 1998-06-01 with the 180-day
# deletion interval → threshold stamp 971203000000.

_TRASH_EXPIRY_CKPT = "971203000000"


def _trash_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = model.om_keys(spark, sf_dir).filter(F.col("data_size") % 13 == 0)
    ckpt = F.when(F.col("data_size") % 3 == 0, F.lit("Current")).otherwise(
        F.date_format(F.col("creation_time"), "yyMMddHHmmss")
    )
    return keys.select(
        "volume",
        "bucket",
        F.concat(
            F.lit(".Trash/user_"),
            F.col("datanode_id") % 3,
            F.lit("/"),
            ckpt,
            F.lit("/"),
            F.col("key"),
        ).alias("key"),
        "data_size",
    )


def t1_trash_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trash-emptier checkpoint classification over the .Trash subtree
    (operators/mutations.py trash_checkpoint_status law)."""
    return mutations.trash_checkpoint_status(
        _trash_keys(spark, sf_dir), _TRASH_EXPIRY_CKPT
    )


T1_TRASH_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    """trash_keys AS (
  SELECT volume, bucket,
    concat('.Trash/user_', datanode_id % 3, '/',
      CASE WHEN data_size % 3 = 0 THEN 'Current'
           ELSE strftime(creation_time, '%y%m%d%H%M%S') END,
      '/', key) AS key,
    data_size
  FROM om_keys WHERE data_size % 13 = 0
)""",
    body="""SELECT volume, bucket,
  split_part(key, '/', 2) AS trash_user,
  split_part(key, '/', 3) AS checkpoint,
  count(*) AS n_keys,
  CAST(SUM(data_size) AS BIGINT) AS total_bytes,
  CASE WHEN split_part(key, '/', 3) = 'Current' THEN 'TO_CHECKPOINT'
       WHEN split_part(key, '/', 3) < '971203000000' THEN 'DELETE'
       ELSE 'RETAIN' END AS action
FROM trash_keys
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2, 3, 4""",
)

QUERIES["t1_trash_status"] = t1_trash_status
ORACLES["t1_trash_status"] = T1_TRASH_SQL


# --- X12: topology-sorted read locations ----------------------------------

def x12_sorted_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locality-sorted block locations for a key page, client at
    datanode 7 (operators/listing.py sorted_read_locations law)."""
    from hadoop_ozone_spark.operators import listing as listing_ops

    page = (
        model.om_keys(spark, sf_dir)
        .filter(F.col("row_key").startswith("/vol_n/bkt_o/dir2/sub3/"))
        .orderBy("row_key")
        .limit(30)
    )
    return listing_ops.sorted_read_locations(
        page,
        model.container_replicas(spark, sf_dir),
        model.datanodes(spark, sf_dir),
        client_datanode_id=7,
    )


X12_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    model.CONTAINER_REPLICAS_CTE,
    model.DATANODES_CTE,
    """page AS (
  SELECT row_key, container_id FROM om_keys
  WHERE row_key LIKE '/vol_n/bkt_o/dir2/sub3/%'
  ORDER BY row_key LIMIT 30
)""",
    """located AS (
  SELECT p.row_key, r.datanode_id, d.hostname, d.rack,
         (SELECT rack FROM datanodes WHERE datanode_id = 7) AS client_rack
  FROM page p
  JOIN container_replicas r USING (container_id)
  LEFT JOIN datanodes d USING (datanode_id)
)""",
    body="""SELECT row_key, datanode_id,
  COALESCE(hostname, 'UNKNOWN') AS hostname,
  CASE WHEN datanode_id = 7 THEN 0
       WHEN rack IS NULL THEN 2147483647
       WHEN rack = client_rack THEN 2 ELSE 4 END AS distance_cost,
  CAST(row_number() OVER (PARTITION BY row_key ORDER BY
    CASE WHEN datanode_id = 7 THEN 0
         WHEN rack IS NULL THEN 2147483647
         WHEN rack = client_rack THEN 2 ELSE 4 END, datanode_id) AS BIGINT)
    AS read_rank
FROM located
ORDER BY row_key, read_rank""",
)

QUERIES["x12_sorted_locations"] = x12_sorted_locations
ORACLES["x12_sorted_locations"] = X12_SQL


# --- M6b: S3 UploadPartCopy ------------------------------------------------
#
# Copy-part requests synthesized from the namespace: each source key on
# the data_size%17 lane gets part 1 = bytes 100..(100+size div 3) (end
# clamped by the range law when it overruns) and part 2 = whole object
# (NULL range). upload_id = first 16 md5 hex of the source row_key.

def _copy_part_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_a")
        & (F.col("bucket") == "bkt_f")
        & (F.col("data_size") % 17 == 0)
    )
    base = src.select(
        F.col("row_key").alias("source_row_key"),
        F.substring(F.md5(F.col("row_key")), 1, 16).alias("upload_id"),
        F.col("data_size"),
    )
    p1 = base.select(
        "source_row_key", "upload_id",
        F.lit(1).alias("part_number"),
        F.lit(100).cast("long").alias("range_start"),
        (F.lit(100) + F.expr("data_size div 3")).alias("range_end"),
    )
    p2 = base.select(
        "source_row_key", "upload_id",
        F.lit(2).alias("part_number"),
        F.lit(None).cast("long").alias("range_start"),
        F.lit(None).cast("long").alias("range_end"),
    )
    return p1.unionByName(p2)


def m6_copy_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UploadPartCopy: parts registered from existing objects with
    range clamping (operators/s3.py upload_part_copy law)."""
    return s3.upload_part_copy(
        model.om_keys(spark, sf_dir), _copy_part_requests(spark, sf_dir)
    )


M6_COPY_PART_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    """requests AS (
  SELECT row_key AS source_row_key,
    substring(md5(row_key), 1, 16) AS upload_id,
    1 AS part_number,
    CAST(100 AS BIGINT) AS range_start,
    100 + data_size // 3 AS range_end
  FROM om_keys
  WHERE volume = 'vol_a' AND bucket = 'bkt_f' AND data_size % 17 = 0
  UNION ALL
  SELECT row_key, substring(md5(row_key), 1, 16), 2,
    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM om_keys
  WHERE volume = 'vol_a' AND bucket = 'bkt_f' AND data_size % 17 = 0
)""",
    body="""SELECT r.upload_id, r.part_number, r.source_row_key,
  LEAST(COALESCE(r.range_end, k.data_size - 1), k.data_size - 1)
    - COALESCE(r.range_start, 0) + 1 AS data_size,
  md5(concat(r.source_row_key, '#', r.upload_id, '#',
             CAST(r.part_number AS VARCHAR))) AS etag
FROM om_keys k
JOIN requests r ON k.row_key = r.source_row_key
WHERE COALESCE(r.range_start, 0)
      <= LEAST(COALESCE(r.range_end, k.data_size - 1), k.data_size - 1)
ORDER BY r.upload_id, r.part_number""",
)

QUERIES["m6_copy_part"] = m6_copy_part
ORACLES["m6_copy_part"] = M6_COPY_PART_SQL


# --- X13: getFileStatus --------------------------------------------------

def x13_get_file_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ofs stat over three probe paths — an existing directory, the
    namespace-minimum key (FILE), and a missing path
    (operators/listing.py get_file_status law)."""
    from hadoop_ozone_spark.operators import listing as listing_ops

    keys = model.om_keys(spark, sf_dir)
    literal = spark.createDataFrame(
        [("/vol_n/bkt_o/dir2",), ("/vol_x/bkt_y/nope",)], "probe_path string"
    )
    probes = literal.unionByName(
        keys.agg(F.min("row_key").alias("probe_path"))
    )
    return listing_ops.get_file_status(keys, probes)


X13_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    """probes AS (
  SELECT '/vol_n/bkt_o/dir2' AS probe_path
  UNION ALL SELECT '/vol_x/bkt_y/nope'
  UNION ALL SELECT min(row_key) FROM om_keys
)""",
    """votes AS (
  SELECT p.probe_path,
    max(CASE WHEN k.row_key = p.probe_path THEN 1 ELSE 0 END) AS has_exact,
    max(CASE WHEN k.row_key <> p.probe_path THEN 1 ELSE 0 END) AS has_child,
    max(CASE WHEN k.row_key = p.probe_path THEN k.data_size END) AS file_size
  FROM om_keys k
  JOIN probes p
    ON k.row_key = p.probe_path
    OR starts_with(k.row_key, concat(p.probe_path, '/'))
  GROUP BY p.probe_path
)""",
    body="""SELECT p.probe_path,
  CASE WHEN v.has_exact = 1 THEN 'FILE'
       WHEN v.has_child = 1 THEN 'DIRECTORY'
       ELSE 'NOT_FOUND' END AS status,
  CASE WHEN v.has_exact = 1 THEN v.file_size END AS data_size
FROM probes p LEFT JOIN votes v USING (probe_path)
ORDER BY p.probe_path""",
)

QUERIES["x13_get_file_status"] = x13_get_file_status
ORACLES["x13_get_file_status"] = X13_SQL


# --- L1: bucket-link resolution map ---------------------------------------

def l1_bucket_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resolveBucketLink as a resolution MAP over the bucketTable with
    links (operators/listing.py resolve_bucket_links): chains to the
    first non-link, loop pairs flagged. First driver check lands in the
    round-6 window (the round-5 window is committed to its 12 new
    queries + the 38 r2-stale rows)."""
    from hadoop_ozone_spark.operators import listing as listing_ops

    return listing_ops.resolve_bucket_links(model.om_buckets(spark, sf_dir))


# a RECURSIVE member must head the one WITH list, so this oracle is
# assembled directly instead of via model.with_ctes
L1_SQL = f"""WITH RECURSIVE {model.OM_KEYS_CTE.strip().rstrip()},
{model.OM_BUCKETS_CTE.strip()},
walk(volume, bucket, rv, rb, depth) AS (
  SELECT volume, bucket, volume, bucket, 0 FROM om_buckets
  UNION ALL
  SELECT w.volume, w.bucket, b.source_volume, b.source_bucket, w.depth + 1
  FROM walk w
  JOIN om_buckets b ON w.rv = b.volume AND w.rb = b.bucket
  WHERE b.source_volume IS NOT NULL AND w.depth < 16
)
SELECT f.volume, f.bucket,
       f.rv AS resolved_volume, f.rb AS resolved_bucket, f.depth,
       EXISTS (SELECT 1 FROM om_buckets b
               WHERE b.volume = f.rv AND b.bucket = f.rb
                 AND b.source_volume IS NOT NULL) AS is_loop
FROM (
  SELECT *, row_number() OVER (PARTITION BY volume, bucket
                               ORDER BY depth DESC) AS rn
  FROM walk
) f
WHERE f.rn = 1
ORDER BY f.volume, f.bucket"""

QUERIES["l1_bucket_links"] = l1_bucket_links
ORACLES["l1_bucket_links"] = L1_SQL


# --- S3 bucket ACL view (round 6) ------------------------------------------

def s3_bucket_acl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GET /bucket?acl` over every bucket: native OzoneAcl rows →
    S3 grant rows (BucketEndpoint.java:383-421, S3Acl.java:175-219 —
    operators/s3.py bucket_acl_grants)."""
    return s3.bucket_acl_grants(model.s3_native_bucket_acls(spark, sf_dir))


S3_BUCKET_ACL_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    model.S3_NATIVE_BUCKET_ACLS_CTE,
    body="""SELECT DISTINCT volume, bucket,
       concat('owner-', volume) AS owner_id,
       name AS grantee_id, name AS grantee_display_name,
       'CanonicalUser' AS grantee_type,
       CASE WHEN (rights & 128) = 128 THEN 'FULL_CONTROL'
            WHEN (rights & 64) = 64 THEN 'WRITE_ACP'
            WHEN (rights & 32) = 32 THEN 'READ_ACP'
            WHEN (rights & 22) = 22 THEN 'WRITE'
            WHEN (rights & 9) = 9 THEN 'READ'
       END AS permission
FROM s3_native_bucket_acls
WHERE type = 'USER'
  AND CASE WHEN (rights & 128) = 128 THEN 'FULL_CONTROL'
           WHEN (rights & 64) = 64 THEN 'WRITE_ACP'
           WHEN (rights & 32) = 32 THEN 'READ_ACP'
           WHEN (rights & 22) = 22 THEN 'WRITE'
           WHEN (rights & 9) = 9 THEN 'READ'
      END IS NOT NULL
ORDER BY volume, bucket, grantee_id, permission""",
)

QUERIES["s3_bucket_acl"] = s3_bucket_acl
ORACLES["s3_bucket_acl"] = S3_BUCKET_ACL_SQL


# --- U1: /utilization/fileCount residual filters (round 6) -----------------

def u1_file_counts_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Recon utilization endpoint's volume+bucket branch — the
    hand-rolled predicate ladder of UtilizationEndpoint.java:65-101
    served as residual filters over the A1 histogram mart. In Spark
    the ladder IS Catalyst: the same filter pushes into the mart scan
    for every branch combination."""
    from hadoop_ozone_spark.operators import recon

    hist = recon.file_size_histogram(model.om_keys(spark, sf_dir))
    return hist.filter(
        (F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f")
    ).orderBy("file_size")


U1_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body=f"""SELECT volume, bucket,
       {file_size_upper_bound_sql('data_size')} AS file_size,
       count(*) AS cnt
FROM om_keys
WHERE volume = 'vol_a' AND bucket = 'bkt_f'
GROUP BY 1, 2, 3
ORDER BY file_size""",
)

QUERIES["u1_file_counts_filtered"] = u1_file_counts_filtered
ORACLES["u1_file_counts_filtered"] = U1_SQL


# --- A10: audit rate-spike detection (round 6) -----------------------------

def a10_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity bursts ≥2σ above the user's own per-day
    baseline (operators/audit.py rate_spikes)."""
    from hadoop_ozone_spark.operators import audit as audit_ops

    return audit_ops.rate_spikes(model.audit_log(spark, sf_dir))


A10_SQL = model.with_ctes(
    model.AUDIT_LOG_CTE,
    """a10_counts AS (
  SELECT "user", datetime AS bucket_ts, count(*) AS cnt
  FROM audit_log GROUP BY 1, 2
)""",
    """a10_stats AS (
  SELECT "user", count(*) AS n_buckets,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq
  FROM a10_counts GROUP BY 1
)""",
    body="""SELECT c."user", c.bucket_ts, c.cnt,
       round(CAST(s.total AS DOUBLE) / s.n_buckets, 6) AS user_mean,
       round(sqrt(CAST(s.sumsq AS DOUBLE) / s.n_buckets
                  - (CAST(s.total AS DOUBLE) / s.n_buckets)
                    * (CAST(s.total AS DOUBLE) / s.n_buckets)), 6) AS user_std,
       round((c.cnt - CAST(s.total AS DOUBLE) / s.n_buckets)
             / sqrt(CAST(s.sumsq AS DOUBLE) / s.n_buckets
                    - (CAST(s.total AS DOUBLE) / s.n_buckets)
                      * (CAST(s.total AS DOUBLE) / s.n_buckets)), 6) AS z_score
FROM a10_counts c JOIN a10_stats s USING ("user")
WHERE CAST(s.sumsq AS DOUBLE) / s.n_buckets
      - (CAST(s.total AS DOUBLE) / s.n_buckets)
        * (CAST(s.total AS DOUBLE) / s.n_buckets) > 0
  AND (c.cnt - CAST(s.total AS DOUBLE) / s.n_buckets)
      / sqrt(CAST(s.sumsq AS DOUBLE) / s.n_buckets
             - (CAST(s.total AS DOUBLE) / s.n_buckets)
               * (CAST(s.total AS DOUBLE) / s.n_buckets)) >= 2.0
ORDER BY c."user", c.bucket_ts""",
)

QUERIES["a10_rate_spikes"] = a10_rate_spikes
ORACLES["a10_rate_spikes"] = A10_SQL


# --- M9: volume lifecycle plane (round 7) ----------------------------------
#
# The OM volume write requests — the last uncovered OM mutation family:
#   create: exists → VOLUME_ALREADY_EXISTS (OMVolumeCreateRequest.java:
#     151-155), owner at max → USER_TOO_MANY_VOLUMES (OMVolumeRequest
#     .java:104-108, default 1024 OMConfigKeys.java:82-84 — scaled to 8
#     for the plane so both lanes populate at every sf), else CREATED
#     with a set-add into the owner's userTable list (:111-120).
#   delete: missing → VOLUME_NOT_FOUND, non-empty → VOLUME_NOT_EMPTY
#     (OMVolumeDeleteRequest.java:110-112), else DELETED + list remove
#     (OMVolumeRequest.java:63-85).
#   setOwner: missing → VOLUME_NOT_FOUND; same owner → OK no-op
#     (OMVolumeSetOwnerRequest.java:132-144); new owner at max →
#     USER_TOO_MANY_VOLUMES (:152-155); else TRANSFERRED (old list
#     remove + new list add).
#
# Plane: 37 owners (uid = c_custkey % 37), owner uid holds slots
# 0..uid % 11 ('uvol_{uid}_{slot}'), slot non-empty iff
# (uid + slot) % 3 == 0 — per-owner counts are 1..11 at EVERY sf, so
# the max-volume lanes are sf-independent. Requests are evaluated
# against the pre-state (one Raft batch, no intra-batch dependency).
# Scale shape: the store is a dim by construction; every join
# broadcasts.

M9_MAX_USER_VOLUME = 8


def _m9_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    uids = (
        model.load(spark, sf_dir, "customer")
        .select((F.col("c_custkey") % 37).alias("uid"))
        .distinct()
    )
    return uids.select(
        "uid",
        F.explode(F.sequence(F.lit(0), F.col("uid") % 11)).alias("slot"),
    ).select(
        F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_"), F.col("slot")).alias(
            "volume"
        ),
        F.concat(F.lit("user_"), F.col("uid")).alias("owner"),
        F.col("uid"),
        ((F.col("uid") + F.col("slot")) % 3 == 0).alias("non_empty"),
    )


def m9_volume_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision plane for a batch of volume create/delete/setOwner
    requests against the synthesized volumeTable + userTable state."""
    store = _m9_store(spark, sf_dir)
    counts = store.groupBy("owner").agg(F.count(F.lit(1)).alias("own_cnt"))
    uids = store.select("uid").distinct()
    req = uids.select(
        "uid",
        F.explode(
            F.array(
                F.struct(
                    F.lit("CREATE").alias("op"),
                    F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_new")).alias(
                        "volume"
                    ),
                    F.lit(None).cast("string").alias("new_owner"),
                ),
                F.struct(
                    F.lit("CREATE").alias("op"),
                    F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_0")).alias(
                        "volume"
                    ),
                    F.lit(None).cast("string").alias("new_owner"),
                ),
                F.struct(
                    F.lit("DELETE").alias("op"),
                    F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_0")).alias(
                        "volume"
                    ),
                    F.lit(None).cast("string").alias("new_owner"),
                ),
                F.struct(
                    F.lit("DELETE").alias("op"),
                    F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_ghost")).alias(
                        "volume"
                    ),
                    F.lit(None).cast("string").alias("new_owner"),
                ),
                F.struct(
                    F.lit("SET_OWNER").alias("op"),
                    F.concat(F.lit("uvol_"), F.col("uid"), F.lit("_1")).alias(
                        "volume"
                    ),
                    F.when(
                        F.col("uid") % 5 == 0,
                        F.concat(F.lit("user_"), F.col("uid")),
                    )
                    .otherwise(
                        F.concat(F.lit("user_"), (F.col("uid") + 1) % 37)
                    )
                    .alias("new_owner"),
                ),
            )
        ).alias("r"),
    ).select("uid", "r.op", "r.volume", "r.new_owner")
    requester = F.concat(F.lit("user_"), F.col("uid"))
    j = (
        req.join(F.broadcast(store.select("volume", "owner", "non_empty")),
                 "volume", "left")
        .join(
            F.broadcast(counts.withColumnRenamed("owner", "req_owner")
                        .withColumnRenamed("own_cnt", "req_cnt")),
            requester == F.col("req_owner"),
            "left",
        )
        .join(
            F.broadcast(counts.withColumnRenamed("owner", "tgt_owner")
                        .withColumnRenamed("own_cnt", "tgt_cnt")),
            F.col("new_owner") == F.col("tgt_owner"),
            "left",
        )
    )
    exists = F.col("owner").isNotNull()
    decision = (
        F.when(
            (F.col("op") == "CREATE") & exists, F.lit("VOLUME_ALREADY_EXISTS")
        )
        .when(
            (F.col("op") == "CREATE")
            & (F.coalesce(F.col("req_cnt"), F.lit(0)) >= M9_MAX_USER_VOLUME),
            F.lit("USER_TOO_MANY_VOLUMES"),
        )
        .when(F.col("op") == "CREATE", F.lit("CREATED"))
        .when((F.col("op") == "DELETE") & ~exists, F.lit("VOLUME_NOT_FOUND"))
        .when(
            (F.col("op") == "DELETE") & F.col("non_empty"),
            F.lit("VOLUME_NOT_EMPTY"),
        )
        .when(F.col("op") == "DELETE", F.lit("DELETED"))
        .when(~exists, F.lit("VOLUME_NOT_FOUND"))
        .when(F.col("owner") == F.col("new_owner"), F.lit("OK_NOOP"))
        .when(
            F.coalesce(F.col("tgt_cnt"), F.lit(0)) >= M9_MAX_USER_VOLUME,
            F.lit("USER_TOO_MANY_VOLUMES"),
        )
        .otherwise(F.lit("TRANSFERRED"))
    )
    return j.select(
        "op", "volume", "new_owner", decision.alias("decision")
    ).orderBy("op", "volume")


M9_UIDS_CTE = """
m9_uids AS (SELECT DISTINCT c_custkey % 37 AS uid FROM customer),
m9_store AS (
  SELECT concat('uvol_', uid, '_', s.slot) AS volume,
         concat('user_', uid) AS owner, uid,
         (uid + s.slot) % 3 = 0 AS non_empty
  FROM m9_uids, LATERAL (
    SELECT unnest(generate_series(0, uid % 11)) AS slot
  ) s
),
m9_counts AS (SELECT owner, count(*) AS own_cnt FROM m9_store GROUP BY owner),
m9_req AS (
  SELECT uid, 'CREATE' AS op, concat('uvol_', uid, '_new') AS volume,
         CAST(NULL AS VARCHAR) AS new_owner FROM m9_uids
  UNION ALL
  SELECT uid, 'CREATE', concat('uvol_', uid, '_0'), NULL FROM m9_uids
  UNION ALL
  SELECT uid, 'DELETE', concat('uvol_', uid, '_0'), NULL FROM m9_uids
  UNION ALL
  SELECT uid, 'DELETE', concat('uvol_', uid, '_ghost'), NULL FROM m9_uids
  UNION ALL
  SELECT uid, 'SET_OWNER', concat('uvol_', uid, '_1'),
         CASE WHEN uid % 5 = 0 THEN concat('user_', uid)
              ELSE concat('user_', (uid + 1) % 37) END
  FROM m9_uids
),
m9_decisions AS (
  SELECT r.op, r.volume, r.new_owner,
    CASE
      WHEN r.op = 'CREATE' AND s.owner IS NOT NULL
        THEN 'VOLUME_ALREADY_EXISTS'
      WHEN r.op = 'CREATE' AND COALESCE(rc.own_cnt, 0) >= 8
        THEN 'USER_TOO_MANY_VOLUMES'
      WHEN r.op = 'CREATE' THEN 'CREATED'
      WHEN r.op = 'DELETE' AND s.owner IS NULL THEN 'VOLUME_NOT_FOUND'
      WHEN r.op = 'DELETE' AND s.non_empty THEN 'VOLUME_NOT_EMPTY'
      WHEN r.op = 'DELETE' THEN 'DELETED'
      WHEN s.owner IS NULL THEN 'VOLUME_NOT_FOUND'
      WHEN s.owner = r.new_owner THEN 'OK_NOOP'
      WHEN COALESCE(tc.own_cnt, 0) >= 8 THEN 'USER_TOO_MANY_VOLUMES'
      ELSE 'TRANSFERRED'
    END AS decision,
    s.owner AS cur_owner, concat('user_', r.uid) AS requester
  FROM m9_req r
  LEFT JOIN m9_store s ON r.volume = s.volume
  LEFT JOIN m9_counts rc ON rc.owner = concat('user_', r.uid)
  LEFT JOIN m9_counts tc ON tc.owner = r.new_owner
)"""

M9_SQL = model.with_ctes(
    M9_UIDS_CTE,
    body="""SELECT op, volume, new_owner, decision FROM m9_decisions
ORDER BY op, volume""",
)

QUERIES["m9_volume_lifecycle"] = m9_volume_lifecycle
ORACLES["m9_volume_lifecycle"] = M9_SQL


def m9_user_volume_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """userTable maintenance law: per-owner volume count before and
    after the request batch (accepted CREATEs add, DELETEs remove,
    TRANSFERs move — the addVolumeToOwnerList/delVolumeFromOwnerList
    pair, OMVolumeRequest.java:63-120)."""
    store = _m9_store(spark, sf_dir)
    decisions = m9_volume_lifecycle(spark, sf_dir)
    # re-derive requester/current-owner context the same way the plane
    # builds them (volume string encodes the requester uid)
    uid_of = F.split(F.col("volume"), "_").getItem(1).cast("int")
    d = decisions.select(
        "op",
        "volume",
        "new_owner",
        "decision",
        F.concat(F.lit("user_"), uid_of).alias("requester"),
    )
    before = store.groupBy("owner").agg(F.count(F.lit(1)).alias("before_cnt"))
    created = (
        d.filter(F.col("decision") == "CREATED")
        .groupBy(F.col("requester").alias("owner"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    deleted = (
        d.filter(F.col("decision") == "DELETED")
        .groupBy(F.col("requester").alias("owner"))
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    out_x = (
        d.filter(F.col("decision") == "TRANSFERRED")
        .groupBy(F.col("requester").alias("owner"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    in_x = (
        d.filter(F.col("decision") == "TRANSFERRED")
        .groupBy(F.col("new_owner").alias("owner"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        before.join(created, "owner", "left")
        .join(deleted, "owner", "left")
        .join(out_x, "owner", "left")
        .join(in_x, "owner", "left")
        .select(
            "owner",
            "before_cnt",
            (
                F.col("before_cnt")
                + F.coalesce(F.col("c"), F.lit(0))
                - F.coalesce(F.col("dl"), F.lit(0))
                - F.coalesce(F.col("o"), F.lit(0))
                + F.coalesce(F.col("i"), F.lit(0))
            ).alias("after_cnt"),
        )
        .orderBy("owner")
    )


M9_LIST_SQL = model.with_ctes(
    M9_UIDS_CTE,
    body="""SELECT b.owner, b.before_cnt,
  b.before_cnt
    + COALESCE(c.c, 0) - COALESCE(dl.dl, 0)
    - COALESCE(o.o, 0) + COALESCE(i.i, 0) AS after_cnt
FROM (SELECT owner, count(*) AS before_cnt FROM m9_store GROUP BY owner) b
LEFT JOIN (SELECT requester AS owner, count(*) AS c FROM m9_decisions
           WHERE decision = 'CREATED' GROUP BY 1) c USING (owner)
LEFT JOIN (SELECT requester AS owner, count(*) AS dl FROM m9_decisions
           WHERE decision = 'DELETED' GROUP BY 1) dl USING (owner)
LEFT JOIN (SELECT requester AS owner, count(*) AS o FROM m9_decisions
           WHERE decision = 'TRANSFERRED' GROUP BY 1) o USING (owner)
LEFT JOIN (SELECT new_owner AS owner, count(*) AS i FROM m9_decisions
           WHERE decision = 'TRANSFERRED' GROUP BY 1) i USING (owner)
ORDER BY b.owner""",
)

QUERIES["m9_user_volume_list"] = m9_user_volume_list
ORACLES["m9_user_volume_list"] = M9_LIST_SQL


# --- M10: bucket create ladder (round 7) -----------------------------------
#
# OMBucketCreateRequest.validateAndUpdateCache: volume missing →
# VOLUME_NOT_FOUND (:190-192); bucket exists → BUCKET_ALREADY_EXISTS
# (:196-198); then checkQuotaBytesValid (:335-381) — only when the
# REQUESTED bucket quota is positive (<=0 returns false, no check):
# the volume's bucket-quota sum (existing positive quotas + the
# request) must fit the volume byte quota unless that is unlimited
# (-1); then checkQuotaInNamespace (:319-333) — positive volume
# namespace quota must cover usedNamespace + 1; else CREATED. The
# check ORDER (bytes before namespace, :202 vs :215) is part of the
# law: a request failing both reports QUOTA_BYTES_INVALID.
#
# Plane: m9's volumes (uid-slot grid, sf-independent), each holding
# 1..3 buckets ('b_0'..'b_2' by (uid+slot)%3); odd buckets carry a
# 60-byte quota, volume byte quota 100 unless uid%5==0 (-1),
# namespace quota -1/1/5 by uid%4, request quota -1/50 by uid%2.

def m10_bucket_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _m9_store(spark, sf_dir)
    vols = store.select(
        "volume",
        "uid",
        F.element_at(
            F.array(F.lit(-1), F.lit(1), F.lit(5), F.lit(5)),
            (F.col("uid") % 4 + 1).cast("int"),
        ).alias("quota_ns"),
        F.when(F.col("uid") % 5 == 0, F.lit(-1)).otherwise(F.lit(100)).alias(
            "quota_bytes"
        ),
    )
    slot_of = F.split(F.col("volume"), "_").getItem(2).cast("int")
    n_buckets = (F.col("uid") + slot_of) % 3 + 1
    buckets = vols.select(
        "volume",
        F.explode(F.sequence(F.lit(0), n_buckets - 1)).alias("b"),
    ).select(
        "volume",
        F.concat(F.lit("b_"), F.col("b")).alias("bucket"),
        F.when(F.col("b") % 2 == 1, F.lit(60)).otherwise(F.lit(-1)).alias(
            "bkt_quota"
        ),
    )
    per_vol = buckets.groupBy("volume").agg(
        F.count(F.lit(1)).alias("used_ns"),
        F.sum(F.when(F.col("bkt_quota") > 0, F.col("bkt_quota")).otherwise(0)).alias(
            "quota_sum"
        ),
    )
    req_quota = F.when(F.col("uid") % 2 == 0, F.lit(-1)).otherwise(F.lit(50))
    reqs = vols.select(
        "volume", "uid", "quota_ns", "quota_bytes"
    ).select(
        "*",
        F.explode(
            F.array(
                F.struct(F.lit("b_new").alias("bucket"), req_quota.alias("req_qb"),
                         F.lit(False).alias("ghost")),
                F.struct(F.lit("b_0").alias("bucket"), req_quota.alias("req_qb"),
                         F.lit(False).alias("ghost")),
                F.struct(F.lit("b_new").alias("bucket"), req_quota.alias("req_qb"),
                         F.lit(True).alias("ghost")),
            )
        ).alias("r"),
    ).select(
        F.when(F.col("r.ghost"), F.concat(F.col("volume"), F.lit("_ghost")))
        .otherwise(F.col("volume")).alias("volume"),
        F.col("r.bucket").alias("bucket"),
        F.col("r.req_qb").alias("req_qb"),
        "quota_ns", "quota_bytes",
        F.col("r.ghost").alias("ghost"),
    )
    j = reqs.join(F.broadcast(per_vol), "volume", "left")
    decision = (
        F.when(F.col("ghost"), F.lit("VOLUME_NOT_FOUND"))
        .when(F.col("bucket") == "b_0", F.lit("BUCKET_ALREADY_EXISTS"))
        .when(
            (F.col("req_qb") > 0)
            & (F.col("quota_bytes") != -1)
            & (F.col("quota_sum") + F.col("req_qb") > F.col("quota_bytes")),
            F.lit("QUOTA_BYTES_INVALID"),
        )
        .when(
            (F.col("quota_ns") > 0)
            & (F.col("used_ns") + 1 > F.col("quota_ns")),
            F.lit("QUOTA_EXCEEDED"),
        )
        .otherwise(F.lit("CREATED"))
    )
    return j.select(
        "volume", "bucket", "req_qb", decision.alias("decision")
    ).orderBy("volume", "bucket", "req_qb")


M10_SQL = model.with_ctes(
    M9_UIDS_CTE,
    """m10_vols AS (
  SELECT volume, uid,
         CASE uid % 4 WHEN 0 THEN -1 WHEN 1 THEN 1 ELSE 5 END AS quota_ns,
         CASE WHEN uid % 5 = 0 THEN -1 ELSE 100 END AS quota_bytes,
         CAST(string_split(volume, '_')[3] AS INT) AS slot
  FROM m9_store
)""",
    """m10_buckets AS (
  SELECT volume, concat('b_', s.b) AS bucket,
         CASE WHEN s.b % 2 = 1 THEN 60 ELSE -1 END AS bkt_quota
  FROM m10_vols, LATERAL (
    SELECT unnest(generate_series(0, (uid + slot) % 3)) AS b
  ) s
)""",
    """m10_per_vol AS (
  SELECT volume, count(*) AS used_ns,
         CAST(SUM(CASE WHEN bkt_quota > 0 THEN bkt_quota ELSE 0 END) AS BIGINT)
           AS quota_sum
  FROM m10_buckets GROUP BY volume
)""",
    """m10_reqs AS (
  SELECT CASE WHEN r.ghost THEN concat(volume, '_ghost') ELSE volume END
           AS volume,
         r.bucket, r.req_qb, quota_ns, quota_bytes, r.ghost
  FROM m10_vols, LATERAL (
    SELECT * FROM (VALUES
      ('b_new', CASE WHEN uid % 2 = 0 THEN -1 ELSE 50 END, false),
      ('b_0',   CASE WHEN uid % 2 = 0 THEN -1 ELSE 50 END, false),
      ('b_new', CASE WHEN uid % 2 = 0 THEN -1 ELSE 50 END, true)
    ) AS t(bucket, req_qb, ghost)
  ) r
)""",
    body="""SELECT r.volume, r.bucket, r.req_qb,
  CASE
    WHEN r.ghost THEN 'VOLUME_NOT_FOUND'
    WHEN r.bucket = 'b_0' THEN 'BUCKET_ALREADY_EXISTS'
    WHEN r.req_qb > 0 AND r.quota_bytes <> -1
         AND p.quota_sum + r.req_qb > r.quota_bytes
      THEN 'QUOTA_BYTES_INVALID'
    WHEN r.quota_ns > 0 AND p.used_ns + 1 > r.quota_ns
      THEN 'QUOTA_EXCEEDED'
    ELSE 'CREATED'
  END AS decision
FROM m10_reqs r LEFT JOIN m10_per_vol p USING (volume)
ORDER BY r.volume, r.bucket, r.req_qb""",
)

QUERIES["m10_bucket_create"] = m10_bucket_create
ORACLES["m10_bucket_create"] = M10_SQL


# --- M11/M12: OBS createDirectory / createFile walk planes (round 7) -------
#
# OMDirectoryCreateRequest.validateAndUpdateCache (:125-230): empty key
# → CANNOT_CREATE_DIRECTORY_AT_ROOT (:164-167, checked before the
# bucket probe); missing volume/bucket → VOLUME_NOT_FOUND /
# BUCKET_NOT_FOUND; then the verifyFilesInPath walk
# (OMFileRequest.java:80-149): deepest FILE on the ancestor chain →
# FILE_ALREADY_EXISTS (:186-190), dir entry AT the requested leaf →
# DIRECTORY_ALREADY_EXISTS (:211-218); otherwise the missing parents
# materialize under the per-txn objId budget — more than
# MAX_NUM_OF_RECURSIVE_DIRS=255 of them → INVALID_KEY_NAME
# (getAllParentInfo :261-275; parents take baseObjId+1.., so the 256th
# parent overflows the budget).
#
# OMFileCreateRequest (:214-218; checkDirectoryResult :353-369;
# checkAllParentsExist :378-388): empty key → NOT_A_FILE (before the
# bucket probe); leaf FILE → FILE_ALREADY_EXISTS unless overWrite;
# leaf DIR or mid-chain FILE → NOT_A_FILE; missing direct parent
# without recursive → DIRECTORY_NOT_FOUND; else created (recursive
# materializes the chain like mkdir).
#
# Plane: sampled om_keys rows (container %200 ∧ datanode %5 — 60 rows
# at sf0.01, sf-proportional) × request lanes. Explicit-dir entries —
# the OBS keyTable stores explicitly-created dirs as their own rows —
# are the deterministic subset dirK (K even) and dirK/subJ ((K+J)%3=0)
# of the implied tree, so every walk outcome appears in the plane.

def _m11_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return model.om_keys(spark, sf_dir).filter(
        (F.col("container_id") % 200 == 0) & (F.col("datanode_id") % 5 == 0)
    )


def _m11_dirs(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = model.om_keys(spark, sf_dir)
    c = F.split(F.col("key"), "/")
    top = (
        keys.select("volume", "bucket", c.getItem(0).alias("key"))
        .distinct()
        .filter(F.substring("key", 4, 10).cast("int") % 2 == 0)
    )
    sub = (
        keys.select(
            "volume",
            "bucket",
            F.concat_ws("/", F.slice(c, F.lit(1), F.lit(2))).alias("key"),
            (
                F.substring(c.getItem(0), 4, 10).cast("int")
                + F.substring(c.getItem(1), 4, 10).cast("int")
            ).alias("kj"),
        )
        .distinct()
        .filter(F.col("kj") % 3 == 0)
        .select("volume", "bucket", "key")
    )
    return top.unionByName(sub)


def _deep_path():
    return F.concat_ws(
        "/",
        F.transform(
            F.sequence(F.lit(1), F.lit(257)),
            lambda i: F.concat(F.lit("d"), i.cast("string")),
        ),
    )


def _lane(name: str, vol, bkt, path) -> F.Column:
    return F.struct(
        F.lit(name).alias("lane"),
        vol.alias("rvol"),
        bkt.alias("rbkt"),
        path.alias("path"),
    )


def _walk_requests(spark: SparkSession, sf_dir: str, lanes) -> DataFrame:
    s = _m11_sample(spark, sf_dir)
    return s.select(
        "row_key",
        "container_id",
        "data_size",
        F.explode(lanes).alias("r"),
    ).select(
        F.concat_ws("#", "row_key", "r.lane").alias("req_id"),
        F.col("r.lane").alias("lane"),
        F.col("r.rvol").alias("volume"),
        F.col("r.rbkt").alias("bucket"),
        F.col("r.path").alias("path"),
        "container_id",
        "data_size",
    )


def _m11_lanes():
    vol, bkt = F.col("volume"), F.col("bucket")
    c = F.split(F.col("key"), "/")
    top = c.getItem(0)
    sub = F.concat_ws("/", F.slice(c, F.lit(1), F.lit(2)))
    uniq = F.concat_ws("_", "container_id", "datanode_id", "data_size")
    return F.array(
        _lane("self", vol, bkt, F.col("key")),
        _lane("under_file", vol, bkt, F.concat(F.col("key"), F.lit("/x"))),
        _lane("top", vol, bkt, top),
        _lane("fresh", vol, bkt, F.concat(sub, F.lit("/nd_"), uniq)),
        _lane("ghost_vol", F.concat(vol, F.lit("_ghost")), bkt, top),
        _lane("ghost_bkt", vol, F.concat(bkt, F.lit("_ghost")), top),
        _lane("root", vol, bkt, F.lit("")),
        _lane("deep", vol, bkt, _deep_path()),
    )


def m11_dir_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: the createDirectory decision plane over the walked chain."""
    reqs = _walk_requests(spark, sf_dir, _m11_lanes()).drop(
        "container_id", "data_size"
    )
    keys = model.om_keys(spark, sf_dir).select("volume", "bucket", "key")
    walked = mutations.ancestor_walk(reqs, keys, _m11_dirs(spark, sf_dir))
    decision = (
        F.when(F.col("lane") == "root", F.lit("CANNOT_CREATE_DIRECTORY_AT_ROOT"))
        .when(F.col("lane") == "ghost_vol", F.lit("VOLUME_NOT_FOUND"))
        .when(F.col("lane") == "ghost_bkt", F.lit("BUCKET_NOT_FOUND"))
        .when(F.col("hit_is_file"), F.lit("FILE_ALREADY_EXISTS"))
        .when(
            (~F.col("hit_is_file"))
            & (F.col("hit_depth") > 0)
            & (F.col("hit_depth") == F.col("n_comp")),
            F.lit("DIRECTORY_ALREADY_EXISTS"),
        )
        .when(F.col("n_missing") > 255, F.lit("INVALID_KEY_NAME"))
        .otherwise(F.lit("CREATED"))
    )
    return (
        walked.select(
            "req_id",
            "lane",
            "volume",
            "bucket",
            "path",
            decision.alias("decision"),
            F.when(decision == "CREATED", F.col("n_missing"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("created_parents"),
        )
        .orderBy("req_id")
    )


def _m12_lanes():
    vol, bkt = F.col("volume"), F.col("bucket")
    c = F.split(F.col("key"), "/")
    top = c.getItem(0)
    sub = F.concat_ws("/", F.slice(c, F.lit(1), F.lit(2)))
    uniq = F.concat_ws("_", "container_id", "datanode_id", "data_size")
    fresh = F.concat(sub, F.lit("/nf_"), uniq)
    return F.array(
        _lane("self", vol, bkt, F.col("key")),
        _lane("under_file", vol, bkt, F.concat(F.col("key"), F.lit("/x"))),
        _lane("dir_target", vol, bkt, top),
        _lane("fresh", vol, bkt, fresh),
        _lane("fresh_deep", vol, bkt, F.concat(fresh, F.lit("/leaf"))),
        _lane("ghost_vol", F.concat(vol, F.lit("_ghost")), bkt, top),
        _lane("ghost_bkt", vol, F.concat(bkt, F.lit("_ghost")), top),
        _lane("empty", vol, bkt, F.lit("")),
    )


def m12_file_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: the createFile decision plane (overWrite/recursive flags)."""
    reqs = _walk_requests(spark, sf_dir, _m12_lanes()).select(
        "req_id",
        "lane",
        "volume",
        "bucket",
        "path",
        (F.col("container_id") % 400 == 0).alias("overwrite"),
        (F.col("data_size") % 2 == 0).alias("recursive"),
    )
    keys = model.om_keys(spark, sf_dir).select("volume", "bucket", "key")
    walked = mutations.ancestor_walk(reqs, keys, _m11_dirs(spark, sf_dir))
    leaf_file = F.col("hit_is_file") & (F.col("hit_depth") == F.col("n_comp"))
    decision = (
        F.when(F.col("lane") == "empty", F.lit("NOT_A_FILE"))
        .when(F.col("lane") == "ghost_vol", F.lit("VOLUME_NOT_FOUND"))
        .when(F.col("lane") == "ghost_bkt", F.lit("BUCKET_NOT_FOUND"))
        .when(leaf_file & F.col("overwrite"), F.lit("OVERWRITTEN"))
        .when(leaf_file, F.lit("FILE_ALREADY_EXISTS"))
        .when(F.col("hit_is_file"), F.lit("NOT_A_FILE"))
        .when(
            (F.col("hit_depth") > 0) & (F.col("hit_depth") == F.col("n_comp")),
            F.lit("NOT_A_FILE"),
        )
        .when(
            (F.col("n_missing") > 0) & (~F.col("recursive")),
            F.lit("DIRECTORY_NOT_FOUND"),
        )
        .otherwise(F.lit("CREATED"))
    )
    created = decision.isin("CREATED", "OVERWRITTEN")
    return (
        walked.select(
            "req_id",
            "lane",
            "volume",
            "bucket",
            "path",
            "overwrite",
            "recursive",
            decision.alias("decision"),
            F.when(created, F.col("n_missing"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("created_parents"),
        )
        .orderBy("req_id")
    )


_M11_SAMPLE_CTE = """m11_sample AS (
  SELECT * FROM om_keys
  WHERE container_id % 200 = 0 AND datanode_id % 5 = 0
)"""

_M11_DIRS_CTE = """m11_dirs AS (
  SELECT DISTINCT volume, bucket, string_split(key, '/')[1] AS key
  FROM om_keys
  WHERE CAST(substr(string_split(key, '/')[1], 4) AS INT) % 2 = 0
  UNION ALL
  SELECT DISTINCT volume, bucket,
         array_to_string((string_split(key, '/'))[1:2], '/') AS key
  FROM om_keys
  WHERE (CAST(substr(string_split(key, '/')[1], 4) AS INT)
       + CAST(substr(string_split(key, '/')[2], 4) AS INT)) % 3 = 0
)"""

_DEEP_PATH_SQL = (
    "array_to_string(list_transform(generate_series(1, 257), i -> 'd' || i), '/')"
)


def _walk_ctes(reqs_cte: str) -> list[str]:
    """anc/walk CTEs shared by the M11 and M12 oracles (the reqs CTE
    must expose req_id, lane, volume, bucket, path)."""
    return [
        reqs_cte,
        """walk_anc AS (
  SELECT req_id, volume, bucket, d.depth,
         array_to_string((string_split(path, '/'))[1:d.depth], '/') AS anc_path
  FROM walk_reqs, LATERAL (
    SELECT unnest(generate_series(1, len(string_split(path, '/')))) AS depth
  ) d
)""",
        """walk AS (
  SELECT r.*,
         GREATEST(COALESCE(f.fd, 0), COALESCE(dd.dd, 0)) AS hit_depth,
         (COALESCE(f.fd, 0) >= COALESCE(dd.dd, 0)
          AND COALESCE(f.fd, 0) > 0) AS hit_is_file,
         GREATEST(len(string_split(r.path, '/')) - 1
                  - GREATEST(COALESCE(f.fd, 0), COALESCE(dd.dd, 0)), 0)
           AS n_missing,
         len(string_split(r.path, '/')) AS n_comp
  FROM walk_reqs r
  LEFT JOIN (SELECT a.req_id, max(a.depth) AS fd FROM walk_anc a
             JOIN om_keys k ON k.volume = a.volume AND k.bucket = a.bucket
                           AND k.key = a.anc_path
             GROUP BY a.req_id) f USING (req_id)
  LEFT JOIN (SELECT a.req_id, max(a.depth) AS dd FROM walk_anc a
             JOIN m11_dirs k ON k.volume = a.volume AND k.bucket = a.bucket
                            AND k.key = a.anc_path
             GROUP BY a.req_id) dd USING (req_id)
)""",
    ]


_M11_REQS_CTE = f"""walk_reqs AS (
  SELECT concat(row_key, '#', r.lane) AS req_id, r.lane,
         r.rvol AS volume, r.rbkt AS bucket, r.path
  FROM m11_sample s, LATERAL (
    SELECT * FROM (VALUES
      ('self',       s.volume, s.bucket, s.key),
      ('under_file', s.volume, s.bucket, concat(s.key, '/x')),
      ('top',        s.volume, s.bucket, string_split(s.key, '/')[1]),
      ('fresh',      s.volume, s.bucket,
         concat(array_to_string((string_split(s.key, '/'))[1:2], '/'),
                '/nd_', s.container_id, '_', s.datanode_id, '_', s.data_size)),
      ('ghost_vol',  concat(s.volume, '_ghost'), s.bucket,
         string_split(s.key, '/')[1]),
      ('ghost_bkt',  s.volume, concat(s.bucket, '_ghost'),
         string_split(s.key, '/')[1]),
      ('root',       s.volume, s.bucket, ''),
      ('deep',       s.volume, s.bucket, {_DEEP_PATH_SQL})
    ) AS t(lane, rvol, rbkt, path)
  ) r
)"""

M11_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _M11_SAMPLE_CTE,
    _M11_DIRS_CTE,
    *_walk_ctes(_M11_REQS_CTE),
    body="""SELECT req_id, lane, volume, bucket, path,
  decision,
  CAST(CASE WHEN decision = 'CREATED' THEN n_missing ELSE 0 END AS BIGINT)
    AS created_parents
FROM (
  SELECT *,
    CASE
      WHEN lane = 'root' THEN 'CANNOT_CREATE_DIRECTORY_AT_ROOT'
      WHEN lane = 'ghost_vol' THEN 'VOLUME_NOT_FOUND'
      WHEN lane = 'ghost_bkt' THEN 'BUCKET_NOT_FOUND'
      WHEN hit_is_file THEN 'FILE_ALREADY_EXISTS'
      WHEN NOT hit_is_file AND hit_depth > 0 AND hit_depth = n_comp
        THEN 'DIRECTORY_ALREADY_EXISTS'
      WHEN n_missing > 255 THEN 'INVALID_KEY_NAME'
      ELSE 'CREATED'
    END AS decision
  FROM walk
) ORDER BY req_id""",
)

_M12_REQS_CTE = """walk_reqs AS (
  SELECT concat(row_key, '#', r.lane) AS req_id, r.lane,
         r.rvol AS volume, r.rbkt AS bucket, r.path,
         s.container_id % 400 = 0 AS overwrite,
         s.data_size % 2 = 0 AS recursive
  FROM m11_sample s, LATERAL (
    SELECT * FROM (VALUES
      ('self',       s.volume, s.bucket, s.key),
      ('under_file', s.volume, s.bucket, concat(s.key, '/x')),
      ('dir_target', s.volume, s.bucket, string_split(s.key, '/')[1]),
      ('fresh',      s.volume, s.bucket,
         concat(array_to_string((string_split(s.key, '/'))[1:2], '/'),
                '/nf_', s.container_id, '_', s.datanode_id, '_', s.data_size)),
      ('fresh_deep', s.volume, s.bucket,
         concat(array_to_string((string_split(s.key, '/'))[1:2], '/'),
                '/nf_', s.container_id, '_', s.datanode_id, '_', s.data_size,
                '/leaf')),
      ('ghost_vol',  concat(s.volume, '_ghost'), s.bucket,
         string_split(s.key, '/')[1]),
      ('ghost_bkt',  s.volume, concat(s.bucket, '_ghost'),
         string_split(s.key, '/')[1]),
      ('empty',      s.volume, s.bucket, '')
    ) AS t(lane, rvol, rbkt, path)
  ) r
)"""

M12_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _M11_SAMPLE_CTE,
    _M11_DIRS_CTE,
    *_walk_ctes(_M12_REQS_CTE),
    body="""SELECT req_id, lane, volume, bucket, path, overwrite, recursive,
  decision,
  CAST(CASE WHEN decision IN ('CREATED', 'OVERWRITTEN') THEN n_missing
            ELSE 0 END AS BIGINT) AS created_parents
FROM (
  SELECT *,
    CASE
      WHEN lane = 'empty' THEN 'NOT_A_FILE'
      WHEN lane = 'ghost_vol' THEN 'VOLUME_NOT_FOUND'
      WHEN lane = 'ghost_bkt' THEN 'BUCKET_NOT_FOUND'
      WHEN hit_is_file AND hit_depth = n_comp AND overwrite
        THEN 'OVERWRITTEN'
      WHEN hit_is_file AND hit_depth = n_comp THEN 'FILE_ALREADY_EXISTS'
      WHEN hit_is_file THEN 'NOT_A_FILE'
      WHEN hit_depth > 0 AND hit_depth = n_comp THEN 'NOT_A_FILE'
      WHEN n_missing > 0 AND NOT recursive THEN 'DIRECTORY_NOT_FOUND'
      ELSE 'CREATED'
    END AS decision
  FROM walk
) ORDER BY req_id""",
)

QUERIES["m11_dir_create"] = m11_dir_create
ORACLES["m11_dir_create"] = M11_SQL
QUERIES["m12_file_create"] = m12_file_create
ORACLES["m12_file_create"] = M12_SQL


# --- M13: bucket setProperty ladder (round 7) ------------------------------
#
# OMBucketSetPropertyRequest.validateAndUpdateCache (:128-190): bucket
# missing → BUCKET_NOT_FOUND (:135-136); checkQuotaBytesValid
# (:247-288) — clearing the bucket byte quota (-1) while the VOLUME
# byte quota is set → QUOTA_ERROR (:252-257); quota <-1 or absent (0)
# → keep the stored value (:259-261); a positive request must fit the
# volume byte quota against the OTHER buckets' positive-quota sum
# (:263-286, strict `<` — equality fits); checkQuotaNamespaceValid
# (:289-297) — <-1 or 0 keeps, anything else (incl. -1 clear)
# applies. storageType / versioning apply iff present in the request
# (:147-166); any quota exception aborts the whole request, so error
# rows keep every stored value. Store: the m10 bucket grid (target
# b_0 carries quota -1, namespace quota -1, versioning off, DISK).

def m13_bucket_set_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _m9_store(spark, sf_dir)
    slot_of = F.split(F.col("volume"), "_").getItem(2).cast("int")
    vols = store.select(
        "volume",
        "uid",
        F.when(F.col("uid") % 5 == 0, F.lit(-1)).otherwise(F.lit(100)).alias(
            "vol_qb"
        ),
        slot_of.alias("slot"),
    )
    n_buckets = (F.col("uid") + F.col("slot")) % 3 + 1
    buckets = vols.select(
        "volume", F.explode(F.sequence(F.lit(0), n_buckets - 1)).alias("b")
    ).select(
        "volume",
        F.when(F.col("b") % 2 == 1, F.lit(60)).otherwise(F.lit(-1)).alias(
            "bkt_quota"
        ),
    )
    per_vol = buckets.groupBy("volume").agg(
        F.sum(
            F.when(F.col("bkt_quota") > 0, F.col("bkt_quota")).otherwise(0)
        ).alias("other_quota_sum")  # target b_0 holds -1, contributes 0
    )
    req_qb = F.element_at(
        F.array(F.lit(-1), F.lit(0), F.lit(50), F.lit(200)),
        (F.col("uid") % 4 + 1).cast("int"),
    )
    req_qns = F.element_at(
        F.array(F.lit(-1), F.lit(0), F.lit(7)), (F.col("uid") % 3 + 1).cast("int")
    )
    reqs = vols.select(
        "volume",
        "uid",
        "vol_qb",
        F.explode(F.array(F.lit("b_0"), F.lit("b_ghost"))).alias("bucket"),
        req_qb.alias("req_qb"),
        req_qns.alias("req_qns"),
        (F.col("uid") % 2 == 0).alias("set_vers"),
        (F.col("uid") % 3 == 0).alias("set_storage"),
    )
    j = reqs.join(F.broadcast(per_vol), "volume", "left")
    decision = (
        F.when(F.col("bucket") == "b_ghost", F.lit("BUCKET_NOT_FOUND"))
        .when(
            (F.col("req_qb") == -1) & (F.col("vol_qb") != -1),
            F.lit("QUOTA_ERROR"),
        )
        .when(
            (F.col("req_qb") > 0)
            & (F.col("vol_qb") != -1)
            & (F.col("other_quota_sum") + F.col("req_qb") > F.col("vol_qb")),
            F.lit("QUOTA_BYTES_INVALID"),
        )
        .otherwise(F.lit("SET"))
    )
    applied = decision == "SET"
    qb_applies = (F.col("req_qb") > 0) | (
        (F.col("req_qb") == -1) & (F.col("vol_qb") == -1)
    )
    qns_applies = (F.col("req_qns") >= -1) & (F.col("req_qns") != 0)
    return j.select(
        "volume",
        "bucket",
        F.col("req_qb").cast("long").alias("req_qb"),
        F.col("req_qns").cast("long").alias("req_qns"),
        decision.alias("decision"),
        F.when(applied & qb_applies, F.col("req_qb"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("qb_after"),
        F.when(applied & qns_applies, F.col("req_qns"))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("qns_after"),
        (applied & F.col("set_vers")).alias("versioning_after"),
        F.when(applied & F.col("set_storage"), F.lit("SSD"))
        .otherwise(F.lit("DISK"))
        .alias("storage_after"),
    ).orderBy("volume", "bucket")


M13_SQL = model.with_ctes(
    M9_UIDS_CTE,
    """m13_vols AS (
  SELECT volume, uid,
         CASE WHEN uid % 5 = 0 THEN -1 ELSE 100 END AS vol_qb,
         CAST(string_split(volume, '_')[3] AS INT) AS slot
  FROM m9_store
)""",
    """m13_per_vol AS (
  SELECT volume,
         CAST(SUM(CASE WHEN s.b % 2 = 1 THEN 60 ELSE 0 END) AS BIGINT)
           AS other_quota_sum
  FROM m13_vols, LATERAL (
    SELECT unnest(generate_series(0, (uid + slot) % 3)) AS b
  ) s
  GROUP BY volume
)""",
    """m13_reqs AS (
  SELECT volume, uid, vol_qb, t.bucket,
         CASE uid % 4 WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 50
              ELSE 200 END AS req_qb,
         CASE uid % 3 WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 7 END AS req_qns,
         uid % 2 = 0 AS set_vers,
         uid % 3 = 0 AS set_storage
  FROM m13_vols, LATERAL (VALUES ('b_0'), ('b_ghost')) AS t(bucket)
)""",
    body="""SELECT volume, bucket,
  CAST(req_qb AS BIGINT) AS req_qb, CAST(req_qns AS BIGINT) AS req_qns,
  decision,
  CAST(CASE WHEN decision = 'SET'
             AND (req_qb > 0 OR (req_qb = -1 AND vol_qb = -1))
        THEN req_qb ELSE -1 END AS BIGINT) AS qb_after,
  CAST(CASE WHEN decision = 'SET' AND req_qns >= -1 AND req_qns <> 0
        THEN req_qns ELSE -1 END AS BIGINT) AS qns_after,
  decision = 'SET' AND set_vers AS versioning_after,
  CASE WHEN decision = 'SET' AND set_storage THEN 'SSD' ELSE 'DISK' END
    AS storage_after
FROM (
  SELECT r.*, p.other_quota_sum,
    CASE
      WHEN r.bucket = 'b_ghost' THEN 'BUCKET_NOT_FOUND'
      WHEN r.req_qb = -1 AND r.vol_qb <> -1 THEN 'QUOTA_ERROR'
      WHEN r.req_qb > 0 AND r.vol_qb <> -1
           AND p.other_quota_sum + r.req_qb > r.vol_qb
        THEN 'QUOTA_BYTES_INVALID'
      ELSE 'SET'
    END AS decision
  FROM m13_reqs r LEFT JOIN m13_per_vol p USING (volume)
) ORDER BY volume, bucket""",
)

QUERIES["m13_bucket_set_property"] = m13_bucket_set_property
ORACLES["m13_bucket_set_property"] = M13_SQL


# --- M14/M15: bulk rename / bulk delete planes (round 7) -------------------
#
# OMKeysRenameRequest.validateAndUpdateCache: per entry — empty from/to
# name → recorded un-renamed; toKey already present → recorded
# un-renamed BUT (faithful reference quirk — no `continue` after the
# to-exists branch) the rename still applies when fromKey exists, and
# when fromKey is ALSO missing the entry lands in unRenamedKeys twice
# (the to-exists add then the from-missing add); fromKey missing →
# un-renamed. Batch status OK only when every entry renamed, else
# PARTIAL_RENAME (:212).
#
# OMKeysDeleteRequest.validateAndUpdateCache (:54-104): per key —
# missing → unDeletedKeys; present → deleted, releasing its byte size
# from the bucket's usedBytes and one row of usedNamespace; batch
# status OK / PARTIAL_DELETE.

def m14_bulk_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _m11_sample(spark, sf_dir)
    entries = s.select(
        "volume",
        "bucket",
        "row_key",
        F.explode(
            F.array(
                F.struct(
                    F.lit("plain").alias("lane"),
                    F.col("key").alias("from_key"),
                    F.concat(F.col("key"), F.lit(".renamed")).alias("to_key"),
                ),
                F.struct(
                    F.lit("to_exists").alias("lane"),
                    F.col("key").alias("from_key"),
                    F.col("key").alias("to_key"),  # self-rename: to present
                ),
                F.struct(
                    F.lit("from_missing").alias("lane"),
                    F.concat(F.col("key"), F.lit(".missing")).alias("from_key"),
                    F.concat(F.col("key"), F.lit(".new")).alias("to_key"),
                ),
                F.struct(
                    F.lit("empty").alias("lane"),
                    F.lit("").alias("from_key"),
                    F.concat(F.col("key"), F.lit(".x")).alias("to_key"),
                ),
                F.struct(
                    F.lit("both").alias("lane"),
                    F.concat(F.col("key"), F.lit(".gone")).alias("from_key"),
                    F.col("key").alias("to_key"),  # to exists, from missing
                ),
            )
        ).alias("e"),
    ).select(
        "volume", "bucket", "row_key",
        F.col("e.lane").alias("lane"),
        F.col("e.from_key").alias("from_key"),
        F.col("e.to_key").alias("to_key"),
    )
    keys = model.om_keys(spark, sf_dir).select(
        "volume", "bucket", F.col("key").alias("k"), F.lit(True).alias("present")
    )
    probed = (
        entries.join(
            keys.withColumnRenamed("k", "from_key").withColumnRenamed(
                "present", "from_present"
            ),
            ["volume", "bucket", "from_key"],
            "left",
        )
        .join(
            keys.withColumnRenamed("k", "to_key").withColumnRenamed(
                "present", "to_present"
            ),
            ["volume", "bucket", "to_key"],
            "left",
        )
        .select(
            "volume", "bucket", "row_key", "lane", "from_key", "to_key",
            F.coalesce(F.col("from_present"), F.lit(False)).alias("from_present"),
            F.coalesce(F.col("to_present"), F.lit(False)).alias("to_present"),
        )
    )
    empty = (F.length("from_key") == 0) | (F.length("to_key") == 0)
    decision = (
        F.when(empty, F.lit("UNRENAMED_EMPTY"))
        .when(
            F.col("to_present") & F.col("from_present"),
            F.lit("UNRENAMED_BUT_APPLIED"),
        )
        .when(
            F.col("to_present") & ~F.col("from_present"), F.lit("UNRENAMED_BOTH")
        )
        .when(~F.col("from_present"), F.lit("UNRENAMED_FROM_MISSING"))
        .otherwise(F.lit("RENAMED"))
    )
    unrenamed = (
        F.when(empty, F.lit(1))
        .when(F.col("to_present") & ~F.col("from_present"), F.lit(2))
        .when(F.col("to_present") | ~F.col("from_present"), F.lit(1))
        .otherwise(F.lit(0))
    )
    applied = (~empty) & F.col("from_present")
    return probed.select(
        F.concat_ws("#", "row_key", "lane").alias("req_id"),
        "volume",
        "bucket",
        "lane",
        "from_key",
        "to_key",
        decision.alias("decision"),
        unrenamed.cast("long").alias("unrenamed_entries"),
        applied.alias("applied"),
    ).orderBy("req_id")


def m15_bulk_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _m11_sample(spark, sf_dir)
    entries = s.select(
        "volume",
        "bucket",
        "data_size",
        F.explode(
            F.array(
                F.struct(
                    F.lit("all_present").alias("batch_id"),
                    F.col("key").alias("del_key"),
                ),
                F.struct(
                    F.lit("with_ghosts").alias("batch_id"),
                    F.col("key").alias("del_key"),
                ),
                F.struct(
                    F.lit("with_ghosts").alias("batch_id"),
                    F.concat(F.col("key"), F.lit(".ghost")).alias("del_key"),
                ),
            )
        ).alias("e"),
    ).select(
        "volume", "bucket", "data_size",
        F.col("e.batch_id").alias("batch_id"),
        F.col("e.del_key").alias("del_key"),
    )
    keys = model.om_keys(spark, sf_dir).select(
        "volume", "bucket", F.col("key").alias("del_key"),
        F.lit(True).alias("present"),
    )
    probed = entries.join(keys, ["volume", "bucket", "del_key"], "left").select(
        "volume", "bucket", "batch_id", "data_size",
        F.coalesce(F.col("present"), F.lit(False)).alias("present"),
    )
    return (
        probed.groupBy("volume", "bucket", "batch_id")
        .agg(
            F.sum(F.when(F.col("present"), 1).otherwise(0))
            .cast("long")
            .alias("n_deleted"),
            F.sum(F.when(~F.col("present"), 1).otherwise(0))
            .cast("long")
            .alias("n_undeleted"),
            F.sum(F.when(F.col("present"), F.col("data_size")).otherwise(0))
            .cast("long")
            .alias("bytes_released"),
        )
        .select(
            "volume",
            "bucket",
            "batch_id",
            "n_deleted",
            "n_undeleted",
            "bytes_released",
            (-F.col("n_deleted")).alias("used_ns_delta"),
            F.when(F.col("n_undeleted") == 0, F.lit("OK"))
            .otherwise(F.lit("PARTIAL_DELETE"))
            .alias("status"),
        )
        .orderBy("volume", "bucket", "batch_id")
    )


_M14_ENTRIES_CTE = """m14_entries AS (
  SELECT volume, bucket, row_key, e.lane, e.from_key, e.to_key
  FROM m11_sample s, LATERAL (
    SELECT * FROM (VALUES
      ('plain',        s.key, concat(s.key, '.renamed')),
      ('to_exists',    s.key, s.key),
      ('from_missing', concat(s.key, '.missing'), concat(s.key, '.new')),
      ('empty',        '', concat(s.key, '.x')),
      ('both',         concat(s.key, '.gone'), s.key)
    ) AS t(lane, from_key, to_key)
  ) e
)"""

M14_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _M11_SAMPLE_CTE,
    _M14_ENTRIES_CTE,
    """m14_probed AS (
  SELECT e.*, f.key IS NOT NULL AS from_present, t.key IS NOT NULL AS to_present
  FROM m14_entries e
  LEFT JOIN om_keys f ON f.volume = e.volume AND f.bucket = e.bucket
                     AND f.key = e.from_key
  LEFT JOIN om_keys t ON t.volume = e.volume AND t.bucket = e.bucket
                     AND t.key = e.to_key
)""",
    body="""SELECT concat(row_key, '#', lane) AS req_id,
  volume, bucket, lane, from_key, to_key,
  CASE
    WHEN len(from_key) = 0 OR len(to_key) = 0 THEN 'UNRENAMED_EMPTY'
    WHEN to_present AND from_present THEN 'UNRENAMED_BUT_APPLIED'
    WHEN to_present AND NOT from_present THEN 'UNRENAMED_BOTH'
    WHEN NOT from_present THEN 'UNRENAMED_FROM_MISSING'
    ELSE 'RENAMED'
  END AS decision,
  CAST(CASE
    WHEN len(from_key) = 0 OR len(to_key) = 0 THEN 1
    WHEN to_present AND NOT from_present THEN 2
    WHEN to_present OR NOT from_present THEN 1
    ELSE 0
  END AS BIGINT) AS unrenamed_entries,
  len(from_key) > 0 AND len(to_key) > 0 AND from_present AS applied
FROM m14_probed
ORDER BY req_id""",
)

M15_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _M11_SAMPLE_CTE,
    """m15_entries AS (
  SELECT volume, bucket, data_size, e.batch_id, e.del_key
  FROM m11_sample s, LATERAL (
    SELECT * FROM (VALUES
      ('all_present', s.key),
      ('with_ghosts', s.key),
      ('with_ghosts', concat(s.key, '.ghost'))
    ) AS t(batch_id, del_key)
  ) e
)""",
    """m15_probed AS (
  SELECT e.volume, e.bucket, e.batch_id, e.data_size,
         k.key IS NOT NULL AS present
  FROM m15_entries e
  LEFT JOIN om_keys k ON k.volume = e.volume AND k.bucket = e.bucket
                     AND k.key = e.del_key
)""",
    body="""SELECT volume, bucket, batch_id,
  CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
  CAST(SUM(CASE WHEN present THEN 0 ELSE 1 END) AS BIGINT) AS n_undeleted,
  CAST(SUM(CASE WHEN present THEN data_size ELSE 0 END) AS BIGINT)
    AS bytes_released,
  -CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS used_ns_delta,
  CASE WHEN SUM(CASE WHEN present THEN 0 ELSE 1 END) = 0
       THEN 'OK' ELSE 'PARTIAL_DELETE' END AS status
FROM m15_probed
GROUP BY volume, bucket, batch_id
ORDER BY volume, bucket, batch_id""",
)

QUERIES["m14_bulk_rename"] = m14_bulk_rename
ORACLES["m14_bulk_rename"] = M14_SQL
QUERIES["m15_bulk_delete"] = m15_bulk_delete
ORACLES["m15_bulk_delete"] = M15_SQL


def x15_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: catalog enumeration — every base table (the engine's
    "column families") with its row count, the `ozone debug ldb
    list_column_families` listing (ref tools/.../debug/
    ListTables.java:49-54) plus the row-count pass an operator reads
    before a DropTable.java drop. Each leg is a parquet metadata count
    (aggregate pushdown — footer statistics, no data read); the union
    is len(TABLES) one-row frames, constant regardless of SF."""
    parts = [
        model.load(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in model.TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


X15_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}"
        for t in model.TABLES
    )
    + ") ORDER BY table_name"
)

QUERIES["x15_list_tables"] = x15_list_tables
ORACLES["x15_list_tables"] = X15_SQL


# Recon task registry: task name → the CDC ops it consumes, mirroring
# which OM-table mutations each reference task's process() handles
# (ContainerKeyMapperTask.java:112-160 PUT/DELETE key mappings;
# FileSizeCountTask.java:115-157 PUT/DELETE/UPDATE bin moves;
# NSSummaryTask PUT/DELETE/UPDATE rollups; TableCountTask.java:114-140
# row-count ±1 on PUT/DELETE, UPDATE ignored).
RECON_TASKS = (
    ("ContainerKeyMapperTask", ("PUT", "DELETE")),
    ("FileSizeCountTask", ("PUT", "DELETE", "UPDATE")),
    ("NSSummaryTask", ("PUT", "DELETE", "UPDATE")),
    ("TableCountTask", ("PUT", "DELETE")),
)


def recon_task_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recon task-status listing (ref recon/.../api/
    TaskStatusService.java:40-55: findAll() over the task-bookkeeping
    table — task name, last successful seqno + timestamp; rows written
    by ReconTaskControllerImpl after each consumed batch). The engine's
    bookkeeping is the versioned-mart (last_seqno, last_batch_id) pair
    (streaming/maintenance.py); its drained steady state is determined
    by the feed, so the oracle-checkable law is the per-task rollup of
    the CDC events each task consumes: last_seqno = max(seqno),
    last_run_ts = max(event_time), events_processed = count. One
    broadcast of the 4-row task registry exploded per op, one
    map-side-combinable groupBy — constant-size result."""
    ev = model.om_events(spark, sf_dir)
    reg = spark.createDataFrame(
        [(t, op) for t, ops in RECON_TASKS for op in ops],
        "task_name string, op string",
    )
    return (
        ev.join(F.broadcast(reg), "op")
        .groupBy("task_name")
        .agg(
            F.max("seqno").alias("last_seqno"),
            F.max("event_time").alias("last_run_ts"),
            F.count(F.lit(1)).alias("events_processed"),
        )
        .orderBy("task_name")
    )


RECON_TASK_STATUS_SQL = model.with_ctes(
    model.OM_EVENTS_CTE,
    "tasks(task_name, op) AS (VALUES "
    + ", ".join(
        f"('{t}', '{op}')" for t, ops in RECON_TASKS for op in ops
    )
    + ")",
    body="""SELECT task_name,
       max(seqno) AS last_seqno,
       max(event_time) AS last_run_ts,
       count(*) AS events_processed
FROM om_events JOIN tasks USING (op)
GROUP BY task_name
ORDER BY task_name""",
)

QUERIES["recon_task_status"] = recon_task_status
ORACLES["recon_task_status"] = RECON_TASK_STATUS_SQL
