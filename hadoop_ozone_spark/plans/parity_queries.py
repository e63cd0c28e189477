"""Round-2 reference-parity queries: NSSummary histogram (A3),
listMultipartUploads (W4), per-datanode CLUSTER_GROWTH_DAILY (A7),
listVolumes-by-user (W1/userTable).

Each closes a VERDICT.md round-1 parity gap; oracles follow the
cross-engine determinism rules from model.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.functions.binning import file_size_upper_bound_sql
from hadoop_ozone_spark.operators import recon, s3
from hadoop_ozone_spark.sources import generators


# --- A3: per-directory 41-bin histogram (NSSummary.java:31-35) ------------

def a3_namespace_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.namespace_histogram(model.om_keys(spark, sf_dir))


A3_HISTOGRAM_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body=f"""SELECT volume, bucket,
       CASE WHEN strpos(key, '/') = 0 THEN ''
            ELSE regexp_replace(key, '/[^/]*$', '') END AS dir,
       {file_size_upper_bound_sql('data_size')} AS file_size,
       count(*) AS cnt
FROM om_keys
GROUP BY 1, 2, 3, 4
ORDER BY volume, bucket, dir, file_size""",
)


# --- W4: listMultipartUploads (KeyManagerImpl.java:1364) ------------------
#
# In-progress uploads synthesized from the namespace: keys whose
# container_id % 9 == 3 have TWO open uploads each (so (key, uploadId)
# ordering and the upload-id-marker resume have real work to do);
# upload_id = first 16 hex chars of md5(row_key + '#' + n).

def _uploads(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_n")
        & (F.col("bucket") == "bkt_o")
        & (F.col("container_id") % 9 == 3)
    )
    return keys.select(
        "key",
        "row_key",
        "data_size",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("n"),
    ).select(
        "key",
        F.substring(
            F.md5(F.concat(F.col("row_key"), F.lit("#"), F.col("n").cast("string"))),
            1,
            16,
        ).alias("upload_id"),
        "data_size",
    )


def w4_list_uploads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return s3.list_multipart_uploads(
        _uploads(spark, sf_dir),
        prefix="dir2/",
        key_marker="dir2/sub2/",
        max_uploads=100,
    )


W4_UPLOADS_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT key, upload_id, data_size FROM (
  SELECT key, substring(md5(concat(row_key, '#', CAST(n AS VARCHAR))), 1, 16) AS upload_id,
         data_size
  FROM om_keys, generate_series(1, 2) s(n)
  WHERE volume = 'vol_n' AND bucket = 'bkt_o' AND container_id % 9 = 3
)
WHERE starts_with(key, 'dir2/') AND key > 'dir2/sub2/'
ORDER BY key, upload_id LIMIT 100""",
)


# --- A7: CLUSTER_GROWTH_DAILY keyed (day, datanode) -----------------------

def a7_datanode_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.cluster_growth_daily(model.om_keys(spark, sf_dir))


A7_DATANODE_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT date_trunc('day', CAST(creation_time AS TIMESTAMP)) AS day, datanode_id,
       CAST(SUM(data_size) AS BIGINT) AS used_size,
       count(DISTINCT container_id) AS container_count,
       count(*) AS block_count
FROM om_keys GROUP BY 1, 2 ORDER BY day, datanode_id""",
)


# --- W1/userTable: listVolumes filtered by user ---------------------------
#
# userTable semantics (OMDBDefinition.java:56-64, listVolumes
# OmMetadataManagerImpl.java:993-1036): volumes are listed PER OWNER
# with a start-volume marker. Owners synthesized over the freon
# namespace (10 volumes, owner = user_<vol#%3>).

def w1_list_volumes_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = generators.generate_keys(
        spark, num_volumes=10, num_buckets=100, num_keys=100_000
    )
    owner = F.concat(
        F.lit("user_"), (F.substring("volume", 4, 10).cast("long") % 3).cast("string")
    )
    return (
        keys.groupBy("volume")
        .agg(
            F.count(F.lit(1)).alias("used_namespace"),
            F.sum("data_size").alias("used_bytes"),
        )
        .withColumn("owner", owner)
        .filter((F.col("owner") == "user_1") & (F.col("volume") > "vol1"))
        .orderBy("volume")
        .limit(100)
    )


W1_VOLUMES_USER_SQL = """
WITH g AS (SELECT range AS id FROM range(100000)),
keys AS (
  SELECT concat('vol', id % 10) AS volume,
         10240 + (id * 37) % 1024 AS data_size
  FROM g
),
vols AS (
  SELECT volume, count(*) AS used_namespace,
         CAST(SUM(data_size) AS BIGINT) AS used_bytes,
         concat('user_', CAST(CAST(substring(volume, 4, 10) AS BIGINT) % 3 AS VARCHAR)) AS owner
  FROM keys GROUP BY volume
)
SELECT volume, used_namespace, used_bytes, owner
FROM vols WHERE owner = 'user_1' AND volume > 'vol1'
ORDER BY volume LIMIT 100
"""


# --- J1 history: /containers/{id}/replicaHistory --------------------------
#
# Round-4 parity (VERDICT r3 #3): the per-replica first-seen/last-seen
# timeline Recon serves from its dedicated CF
# (ContainerEndpoint.java:225-238, ContainerHistory.java:26-80).

def j1_replica_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.replica_history(
        model.replica_observations(spark, sf_dir),
        model.datanodes(spark, sf_dir),
    )


J1_HISTORY_SQL = model.with_ctes(
    model.REPLICA_OBSERVATIONS_CTE,
    model.DATANODES_CTE,
    body="""SELECT o.container_id, o.datanode_id,
       COALESCE(d.hostname, 'N/A') AS datanode_host,
       min(o.seen_time) AS first_seen,
       max(o.seen_time) AS last_seen
FROM replica_observations o
LEFT JOIN datanodes d ON o.datanode_id = d.datanode_id
GROUP BY o.container_id, o.datanode_id, d.hostname
ORDER BY o.container_id, o.datanode_id""",
)


# --- N1: /datanodes listing (NodeEndpoint.java:83-160) --------------------

def n1_datanodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.datanode_listing(
        model.datanodes(spark, sf_dir),
        model.container_replicas(spark, sf_dir),
        model.containers(spark, sf_dir),
        model.pipelines(spark, sf_dir),
        model.pipeline_members(spark, sf_dir),
    )


N1_DATANODES_SQL = model.with_ctes(
    model.DATANODES_CTE,
    model.CONTAINERS_CTE,
    model.CONTAINER_REPLICAS_CTE,
    model.PIPELINES_CTE,
    model.PIPELINE_MEMBERS_CTE,
    body="""SELECT d.datanode_id, d.hostname, d.rack, d.node_state,
       CAST(d.capacity_bytes AS BIGINT) AS capacity_bytes,
       COALESCE(pc.used_bytes, 0) AS used_bytes,
       CAST(d.capacity_bytes - COALESCE(pc.used_bytes, 0) AS BIGINT) AS remaining_bytes,
       COALESCE(pm.pipeline_count, 0) AS pipeline_count,
       COALESCE(lc.leader_count, 0) AS leader_count,
       COALESCE(pc.container_count, 0) AS container_count,
       COALESCE(pc.open_container_count, 0) AS open_container_count
FROM datanodes d
LEFT JOIN (
  SELECT cr.datanode_id, count(*) AS container_count,
         CAST(SUM(CASE WHEN c.state = 'OPEN' THEN 1 ELSE 0 END) AS BIGINT)
           AS open_container_count,
         CAST(SUM(COALESCE(c.used_bytes, 0)) AS BIGINT) AS used_bytes
  FROM container_replicas cr
  LEFT JOIN containers c ON cr.container_id = c.container_id
  GROUP BY cr.datanode_id
) pc ON d.datanode_id = pc.datanode_id
LEFT JOIN (
  SELECT datanode_id, count(*) AS pipeline_count
  FROM pipeline_members GROUP BY datanode_id
) pm ON d.datanode_id = pm.datanode_id
LEFT JOIN (
  SELECT leader_datanode_id AS datanode_id, count(*) AS leader_count
  FROM pipelines GROUP BY leader_datanode_id
) lc ON d.datanode_id = lc.datanode_id
ORDER BY d.datanode_id""",
)


# --- P1: /pipelines listing (PipelineEndpoint.java:73-135) ----------------

def p1_pipelines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.pipeline_listing(
        model.pipelines(spark, sf_dir),
        model.pipeline_members(spark, sf_dir),
        model.datanodes(spark, sf_dir),
        model.containers(spark, sf_dir),
    )


P1_PIPELINES_SQL = model.with_ctes(
    model.PIPELINES_CTE,
    model.PIPELINE_MEMBERS_CTE,
    model.DATANODES_CTE,
    model.CONTAINERS_CTE,
    body="""SELECT p.pipeline_id, p.state, p.replication_factor,
       p.leader_datanode_id,
       COALESCE(d.hostname, 'N/A') AS leader_host,
       COALESCE(m.datanode_count, 0) AS datanode_count,
       COALESCE(m.member_ids, '') AS member_ids,
       COALESCE(cc.container_count, 0) AS container_count
FROM pipelines p
LEFT JOIN (
  SELECT pipeline_id, count(*) AS datanode_count,
         string_agg(CAST(datanode_id AS VARCHAR), ',' ORDER BY datanode_id)
           AS member_ids
  FROM pipeline_members GROUP BY pipeline_id
) m ON p.pipeline_id = m.pipeline_id
LEFT JOIN (
  SELECT pipeline_id, count(*) AS container_count
  FROM containers GROUP BY pipeline_id
) cc ON p.pipeline_id = cc.pipeline_id
LEFT JOIN datanodes d ON p.leader_datanode_id = d.datanode_id
ORDER BY p.pipeline_id""",
)


# --- /containers/missing: MissingContainerMetadata ------------------------
#
# Key count + bytes, pipeline, and last-known replica locations (from
# the history CF, capped at the replication factor) for every
# non-deleted container with zero live replicas
# (ContainerEndpoint.java:239-270, MissingContainerMetadata.java:32-57).

def j2_missing_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recon.missing_containers(
        model.containers(spark, sf_dir),
        model.container_replicas(spark, sf_dir),
        model.om_keys(spark, sf_dir),
        model.replica_observations(spark, sf_dir),
        model.datanodes(spark, sf_dir),
    )


J2_MISSING_SQL = model.with_ctes(
    model.CONTAINERS_CTE,
    model.CONTAINER_REPLICAS_CTE,
    model.REPLICA_OBSERVATIONS_CTE,
    model.OM_KEYS_CTE,
    body="""SELECT m.container_id, m.pipeline_id, m.replication_factor,
       COALESCE(kc.key_count, 0) AS key_count,
       COALESCE(kc.total_bytes, 0) AS total_bytes,
       l.last_seen_max,
       COALESCE(l.last_known_datanodes, '') AS last_known_datanodes
FROM (
  SELECT container_id, pipeline_id, replication_factor FROM containers
  WHERE state <> 'DELETED'
    AND container_id NOT IN (SELECT container_id FROM container_replicas)
) m
LEFT JOIN (
  SELECT container_id, count(*) AS key_count,
         CAST(SUM(data_size) AS BIGINT) AS total_bytes
  FROM om_keys GROUP BY container_id
) kc ON m.container_id = kc.container_id
LEFT JOIN (
  SELECT container_id, max(last_seen) AS last_seen_max,
         string_agg(CAST(datanode_id AS VARCHAR), ',' ORDER BY datanode_id)
           AS last_known_datanodes
  FROM (
    SELECT h.container_id, h.datanode_id, h.last_seen,
           row_number() OVER (PARTITION BY h.container_id
                              ORDER BY h.last_seen DESC, h.datanode_id ASC) AS rn,
           h.replication_factor
    FROM (
      SELECT o.container_id, o.datanode_id, max(o.seen_time) AS last_seen,
             any_value(c.replication_factor) AS replication_factor
      FROM replica_observations o
      JOIN containers c ON o.container_id = c.container_id
      GROUP BY o.container_id, o.datanode_id
    ) h
  ) WHERE rn <= replication_factor
  GROUP BY container_id
) l ON m.container_id = l.container_id
ORDER BY m.container_id""",
)


# --- M5 full law: declared-vs-stored ETag validation ----------------------
#
# Declared part list = every lineitem row (upload=orderkey,
# part=linenumber, etag=md5 of a deterministic per-part string); the
# stored part table drops l_partkey%13==0 rows (missing parts) and
# corrupts the etag where l_suppkey%17==0 (mismatches) — so all three
# failure modes of S3MultipartUploadCompleteRequest.java:399-450 occur.

_ETAG_BASE = "concat(l_orderkey, '-', l_linenumber, '-', CAST(floor(l_extendedprice * 100) AS BIGINT))"


def m5_etag_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_ozone_spark.operators import mutations

    li = model.load(spark, sf_dir, "lineitem")
    base = F.concat(
        F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber"), F.lit("-"),
        F.floor(F.col("l_extendedprice") * 100),
    )
    declared = li.select(
        F.col("l_orderkey").alias("upload_id"),
        F.col("l_linenumber").alias("part_number"),
        F.md5(base).alias("etag"),
    )
    stored = li.filter(F.col("l_partkey") % 13 != 0).select(
        F.col("l_orderkey").alias("upload_id"),
        F.col("l_linenumber").alias("part_number"),
        F.when(
            F.col("l_suppkey") % 17 == 0,
            F.md5(F.concat(base, F.lit("#corrupt"))),
        )
        .otherwise(F.md5(base))
        .alias("etag"),
        F.floor(F.col("l_extendedprice") * 100).alias("data_size"),
    )
    return mutations.multipart_complete_etag_check(declared, stored)


M5_ETAG_SQL = f"""
WITH declared AS (
  SELECT l_orderkey AS upload_id, l_linenumber AS part_number,
         md5({_ETAG_BASE}) AS etag
  FROM lineitem
), stored AS (
  SELECT l_orderkey AS upload_id, l_linenumber AS part_number,
         CASE WHEN l_suppkey % 17 = 0 THEN md5(concat({_ETAG_BASE}, '#corrupt'))
              ELSE md5({_ETAG_BASE}) END AS etag,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS data_size
  FROM lineitem WHERE l_partkey % 13 <> 0
), ranked AS (
  SELECT d.upload_id, d.part_number, d.etag,
         row_number() OVER (PARTITION BY d.upload_id ORDER BY d.part_number) AS rn,
         s.etag AS s_etag, s.data_size AS s_size
  FROM declared d
  LEFT JOIN stored s
    ON d.upload_id = s.upload_id AND d.part_number = s.part_number
)
SELECT upload_id, count(*) AS num_parts, max(part_number) AS max_part,
       min(part_number) AS min_part,
       CAST(SUM(COALESCE(s_size, 0)) AS BIGINT) AS total_size,
       CAST(SUM(CASE WHEN s_etag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_parts,
       CAST(SUM(CASE WHEN s_etag IS NOT NULL AND s_etag <> etag THEN 1 ELSE 0 END) AS BIGINT)
         AS etag_mismatches,
       (max(CASE WHEN part_number <> rn THEN 1 ELSE 0 END) = 0
        AND min(part_number) = 1
        AND SUM(CASE WHEN s_etag IS NULL THEN 1 ELSE 0 END) = 0
        AND SUM(CASE WHEN s_etag IS NOT NULL AND s_etag <> etag THEN 1 ELSE 0 END) = 0)
         AS is_valid
FROM ranked GROUP BY upload_id ORDER BY upload_id
"""


QUERIES = {
    "a3_namespace_histogram": a3_namespace_histogram,
    "w4_list_uploads": w4_list_uploads,
    "a7_datanode_growth": a7_datanode_growth,
    "w1_list_volumes_by_user": w1_list_volumes_by_user,
    "j1_replica_history": j1_replica_history,
    "j2_missing_containers": j2_missing_containers,
    "n1_datanodes": n1_datanodes,
    "p1_pipelines": p1_pipelines,
    "m5_etag_check": m5_etag_check,
}

ORACLES = {
    "a3_namespace_histogram": A3_HISTOGRAM_SQL,
    "w4_list_uploads": W4_UPLOADS_SQL,
    "a7_datanode_growth": A7_DATANODE_SQL,
    "w1_list_volumes_by_user": W1_VOLUMES_USER_SQL,
    "j1_replica_history": J1_HISTORY_SQL,
    "j2_missing_containers": J2_MISSING_SQL,
    "n1_datanodes": N1_DATANODES_SQL,
    "p1_pipelines": P1_PIPELINES_SQL,
    "m5_etag_check": M5_ETAG_SQL,
}


# --- M4/M7: expired-MPU backlog + abort transform --------------------------
#
# The in-flight MPU planes extend the w4 _uploads shim with the source
# key's creation date and a per-upload part list (n_parts cycles 1..4
# with the container id; part f's size = data_size + f) so the expiry
# backlog and the abort byte-release have deterministic, oracle-
# replayable work (S3MultipartUploadAbortRequest.java:157-181).

_MPU_EXPIRE_BEFORE = "1995-06-17"


def _mpu_uploads(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_n")
        & (F.col("bucket") == "bkt_o")
        & (F.col("container_id") % 9 == 3)
    )
    return keys.select(
        "key",
        "row_key",
        "data_size",
        "container_id",
        F.col("creation_time").alias("created"),
        F.explode(F.array(F.lit(1), F.lit(2))).alias("n"),
    ).select(
        "key",
        F.substring(
            F.md5(F.concat(F.col("row_key"), F.lit("#"), F.col("n").cast("string"))),
            1,
            16,
        ).alias("upload_id"),
        "created",
        "data_size",
        "container_id",
    )


def _mpu_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _mpu_uploads(spark, sf_dir)
    return u.select(
        "upload_id",
        "data_size",
        F.explode(
            F.sequence(F.lit(1), (F.col("container_id") % 4 + 1).cast("int"))
        ).alias("part_number"),
    ).select(
        "upload_id",
        "part_number",
        (F.col("data_size") + F.col("part_number")).alias("part_size"),
    )


_MPU_UPLOADS_CTE = """
mpu_uploads AS (
  SELECT key,
         substring(md5(concat(row_key, '#', CAST(n AS VARCHAR))), 1, 16) AS upload_id,
         creation_time AS created, data_size, container_id
  FROM om_keys, generate_series(1, 2) s(n)
  WHERE volume = 'vol_n' AND bucket = 'bkt_o' AND container_id % 9 = 3
)"""

_MPU_PARTS_CTE = """
mpu_parts AS (
  SELECT upload_id,
         unnest(generate_series(1, CAST(container_id % 4 + 1 AS INTEGER))) AS part_number,
         data_size
  FROM mpu_uploads
)"""


def m4_mpu_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stale-MPU backlog: uploads created before the TTL cut with their
    reclaimable part bytes (operators/s3.py stale_multipart_uploads)."""
    return s3.stale_multipart_uploads(
        _mpu_uploads(spark, sf_dir),
        _mpu_parts(spark, sf_dir),
        expire_before=_MPU_EXPIRE_BEFORE,
    )


M4_MPU_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _MPU_UPLOADS_CTE,
    _MPU_PARTS_CTE,
    body=f"""SELECT u.key, u.upload_id, u.created,
  count(p.part_number) AS part_count,
  CAST(COALESCE(SUM(p.data_size + p.part_number), 0) AS BIGINT) AS reclaimable_bytes
FROM mpu_uploads u
LEFT JOIN mpu_parts p USING (upload_id)
WHERE u.created < DATE '{_MPU_EXPIRE_BEFORE}'
GROUP BY u.key, u.upload_id, u.created
ORDER BY u.key, u.upload_id""",
)


def m7_mpu_abort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abort transform over the expired set: drop multipartInfo rows,
    release part bytes, per-dir accounting (operators/s3.py
    abort_expired_uploads)."""
    return s3.abort_expired_uploads(
        _mpu_uploads(spark, sf_dir),
        _mpu_parts(spark, sf_dir),
        expire_before=_MPU_EXPIRE_BEFORE,
    )


M7_MPU_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    _MPU_UPLOADS_CTE,
    _MPU_PARTS_CTE,
    f"""expired AS (
  SELECT split_part(key, '/', 1) AS dir, upload_id
  FROM mpu_uploads WHERE created < DATE '{_MPU_EXPIRE_BEFORE}'
)""",
    f"""rem AS (
  SELECT split_part(key, '/', 1) AS dir, count(*) AS remaining_uploads
  FROM mpu_uploads WHERE created >= DATE '{_MPU_EXPIRE_BEFORE}'
  GROUP BY 1
)""",
    """ab AS (SELECT dir, count(*) AS aborted_uploads FROM expired GROUP BY dir)""",
    """rel AS (
  SELECT e.dir, CAST(SUM(p.data_size + p.part_number) AS BIGINT) AS released_bytes
  FROM mpu_parts p JOIN expired e USING (upload_id)
  GROUP BY e.dir
)""",
    body="""SELECT COALESCE(rem.dir, ab.dir, rel.dir) AS dir,
  COALESCE(remaining_uploads, 0) AS remaining_uploads,
  COALESCE(aborted_uploads, 0) AS aborted_uploads,
  COALESCE(released_bytes, 0) AS released_bytes
FROM rem
FULL JOIN ab ON rem.dir = ab.dir
FULL JOIN rel ON COALESCE(rem.dir, ab.dir) = rel.dir
ORDER BY dir""",
)

QUERIES["m4_mpu_expiry"] = m4_mpu_expiry
QUERIES["m7_mpu_abort"] = m7_mpu_abort
ORACLES["m4_mpu_expiry"] = M4_MPU_SQL
ORACLES["m7_mpu_abort"] = M7_MPU_SQL


# --- S3 HEAD Object + InitiateMultipartUpload ------------------------------

def s3_head_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAD Object over a deterministic probe set (one lane of existing
    keys + a guaranteed-missing path → 404 row included)."""
    keys = model.om_keys(spark, sf_dir)
    probes = keys.filter(F.col("container_id") % 257 == 9).select(
        "volume", "bucket", "key"
    ).unionByName(
        spark.createDataFrame(
            [("vol_n", "bkt_o", "no/such/key")], "volume string, bucket string, key string"
        )
    )
    return s3.head_object(keys, probes)


S3_HEAD_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    """probes AS (
  SELECT volume, bucket, key FROM om_keys WHERE container_id % 257 = 9
  UNION ALL
  SELECT 'vol_n', 'bkt_o', 'no/such/key'
)""",
    body="""SELECT p.volume, p.bucket, p.key,
  CASE WHEN k.data_size IS NULL THEN 404 ELSE 200 END AS status,
  k.data_size AS content_length,
  CAST(k.creation_time AS VARCHAR) AS etag,
  k.creation_time AS last_modified
FROM probes p
LEFT JOIN om_keys k USING (volume, bucket, key)
ORDER BY p.volume, p.bucket, p.key""",
)


def m8_mpu_initiate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InitiateMultipartUpload over a deterministic request lane with
    mixed storage classes (operators/s3.py initiate_multipart_upload)."""
    keys = model.om_keys(spark, sf_dir)
    requests = keys.filter(F.col("container_id") % 97 == 3).select(
        "volume",
        "bucket",
        "key",
        F.when(F.col("data_size") % 3 == 0, F.lit("REDUCED_REDUNDANCY"))
        .when(F.col("data_size") % 3 == 1, F.lit(""))
        .otherwise(F.lit("STANDARD"))
        .alias("storage_class"),
    )
    return s3.initiate_multipart_upload(requests)


M8_MPU_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    """reqs AS (
  SELECT volume, bucket, key,
    CASE WHEN data_size % 3 = 0 THEN 'REDUCED_REDUNDANCY'
         WHEN data_size % 3 = 1 THEN 'STANDARD'
         ELSE 'STANDARD' END AS storage_class,
    CASE WHEN data_size % 3 = 0 THEN 'REDUCED_REDUNDANCY'
         WHEN data_size % 3 = 1 THEN ''
         ELSE 'STANDARD' END AS raw_class
  FROM om_keys WHERE container_id % 97 = 3
)""",
    body="""SELECT volume, bucket, key,
  substring(md5(concat('/', volume, '/', bucket, '/', key, '#init#',
                       CASE WHEN raw_class = '' THEN 'STANDARD'
                            ELSE raw_class END)), 1, 16) AS upload_id,
  'RATIS' AS replication_type,
  CASE WHEN storage_class = 'REDUCED_REDUNDANCY' THEN 1 ELSE 3 END
    AS replication_factor
FROM reqs
ORDER BY volume, bucket, key""",
)

QUERIES["s3_head_object"] = s3_head_object
QUERIES["m8_mpu_initiate"] = m8_mpu_initiate
ORACLES["s3_head_object"] = S3_HEAD_SQL
ORACLES["m8_mpu_initiate"] = M8_MPU_SQL


# --- W2/V1: ListObjects marker compatibility (round 6) ---------------------

def w2_list_objects_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 dialect: resume from a mid-listing `marker` (assigned to
    start-after per BucketEndpoint.java:134-136), delimiter grouping
    unchanged — operators/s3.py list_objects_v1."""
    keys = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_a") & (F.col("bucket") == "bkt_f")
    )
    return s3.list_objects_v1(
        keys, prefix="dir1/", delimiter="/", marker="dir1/sub0/",
        max_keys=100,
    )


W2_V1_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT name, entry_type, size FROM (
  SELECT DISTINCT
    concat('dir1/', split_part(substring(key, length('dir1/') + 1, 100000),
                               '/', 1), '/') AS name,
    'PREFIX' AS entry_type, CAST(0 AS BIGINT) AS size
  FROM om_keys
  WHERE volume = 'vol_a' AND bucket = 'bkt_f' AND starts_with(key, 'dir1/')
    AND key > 'dir1/sub0/' AND NOT starts_with(key, 'dir1/sub0/')
  UNION ALL
  SELECT key AS name, 'KEY' AS entry_type, CAST(data_size AS BIGINT) AS size
  FROM om_keys
  WHERE volume = 'vol_a' AND bucket = 'bkt_f' AND starts_with(key, 'dir1/')
    AND key > 'dir1/sub0/' AND NOT starts_with(key, 'dir1/sub0/')
    AND strpos(substring(key, length('dir1/') + 1, 100000), '/') = 0
) ORDER BY name LIMIT 100""",
)

QUERIES["w2_list_objects_v1"] = w2_list_objects_v1
ORACLES["w2_list_objects_v1"] = W2_V1_SQL
