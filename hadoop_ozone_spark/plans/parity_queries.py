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


QUERIES = {
    "a3_namespace_histogram": a3_namespace_histogram,
    "w4_list_uploads": w4_list_uploads,
    "a7_datanode_growth": a7_datanode_growth,
    "w1_list_volumes_by_user": w1_list_volumes_by_user,
}

ORACLES = {
    "a3_namespace_histogram": A3_HISTOGRAM_SQL,
    "w4_list_uploads": W4_UPLOADS_SQL,
    "a7_datanode_growth": A7_DATANODE_SQL,
    "w1_list_volumes_by_user": W1_VOLUMES_USER_SQL,
}
