"""Policy/quota queries: A5 enforcement, longest-prefix ACL, Q6-style
selective aggregate (predicate-pushdown showcase)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import recon
from hadoop_ozone_spark.operators import acl as acl_ops
from hadoop_ozone_spark.operators.acl import longest_prefix_acl


def a5_quota_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota check (ref OMKeyRequest.java:480-500): recompute usage,
    join bucket quotas, flag over-quota. Quotas synthesized per bucket
    (bkt_f tight, bkt_o loose) so both outcomes appear."""
    usage = recon.quota_usage(model.om_keys(spark, sf_dir))
    quota = F.when(F.col("bucket") == "bkt_f", F.lit(500_000_000)).otherwise(
        F.lit(100_000_000_000)
    )
    return usage.select(
        "volume",
        "bucket",
        "used_bytes",
        "used_namespace",
        quota.alias("quota_in_bytes"),
        (F.col("used_bytes") > quota).alias("over_quota"),
    ).orderBy("volume", "bucket")


A5_ENFORCE_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume, bucket, used_bytes, used_namespace, quota_in_bytes,
       used_bytes > quota_in_bytes AS over_quota
FROM (
  SELECT volume, bucket,
         CAST(SUM(data_size * replication_factor) AS BIGINT) AS used_bytes,
         count(*) AS used_namespace,
         CASE WHEN bucket = 'bkt_f' THEN 500000000 ELSE 100000000000 END AS quota_in_bytes
  FROM om_keys GROUP BY volume, bucket
) ORDER BY volume, bucket""",
)


ACL_PREFIXES = [
    ("dir1/", "user:alice:rw"),
    ("dir1/sub2/", "user:bob:r"),
    ("dir3/", "group:eng:rw"),
    ("dir3/sub0/", "user:carol:rwx"),
    ("dir5/", "world::r"),
]


def acl_longest_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix ACL resolution over one bucket's keys (ref
    PrefixManagerImpl RadixTree)."""
    keys = model.om_keys(spark, sf_dir).filter(
        (F.col("volume") == "vol_n") & (F.col("bucket") == "bkt_f")
    )
    prefixes = spark.createDataFrame(ACL_PREFIXES, "prefix string, acl string")
    out = longest_prefix_acl(keys.select("key"), prefixes)
    return (
        out.groupBy("matched_prefix", "acl")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("matched_prefix")
    )


ACL_VALUES_SQL = " , ".join(f"('{p}', '{a}')" for p, a in ACL_PREFIXES)

ACL_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body=f""", acl_prefixes(prefix, acl) AS (VALUES {ACL_VALUES_SQL})
SELECT matched_prefix, acl, count(*) AS n_keys FROM (
  SELECT k.key,
         arg_max(p.prefix, length(p.prefix)) AS matched_prefix,
         arg_max(p.acl, length(p.prefix)) AS acl
  FROM (SELECT key FROM om_keys WHERE volume = 'vol_n' AND bucket = 'bkt_f') k
  LEFT JOIN acl_prefixes p ON starts_with(k.key, p.prefix)
  GROUP BY k.key
) GROUP BY matched_prefix, acl ORDER BY matched_prefix""",
)


def q6_selective_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped selective aggregate: tight scan predicates that must
    reach the parquet reader (pushdown showcase) + one global sum."""
    li = model.load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(22,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


QUERIES = {
    "a5_quota_enforcement": a5_quota_enforcement,
    "acl_longest_prefix": acl_longest_prefix,
    "q6_selective_agg": q6_selective_agg,
}

ORACLES = {
    "a5_quota_enforcement": A5_ENFORCE_SQL,
    "acl_longest_prefix": ACL_SQL,
    "q6_selective_agg": Q6_SQL,
}


# --- embedding-cosine near-dup + event sessionization ---------------------

def dp_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.99) over the
    corpus with injected scaled copies. Exact all-pairs baseline — the
    oracle-checkable answer key; the LSH-bucketed variant
    (similarity.bucketed_index) is the production path at scale."""
    from hadoop_ozone_spark.datapipe.similarity import hoist_norm, hoisted_cosine

    emb = model.embedding_corpus(spark, sf_dir)
    # the exact baseline is O(n²) BY DESIGN, but it must still spread:
    # the corpus parquet is a handful of input splits, so without an
    # explicit repartition the broadcast nested loop runs on ~4 tasks
    # (measured at sf1: 4 partitions chewing 2.4e10 pairs). Repartition
    # the streamed side to the session's shuffle width — the shuffle
    # moves only n rows to unlock n²/width per task. Norms are hoisted
    # per SIDE (bit-identical, the semantic_dedup_pairs law) so each of
    # the n² pairs pays one dot, not three plus two casts.
    a = hoist_norm(
        emb.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
        ),
        "ea", "_ad", "_an",
    ).repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    b = hoist_norm(
        emb.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
        ),
        "eb", "_bd", "_bn",
    )
    sim = hoisted_cosine("_ad", "_an", "_bd", "_bn", 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.99)
        .orderBy("vec_a", "vec_b")
    )


DP_EMB_NEARDUP_SQL = model.with_ctes(
    model.EMBEDDING_CORPUS_CTE,
    body="""SELECT vec_a, vec_b, cosine_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
               (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
               6) AS cosine_sim
  FROM embedding_corpus a JOIN embedding_corpus b ON a.vec_id < b.vec_id
) WHERE cosine_sim >= 0.99 ORDER BY vec_a, vec_b""",
)


def ev_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (30-minute idle
    gap): lag + cumulative-sum session ids, then per-session rollup.
    The training-pipeline shape for clickstream/interaction data."""
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("sess_no", F.sum(new_sess).over(w))
    return (
        sess.groupBy("user_id", "sess_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "sess_no")
    )


EV_SESSION_SQL = """
SELECT user_id, sess_no, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev_ts IS NULL
                    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
  FROM (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)
GROUP BY user_id, sess_no ORDER BY user_id, sess_no
"""


QUERIES.update({
    "dp_embedding_neardup": dp_embedding_neardup,
    "ev_sessionization": ev_sessionization,
})
ORACLES.update({
    "dp_embedding_neardup": DP_EMB_NEARDUP_SQL,
    "ev_sessionization": EV_SESSION_SQL,
})


# --- X10: storage-unit pretty printing -------------------------------------

def x10_storage_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-readable byte units in the freon report style
    (ref RandomKeyGenerator.java:960): per-bucket used bytes rendered
    as B/KB/MB/GB with one decimal. Pure arithmetic CASE — identical
    in both engines (exact-int / power-of-two divisions in double)."""
    usage = recon.quota_usage(model.om_keys(spark, sf_dir))
    b = F.col("used_bytes")
    human = (
        F.when(b >= 2**30, F.concat(F.round(b / F.lit(2**30), 1), F.lit(" GB")))
        .when(b >= 2**20, F.concat(F.round(b / F.lit(2**20), 1), F.lit(" MB")))
        .when(b >= 2**10, F.concat(F.round(b / F.lit(2**10), 1), F.lit(" KB")))
        .otherwise(F.concat(b, F.lit(" B")))
    )
    return usage.select("volume", "bucket", "used_bytes", human.alias("human_size")).orderBy(
        "volume", "bucket"
    )


X10_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume, bucket, used_bytes,
       CASE WHEN used_bytes >= 1073741824
              THEN concat(round(used_bytes / 1073741824.0, 1), ' GB')
            WHEN used_bytes >= 1048576
              THEN concat(round(used_bytes / 1048576.0, 1), ' MB')
            WHEN used_bytes >= 1024
              THEN concat(round(used_bytes / 1024.0, 1), ' KB')
            ELSE concat(used_bytes, ' B') END AS human_size
FROM (
  SELECT volume, bucket,
         CAST(SUM(data_size * replication_factor) AS BIGINT) AS used_bytes
  FROM om_keys GROUP BY volume, bucket
) ORDER BY volume, bucket""",
)

QUERIES["x10_storage_units"] = x10_storage_units
ORACLES["x10_storage_units"] = X10_SQL


# --- rollup + exact percentiles (beyond-reference SQL breadth) ------------

def a1_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-size totals with ROLLUP(volume, bucket) — subtotal rows per
    volume and a grand total (the reference has no grouping sets; Recon
    recomputes each level separately — one rollup pass replaces three)."""
    keys = model.om_keys(spark, sf_dir)
    return (
        keys.rollup("volume", "bucket")
        .agg(F.count(F.lit(1)).alias("n_keys"), F.sum("data_size").alias("total_bytes"))
        .orderBy(F.asc_nulls_first("volume"), F.asc_nulls_first("bucket"))
    )


A1_ROLLUP_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume, bucket, count(*) AS n_keys,
       CAST(SUM(data_size) AS BIGINT) AS total_bytes
FROM om_keys GROUP BY ROLLUP(volume, bucket)
ORDER BY volume ASC NULLS FIRST, bucket ASC NULLS FIRST""",
)


def size_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-volume size percentiles (Spark 4 `percentile` is exact
    with linear interpolation — same law as DuckDB quantile_cont)."""
    keys = model.om_keys(spark, sf_dir)
    return (
        keys.groupBy("volume")
        .agg(
            F.percentile("data_size", 0.5).alias("p50"),
            F.percentile("data_size", 0.95).alias("p95"),
            F.percentile("data_size", 0.99).alias("p99"),
        )
        .orderBy("volume")
    )


PERCENTILES_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    body="""SELECT volume,
       quantile_cont(data_size, 0.5) AS p50,
       quantile_cont(data_size, 0.95) AS p95,
       quantile_cont(data_size, 0.99) AS p99
FROM om_keys GROUP BY volume ORDER BY volume""",
)

QUERIES["a1_histogram_rollup"] = a1_histogram_rollup
QUERIES["size_percentiles"] = size_percentiles
ORACLES["a1_histogram_rollup"] = A1_ROLLUP_SQL
ORACLES["size_percentiles"] = PERCENTILES_SQL


# --- TPC-H join-shape breadth: semi (q4), outer distribution (q13),
#     group-filter (q18) -----------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS semi-join: orders with at least one late line."""
    orders = model.load(spark, sf_dir, "orders")
    li = model.load(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > "1998-06-01").select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped left outer join: distribution of order counts per
    customer INCLUDING zero-order customers."""
    cust = model.load(spark, sf_dir, "customer")
    orders = model.load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped group-filter (HAVING): orders whose total quantity
    exceeds a threshold, with customer attribution."""
    cust = model.load(spark, sf_dir, "customer")
    orders = model.load(spark, sf_dir, "orders")
    li = model.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, o_orderkey AS orderkey, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, orderkey ASC LIMIT 100
"""

QUERIES["q4_order_priority"] = q4_order_priority
QUERIES["q13_customer_distribution"] = q13_customer_distribution
QUERIES["q18_large_orders"] = q18_large_orders
ORACLES["q4_order_priority"] = Q4_SQL
ORACLES["q13_customer_distribution"] = Q13_SQL
ORACLES["q18_large_orders"] = Q18_SQL


# --- native-authorizer effective access (OzoneNativeAuthorizer chain) ------

def acl_effective_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective DELETE access for principal alice (groups: eng) over
    every key: the full authorizer chain keyAcls(DELETE) ∧
    prefix/bucket/volumeAcls(WRITE) with first-failing-level reasons,
    aggregated per (volume, bucket, allowed, deny_reason).
    Ref OzoneNativeAuthorizer.java:104-166, OzoneAclUtil.java:91-154."""
    out = acl_ops.effective_key_access(
        model.om_keys(spark, sf_dir),
        model.key_acls(spark, sf_dir),
        model.bucket_acls(spark),
        model.volume_acls(spark),
        model.prefix_acls(spark),
        user="alice",
        groups=["eng"],
        right=acl_ops.ACL_DELETE,
    )
    return (
        out.groupBy("volume", "bucket", "allowed", "deny_reason")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("volume", "bucket", "allowed", "deny_reason")
    )


def _acl_grant_sql(right: int) -> str:
    """DuckDB twin of principal_matches('alice', ['eng']) AND
    bit_allows(rights, right)."""
    return (
        "((type = 'USER' AND name = 'alice') OR "
        "(type = 'GROUP' AND name IN ('eng')) OR "
        "type NOT IN ('USER', 'GROUP')) AND "
        f"(((rights >> {right}) & 1 = 1 OR (rights >> 7) & 1 = 1) "
        "AND (rights >> 8) & 1 = 0)"
    )


ACL_EFFECTIVE_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    model.ACL_VOLUME_CTE,
    model.ACL_BUCKET_CTE,
    model.ACL_PREFIX_CTE,
    model.KEY_ACLS_CTE,
    body=f""", k_allow AS (
  SELECT row_key, max(CASE WHEN {_acl_grant_sql(4)} THEN 1 ELSE 0 END) = 1 AS ok
  FROM key_acls GROUP BY row_key
), b_allow AS (
  SELECT volume, bucket, max(CASE WHEN {_acl_grant_sql(1)} THEN 1 ELSE 0 END) = 1 AS ok
  FROM bucket_acls GROUP BY volume, bucket
), v_allow AS (
  SELECT volume, max(CASE WHEN {_acl_grant_sql(1)} THEN 1 ELSE 0 END) = 1 AS ok
  FROM volume_acls GROUP BY volume
), p_allow AS (
  SELECT prefix, max(CASE WHEN {_acl_grant_sql(1)} THEN 1 ELSE 0 END) = 1 AS ok
  FROM prefix_acls GROUP BY prefix
), decided AS (
  SELECT volume, bucket, (k_ok AND p_ok AND b_ok AND v_ok) AS allowed,
         CASE WHEN k_ok AND p_ok AND b_ok AND v_ok THEN NULL
              WHEN NOT k_ok THEN 'key'
              WHEN NOT p_ok THEN 'prefix'
              WHEN NOT b_ok THEN 'bucket'
              ELSE 'volume' END AS deny_reason
  FROM (
    SELECT k.volume, k.bucket,
           coalesce(ka.ok, false) AS k_ok,
           coalesce(pa.ok, true) AS p_ok,
           coalesce(ba.ok, false) AS b_ok,
           coalesce(va.ok, false) AS v_ok
    FROM om_keys k
    LEFT JOIN k_allow ka ON k.row_key = ka.row_key
    LEFT JOIN p_allow pa ON k.row_key = pa.prefix
    LEFT JOIN b_allow ba ON k.volume = ba.volume AND k.bucket = ba.bucket
    LEFT JOIN v_allow va ON k.volume = va.volume
  )
)
SELECT volume, bucket, allowed, deny_reason, count(*) AS n_keys
FROM decided GROUP BY volume, bucket, allowed, deny_reason
ORDER BY volume, bucket, allowed, deny_reason""",
)

QUERIES["acl_effective_access"] = acl_effective_access
ORACLES["acl_effective_access"] = ACL_EFFECTIVE_SQL


# --- ACL mutation plane (round 7): addAcl / removeAcl / setAcl --------------

def acl_add_remove_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-wide addAcl then removeAcl over the key ACL plane
    (OzoneAclUtil.java:215-269 laws as dataset transforms,
    operators/acl.py add_acls/remove_acls):

    - add: WORLD LIST on every RF-1 key (append lane — RF-1 keys have
      no WORLD entry) and READ_ACL for the owner of every
      data_size%3==0 key (bit-OR lane: 17 | 32 = 49);
    - remove: DELETE from every owner entry (17→1, 49→33) and READ
      from every RF-3 WORLD entry (1 & ~1 = 0 → entry DROPPED — the
      reference's isEmpty() removal).

    Output: the (type, name, rights) census of the resulting plane —
    any bit error or mis-dropped entry shifts the counts."""
    keys = model.om_keys(spark, sf_dir)
    owner = F.element_at(
        F.array(F.lit("alice"), F.lit("bob"), F.lit("carol")),
        (F.col("data_size") % 3 + 1).cast("int"),
    )
    base = model.key_acls(spark, sf_dir)
    add_patch = (
        keys.filter(F.col("replication_factor") == 1)
        .select(
            "row_key",
            F.lit("WORLD").alias("type"),
            F.lit("").alias("name"),
            F.lit("ACCESS").alias("scope"),
            F.lit(8).cast("long").alias("rights"),  # LIST
        )
        .unionByName(
            keys.filter(F.col("data_size") % 3 == 0).select(
                "row_key",
                F.lit("USER").alias("type"),
                owner.alias("name"),
                F.lit("ACCESS").alias("scope"),
                F.lit(32).cast("long").alias("rights"),  # READ_ACL
            )
        )
    )
    after_add = acl_ops.add_acls(base, add_patch, ["row_key"])
    rm_patch = (
        keys.select(
            "row_key",
            F.lit("USER").alias("type"),
            owner.alias("name"),
            F.lit("ACCESS").alias("scope"),
            F.lit(16).cast("long").alias("rights"),  # DELETE
        )
        .unionByName(
            keys.filter(F.col("replication_factor") == 3).select(
                "row_key",
                F.lit("WORLD").alias("type"),
                F.lit("").alias("name"),
                F.lit("ACCESS").alias("scope"),
                F.lit(1).cast("long").alias("rights"),  # READ
            )
        )
    )
    final = acl_ops.remove_acls(after_add, rm_patch, ["row_key"])
    return (
        final.groupBy("type", "name", "rights")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.count_distinct("row_key").alias("n_objects"),
        )
        .orderBy("type", "name", "rights")
    )


ACL_ADD_REMOVE_SQL = model.with_ctes(
    model.OM_KEYS_CTE,
    model.KEY_ACLS_CTE,
    """add_patch AS (
  SELECT row_key, 'WORLD' AS type, '' AS name, 'ACCESS' AS scope,
         8 AS rights
  FROM om_keys WHERE replication_factor = 1
  UNION ALL
  SELECT row_key, 'USER',
         ['alice', 'bob', 'carol'][CAST(data_size % 3 + 1 AS INTEGER)],
         'ACCESS', 32
  FROM om_keys WHERE data_size % 3 = 0
)""",
    """after_add AS (
  SELECT COALESCE(a.row_key, p.row_key) AS row_key,
         COALESCE(a.type, p.type) AS type,
         COALESCE(a.name, p.name) AS name,
         COALESCE(a.scope, p.scope) AS scope,
         CASE WHEN a.rights IS NOT NULL AND p.rights IS NOT NULL
              THEN a.rights | p.rights
              ELSE COALESCE(a.rights, p.rights) END AS rights
  FROM key_acls a FULL OUTER JOIN add_patch p
    ON a.row_key = p.row_key AND a.type = p.type
   AND a.name = p.name AND a.scope = p.scope
)""",
    """rm_patch AS (
  SELECT row_key, 'USER' AS type,
         ['alice', 'bob', 'carol'][CAST(data_size % 3 + 1 AS INTEGER)] AS name,
         'ACCESS' AS scope, 16 AS rights
  FROM om_keys
  UNION ALL
  SELECT row_key, 'WORLD', '', 'ACCESS', 1
  FROM om_keys WHERE replication_factor = 3
)""",
    """acl_final AS (
  SELECT a.row_key, a.type, a.name, a.scope,
         CASE WHEN p.rights IS NOT NULL THEN a.rights & ~p.rights
              ELSE a.rights END AS rights
  FROM after_add a LEFT JOIN rm_patch p
    ON a.row_key = p.row_key AND a.type = p.type
   AND a.name = p.name AND a.scope = p.scope
)""",
    body="""SELECT type, name, rights, count(*) AS n_entries,
       count(DISTINCT row_key) AS n_objects
FROM acl_final WHERE rights <> 0
GROUP BY type, name, rights
ORDER BY type, name, rights""",
)

QUERIES["acl_add_remove_plane"] = acl_add_remove_plane
ORACLES["acl_add_remove_plane"] = ACL_ADD_REMOVE_SQL


def acl_set_plane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setAcl (OzoneAclUtil.java:276-287): wholesale replacement of two
    buckets' ACL lists; untouched buckets keep theirs."""
    patch = spark.createDataFrame(
        [
            ("vol_a", "bkt_f", "USER", "alice", 128, "ACCESS"),
            ("vol_r", "bkt_o", "GROUP", "eng", 3, "ACCESS"),
        ],
        "volume string, bucket string, type string, name string, "
        "rights long, scope string",
    )
    out = acl_ops.set_acls(
        model.bucket_acls(spark), patch, ["volume", "bucket"]
    )
    return out.orderBy("volume", "bucket", "type", "name")


ACL_SET_SQL = (
    "WITH bucket_acls"
    + model._acl_values(
        model.ACL_BUCKET_ROWS, "volume, bucket, type, name, rights, scope"
    )
    + """,
set_patch(volume, bucket, type, name, rights, scope) AS (VALUES
  ('vol_a', 'bkt_f', 'USER', 'alice', 128, 'ACCESS'),
  ('vol_r', 'bkt_o', 'GROUP', 'eng', 3, 'ACCESS'))
SELECT volume, bucket, type, name, scope, rights FROM (
  SELECT b.* FROM bucket_acls b
  WHERE NOT EXISTS (SELECT 1 FROM set_patch p
    WHERE p.volume = b.volume AND p.bucket = b.bucket)
  UNION ALL
  SELECT volume, bucket, type, name, rights, scope FROM set_patch
)
ORDER BY volume, bucket, type, name"""
)

QUERIES["acl_set_plane"] = acl_set_plane
ORACLES["acl_set_plane"] = ACL_SET_SQL
