"""Beyond-reference temporal queries over the events table: as-of join
and binned range join (SURVEY §2.3 — the reference has neither; both
are table stakes for an event/training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import temporal

# --- as-of: each purchase matched to the user's latest click at-or-before it


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = model.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return temporal.asof_join(
        probe=purchases,
        build=clicks,
        keys=["user_id"],
        probe_ts="ts",
        build_ts="ts",
        carry=["click_id", "click_ts"],
        tie_break="click_id",
    ).select(
        "purchase_id", "user_id", F.col("ts").alias("purchase_ts"),
        "purchase_value", "click_id", "click_ts",
    ).orderBy("purchase_id")


EV_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
         CASE WHEN event_type = 'click' THEN event_id END AS c_id,
         CASE WHEN event_type = 'click' THEN ts END AS c_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT user_id, ts, event_id, value, side,
         last_value(c_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, c_id ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
         last_value(c_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, c_id ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
  FROM tagged
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       value AS purchase_value, click_id, click_ts
FROM w WHERE side = 1 ORDER BY purchase_id
"""


# --- binned range join: classify event values into tier intervals --------

TIERS = [(1, 0.0, 5.0), (2, 5.0, 25.0), (3, 25.0, 75.0), (4, 75.0, 150.0), (5, 150.0, 500.0)]
BUCKET_WIDTH = 25.0


def ev_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = model.load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(TIERS, "tier_id int, lo double, hi double")
    joined = temporal.range_join_binned(
        ev, tiers, value_col="value", lo_col="lo", hi_col="hi", bucket_width=BUCKET_WIDTH
    )
    return (
        joined.groupBy("tier_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("tier_id")
    )


_TIER_VALUES = ", ".join(f"({t}, {lo}, {hi})" for t, lo, hi in TIERS)

EV_RANGE_SQL = f"""
WITH tiers(tier_id, lo, hi) AS (VALUES {_TIER_VALUES})
SELECT tier_id, lo, hi, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier_id, lo, hi
ORDER BY tier_id
"""


QUERIES = {
    "ev_asof_join": ev_asof_join,
    "ev_range_join_binned": ev_range_join_binned,
}

ORACLES = {
    "ev_asof_join": EV_ASOF_SQL,
    "ev_range_join_binned": EV_RANGE_SQL,
}
