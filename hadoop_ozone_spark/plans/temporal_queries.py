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


# --- cohort retention: weekly first-event cohorts × activity offset ------


def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users cohort by the Monday week
    of their FIRST event; each later active week increments
    (cohort_week, week_offset). retention_ppm is exact-integer against
    the offset-0 row (= cohort size: the first week is active by
    construction).

    Shape: ONE user-keyed corpus shuffle does all the heavy lifting —
    the cohort week is a min() window over the same user partition
    (no second events pass, no join), and the following distinct on
    (user, cohort, week) reuses that partitioning (hash(user)
    satisfies the wider clustering — the subset rule). The retention
    matrix itself is cohorts x weeks — tiny; the ppm ratio is a
    first_value window over that tiny frame. Plan-pinned to exactly
    one corpus exchange.
    """
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id")
    active = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.date_trunc("week", F.min("ts").over(uw)).alias("cohort_week"),
    ).distinct()
    matrix = (
        active.select(
            "cohort_week",
            (
                F.datediff(F.to_date("week"), F.to_date("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return (
        matrix.select(
            "cohort_week",
            "week_offset",
            "n_active_users",
            F.first("n_active_users").over(w).alias("_cohort_size"),
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_active_users",
            F.expr("(n_active_users * 1000000) DIV _cohort_size").alias(
                "retention_ppm"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


EV_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id, f.cohort_week, date_trunc('week', e.ts) AS week
  FROM events e JOIN firsts f USING (user_id)
), m AS (
  SELECT cohort_week,
         CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(week AS DATE)) / 7 AS BIGINT)
           AS week_offset,
         count(*) AS n_active_users
  FROM act GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active_users,
       CAST((n_active_users * 1000000) //
            first_value(n_active_users) OVER (PARTITION BY cohort_week ORDER BY week_offset)
            AS BIGINT) AS retention_ppm
FROM m
ORDER BY cohort_week, week_offset
"""


# --- conversion funnel: click → purchase within the attribution window ---


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step conversion funnel with a 1-hour attribution window:
    all users → users with a click → users whose first click is
    followed by a purchase within 1h. Exact-ppm rates vs the top of
    the funnel.

    Shape: the first-click anchor is a min() window over the user
    partition, the conversion flag folds per user in the SAME
    clustered pass (one corpus shuffle), and the funnel itself is a
    1-row total stacked to 3 — nothing after the per-user fold is
    corpus-sized.
    """
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id")
    fc = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(uw)
    flags = ev.select(
        "user_id",
        fc.alias("fc"),
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= fc)
            & (F.col("ts") <= fc + F.expr("INTERVAL 1 HOUR")),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    )
    per_user = flags.groupBy("user_id").agg(
        F.max(F.col("fc").isNotNull().cast("int")).alias("clicked"),
        F.max("conv").alias("converted"),
    )
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("clicked").cast("long").alias("n_clicked"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    return totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("step_no"),
                    F.lit("all_users").alias("step"),
                    F.col("n_all").alias("n_users"),
                ),
                F.struct(
                    F.lit(2).alias("step_no"),
                    F.lit("clicked").alias("step"),
                    F.col("n_clicked").alias("n_users"),
                ),
                F.struct(
                    F.lit(3).alias("step_no"),
                    F.lit("purchased_within_1h").alias("step"),
                    F.col("n_converted").alias("n_users"),
                ),
            )
        ).alias("s"),
        "n_all",
    ).select(
        F.col("s.step_no").alias("step_no"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        F.expr("(s.n_users * 1000000) DIV n_all").alias("rate_ppm"),
    ).orderBy("step_no")


EV_FUNNEL_SQL = """
WITH fc AS (
  SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts END) AS first_click
  FROM events GROUP BY user_id
), per_user AS (
  SELECT e.user_id,
         CAST(max(CASE WHEN f.first_click IS NOT NULL THEN 1 ELSE 0 END) AS INT)
           AS clicked,
         max(CASE WHEN e.event_type = 'purchase'
                   AND e.ts >= f.first_click
                   AND e.ts <= f.first_click + INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END) AS converted
  FROM events e JOIN fc f USING (user_id)
  GROUP BY e.user_id
), totals AS (
  SELECT count(*) AS n_all,
         CAST(SUM(clicked) AS BIGINT) AS n_clicked,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user
)
SELECT step_no, step, n_users,
       CAST((n_users * 1000000) // n_all AS BIGINT) AS rate_ppm
FROM totals, (VALUES (1, 'all_users'), (2, 'clicked'), (3, 'purchased_within_1h'))
     AS s(step_no, step),
LATERAL (SELECT CASE step_no WHEN 1 THEN n_all WHEN 2 THEN n_clicked
                ELSE n_converted END AS n_users) n
ORDER BY step_no
"""


# --- event-type transition matrix: per-user next-event Markov counts -----


def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event transition matrix (the Markov-chain view of
    clickstream paths): count (event_type → next_event_type) over each
    user's time-ordered stream, with the exact-ppm transition
    probability within each source type.

    Shape: one user-keyed corpus shuffle (the lead() window), then the
    matrix is |types|² — tiny; the ppm normalizer is a window over
    that tiny frame.
    """
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type"),
        F.lead("event_type").over(uw).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    matrix = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tw = Window.partitionBy("event_type")
    return (
        matrix.select(
            "event_type",
            "next_type",
            "n_transitions",
            F.sum("n_transitions").over(tw).alias("_row_total"),
        )
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            F.expr("(n_transitions * 1000000) DIV _row_total").alias(
                "prob_ppm"
            ),
        )
        .orderBy("event_type", "next_type")
    )


EV_TRANSITION_SQL = """
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
), m AS (
  SELECT event_type, next_type, count(*) AS n_transitions
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n_transitions,
       CAST((n_transitions * 1000000) //
            SUM(n_transitions) OVER (PARTITION BY event_type) AS BIGINT)
         AS prob_ppm
FROM m
ORDER BY event_type, next_type
"""


# --- conversion latency histogram: first click → first purchase ----------

# pow2 second-bins 1s..2^20s (~12 days), overflow Long.MAX — the same
# generated-CASE-ladder discipline as functions/binning (no log2 floats)
_LAT_BOUNDS = [2**e for e in range(0, 21)]
_LAT_LONG_MAX = 9223372036854775807


def _lat_bin(col):
    expr = F.lit(_LAT_LONG_MAX)
    for ub in reversed(_LAT_BOUNDS):
        expr = F.when(col < F.lit(ub), F.lit(ub)).otherwise(expr)
    return expr


def ev_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency histogram: per user, the gap
    between the FIRST click and the first purchase at-or-after it,
    power-of-two-binned in whole seconds with the exact-ppm share of
    conversions per bin — the time-to-convert curve next to ev_funnel's
    fixed 1h window.

    Portability: latency is the exact integer microsecond difference
    (unix_micros / epoch_us — never second-truncated timestamps, whose
    boundary-crossing semantics differ between engines), floored to
    seconds by integer DIV; bins are a generated CASE ladder (the
    functions/binning discipline — no log2 floats).

    Shape: ONE user-keyed corpus shuffle (the first-click window; the
    per-user fold reuses the partitioning by the subset rule), then
    every later frame is ≤ 22 bins."""
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id")
    fc = F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(uw)
    staged = ev.select(
        "user_id",
        fc.alias("fc"),
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= fc),
            F.unix_micros(F.col("ts")),
        ).alias("p_us"),
    ).filter(F.col("fc").isNotNull())
    per_user = staged.groupBy("user_id").agg(
        (F.min("p_us") - F.min(F.unix_micros(F.col("fc")))).alias("lat_us")
    )
    lat = per_user.filter(F.col("lat_us").isNotNull()).select(
        F.expr("lat_us DIV 1000000").alias("lat_s")
    )
    binned = lat.groupBy(_lat_bin(F.col("lat_s")).alias("latency_ub_s")).agg(
        F.count(F.lit(1)).alias("n_conversions")
    )
    return (
        binned.select(
            "latency_ub_s",
            "n_conversions",
            F.expr(
                "n_conversions * 1000000 DIV sum(n_conversions) OVER ()"
            ).alias("share_ppm"),
        )
        .orderBy("latency_ub_s")
    )


_LAT_LADDER_SQL = (
    "CASE "
    + " ".join(f"WHEN lat_s < {ub} THEN CAST({ub} AS BIGINT)" for ub in _LAT_BOUNDS)
    + f" ELSE CAST({_LAT_LONG_MAX} AS BIGINT) END"
)

EV_LATENCY_SQL = f"""
WITH fc AS (
  SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts END) AS fc
  FROM events GROUP BY user_id
), per_user AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= f.fc
                  THEN epoch_us(e.ts) END)
           - min(epoch_us(f.fc)) AS lat_us
  FROM events e JOIN fc f USING (user_id)
  WHERE f.fc IS NOT NULL
  GROUP BY e.user_id
), lat AS (
  SELECT lat_us // 1000000 AS lat_s FROM per_user WHERE lat_us IS NOT NULL
), binned AS (
  SELECT {_LAT_LADDER_SQL} AS latency_ub_s, count(*) AS n_conversions
  FROM lat GROUP BY 1
)
SELECT CAST(latency_ub_s AS BIGINT) AS latency_ub_s,
       CAST(n_conversions AS BIGINT) AS n_conversions,
       CAST(n_conversions * 1000000 // SUM(n_conversions) OVER () AS BIGINT)
         AS share_ppm
FROM binned ORDER BY latency_ub_s
"""


# --- top event paths: per-user event-type trigrams -----------------------


def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 per-user event-type trigrams (sequence mining lite — the
    path view one step up from ev_transition_matrix's bigrams): two
    lead() windows over each user's time-ordered stream, count per
    (t1, t2, t3), exact-ppm share of all trigrams, deterministic
    top-20. One user-keyed corpus shuffle; the result is ≤ |types|³.

    Ordering ties inside a user's stream break on event_id (the
    transition-matrix convention)."""
    from pyspark.sql import Window

    ev = model.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    counted = tri.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("n_paths")
    )
    return (
        counted.select(
            "t1",
            "t2",
            "t3",
            "n_paths",
            F.expr("n_paths * 1000000 DIV sum(n_paths) OVER ()").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(20)
    )


EV_TOP_PATHS_SQL = """
WITH tri AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counted AS (
  SELECT t1, t2, t3, count(*) AS n_paths
  FROM tri WHERE t3 IS NOT NULL
  GROUP BY t1, t2, t3
)
SELECT t1, t2, t3, CAST(n_paths AS BIGINT) AS n_paths,
       CAST(n_paths * 1000000 // SUM(n_paths) OVER () AS BIGINT) AS share_ppm
FROM counted
ORDER BY n_paths DESC, t1, t2, t3
LIMIT 20
"""


QUERIES = {
    "ev_asof_join": ev_asof_join,
    "ev_range_join_binned": ev_range_join_binned,
    "ev_cohort_retention": ev_cohort_retention,
    "ev_funnel": ev_funnel,
    "ev_transition_matrix": ev_transition_matrix,
    "ev_conversion_latency": ev_conversion_latency,
    "ev_top_paths": ev_top_paths,
}

ORACLES = {
    "ev_asof_join": EV_ASOF_SQL,
    "ev_range_join_binned": EV_RANGE_SQL,
    "ev_cohort_retention": EV_COHORT_SQL,
    "ev_funnel": EV_FUNNEL_SQL,
    "ev_transition_matrix": EV_TRANSITION_SQL,
    "ev_conversion_latency": EV_LATENCY_SQL,
    "ev_top_paths": EV_TOP_PATHS_SQL,
}
