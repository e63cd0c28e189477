"""TPC-H join-shape breadth (beyond-reference SQL surface).

The driver testdata is a slim TPC-H (no partsupp, no
shipmode/commitdate/receiptdate/phone columns), so the classic queries
are adapted to the available schema while keeping each query's
*join/aggregation shape* intact — that shape is what exercises the
engine: multi-nation self-referencing dims (Q7/Q8), LIKE-filtered star
joins (Q9), group-wise maxima (Q15), distinct-count rollups (Q16),
correlated per-group averages (Q17), disjunctive pushdown (Q19),
exists/not-exists self-joins collapsed to one aggregation (Q21), and
anti-join + scalar subquery (Q22).

Scale notes (100 TB discipline, same rules as the headline queries):
- every dim is filtered BEFORE it is broadcast; the fact table
  (lineitem) shuffles at most once per query, on its join key;
- selective dim joins are applied to orders before the lineitem join
  (Catalyst won't reorder without CBO stats — see q3's note);
- double outputs accumulate in DECIMAL then cast back (bit-exact vs
  the DuckDB oracle, STRICT_FLOATS-safe);
- Q21 is deliberately NOT the textbook exists/not-exists double
  self-join: per-(order, supplier) flags + one per-order window
  replaces two extra fact shuffles with one small-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_ozone_spark import model

DEC = "decimal(18,2)"
DEC4 = "decimal(22,4)"


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)


def _dsum4_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(22,4))) AS DOUBLE)"


def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


REV_SQL = "l_extendedprice * (1 - l_discount)"


# --- Q7: volume shipping between two nations -------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation-pair trade volume by year.

    supplier/customer are nation-filtered then broadcast; orders is cut
    by the customer semi before the lineitem shuffle (the only big one).
    """
    nation = model.load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        model.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        model.load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = model.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sel_orders = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    li = model.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(sel_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_dsum4_sql(REV_SQL)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share ---------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_8's share of EUROPE-customer ECONOMY-part
    revenue per order year. Numerator and denominator accumulate in
    DECIMAL; the share divides two exact doubles (engine-agnostic)."""
    nation = model.load(spark, sf_dir, "nation")
    region = model.load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust = (
        model.load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        model.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = model.load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = model.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    sel_orders = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    li = model.load(spark, sf_dir, "lineitem")
    rev = _rev()
    target = F.when(F.col("supp_nation") == "NATION_8", rev).otherwise(
        F.lit(0).cast(DEC4)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(sel_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(target).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_8' THEN {REV_SQL} ELSE 0 END
                AS DECIMAL(22,4))) AS DOUBLE)
         / {_dsum4_sql(REV_SQL)} AS mkt_share,
       {_dsum4_sql(REV_SQL)} AS total_revenue
FROM (
  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region    ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year ORDER BY o_year
"""


# --- Q9: product profit by nation/year -------------------------------------

def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: LIKE-filtered part star join, profit by supplier
    nation and year. (No partsupp table in the testdata, so profit is
    discounted revenue rather than revenue − supplycost·qty — the join
    tree is the Q9 tree minus the partsupp branch.)"""
    nation = model.load(spark, sf_dir, "nation")
    supp = (
        model.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    part = model.load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    orders = model.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = model.load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {_dsum4_sql(REV_SQL)} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


# --- Q10: returned-item reporting ------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: one-quarter orders, R-flag lines, top-20 customers by
    lost revenue. Orders are date-pruned before the lineitem shuffle;
    customer attribution joins AFTER the aggregation (top-k input is
    |customers|, not |lineitem|)."""
    nation = model.load(spark, sf_dir, "nation")
    cust = model.load(spark, sf_dir, "customer")
    orders = model.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = model.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_cust = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT o_custkey, {_dsum4_sql(REV_SQL)} AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
)
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


# --- Q12: shipping lateness vs order priority (adapted) ---------------------

def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per-category priority counts. The testdata has no
    l_shipmode, so the category is the ship delay bucket
    (days between o_orderdate and l_shipdate: FAST ≤ 60 < MEDIUM ≤ 120
    < SLOW) — same CASE-count aggregation over the orders⋈lineitem
    join."""
    orders = model.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = model.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 60, "FAST").when(delay <= 120, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


Q12_SQL = """
SELECT delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 'FAST'
              WHEN date_diff('day', o_orderdate, l_shipdate) <= 120 THEN 'MEDIUM'
              ELSE 'SLOW' END AS delay_bucket
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
)
GROUP BY delay_bucket ORDER BY delay_bucket
"""


# --- Q14: promotion effect --------------------------------------------------

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-revenue percentage over a part join for
    one ship year."""
    part = model.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = model.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC4))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN {REV_SQL} ELSE 0 END
                    AS DECIMAL(22,4))) AS DOUBLE)
         / {_dsum4_sql(REV_SQL)} AS promo_revenue_pct,
       {_dsum4_sql(REV_SQL)} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
"""


# --- Q15: top supplier (group-wise maximum) ---------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: quarterly revenue per supplier, keep the max.
    The max-filter compares exact DECIMAL totals (no double-equality
    hazard); the global max is a 1-row scalar aggregate broadcast back
    into the per-supplier frame — no single-partition WindowExec (a
    ``Window.partitionBy()`` here would force every aggregate row
    through one partition and emit Spark's "No Partition Defined"
    warning; the broadcast join is shuffle-free on the probe side)."""
    supp = model.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = model.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev_dec"))
    max_rev = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    return (
        per_supp.join(
            F.broadcast(max_rev), F.col("rev_dec") == F.col("max_rev")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM per_supp)
ORDER BY s_suppkey
"""


# --- Q16: supplier variety per part attribute (adapted via lineitem) --------

def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size).
    The part↔supplier relation is derived from lineitem (no partsupp
    table); brand exclusion + size IN-list prune the broadcast dim
    before the distinct aggregation."""
    part = model.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = model.load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q17: small-quantity-order revenue (correlated per-group average) -------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lines below 20% of their part's average quantity.
    The correlated scalar subquery becomes a per-part window over the
    brand-filtered join (one shuffle on l_partkey); the average divides
    an exact DECIMAL sum by the window count, identically in both
    engines."""
    part = model.load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17")
    li = model.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast(DEC4)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return (
        joined.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM (
  SELECT l_extendedprice, l_quantity,
         CAST(SUM(CAST(l_quantity AS DECIMAL(22,4))) OVER (PARTITION BY l_partkey)
              AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#17'
)
WHERE l_quantity < 0.2 * avg_qty
"""


# --- Q19: disjunctive predicate revenue -------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: three OR'd (brand, size, quantity) branches across
    the part join — the classic pushdown-through-disjunction test. The
    common subpredicates (size ≥ 1, quantity bounds) prune the scans;
    the OR resolves after the broadcast join."""
    part = model.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = model.load(spark, sf_dir, "lineitem")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#24") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT {_dsum4_sql(REV_SQL)} AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q21: suppliers who kept orders waiting (adapted lateness) --------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: multi-supplier F-status orders where exactly one
    supplier shipped late (> 90 days after order date; the testdata has
    no commit/receipt dates), counted per EUROPE supplier.

    The textbook exists + not-exists double self-join on lineitem is
    collapsed into ONE per-order aggregate: collect the order's
    distinct suppliers and its distinct LATE suppliers in a single
    groupBy(l_orderkey) (both sets bounded by suppliers-per-order,
    ≤7 in TPC-H — safe to collect at any corpus scale), then
    membership is a set-size filter and the waiting supplier is the
    singleton late set's element. The fact shuffles exactly once, on
    l_orderkey, with map-side partial set-merge — the earlier
    (order,supplier)-agg + per-order-window form paid a second
    exchange because HashPartitioning(orderkey, suppkey) does not
    satisfy the window's orderkey clustering."""
    orders = model.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = model.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("supps"),
            F.collect_set(F.when(late, F.col("l_suppkey"))).alias("late_supps"),
        )
    )
    nation = model.load(spark, sf_dir, "nation")
    region = model.load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        model.load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        per_order.filter(
            (F.size("late_supps") == 1) & (F.size("supps") >= 2)
        )
        .select(F.element_at("late_supps", 1).alias("l_suppkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), flagged AS (
  SELECT l_suppkey, is_late,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supps,
         SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_os
)
SELECT s_name, count(*) AS numwait
FROM flagged
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE is_late = 1 AND n_supps >= 2 AND n_late = 1 AND r_name = 'EUROPE'
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


# --- Q22: global sales opportunity (anti-join + scalar subquery) ------------

Q22_NATIONS = (3, 8, 13, 17, 21)


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers in a nation slice
    with no orders since 2000 (anti-join; the testdata has orders for
    every customer, so "idle" is date-scoped like the original's
    7-year window). The scalar average is a 1-row broadcast cross
    join; the anti-join shuffles customer against the date-pruned,
    projected order keys (both sides key-partitioned — the scale
    path)."""
    cust = model.load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*Q22_NATIONS)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = model.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       {_dsum_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_nationkey IN {Q22_NATIONS}
  AND c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM customer
    WHERE c_acctbal > 0 AND c_nationkey IN {Q22_NATIONS}
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey ORDER BY cntrycode
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q10_returned_items": q10_returned_items,
    "q12_late_shipments": q12_late_shipments,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_variety": q16_supplier_variety,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_late_shipments": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_idle_customers": Q22_SQL,
}


# --- Q2: cheapest supplier per part (group-wise min + join-back) ------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part minimum + correlated join-back. No partsupp
    table, so the part↔supplier offer relation is each supplier's
    average discounted unit price observed in lineitem; the winner per
    part is the min (ties → lowest suppkey), reported with supplier
    attributes for LARGE parts of size 15.

    Shape notes: the offer relation aggregates lineitem once (shuffle
    on (partkey, suppkey)); the group-wise min is a window over that
    aggregate (re-shuffle of the small offers frame, not the fact);
    supplier/nation broadcast at the end.
    """
    part = model.load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    li = model.load(spark, sf_dir, "lineitem")
    unit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC4)
    offers = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), 
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(
            (F.sum(unit).cast("double") / F.sum(F.col("l_quantity").cast(DEC4)).cast("double"))
            .alias("avg_unit_price")
        )
        .withColumn("avg_unit_price", F.round("avg_unit_price", 6))
    )
    w = Window.partitionBy("p_partkey")
    best = (
        offers.withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.asc("avg_unit_price"), F.asc("l_suppkey"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    supp = model.load(spark, sf_dir, "supplier")
    nation = model.load(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name", F.col("n_name").alias("nation"),
            "p_partkey", "p_brand", "avg_unit_price",
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH offers AS (
  SELECT p_partkey, p_brand, l_suppkey,
         round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(22,4))) AS DOUBLE), 6) AS avg_unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'LARGE' AND p_size <= 10
  GROUP BY p_partkey, p_brand, l_suppkey
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY p_partkey
                                 ORDER BY avg_unit_price ASC, l_suppkey ASC) AS rn
    FROM offers
  ) WHERE rn = 1
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_brand, avg_unit_price
FROM best
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


# --- Q11: important part share (HAVING vs global scalar) --------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value vs a scalar fraction of the global
    total. Value = discounted revenue per part from NATION_3 suppliers
    (no partsupp: lineitem is the holding relation); keep parts above
    0.1% of the total. The scalar is a 1-row broadcast; the per-part
    aggregate shuffles once."""
    nation = model.load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        model.load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = model.load(spark, sf_dir, "lineitem")
    held = li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = held.groupBy("l_partkey").agg(F.sum(_rev()).alias("value_dec"))
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(0.001)).cast(DEC4).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH held AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM held
WHERE value_dec > (SELECT CAST(SUM(value_dec) * 0.001 AS DECIMAL(22,4)) FROM held)
ORDER BY part_value DESC, l_partkey
"""


# --- Q20: suppliers with surplus stock of a part family (nested semis) ------

def q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-joins — suppliers qualified by a
    quantity condition over a LIKE-filtered part family. No partsupp
    availqty, so "surplus" = the supplier shipped more than half of
    that part's 1997 total across all suppliers. Inner aggregate →
    qualifying (part, supplier) pairs → semi-join up to suppliers →
    nation filter."""
    part = model.load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = model.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    fam = li.join(F.broadcast(part.select("p_partkey")),
                  F.col("l_partkey") == F.col("p_partkey"))
    per_ps = fam.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC4)).alias("qty_dec")
    )
    w = Window.partitionBy("l_partkey")
    qualified = (
        per_ps.withColumn("part_total", F.sum("qty_dec").over(w))
        .filter(F.col("qty_dec") * 2 > F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    nation = model.load(spark, sf_dir, "nation")
    supp = model.load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


Q20_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(22,4))) AS qty_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
), qualified AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, qty_dec,
           SUM(qty_dec) OVER (PARTITION BY l_partkey) AS part_total
    FROM per_ps
  ) WHERE qty_dec * 2 > part_total
)
SELECT s_name, n_name AS nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM qualified)
ORDER BY s_name
"""


QUERIES.update({
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q20_surplus_suppliers": q20_surplus_suppliers,
})
ORACLES.update({
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q20_surplus_suppliers": Q20_SQL,
})


# --- Q18: the last missing TPC-H shape (round 7 - full 22) -----------------
# (Q4 and Q13 shapes already live in plans/policy_queries.py.)


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total lineitem quantity exceeds 150
    (scaled to the 1-4-lineitem driver orders), top 100 by price. The
    HAVING aggregate runs BEFORE the customer join, so only qualifying
    orders (a tiny set) reach the dimension — the fact shuffles once
    on l_orderkey."""
    li = model.load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = model.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(l_quantity) AS BIGINT) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING CAST(SUM(l_quantity) AS BIGINT) > 150
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100
"""


QUERIES.update({
    "q18_large_volume_customers": q18_large_volume_customers,
})
ORACLES.update({
    "q18_large_volume_customers": Q18_SQL,
})
