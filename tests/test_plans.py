"""Physical-plan regression tests: lock in the plan shapes the scale
story depends on (top-k cut, broadcast joins, partial aggregation,
parquet pushdown). A change that silently degrades one of these would
pass correctness but lose 100 TB viability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import skew


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_listing_is_topk_not_full_sort(spark, sf_dir):
    p = plan_of(entry.queries()["w1_list_keys_page"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p  # no global sort


def test_container_health_broadcasts_dim(spark, sf_dir):
    p = plan_of(entry.queries()["j2_container_health"](spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_q3_joins_broadcast(spark, sf_dir):
    p = plan_of(entry.queries()["q3_top_revenue_orders"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_histogram_partial_aggregation(spark, sf_dir):
    p = plan_of(entry.queries()["a1_file_size_histogram"](spark, sf_dir))
    # two-phase hash aggregate (map-side partial + final)
    assert p.count("HashAggregate") >= 2


def test_q6_predicates_reach_parquet(spark, sf_dir):
    p = plan_of(entry.queries()["q6_selective_agg"](spark, sf_dir))
    assert "PushedFilters: [" in p
    assert "GreaterThanOrEqual(l_discount" in p or "l_discount" in p.split("PushedFilters")[1][:400]


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = model.load(spark, sf_dir, "lineitem").select("l_orderkey")
    p = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint>" in p


def test_salted_aggregation_equals_direct(spark, sf_dir):
    keys = model.om_keys(spark, sf_dir)
    direct = {
        (r["volume"], r["bucket"]): (r["s"], r["c"])
        for r in keys.groupBy("volume", "bucket")
        .agg(F.sum("data_size").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r["volume"], r["bucket"]): (r["sum_data_size"], r["cnt"])
        for r in skew.salted_sum_count(
            keys.select("volume", "bucket", "data_size"), ["volume", "bucket"], "data_size"
        ).collect()
    }
    assert salted == direct


def test_q7_dims_broadcast_fact_shuffles_once(spark, sf_dir):
    p = plan_of(entry.queries()["q7_volume_shipping"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims must never shuffle the fact


def test_q10_topk_after_aggregation(spark, sf_dir):
    p = plan_of(entry.queries()["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_q16_distinct_count_partial_agg(spark, sf_dir):
    p = plan_of(entry.queries()["q16_supplier_variety"](spark, sf_dir))
    # distinct-count expands to two-phase aggregation
    assert p.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in p


def test_q19_part_filters_pushed_to_scan(spark, sf_dir):
    p = plan_of(entry.queries()["q19_disjunctive_revenue"](spark, sf_dir))
    # the quantity bounds (common to all OR branches after join) and the
    # part brand/size IN-lists must reach the parquet readers
    assert "PushedFilters: [" in p
    assert "l_quantity" in p


def test_q21_single_fact_shuffle(spark, sf_dir):
    p = plan_of(entry.queries()["q21_waiting_suppliers"](spark, sf_dir))
    # orders broadcasts into lineitem; the only fact-sized shuffle is the
    # (orderkey, suppkey) aggregate — the window and final agg reshuffle
    # already-aggregated frames
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange hashpartitioning") <= 3


def test_q2_groupwise_min_over_aggregate(spark, sf_dir):
    p = plan_of(entry.queries()["q2_min_cost_supplier"](spark, sf_dir))
    # the window (row_number) must run over the offers aggregate, i.e.
    # after a HashAggregate, never over raw lineitem
    assert "Window" in p
    assert "BroadcastHashJoin" in p
    assert p.index("Window") < p.index("HashAggregate")  # window above agg in tree


def test_q20_semi_join_stays_semi(spark, sf_dir):
    p = plan_of(entry.queries()["q20_surplus_suppliers"](spark, sf_dir))
    assert "LeftSemi" in p
