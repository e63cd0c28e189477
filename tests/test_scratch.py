"""Scratch-cache registry laws (ADVICE r5): bounded generations per
slot, steady-state reuse for identical plans, release on plan change."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_ozone_spark import scratch


def _agg(spark, n):
    return spark.range(n).withColumn("x", F.col("id") % 7).groupBy("x").count()


def test_same_plan_reuses_cached_frame(spark):
    scratch.fresh("t_reuse")
    a = scratch.keep("t_reuse", _agg(spark, 100))
    a.count()
    scratch.fresh("t_reuse")
    b = scratch.keep("t_reuse", _agg(spark, 100))
    assert a is b  # the previous generation's cache is reused
    assert b.storageLevel.useMemory


def test_plan_change_releases_previous_generation(spark):
    scratch.fresh("t_rel")
    a = scratch.keep("t_rel", _agg(spark, 100))
    a.count()
    scratch.fresh("t_rel")
    c = scratch.keep("t_rel", _agg(spark, 200))
    assert c is not a
    assert not a.storageLevel.useMemory  # old generation released
    assert c.storageLevel.useMemory


def test_multiple_slots_align_by_position(spark):
    scratch.fresh("t_slots")
    a1 = scratch.keep("t_slots", _agg(spark, 100))
    a2 = scratch.keep("t_slots", _agg(spark, 300))
    scratch.fresh("t_slots")
    b1 = scratch.keep("t_slots", _agg(spark, 100))
    b2 = scratch.keep("t_slots", _agg(spark, 300))
    assert a1 is b1 and a2 is b2
