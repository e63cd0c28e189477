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


def test_keep_ckpt_returns_leaf_and_reuses(spark):
    scratch.fresh("t_ckpt")
    a = scratch.keep_ckpt("t_ckpt", _agg(spark, 100))
    # the registered artifact is a checkpoint LEAF, not the full plan
    assert "LogicalRDD" in a._jdf.queryExecution().analyzed().toString()
    scratch.fresh("t_ckpt")
    b = scratch.keep_ckpt("t_ckpt", _agg(spark, 100))
    assert a is b  # steady state: one checkpoint serves both calls
    scratch.fresh("t_ckpt")
    c = scratch.keep_ckpt("t_ckpt", _agg(spark, 200))
    assert c is not a  # plan change: new generation


def test_keep_result_memoizes_on_input_plan(spark):
    calls = []

    def build(n):
        def _b():
            calls.append(n)
            return _agg(spark, n).localCheckpoint()
        return _b

    r1 = scratch.keep_result("t_res", spark.range(100), build(100))
    r2 = scratch.keep_result("t_res", spark.range(100), build(100))
    assert r1 is r2 and calls == [100]  # same input plan: builder skipped
    r3 = scratch.keep_result("t_res", spark.range(200), build(200))
    assert r3 is not r1 and calls == [100, 200]  # input changed: rebuilt
