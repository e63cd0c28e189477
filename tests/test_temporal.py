"""As-of join and binned range join: semantics + plan-shape locks."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import __spark_entry__ as entry
from hadoop_ozone_spark.operators import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_semantics(spark):
    probe = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100),
         (1, _ts("2024-01-01 12:00:00"), 101),
         (2, _ts("2024-01-01 09:00:00"), 200)],
        "k long, ts timestamp, probe_id long",
    )
    build = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 7),
         (1, _ts("2024-01-01 11:00:00"), 8),
         (2, _ts("2024-01-01 09:30:00"), 9)],  # after the only probe for k=2
        "k long, ts timestamp, b_id long",
    )
    out = {
        r["probe_id"]: r["b_id"]
        for r in temporal.asof_join(
            probe, build, keys=["k"], probe_ts="ts", build_ts="ts",
            carry=["b_id"], tie_break="b_id",
        ).collect()
    }
    assert out == {100: 7, 101: 8, 200: None}


def test_asof_inclusive_and_tie_break(spark):
    t = _ts("2024-01-01 10:00:00")
    probe = spark.createDataFrame([(1, t, 100)], "k long, ts timestamp, probe_id long")
    build = spark.createDataFrame(
        [(1, t, 7), (1, t, 8)], "k long, ts timestamp, b_id long"
    )
    row = temporal.asof_join(
        probe, build, keys=["k"], probe_ts="ts", build_ts="ts",
        carry=["b_id"], tie_break="b_id",
    ).collect()[0]
    # equal-ts build rows ARE eligible (inclusive); max tie_break wins
    assert row["b_id"] == 8


def test_asof_single_shuffle(spark, sf_dir):
    df = entry.queries()["ev_asof_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange for the window; the final orderBy is
    # a range exchange — no join exchanges at all (no join operator)
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_binned_matches_theta(spark):
    facts = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 97 * 1.5).alias("v")
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 10.0, 50.0), (3, 50.0, 150.0)],
        "tier_id int, lo double, hi double",
    )
    got = sorted(
        (r["id"], r["tier_id"])
        for r in temporal.range_join_binned(
            facts, intervals, "v", "lo", "hi", bucket_width=7.0
        ).collect()
    )
    want = sorted(
        (r["id"], r["tier_id"])
        for r in facts.join(
            intervals, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
        ).collect()
    )
    assert got == want and len(got) == 1000


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    df = entry.queries()["ev_range_join_binned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cohort_retention_matches_python_replay(spark):
    # three cohorts with planted churn; replay both laws in Python
    from collections import defaultdict
    from datetime import date, timedelta

    base = date(2024, 1, 1)  # a Monday
    rows = []
    eid = 0
    # user u starts in week u%3; is active in weeks start..start+(u%4)
    for u in range(40):
        start = u % 3
        for wk in range(start, start + (u % 4) + 1):
            eid += 1
            d = base + timedelta(weeks=wk, days=u % 5, hours=u % 7)
            rows.append((eid, str(d), u, "click", 1.0))
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    ev = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))

    first_week = {}
    active = defaultdict(set)
    for _eid, ts, u, _t, _v in rows:
        wk = (date.fromisoformat(ts[:10]) - base).days // 7
        first_week[u] = min(first_week.get(u, 99), wk)
        active[u].add(wk)
    expect = defaultdict(int)
    for u, weeks in active.items():
        for wk in weeks:
            expect[(first_week[u], wk - first_week[u])] += 1

    # drive the query body directly on the constructed frame
    import hadoop_ozone_spark.model as m
    import hadoop_ozone_spark.plans.temporal_queries as tq

    orig_load = m.load
    try:
        m.load = lambda s, sf, t: ev  # the query reads only events
        got = {
            ((date.fromisoformat(str(r.cohort_week)[:10]) - base).days // 7,
             r.week_offset): r.n_active_users
            for r in tq.ev_cohort_retention(spark, "unused").collect()
        }
    finally:
        m.load = orig_load
    assert got == dict(expect)


def test_cohort_retention_single_corpus_shuffle(spark, sf_dir):
    df = entry.queries()["ev_cohort_retention"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus shuffles once, keyed on user_id; the firsts dim rides a
    # broadcast into the join; no sort-merge join anywhere
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_funnel_matches_python_replay(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(u, minutes, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, str(base + timedelta(minutes=minutes)), u, typ, 1.0))

    ev(1, 0, "click"); ev(1, 30, "purchase")          # converts
    ev(2, 0, "click"); ev(2, 90, "purchase")          # too late (>1h)
    ev(3, 0, "view")                                   # never clicked
    ev(4, 0, "purchase"); ev(4, 10, "click"); ev(4, 60, "purchase")  # converts
    ev(5, 0, "click"); ev(5, 60, "purchase")          # exactly 1h → converts
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    frame = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))

    import hadoop_ozone_spark.model as m
    import hadoop_ozone_spark.plans.temporal_queries as tq

    orig_load = m.load
    try:
        m.load = lambda s, sf, t: frame
        got = [(r.step_no, r.step, r.n_users, r.rate_ppm)
               for r in tq.ev_funnel(spark, "unused").collect()]
    finally:
        m.load = orig_load
    assert got == [
        (1, "all_users", 5, 1_000_000),
        (2, "clicked", 4, 800_000),
        (3, "purchased_within_1h", 3, 600_000),
    ]


def test_funnel_single_corpus_shuffle(spark, sf_dir):
    df = entry.queries()["ev_funnel"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_transition_matrix_matches_python_replay(spark):
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    # user 1: a->b->a->c ; user 2: b->b ; user 3: single event (no pair)
    seq = {1: ["a", "b", "a", "c"], 2: ["b", "b"], 3: ["a"]}
    rows, eid = [], 0
    for u, types in seq.items():
        for i, t in enumerate(types):
            eid += 1
            rows.append((eid, str(base + timedelta(minutes=i)), u, t, 1.0))
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    frame = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))

    expect = Counter()
    for types in seq.values():
        for a, b in zip(types, types[1:]):
            expect[(a, b)] += 1
    row_tot = defaultdict(int)
    for (a, _b), n in expect.items():
        row_tot[a] += n

    import hadoop_ozone_spark.model as m
    import hadoop_ozone_spark.plans.temporal_queries as tq

    orig_load = m.load
    try:
        m.load = lambda s, sf, t: frame
        got = {(r.event_type, r.next_type): (r.n_transitions, r.prob_ppm)
               for r in tq.ev_transition_matrix(spark, "unused").collect()}
    finally:
        m.load = orig_load
    assert got == {
        pair: (n, n * 1_000_000 // row_tot[pair[0]])
        for pair, n in expect.items()
    }


def test_transition_matrix_single_corpus_shuffle(spark, sf_dir):
    df = entry.queries()["ev_transition_matrix"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Join" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_conversion_latency_matches_python_replay(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(u, seconds, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, str(base + timedelta(seconds=seconds)), u, typ, 1.0))

    ev(1, 0, "click"); ev(1, 0, "purchase")       # 0s → bin 1
    ev(2, 0, "click"); ev(2, 3, "purchase")       # 3s → bin 4
    ev(3, 10, "click"); ev(3, 5, "purchase")      # purchase BEFORE click → no conversion
    ev(4, 0, "click"); ev(4, 4, "purchase"); ev(4, 2, "purchase")  # first-after = 2s → bin 2
    ev(5, 0, "view")                               # never clicked
    ev(6, 0, "click"); ev(6, 2_000_000, "purchase")  # > 2^20 s → overflow bin
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    frame = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))

    import hadoop_ozone_spark.model as m
    import hadoop_ozone_spark.plans.temporal_queries as tq

    orig_load = m.load
    try:
        m.load = lambda s, sf, t: frame
        got = [(r.latency_ub_s, r.n_conversions, r.share_ppm)
               for r in tq.ev_conversion_latency(spark, "unused").collect()]
    finally:
        m.load = orig_load
    # bin = smallest power of two STRICTLY greater (the binning.py law):
    # 0s → 1, {2s, 3s} → 4, 2e6 s (≥ 2^20) → overflow
    assert got == [
        (1, 1, 250_000),
        (4, 2, 500_000),
        (9223372036854775807, 1, 250_000),
    ]


def test_conversion_latency_single_corpus_shuffle(spark, sf_dir):
    df = entry.queries()["ev_conversion_latency"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_top_paths_matches_python_replay(spark):
    from datetime import datetime, timedelta
    from collections import Counter

    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(u, minutes, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, str(base + timedelta(minutes=minutes)), u, typ, 1.0))

    seqs = {1: "abcab", 2: "abc", 3: "xy", 4: "ccc"}
    for u, s in seqs.items():
        for i, t in enumerate(s):
            ev(u, i, t)
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    frame = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))

    import hadoop_ozone_spark.model as m
    import hadoop_ozone_spark.plans.temporal_queries as tq

    orig_load = m.load
    try:
        m.load = lambda s, sf, t: frame
        got = [(r.t1, r.t2, r.t3, r.n_paths, r.share_ppm)
               for r in tq.ev_top_paths(spark, "unused").collect()]
    finally:
        m.load = orig_load
    c = Counter()
    for s in seqs.values():
        for i in range(len(s) - 2):
            c[tuple(s[i:i + 3])] += 1
    total = sum(c.values())
    exp = sorted(
        ((t1, t2, t3, n, n * 1_000_000 // total) for (t1, t2, t3), n in c.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )[:20]
    assert got == exp


def test_top_paths_single_corpus_shuffle(spark, sf_dir):
    df = entry.queries()["ev_top_paths"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1
