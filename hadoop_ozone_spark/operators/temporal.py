"""Temporal join operators the reference lacks but a Spark-native
analytics engine should offer (SURVEY §2.3 notes Ozone has no theta,
range, or as-of joins — these are the beyond-reference additions a
training-data/event pipeline needs).

Both operators are built so the ONLY shuffle is keyed and balanced:

- as-of join: tag-union + one window over the join key. No range
  self-join, no per-row probe: sort-merge within each key partition,
  O(n log n) per key, single shuffle on the key. This is the classic
  distributed as-of plan (same shape Flink/kdb+ use).
- binned range join: intervals explode into the fixed-width buckets
  they cover; facts bucket by value; the join is then an EQUI-join on
  the bucket id (shuffle- and broadcast-friendly) with an exact
  residual filter. A naive theta join is a BroadcastNestedLoopJoin —
  fine for a 5-row dim, quadratic death for large interval tables; the
  binned form survives both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    probe_ts: str,
    build_ts: str,
    carry: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For each probe row, attach the build row with the greatest
    ``build_ts`` <= ``probe_ts`` within the same key group (NULLs when
    no build row precedes the probe).

    ``carry`` columns are taken from the matched build row; they must
    not collide with probe column names (rename on the build side
    first). Ties on ``build_ts`` resolve to the greatest ``tie_break``
    value (required for determinism when build timestamps repeat).

    Implementation: union both sides with a side tag (build=0 sorts
    before probe=1 at equal ts, making the match inclusive), then one
    ``last(..., ignorenulls)`` window per carried column ordered by
    (ts, side, tie). Single shuffle on ``keys``.
    """
    order = [F.col("_ts"), F.col("_side")] + (
        [F.col(tie_break).asc_nulls_first()] if tie_break else []
    )
    probe_cols = [c for c in probe.columns]
    build_side = build.select(
        *[F.col(k) for k in keys],
        F.col(build_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in carry],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe_cols
            if c not in keys
        ],
    )
    if tie_break and tie_break not in carry and tie_break not in keys:
        raise ValueError("tie_break must be a key or carried build column")
    probe_side = probe.select(
        *[F.col(k) for k in keys],
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(build.schema[c].dataType).alias(c)
            for c in carry
        ],
        *[F.col(c) for c in probe_cols if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = build_side.unionByName(probe_side)
    matched = tagged.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}") for c in carry],
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("_ts").alias(probe_ts)]
        + [F.col(c) for c in probe_cols if c not in keys and c != probe_ts]
        + [F.col(f"_m_{c}").alias(c) for c in carry]
    )
    return matched.filter(F.col("_side") == 1).select(*out_cols)


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join facts to [lo, hi) intervals as an equi-join on fixed-width
    bucket ids: each interval emits one row per bucket it overlaps, each
    fact lands in exactly one bucket, and the equality on ``_bucket``
    co-locates candidates; the residual ``lo <= v < hi`` filter is
    exact. With non-overlapping intervals each fact matches ≤1 row, and
    the shuffle key is the bucket id — balanced as long as
    ``bucket_width`` is small relative to the value spread (skewed hot
    buckets fall to AQE skew-split).
    """
    # degenerate intervals (hi <= lo) make this sequence DESCEND,
    # emitting a couple of spurious candidate buckets — harmless: the
    # exact residual lo <= v < hi filter below rejects every candidate
    # such an interval attracts, so correctness never depends on the
    # bucket list being well-formed
    binned_intervals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    binned_facts = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    # explicit hint: the interval table is the dim side. Without it,
    # Spark sizes a createDataFrame-born dim as unknown and can choose
    # to broadcast the FACT side instead (observed at sf0.1) — fatal
    # when facts are the 100 TB table.
    return (
        binned_facts.join(F.broadcast(binned_intervals), "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key merge
    into a session while each gap is < ``gap_minutes``; a gap >= the
    threshold starts a new session (the classic web-analytics law, and
    the batch twin of Structured Streaming's session windows).

    Built on Spark's native ``F.session_window`` — the merge runs
    inside the aggregate (one shuffle on the key, codegen'd, and the
    identical expression works under ``readStream`` with a watermark:
    streaming/session_stream.py is that twin). Session end is
    ``last_event_ts + gap`` (Spark's window-end convention), and the
    boundary is INCLUSIVE: adjacent windows merge, so an event exactly
    ``gap`` after its predecessor still merges — the same ``diff >
    gap``-starts-new law as ev_sessionization's lag/cumsum form
    (plans/policy_queries.py); the two are pinned equal in
    tests/test_session_stream.py. Values accumulate in decimal(18,2)
    — exact, so the sum is engine-
    and order-independent (the ev_range_join discipline).
    ``session_seq`` (the key's nth session) is a row_number over the
    AGGREGATED frame — that second exchange moves sessions, not
    events (bounded by distinct sessions per key).
    """
    agg = session_agg(events, key_col, ts_col, gap_minutes, value_col)
    w = Window.partitionBy(key_col).orderBy("session_start")
    return agg.select(
        F.col(key_col),
        "session_start",
        "session_end",
        F.row_number().over(w).cast("long").alias("session_seq"),
        "n_events",
        "sum_value",
    )


def session_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
) -> DataFrame:
    """The shared session aggregate — identical expression in batch
    ``sessionize`` and the streaming twin (a watermarked input makes
    it incremental with per-open-session state; see
    streaming/session_stream.py)."""
    return (
        events.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
