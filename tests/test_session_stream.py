"""Stream≡batch pins for gap sessionization (session_window twin)."""
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from hadoop_ozone_spark import model
from hadoop_ozone_spark.operators import temporal
from hadoop_ozone_spark.streaming import session_stream


def _rows(df):
    return {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events,
         r.sum_value)
        for r in df.collect()
    }


def test_session_stream_equals_batch_on_real_events(spark, sf_dir):
    # append mode (the only mode session windows support when
    # streaming): a far-future sentinel pushes the watermark so the
    # trailing no-data batch flushes every real session — compared
    # against the batch reprocess of the same law
    ev = model.load(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="ozspark_sess_")
    try:
        ev.select("event_id", "ts", "user_id", "event_type", "value").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/events")
        spark.createDataFrame(
            [(0, "2030-01-01 00:00:00", -1, "sentinel", 0.0)],
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts")).write.mode("append").parquet(
            f"{tmp}/events"
        )
        stream = session_stream.read_click_stream(
            spark, f"{tmp}/events", max_files_per_trigger=1000
        )
        q = (
            session_stream.session_stream(stream)
            .writeStream.format("memory")
            .queryName("sess_single")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = _rows(spark.sql("SELECT * FROM sess_single WHERE user_id >= 0"))
        want = _rows(session_stream.session_batch(ev))
        assert got == want and len(got) > 100
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_session_stream_merges_across_batches(spark):
    # user 1's session straddles the two files: batch 1 ends at 00:10,
    # batch 2 resumes at 00:25 (gap 15m < 30m) — the open session must
    # MERGE, not close. A far-future sentinel pushes the watermark so
    # append mode emits everything real.
    tmp = tempfile.mkdtemp(prefix="ozspark_sessmerge_")
    sch = "event_id long, ts string, user_id long, event_type string, value double"

    def write(rows, path):
        spark.createDataFrame(rows, sch).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("overwrite").parquet(path)

    try:
        write(
            [
                (1, "2024-01-01 00:00:00", 1, "click", 1.0),
                (2, "2024-01-01 00:10:00", 1, "click", 2.0),
                (3, "2024-01-01 00:00:00", 2, "click", 4.0),
            ],
            f"{tmp}/events/b0",
        )
        write(
            [
                (4, "2024-01-01 00:25:00", 1, "purchase", 8.0),
                # user 2: exactly-gap boundary → MERGES (inclusive law)
                (5, "2024-01-01 00:30:00", 2, "click", 16.0),
                (6, "2030-01-01 00:00:00", 99, "sentinel", 0.0),
            ],
            f"{tmp}/events/b1",
        )
        # file-source ordering follows modification time: age b0 so the
        # sentinel (watermark push) can only arrive in the second batch
        now = time.time()
        for sub, off in (("b0", -120), ("b1", 0)):
            d = f"{tmp}/events/{sub}"
            for f_ in os.listdir(d):
                os.utime(os.path.join(d, f_), (now + off, now + off))
        stream = session_stream.read_click_stream(
            spark, f"{tmp}/events/*", max_files_per_trigger=1
        )
        q = (
            session_stream.session_stream(stream, watermark="1 minute")
            .writeStream.format("memory")
            .queryName("sess_merge")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = _rows(
            spark.sql("SELECT * FROM sess_merge WHERE user_id != 99")
        )
        assert got == {
            # user 1: one MERGED session 00:00 → 00:25 (+30m end)
            (1, "2024-01-01 00:00:00", "2024-01-01 00:55:00", 3, 11.0),
            # user 2: boundary at exactly 30m merges (inclusive law)
            (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2, 20.0),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sessionize_boundary_and_seq(spark):
    # batch operator: exclusive gap boundary + per-user session ordinals
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", 1.5),
            (2, "2024-01-01 00:29:59", 7, "click", 1.5),  # merges (< gap)
            (3, "2024-01-01 01:00:00", 7, "click", 2.0),  # 30m01s → new
            (4, "2024-01-01 01:30:00", 7, "click", 4.0),  # exactly gap → MERGE
        ],
        sch,
    ).withColumn("ts", F.to_timestamp("ts"))
    out = temporal.sessionize(ev).orderBy("session_seq").collect()
    assert [(r.session_seq, r.n_events, r.sum_value) for r in out] == [
        (1, 2, 3.0),
        (2, 2, 6.0),
    ]
    assert str(out[0].session_end) == "2024-01-01 00:59:59"
    assert str(out[1].session_end) == "2024-01-01 02:00:00"


def test_sessionize_vs_lag_cumsum_law(spark, sf_dir):
    # the native session_window form implements the SAME law as
    # ev_sessionization's lag/cumsum form (diff > gap starts a new
    # session; adjacent windows merge) — exact agreement on real data
    import __spark_entry__ as entry

    legacy = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in entry.queries()["ev_sessionization"](spark, sf_dir).collect()
    }
    native = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in temporal.sessionize(
            model.load(spark, sf_dir, "events")
        ).collect()
    }
    assert native == legacy and len(native) > 100
