"""applyInPandasWithState custom stateful operator: streaming latest-
state ≡ batch compaction after full replay."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hadoop_ozone_spark.operators import cdc
from hadoop_ozone_spark.streaming import maintenance, stateful

EVENTS = [
    (1, "PUT", "/v/b/k1", 100, None, "2024-01-01 00:00:01"),
    (2, "PUT", "/v/b/k2", 200, None, "2024-01-01 00:00:02"),
    (3, "UPDATE", "/v/b/k1", 150, 100, "2024-01-01 00:00:03"),
    (4, "DELETE", "/v/b/k2", 200, None, "2024-01-01 00:00:04"),
    (5, "PUT", "/v/b/k3", 300, None, "2024-01-01 00:00:05"),
    (6, "DELETE", "/v/b/k3", 300, None, "2024-01-01 00:00:06"),
    (7, "PUT", "/v/b/k3", 350, None, "2024-01-01 00:00:07"),
]


def test_stateful_stream_equals_batch_compaction(spark):
    tmp = tempfile.mkdtemp(prefix="ozspark_state_")
    try:
        df = spark.createDataFrame(
            EVENTS,
            "seqno long, op string, row_key string, data_size long, old_size long, event_time string",
        ).withColumn("event_time", F.to_timestamp("event_time"))
        df.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = maintenance.read_event_stream(spark, f"{tmp}/events", max_files_per_trigger=10)
        out = stateful.stateful_latest_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("state_test")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["row_key"]: (r["live"], r["data_size"], r["last_seqno"])
            for r in spark.sql(
                "SELECT * FROM state_test"
            ).collect()
        }
        batch = cdc.latest_state(df.select("seqno", "op", "row_key", "data_size"))
        live_batch = {r["row_key"]: r["data_size"] for r in batch.collect()}
        # streaming state agrees with batch compaction on live keys
        assert {k for k, v in got.items() if v[0]} == set(live_batch)
        for k, size in live_batch.items():
            assert got[k][1] == size
        assert got["/v/b/k2"] == (False, 0, 4)
        assert got["/v/b/k3"] == (True, 350, 7)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
