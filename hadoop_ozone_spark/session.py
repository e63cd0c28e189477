"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every knob here is chosen for the
100 TB / 1000-executor deployment and merely scaled down:

- AQE on (runtime coalescing, skew-join splitting — the realistic skew at
  scale is one hot ``(volume, bucket)`` dominating a shuffle);
- shuffle partitions sized for the local core count; on a real cluster
  this is overridden to ~2-3× total cores and AQE coalesces;
- Arrow enabled for the few Pandas-UDF paths (datapipe only — the
  reference-parity operators are pure Column expressions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "hadoop-ozone-spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # full scan paths in plan strings (default truncates Location at
        # 100 chars, which silently defeats plan-string path asserts)
        .config("spark.sql.maxMetadataStringLength", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # the oracle gate materializes FULL result frames via toPandas
        # (multi-million-row surfaces at sf10 exceed the 1g default and
        # kill the context, poisoning every later query in the run); a
        # production consumer never collects, so this only widens the
        # harness's safety valve, not the engine's memory model.
        # Kept at HALF the driver heap (ADVICE r12): a cap equal to the
        # heap can never fire — the collect OOMs the driver first — so
        # the valve only provides a clean failure while meaningfully
        # below spark.driver.memory.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
