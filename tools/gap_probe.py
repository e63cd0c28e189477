"""Driver-gap probe (guide §1/§7.3): run a query steady-state with the
event log on, then report executor job time vs inter-job driver gaps.

Usage: python tools/gap_probe.py <query> [query ...]

A query whose steady run is mostly inter-job gap is bottlenecked on
driver-side work (Catalyst re-optimization, py4j plan construction,
broadcast builds), not on data — the fix is plan truncation / Column
memoization / fewer sequential actions, not shuffle tuning.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-gap"


def parse(app_id: str, mark: str) -> dict:
    paths = [p for p in glob.glob(f"{EVDIR}/*{app_id}*")]
    files = []
    for p in paths:
        files.extend(sorted(glob.glob(p + "/events*")) if os.path.isdir(p) else [p])
    jobs: dict[int, dict] = {}
    for f in files:
        for line in open(f, errors="replace"):
            try:
                e = json.loads(line)
            except Exception:
                continue
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"],
                    "desc": e.get("Properties", {}).get("spark.job.description", ""),
                }
            elif t == "SparkListenerJobEnd" and e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
    steady = sorted(
        (j for j in jobs.values() if j.get("desc") == mark and "end" in j),
        key=lambda j: j["start"],
    )
    dur = sum(j["end"] - j["start"] for j in steady) / 1000.0
    gaps = sum(
        max(0, b["start"] - a["end"]) for a, b in zip(steady, steady[1:])
    ) / 1000.0
    return {"jobs": len(steady), "job_sec": round(dur, 2), "gap_sec": round(gaps, 2)}


def main() -> int:
    names = sys.argv[1:]
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("gap-probe")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVDIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    spark = builder.getOrCreate()
    import __spark_entry__ as entrymod
    from hadoop_ozone_spark import model
    from hadoop_ozone_spark.sources import deployment

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    deployment.ensure_snapshot(
        spark, sf_dir, os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/")))
    )
    model.clear_derived_cache()
    qs = entrymod.queries()
    sc = spark.sparkContext
    results = {}
    for name in names:
        fn = qs[name]
        for i in range(2):  # warm
            t0 = time.time()
            fn(spark, sf_dir).count()
        mark = f"GAP_{name}"
        sc.setJobDescription(mark)
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        sc.setJobDescription(None)
        results[name] = {"wall_sec": round(wall, 2), "mark": mark}
    app_id = sc.applicationId
    spark.stop()
    time.sleep(1)
    for name, r in results.items():
        r.update(parse(app_id, r.pop("mark")))
        print(
            f"# {name}: wall={r['wall_sec']}s jobs={r['jobs']} "
            f"job_time={r['job_sec']}s driver_gaps={r['gap_sec']}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
