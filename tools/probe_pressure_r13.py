"""Session-state pressure probe (optimization r13, guide §1/§5).

The 100-query bench context reads several queries 2-8x slower than
their isolated steady state (rm1 11.9s vs 2.84s isolated) on a FASTER
calibration — a session-state signature, not a plan problem. This
probe runs the bench's HEADLINE sequence (one run per query, same
order, same snapshot read path) and samples after every query:

- cumulative cached-RDD memory/disk bytes (getRDDStorageInfo),
- number of cached RDDs,
- cumulative JVM GC time and count (GarbageCollectorMXBeans),
- JVM heap used (Runtime),

so the growth curve shows WHERE the pressure comes from and the
post-fix run shows it gone.

Usage: python tools/probe_pressure_r13.py [tag]
Writes artifacts/pressure_r13_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from hadoop_ozone_spark import model  # noqa: E402
from hadoop_ozone_spark.session import get_spark  # noqa: E402
from hadoop_ozone_spark.sources import deployment  # noqa: E402


def jvm_stats(spark) -> dict:
    jvm = spark._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    beans = mf.getGarbageCollectorMXBeans()
    for i in range(beans.size()):
        b = beans.get(i)
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    # JIT code-cache / metaspace pools: a full code cache silently stops
    # JIT compilation ("CodeCache is full. Compiler has been disabled")
    # and later queries run interpreted — invisible in heap/GC stats
    pools = {}
    pb = mf.getMemoryPoolMXBeans()
    for i in range(pb.size()):
        p = pb.get(i)
        nm = p.getName()
        if "CodeHeap" in nm or nm in ("Metaspace", "CodeCache"):
            u = p.getUsage()
            pools[nm] = {
                "used_mb": round(u.getUsed() / 1e6, 1),
                "max_mb": round(u.getMax() / 1e6, 1),
            }
    comp = mf.getCompilationMXBean()
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    cached_mem = sum(r.memSize() for r in infos)
    cached_disk = sum(r.diskSize() for r in infos)
    return {
        "heap_used_mb": round((rt.totalMemory() - rt.freeMemory()) / 1e6),
        "gc_ms": gc_ms,
        "gc_count": gc_n,
        "jit_ms": comp.getTotalCompilationTime(),
        "pools": pools,
        "cached_rdds": len(infos),
        "cached_mem_mb": round(cached_mem / 1e6),
        "cached_disk_mb": round(cached_disk / 1e6),
    }


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pressure-probe")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get(
        deployment.SNAPSHOT_ENV,
        os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/"))),
    )
    deployment.ensure_snapshot(spark, sf_dir, base)
    model.clear_derived_cache()
    qs = entrymod.queries()
    n_runs = int(os.environ.get("PRESSURE_RUNS", "1"))
    rows = []
    prev = jvm_stats(spark)
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        dt = min(runs[1:]) if len(runs) > 1 else runs[0]
        st = jvm_stats(spark)
        rows.append(
            {
                "query": name,
                "sec": dt,
                "runs": runs,
                "gc_delta_ms": st["gc_ms"] - prev["gc_ms"],
                "jit_delta_ms": st["jit_ms"] - prev["jit_ms"],
                **st,
            }
        )
        prev = st
        cc = " ".join(
            f"{nm.split(chr(39))[1] if chr(39) in nm else nm}={v['used_mb']:.0f}/{v['max_mb']:.0f}MB"
            for nm, v in st["pools"].items()
        )
        print(
            f"# {name}: {dt:.2f}s runs={runs} gc+{rows[-1]['gc_delta_ms']}ms "
            f"jit+{rows[-1]['jit_delta_ms']}ms "
            f"cached={st['cached_rdds']}rdd/{st['cached_mem_mb']}MB "
            f"heap={st['heap_used_mb']}MB {cc}",
            flush=True,
        )
    out = os.path.join(repo, "artifacts", f"pressure_r13_{tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    total = sum(r["sec"] for r in rows)
    print(f"total {total:.1f}s; final {jvm_stats(spark)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
