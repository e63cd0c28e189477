"""One-off probe: run a query 3x and log scratch keep/keep_ckpt
hits vs misses plus per-call wall time, to explain steady-state jobs.

Usage: python tools/probe_slots_r13.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_ozone_spark import scratch  # noqa: E402

_orig_keep = scratch.keep
_orig_keep_ckpt = scratch.keep_ckpt
STATS: dict[str, list[str]] = {"keep": [], "ckpt": []}


def keep(tag, df):
    key = (scratch._session_key(df), tag)
    i = scratch._CURSOR.get(key, 0)
    slots = scratch._SLOTS.get(key, [])
    hit = i < len(slots) and scratch._same_plan(slots[i], df)
    t0 = time.time()
    out = _orig_keep(tag, df)
    STATS["keep"].append(
        f"{tag}[{i}] {'HIT' if hit else 'MISS'} {time.time()-t0:.3f}s"
    )
    return out


def keep_ckpt(tag, df):
    key = (scratch._session_key(df), tag)
    i = scratch._CKPT_CURSOR.get(key, 0)
    slots = scratch._CKPT_SLOTS.get(key, [])
    hit = i < len(slots) and scratch._same_plan(slots[i][0], df)
    t0 = time.time()
    out = _orig_keep_ckpt(tag, df)
    STATS["ckpt"].append(
        f"{tag}[{i}] {'HIT' if hit else 'MISS'} {time.time()-t0:.3f}s"
    )
    return out


scratch.keep = keep
scratch.keep_ckpt = keep_ckpt

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_ozone_spark import model  # noqa: E402
from hadoop_ozone_spark.session import get_spark  # noqa: E402
from hadoop_ozone_spark.sources import deployment  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-slots-r13")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get(
        deployment.SNAPSHOT_ENV,
        os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/"))),
    )
    deployment.ensure_snapshot(spark, sf_dir, base)
    model.clear_derived_cache()
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        for i in range(3):
            STATS["keep"].clear()
            STATS["ckpt"].clear()
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            print(f"# {name} run{i}: {dt:.2f}s", flush=True)
            for kind in ("keep", "ckpt"):
                for line in STATS[kind]:
                    print(f"#   {kind} {line}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
