"""Round-13 measurement harness (guide §1): per-query wall time plus
Spark job/stage counts, bench methodology (count() materialization,
snapshot read path, cold + steady runs).

Usage: python tools/profile_r13.py [query ...]   (default: a hot set)

Job/stage counts come from the status tracker via a per-run job group;
a query whose steady-state run still launches 30 jobs is paying fixed
scheduling latency, not data cost — the first thing to check before
touching any plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_ozone_spark import model  # noqa: E402
from hadoop_ozone_spark.session import get_spark  # noqa: E402
from hadoop_ozone_spark.sources import deployment  # noqa: E402

HOT = [
    "dp_media_dup_clusters",
    "dp_corpus_drift",
    "dp_media_near_dup",
    "rm1_replication_actions",
    "dp_knn_label",
    "dp_bpe_vocab",
    "bm1_balancer_moves",
    "dp_dedup_clusters",
    "rm4_delete_actions",
    "dp_nb_lang_confusion",
    "dp_knn_label_ivfpq",
    "dp_ann_ivfpq_knn_join",
    "dp_ann_ivfpq_topk",
    "dp_minhash_pairs",
    "dp_dsir_weights",
    "dp_qsketch_by_source",
    "dp_bm25_topk",
    "dp_qsketch_tokens",
    "dp_ann_ivf_topk",
]


def main() -> int:
    names = sys.argv[1:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r13")
    sc = spark.sparkContext
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get(
        deployment.SNAPSHOT_ENV,
        os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/"))),
    )
    deployment.ensure_snapshot(spark, sf_dir, base)
    model.clear_derived_cache()
    qs = entrymod.queries()
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        runs = []
        jobs = stages = tasks = 0
        for i in range(3):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            runs.append(round(dt, 3))
            if i == 2:  # steady-state job/stage census
                jids = tracker.getJobIdsForGroup(group)
                jobs = len(jids)
                for j in jids:
                    ji = tracker.getJobInfo(j)
                    if ji:
                        stages += len(ji.stageIds)
                        for s in ji.stageIds:
                            si = tracker.getStageInfo(s)
                            if si:
                                tasks += si.numTasks
        out[name] = {
            "cold_sec": runs[0],
            "steady_sec": min(runs[1:]),
            "runs": runs,
            "steady_jobs": jobs,
            "steady_stages": stages,
            "steady_tasks": tasks,
            "rows": n,
        }
        print(
            f"# {name}: steady {min(runs[1:]):.2f}s (cold {runs[0]:.2f}s) "
            f"jobs={jobs} stages={stages} tasks={tasks} rows={n}",
            flush=True,
        )
    os.makedirs(os.path.join(repo, "artifacts"), exist_ok=True)
    tag = os.environ.get("PROFILE_TAG", "before")
    with open(
        os.path.join(repo, "artifacts", f"profile_r13_{tag}.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
