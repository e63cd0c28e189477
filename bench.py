"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}}.

Deployment read path (VERDICT r3 #1): the warmup phase materializes the
namespace/corpora planes ONCE as the partitioned, key-sorted snapshot
plus the container-bucketed catalog tables (sources/deployment.py), and
every query then reads the materialized layout — so per-query timings
measure query plans against the serving layout, not per-run shim
derivation. Ingest/build cost is reported separately as warmup_sec.
Set SPARK_GRAFT_NO_SNAPSHOT=1 to measure the old shim-derivation path.

Variance control: each query runs three times. Run 1 is the COLD cost
(includes any within-query persist builds — recorded per query as
cold_sec). Runs 2-3 are steady state: the JSON's headline "queries"
records their min, and spread_pct = |run3-run2|/min documents genuine
repeat-to-repeat variance (the number the round notes track against
the <±10% bar). Per-query timing includes plan + execution + a
count() materialization (no driver collect of the data itself —
results land in marts, not the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from hadoop_ozone_spark.session import get_spark

# Heavy dedup/ANN pipelines run FIRST (right after warmup) so their
# timings reflect the query, not 20 queries' worth of accumulated
# session state (persisted frames, broadcasts, GC debt).
HEADLINE = [
    "dp_exact_dedup",
    "dp_minhash_pairs",
    "dp_minhash_pairs_fast",
    "dp_ann_brute_topk",
    "dp_ann_ivf_topk",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_selective_agg",
    "w1_list_keys_page",
    "w2_s3_common_prefixes",
    "a1_file_size_histogram",
    "a3_namespace_du",
    "a5_quota_usage",
    "j2_container_health",
    "j4_container_key_index",
    "so1_latest_state",
    "a8_top_users",
    "m5_multipart_check",
    "j3_fso_path_resolution",
    "dp_token_stats",
    "dp_curation_pipeline",
    "ev_asof_join",
    "ev_range_join_binned",
    "q21_waiting_suppliers",
    # round 3 additions
    "dp_mixture_sample",
    "dp_pack_plan",
    # round 4 additions
    "j1_replica_history",
    "n1_datanodes",
    "dp_media_frame_sample",
    "b1_balancer_utilization",
    "d1_decommission_status",
    "dp_chunk_dedup",
    "dp_train_order",
    "t1_trash_status",
    "sm1_safemode_status",
    "h1_access_heatmap",
    # round 5 additions
    "rm1_replication_actions",
    "rm3_close_actions",
    "n2_datanode_usage",
    "dp_semantic_dedup",
    "m4_mpu_expiry",
    "dp_kmeans_step",
    "rm4_delete_actions",
    "l1_bucket_links",
    # round 6 additions
    "pp1_pipeline_targets",
    "s3_bucket_acl",
    "bm1_balancer_moves",
    "dp_ann_pq_topk",
    "dp_bpe_pair_counts",
    "dp_quality_strata",
    "dp_dsir_weights",
    # round 7 additions
    "dp_ann_ivfpq_topk",
    "dp_ann_ivfpq_knn_join",
    "dp_dedup_rate_report",
    "b2_balancer_summary",
    "dp_dup_spans",
    "dp_dup_spans_fast",
    "dp_nb_lang_confusion",
    "tok_renew_decisions",
    "m9_volume_lifecycle",
    "dp_decontaminate_spans",
    "dp_embedding_dim_stats",
    "dp_cdc_chunks",
    "dp_tfidf_topk",
    "m11_dir_create",
    "dp_split_leakage",
    "dp_quality_sweep",
    "ev_cohort_retention",
    "ev_funnel",
    "ev_transition_matrix",
]

RUNS_PER_QUERY = 3  # 1 cold + 2 steady-state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    qs = entrymod.queries()

    from hadoop_ozone_spark import model
    from hadoop_ozone_spark.sources import deployment

    # Ingest phase (reported as warmup_sec): materialize-then-serve,
    # SURVEY §3.3 — build the snapshot if absent, register the bucketed
    # tables, route all model loads at the materialized layout.
    t_w = time.time()
    use_snapshot = not os.environ.get("SPARK_GRAFT_NO_SNAPSHOT")
    if use_snapshot:
        repo = os.path.dirname(os.path.abspath(__file__))
        base = os.environ.get(
            deployment.SNAPSHOT_ENV,
            os.path.join(repo, ".snapshot", os.path.basename(sf_dir.rstrip("/"))),
        )
        deployment.ensure_snapshot(spark, sf_dir, base)
        model.clear_derived_cache()  # re-route memo at the snapshot
    else:
        model.om_keys(spark, sf_dir).count()
        model.om_events(spark, sf_dir).count()
        model.dedup_corpus(spark, sf_dir).count()
    warmup = round(time.time() - t_w, 3)

    # The registered dp_minhash_pairs runs the engine-portable md5 hash
    # family (DuckDB-replayable correctness twin). The xxhash64 family —
    # identical plan, cheaper lanes, the 100 TB path — is benched
    # alongside as dp_minhash_pairs_fast so the scale number stays
    # visible (see BENCH_NOTES.md).
    from hadoop_ozone_spark.datapipe import dedup as _dedup

    def _minhash_fast(spark, sf_dir):
        return _dedup.minhash_dedup_pairs(
            model.dedup_corpus(spark, sf_dir), threshold=0.5
        )

    def _dup_spans_fast(spark, sf_dir):
        return _dedup.dup_spans(model.dedup_corpus(spark, sf_dir))

    _FAST_TWINS = {
        "dp_minhash_pairs_fast": _minhash_fast,
        "dp_dup_spans_fast": _dup_spans_fast,
    }

    timings: dict[str, float] = {}
    colds: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = _FAST_TWINS.get(name) or qs[name]
        runs = []
        for _ in range(RUNS_PER_QUERY):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
        cold, warm = runs[0], runs[1:]
        best = min(warm)
        timings[name] = round(best, 3)
        colds[name] = round(cold, 3)
        spreads[name] = (
            round(abs(warm[1] - warm[0]) / best * 100, 1) if best > 0 else 0.0
        )
        print(
            f"# {name}: {best:.2f}s steady (cold {cold:.2f}s, "
            f"{spreads[name]:.0f}% repeat spread, {n} rows)",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    # Artifact robustness (VERDICT r4 #8): the driver's stdout capture
    # is tail-bounded, so stdout carries ONLY one compact JSON line
    # (progress already went to stderr). The per-query cold/spread
    # detail lands in bench_details.json next to the repo root.
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warmup_sec": warmup,
        "snapshot_read_path": use_snapshot,
        "cold_sec": colds,
        "spread_pct": spreads,
        "sf": sf,
    }
    # Detail goes to an untracked artifacts/ dir (ADVICE r5: writing the
    # git-tracked repo-root file on every run churned a committed
    # artifact); commit a snapshot deliberately if a round needs one.
    repo = os.path.dirname(os.path.abspath(__file__))
    art = os.path.join(repo, "artifacts")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "bench_details.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "warmup_sec": warmup,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
