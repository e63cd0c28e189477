"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}}.

Per-query timing includes plan + execution + a count() materialization
(no driver collect of the data itself — mirrors how the engine would be
used: results land in marts, not the driver).
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    qs = entrymod.queries()
    # Ingest phase: materialize the derived namespace tables (the
    # deployment architecture is materialize-then-serve, SURVEY §3.3 —
    # Recon bootstraps its local copy before answering queries).
    # Reported separately as warmup_sec for transparency.
    from hadoop_ozone_spark import model

    t_w = time.time()
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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = _minhash_fast if name == "dp_minhash_pairs_fast" else qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
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
