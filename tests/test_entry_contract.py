"""Driver-contract invariants: the correctness window (first 50
queries() entries) must stay complete — every entry oracle-backed, no
duplicates, and the union of round-1's window (CORRECTNESS_r01.json)
and the current window must cover every registered query."""

from __future__ import annotations

import __spark_entry__ as entry

# the 50 keys the driver hash-checked in round 1 (CORRECTNESS_r01.json)
R1_WINDOW = [
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "s1_prefix_scan", "s2_point_lookup", "f2_range_scan",
    "w1_list_keys_page", "w2_s3_common_prefixes", "w2_s3_leaf_listing",
    "w3_list_status", "a1_file_size_histogram", "a3_namespace_du",
    "a4_table_counts", "a5_quota_usage", "a6_cluster_state",
    "j4_container_key_index", "j1_keys_for_container",
    "j2_container_health", "j2_health_summary",
    "j5_keys_in_open_containers", "f4_tombstone_anti_join",
    "so1_latest_state", "a2_signed_counts", "a7_daily_growth",
    "a8_top_users", "a8_top_ops", "a8_failure_rate",
    "x11_busiest_seconds", "m2_rename_prefix", "m3_delete_prefix",
    "m5_multipart_check", "dp_token_stats", "dp_lang_id",
    "dp_fingerprint", "dp_curation_pipeline", "dp_exact_dedup",
    "dp_ngram_jaccard", "dp_vocabulary", "dp_dedup_groups",
    "dp_minhash_pairs", "dp_simhash_pairs", "dp_ann_brute_topk",
    "dp_ann_bucket_histogram", "dp_ann_bucketed_topk",
    "dp_ann_multiprobe_topk", "dp_ann_ivf_topk", "dp_media_resize_plan",
    "dp_media_frame_sample", "dp_media_features",
    "j3_fso_path_resolution",
]


def test_window_is_first_50_and_oracle_backed():
    q, o = entry.queries(), entry.oracle_sql()
    names = list(q)
    assert names[:50] == entry.DRIVER_WINDOW
    assert len(set(entry.DRIVER_WINDOW)) == 50
    assert all(name in o for name in entry.DRIVER_WINDOW)


def test_every_query_has_an_oracle():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(q) == set(o)  # no rows-only checks remain


# registered + locally oracle-checked but deliberately outside both
# driver windows: each one's operator family already holds a driver row
# or it is beyond-reference breadth (see the DRIVER_WINDOW comment)
DEMOTED = {
    "w1_list_volumes",        # superseded by w1_list_volumes_by_user
    "a1_histogram_rollup",    # A1 driver-green via a1_file_size_histogram
    "size_percentiles",       # beyond-reference SQL breadth
    "nested_locations_stats", # §1.2 representation check
    "gdpr_metadata_filter",   # §1.2 representation check
}

# added AFTER the round-2 window was frozen: oracle-backed and locally
# green, queued to front-load the ROUND-3 driver window
R3_BACKLOG = {
    "dp_minhash_incremental",
    "acl_effective_access",
    "dp_repetition",
    "dp_pii_redact",
    "dp_decontaminate",
}


def test_round_union_covers_every_registered_query():
    q = entry.queries()
    covered = set(R1_WINDOW) | set(entry.DRIVER_WINDOW) | DEMOTED | R3_BACKLOG
    assert set(q) <= covered, sorted(set(q) - covered)
    # demoted/backlog queries must still be registered and oracle-backed
    for group in (DEMOTED, R3_BACKLOG):
        assert group <= set(q) and group <= set(entry.oracle_sql())
        assert not group & set(entry.DRIVER_WINDOW)
