"""Driver-contract invariants: the correctness window (first 50
queries() entries) must stay complete — every entry oracle-backed, no
duplicates, and the union of the frozen round-1..7 windows
(CORRECTNESS_r01..r08.json) plus the current window must cover every
registered query except those registered this round (which sit
immediately after the window for the round-10 rotation). The round-9
window front-loads the 15 round-8 registrations (first driver check),
then the 8 round-4 leftovers (R4_LEFTOVER_R9), and fills with the 27
stalest (round-5-evidence) rows; the 23 round-5 leftovers that don't
fit (R5_LEFTOVER_R10) lead the round-10 queue."""

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

# the 50 keys the driver hash-checked in round 2 (CORRECTNESS_r02.json)
R2_WINDOW = [
    "q2_min_cost_supplier", "q4_order_priority", "q6_selective_agg",
    "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation",
    "q10_returned_items", "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_variety", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive_revenue", "q20_surplus_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    "s5_snapshot_tail_merge", "s6_debug_scan", "s7_audit_roundtrip",
    "s8_freon_generator", "f5_slim_projection", "w1_list_buckets",
    "w1_list_volumes_by_user", "w4_list_parts", "w4_list_uploads",
    "w5_topk_containers", "w6_latest_version", "a3_namespace_histogram",
    "a5_quota_enforcement", "a7_datanode_growth", "a9_distinct_dirs",
    "m1_open_key_commit", "m4_gc_batch", "m6_copy_object",
    "so3_multi_delete", "x_path_functions", "x6_range_read",
    "x9_time_format", "x10_storage_units", "acl_longest_prefix",
    "dp_minhash_pairs", "dp_simhash_pairs", "dp_media_features",
    "dp_embedding_neardup", "ev_sessionization", "ev_asof_join",
    "ev_range_join_binned",
]

# the 50 keys the driver hash-checked in round 3 (CORRECTNESS_r03.json)
R3_WINDOW = [
    "dp_minhash_incremental", "acl_effective_access", "dp_repetition",
    "dp_pii_redact", "dp_decontaminate", "dp_ann_knn_join",
    "w1_list_volumes", "a1_histogram_rollup", "size_percentiles",
    "nested_locations_stats", "gdpr_metadata_filter",
    "j2_container_health", "j2_health_summary", "a6_cluster_state",
    "dp_media_features", "m4_open_key_expiry", "dp_mixture_sample",
    "dp_pack_plan", "q1_pricing_summary", "q3_top_revenue_orders",
    "q5_nation_revenue", "s1_prefix_scan", "s2_point_lookup",
    "f2_range_scan", "f4_tombstone_anti_join", "w1_list_keys_page",
    "w2_s3_common_prefixes", "w2_s3_leaf_listing", "w3_list_status",
    "a1_file_size_histogram", "a2_signed_counts", "a3_namespace_du",
    "a4_table_counts", "a5_quota_usage", "a7_daily_growth",
    "a8_top_users", "a8_top_ops", "a8_failure_rate",
    "j1_keys_for_container", "j3_fso_path_resolution",
    "j4_container_key_index", "j5_keys_in_open_containers",
    "so1_latest_state", "x11_busiest_seconds", "m2_rename_prefix",
    "m3_delete_prefix", "m5_multipart_check", "dp_exact_dedup",
    "dp_dedup_groups", "dp_ann_brute_topk",
]

# the 50 keys the driver hash-checked in round 4 (CORRECTNESS_r04.json)
R4_WINDOW = [
    "j1_replica_history", "n1_datanodes", "p1_pipelines",
    "m5_etag_check", "j2_missing_containers", "b1_balancer_utilization",
    "d1_decommission_status", "d2_pending_deletion", "d2_failed_txns",
    "dp_chunk_dedup", "dp_unigram_quality", "dp_train_order",
    "t1_trash_status", "sm1_safemode_status", "c1_list_containers",
    "p2_pipeline_rack_spread", "h1_access_heatmap", "j3_fso_list_status",
    "dp_split_assign", "x12_sorted_locations", "m2_fso_rename_dir",
    "dp_dedup_keep_best", "a3_fso_namespace_du", "m6_copy_part",
    "dp_budget_sample", "x13_get_file_status", "dp_media_features",
    "dp_media_frame_sample", "q15_top_supplier", "dp_token_stats",
    "dp_lang_id", "dp_fingerprint", "dp_curation_pipeline",
    "dp_ngram_jaccard", "dp_vocabulary", "dp_ann_bucket_histogram",
    "dp_ann_bucketed_topk", "dp_ann_multiprobe_topk", "dp_ann_ivf_topk",
    "dp_media_resize_plan", "dp_minhash_pairs", "dp_simhash_pairs",
    "w6_latest_version", "w4_list_parts", "w5_topk_containers",
    "f5_slim_projection", "a9_distinct_dirs", "m1_open_key_commit",
    "s7_audit_roundtrip", "s8_freon_generator",
]

# the 50 keys the driver hash-checked in round 5 (CORRECTNESS_r05.json)
R5_WINDOW = [
    "rm1_replication_actions", "rm2_placement_targets",
    "rm3_close_actions", "n2_datanode_usage", "m4_mpu_expiry",
    "m7_mpu_abort", "dp_semantic_dedup", "s3_head_object",
    "m8_mpu_initiate", "dp_kmeans_step", "p3_pipeline_scrub",
    "rm4_delete_actions", "q2_min_cost_supplier", "q4_order_priority",
    "q6_selective_agg", "q7_volume_shipping", "q8_market_share",
    "q9_profit_by_nation", "q10_returned_items", "q11_important_parts",
    "q12_late_shipments", "q13_customer_distribution",
    "q14_promo_effect", "q16_supplier_variety", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_revenue",
    "q20_surplus_suppliers", "q21_waiting_suppliers",
    "q22_idle_customers", "s5_snapshot_tail_merge", "s6_debug_scan",
    "w1_list_buckets", "w1_list_volumes_by_user", "w4_list_uploads",
    "a3_namespace_histogram", "a5_quota_enforcement",
    "a7_datanode_growth", "m4_gc_batch", "m6_copy_object",
    "so3_multi_delete", "x_path_functions", "x6_range_read",
    "x9_time_format", "x10_storage_units", "acl_longest_prefix",
    "dp_embedding_neardup", "ev_sessionization", "ev_asof_join",
    "ev_range_join_binned",
]


# the 50 keys the driver hash-checked in round 6 (CORRECTNESS_r06.json):
# l1_bucket_links + the 49 r3-stale rows
R6_WINDOW = [
    "l1_bucket_links", "a1_file_size_histogram", "a1_histogram_rollup",
    "a2_signed_counts", "a3_namespace_du", "a4_table_counts",
    "a5_quota_usage", "a6_cluster_state", "a7_daily_growth",
    "a8_failure_rate", "a8_top_ops", "a8_top_users",
    "acl_effective_access", "dp_ann_brute_topk", "dp_ann_knn_join",
    "dp_decontaminate", "dp_dedup_groups", "dp_exact_dedup",
    "dp_minhash_incremental", "dp_mixture_sample", "dp_pack_plan",
    "dp_pii_redact", "dp_repetition", "f2_range_scan",
    "f4_tombstone_anti_join", "gdpr_metadata_filter",
    "j1_keys_for_container", "j2_container_health", "j2_health_summary",
    "j3_fso_path_resolution", "j4_container_key_index",
    "j5_keys_in_open_containers", "m2_rename_prefix", "m3_delete_prefix",
    "m4_open_key_expiry", "m5_multipart_check", "nested_locations_stats",
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "s1_prefix_scan", "s2_point_lookup", "size_percentiles",
    "so1_latest_state", "w1_list_keys_page", "w1_list_volumes",
    "w2_s3_common_prefixes", "w2_s3_leaf_listing", "w3_list_status",
    "x11_busiest_seconds",
]

# registered during round 6 — zero driver evidence until the r7 window
R6_REGISTRATIONS = [
    "pp1_pipeline_targets", "s3_bucket_acl", "bm1_balancer_moves",
    "dp_bpe_pair_counts", "dp_quality_strata", "u1_file_counts_filtered",
    "n3_topology", "c2_container_info", "n4_datanode_list",
    "dp_ann_pq_topk", "dp_dsir_weights", "a10_rate_spikes",
    "b2_balancer_summary", "w2_list_objects_v1", "dp_dedup_rate_report",
]

# the 15 round-4-evidence rows that did not fit in the r7 window
# (35 slots after the 15 round-6 registrations) — front of the r8 queue
R4_LEFTOVER = [
    "m5_etag_check", "m6_copy_part", "n1_datanodes", "p1_pipelines",
    "p2_pipeline_rack_spread", "q15_top_supplier", "s7_audit_roundtrip",
    "s8_freon_generator", "sm1_safemode_status", "t1_trash_status",
    "w4_list_parts", "w5_topk_containers", "w6_latest_version",
    "x12_sorted_locations", "x13_get_file_status",
]

# the 50 keys the driver hash-checked in round 7 (CORRECTNESS_r07.json):
# the 15 round-6 registrations + 35 stalest round-4 rows
R7_WINDOW = R6_REGISTRATIONS + [
    "a3_fso_namespace_du", "a9_distinct_dirs", "b1_balancer_utilization",
    "c1_list_containers", "d1_decommission_status", "d2_failed_txns",
    "d2_pending_deletion", "dp_ann_bucket_histogram",
    "dp_ann_bucketed_topk", "dp_ann_ivf_topk", "dp_ann_multiprobe_topk",
    "dp_budget_sample", "dp_chunk_dedup", "dp_curation_pipeline",
    "dp_dedup_keep_best", "dp_fingerprint", "dp_lang_id",
    "dp_media_features", "dp_media_frame_sample", "dp_media_resize_plan",
    "dp_minhash_pairs", "dp_ngram_jaccard", "dp_simhash_pairs",
    "dp_split_assign", "dp_token_stats", "dp_train_order",
    "dp_unigram_quality", "dp_vocabulary", "f5_slim_projection",
    "h1_access_heatmap", "j1_replica_history", "j2_missing_containers",
    "j3_fso_list_status", "m1_open_key_commit", "m2_fso_rename_dir",
]

# registered during round 7 — zero driver evidence until the r8 window
R7_REGISTRATIONS = [
    "dp_ann_ivfpq_topk", "s10_chunk_locations", "fso_prefix_parse",
    "s3_list_buckets", "s3_bucket_head_delete", "c3_unhealthy_page",
    "dp_ann_ivfpq_knn_join", "dp_dup_spans", "dp_dup_span_report",
    "c4_unhealthy_all", "dp_dup_span_clean", "dp_media_exact_dedup",
    "acl_add_remove_plane", "acl_set_plane", "dp_lm_perplexity",
    "tok_renew_decisions", "tok_cancel_decisions", "tok_expiry_sweep",
    "sec_s3_secret_plane", "dp_nb_lang_model", "dp_nb_lang_confusion",
    "m9_volume_lifecycle", "m9_user_volume_list",
    "dp_decontaminate_spans", "dp_embedding_dim_stats",
    "dp_embedding_norms", "dn1_block_deletion_plan",
    "q18_large_volume_customers", "m10_bucket_create", "m11_dir_create",
    "m12_file_create", "m13_bucket_set_property", "m14_bulk_rename",
    "m15_bulk_delete", "dn2_scanner_rollup", "dp_cdc_chunks",
    "dp_cdc_source_matrix", "dp_tfidf_topk", "dp_split_leakage",
    "dp_quality_sweep", "ev_cohort_retention", "ev_funnel",
    "ev_transition_matrix",
]

# the 8 round-4-evidence rows that did not fit in the r8 window
# (7 slots after the 43 round-7 registrations) — front of the r9 queue
R4_LEFTOVER_R9 = [
    "s8_freon_generator", "sm1_safemode_status", "t1_trash_status",
    "w4_list_parts", "w5_topk_containers", "w6_latest_version",
    "x12_sorted_locations", "x13_get_file_status",
]

# the 50 keys the driver hash-checked in round 8 (CORRECTNESS_r08.json):
# the 43 round-7 registrations + the 7 stalest round-4 rows
R8_WINDOW = R7_REGISTRATIONS + R4_LEFTOVER[:7]

# registered during round 8 — zero driver evidence until the r9 window
R8_REGISTRATIONS = [
    "x15_list_tables", "dp_dedup_clusters", "dp_bm25_topk",
    "dp_dedup_clusters_incr", "ev_conversion_latency",
    "dp_winnow_report", "dp_pmi_collocations", "dp_datasheet",
    "dp_hll_vocab", "dp_cm_heavy_hitters", "dp_bloom_decontaminate",
    "ev_top_paths", "dp_gram_novelty", "ev_hll_users_by_type",
    "dp_knn_label",
]

# the 23 round-5-evidence rows that did not fit in the r9 window
# (27 slots after the 15 round-8 registrations + 8 R4 leftovers) —
# front of the round-10 queue
R5_LEFTOVER_R10 = [
    "q21_waiting_suppliers", "q22_idle_customers",
    "q2_min_cost_supplier", "q4_order_priority", "q6_selective_agg",
    "q7_volume_shipping", "q8_market_share", "q9_profit_by_nation",
    "rm1_replication_actions", "rm2_placement_targets",
    "rm3_close_actions", "rm4_delete_actions", "s3_head_object",
    "s5_snapshot_tail_merge", "s6_debug_scan", "so3_multi_delete",
    "w1_list_buckets", "w1_list_volumes_by_user", "w4_list_uploads",
    "x10_storage_units", "x6_range_read", "x9_time_format",
    "x_path_functions",
]


# the 50 keys the driver hash-checked in round 9 (CORRECTNESS_r09.json):
# the 15 round-8 registrations + the 8 R4 leftovers + 27 stalest
# round-5-evidence rows
R9_WINDOW = R8_REGISTRATIONS + R4_LEFTOVER_R9 + [
    "a3_namespace_histogram", "a5_quota_enforcement",
    "a7_datanode_growth", "acl_longest_prefix", "dp_embedding_neardup",
    "dp_kmeans_step", "dp_semantic_dedup", "ev_asof_join",
    "ev_range_join_binned", "ev_sessionization", "m4_gc_batch",
    "m4_mpu_expiry", "m6_copy_object", "m7_mpu_abort",
    "m8_mpu_initiate", "n2_datanode_usage", "p3_pipeline_scrub",
    "q10_returned_items", "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q14_promo_effect",
    "q16_supplier_variety", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_revenue",
    "q20_surplus_suppliers",
]

# registered during round 9 — zero driver evidence until the r10 window
R9_REGISTRATIONS = [
    "dp_knn_label_ivfpq", "recon_task_status", "dp_qsketch_tokens",
    "dp_qsketch_by_source", "dp_cm_by_source", "dp_kmv_user_overlap",
    "dp_mg_heavy_hitters", "dp_mg_by_source", "dp_kmv_type_matrix",
    "dp_corpus_drift",
]

# registered during round 10 — inside the r10 window from day one
R10_REGISTRATIONS = ["dp_bpe_vocab", "dp_media_near_dup"]

# the 35 round-6-evidence rows that did not fit in the r10 window
# (15 slots after the 10 r9 registrations + 2 r10 registrations + 23
# R5 leftovers) — front of the round-11 queue
R6_LEFTOVER_R11 = [
    "dp_dedup_groups", "dp_exact_dedup", "dp_minhash_incremental",
    "dp_mixture_sample", "dp_pack_plan", "dp_pii_redact",
    "dp_repetition", "f2_range_scan", "f4_tombstone_anti_join",
    "gdpr_metadata_filter", "j1_keys_for_container",
    "j2_container_health", "j2_health_summary",
    "j3_fso_path_resolution", "j4_container_key_index",
    "j5_keys_in_open_containers", "l1_bucket_links",
    "m2_rename_prefix", "m3_delete_prefix", "m4_open_key_expiry",
    "m5_multipart_check", "nested_locations_stats",
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_nation_revenue",
    "s1_prefix_scan", "s2_point_lookup", "size_percentiles",
    "so1_latest_state", "w1_list_keys_page", "w1_list_volumes",
    "w2_s3_common_prefixes", "w2_s3_leaf_listing", "w3_list_status",
    "x11_busiest_seconds",
]


# the r6-evidence filler rows that completed the round-10 window
R6_FILLER_R10 = [
    "a1_file_size_histogram", "a1_histogram_rollup", "a2_signed_counts",
    "a3_namespace_du", "a4_table_counts", "a5_quota_usage",
    "a6_cluster_state", "a7_daily_growth", "a8_failure_rate",
    "a8_top_ops", "a8_top_users", "acl_effective_access",
    "dp_ann_brute_topk", "dp_ann_knn_join", "dp_decontaminate",
]

# the 50 keys the driver hash-checked in round 10 (CORRECTNESS_r10.json)
R10_WINDOW = (
    R9_REGISTRATIONS + R10_REGISTRATIONS + R5_LEFTOVER_R10 + R6_FILLER_R10
)

# the 36 round-7-evidence rows that did not fit in the r11 window
# (14 slots after dp_media_dup_clusters + the 35 R6 leftovers) —
# front of the round-12 queue
R7_LEFTOVER_R12 = [
    "dp_ann_multiprobe_topk", "dp_ann_pq_topk", "dp_bpe_pair_counts",
    "dp_budget_sample", "dp_chunk_dedup", "dp_curation_pipeline",
    "dp_dedup_keep_best", "dp_dedup_rate_report", "dp_dsir_weights",
    "dp_fingerprint", "dp_lang_id", "dp_media_features",
    "dp_media_frame_sample", "dp_media_resize_plan", "dp_minhash_pairs",
    "dp_ngram_jaccard", "dp_quality_strata", "dp_simhash_pairs",
    "dp_split_assign", "dp_token_stats", "dp_train_order",
    "dp_unigram_quality", "dp_vocabulary", "f5_slim_projection",
    "h1_access_heatmap", "j1_replica_history", "j2_missing_containers",
    "j3_fso_list_status", "m1_open_key_commit", "m2_fso_rename_dir",
    "n3_topology", "n4_datanode_list", "pp1_pipeline_targets",
    "s3_bucket_acl", "u1_file_counts_filtered", "w2_list_objects_v1",
]


# registered during round 11 — staged in the r11 NEXT_WINDOW, driver
# evidence landing in the r12 window
R11_REGISTRATIONS = ["dp_reservoir_sample", "dp_reservoir_by_source"]

# registered during round 12 — inside the r12 window from day one
R12_REGISTRATIONS = [
    "dp_reservoir_weighted", "dp_reservoir_weighted_by_source",
]

# the 50 keys the driver hash-checked in round 11 (CORRECTNESS_r11.json):
# dp_media_dup_clusters + the 35 R6 leftovers + 14 r7-evidence filler
R11_WINDOW = ["dp_media_dup_clusters"] + R6_LEFTOVER_R11 + [
    "a10_rate_spikes", "a3_fso_namespace_du", "a9_distinct_dirs",
    "b1_balancer_utilization", "b2_balancer_summary",
    "bm1_balancer_moves", "c1_list_containers", "c2_container_info",
    "d1_decommission_status", "d2_failed_txns", "d2_pending_deletion",
    "dp_ann_bucket_histogram", "dp_ann_bucketed_topk", "dp_ann_ivf_topk",
]

# the 50 keys the driver hash-checked in round 12 (CORRECTNESS_r12.json):
# the 2 r12 registrations + the 2 r11 registrations + the 36 R7
# leftovers + 10 r8-evidence filler rows (alphabetical)
R12_WINDOW = (
    R12_REGISTRATIONS + R11_REGISTRATIONS + R7_LEFTOVER_R12 + [
        "acl_add_remove_plane", "acl_set_plane", "c3_unhealthy_page",
        "c4_unhealthy_all", "dn1_block_deletion_plan",
        "dn2_scanner_rollup", "dp_ann_ivfpq_knn_join",
        "dp_ann_ivfpq_topk", "dp_cdc_chunks", "dp_cdc_source_matrix",
    ]
)

# registered during round 13 — the unsupported-media routing pair,
# inside the r13 window from day one
R13_REGISTRATIONS = ["dp_media_deep_near_dup", "dp_media_unsupported"]

# the 40 round-8-evidence rows that did not fit in the r12 window
# (10 slots after the 2 r12 registrations + 2 r11 registrations + 36
# R7 leftovers) — consumed by the round-13 window below
R8_LEFTOVER_R13 = [
    "dp_decontaminate_spans", "dp_dup_span_clean", "dp_dup_span_report",
    "dp_dup_spans", "dp_embedding_dim_stats", "dp_embedding_norms",
    "dp_lm_perplexity", "dp_media_exact_dedup", "dp_nb_lang_confusion",
    "dp_nb_lang_model", "dp_quality_sweep", "dp_split_leakage",
    "dp_tfidf_topk", "ev_cohort_retention", "ev_funnel",
    "ev_transition_matrix", "fso_prefix_parse", "m10_bucket_create",
    "m11_dir_create", "m12_file_create", "m13_bucket_set_property",
    "m14_bulk_rename", "m15_bulk_delete", "m5_etag_check",
    "m6_copy_part", "m9_user_volume_list", "m9_volume_lifecycle",
    "n1_datanodes", "p1_pipelines", "p2_pipeline_rack_spread",
    "q15_top_supplier", "q18_large_volume_customers",
    "s10_chunk_locations", "s3_bucket_head_delete", "s3_list_buckets",
    "s7_audit_roundtrip", "sec_s3_secret_plane", "tok_cancel_decisions",
    "tok_expiry_sweep", "tok_renew_decisions",
]

# the 42 round-9-evidence rows that did not fit in the r13 window
# (8 slots after the 2 r13 registrations + 40 R8 leftovers) — front of
# the round-14 queue
R9_LEFTOVER_R14 = [
    "dp_dedup_clusters", "dp_dedup_clusters_incr", "dp_embedding_neardup",
    "dp_gram_novelty", "dp_hll_vocab", "dp_kmeans_step",
    "dp_knn_label", "dp_pmi_collocations", "dp_semantic_dedup",
    "dp_winnow_report", "ev_asof_join", "ev_conversion_latency",
    "ev_hll_users_by_type", "ev_range_join_binned", "ev_sessionization",
    "ev_top_paths", "m4_gc_batch", "m4_mpu_expiry",
    "m6_copy_object", "m7_mpu_abort", "m8_mpu_initiate",
    "n2_datanode_usage", "p3_pipeline_scrub", "q10_returned_items",
    "q11_important_parts", "q12_late_shipments", "q13_customer_distribution",
    "q14_promo_effect", "q16_supplier_variety", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_surplus_suppliers",
    "s8_freon_generator", "sm1_safemode_status", "t1_trash_status",
    "w4_list_parts", "w5_topk_containers", "w6_latest_version",
    "x12_sorted_locations", "x13_get_file_status", "x15_list_tables",
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


def test_round10_window_structure_is_preserved():
    # the r10 window (now the historical R10_WINDOW constant) led with
    # the 10 r9 registrations, the 2 r10 registrations, the 23 R5
    # leftovers, then 15 r6-evidence filler rows
    assert R10_WINDOW[:10] == R9_REGISTRATIONS
    assert R10_WINDOW[10:12] == R10_REGISTRATIONS
    assert R10_WINDOW[12:35] == R5_LEFTOVER_R10
    assert len(R10_WINDOW) == 50
    assert R4_LEFTOVER[7:] == R4_LEFTOVER_R9


def test_round11_window_structure_is_preserved():
    # the r11 window (now the historical R11_WINDOW constant) led with
    # dp_media_dup_clusters, then the 35 R6 leftovers, then 14
    # r7-evidence filler rows (alphabetical)
    assert R11_WINDOW[0] == "dp_media_dup_clusters"
    assert R11_WINDOW[1:36] == R6_LEFTOVER_R11
    assert R11_WINDOW[36:] == sorted(R11_WINDOW[36:])
    assert len(R11_WINDOW) == 50


def test_round12_window_structure_is_preserved():
    # the r12 window (now the historical R12_WINDOW constant) led with
    # the 2 r12 registrations, the 2 r11 registrations staged in the
    # r11 NEXT_WINDOW, the 36 R7 leftovers, then 10 r8-evidence filler
    assert R12_WINDOW[:2] == R12_REGISTRATIONS
    assert R12_WINDOW[2:4] == R11_REGISTRATIONS
    assert R12_WINDOW[4:40] == R7_LEFTOVER_R12
    assert R12_WINDOW[40:] == sorted(R12_WINDOW[40:])
    assert len(R12_WINDOW) == 50


def test_round13_window_frontloads_registrations_and_r8_leftovers():
    # VERDICT r12 #5: the 2 round-13 registrations (unsupported-media
    # routing pair) lead; then the 40 round-8-evidence leftovers staged
    # last round — landing CORRECTNESS_r13 zeroes the r8 backlog
    assert entry.DRIVER_WINDOW[:2] == R13_REGISTRATIONS
    assert entry.DRIVER_WINDOW[2:42] == R8_LEFTOVER_R13


def test_round13_window_fills_with_stalest_rows():
    # the remaining 8 slots hold round-9-evidence rows (the stalest
    # after the R8 leftovers); together with R9_LEFTOVER_R14 they
    # exactly exhaust the still-stale round-9-evidence set
    last_checked = {}
    for rnd, window in (
        (1, R1_WINDOW), (2, R2_WINDOW), (3, R3_WINDOW),
        (4, R4_WINDOW), (5, R5_WINDOW), (6, R6_WINDOW), (7, R7_WINDOW),
        (8, R8_WINDOW), (9, R9_WINDOW), (10, R10_WINDOW),
        (11, R11_WINDOW), (12, R12_WINDOW),
    ):
        for name in window:
            last_checked[name] = rnd
    qs = entry.queries()
    # every remaining r8-evidence row sits inside THIS window, so the
    # r8 backlog zeroes out when CORRECTNESS_r13 lands
    r8_stale = {n for n in qs if last_checked.get(n, 0) == 8}
    assert r8_stale == set(R8_LEFTOVER_R13)
    r9_stale = {n for n in qs if last_checked.get(n, 0) == 9}
    filler = entry.DRIVER_WINDOW[42:]
    assert set(filler) <= r9_stale, sorted(set(filler) - r9_stale)
    assert set(filler) | set(R9_LEFTOVER_R14) == r9_stale
    assert filler == sorted(filler)  # deterministic: alphabetical
    assert filler == sorted(r9_stale)[: len(filler)]


def test_round_union_covers_every_registered_query():
    q = entry.queries()
    covered = (
        set(R1_WINDOW) | set(R2_WINDOW) | set(R3_WINDOW) | set(R4_WINDOW)
        | set(R5_WINDOW) | set(R6_WINDOW) | set(R7_WINDOW) | set(R8_WINDOW)
        | set(R9_WINDOW) | set(R10_WINDOW) | set(R11_WINDOW)
        | set(R12_WINDOW) | set(entry.DRIVER_WINDOW)
    )
    pending = set(q) - covered
    # only registrations newer than the current window (NEXT_WINDOW)
    # may lack driver evidence
    assert pending <= set(entry.NEXT_WINDOW), sorted(
        pending - set(entry.NEXT_WINDOW)
    )


def test_next_window_queries_sit_right_after_the_window():
    names = list(entry.queries())
    registered_next = [n for n in names if n in set(entry.NEXT_WINDOW)]
    assert names[50:50 + len(registered_next)] == registered_next
