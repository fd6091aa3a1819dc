"""Driver-contract query plans.

Each module registers (name → Spark plan builder) and (name → DuckDB oracle
SQL).  ``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` aggregate
these registries.  Every Spark plan aliases its computed columns to the
exact names its oracle SQL uses (the driver sorts columns by name before
value-hashing), floats are rounded identically on both sides, and
timestamps are compared as epoch-µs BIGINT.
"""

from processor_edf_spark.plans.registry import ORACLE, QUERIES, register

# import for registration side effects
from processor_edf_spark.plans import relational  # noqa: E402,F401
from processor_edf_spark.plans import text_dedup  # noqa: E402,F401
from processor_edf_spark.plans import similarity  # noqa: E402,F401
from processor_edf_spark.plans import tpch_extra  # noqa: E402,F401
from processor_edf_spark.plans import corpus_extra  # noqa: E402,F401
from processor_edf_spark.plans import analytics_extra  # noqa: E402,F401
from processor_edf_spark.plans import audits  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r7  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r7b  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r8  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r10  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r11  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r12  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r13  # noqa: E402,F401
from processor_edf_spark.plans import analytics_r14  # noqa: E402,F401

# Canonical registration order.  The driver oracle-checks the FIRST 50
# queries in ``queries()`` order, so the first 50 slots are chosen to cover
# every distinct operator; queries past slot 50 are ones with a green
# driver row from an earlier round (tests/test_queries_oracle.py still
# mirrors ALL of them, driver-exactly, every pytest run).
#
# r5 rotation (executed per the plan documented here in r4): ALL 10 r4
# additions — the only queries that had never had a driver-green row —
# move INTO the first-50 window; 10 queries that earned fresh r4 driver
# greens rotate out (q8/q9/q12/q13/q16/q19 from the 15-strong tpch
# block, ntile from windows, doc_length_histogram + ngram_lang_profile
# from text, quantize from similarity — exactly the suggested outs).
# After the r5 driver run, every one of the 94 registered queries has
# had a driver-green row in some round.  Every rotated-out query keeps
# its driver-green r4 row plus the per-commit CORRECTNESS_LOCAL mirror
# record, so the rotation is coverage-neutral
# (test_window_covers_every_family enforces family coverage).
# r6 rotation (per the standing policy: rotate stale driver evidence
# back through the window, new queries enter immediately, ≥1 query per
# family stays in-window).  The ledger has been complete since r5
# (every query driver-green in some round); r6 REFRESHES the stalest
# evidence: 15 family anchors stay, the 18 r6 additions
# (corpus_job_report + the analytics_extra batches 1-4) take priority
# slots for their FIRST driver check, and 17 of the 34 stalest queries
# (last driver-green r2∪r3) return for refreshed evidence.  Rotated
# out to make room: the 35 in-window queries that earned fresh r5
# greens, plus — displaced by the new additions — the 17 stale-block
# tail queries (except_click_no_purchase, distinct_users_per_type,
# text_quality, lang_id_heuristic, doc_fingerprint,
# bpe_token_count, rolling_fingerprint, dedup_ngram_jaccard,
# ann_topk_bruteforce, array_slice_projection, ann_ivf_label,
# calibrate_events, sliding_hour_counts, anti_join_idle_customers,
# moving_avg_daily_revenue, minhash_signatures, simhash_16), each
# family-covered in-window and first in line for r7 alongside the
# r4-green block.
# r7 rotation (executed exactly as pre-declared in the r6 note above):
# the 17 stale-block tail queries (except_click_no_purchase ...
# simhash_16, last driver-green r2/r3) and the FULL r4-green block (the
# 23 queries rotated out in r5, last driver-green r4) come back
# in-window for refreshed evidence; the 3 r7 additions
# (dedup_component_sizes + the two sketch-bound audits) take priority
# slots for their first driver check; 7 anchors stay to keep every
# family in-window (test_window_covers_every_family).  Rotated out to
# make room: the 43 window members that earned fresh r6 greens
# (family anchors not needed for coverage, the 18 r6 additions, and
# the 17 r6 stale rotate-ins).  Every rotated-out query keeps its
# latest driver-green row plus the per-commit CORRECTNESS_LOCAL
# mirror, so the rotation stays coverage-neutral.
# r7 batch 2 (interp_linear_hourly, rolling_7d_active_users,
# session_dwell_stats) enters the window immediately per the standing
# policy, displacing the three tail queries of the r4-green block
# (ngram_lang_profile, doc_length_histogram, quantize_embeddings_int8
# — their families stay covered in-window; they lead the r8
# rotate-ins).
# r8 rotation (executed exactly as pre-declared in the r7 notes above):
# the 5 post-freeze batch-3 entrants (heavy_hitters_audit,
# merge_upsert_current, event_cooccurrence_lift,
# inter_arrival_histogram, events_job_report) and the 2 r8 additions
# (percent_rank_cdf — the two-phase skew-immune rank, same oracle as
# value_percent_rank; annotations_tal_parse — the TAL publish channel)
# take priority slots for their first driver check (joined late in
# the round by cume_dist_cdf / ntile_cdf — the rest of the two-phase
# rank family, displacing q14/q17; pagerank_type_graph — fixed-point
# integer PageRank over the type-transition graph, the graph family's
# second value-oracle row, displacing q6; image_decode_stats — the
# real PPM encode→decode path under the value oracle, and
# audio_decode_stats / video_frame_stats — the WAV and AVI codec
# paths completing the multimodal triple — displacing
# semi_join_returned_orders / range_join_close_events /
# band_join_acctbal; edf_header_parse — the S2/S3 header parser
# driver-gated, displacing mode_period_users; tpch keeps q18, joins
# keep merge_upsert + full_outer in-window);
# ngram_lang_profile / doc_length_histogram / quantize_embeddings_int8
# lead the rotate-ins as pre-declared; 3 anchors
# (multimodal_meta / zorder_layout / corpus_job_report) keep the
# multimodal/layout/corpus families in-window; 30 of the 43 r6-green
# block members (rotated out in r7) return for refreshed evidence —
# the 13 left at position 51+ after all displacements (q3/q4/q5/q6/
# q14/q17, tumbling_daily_stats, value_percentiles_per_type,
# cube_event_user_bucket, band_join_acctbal, range_join_close_events,
# semi_join_returned_orders, mode_period_users) have family-covered
# seats and fresh r6 greens, and lead the r9 rotate-ins.  Rotated
# out: the 50 r7-window members, every one of which earned a fresh
# r7 driver green (CORRECTNESS_r07 50/50).
# r9 never ran (builder stall, zero commits; VERDICT r9), so the r9
# rotate-in plan executes in r10 exactly as pre-declared in the r8 note
# above: the 13 family-covered queries left at position 51+ (q3/q4/q5/
# q6/q14/q17, tumbling_daily_stats, value_percentiles_per_type,
# cube_event_user_bucket, band_join_acctbal, range_join_close_events,
# semi_join_returned_orders, mode_period_users -- fresh r6 greens, the
# stalest family-covered block) lead the window.  The remaining 37
# slots refresh the NEXT-stalest evidence: the r7-green 50 (rotated
# out at r8), minus its 13 tpch members (q2/q7/q8/q9/q10/q11/q12/q13/
# q15/q16/q19/q20/q21 -- the rotate-ins already seat 6 tpch queries,
# so these keep their r7 greens and family-covered seats at 51+);
# q1_pricing_summary stays as the tpch flagship anchor.  New r10
# queries take priority slots on registration, displacing tail members
# whose family stays covered (noted inline when it happens).  Rotated
# out: the 50 r8-window members, every one green in BOTH
# CORRECTNESS_r08 and CORRECTNESS_r09 (the identical window ran
# twice).
# r11 rotation, PRE-DECLARED: the 50 r8-window members (green in both
# r8 and r9, out since the r10 rotation — the stalest driver evidence
# after this window runs) lead the rotate-ins; then the four queries
# r10 additions displaced (rolling_fingerprint, doc_fingerprint,
# ntile_value_quartiles, dow_hour_heatmap) and the 13 tpch r7-greens
# held at 51+.  New r11 queries take priority slots as usual;
# test_window_covers_every_family stays the coverage gate.
# r12 rotation, PRE-DECLARED: the 50 r10-window members (green in
# CORRECTNESS_r10, out since the r11 rotation — the stalest driver
# evidence after this window runs) lead the rotate-ins; then the two
# queries the r11 additions displaced (edf_date_parse,
# overlap_validation — both keep r8+r9 greens) and the four
# r10-displaced queries still at 51+ (rolling_fingerprint,
# doc_fingerprint, ntile_value_quartiles, dow_hour_heatmap).  New r12
# queries take priority slots as usual;
# test_window_covers_every_family stays the coverage gate.
# r14 rotation, PRE-DECLARED: the 27 r11-green members left at 51+
# after the r13 rotation seated 20 of the 47 (they hold the stalest
# driver evidence once r13 runs) lead the rotate-ins, in their
# canonical tail order; then the stalest of the 41 r12-window members
# rotated out at r13 (fresh r12 greens), in their canonical tail
# order, fill the window.  New r14 queries take priority slots as
# usual; test_window_covers_every_family stays the coverage gate, and
# the sole-family anchors (zorder_layout, corpus_job_report) keep
# their seats by construction.
# r13 rotation, PRE-DECLARED: the 28 queries at position 51+ with the
# stalest driver evidence lead the rotate-ins — the six held/displaced
# members (edf_date_parse, overlap_validation: r8+r9 greens;
# rolling_fingerprint, doc_fingerprint, dow_hour_heatmap: r7 greens;
# ntile_value_quartiles: r8+r9 greens), the 13 tpch r7-greens, and the
# nine members the r12 priority slots displaced (r10 greens:
# minhash_signatures, simhash_16, sliding_hour_counts,
# range_frame_user_avg, intersect_all_user_days, embedding_norm_stats,
# ann_topk_bruteforce, anti_join_idle_customers,
# moving_avg_daily_revenue) — then the stalest of the r11-window
# members rotated out here.  New r13 queries take priority slots as
# usual; test_window_covers_every_family stays the coverage gate.
# r14 rotation, EXECUTED with a documented deviation from the r13
# pre-declaration above: recomputing latest-green per member from the
# CORRECTNESS_r01..r13 artifacts this round surfaced a staler block the
# pre-declaration missed — 35 tail members whose LATEST driver green is
# r5 (the r5 window, never re-seated since) plus boilerplate_ngrams
# (r7).  The rotation's purpose is stalest-evidence-first, so those 36
# lead the window (canonical tail order); the two sole-family anchors
# (zorder_layout / corpus_job_report) keep their seats by construction;
# the remaining 12 seats take the stalest r11-green tail members in
# canonical tail order, with two family-coverage swaps (cosine_pairs /
# ann_ivf_multiprobe -> table_profile_events / triangle_count_nn, the
# only tail members carrying the profiling and graph families —
# similarity stays covered via knn_graph_* / dedup_embedding_cosine /
# semdedup_label in-window).  The r11-greens the pre-declaration slotted
# that do not fit, and ALL the r12-greens it slotted, hold fresher
# evidence than the r5 block and stay at 51+ (staleness-ordered: r11
# remainder, then r12, then the rotated-out r13-window members).  New
# r14 queries take priority slots as usual;
# test_window_covers_every_family stays the coverage gate.
# r15 rotation, PRE-DECLARED: the r11-green members left at 51+ lead
# the rotate-ins in their canonical tail order — 19 after the rotation
# proper, plus the EIGHT the r14 priority slots displaced (dedup_exact,
# token_stats, filter_project_events, quantize_embeddings_int8,
# doc_length_histogram, and the continuation's three:
# ngram_lang_profile, video_frame_stats, edf_header_parse), 27 in all;
# then the stalest of the 48 r12-green tail members (rotated out of
# the window at r13), in their canonical tail order, fill the window.
# Anchors and the family gate as above.
_CANONICAL = [
    # ---- r15 driver window (50), rotation EXECUTED per the r14
    # pre-declaration amended by VERDICT r14 "Next round" #8: the TEN
    # r14-REWRITTEN rows whose plans changed in the r14 optimization
    # round but which the r14 driver window did not sample lead the
    # window (gap_fill/interp hourly grids, events/corpus job reports,
    # edf_range_decode, pagerank_type_graph, dup_span/substring/ngram
    # dedups, h264_cabac) so the driver independently re-hashes them;
    # then the pre-declared rotate-ins in their canonical tail order
    # (the 8 rows the r14 priority slots displaced, the r11-green
    # remainder, the stalest r12 block).  Eight family-coverage swaps
    # close the window (test_registration's gate): the sole-family rows
    # quality_classifier_score / audio_fingerprint_dedup / zorder_layout
    # / image_phash_dedup re-seat from the r14 window, and
    # approx_distinct_audit / sample_hash_bucket /
    # except_click_no_purchase / cube_event_user_bucket represent
    # profiling / sampling / setops / grouping from the stale tail.
    # Slots 51+: the untouched tail in its prior staleness order, then
    # the r14-window members rotated out (all carry fresh r14 driver
    # greens).
    "gap_fill_hourly",
    "interp_linear_hourly",
    "events_job_report",
    "edf_range_decode",
    "pagerank_type_graph",
    "corpus_job_report",
    "dup_span_coverage",
    "dedup_substring_rewrite",
    "dedup_ngram_jaccard",
    "h264_cabac_decode_stats",
    "edf_header_parse",
    "video_frame_stats",
    "ngram_lang_profile",
    "doc_length_histogram",
    "quantize_embeddings_int8",
    "filter_project_events",
    "token_stats",
    "dedup_exact",
    "cosine_pairs",
    "ann_ivf_multiprobe",
    "anomaly_robust_z",
    "time_weighted_avg_daily",
    "ewma_user_values",
    "event_transitions",
    "rolling_median_user",
    "scd2_user_value_history",
    "dedup_events_debounce",
    "value_percent_rank",
    "user_value_trend",
    "full_outer_daily_activity",
    "user_value_correlation",
    "q18_large_orders",
    "rate_crosscheck_users",
    "session_window_events",
    "pq_adc_exact",
    "ivf_pq_search_exact",
    "mp3_decode_stats",
    "hash_embed_stats",
    "mp3_layer1_decode_stats",
    "h264_inter_decode_stats",
    "h264_deblock_decode_stats",
    "h264_bipred_decode_stats",
    "approx_distinct_audit",
    "quality_classifier_score",
    "audio_fingerprint_dedup",
    "zorder_layout",
    "sample_hash_bucket",
    "except_click_no_purchase",
    "cube_event_user_bucket",
    "image_phash_dedup",
    "ann_index_lifecycle_exact",
    "ewma_user_twophase",
    "webp_decode_stats",
    "flac_decode_stats",
    "h264_decode_stats",
    "tiff_decode_stats",
    "mode_period_users",
    "tumbling_daily_stats",
    "band_join_acctbal",
    "range_join_close_events",
    "semi_join_returned_orders",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q3_segment_revenue",
    "q4_order_priority",
    "q5_region_revenue",
    "value_percentiles_per_type",
    "q1_pricing_summary",
    "sessionize_events",
    "timestamp_synthesis",
    "rollup_event_daily",
    "multimodal_meta",
    "dedup_component_sizes",
    "approx_percentile_audit",
    "rolling_7d_active_users",
    "session_dwell_stats",
    "distinct_users_per_type",
    "text_quality",
    "lang_id_heuristic",
    "bpe_token_count",
    "array_slice_projection",
    "ann_ivf_label",
    "calibrate_events",
    "mp3_lsf_decode_stats",
    "mp3_layer2_decode_stats",
    "edf_date_parse",
    "overlap_validation",
    "rolling_fingerprint",
    "doc_fingerprint",
    "dow_hour_heatmap",
    "ntile_value_quartiles",
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "q20_bulk_suppliers",
    "q21_lone_fault_supplier",
    "minhash_signatures",
    "simhash_16",
    "sliding_hour_counts",
    "range_frame_user_avg",
    "intersect_all_user_days",
    "embedding_norm_stats",
    "ann_topk_bruteforce",
    "anti_join_idle_customers",
    "moving_avg_daily_revenue",
    "grouping_sets_revenue",
    "split_assignment",
    "h264_cavlc_decode_stats",
    "heavy_hitters_audit",
    "merge_upsert_current",
    "event_cooccurrence_lift",
    "inter_arrival_histogram",
    "percent_rank_cdf",
    "annotations_tal_parse",
    "cume_dist_cdf",
    "ntile_cdf",
    "image_decode_stats",
    "audio_decode_stats",
    "vorbis_decode_stats",
    "mp3_mixed_decode_stats",
    "h264_cabac_pb_decode_stats",
    "mp3_short_intensity_decode_stats",
    "vp8_decode_stats",
    "agg_user_bounds",
    "epoch_functions",
    "get_or_create_parts",
    "asof_last_signup",
    "pivot_daily_event_counts",
    "json_props_stats",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_lsh_pairs",
    "dedup_embedding_cosine",
    "q22_idle_rich_customers",
    "semdedup_label",
    "levenshtein_block_pairs",
    "tfidf_top_terms",
    "minhash_jaccard_estimate",
    "contamination_ngram_overlap",
    "bm25_top_docs",
    "knn_graph_bruteforce",
    "stratified_sample_lang",
    "funnel_conversion",
    "knn_graph_lsh",
    "embedding_dim_stats",
    "cohort_retention",
    "token_entropy",
    "funnel_k_stages",
    "normalize_text",
    "dedup_lsh_components",
    "chunk_documents",
    "bigram_lm_surprisal",
    "jaccard_prefix_pairs",
    "weighted_sample_aes",
    "gopher_quality_flags",
    "dsir_importance",
    "source_mix_rates",
    "shingle_novelty",
    "boilerplate_ngrams",
    "set_ops_event_types",
    "top3_orders_per_customer",
    "table_profile_events",
    "triangle_count_nn",
]

# Operator-family tags.  tests/test_registration.py asserts the first-50
# driver window contains at least one query from every family, so a
# future rotation can never silently drop a family from driver checking.
FAMILY = {
    # adapted TPC-H relational shapes
    **{n: "tpch" for n in (
        "q1_pricing_summary", "q2_min_cost_supplier", "q3_segment_revenue",
        "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
        "q7_nation_volume", "q8_market_share", "q9_product_profit",
        "q10_returned_revenue", "q11_important_parts",
        "q12_priority_by_status", "q13_order_count_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
        "q17_small_quantity_revenue", "q18_large_orders",
        "q19_disjunctive_revenue", "q20_bulk_suppliers",
        "q21_lone_fault_supplier", "q22_idle_rich_customers",
    )},
    # reference operator analogs over events
    **{n: "events" for n in (
        "filter_project_events", "calibrate_events", "agg_user_bounds",
        "rate_crosscheck_users", "mode_period_users", "tumbling_daily_stats",
        "sliding_hour_counts", "value_percentiles_per_type",
        "json_props_stats", "dow_hour_heatmap",
    )},
    **{n: "sessionize" for n in (
        "sessionize_events", "session_window_events", "overlap_validation",
    )},
    **{n: "time_fns" for n in (
        "timestamp_synthesis", "epoch_functions", "edf_date_parse",
    )},
    **{n: "joins" for n in (
        "band_join_acctbal", "get_or_create_parts",
        "semi_join_returned_orders", "anti_join_idle_customers",
        "asof_last_signup", "range_join_close_events",
    )},
    **{n: "windows" for n in (
        "top3_orders_per_customer", "moving_avg_daily_revenue",
        "range_frame_user_avg", "ntile_value_quartiles",
    )},
    **{n: "grouping" for n in (
        "rollup_event_daily", "cube_event_user_bucket",
        "pivot_daily_event_counts",
    )},
    **{n: "setops" for n in (
        "set_ops_event_types", "except_click_no_purchase",
        "distinct_users_per_type", "intersect_all_user_days",
    )},
    **{n: "text" for n in (
        "token_stats", "text_quality", "lang_id_heuristic",
        "doc_fingerprint", "bpe_token_count", "rolling_fingerprint",
        "ngram_lang_profile", "doc_length_histogram", "boilerplate_ngrams",
        "tfidf_top_terms", "chunk_documents",
    )},
    **{n: "dedup_text" for n in (
        "dedup_exact", "dedup_ngram_jaccard", "minhash_signatures",
        "minhash_lsh_pairs", "simhash_16", "simhash_near_pairs",
        "levenshtein_block_pairs", "minhash_jaccard_estimate",
        "dedup_lsh_components",
    )},
    "contamination_ngram_overlap": "text",
    "bm25_top_docs": "text",
    **{n: "similarity" for n in (
        "cosine_pairs", "cosine_lsh_pairs", "dedup_embedding_cosine",
        "semdedup_label", "array_slice_projection", "embedding_norm_stats",
        "quantize_embeddings_int8",
    )},
    **{n: "ann" for n in (
        "ann_topk_bruteforce", "ann_ivf_label", "ann_ivf_multiprobe",
        "knn_graph_bruteforce",
    )},
    "multimodal_meta": "multimodal",
    "sample_hash_bucket": "sampling",
    "stratified_sample_lang": "sampling",
    "funnel_conversion": "sessionize",
    "funnel_k_stages": "sessionize",
    "split_assignment": "sampling",
    "normalize_text": "text",
    "knn_graph_lsh": "ann",
    "embedding_dim_stats": "similarity",
    "cohort_retention": "events",
    "token_entropy": "text",
    "bigram_lm_surprisal": "text",
    "jaccard_prefix_pairs": "dedup_text",
    "weighted_sample_aes": "sampling",
    "zorder_layout": "layout",
    "gopher_quality_flags": "text",
    "dsir_importance": "sampling",
    "source_mix_rates": "sampling",
    "shingle_novelty": "dedup_text",
    "corpus_job_report": "corpus",
    # r6 analytics_extra batch
    "anomaly_robust_z": "events",
    "time_weighted_avg_daily": "events",
    "ewma_user_values": "windows",
    "gap_fill_hourly": "time_fns",
    "event_transitions": "events",
    "grouping_sets_revenue": "grouping",
    "dup_span_coverage": "dedup_text",
    # r6 batch 2
    "rolling_median_user": "windows",
    "scd2_user_value_history": "events",
    "triangle_count_nn": "graph",
    "dedup_substring_rewrite": "dedup_text",
    # r6 batch 3
    "dedup_events_debounce": "events",
    "value_percent_rank": "windows",
    "user_value_trend": "events",
    "table_profile_events": "profiling",
    # r6 batch 4
    "full_outer_daily_activity": "joins",
    "user_value_correlation": "events",
    # r7 additions
    "dedup_component_sizes": "graph",
    "approx_distinct_audit": "profiling",
    "approx_percentile_audit": "profiling",
    "heavy_hitters_audit": "profiling",
    # r7 batch 3 (post-freeze, r8 entrants)
    "merge_upsert_current": "joins",
    "event_cooccurrence_lift": "events",
    "inter_arrival_histogram": "events",
    "events_job_report": "events",
    # r7 batch 2
    "interp_linear_hourly": "time_fns",
    "rolling_7d_active_users": "events",
    "session_dwell_stats": "sessionize",
    # r10 additions
    "ewma_user_twophase": "windows",
    "webp_decode_stats": "multimodal",
    "flac_decode_stats": "multimodal",
    "h264_decode_stats": "multimodal",
    "tiff_decode_stats": "multimodal",
    # r8 additions
    "percent_rank_cdf": "windows",
    "annotations_tal_parse": "events",
    "cume_dist_cdf": "windows",
    "ntile_cdf": "windows",
    "pagerank_type_graph": "graph",
    "image_decode_stats": "multimodal",
    "audio_decode_stats": "multimodal",
    "video_frame_stats": "multimodal",
    "edf_header_parse": "events",
    "edf_range_decode": "events",
    "h264_cavlc_decode_stats": "multimodal",
    # r13 additions
    "vp8_decode_stats": "multimodal",
    "h264_cabac_decode_stats": "multimodal",
    "mp3_lsf_decode_stats": "multimodal",
    "mp3_layer2_decode_stats": "multimodal",
    "mp3_short_intensity_decode_stats": "multimodal",
    "mp3_mixed_decode_stats": "multimodal",
    "vorbis_decode_stats": "multimodal",
    "h264_cabac_pb_decode_stats": "multimodal",
    "image_phash_dedup": "dedup_image",
    "audio_fingerprint_dedup": "dedup_audio",
    "quality_classifier_score": "quality",
    # r12 additions
    "pq_adc_exact": "ann",
    "ivf_pq_search_exact": "ann",
    "mp3_decode_stats": "multimodal",
    "hash_embed_stats": "similarity",
    "mp3_layer1_decode_stats": "multimodal",
    "h264_inter_decode_stats": "multimodal",
    "h264_deblock_decode_stats": "multimodal",
    "h264_bipred_decode_stats": "multimodal",
    "ann_index_lifecycle_exact": "ann",
}


def _reorder() -> None:
    missing = set(QUERIES) - set(_CANONICAL)
    extra = set(_CANONICAL) - set(QUERIES)
    if missing or extra:
        raise RuntimeError(
            f"canonical order out of sync: missing={sorted(missing)} extra={sorted(extra)}"
        )
    untagged = set(_CANONICAL) - set(FAMILY)
    if untagged:
        raise RuntimeError(f"queries missing a FAMILY tag: {sorted(untagged)}")
    for d in (QUERIES, ORACLE):
        ordered = {n: d[n] for n in _CANONICAL if n in d}
        d.clear()
        d.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE", "FAMILY", "register"]
