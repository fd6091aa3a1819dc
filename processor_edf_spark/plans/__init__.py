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

# Canonical registration order.  The driver oracle-checks the FIRST 50
# queries in ``queries()`` order, so the first 50 slots are chosen to cover
# every distinct operator; queries past slot 50 are ones with a green
# driver row from an earlier round (tests/test_queries_oracle.py still
# mirrors ALL of them, driver-exactly, every pytest run).
#
# r3 rotation: rollup/cube/pivot/set_ops/except/distinct were red in r1
# (events load error, fixed in r2) but sat past the window in r2, so no
# round had driver-verified them.  They move INTO the window this round;
# six queries with green r2 rows and duplicated operator coverage move
# out: calibrate_events (P-projection sibling filter_project_events stays;
# P4 itself is pytest-golden-tested at sources/edf.py), sliding_hour_counts
# (tumbling sibling stays), anti_join_idle_customers (semi sibling stays;
# the EXCEPT query moving in is also an anti-join shape),
# moving_avg_daily_revenue (window-frame sibling top3 stays),
# minhash_signatures / simhash_16 (their consumers minhash_lsh_pairs /
# simhash_near_pairs stay and transitively exercise them).
_CANONICAL = [
    # TPC-H relational shapes
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    # reference operator analogs over events (P/A/W/F rows of SURVEY §2)
    "filter_project_events",
    "agg_user_bounds",
    "rate_crosscheck_users",
    "sessionize_events",
    "session_window_events",
    "mode_period_users",
    "timestamp_synthesis",
    "overlap_validation",
    "epoch_functions",
    "edf_date_parse",
    # join family (J rows + as-of / range joins)
    "band_join_acctbal",
    "get_or_create_parts",
    "semi_join_returned_orders",
    "asof_last_signup",
    "range_join_close_events",
    # window / agg / grouping-set analytics
    "tumbling_daily_stats",
    "top3_orders_per_customer",
    "value_percentiles_per_type",
    "json_props_stats",
    "rollup_event_daily",
    "cube_event_user_bucket",
    "pivot_daily_event_counts",
    "set_ops_event_types",
    "except_click_no_purchase",
    "distinct_users_per_type",
    # text-analysis family
    "token_stats",
    "text_quality",
    "lang_id_heuristic",
    "doc_fingerprint",
    "bpe_token_count",
    "rolling_fingerprint",
    "multimodal_meta",
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    # similarity / ANN family
    "cosine_pairs",
    "ann_topk_bruteforce",
    "array_slice_projection",
    "cosine_lsh_pairs",
    "ann_ivf_label",
    "dedup_embedding_cosine",
    # ---- position 51+: green driver rows in r2, coverage duplicated above
    "calibrate_events",
    "sliding_hour_counts",
    "anti_join_idle_customers",
    "moving_avg_daily_revenue",
    "minhash_signatures",
    "simhash_16",
    # r3 additions (mirror + CORRECTNESS_LOCAL verified; window unchanged)
    "ann_ivf_multiprobe",
    "quantize_embeddings_int8",
    "sample_hash_bucket",
    "tfidf_top_terms",
    # r3 additions, batch 2: adapted TPC-H completion (no partsupp /
    # commitdate columns in testdata → shapes adapted, see tpch_extra.py)
    # + NTILE window coverage.  Mirror + CORRECTNESS_LOCAL verified;
    # first-50 window unchanged; rotation candidates for r4.
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
    "q22_idle_rich_customers",
    "ntile_value_quartiles",
    # r3 additions, batch 3: LLM-corpus operators (SemDeDup cluster-bounded
    # dedup, trigram language profiles, blocked edit-distance pairs,
    # length histogram, embedding norm audit)
    "semdedup_label",
    "embedding_norm_stats",
    "ngram_lang_profile",
    "levenshtein_block_pairs",
    "doc_length_histogram",
    "boilerplate_ngrams",
    # r3 additions, batch 4: RANGE-frame window, INTERSECT ALL, date parts
    "range_frame_user_avg",
    "intersect_all_user_days",
    "dow_hour_heatmap",
]

# r4 rotation plan (for the next round's window, once CORRECTNESS_r03
# confirms the current first 50): rotate IN the r3 additions that cover
# operator families the window lacks — semdedup_label, boilerplate_ngrams,
# range_frame_user_avg, intersect_all_user_days, q2_min_cost_supplier,
# q13_order_count_distribution, q21_lone_fault_supplier, q22_idle_rich_
# customers — swapping OUT green r3 rows whose coverage is duplicated
# in-window (e.g. edf_date_parse/epoch_functions pair, tumbling vs the
# grouping-set family, one of the two sessionize flavors).  Every rotated-
# out query keeps its driver-green row from r2∪r3 plus the per-commit
# CORRECTNESS_LOCAL record, so rotation stays coverage-neutral.


def _reorder() -> None:
    missing = set(QUERIES) - set(_CANONICAL)
    extra = set(_CANONICAL) - set(QUERIES)
    if missing or extra:
        raise RuntimeError(
            f"canonical order out of sync: missing={sorted(missing)} extra={sorted(extra)}"
        )
    for d in (QUERIES, ORACLE):
        ordered = {n: d[n] for n in _CANONICAL if n in d}
        d.clear()
        d.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE", "register"]
