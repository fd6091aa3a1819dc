"""Freeze the driver-visible query window.

The driver oracle-checks the FIRST 50 entries of ``queries()`` in dict
order.  ``plans.__init__._reorder`` hard-fails if the canonical list and
the registries drift apart, but nothing else pins WHICH names occupy the
first 50 slots — an accidental import-order or list edit could silently
rotate an unverified query in (or a required one out).  This test freezes
the window explicitly; changing it must be a deliberate, reviewed edit of
EXPECTED_FIRST_50 with a rotation note in plans/__init__.py.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from processor_edf_spark.plans import ORACLE, QUERIES

EXPECTED_FIRST_50 = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_orders",
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
    "band_join_acctbal",
    "get_or_create_parts",
    "semi_join_returned_orders",
    "asof_last_signup",
    "range_join_close_events",
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
    "token_stats",
    "text_quality",
    "lang_id_heuristic",
    "doc_fingerprint",
    "bpe_token_count",
    "rolling_fingerprint",
    "multimodal_meta",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_pairs",
    "ann_topk_bruteforce",
    "array_slice_projection",
    "cosine_lsh_pairs",
    "ann_ivf_label",
    "dedup_embedding_cosine",
]


def test_first_50_slots_frozen():
    assert list(QUERIES)[:50] == EXPECTED_FIRST_50


def test_entry_module_order_matches_registry():
    """__spark_entry__.queries() must expose the same dict order the
    registry canonicalized — the driver iterates THAT dict."""
    assert list(entry_mod.queries())[:50] == EXPECTED_FIRST_50


def test_every_query_has_an_oracle():
    """Every registered query carries oracle SQL (none fall back to the
    weaker rows-only driver check)."""
    assert sorted(ORACLE) == sorted(QUERIES)


def test_oracle_windowed_set_is_complete():
    assert len(QUERIES) == 84
