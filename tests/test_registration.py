"""Freeze the driver-visible query window.

The driver oracle-checks the FIRST 50 entries of ``queries()`` in dict
order.  ``plans.__init__._reorder`` hard-fails if the canonical list and
the registries drift apart, but nothing else pins WHICH names occupy the
first 50 slots — an accidental import-order or list edit could silently
rotate an unverified query in (or a required one out).  This test freezes
the window explicitly; changing it must be a deliberate, reviewed edit of
EXPECTED_FIRST_50 with a rotation note in plans/__init__.py.

The r7 window (executed exactly as pre-declared in the r6 rotation
note): 7 family anchors (driver-green r6) + the 3 r7 additions
(dedup_component_sizes and the two sketch-bound audits, first driver
check, batch 2 adding interp/rolling-reach/dwell) + the 17
stale-block tail queries (last driver-green r2∪r3) + the r4-green
block rotated out in r5 (20 of its 23 in-window; its last three are
displaced by batch 2 and lead the r8 rotate-ins) — all returning for
refreshed evidence.  ``test_window_covers_every_family`` keeps any
future rotation coverage-neutral automatically.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from processor_edf_spark.plans import FAMILY, ORACLE, QUERIES

EXPECTED_FIRST_50 = [
    "q1_pricing_summary",
    "sessionize_events",
    "timestamp_synthesis",
    "rollup_event_daily",
    "multimodal_meta",
    "zorder_layout",
    "corpus_job_report",
    "dedup_component_sizes",
    "approx_distinct_audit",
    "approx_percentile_audit",
    "interp_linear_hourly",
    "rolling_7d_active_users",
    "session_dwell_stats",
    "except_click_no_purchase",
    "distinct_users_per_type",
    "text_quality",
    "lang_id_heuristic",
    "doc_fingerprint",
    "bpe_token_count",
    "rolling_fingerprint",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "array_slice_projection",
    "ann_ivf_label",
    "calibrate_events",
    "sliding_hour_counts",
    "anti_join_idle_customers",
    "moving_avg_daily_revenue",
    "minhash_signatures",
    "simhash_16",
    "q20_bulk_suppliers",
    "q21_lone_fault_supplier",
    "range_frame_user_avg",
    "intersect_all_user_days",
    "q15_top_supplier",
    "boilerplate_ngrams",
    "embedding_norm_stats",
    "sample_hash_bucket",
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q10_returned_revenue",
    "q11_important_parts",
    "dow_hour_heatmap",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "ntile_value_quartiles",
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
    # 125 through r6 + the 11 r7 additions (audits/graph/batch 2 in the
    # window; the MG audit + batch 3 + events_job_report post-freeze at
    # positions 51-55)
    assert len(QUERIES) == 136


def test_every_query_has_a_family():
    assert sorted(FAMILY) == sorted(QUERIES)


def test_window_covers_every_family():
    """The 50-slot driver window must always contain ≥1 query from every
    operator family — a rotation that drops a family (e.g. rotates out
    all sessionize flavors) fails here, keeping rotations
    coverage-neutral by construction."""
    window_families = {FAMILY[n] for n in list(QUERIES)[:50]}
    all_families = set(FAMILY.values())
    assert window_families == all_families, (
        f"families missing from the driver window: "
        f"{sorted(all_families - window_families)}"
    )
