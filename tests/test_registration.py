"""Freeze the driver-visible query window.

The driver oracle-checks the FIRST 50 entries of ``queries()`` in dict
order.  ``plans.__init__._reorder`` hard-fails if the canonical list and
the registries drift apart, but nothing else pins WHICH names occupy the
first 50 slots — an accidental import-order or list edit could silently
rotate an unverified query in (or a required one out).  This test freezes
the window explicitly; changing it must be a deliberate, reviewed edit of
EXPECTED_FIRST_50 with a rotation note in plans/__init__.py.

The r5 window: 22 family representatives + 7 r3-era queries (every one
driver-green in r2∪r3∪r4, see CORRECTNESS_r0{2,3,4}.json) + the 10
r4-added and 11 r5-added queries getting their first driver check.
``test_window_covers_every_family`` keeps any future rotation
coverage-neutral automatically.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from processor_edf_spark.plans import FAMILY, ORACLE, QUERIES

EXPECTED_FIRST_50 = [
    # 22 family representatives, driver-green in r2∪r3∪r4
    "q1_pricing_summary",
    "filter_project_events",
    "agg_user_bounds",
    "sessionize_events",
    "timestamp_synthesis",
    "epoch_functions",
    "band_join_acctbal",
    "get_or_create_parts",
    "asof_last_signup",
    "top3_orders_per_customer",
    "rollup_event_daily",
    "pivot_daily_event_counts",
    "set_ops_event_types",
    "json_props_stats",
    "token_stats",
    "multimodal_meta",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "cosine_pairs",
    "cosine_lsh_pairs",
    "dedup_embedding_cosine",
    # 5 r3-era queries staying in-window (driver-green r4)
    "q22_idle_rich_customers",
    "semdedup_label",
    "levenshtein_block_pairs",
    "ann_ivf_multiprobe",
    "tfidf_top_terms",
    # 10 first-time driver checks (r4 additions)
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
    # r5 additions, first driver check
    "funnel_k_stages",
    "split_assignment",
    "normalize_text",
    "dedup_lsh_components",
    "chunk_documents",
    # r5 batch-2 additions, first driver check
    "bigram_lm_surprisal",
    "jaccard_prefix_pairs",
    "weighted_sample_aes",
    "zorder_layout",
    "gopher_quality_flags",
    "dsir_importance",
    "source_mix_rates",
    "shingle_novelty",
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
    # 84 through r3 + 10 r4 additions + 5 r5 additions + 8 r5 batch-2
    # additions (bigram_lm_surprisal, jaccard_prefix_pairs,
    # weighted_sample_aes, zorder_layout, gopher_quality_flags,
    # dsir_importance, source_mix_rates, shingle_novelty)
    assert len(QUERIES) == 107


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
