"""Freeze the driver-visible query window.

The driver oracle-checks the FIRST 50 entries of ``queries()`` in dict
order.  ``plans.__init__._reorder`` hard-fails if the canonical list and
the registries drift apart, but nothing else pins WHICH names occupy the
first 50 slots — an accidental import-order or list edit could silently
rotate an unverified query in (or a required one out).  This test freezes
the window explicitly; changing it must be a deliberate, reviewed edit of
EXPECTED_FIRST_50 with a rotation note in plans/__init__.py.

The r14 window (stalest-first, with the documented deviation from the
r13 pre-declaration — see the r14 rotation note in plans/__init__.py):
the 35 r5-green tail members the pre-declaration missed plus
boilerplate_ngrams (r7) lead, then the two sole-family anchors
(zorder_layout / corpus_job_report), then 12 r11-greens with two
family-coverage swaps (table_profile_events / triangle_count_nn for
profiling / graph).  New r14 queries take priority slots on
registration.
``test_window_covers_every_family`` keeps any future rotation
coverage-neutral automatically.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from processor_edf_spark.plans import FAMILY, ORACLE, QUERIES

EXPECTED_FIRST_50 = [
    # r14 window: executed stalest-first with the documented deviation
    # from the r13 pre-declaration (see the r14 rotation note in
    # plans/__init__.py) — the 35 r5-green tail members the
    # pre-declaration missed plus boilerplate_ngrams (r7) lead, then
    # the two sole-family anchors, then 12 r11-greens with two
    # family-coverage swaps (table_profile_events / triangle_count_nn
    # for profiling / graph).  New r14 queries take priority slots on
    # registration.
    # r14 priority slots (updated codec rows re-seat on
    # registration): vp8_decode_stats displaces dedup_exact
    # (dedup_text family covered in-window).
    "quality_classifier_score",
    "vorbis_decode_stats",
    "mp3_mixed_decode_stats",
    "audio_fingerprint_dedup",
    "image_phash_dedup",
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
    "zorder_layout",
    "corpus_job_report",
    "set_ops_event_types",
    "top3_orders_per_customer",
    "table_profile_events",
    "triangle_count_nn",
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
    # 145 through r8 + the r10/r11 additions + the 10 r12 rows
    # + the 4 r13 codec rows + the r14 rows (incl. the continuation's
    # audio_fingerprint_dedup)
    assert len(QUERIES) == 172


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
