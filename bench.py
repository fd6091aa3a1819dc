#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully through the noop sink (no driver collect) —
wall time measures the whole plan: scan, shuffle, codegen.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from processor_edf_spark.plans import QUERIES  # noqa: E402
from processor_edf_spark.session import get_spark  # noqa: E402

# Representative spread: TPC-H shapes, the reference's operator analogs,
# window analytics, the dedup/text family, and similarity search.
# dedup_ngram_jaccard is deliberately absent — it is the quadratic exact
# oracle for minhash_lsh_pairs, not a production path.
HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q14_promo_revenue",
    "q18_large_orders",
    "q17_small_quantity_revenue",
    "top3_orders_per_customer",
    "moving_avg_daily_revenue",
    "semi_join_returned_orders",
    "anti_join_idle_customers",
    "sessionize_events",
    "band_join_acctbal",
    "mode_period_users",
    "distinct_users_per_type",
    "value_percentiles_per_type",
    "asof_last_signup",
    "range_join_close_events",
    "rollup_event_daily",
    "cube_event_user_bucket",
    "pivot_daily_event_counts",
    "tumbling_daily_stats",
    "sliding_hour_counts",
    "json_props_stats",
    "except_click_no_purchase",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_16",
    "simhash_near_pairs",
    "token_stats",
    "bpe_token_count",
    "text_quality",
    "lang_id_heuristic",
    "doc_fingerprint",
    "rolling_fingerprint",
    "cosine_pairs",
    "cosine_lsh_pairs",
    "ann_topk_bruteforce",
    "ann_ivf_label",
    "dedup_embedding_cosine",
]

# r3 additions, benched separately: the headline total must stay
# comparable to BASELINE.md's 41-query anchor round-over-round, so new
# queries accumulate into "extended_total" instead.
EXTENDED = [
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
    "semdedup_label",
    "embedding_norm_stats",
    "ngram_lang_profile",
    "levenshtein_block_pairs",
    "doc_length_histogram",
    "boilerplate_ngrams",
    "range_frame_user_avg",
    "intersect_all_user_days",
    "dow_hour_heatmap",
    # r4 additions
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
]


# The ETL anchor's input EDF: overridable so the bench is not coupled to
# an external checkout path; when neither the env var nor the reference
# sample exists, a comparable synthetic file (~1.3 M samples, the same
# per-replica scale) is generated so the anchor never silently reports -1.
EDF_SAMPLE = os.environ.get(
    "SPARK_GRAFT_EDF_SAMPLE", "/root/reference/sample_data/test.edf"
)
EDF_REPLICAS = 32


def _edf_sample_path(stage: str) -> tuple[str, str]:
    """(path, provenance) of the ETL anchor input, synthesizing a
    same-scale fixture into ``stage`` when no sample file is available."""
    if os.path.exists(EDF_SAMPLE):
        return EDF_SAMPLE, "sample"
    from tests.edf_fixtures import sine, write_edf

    path = os.path.join(stage, "synthetic_anchor.edf")
    write_edf(
        path,
        signals=[
            {"label": f"sig{i}", "rate": 256, "gen": sine(4.0 + i)}
            for i in range(5)
        ],
        nb_data_rec=1030,  # 5 × 256 × 1030 ≈ 1.32 M samples ≈ test.edf's scale
    )
    return path, "synthetic"


def bench_edf_etl(spark) -> dict[str, float]:
    """The EDF-scale ETL anchor (BASELINE.md: 21 s cold / 11 s warm for
    channel metadata over 32x test.edf, 42.2 M samples): stage 32 replicas,
    run the full pipeline (decode -> chunk merge/sessionize -> channel
    metadata) and force both the sample decode and the metadata plan
    through the noop sink.  Cold = first execution (includes scan/JIT),
    warm = second."""
    import shutil
    import tempfile

    from processor_edf_spark.pipeline import process_edf_directory

    stage = tempfile.mkdtemp(prefix="edf_etl_", dir=os.path.dirname(os.path.abspath(__file__)))
    try:
        sample, provenance = _edf_sample_path(stage)
        for i in range(EDF_REPLICAS):
            shutil.copy(sample, os.path.join(stage, f"test_{i:02d}.edf"))
        if provenance == "synthetic":
            os.remove(sample)  # keep exactly EDF_REPLICAS inputs in the dir

        def run() -> float:
            t0 = time.perf_counter()
            samples, channels, _ = process_edf_directory(spark, stage)
            samples.write.format("noop").mode("overwrite").save()
            channels.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

        cold = run()
        warm = run()
        return {"cold": cold, "warm": warm, "input": provenance}
    except Exception as e:  # noqa: BLE001 — report, don't kill the query line
        print(f"bench: edf_etl_32x FAILED: {type(e).__name__}: {e}", file=sys.stderr)
        return {"cold": -1.0, "warm": -1.0}
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", cpus=cpus)

    def run_set(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            fn = QUERIES[name]
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm JIT/IO once
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — one bad query must not kill the line
                print(f"bench: {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
                timings[name] = -1.0
        return timings

    timings = run_set(HEADLINE)
    extended = run_set(EXTENDED)
    etl = bench_edf_etl(spark)

    failed = sorted(
        n for t in (timings, extended) for n, v in t.items() if v < 0
    )
    if etl["warm"] < 0:
        failed.append("edf_etl_32x")
    # total stays queries-only so it remains comparable to BASELINE.md's
    # headline anchor; the ETL anchor (21 s cold / 11 s warm) is its own key
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    extended_total = round(sum(t for t in extended.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended_total": extended_total,
                "extended": extended,
                "edf_etl_32x": etl,
                "failed": failed,
                "sf": sf,
            }
        )
    )
    # The per-query dict above can exceed a tail-capture window (r3's
    # recorded artifact was truncated mid-dict: "parsed": null).  Print a
    # compact totals-only line LAST so truncation can never eat the
    # headline numbers.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "extended_total": extended_total,
                "edf_etl_32x_warm": etl["warm"],
                "edf_etl_32x_cold": etl["cold"],
                "n_queries": len(timings),
                "n_extended": len(extended),
                "failed": len(failed),
            }
        )
    )
    spark.stop()
    # a broken query must never make a round look faster — fail loudly
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
