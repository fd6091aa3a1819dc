"""Accuracy contracts for the approximate-aggregation scale swaps:
each approximate operator must land within its configured error bound of
the exact sibling on the driver's testdata — the property a user relies
on when swapping the exact plan out at scale.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.operators.approx import approx_distinct, approx_percentiles
from processor_edf_spark.plans.registry import load
from tests.conftest import SF_SMALL


def test_approx_distinct_within_rsd(spark):
    (events,) = load(spark, SF_SMALL, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(events, ["event_type"], "user_id", rsd=0.05).collect()
    }
    assert set(approx) == set(exact)
    for k, exact_n in exact.items():
        # HLL++ rsd is a standard deviation, not a hard bound — allow 3σ
        assert abs(approx[k] - exact_n) <= max(3, 3 * 0.05 * exact_n), (
            k,
            approx[k],
            exact_n,
        )


def test_approx_percentiles_rank_error(spark):
    (events,) = load(spark, SF_SMALL, "events")
    rows = approx_percentiles(
        events, ["event_type"], "value", percentiles=(0.5, 0.9), accuracy=10_000
    ).collect()
    assert rows and set(rows[0].asDict()) == {"event_type", "p50", "p90"}

    values = {
        r["event_type"]: sorted(
            x["value"] for x in events.filter(F.col("event_type") == r["event_type"])
            .select("value").collect()
        )
        for r in rows
    }
    for r in rows:
        vs = values[r["event_type"]]
        n = len(vs)
        for frac, col in ((0.5, "p50"), (0.9, "p90")):
            # GK guarantee: result's rank within n/accuracy of ceil(frac*n)
            import bisect

            rank = bisect.bisect_left(vs, r[col])
            target = frac * n
            assert abs(rank - target) <= max(2, n / 10_000 + 1), (
                r["event_type"],
                col,
                rank,
                target,
            )


def test_heavy_hitters_misra_gries_bounds(spark, sf_dir):
    """MG invariants against the exact token counts: est <= true <=
    est + error_bound for every surviving counter, every item heavier
    than the bound is present, and the bound respects n/(k+1)."""
    from pyspark.sql import functions as F

    from processor_edf_spark.operators.approx import heavy_hitters

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    )
    k = 20
    items_df, bound_df = heavy_hitters(toks, "tok", k=k)
    est = {r["item"]: r["est_count"] for r in items_df.collect()}
    bound = bound_df.collect()[0]["error_bound"]
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(exact.values())
    # per-partition bounds sum to <= n/(k+1)
    assert 0 < bound <= n // (k + 1) + 1
    for item, e in est.items():
        assert e <= exact[item] <= e + bound, (item, e, exact[item], bound)
    for item, true_n in exact.items():
        if true_n > bound:
            assert item in est, (item, true_n, bound)
