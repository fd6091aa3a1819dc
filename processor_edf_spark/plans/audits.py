"""Driver-visible audit queries: graph component sizes + sketch bounds.

Two gaps the r6 review named get first-class driver checks here:

- the graph family (components / pagerank / k-core) was pytest-only;
  ``dedup_component_sizes`` gives it a hash-exact driver row by
  aggregating the minhash-band transitive closure (the one iterative
  graph operator with a natural recursive-CTE oracle form — the
  ``dedup_lsh_components`` precedent) into a component-size histogram.
- the approximate sketches (``operators/approx.py``) had no
  driver-visible check — inherent, since an approximation has no exact
  cross-engine hash.  The audit queries close that differently: the
  DRIVER-CHECKED value is the sketch's proved error bound holding as a
  boolean column next to exact aggregates DuckDB reproduces.  The
  booleans are deterministic per implementation (HLL++ and GK sketches
  are data-dependent but run-stable), so the oracle pins TRUE and a
  bound violation is a red driver row, not a silent quality drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register
from processor_edf_spark.plans.text_dedup import (
    _lsh_components_sql,
    dedup_lsh_components,
)


@register(
    "dedup_component_sizes",
    f"""
    WITH comp AS ({_lsh_components_sql()})
    SELECT CAST(group_size AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM (
        SELECT component, COUNT(*) AS group_size
        FROM comp GROUP BY component
    ) GROUP BY group_size
    """,
)
def dedup_component_sizes(spark, sf_dir):
    """Component-size histogram of the minhash near-dup graph:
    (group_size, n_components) — the one-line answer to "how much of
    the corpus is duplicate families, and how big do they run?" that a
    dedup job publishes beside its survivor count.

    Composition on top of the driver-checked ``dedup_lsh_components``
    closure (operators/lsh_dedup.py pointer-jumping), so the graph
    family gets a driver row through the same recursive-CTE oracle.
    Scale shape: two groupBy aggregations over the (doc_id, component)
    labeling — the first shuffles component ids (partial-agg
    map-side), the second runs on ≤ n_components rows; output is at
    most the distinct group sizes (tens of rows at any corpus size)."""
    labeled = dedup_lsh_components(spark, sf_dir)
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return sizes.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )


# HLL++ relative-error audit threshold: the sketch is configured at
# rsd=0.05 (the standard-deviation knob); the audit passes at 3× that —
# a ±3σ bound a correct implementation clears on any fixed dataset,
# while a broken hash/merge blows it immediately.
HLL_RSD = 0.05
HLL_AUDIT_REL_ERR = 3 * HLL_RSD


@register(
    "approx_distinct_audit",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_audit(spark, sf_dir):
    """HLL++ self-consistency audit: per event_type, the EXACT distinct
    user count (oracle-matched) plus a boolean pinning the
    ``approx_count_distinct`` estimate within 3×rsd of it.  The sketch
    value itself is engine-specific so it never crosses the oracle —
    the proved bound does, as a column the driver hash-checks.

    One pass computes both aggregates (Spark's two-phase partial
    distinct beside the mergeable HLL registers — the shuffle carries
    sketch state, not value sets, which is the whole reason the approx
    form is the 100 TB swap; operators/approx.py documents the trade)."""
    (events,) = load(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        F.approx_count_distinct("user_id", HLL_RSD).alias("_est"),
    )
    rel_err = (
        F.abs(F.col("_est") - F.col("exact_distinct"))
        / F.col("exact_distinct")
    )
    # a group whose key column is entirely NULL has exact_distinct 0 —
    # both sketch and truth agree there is nothing to estimate, so the
    # bound trivially holds (and the division above would be null)
    within = F.when(
        F.col("exact_distinct") == 0, F.lit(True)
    ).otherwise(rel_err <= HLL_AUDIT_REL_ERR)
    return agg.select(
        "event_type",
        "exact_distinct",
        within.alias("within_bound"),
    )


# Greenwald-Khanna accuracy knob: guaranteed rank error <= n/GK_ACCURACY
# per group.  The audit allows 2x that plus a +/-2 discreteness slack
# (value ties and the ceil/floor of the target rank).
GK_ACCURACY = 1000

MG_K = 50


@register(
    "heavy_hitters_audit",
    """
    SELECT CAST(0 AS BIGINT) AS n_est_above_true,
           CAST(0 AS BIGINT) AS n_outside_band,
           CAST(0 AS BIGINT) AS n_missing_heavy
    """,
)
def heavy_hitters_audit(spark, sf_dir):
    """Misra-Gries self-consistency audit, completing the sketch-audit
    triple (HLL++/GK/MG).  The sketch's ITEM SET and error bound are
    partition-dependent, so neither can cross the oracle — but the MG
    guarantees hold for EVERY partitioning, so their violation counts
    are deterministically zero for a correct implementation:

    - ``n_est_above_true``: merged estimates never exceed true counts
      (each partition's counter only ever under-counts);
    - ``n_outside_band``: for surviving items, true ≤ est + bound;
    - ``n_missing_heavy``: any item with true count > bound is
      guaranteed present in the sketch.

    One row of three zeros — a broken merge, a wrong decrement total,
    or a dropped counter flips one of them and the driver row goes
    red.  Shape: the sketch pass (≤ k+1 rows/partition), one exact
    groupBy, a broadcast of the ≤k-item sketch and the 1-row bound."""
    from processor_edf_spark.operators.approx import heavy_hitters

    (events,) = load(spark, sf_dir, "events")
    # NULL keys are excluded on BOTH the sketch and the exact side: a
    # NULL item would never match the sketch's non-null counters on the
    # left join below and would falsely increment n_missing_heavy for a
    # perfectly correct sketch (heavy-hitter semantics are per-ITEM;
    # null is the absence of one).
    keyed = events.where(F.col("user_id").isNotNull())
    items, bound = heavy_hitters(
        keyed.select(F.col("user_id").cast("string").alias("user_id")),
        "user_id",
        k=MG_K,
    )
    exact = keyed.groupBy(
        F.col("user_id").cast("string").alias("item")
    ).agg(F.count(F.lit(1)).alias("true_count"))
    joined = exact.join(F.broadcast(items), "item", "left").crossJoin(
        F.broadcast(bound)
    )
    present = F.col("est_count").isNotNull()
    return joined.agg(
        F.sum(
            F.when(present & (F.col("est_count") > F.col("true_count")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_est_above_true"),
        F.sum(
            F.when(
                present
                & (
                    F.col("true_count")
                    > F.col("est_count") + F.col("error_bound")
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outside_band"),
        F.sum(
            F.when(
                (~present) & (F.col("true_count") > F.col("error_bound")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_missing_heavy"),
    )


@register(
    "approx_percentile_audit",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_ok,
           TRUE AS p90_ok
    FROM events GROUP BY event_type
    """,
)
def approx_percentile_audit(spark, sf_dir):
    """Greenwald-Khanna rank-error audit: per event_type, the group
    size (oracle-matched) plus booleans pinning that the
    ``percentile_approx`` p50/p90 values land within the configured
    rank-error bound of their target ranks (2ε·n + 2 slack for value
    ties; ε = 1/accuracy).  Same discipline as the HLL audit: the
    approximate VALUE stays engine-side, the proved bound crosses as a
    driver-hashed boolean.

    Tie/null soundness: the returned estimate's rank is an INTERVAL
    [count(value < est), count(value <= est)] — under heavy value ties
    the upper count alone could sit far past the target rank for a
    perfectly correct sketch, so the check passes iff that interval
    intersects the tolerance band around q·n.  The rank scale is the
    NON-NULL count (percentile_approx ignores nulls), while ``n_rows``
    stays COUNT(*) to match the oracle column.

    Shape: one agg for the sketch (O(1/ε) state per group), then the
    rank check joins the 5-row sketch frame back broadcast — a
    broadcast of a per-group aggregate whose cardinality is the group
    count, never the data."""
    (events,) = load(spark, sf_dir, "events")
    ap = events.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9)), GK_ACCURACY
        ).alias("_pcts"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    # null-safe join: GROUP BY event_type (both engines) emits a NULL
    # group, and a plain inner equi-join would silently drop it here —
    # a latent oracle hash mismatch the moment events carry a null
    # event_type.  eqNullSafe keeps the broadcast hash join.
    ev = events.select("event_type", "value").alias("ev")
    joined = ev.join(
        F.broadcast(ap).alias("ap"),
        F.expr("ev.event_type <=> ap.event_type"),
    ).select(
        F.col("ap.event_type").alias("event_type"),
        F.col("ev.value").alias("value"),
        F.col("ap._pcts").alias("_pcts"),
        F.col("ap.n_rows").alias("n_rows"),
    )

    def rank_cols(i: int, tag: str):
        est = F.col("_pcts")[i]
        return [
            F.sum(F.when(F.col("value") < est, 1).otherwise(0)).alias(
                f"_lo{tag}"
            ),
            F.sum(F.when(F.col("value") <= est, 1).otherwise(0)).alias(
                f"_hi{tag}"
            ),
        ]

    ranks = joined.groupBy("event_type").agg(
        *rank_cols(0, "50"),
        *rank_cols(1, "90"),
        F.count("value").alias("_nn"),  # non-null rank scale
        F.first("n_rows").alias("n_rows"),
    )
    tol = 2.0 * F.col("_nn") / GK_ACCURACY + 2.0

    def ok(tag: str, q: float):
        target = q * F.col("_nn")
        return (F.col(f"_lo{tag}") <= target + tol) & (
            F.col(f"_hi{tag}") >= target - tol
        )

    return ranks.select(
        "event_type",
        "n_rows",
        ok("50", 0.5).alias("p50_ok"),
        ok("90", 0.9).alias("p90_ok"),
    )
