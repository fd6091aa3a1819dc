"""Approximate aggregations — the bounded-memory scale swaps for the
exact distinct-count and percentile queries.

The exact forms (``distinct_users_per_type``: two-phase partial
distinct; ``value_percentiles_per_type``: full sort per group) are the
driver-contract queries because they oracle-match DuckDB bit-for-bit.
At 100 TB they stop being the right plan: exact COUNT(DISTINCT) state is
O(distinct values) per group, and exact percentiles materialize every
group's values.  These wrappers are the production swaps:

- ``approx_distinct``: HyperLogLog++ (relativeSD-tunable, default 5%) —
  O(1.5 kB) state per group regardless of cardinality, mergeable, so the
  shuffle moves sketches, not value sets.
- ``approx_percentiles``: the Greenwald-Khanna variant behind
  ``approx_percentile`` — one pass, O(1/accuracy) state per group.

Neither is oracle-checked (an approximation has no cross-engine exact
hash); the tests pin each against its exact sibling within the
configured error bound on the driver's testdata, which is the contract
that matters: swap-in accuracy, not bit parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """HLL++ distinct count per key group (relative error ``rsd``)."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value_col, rsd).alias(out_col)
    )


def approx_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass approximate percentiles per key group.

    ``accuracy`` is the Greenwald-Khanna knob: guaranteed rank error ≤
    n/accuracy rows per group.  Output columns are ``p50``-style names
    derived from the requested fractions."""
    pct = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in percentiles]), accuracy
    )
    # name by the exact fraction (p99_5, not a rounded p100 that would
    # collide with p1.0 or another nearby fraction)
    named = [
        F.col("_pcts")[i].alias("p" + format(p * 100, "g").replace(".", "_"))
        for i, p in enumerate(percentiles)
    ]
    return (
        df.groupBy(*keys)
        .agg(pct.alias("_pcts"))
        .select(*keys, *named)
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Mergeable Misra-Gries heavy-hitters sketch (Agarwal et al. 2012,
    "Mergeable Summaries"): per-partition MG summaries of ≤ k counters,
    merged by a plain sum — the bounded-memory swap for exact top-k
    frequency when the item domain no longer fits a shuffle (trending
    n-grams / domains / users at corpus scale).

    Returns ``(items, bound)``:
    - ``items``: (item, est_count) — every surviving counter, with the
      one-sided MG guarantee  est ≤ true ≤ est + error_bound;
    - ``bound``: a 1-row frame (error_bound, n_rows) where error_bound
      is the SUM of per-partition decrement totals (each ≤ n_p/(k+1), so
      the global bound is ≤ n/(k+1)).  Any item with true count >
      error_bound is guaranteed present.

    Shape: one Arrow pass emitting ≤ k+1 rows per partition (the +1 row
    carries the partition's decrement total), one partial-agg shuffle on
    ≤ k·partitions summary rows.  No per-row Python: partition counting
    is pandas value_counts (C-side); the MG truncation runs on the ≤
    distinct-per-partition counter dict."""
    from typing import Iterator

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        deduct = 0
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values(), reverse=True)
                thr = vals[k]  # the (k+1)-th largest counter
                deduct += thr
                counts = {i: c - thr for i, c in counts.items() if c > thr}
        out = pd.DataFrame(
            {
                "item": [str(i) for i in counts] + [None],
                "est_count": list(counts.values()) + [0],
                "deduct": [0] * len(counts) + [deduct],
            }
        )
        yield out

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        gen, "item string, est_count long, deduct long"
    )
    items = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est_count").alias("est_count"))
    )
    bound = summaries.agg(F.sum("deduct").alias("error_bound"))
    return items, bound
