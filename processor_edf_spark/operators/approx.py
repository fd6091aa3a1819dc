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
