"""Channel-level aggregations (A1-A6, SURVEY.md §2.4).

All are single groupBy passes — Spark computes them with map-side partial
aggregation (one shuffle of partial states, not rows), which is the correct
100 TB plan: per-channel state is O(channels), never O(samples).

Reference parity:
- A1 per-channel min/max time bounds   timeseries/base.py:282-289
- A2 per-channel sample count          timeseries/base.py:291
- A4 rate inference (mode of diffs)    timeseries/utils.py:14-32
- A5 rate cross-check                  timeseries/tests.py:68-72
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

USEC = 1_000_000


def channel_bounds(
    df: DataFrame, keys: Sequence[str], time_col: str = "t_usec"
) -> DataFrame:
    """A1 + A2: start/end/num_values per key in one pass."""
    return df.groupBy(*keys).agg(
        F.min(time_col).alias("start"),
        F.max(time_col).alias("end"),
        F.count(F.lit(1)).alias("num_values"),
    )


def infer_sample_rate(
    df: DataFrame, keys: Sequence[str], time_col: str = "t_usec"
) -> DataFrame:
    """A4: rate = 1e6 / mode(diff(t)) per key (reference utils.py:14-32 —
    the mode of consecutive timestamp differences; raises there if the
    period is non-positive, here non-positive periods yield null rate).
    """
    w = Window.partitionBy(*keys).orderBy(time_col)
    diffs = df.withColumn("_period", F.col(time_col) - F.lag(time_col).over(w)).filter(
        F.col("_period").isNotNull()
    )
    agg = diffs.groupBy(*keys).agg(F.mode("_period").alias("period_usec"))
    return agg.withColumn(
        "inferred_rate",
        F.when(F.col("period_usec") > 0, F.lit(float(USEC)) / F.col("period_usec")),
    )


def rate_crosscheck(
    bounds: DataFrame, declared_rate_col: str = "rate", tol: float = 0.01
) -> DataFrame:
    """A5: inferred = num_values / ((end - start)/1e6) must be within ±tol
    of the declared rate (reference tests.py:68-72) — a data-quality
    assertion exposed as a column, usable as a quarantine filter."""
    inferred = F.col("num_values") / ((F.col("end") - F.col("start")) / F.lit(float(USEC)))
    return bounds.withColumn("inferred_rate", inferred).withColumn(
        "rate_ok",
        F.abs(F.lit(1.0) - F.col("inferred_rate") / F.col(declared_rate_col)) < tol,
    )
