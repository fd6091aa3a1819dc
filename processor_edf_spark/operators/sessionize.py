"""Gap detection / sessionization — the reference's analytical core
(W1/W2/A6 in SURVEY.md §2.5).

Reference semantics (timeseries/base.py:322-342 ``discontinuous_chunks``):
a chunk boundary occurs where ``diff(timestamps) > 2 × (1e6 / rate)``;
each contiguous run becomes a TimeSeriesContiguousChunk
``(index, start, end)`` where ``index`` is the run's start position in the
channel's sample array.

Spark-first expression: lag + conditional sum over a window partitioned by
the series key — one shuffle on the key, then linear within partitions;
scales to any number of channels (AQE splits skewed ones).  The streaming
equivalent is ``F.session_window`` (see streaming/sessions.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

USEC = 1_000_000


def gap_threshold_usec(rate: Column) -> Column:
    """2 × sampling period, µs (reference timeseries/base.py:330)."""
    return (F.lit(2.0) * F.lit(USEC) / rate).cast("double")


def with_chunk_id(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "t_usec",
    gap_usec: Column | float | None = None,
    rate_col: str | None = None,
) -> DataFrame:
    """Assign a per-key ``chunk_id`` that increments at every gap.

    ``gap_usec`` may be a literal/Column threshold; if omitted it is derived
    from ``rate_col`` via the reference's 2/rate rule.
    """
    if gap_usec is None:
        if rate_col is None:
            raise ValueError("provide gap_usec or rate_col")
        gap = gap_threshold_usec(F.col(rate_col))
    elif isinstance(gap_usec, Column):
        gap = gap_usec
    else:
        gap = F.lit(float(gap_usec))

    w = Window.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    is_boundary = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "chunk_id",
        F.sum(is_boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def contiguous_chunks(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "t_usec",
    gap_usec: Column | float | None = None,
    rate_col: str | None = None,
) -> DataFrame:
    """Per contiguous run: start index into the channel's sample array,
    first/last timestamp, and sample count (W1 + A6).

    Output: keys…, chunk_id, index, start, end, n_samples.
    """
    chunked = with_chunk_id(df, keys, time_col, gap_usec, rate_col)
    w = Window.partitionBy(*keys).orderBy(time_col)
    chunked = chunked.withColumn("_pos", F.row_number().over(w) - 1)
    return (
        chunked.groupBy(*keys, "chunk_id")
        .agg(
            F.min("_pos").alias("index"),
            F.min(time_col).alias("start"),
            F.max(time_col).alias("end"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .orderBy(*keys, "chunk_id")
    )


def validate_nonoverlapping(
    chunks: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Non-overlap invariant (W2, reference timeseries/base.py:87-95 +
    README.md:30-32): within a key, each chunk must start strictly after the
    previous chunk's end.

    The reference enforces this with a single-threaded sorted insert +
    assert; distributed, it becomes a post-aggregation validation.  Returns
    the chunks with a boolean ``overlaps_previous`` column so callers choose
    quarantine vs fail (SURVEY.md §7.3).
    """
    w = Window.partitionBy(*keys).orderBy("start")
    prev_end = F.lag("end").over(w)
    return chunks.withColumn(
        "overlaps_previous",
        F.when(prev_end.isNull(), F.lit(False)).otherwise(F.col("start") <= prev_end),
    )


def session_bounds(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "t_usec",
    gap_usec: float = 0.0,
) -> DataFrame:
    """Generic sessionization of an event stream: per (key, session) min/max
    time and event count.  Same plan shape as contiguous_chunks without the
    sample-array index."""
    chunked = with_chunk_id(df, keys, time_col, gap_usec=gap_usec)
    return chunked.groupBy(*keys, "chunk_id").agg(
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
