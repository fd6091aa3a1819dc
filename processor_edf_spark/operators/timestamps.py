"""Timestamp synthesis as declarative DataFrame ops (W3/W4, SURVEY.md §2.5).

The EDF decoder synthesizes timestamps in numpy (free while the data is
already in Python); these operators are the pure-Spark expression of the
same semantics for use on relational inputs — `F.sequence` + `posexplode`
keeps generation JVM-side and distributed (each source row expands on its
executor; no driver loop, no Python).

Reference parity:
- W3 contiguous:  n evenly spaced µs timestamps from start at rate
  (timeseries/base.py:357-372; ideal spacing — see sources/edf.py note).
- W4 discontiguous: per-record base offset + intra-record spacing,
  endpoint-exclusive (edf.py:105-109).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

USEC = 1_000_000


def synthesize_contiguous(
    df: DataFrame,
    start_col: str,
    n_col: str,
    rate_col: str,
    out_col: str = "t_usec",
    pos_col: str = "pos",
) -> DataFrame:
    """W3: for each row (a channel spec), emit ``n`` rows with
    ``t = start + round(i · 1e6 / rate)``, i ∈ [0, n).

    ``F.sequence(0, n-1)`` + ``posexplode`` is whole-stage-codegen'd and
    expands per-row on executors — the distributed replacement for the
    reference's 30M-sample paging generator (timeseries/base.py:357).
    """
    seq = F.sequence(F.lit(0), F.col(n_col).cast("long") - 1)
    exploded = df.select("*", F.posexplode(seq).alias(pos_col, "_i"))
    t = (
        F.col(start_col)
        + F.round(F.col("_i") * (F.lit(float(USEC)) / F.col(rate_col))).cast("long")
    )
    return exploded.withColumn(out_col, t).drop("_i")


def synthesize_discontiguous(
    records: DataFrame,
    file_start_col: str,
    offset_sec_col: str,
    n_col: str,
    duration_sec_col: str,
    out_col: str = "t_usec",
    pos_col: str = "pos",
) -> DataFrame:
    """W4: per record with TAL offset o (seconds): emit n rows with
    ``t = file_start + round(o·1e6 + i·1e6·duration/n)``, endpoint
    exclusive (reference edf.py:105-109)."""
    seq = F.sequence(F.lit(0), F.col(n_col).cast("long") - 1)
    exploded = records.select("*", F.posexplode(seq).alias(pos_col, "_i"))
    t = (
        F.col(file_start_col)
        + F.round(
            F.col(offset_sec_col) * F.lit(float(USEC))
            + F.col("_i") * F.lit(float(USEC)) * F.col(duration_sec_col) / F.col(n_col)
        ).cast("long")
    )
    return exploded.withColumn(out_col, t).drop("_i")
