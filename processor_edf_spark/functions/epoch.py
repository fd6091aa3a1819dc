"""Scalar time/epoch functions (reference utils.py parity, F1-F9 in
SURVEY.md §2.7) as Spark Column expressions — JVM-side, codegen'd, no UDFs.

Reference citations (/root/reference/processor/base_processor/timeseries/utils.py):
- secs_since_epoch   utils.py:55-58
- msecs/usecs_since_epoch  utils.py:60-66
- usecs_to_datetime  utils.py:68-70
- secs_to_usecs      utils.py:72-74
- infer_epoch        utils.py:46-53
- EDF date parse + Y2K pivot  edf.py:99-103

Intentionally omitted: ``infer_epoch_msecs`` (dead/broken in the reference —
NameError at utils.py:37) and the py2 ``convert_to_long`` (cast("long")).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

USEC = 1_000_000


def secs_since_epoch(ts: Column) -> Column:
    """TimestampType → float seconds since epoch (F1)."""
    return F.unix_micros(ts) / F.lit(float(USEC))


def msecs_since_epoch(ts: Column) -> Column:
    """TimestampType → int64 milliseconds since epoch (F2)."""
    return F.unix_millis(ts)


def usecs_since_epoch(ts: Column) -> Column:
    """TimestampType → int64 microseconds since epoch (F2)."""
    return F.unix_micros(ts)


def usecs_to_timestamp(usec: Column) -> Column:
    """int64 µs → TimestampType (F3)."""
    return F.timestamp_micros(usec)


def secs_to_usecs(secs: Column) -> Column:
    """seconds → int64 µs, truncating like the reference's long() (F4)."""
    return (secs * F.lit(USEC)).cast("long")


def infer_epoch_usecs(col: Column) -> Column:
    """Polymorphic epoch normalization (F5): timestamp → µs; numeric passes
    through as already-µs; matches reference utils.py:46-53 semantics where
    typed columns replace runtime isinstance checks."""
    return F.when(
        col.cast("timestamp").isNotNull() & ~col.cast("string").rlike(r"^-?\d+(\.\d+)?$"),
        F.unix_micros(col.cast("timestamp")),
    ).otherwise(col.cast("double").cast("long"))


def edf_datetime(date_str: Column, time_str: Column) -> Column:
    """EDF header 'dd.mm.yy' + 'hh.mm.ss' → TimestampType with the Y2K pivot
    ``year += 2000 if yy < 85 else 1900`` (F8, reference edf.py:99-103)."""
    parts_d = F.split(date_str, r"\.")
    parts_t = F.split(time_str, r"\.")
    yy = parts_d.getItem(2).cast("int")
    year = F.when(yy < 85, yy + 2000).otherwise(yy + 1900)
    return F.make_timestamp(
        year,
        parts_d.getItem(1).cast("int"),
        parts_d.getItem(0).cast("int"),
        parts_t.getItem(0).cast("int"),
        parts_t.getItem(1).cast("int"),
        parts_t.getItem(2).cast("int"),
    )


def sample_frequency(nr_samples: Column, duration_sec: Column) -> Column:
    """Declared sampling rate = samples-per-record / record duration (F9,
    reference edf.py:93-94)."""
    return nr_samples.cast("double") / duration_sec
