"""SCD2 incremental maintenance: apply_delta(build(first), rest) must
equal build(all) EXACTLY, untouched keys must pass through byte-equal,
and out-of-order deltas must land in the right interval."""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_edf_spark.operators.scd2 import (
    SCD2_HIGH_DATE_USEC,
    scd2_apply_delta,
    scd2_build,
)

SCHEMA = "user_id long, t long, value double"


def _rows(df):
    return sorted(
        (
            r["user_id"],
            r["value"],
            r["valid_from_usec"],
            r["valid_to_usec"],
            r["is_current"],
        )
        for r in df.collect()
    )


def test_apply_delta_equals_full_rebuild(spark):
    """Split the testdata events mid-stream per user: incremental must
    reproduce the one-shot build exactly."""
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
            "value",
        )
    )
    cut = events.approxQuantile("t", [0.5], 0.0)[0]
    first = events.filter(F.col("t") <= cut)
    rest = events.filter(F.col("t") > cut)

    full = scd2_build(events)
    incr = scd2_apply_delta(scd2_build(first), rest)
    assert _rows(incr) == _rows(full)


def test_untouched_keys_pass_through(spark):
    base = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 10, 5.0)], SCHEMA
    )
    delta = spark.createDataFrame([(1, 30, 3.0)], SCHEMA)
    out = scd2_apply_delta(scd2_build(base), delta)

    # key 2 untouched: still one open row, identical values
    k2 = [r for r in _rows(out) if r[0] == 2]
    assert k2 == [(2, 5.0, 10, SCD2_HIGH_DATE_USEC, True)]
    # key 1: old open row (t=20) closed at 30, new open row appended
    k1 = [r for r in _rows(out) if r[0] == 1]
    assert k1 == [
        (1, 1.0, 10, 20, False),
        (1, 2.0, 20, 30, False),
        (1, 3.0, 30, SCD2_HIGH_DATE_USEC, True),
    ]


def test_out_of_order_delta_lands_in_interval(spark):
    """A delta change EARLIER than the current open row must split the
    history correctly — the naive close-and-append merge fails this."""
    base = spark.createDataFrame([(1, 10, 1.0), (1, 40, 4.0)], SCHEMA)
    delta = spark.createDataFrame([(1, 25, 2.5)], SCHEMA)
    out = scd2_apply_delta(scd2_build(base), delta)
    assert _rows(out) == [
        (1, 1.0, 10, 25, False),
        (1, 2.5, 25, 40, False),
        (1, 4.0, 40, SCD2_HIGH_DATE_USEC, True),
    ]


def test_delta_for_new_key_opens_history(spark):
    base = spark.createDataFrame([(1, 10, 1.0)], SCHEMA)
    delta = spark.createDataFrame([(7, 15, 9.0)], SCHEMA)
    out = scd2_apply_delta(scd2_build(base), delta)
    assert (1, 1.0, 10, SCD2_HIGH_DATE_USEC, True) in _rows(out)
    assert (7, 9.0, 15, SCD2_HIGH_DATE_USEC, True) in _rows(out)
