"""Strict streaming debounce: kept-anchor semantics (vs the batch
query's gap-thinning), equality with a python reference fold on real
data, and anchor survival across micro-batches."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.debounce import stream_debounce

SCHEMA = "user_id long, event_type string, event_id long, t long"
US = 1_000_000


def _run(df, ckpt, name):
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def test_strict_debounce_reanchors_where_gap_thinning_suppresses(
    spark, tmp_path
):
    """The documented example: burst chain 0, 5, 12 with gap=10 —
    strict keeps {0, 12}, while the batch query's gap-thinning keeps
    only {0}."""
    rows = [(1, "click", 1, 0), (1, "click", 2, 5 * US), (1, "click", 3, 12 * US)]
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame(rows, SCHEMA).write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    _run(stream_debounce(stream, 10 * US), ckpt, "deb_example")
    kept = sorted(
        r["event_id"] for r in spark.sql("select * from deb_example").collect()
    )
    assert kept == [1, 3]


def test_strict_debounce_matches_reference_fold_on_testdata(spark, tmp_path):
    from processor_edf_spark.plans.analytics_extra import DEBOUNCE_USEC

    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    src = events.select(
        "user_id", "event_type", "event_id", F.expr(TS_US).alias("t")
    )
    rows = sorted(
        ((r["user_id"], r["event_type"]), r["t"], r["event_id"])
        for r in src.collect()
    )
    want = set()
    last: dict = {}
    for key, t, eid in rows:
        lk = last.get(key)
        if lk is None or t - lk > DEBOUNCE_USEC:
            want.add(eid)
            last[key] = t

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    src.write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    _run(stream_debounce(stream, DEBOUNCE_USEC), ckpt, "deb_testdata")
    got = {
        r["event_id"] for r in spark.sql("select * from deb_testdata").collect()
    }
    assert got == want


def test_anchor_survives_micro_batches(spark, tmp_path):
    """An event in a later drop inside the kept anchor's gap is still
    suppressed — the single-integer state crosses the batch boundary."""
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_debounce(stream, 10 * US)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(1, "click", 1, 0)])
    drop([(1, "click", 2, 8 * US), (1, "click", 3, 11 * US)])
    kept = sorted(
        r["event_id"] for r in spark.read.parquet(out_dir).collect()
    )
    # 8 s suppressed (within 10 of anchor 0), 11 s kept (11 > 10)
    assert kept == [1, 3]
