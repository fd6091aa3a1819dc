"""Streaming SCD2: closed-interval parity with the batch build on
in-order input, open-row state across micro-batches, and the JSONL
shard sink round-trip (grouped here because the export test uses the
history frame)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.operators.scd2 import scd2_build
from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.scd2 import stream_scd2

SCHEMA = "user_id long, t long, value double"


def test_stream_scd2_closed_rows_match_batch_build(spark, tmp_path):
    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    changes = events.select(
        "user_id", F.expr(TS_US).alias("t"), "value"
    )
    want = {
        (r["user_id"], r["value"], r["valid_from_usec"], r["valid_to_usec"])
        for r in scd2_build(changes).filter("NOT is_current").collect()
    }

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    changes.write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    (
        stream_scd2(stream)
        .writeStream.format("memory")
        .queryName("scd2_stream_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        (r["user_id"], r["value"], r["valid_from_usec"], r["valid_to_usec"])
        for r in spark.sql("select * from scd2_stream_out").collect()
    }
    assert got == want
    assert len(got) > 0


def test_timestamp_tie_emits_zero_length_closed_row(spark, tmp_path):
    """Duplicate (key, t) changes: the batch build's lead() window emits
    a zero-length closed interval for the earlier tie — the stream must
    emit the same row (not silently drop the tied change), both within a
    micro-batch and across a batch boundary."""
    rows = [(1, 10, 1.0), (1, 10, 2.0), (1, 20, 3.0)]
    changes = spark.createDataFrame(rows, SCHEMA)
    want = {
        (r["user_id"], r["value"], r["valid_from_usec"], r["valid_to_usec"])
        for r in scd2_build(changes).filter("NOT is_current").collect()
    }
    assert (1, 1.0, 10, 10) in want  # the zero-length tie row

    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def drop(batch_rows):
        spark.createDataFrame(batch_rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_scd2(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    # tie split ACROSS micro-batches: the second batch's t == open_from
    drop(rows[:1])
    drop(rows[1:])
    got = {
        (r["user_id"], r["value"], r["valid_from_usec"], r["valid_to_usec"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want


def test_open_row_survives_micro_batches(spark, tmp_path):
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
            stream_scd2(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(1, 10, 1.0)])  # opens; nothing emitted
    drop([(1, 30, 3.0)])  # closes [10, 30) across the batch boundary
    rows = [
        (r["value"], r["valid_from_usec"], r["valid_to_usec"])
        for r in spark.read.parquet(out_dir).collect()
    ]
    assert rows == [(1.0, 10, 30)]


def test_late_changes_counted_not_folded(spark, tmp_path):
    """emit_late=True: an out-of-order change (t before the open row's
    valid_from) is emitted as a late=true row — counted, not silently
    dropped and not folded into the history — across a micro-batch
    boundary (i.e. through checkpointed state)."""
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def drop(batch_rows):
        spark.createDataFrame(batch_rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_scd2(stream, emit_late=True)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(1, 20, 2.0)])  # opens at t=20
    drop([(1, 10, 1.0), (1, 30, 3.0)])  # 10 is LATE; 30 closes [20,30)
    rows = {
        (
            r["value"],
            r["valid_from_usec"],
            r["valid_to_usec"],
            r["late"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert rows == {
        (1.0, 10, 10, True),  # the late change, quarantined with its t
        (2.0, 20, 30, False),  # history unaffected by the late row
    }


def test_jsonl_shard_export_roundtrip(spark, tmp_path):
    from processor_edf_spark.sinks.writers import write_jsonl_shards

    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    hist = scd2_build(
        events.select("user_id", F.expr(TS_US).alias("t"), "value")
    )
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(
        hist,
        out,
        max_records_per_file=200,
        shard_key="user_id",
        order_cols=("user_id", "valid_from_usec"),
    )
    back = spark.read.json(out)
    assert back.count() == hist.count()
    # shard size bound respected
    import glob

    for f in glob.glob(f"{out}/part-*"):
        n = sum(1 for _ in __import__("gzip").open(f, "rt"))
        assert n <= 200
    # field-level fidelity on one row
    a = {
        (r["user_id"], r["valid_from_usec"])
        for r in hist.select("user_id", "valid_from_usec").collect()
    }
    b = {
        (r["user_id"], r["valid_from_usec"])
        for r in back.select("user_id", "valid_from_usec").collect()
    }
    assert a == b
