"""Streaming per-key lag: exact parity with the batch lag window on
in-order input (which makes the dwell/histogram queries streamable by
construction), frontier state across micro-batches, and the late-row
quarantine policy."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.lag import stream_gaps

SCHEMA = "user_id long, event_id long, t long"


def test_stream_gaps_parity_with_batch_lag(spark, tmp_path):
    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    keyed = events.select(
        "user_id", "event_id", F.expr(TS_US).alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    want = {
        (r["user_id"], r["event_id"], r["gap"])
        for r in keyed.select(
            "user_id",
            "event_id",
            (F.col("t") - F.lag("t").over(w)).alias("gap"),
        ).collect()
    }

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    keyed.write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    (
        stream_gaps(stream)
        .writeStream.format("memory")
        .queryName("gaps_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {
        (r["key"], r["event_id"], r["gap_usec"])
        for r in spark.sql("select * from gaps_out").collect()
    }
    assert got == want and len(got) > 0


def test_frontier_survives_batches_and_late_rows_quarantined(
    spark, tmp_path
):
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
            stream_gaps(stream, emit_late=True)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(1, 1, 100)])             # first event: null gap
    drop([(1, 2, 50), (1, 3, 250)])  # 2 is LATE; 3 gaps 150 across batches
    got = {
        r["event_id"]: (r["gap_usec"], r["late"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: (None, False), 2: (None, True), 3: (150, False)}
