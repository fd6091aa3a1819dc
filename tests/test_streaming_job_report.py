"""Streaming events_job_report parity: the three streaming frames
(stream_gaps lag, native streaming distinct, composite-key upsert)
replayed availableNow over the real sf0.001 events reproduce the batch
report's five stage rows EXACTLY — the composition proof that the r7
stateful primitives make the events job streamable by construction."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.plans import QUERIES
from processor_edf_spark.plans.analytics_r7 import SESSION_GAP_USEC
from processor_edf_spark.plans.analytics_r7b import (
    EVENTS_JOB_SESSION_GAP_USEC,
)
from processor_edf_spark.plans.registry import load, ts_usec
from processor_edf_spark.streaming.report import (
    streaming_events_job_report_frames,
    summarize_events_job_report,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "user_id long, event_id long, event_type string, t long"


def test_streaming_report_matches_batch_on_replay(spark, tmp_path):
    batch_report = {
        r["stage"]: r["rows_out"]
        for r in QUERIES["events_job_report"](spark, SF).collect()
    }

    (events,) = load(spark, SF, "events")
    keyed = events.select(
        "user_id", "event_id", "event_type", ts_usec("ts").alias("t")
    )
    # two drops split by GLOBAL time: per-key arrival stays in-order
    # across micro-batches (the stream_gaps parity contract)
    mid = keyed.approxQuantile("t", [0.5], 0.0)[0]
    in_dir = str(tmp_path / "in")
    keyed.where(F.col("t") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    outs = {
        n: str(tmp_path / "out" / n) for n in ("gaps", "daily", "userday")
    }

    def replay():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        frames = streaming_events_job_report_frames(stream)
        for name, frame in frames.items():
            (
                frame.writeStream.foreachBatch(
                    lambda df, _b, d=outs[name]: df.write.mode(
                        "append"
                    ).parquet(d)
                )
                .outputMode("append")
                .option(
                    "checkpointLocation", str(tmp_path / "ckpt" / name)
                )
                .trigger(availableNow=True)
                .start()
                .awaitTermination(180)
            )

    replay()
    keyed.where(F.col("t") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    replay()  # second drop: state (frontiers, seen-sets) carries over

    got = {
        r["stage"]: r["rows_out"]
        for r in summarize_events_job_report(
            spark,
            spark.read.parquet(outs["gaps"]),
            spark.read.parquet(outs["daily"]),
            spark.read.parquet(outs["userday"]),
            session_gap_usec=EVENTS_JOB_SESSION_GAP_USEC,
            dwell_gap_usec=SESSION_GAP_USEC,
        ).collect()
    }
    assert got == batch_report
    assert got["input"] > 0 and got["sessions"] > 0
