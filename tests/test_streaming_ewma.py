"""Streaming EWMA: bit-exact parity with the ewma_user_values batch
query on in-order input, and state carry across micro-batches.

The parity claim is strict equality of DOUBLES (no tolerance): the
streaming fold runs the same IEEE multiply/add sequence in Python
floats that the batch query's ``aggregate`` fold runs in JVM doubles,
so any drift is a real divergence, not noise.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.plans import QUERIES
from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.ewma import stream_ewma

SCHEMA = "user_id long, event_id long, t long, value double"


def _run(stream_df, ckpt, out_name):
    (
        stream_df.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def test_stream_ewma_parity_with_batch_query(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    batch = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["ewma_user_values"](spark, sf_dir).collect()
    }

    (events,) = load(spark, sf_dir, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    events.select(
        "user_id", "event_id", F.expr(TS_US).alias("t"), "value"
    ).write.parquet(in_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    _run(stream_ewma(stream), ckpt, "ewma_stream_out")
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.sql("select * from ewma_stream_out").collect()
    }
    assert len(got) == len(batch)
    mismatched = [
        eid for eid, v in batch.items() if got[eid] != v  # exact doubles
    ]
    assert mismatched == []


def test_stream_ewma_state_carries_across_drops(spark, tmp_path):
    """A user's series split across two in-order drops must fold to the
    same values as a single drop — the ring survives the micro-batch
    boundary and the checkpoint restart."""
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    rows1 = [(1, i, i * 10, float(i)) for i in range(1, 26)]
    rows2 = [(1, i, i * 10, float(i)) for i in range(26, 51)]

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_ewma(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop(rows1)
    drop(rows2)
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.read.parquet(out_dir).collect()
    }

    # reference: plain python fold over the full in-order series
    alpha, window = 0.1, 20
    ring, want = [], {}
    for _, eid, _t, x in rows1 + rows2:
        ring.append(x)
        ring = ring[-window:]
        acc = ring[0]
        for v in ring[1:]:
            acc = acc * (1.0 - alpha) + v * alpha
        want[eid] = acc

    assert len(got) == len(want)
    assert [e for e, v in want.items() if got[e] != v] == []
