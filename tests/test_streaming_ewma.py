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


def test_late_events_quarantined_not_folded(spark, tmp_path):
    """emit_late=True: an event older than the newest folded t for its
    key is emitted late=true with a null ewma and does NOT perturb the
    ring — the next in-order event folds exactly as if the late one
    never arrived (checked across a micro-batch boundary, alpha=0.5
    window=3 for exact-arithmetic expectations)."""
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
            stream_ewma(stream, alpha=0.5, window=3, emit_late=True)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(1, 1, 10, 1.0), (1, 2, 30, 3.0)])  # ring [1, 3]
    drop([(1, 3, 20, 9.9), (1, 4, 40, 5.0)])  # 3 is LATE; 4 folds
    got = {
        r["event_id"]: (r["ewma"], r["late"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # fold for event 4 over [1, 3, 5]: ((1·.5+3·.5)=2)·.5 + 5·.5 = 3.5 —
    # exactly what it would be had event 3 never arrived
    assert got[3] == (None, True)
    assert got[4] == (3.5, False)
    assert got[1] == (1.0, False) and got[2] == (2.0, False)
