"""Bounded-state evidence for the JVM-NATIVE streaming flavors (r11).

The Python twins' TTL story is pinned in tests/test_streaming_ttl.py;
the native flavors need their own answer because watermarks do not TTL
plain (un-windowed) streaming aggregations.  Two native eviction paths:

- ``stream_current_state_native_windowed`` — windowing the max-struct
  aggregate makes window close the eviction: once the watermark passes
  a window's end, the window emits (append mode) and its state rows
  leave the store.
- ``dedup_stream_exact`` — ``dropDuplicatesWithinWatermark`` expires a
  content key once the watermark passes its event time + delay.

Both are churn-tested at the STORE level: lastProgress numRowsTotal
plateaus across key generations instead of growing with every key ever
seen, and ``streaming/inspect.read_state`` shows only the live
generation's keys held.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.streaming.inspect import read_state
from processor_edf_spark.streaming.sessions import dedup_stream_exact
from processor_edf_spark.streaming.upsert import (
    stream_current_state_native_windowed,
)

GEN = 10_000_000   # µs between key generations
WINDOW = 4_000_000  # tumbling window = the TTL analog
BASE = GEN

SCHEMA = "user_id long, event_id long, t long, value double"


def _drive(spark, tmp_path, build, rows_schema=SCHEMA):
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def drop(rows):
        spark.createDataFrame(rows, rows_schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(rows_schema).parquet(in_dir)
        q = (
            build(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        ops = q.lastProgress["stateOperators"]
        assert len(ops) == 1
        return ops[0]["numRowsTotal"], out_dir, ckpt

    return drop


def _generation(g: int, n_keys: int = 10):
    """n_keys fresh keys, two events each (the second is the window's
    latest-wins winner), all inside generation g's window."""
    rows = []
    for i in range(n_keys):
        k = g * 1000 + i
        t0 = BASE + g * GEN
        rows.append((k, g * 100 + 2 * i, t0 + i, float(g)))
        rows.append((k, g * 100 + 2 * i + 1, t0 + 1000 + i, float(g) + 0.5))
    return rows


def test_native_windowed_state_plateaus_under_key_churn(spark, tmp_path):
    drop = _drive(
        spark,
        tmp_path,
        lambda s: stream_current_state_native_windowed(
            s, window_usec=WINDOW
        ),
    )
    counts = []
    for g in range(5):
        n, out_dir, ckpt = drop(_generation(g))
        counts.append(n)
    # closed windows leave the store: state holds the OPEN generation's
    # (window, key) rows, never the 50 keys ever seen
    assert counts[0] == 10
    assert max(counts) <= 20 and counts[-1] <= 20, counts

    # store-level proof via the statestore reader: only live-generation
    # keys remain (generation 4's keys are 4000-4009)
    held = {r["user_id"] for r in read_state(spark, ckpt).collect()}
    assert held and held <= {4000 + i for i in range(10)}, held

    # and the emitted windows materialize the correct current table:
    # every closed generation's key shows its latest (t, id) winner
    out = spark.read.parquet(out_dir)
    cur = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("t"), F.desc("event_id")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    by_key = {r["user_id"]: r for r in cur}
    for g in range(4):  # generation 4's window never closed in-run
        for i in range(10):
            k = g * 1000 + i
            assert k in by_key, f"key {k} never emitted"
            r = by_key[k]
            assert r["event_id"] == g * 100 + 2 * i + 1
            assert r["value"] == float(g) + 0.5


def test_dedup_within_watermark_state_plateaus(spark, tmp_path):
    delay_usec = 4_000_000
    drop = _drive(
        spark,
        tmp_path,
        lambda s: dedup_stream_exact(
            s.select(
                "doc_id",
                "text",
                F.timestamp_micros("t").alias("ts"),
            ),
            text_col="text",
            ts_col="ts",
            delay=f"{delay_usec} microseconds",
        ),
        rows_schema="doc_id long, text string, t long",
    )
    counts = []
    for g in range(5):
        t0 = BASE + g * GEN
        rows = []
        for i in range(10):
            # each content arrives twice inside the horizon: the
            # duplicate must be dropped, the key held only until the
            # watermark passes t + delay
            rows.append((g * 100 + 2 * i, f"doc {g}-{i}", t0 + i))
            rows.append((g * 100 + 2 * i + 1, f"doc {g}-{i}", t0 + 500 + i))
        n, out_dir, ckpt = drop(rows)
        counts.append(n)
    # expired content keys leave the store: bounded by the horizon's
    # generation, never the 50 contents ever seen
    assert counts[0] == 10
    assert max(counts) <= 20 and counts[-1] <= 20, counts
    # exactly one survivor per content — the dedup semantics held while
    # state stayed bounded
    out = spark.read.parquet(out_dir)
    assert out.count() == 50
    assert out.select("text").distinct().count() == 50
