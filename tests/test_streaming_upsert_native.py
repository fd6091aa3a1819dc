"""Parity: JVM-native current-state upsert vs the Python-stateful twin.

``stream_current_state_native`` is a streaming groupBy + max(struct) in
UPDATE mode — no Python state.  Latest-wins is commutative, so under
ANY micro-batch arrival order both flavors' materialized current table
(last emit per key, ordered by micro-batch id) must equal the batch
ranking window.  Emission cadence legitimately differs (update mode
re-emits a key on any input, the Python fold only on change) — the
materialization is the pinned contract, and the test also pins the
cadence difference itself so a silent semantics change in either
flavor shows up.
"""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.upsert import (
    stream_current_state,
    stream_current_state_native,
)

SCHEMA = "user_id long, event_id long, t long, value double"


def _drive(spark, make_stream, out_mode, thirds, tmp_path, tag):
    in_dir = str(tmp_path / f"in_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    out_dir = str(tmp_path / f"out_{tag}")
    for chunk in thirds:
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            make_stream(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.withColumn("bid", F.lit(bid))
                .write.mode("append")
                .parquet(out_dir)
            )
            .outputMode(out_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
    return spark.read.parquet(out_dir)


def _current_table(out):
    w = Window.partitionBy("user_id").orderBy(F.desc("bid"))
    return {
        (r["user_id"], r["value"], r["t"], r["event_id"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }


def test_native_upsert_matches_python_twin_and_batch(spark, tmp_path):
    (events,) = load(spark, "/root/testdata/sf0.001", "events")
    keyed = events.select(
        "user_id", "event_id", F.expr(TS_US).alias("t"), "value"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("t"), F.desc("event_id")
    )
    want = {
        (r["user_id"], r["value"], r["t"], r["event_id"])
        for r in keyed.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }

    rows = [tuple(r) for r in keyed.collect()]
    random.Random(29).shuffle(rows)  # adversarial arrival order
    thirds = [rows[i::3] for i in range(3)]

    native_out = _drive(
        spark, stream_current_state_native, "update", thirds, tmp_path,
        "native",
    )
    python_out = _drive(
        spark, stream_current_state, "append", thirds, tmp_path, "python"
    )

    native = _current_table(native_out)
    python = _current_table(python_out)
    assert native == want and len(native) > 0
    assert python == want

    # the documented cadence difference: update mode re-emits any key
    # with input, the fold emits only on change — so the native flavor
    # can never emit FEWER rows than the Python twin.
    assert native_out.count() >= python_out.count()
