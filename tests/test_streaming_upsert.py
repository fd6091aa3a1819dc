"""Streaming current-state upsert: latest-wins is commutative, so the
final per-key state must equal the batch ranking window under ANY
micro-batch arrival order — pinned on randomly shuffled batches."""

from __future__ import annotations

import random

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load
from processor_edf_spark.streaming.upsert import stream_current_state

SCHEMA = "user_id long, event_id long, t long, value double"


def test_final_state_matches_batch_under_shuffled_arrival(spark, tmp_path):
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
    random.Random(13).shuffle(rows)  # adversarial arrival order
    thirds = [rows[i::3] for i in range(3)]

    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    for chunk in thirds:
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_current_state(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.withColumn("bid", F.lit(bid))
                .write.mode("append")
                .parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    # current table = last emit per key (ordered by batch id)
    out = spark.read.parquet(out_dir)
    w2 = Window.partitionBy("user_id").orderBy(F.desc("bid"))
    got = {
        (r["user_id"], r["value"], r["t"], r["event_id"])
        for r in out.withColumn("rn", F.row_number().over(w2))
        .filter("rn = 1")
        .collect()
    }
    assert got == want and len(got) > 0
