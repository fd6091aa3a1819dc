"""Streaming sharded Misra-Gries: state survives a checkpointed restart
and the merged counters keep the MG guarantee (est <= true <= est +
total deduct) against the exact counts over EVERYTHING streamed."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import collections

from pyspark.sql import functions as F

from processor_edf_spark.streaming.trending import stream_heavy_hitters

WORDS1 = ["apple"] * 30 + ["banana"] * 20 + ["cherry"] * 9 + [
    f"rare{i}" for i in range(40)
]
WORDS2 = ["apple"] * 25 + ["banana"] * 5 + ["durian"] * 18 + [
    f"late{i}" for i in range(40)
]


def _run(spark, in_dir, name, ckpt, k):
    """foreachBatch sink (supports update-mode output AND checkpoint
    recovery, unlike the memory sink); the MG state persists in the
    checkpointed state store, so a fresh query against the same ckpt
    resumes the sketch.  Returns this run's emitted rows."""
    got: list = []

    def sink(batch_df, batch_id):
        got.extend(batch_df.collect())

    stream = spark.readStream.schema("item string").parquet(in_dir)
    q = (
        stream_heavy_hitters(stream, "item", k=k, shards=4)
        .writeStream.foreachBatch(sink)
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_stream_heavy_hitters_restart_and_bounds(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    k = 5
    spark.createDataFrame([(w,) for w in WORDS1], "item string").coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    rows1 = _run(spark, in_dir, "hh_run1", ckpt, k)
    # second drop + a FRESH query against the same checkpoint: the MG
    # state must resume (not restart from zero)
    spark.createDataFrame([(w,) for w in WORDS2], "item string").coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    rows2 = _run(spark, in_dir, "hh_run2", ckpt, k)

    # final state per shard = run-2 emission if the shard saw new data,
    # else its run-1 emission (NoTimeout state only emits when invoked)
    emitted2 = {r["shard"] for r in rows2}
    final = list(rows2) + [r for r in rows1 if r["shard"] not in emitted2]
    est = {r["item"]: r["est_count"] for r in final if r["item"] is not None}
    total_deduct = sum(r["deduct"] for r in final if r["item"] is None)

    exact = collections.Counter(WORDS1 + WORDS2)
    assert total_deduct > 0  # truncation actually happened
    for item, e in est.items():
        assert e <= exact[item], (item, e, exact[item])
        assert exact[item] <= e + total_deduct, (item, e, exact[item], total_deduct)
    # the heavyweights survived both truncation rounds and the restart
    for heavy in ("apple", "banana"):
        assert exact[heavy] > total_deduct
        assert heavy in est, (heavy, sorted(est))
    # cumulative count across the restart: apple = 55 exact, so its
    # estimate must exceed what run 2 alone (25) could produce
    assert est["apple"] > 25, "state did not carry across the restart"


def test_stream_heavy_hitters_state_is_bounded(spark, tmp_path):
    """However many distinct items stream in, per-shard state never
    exceeds k counters — the whole point of the sketch."""
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    # 500-item uniform tail (all truncatable) + two genuine heavyweights
    rows = [(f"w{i}",) for i in range(500)] * 2 + [("hot1",)] * 300 + [
        ("hot2",)
    ] * 200
    spark.createDataFrame(rows, "item string").coalesce(1).write.parquet(in_dir)
    out = _run(spark, in_dir, "hh_bounded", ckpt, k=8)
    per_shard = collections.Counter(
        r["shard"] for r in out if r["item"] is not None
    )
    assert per_shard and all(n <= 8 for n in per_shard.values())
    survivors = {r["item"] for r in out if r["item"] is not None}
    assert {"hot1", "hot2"} <= survivors  # the heavyweights survive
