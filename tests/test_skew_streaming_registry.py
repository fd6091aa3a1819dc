"""Salted aggregation equivalence + streaming EDF append-mode registry."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import os

import numpy as np
from pyspark.sql import functions as F

from processor_edf_spark.operators.skew import salted_agg
from tests.edf_fixtures import sine, write_edf


def test_salted_agg_matches_plain(spark):
    """Salted two-phase agg must equal the direct groupBy on a skewed key
    distribution (one key holds ~90% of rows)."""
    rng = np.random.default_rng(3)
    rows = [
        ("hot" if rng.random() < 0.9 else f"k{rng.integers(5)}", float(v))
        for v in rng.integers(0, 1000, size=20_000)
    ]
    df = spark.createDataFrame(rows, "key string, v double")
    plain = {
        r["key"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["key"],
            {
                "s": ("sum", "v"),
                "n": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_streaming_edf_append_registry(spark, tmp_path):
    """Append mode over real EDF drops: file B's channel (rate within ±2%)
    must reuse the id registered from file A's micro-batch; the off-band
    channel registers fresh.  maxFilesPerTrigger=1 forces the match to
    cross micro-batch STATE, not batch-local dedup."""
    from processor_edf_spark.streaming.sessions import stream_edf_channel_registry

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    write_edf(
        os.path.join(in_dir, "a.edf"),
        signals=[{"label": "EEG F3", "rate": 200, "gen": sine(8.0)}],
        nb_data_rec=1,
    )
    write_edf(
        os.path.join(in_dir, "b.edf"),
        signals=[
            {"label": "eeg f3", "rate": 201, "gen": sine(8.0)},  # in band
            {"label": "EEG F3", "rate": 300, "gen": sine(8.0)},  # off band
        ],
        nb_data_rec=1,
    )

    q = (
        stream_edf_channel_registry(spark, in_dir)
        .writeStream.format("memory")
        .queryName("edf_registry_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from edf_registry_out").collect()
    by_rate = {round(r["rate"]): r for r in rows}
    assert len(rows) == 3
    # 201 Hz (file B) reuses the id registered for 200 Hz (file A)
    assert by_rate[300]["channel_id"] != by_rate[200]["channel_id"]
    assert by_rate[300]["is_new"]
    assert by_rate[201]["channel_id"] == by_rate[200]["channel_id"]
    assert not by_rate[201]["is_new"]


def test_aqe_splits_skewed_join(spark):
    """Join skew is AQE's job (salted_agg covers aggregation skew): with a
    90%-hot key, the runtime plan must mark the sort-merge join skew=true
    and split the hot partition — the session factory turns skewJoin on,
    so this guards that a conf change can't silently lose it.  Thresholds
    are lowered to make the tiny local dataset register as skewed."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 == 0, F.col("id") % 97)
            .otherwise(F.lit(1))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(0, 2000).select(
            (F.col("id") % 97).alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        joined.collect()  # AQE re-plans at runtime
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_join_matches_plain(spark):
    """Salted join must equal the plain equi-join row-for-row on a
    skewed fact distribution (one key ~90% of rows), for inner and for
    left (including unmatched fact keys)."""
    from processor_edf_spark.operators.skew import salted_join

    rng = np.random.default_rng(11)
    facts = spark.createDataFrame(
        [
            ("hot" if rng.random() < 0.9 else f"k{rng.integers(6)}", int(v))
            for v in range(5_000)
        ],
        "key string, v long",
    )
    # k5 is absent from the dim side -> exercises left-join nulls
    dim = spark.createDataFrame(
        [(k, f"attr_{k}") for k in ["hot"] + [f"k{i}" for i in range(5)]],
        "key string, attr string",
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r["key"], r["v"], r["attr"])
            for r in facts.join(dim, ["key"], how).collect()
        )
        salted = sorted(
            (r["key"], r["v"], r["attr"])
            for r in salted_join(facts, dim, ["key"], n_salts=8, how=how).collect()
        )
        assert salted == plain, how
    # the salt must spread the hot key: the join runs on (key, _salt)
    plan = (
        salted_join(facts, dim, ["key"], n_salts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan


def test_salted_join_spreads_hot_key_reducer_load(spark):
    """The mechanism behind salted_join, pinned deterministically (no
    timing): hash-partitioned by key alone, a 90%-hot key's rows all
    land on ONE reducer partition; partitioned by (key, salt) with
    n_salts=8 they spread over many, and the max single-partition load
    drops accordingly (~n_salts×).  This is the boundary where AQE
    can't help (skewed groupBy / bucketed layouts / stream-stream) —
    for a plain sort-merge join AQE's skew split already handles it
    (test_aqe_splits_skewed_join)."""
    n_parts, n_salts = 32, 8
    facts = spark.range(0, 50_000).select(
        F.when(F.col("id") % 10 == 0, F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .otherwise(F.lit("hot"))
        .alias("key"),
        F.col("id").alias("v"),
    )

    def load_profile(cols):
        by_part = (
            facts.withColumn(
                "_salt", (F.col("v") % n_salts).cast("int")
            )  # content salt: full fan-out regardless of test parallelism
            .repartition(n_parts, *cols)
            .withColumn("pid", F.spark_partition_id())
            .filter(F.col("key") == "hot")
            .groupBy("pid")
            .count()
            .collect()
        )
        return len(by_part), max(r["count"] for r in by_part)

    unsalted_parts, unsalted_max = load_profile([F.col("key")])
    salted_parts, salted_max = load_profile([F.col("key"), F.col("_salt")])
    assert unsalted_parts == 1          # the funnel: one reducer owns the key
    assert salted_parts >= n_salts // 2  # fan-out (salts may co-hash)
    assert salted_max * 2 <= unsalted_max  # max reducer load actually drops
