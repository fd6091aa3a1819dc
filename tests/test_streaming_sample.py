"""Streaming A-ES reservoir: merged shard reservoirs must equal the
batch weighted_sample_aes sample EXACTLY (same keys, same ids), state
bounded at k per shard, and the reservoir must survive micro-batches."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from processor_edf_spark.plans import QUERIES
from processor_edf_spark.plans.corpus_extra import WSAMPLE_K
from processor_edf_spark.streaming.sample import (
    merge_shard_reservoirs,
    stream_weighted_sample,
)

SCHEMA = "doc_id long, n_chars long"


def _run(df, ckpt, name):
    (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def test_stream_sample_matches_batch_query(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    batch = {
        r["doc_id"]: r["sample_key"]
        for r in QUERIES["weighted_sample_aes"](spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    _run(stream_weighted_sample(stream, k=WSAMPLE_K), ckpt, "res_out")

    merged = merge_shard_reservoirs(
        spark.sql("select * from res_out"), k=WSAMPLE_K
    )
    got = {r["doc_id"]: r["sample_key"] for r in merged.collect()}
    assert got == batch  # identical ids AND identical keys


def test_reservoir_survives_micro_batches_and_stays_bounded(
    spark, tmp_path
):
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    k = 5

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        (
            stream_weighted_sample(stream, k=k, n_shards=2)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    drop([(i, 100 + i) for i in range(1, 30)])
    drop([(i, 100 + i) for i in range(30, 60)])
    res = spark.read.parquet(out_dir)
    # per (shard, emission) at most k rows; merged ≤ 2k
    merged_ids = sorted(
        r["doc_id"]
        for r in merge_shard_reservoirs(res, k=k).collect()
    )
    assert len(merged_ids) == k

    # parity with a one-shot streaming run over all 59 docs
    import shutil

    shutil.rmtree(ckpt)
    shutil.rmtree(out_dir)
    one_ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    (
        stream_weighted_sample(stream, k=k, n_shards=2)
        .writeStream.foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", one_ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    one_shot = merge_shard_reservoirs(spark.read.parquet(out_dir), k=k)
    assert merged_ids == sorted(r["doc_id"] for r in one_shot.collect())
