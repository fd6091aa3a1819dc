"""Streaming heavy hitters — the incremental flavor of
``operators/approx.heavy_hitters`` (mergeable Misra-Gries), for
trending terms/domains/users over an unbounded stream.

A single global MG sketch would serialize the stream through one task,
so the sketch is SHARDED: items hash to ``shards`` groups (the portable
md5 hash64, so a given item always lands in the same shard across
batches and restarts), and each shard's state is its own ≤ k-counter MG
summary.  State is bounded at shards·k counters regardless of the item
domain — the whole point of MG — and each shard's decrement total rides
along, so the union of shard outputs carries the same one-sided
guarantee as the batch operator:  est ≤ true ≤ est + Σ shard deducts.

Per micro-batch each updated shard emits its full current summary
(update-mode output): (shard, item, est_count) rows plus one
(shard, NULL, deduct) bookkeeping row.  Downstream, global top-k =
sort the ≤ shards·k rows of the LATEST emission per shard.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from processor_edf_spark.operators.textfns import hash64

TRENDING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("item", T.StringType(), True),
        T.StructField("est_count", T.LongType(), False),
        T.StructField("deduct", T.LongType(), False),
    ]
)

TRENDING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("deduct", T.LongType(), True),
    ]
)


def stream_heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 50,
    shards: int = 64,
) -> DataFrame:
    """Apply the sharded streaming MG sketch to a stream (or batch) with
    an item column ``col``.  Returns update-mode rows per
    TRENDING_OUTPUT_SCHEMA."""

    def track(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts, deduct = state.get
            summary = dict(zip(list(items), [int(c) for c in counts]))
            deduct = int(deduct)
        else:
            summary, deduct = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            for item, c in pdf["item"].value_counts().items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > k:
                vals = sorted(summary.values(), reverse=True)
                thr = vals[k]  # the (k+1)-th largest counter
                deduct += thr
                summary = {i: c - thr for i, c in summary.items() if c > thr}
        state.update((list(summary), list(summary.values()), deduct))
        yield pd.DataFrame(
            {
                "shard": [shard] * (len(summary) + 1),
                "item": list(summary) + [None],
                "est_count": list(summary.values()) + [0],
                "deduct": [0] * len(summary) + [deduct],
            }
        )

    keyed = df.select(
        F.col(col).cast("string").alias("item"),
        F.pmod(hash64(F.col(col).cast("string"), salt="hh"), F.lit(shards))
        .cast("int")
        .alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        track,
        outputStructType=TRENDING_OUTPUT_SCHEMA,
        stateStructType=TRENDING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
