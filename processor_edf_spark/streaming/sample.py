"""Streaming weighted reservoir — the incremental flavor of the
``weighted_sample_aes`` batch query: maintain the k smallest
Efraimidis–Spirakis keys over an unbounded document stream, in bounded
state, with the SAME sample as the batch pass over the same data.

Design (the ``trending.py`` sharding discipline):

- the A-ES key is computed in SPARK expressions BEFORE the stateful
  operator — the one definition shared with the batch query
  (``plans/corpus_extra.aes_sample_key``), so stream and batch select
  the identical sample by construction (no Python ln/round re-derivation
  to drift);
- rows shard by the portable id hash; each shard's state is its own
  bottom-k list (≤ k (key, id, weight) triples), so no single partition
  sees the whole stream;
- every micro-batch emits each touched shard's current bottom-k
  (update-mode semantics); the FINAL sample is the batch-side merge
  ``merge_shard_reservoirs`` — bottom-k of the ≤ shards·k candidates —
  which equals the batch query's top-k exactly (min-k of a union is the
  min-k of per-shard min-k's).

State bound: shards · k triples, independent of stream length.
Parity pinned in tests/test_streaming_sample.py.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from processor_edf_spark.operators.textfns import hash64
from processor_edf_spark.plans.corpus_extra import aes_sample_key

SAMPLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("weight", T.LongType(), False),
        T.StructField("sample_key", T.DoubleType(), False),
    ]
)

SAMPLE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.DoubleType()), True),
        T.StructField("ids", T.ArrayType(T.LongType()), True),
        T.StructField("weights", T.ArrayType(T.LongType()), True),
    ]
)


def stream_weighted_sample(
    docs: DataFrame,
    k: int = 100,
    n_shards: int = 8,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Per-shard bottom-k A-ES reservoir over a document stream; merge
    the emitted shard reservoirs with :func:`merge_shard_reservoirs`
    for the global sample."""
    key, weight = aes_sample_key(id_col, weight_col)
    keyed = docs.select(
        F.pmod(hash64(F.col(id_col).cast("string"), salt="shard"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        weight.cast("long").alias("weight"),
        key.alias("sample_key"),
    )

    def fold(
        skey: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = skey
        if state.exists:
            keys, ids, weights = (list(c) for c in state.get)
        else:
            keys, ids, weights = [], [], []
        rows = [p for p in pdfs if len(p)]
        if not rows:
            state.update((keys, ids, weights))
            return
        batch = pd.concat(rows, ignore_index=True)
        pool = list(zip(keys, ids, weights)) + [
            (float(s), int(d), int(w))
            for s, d, w in zip(
                batch["sample_key"], batch["doc_id"], batch["weight"]
            )
        ]
        pool.sort(key=lambda t: (t[0], t[1]))  # (key, id) — batch tiebreak
        pool = pool[:k]
        keys = [t[0] for t in pool]
        ids = [t[1] for t in pool]
        weights = [t[2] for t in pool]
        state.update((keys, ids, weights))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(pool),
                "doc_id": ids,
                "weight": weights,
                "sample_key": keys,
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        fold,
        outputStructType=SAMPLE_OUTPUT_SCHEMA,
        stateStructType=SAMPLE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_reservoirs(reservoirs: DataFrame, k: int = 100) -> DataFrame:
    """Global bottom-k from the latest per-shard reservoir emissions:
    min-k of a union is the min-k of per-shard min-k's, so this equals
    the batch query's sample exactly.  ``reservoirs`` may contain
    multiple emissions per (shard, doc_id) — deduped here."""
    latest = reservoirs.dropDuplicates(["shard", "doc_id"])
    return (
        latest.orderBy(F.col("sample_key").asc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "weight", "sample_key")
    )
