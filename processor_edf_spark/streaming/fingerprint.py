"""Streaming perceptual fingerprint dedup — the streaming face of the
image/audio near-dup family (operators/audio_dedup.py,
operators/image_dedup.py).

A training-data ingest keeps ONE representative per perceptual
fingerprint bucket as media files arrive: the first document seen in a
bucket (smallest doc_id within its arrival micro-batch) registers as
the representative, and every later arrival in the bucket adopts it.
This is the get-or-create upsert discipline of
``streaming/registry.py`` applied to fingerprint keys: state per afp
bucket is ONE long (the representative id), so memory is bounded by
the number of distinct fingerprints, not documents.

Determinism contract (what test_streaming_differential pins): the
PARTITION of documents into buckets equals the batch
``perceptual_dedup_components`` partition exactly — codec and
power-of-two-gain variants collapse into one bucket in both paths.
The representative may differ (first-arrival vs global-min), which is
the same arrival-order semantics as the channel registry and the
corpus dedup contracts.

Scale: fingerprinting is an Arrow-batched map over the stream;
state is one row per distinct fingerprint; no shuffle beyond the
groupBy(afp).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, afp long, rep_id long, is_rep boolean"
STATE_SCHEMA = "rep long"


def _assign(
    key: Tuple[int],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (afp,) = key
    doc_ids: list[int] = []
    for pdf in pdfs:
        doc_ids.extend(int(d) for d in pdf["doc_id"])
    if not doc_ids:
        return
    if state.exists:
        (rep,) = state.get
    else:
        rep = min(doc_ids)
        state.update((rep,))
    yield pd.DataFrame(
        {
            "doc_id": doc_ids,
            "afp": [afp] * len(doc_ids),
            "rep_id": [rep] * len(doc_ids),
            "is_rep": [d == rep for d in doc_ids],
        }
    )


def stream_fingerprint_dedup(
    spark: SparkSession, in_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over parquet drops of (doc_id long, payload binary)
    -> real-decoder audio fingerprints -> stateful per-bucket
    representative assignment.  Undecodable payloads are excluded
    (they are singletons by definition — no state needed)."""
    from processor_edf_spark.operators.audio_dedup import (
        audio_perceptual_fingerprints,
    )

    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_dir)
    )
    fps = audio_perceptual_fingerprints(stream)
    return (
        fps.filter(F.col("decoded"))
        .select("doc_id", "afp")
        .groupBy("afp")
        .applyInPandasWithState(
            _assign,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
