"""Streaming corpus ingest — the document-side §2.8 composition: as
corpus drops land, each micro-batch is content-deduped within the
watermark horizon, quality-scored, PII-audited and -scrubbed, all in one
incremental query.

Every stage is one of the batch operators applied under readStream
unchanged — dedup_stream_exact is the only stateful stage
(dropDuplicatesWithinWatermark, state bounded by the horizon);
quality/PII/repetition are stateless column expressions, so the
composition adds zero extra state and zero extra shuffles beyond the
dedup's.  This is the deployment shape for continuous pre-training-data
ingestion: batch semantics and streaming semantics come from the SAME
operator definitions, so a query validated by the batch oracles is the
query that runs on the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_edf_spark.operators.redaction import pii_stats, redact_pii
from processor_edf_spark.streaming.sessions import dedup_stream_exact


def stream_corpus_ingest(
    spark: SparkSession,
    input_dir: str,
    schema: str = "doc_id long, text string, lang string, ts timestamp",
    dedup_delay: str = "10 minutes",
    min_tokens: int = 3,
    normalize: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream(parquet drops) → watermarked content dedup (on the
    NORMALIZED text by default — whitespace/case mutations of the same
    document dedup, the production-realistic key) → token gate → PII
    audit + scrub.  Returns the streaming DataFrame; run with
    ``trigger(availableNow=True)`` for batch-incremental catch-up or a
    processing-time trigger for continuous ingest.
    ``max_files_per_trigger`` bounds each micro-batch's file count —
    the deployment knob for catch-up batch sizing (and what lets the
    differential suite replay drops one micro-batch each)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(input_dir)
    deduped = dedup_stream_exact(
        stream, text_col="text", ts_col="ts", delay=dedup_delay,
        normalize=normalize,
    )
    gated = deduped.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    ).filter(F.col("n_tokens") >= min_tokens)
    audited = pii_stats(gated, text_col="text")
    return redact_pii(audited, text_col="text", out_col="clean_text")
