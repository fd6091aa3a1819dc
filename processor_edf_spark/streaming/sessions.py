"""Structured Streaming flavors of the reference's latent streaming
semantics (SURVEY.md §2.8).

- session windows: contiguous-chunk detection is exactly a session window
  with gap 2/rate (reference timeseries/base.py:322-342);
- monotonicity invariant: the reference rejects out-of-order/overlapping
  appends (base.py:87-95) — expressed here as watermark + quarantine;
- incremental append: new files merge into existing channels
  (reference mode='append', base.py:129-135) — see registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

USEC = 1_000_000


def stream_samples(spark, input_dir: str, schema) -> DataFrame:
    """File-source stream of long-format sample batches (parquet drops).
    Use trigger(availableNow=True) for batch-incremental runs."""
    return spark.readStream.schema(schema).parquet(input_dir)


def stream_edf_channel_registry(spark, input_dir: str) -> DataFrame:
    """The reference's append mode, fully incremental (§2.8 + §3.3): as
    EDF files land, their signal headers stream into the STATEFUL channel
    registry — each new signal either band-matches a channel registered
    by an earlier micro-batch (same normalized name/type, rate within
    ±2%) or registers a new one; state carries the registry across
    batches and restarts (checkpointed).  This is the streaming flavor of
    ``build_channel_metadata``'s get-or-create."""
    from processor_edf_spark.sources.edf import parse_signal_headers
    from processor_edf_spark.streaming.registry import streaming_channel_registry

    binary = _stream_edf_binary(spark, input_dir)
    headers = parse_signal_headers(binary)
    incoming = headers.filter(~F.col("is_annotation")).select(
        F.trim(F.col("label")).alias("name"),
        "rate",
        F.lit("CONTINUOUS").alias("type"),
    )
    return streaming_channel_registry(incoming)


def _stream_edf_binary(spark, input_dir: str) -> DataFrame:
    return (
        spark.readStream.format("binaryFile")
        .schema(  # streaming sources require an explicit schema
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.[eE][dD][fF]")
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch
        .load(input_dir)
    )


def stream_edf_directory(spark, input_dir: str) -> DataFrame:
    """Incremental EDF ingestion (§2.8 append mode, end-to-end): new .edf
    files landing in ``input_dir`` decode into the long-format sample
    stream — the SAME decode UDTF as batch (mapInPandas runs unchanged
    under Structured Streaming).  Chain into ``session_windowed_chunks``
    for incremental chunk detection or the stateful channel registry for
    append-mode matching; the file source tracks processed files, so each
    file decodes exactly once across restarts (checkpointed)."""
    from processor_edf_spark.sources.edf import decode_samples

    binary = (
        spark.readStream.format("binaryFile")
        .schema(  # streaming sources require an explicit schema
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.[eE][dD][fF]")
        .load(input_dir)
    )
    return decode_samples(binary)


def session_windowed_chunks(
    samples: DataFrame,
    rate_hz: float,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming gap sessionization: session_window with the reference's
    2/rate gap.  Emits one row per closed session (chunk) per channel:
    (file, channel, start_usec, end_usec, n_samples).

    Watermark bounds state: sessions close once event time passes
    window end + watermark — the streaming analog of the reference's
    'no late data accepted' invariant (README.md:30-32)."""
    gap_sec = 2.0 / rate_hz
    with_ts = samples.withColumn("ts", F.timestamp_micros("t_usec"))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy("file", "channel", F.session_window("ts", f"{gap_sec} seconds"))
        .agg(
            F.min("t_usec").alias("start_usec"),
            F.max("t_usec").alias("end_usec"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select("file", "channel", "start_usec", "end_usec", "n_samples")
    )


def dedup_stream_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
    normalize: bool = False,
) -> DataFrame:
    """Streaming exact dedup on ingest — the streaming flavor of the batch
    ``dedup_exact`` query: key every document by its content sha and drop
    later arrivals of the same content.

    Uses ``dropDuplicatesWithinWatermark`` rather than ``dropDuplicates``:
    plain streaming dropDuplicates keeps every key seen FOREVER (state
    grows with the corpus — unusable for a 100 TB ingest), while the
    within-watermark variant expires a key's state once the watermark
    passes it, bounding state to the duplicate-arrival horizon.  The
    contract this trades away is exact global uniqueness: a duplicate
    arriving more than ``delay`` after its twin is re-admitted — for
    training-data ingest that residue is handled by the periodic batch
    dedup pass (``dedup_exact`` / ``minhash_lsh_pairs``), the standard
    lambda split.  State is hash-partitioned by the sha key, so the
    operator scales out with no skew (sha is uniform).

    ``normalize=True`` keys by the sha of the NORMALIZED text
    (operators/textfns.normalized_text — the same expression the
    ``normalize_text`` batch oracle validates), so whitespace/case
    mutations of the same content dedup too."""
    from processor_edf_spark.operators.textfns import normalized_text

    key_src = (
        normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    )
    keyed = docs.withColumn("content_sha", F.sha2(key_src, 256))
    return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )


def quarantine_late(samples: DataFrame, arrival_col: str | None = None) -> DataFrame:
    """The reference asserts on out-of-order chunk appends (base.py:87-95);
    here we tag-don't-drop: a row is out_of_order when its timestamp
    regresses below the running max of everything that ARRIVED before it
    in the same channel.  ``arrival_col`` is the arrival sequence (batch
    id, file offset …); without one, physical row order stands in (fine
    for single-source tests, not stable across shuffles)."""
    from pyspark.sql import Window

    df = samples
    added = False
    if arrival_col is None:
        arrival_col = "_arrival"
        df = df.withColumn(arrival_col, F.monotonically_increasing_id())
        added = True
    w = (
        Window.partitionBy("file", "channel")
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn(
        "out_of_order",
        F.coalesce(F.col("t_usec") < F.max("t_usec").over(w), F.lit(False)),
    )
    return out.drop(arrival_col) if added else out


def enrich_stream_static(
    stream: DataFrame, dim: DataFrame, on: str | list[str]
) -> DataFrame:
    """Stream-static enrichment join — the streaming ingest analog of the
    batch dimension joins (q3/q5 style): every micro-batch of the stream
    equi-joins the static dimension table.

    Spark plans the static side as a broadcast per micro-batch when under
    the AQE threshold (the common case: dimensions are small), so the
    stream never shuffles for the join and needs no watermark — stream-
    static joins are stateless by construction (only stream-stream joins
    buffer state).  At 100 TB/day ingest the dimension re-resolves every
    batch, so slowly-changing dims are picked up without restarting the
    query."""
    return stream.join(F.broadcast(dim), on, "left")


def tumbling_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    delay: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts over a stream — the streaming
    flavor of the batch ``tumbling_daily_stats`` query and the canonical
    late-data pattern: rows later than ``delay`` behind the max seen
    event time are dropped, and a window's aggregate emits exactly once
    (append mode) when the watermark passes its end.

    State is bounded to the windows inside the watermark horizon per key
    — O(keys × horizon/window), independent of stream length.  The
    aggregation is a streaming partial agg: each micro-batch combines
    into per-(key, window) state, so the shuffle carries state deltas,
    not raw events."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    within: str = "1 hour",
    delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: match rows sharing ``key`` whose event
    times fall within ``within`` of each other (right_ts in
    [left_ts, left_ts + within]) — the attribution pattern (click →
    purchase within the hour) and the streaming flavor of the batch
    ``range_join_close_events`` query.

    Both sides carry watermarks, and the time-bound join condition is
    what lets the engine EXPIRE buffered rows: a left row older than
    (watermark - within) can never match a future right row, so its
    state drops.  Without the interval condition a stream-stream inner
    join must buffer both streams forever.  State per key is
    O(rows inside the watermark+within horizon) — bounded, shuffle-
    partitioned by key."""
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond).select(
        lw[key].alias(key),
        lw[left_ts].alias(left_ts),
        rw[right_ts].alias(right_ts),
    )


def session_stats_native(
    events: DataFrame,
    gap_usec: int,
    key_col: str = "user_id",
    t_col: str = "t",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-key session aggregates via Spark's NATIVE ``session_window``
    — the JVM-resident flavor of the ``stream_gaps`` consumer chain
    (gaps → threshold → session counts/dwell), with no Python state at
    all: state lives in the JVM state store, merges run inside
    whole-stage codegen, and rows never cross an Arrow boundary.

    Emits one row per CLOSED session: (key, start_usec, end_usec,
    dwell_usec, n_events).  Session semantics are session_window's:
    two events share a session iff their gap is AT MOST ``gap_usec``
    (inclusive — measured empirically and pinned by the parity test's
    exact-boundary events: a gap of exactly ``gap_usec`` merges, one
    microsecond more splits).  In append mode a session emits once the
    watermark passes its end + allowance; an availableNow replay over
    finite data therefore holds back trailing sessions until a later
    event (or a sentinel) advances the watermark — the same
    close-on-evidence trade the stateful twins make, with the batch
    pass owning residual exactness.

    Scale: this is the throughput flavor (BASELINE.md ``--streaming``
    ×16: 2.4 Mrows/s vs the Python-fold twin's 0.35 — the Arrow hop
    priced); the Python twins remain the flexibility flavor (per-event
    emission, quarantine policies, inspectable state)."""
    with_ts = events.withColumn("_ts", F.timestamp_micros(F.col(t_col)))
    return (
        with_ts.withWatermark("_ts", watermark)
        .groupBy(
            F.col(key_col).alias("key"),
            F.session_window("_ts", f"{gap_usec} microseconds"),
        )
        .agg(
            F.min(t_col).alias("start_usec"),
            F.max(t_col).alias("end_usec"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "key",
            "start_usec",
            "end_usec",
            (F.col("end_usec") - F.col("start_usec")).alias("dwell_usec"),
            "n_events",
        )
    )
