"""End-to-end EDF dataflow: files → samples + channel metadata.

The Spark lifecycle (SURVEY.md §3.4):

    binaryFile scan → decode UDTF (mapInPandas) → long-format samples
      → [annotation filter, calibration — inside the decoder]
      → channel registry (band-join dedup, J1-J3)
      → gap sessionization (W1) + bounds/count aggregation (A1/A2)
      → channels metadata + parquet/JSON sinks

Replaces the reference's eager single-file pipeline
(processor/edf_processor/processor.py:10-69 + base_processor/base.py:40-53):
one declarative plan, per-file decode is shuffle-free, and the only
shuffles are the per-channel aggregations — which operate on partial
states, not raw samples.

Error handling: the reference swallows decode errors and publishes partial
output (processor.py:66-69).  Here a malformed file fails its own task and
is reported; use ``scan → decode`` per-file status if quarantine semantics
are needed (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from processor_edf_spark.operators.channels import (
    get_or_create_channels,
    match_existing_channels,
)
from processor_edf_spark.operators.sessionize import merge_chunk_runs
from processor_edf_spark.sources.edf import (
    decode_annotations,
    decode_chunk_runs,
    decode_samples,
    file_status,
    parse_signal_headers,
    scan_edf_files,
)


def process_edf_directory(
    spark: SparkSession,
    input_dir: str,
    existing_channels: DataFrame | None = None,
    quarantine: bool = False,
    samples_target_bytes: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the full EDF pipeline over a directory (any number of files —
    the reference's one-file limit, main.py:15-16, does not apply).

    Returns ``(samples, channels, annotations)`` DataFrames.
    ``existing_channels`` (id, name, rate, type, …) switches on append-mode
    matching (J1), the batch equivalent of reference mode='append'
    (timeseries/base.py:129-135).
    ``quarantine=True`` drops files that fail the structural probe
    (``file_status``) instead of failing the job — the per-file status
    design of SURVEY.md §2.10 (the reference swallows errors and emits
    partial output; we isolate them).  Use ``file_status(binary)`` to
    report the quarantined set.

    ``samples_target_bytes`` switches the WHOLE pipeline to the
    record-aligned byte-range source (sources/edf_ranges.py) — samples,
    annotations, chunk runs, signal headers, AND the quarantine probe:
    one decode task per ~target_bytes of any file, removing both the
    one-task-per-file ceiling and binaryFile's ~2 GB content cap at
    EVERY stage (until r12 the metadata stages still materialized
    whole-file content, so large recordings failed there even with the
    ranged sample path on).  Headers and the quarantine probe read only
    the 256+256·ns header bytes; annotations and chunk runs ride the
    same record-aligned ranges as the sample decode (global record
    indices via rec0; range-boundary runs coalesce in the existing
    O(chunks) merge).  Output is bit-identical to the whole-file path
    (tests/test_edf_ranges.py).
    """
    if samples_target_bytes is not None:
        return _process_edf_directory_ranged(
            spark,
            input_dir,
            existing_channels,
            quarantine,
            samples_target_bytes,
        )
    binary = scan_edf_files(spark, input_dir)
    if quarantine:
        good = file_status(binary).filter(F.col("ok")).select("path")
        binary = binary.join(F.broadcast(good), "path")
    samples = decode_samples(binary)
    annotations = decode_annotations(binary)
    headers = parse_signal_headers(binary)
    chunk_runs = decode_chunk_runs(binary)
    channels = build_channel_metadata(chunk_runs, headers, existing_channels)
    return samples, channels, annotations


class _PlanRegistry:
    """Most recent persisted range plan, keyed by (SparkSession,
    thread) under a lock: each new ranged run releases its OWN
    predecessor's cache, so a long session running repeated jobs keeps
    at most one plan's partitions cached per job thread — and two
    concurrent ranged runs (driver threads, or two sessions in one
    process) can no longer unpersist each other's live plan and force
    the planner lineage (and its per-file header reads) to re-execute
    (ADVICE r12).  Entries are O(job threads) small DataFrame handles;
    the plan rows themselves are O(ranges) ~1 KB metadata.  Every
    swap() also sweeps entries whose owning thread has died (ADVICE
    r13: ad-hoc ThreadPoolExecutors running one ranged job per fresh
    thread must not accumulate one persisted plan per dead thread),
    restoring the old single-slot bound for the serial-driver case."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._plans: dict[tuple, object] = {}

    def swap(self, key, df):
        """Install ``df`` as the key's live plan; return the list of
        displaced plans (the key's previous plan plus any entries owned
        by dead threads) for the caller to unpersist."""
        import threading

        live = {t.ident for t in threading.enumerate()}
        with self._lock:
            displaced = [self._plans.pop(key, None)]
            displaced.extend(
                self._plans.pop(k)
                for k in [k for k in self._plans if k[1] not in live]
            )
            if df is not None:
                self._plans[key] = df
        return [d for d in displaced if d is not None]


_RANGE_PLANS = _PlanRegistry()


def _plan_key(spark: SparkSession) -> tuple:
    import threading

    return (id(spark), threading.get_ident())


def _process_edf_directory_ranged(
    spark: SparkSession,
    input_dir: str,
    existing_channels: DataFrame | None,
    quarantine: bool,
    target_bytes: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The byte-range flavor of the pipeline: every stage works from the
    (path, length) listing + range reads; whole-file content is never
    materialized, so executor memory is bounded by ``target_bytes`` at
    any file size.  The range plan is built ONCE (and persisted by the
    decode's task-count sizing) and shared by the samples, annotations,
    and chunk-run scans — one header read per file for all three."""
    from processor_edf_spark.sources.edf_ranges import (
        decode_annotations_ranged,
        decode_chunk_runs_ranged,
        decode_samples_from_ranges,
        file_status_ranged,
        plan_edf_ranges,
        signal_headers_from_plan,
    )

    from processor_edf_spark.sources.edf_ranges import edf_listing

    listing = edf_listing(spark, input_dir)
    if quarantine:
        # header-only probe; corrupt headers excluded BEFORE the planner
        good = (
            file_status_ranged(spark, input_dir, listing=listing)
            .filter(F.col("ok"))
            .select("path")
        )
        listing = listing.join(F.broadcast(good), "path")
    from pyspark import StorageLevel

    ranges = plan_edf_ranges(
        spark, input_dir, target_bytes=target_bytes, listing=listing
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # release the PREVIOUS invocation's persisted plan for THIS
    # (session, thread) plus any plans stranded by dead job threads —
    # long sessions running repeated jobs must not accumulate cached
    # range partitions, while concurrent runs on other live
    # threads/sessions keep their plans untouched
    for prev in _RANGE_PLANS.swap(_plan_key(spark), ranges):
        try:
            prev.unpersist()
        except Exception:  # session of the old plan may be gone
            pass
    # one metadata action materializes the plan (single header read per
    # file); the explicit repartition spreads EVERY range scan one-per-
    # task — same AQE-coalesce rationale as decode_samples_from_ranges
    n_ranges = max(1, ranges.count())
    samples = decode_samples_from_ranges(ranges, num_tasks=n_ranges)
    annotations = decode_annotations_ranged(ranges.repartition(n_ranges))
    # signal headers come from the PLAN's ride-along JSON — no second
    # per-file header read (at a million-file listing the old
    # scan_signal_headers_ranged doubled the small-read storm)
    headers = signal_headers_from_plan(ranges)
    chunk_runs = decode_chunk_runs_ranged(ranges.repartition(n_ranges))
    channels = build_channel_metadata(chunk_runs, headers, existing_channels)
    return samples, channels, annotations


def build_channel_metadata(
    chunk_runs: DataFrame,
    headers: DataFrame,
    existing_channels: DataFrame | None = None,
) -> DataFrame:
    """Channel metadata records mirroring timeseries-channel.schema.json.

    Plan shape — NO sample rows move anywhere: gap detection happened
    inside the decode scan (``decode_chunk_runs``, one np.diff per
    signal), so this plan only joins/aggregates O(chunks) run rows and
    O(signals) header rows; the registry joins are broadcasts.  Bounds
    (A1) and counts (A2) fall out of the merged chunk runs — every sample
    belongs to exactly one run.
    """
    signal_dim = (
        headers.filter(~F.col("is_annotation"))
        .select(
            "file",
            "signal_idx",
            F.trim(F.col("label")).alias("name"),
            F.col("phy_dim").alias("unit"),
            "rate",
            F.lit("CONTINUOUS").alias("type"),
        )
        # O(signals) rows, but derived from the binary scan via Python —
        # cache so the registry/mapping/output branches don't each
        # re-scan and re-parse every file (this halved the metadata plan's
        # wall time on a 32-file run)
        .cache()
    )
    registry = get_or_create_channels(signal_dim, existing_channels).cache()

    # Merge path: several files can carry the SAME channel (reference
    # append semantics, base.py:129-221 — samples accumulate, bounds
    # extend).  Map every incoming (file, label) to its canonical channel
    # id via the same J1 band match used for dedup, then aggregate bounds
    # and chunks BY CHANNEL ID over the union of all matched files.
    mapping = F.broadcast(
        match_existing_channels(
            signal_dim.select("file", "name", "rate", "type"),
            registry.select("id", "name", "rate", "type"),
        ).select(
            F.col("file").alias("m_file"),
            F.col("name").alias("m_channel"),
            F.col("existing_id").alias("m_id"),
            F.col("existing_rate").alias("m_rate"),
        )
    )
    runs = chunk_runs.join(
        mapping,
        (F.col("file") == F.col("m_file")) & (F.col("channel") == F.col("m_channel")),
    )

    # Cross-file merge of the decoder's per-file runs (two-level plan:
    # map side = np.diff in the scan, reduce side = O(chunks) window).
    chunks = merge_chunk_runs(runs, id_col="m_id", rate_col="m_rate")

    bounds = chunks.groupBy("m_id").agg(
        F.min("start").alias("start"),
        F.max("end").alias("end"),
        F.sum("n_samples").alias("num_values"),
    ).select(F.col("m_id").alias("b_id"), "start", "end", "num_values")

    chunk_lists = chunks.groupBy("m_id").agg(
        F.sort_array(F.collect_list(F.struct("index", "start", "end"))).alias(
            "contiguousChunks"
        )
    ).select(F.col("m_id").alias("c_id"), "contiguousChunks")

    return (
        registry.join(bounds, F.col("id") == F.col("b_id"))
        .join(chunk_lists, F.col("id") == F.col("c_id"))
        .select(
            "id",
            "file",
            "index",
            "name",
            "start",
            "end",
            "unit",
            "rate",
            "type",
            F.lit("default").alias("group"),
            F.lit(0).cast("long").alias("lastAnnotation"),
            "num_values",
            "contiguousChunks",
            F.array().cast(
                "array<struct<key:string,value:string>>"
            ).alias("properties"),
        )
    )


def build_unit_channel_metadata(spikes: DataFrame, rate: float = 30_000.0) -> DataFrame:
    """Channel metadata for sparse UNIT (spike) channels — the reference
    defines spikes and a spike sink but the EDF path never produces them
    (timeseries/base.py:98-119,223-263); this completes the dataflow for
    callers that do.  Bounds come from first/last spike timestamp exactly
    as ``write_spike_data`` maintains them (base.py:255-261); each spike
    train is one contiguous chunk starting at index 0 (sparse data has no
    gap semantics)."""
    bounds = spikes.groupBy("file", "channel").agg(
        F.min("t_usec").alias("start"),
        F.max("t_usec").alias("end"),
        F.count(F.lit(1)).alias("num_values"),
    )
    w = Window.partitionBy("file").orderBy("channel")
    return bounds.select(
        F.concat_ws("#", "file", "channel").alias("id"),
        "file",
        (F.row_number().over(w) - 1).alias("index"),
        F.col("channel").alias("name"),
        "start",
        "end",
        F.lit("uV").alias("unit"),
        F.lit(rate).alias("rate"),
        F.lit("UNIT").alias("type"),
        F.lit("default").alias("group"),
        F.lit(0).cast("long").alias("lastAnnotation"),
        "num_values",
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("index"),
                F.col("start").alias("start"),
                F.col("end").alias("end"),
            )
        ).alias("contiguousChunks"),
        F.array().cast("array<struct<key:string,value:string>>").alias("properties"),
    )


def validate_channels(channels: DataFrame) -> DataFrame:
    """Output-contract validation (S10): the reference validates every
    channel dict against timeseries-channel.schema.json before publishing
    (timeseries/base.py:14-15,64 + resources/timeseries-channel.schema.json)
    and asserts chunk order (base.py:87-95).  Distributed, validation is a
    column: ``violations`` lists every failed constraint (empty = publish),
    so callers choose quarantine vs fail — never silent partial output.
    """
    checks = {
        # required fields (schema :69)
        "missing_name": F.col("name").isNull() | (F.trim("name") == ""),
        "missing_unit": F.col("unit").isNull(),
        "missing_start": F.col("start").isNull(),
        "missing_end": F.col("end").isNull(),
        # type enum (schema :31-34, base.py:45)
        "bad_type": ~F.col("type").isin("CONTINUOUS", "UNIT"),
        "bad_rate": F.col("rate").isNull() | (F.col("rate") <= 0),
        "end_before_start": F.col("end") < F.col("start"),
        # chunks: sorted, non-overlapping, first at index 0 covering start
        "chunks_empty": F.size("contiguousChunks") == 0,
        "chunks_unsorted_or_overlap": F.exists(
            F.zip_with(
                F.slice("contiguousChunks", 1, F.greatest(F.size("contiguousChunks") - 1, F.lit(0))),
                F.slice("contiguousChunks", 2, F.greatest(F.size("contiguousChunks") - 1, F.lit(0))),
                lambda a, b: b["start"] <= a["end"],
            ),
            lambda x: x,
        ),
        "first_chunk_not_at_start": (F.element_at("contiguousChunks", 1)["index"] != 0)
        | (F.element_at("contiguousChunks", 1)["start"] != F.col("start")),
    }
    violations = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks.items()]
        ),
        lambda x: x.isNotNull(),
    )
    return channels.withColumn("violations", violations).withColumn(
        "valid", F.size("violations") == 0
    )


def channel_dicts(channels: DataFrame) -> list[dict]:
    """Channel rows as JSON-ready dicts (the reference's as_dict output,
    timeseries/base.py:47-65).  Driver-side materialization — only for the
    metadata dimension, never samples.  Cardinality assumption: channel
    count is bounded by files × signals-per-file (tens per file by the
    EDF spec's 256-byte-per-signal header budget), so even a million-file
    run collects millions of short rows at most — if channels ever
    stopped being a dimension table, this sink (which mirrors the
    reference's per-channel output contract) would need to become a
    distributed write instead."""
    out = []
    for row in channels.orderBy("file", "index").collect():
        d = {
            "name": row["name"],
            "start": int(row["start"]),
            "end": int(row["end"]),
            "unit": row["unit"],
            "rate": float(row["rate"]),
            "type": row["type"],
            "group": row["group"],
            "lastAnnotation": int(row["lastAnnotation"]),
            "contiguousChunks": [
                {"index": int(c["index"]), "start": int(c["start"])}
                for c in (row["contiguousChunks"] or [])
            ],
            "properties": list(row["properties"] or []),
        }
        if row["id"] is not None:
            d["id"] = row["id"]
        out.append(d)
    return out
