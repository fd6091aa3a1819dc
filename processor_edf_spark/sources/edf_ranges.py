"""Record-aligned byte-range EDF source: split-level parallelism INSIDE
one file.

The ``binaryFile`` path (edf.py:scan_edf_files/decode_samples) gives one
task per file and materializes the whole file in one row — fine for
corpora of many small files, but a multi-GB EDF+C recording serializes
into a single task and ``binaryFile`` caps content at ~2 GB.  The
reference has the same whole-file limit
(processor/edf_processor/edf.py:25-26,56-76).

EDF makes intra-file splitting trivial: after the fixed-width header
(256 + 256·nb_signal bytes) the data area is ``nb_data_rec`` records of
EXACTLY ``2·Σ nr_samples`` bytes each, so byte ranges can be planned
record-aligned from the header alone:

1. **List** — ``binaryFile`` scan projected to (path, length) only: the
   format's column pruning means no file content is read.
2. **Plan** — a mapInPandas over the listing opens each file via
   pyarrow.fs (works for file://, hdfs://, s3:// — any Arrow-supported
   filesystem), reads ONLY the header bytes, and emits record-aligned
   range rows ``(path, rec0, n_rec, start_byte, n_bytes, header_json)``
   sized to ``target_bytes``.  The parsed header rides along as JSON so
   the decode task performs exactly one range read.
3. **Decode** — the range rows are round-robin repartitioned one per
   task (they are metadata — the shuffle moves O(ranges) tiny rows,
   never samples) and each task range-reads its bytes and decodes via
   the SAME ``_decode_block`` kernel as the whole-file path.  Timestamps are
   bit-identical by construction: the contiguous formula uses the global
   sample index ``rec0·n_i + j``, and EDF+D records each carry their own
   absolute TAL offset, so any record-aligned block is self-contained.

At 100 TB this turns "one 50 GB file = one straggler task" into ~400
independent 128 MB tasks with zero coordination, and executor memory is
bounded by ``target_bytes`` rather than file size.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator
from urllib.parse import unquote, urlparse

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from processor_edf_spark.schemas import (
    ANNOTATIONS_SCHEMA,
    SAMPLES_SCHEMA,
    SIGNAL_HEADERS_SCHEMA,
)
from processor_edf_spark.sources.edf import (
    CHUNK_RUNS_SCHEMA,
    FILE_STATUS_SCHEMA,
    _decode_block,
    annotation_rows_from_matrix,
    chunk_run_rows_from_matrix,
    parse_edf_header,
    signal_header_rows,
    status_probe,
)

# Default split target: parquet-like 128 MB per task.
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024

RANGES_SCHEMA = (
    "path string, rec0 long, n_rec long, start_byte long, n_bytes long, "
    "rec_bytes long, header_json string"
)


def edf_listing(spark: SparkSession, path: str) -> DataFrame:
    """The one (path, length) EDF listing every ranged stage shares —
    a single definition so the glob/format rule can never diverge
    between the planner, the header scan, the probe, and the ranged
    pipeline's pre-filtered listing."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[eE][dD][fF]")
        .load(path)
        .select("path", "length")
    )


# Header fields the decode kernel AND the plan-derived signal-header
# scan need.  The free-text per-signal fields (transducer, phy_dim,
# prefiltering) ride along since the r12 third session: they cost
# ~170 chars per signal per range row, but carrying them lets the
# pipeline derive every signal-header row from the PLAN instead of
# issuing a second per-file header read — at a million-file listing
# that trades a few GB of shuffled plan metadata for a million fewer
# small object-store GETs.
_HEADER_KEYS = (
    "start_date",
    "start_time",
    "nb_data_rec",
    "duration",
    "nb_signal",
    "labels",
    "transducer",
    "phy_dim",
    "phy_min",
    "phy_max",
    "dig_min",
    "dig_max",
    "prefiltering",
    "nr_samples",
    "header_bytes",
    "is_discontiguous",
)


def _read_at(path: str, offset: int, n_bytes: int) -> bytes:
    """Read ``n_bytes`` at ``offset`` from a file URI without touching the
    rest of the file.  file:// short-circuits to a plain seek+read; every
    other scheme goes through pyarrow.fs (hdfs://, s3://, gs:// … —
    whatever Arrow filesystems the deployment provides)."""
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        local = unquote(parsed.path) if parsed.scheme else path
        with open(local, "rb") as f:
            f.seek(offset)
            return f.read(n_bytes)
    return _read_at_arrow(path, offset, n_bytes)


def _read_at_arrow(path: str, offset: int, n_bytes: int) -> bytes:
    """The pyarrow.fs range read — split out so the local tests can
    drive this exact code path through a file:// URI even though
    ``_read_at`` short-circuits that scheme in production."""
    from pyarrow import fs as pafs

    filesystem, rel = pafs.FileSystem.from_uri(path)
    with filesystem.open_input_file(rel) as f:
        return f.read_at(n_bytes, offset)


def _slim_header(h: dict) -> dict:
    return {k: h[k] for k in _HEADER_KEYS}


def plan_edf_ranges(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    listing: DataFrame | None = None,
    header_reads_acc=None,
) -> DataFrame:
    """Distributed range planner: (path, length) listing → record-aligned
    byte-range rows, one header read per file.

    The listing projects binaryFile to path/length ONLY — the format
    prunes the content column, so no file data moves in phase 1.
    Pass ``listing`` (a (path, length) DataFrame) to plan from a
    pre-filtered file set — e.g. the pipeline's quarantine filter,
    which must exclude corrupt headers BEFORE the planner parses them.

    ``header_reads_acc`` (an optional Spark accumulator) counts one per
    file the planner actually opens — the single-execution pin in
    tests/test_edf_ranges.py asserts plan+decode performs EXACTLY one
    header read per file (the r11 shape re-executed the uncached planner
    lineage for the decode pass: 2× small-read storms on an object store
    at a million-file listing)."""
    if listing is None:
        listing = edf_listing(spark, path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, length in zip(pdf["path"], pdf["length"]):
                if header_reads_acc is not None:
                    header_reads_acc.add(1)
                rows.extend(_plan_one(str(p), int(length), target_bytes))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "rec0",
                    "n_rec",
                    "start_byte",
                    "n_bytes",
                    "rec_bytes",
                    "header_json",
                ],
            )

    return listing.mapInPandas(gen, schema=RANGES_SCHEMA)


def _plan_one(path: str, length: int, target_bytes: int) -> list[tuple]:
    """Record-aligned ranges for one file from its header alone.

    A file with a parseable header but no decodable records
    (nb_data_rec = 0, or truncated below one record) still emits ONE
    zero-range metadata row (n_rec = 0, n_bytes = 0): the plan's
    ride-along header JSON is the ranged pipeline's ONLY source of
    signal-header/channel rows, so dropping such files here silently
    dropped their channels while the whole-file path kept them
    (ranged-vs-whole divergence, ADVICE r12).  Decoders skip
    zero-record rows; the metadata projections keep them."""
    head = _read_at(path, 0, 256)
    ns = int(head[252:256])
    h = parse_edf_header(_read_at(path, 0, 256 + 256 * ns))
    ranges = ranges_from_header(h, length, target_bytes)
    if not ranges:
        rec_bytes = 2 * int(sum(h["nr_samples"]))
        return [
            (path, 0, 0, h["header_bytes"], 0, rec_bytes,
             json.dumps(_slim_header(h)))
        ]
    return [(path, *r) for r in ranges]


def ranges_from_header(
    h: dict, length: int, target_bytes: int
) -> list[tuple]:
    """Pure range arithmetic: parsed header + file length →
    ``(rec0, n_rec, start_byte, n_bytes, rec_bytes, header_json)``
    tuples.  Record-aligned, gap-free, non-overlapping — pinned by
    tests/test_edf_ranges.py and value-checked end-to-end by the
    ``edf_range_decode`` driver row."""
    rec_bytes = 2 * int(sum(h["nr_samples"]))
    if rec_bytes <= 0:
        return []
    avail = (length - h["header_bytes"]) // rec_bytes
    n_rec = min(h["nb_data_rec"], avail)  # tolerate truncated files
    if n_rec <= 0:
        return []
    recs_per_range = max(1, target_bytes // rec_bytes)
    hj = json.dumps(_slim_header(h))
    out = []
    for rec0 in range(0, n_rec, recs_per_range):
        n = min(recs_per_range, n_rec - rec0)
        out.append(
            (
                rec0,
                n,
                h["header_bytes"] + rec0 * rec_bytes,
                n * rec_bytes,
                rec_bytes,
                hj,
            )
        )
    return out


def decode_range_bytes(
    header_json: str,
    raw: bytes,
    rec_bytes: int,
    rec0: int,
    file_name: str,
    wanted_signals: set[str] | None = None,
) -> Iterator[pd.DataFrame]:
    """Decode one range's raw bytes (the per-row kernel of
    ``decode_samples_from_ranges``; also driven directly by the
    ``edf_range_decode`` driver row so the oracle value-checks exactly
    this code path)."""
    h = json.loads(header_json)
    rec_len = rec_bytes // 2
    nb = len(raw) // rec_bytes
    rec = np.frombuffer(raw, dtype="<i2", count=nb * rec_len).reshape(nb, rec_len)
    yield from _decode_block(h, rec, rec0, file_name, wanted_signals)


def decode_samples_from_ranges(
    ranges: DataFrame,
    wanted_signals: set[str] | None = None,
    num_tasks: int | None = None,
) -> DataFrame:
    """Range rows → long-format samples via the shared ``_decode_block``
    kernel (bit-identical to edf.decode_samples; parity-pinned in
    tests/test_edf_ranges.py).

    The repartition spreads range rows across tasks — the header-scan
    stage has one partition per FILE, so without it every range of a
    file would decode serially in that file's task.  It shuffles only
    O(ranges) metadata rows (~1 KB each), never sample data.

    The partition count is EXPLICIT (one per range by default, counted
    with a cheap metadata action): a hash/AQE-sized shuffle sees a few
    KB of range rows and coalesces them into ONE partition — correct
    for the bytes it can observe, catastrophic for the decode fan-out
    behind them (each row expands ~10⁴× into sample batches).  An
    explicit ``repartition(n)`` is exempt from AQE coalescing, and
    round-robin placement gives exactly one range per task.

    The planner lineage executes EXACTLY ONCE: when the default
    ``num_tasks`` needs a count, the range rows are persisted first so
    the sizing action materializes them and the decode job reads the
    cached metadata instead of re-running the per-file header reads
    (the range rows are O(ranges) ~1 KB each, so the cache is bounded
    by the listing size, never by data volume).  Callers that already
    know the task count pass ``num_tasks`` and skip both the action and
    the cache."""
    if num_tasks is None:
        from pyspark import StorageLevel

        ranges = ranges.persist(StorageLevel.MEMORY_AND_DISK)
        num_tasks = max(1, ranges.count())

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if int(row.n_rec) <= 0:  # zero-range metadata row
                    continue
                raw = _read_at(str(row.path), int(row.start_byte), int(row.n_bytes))
                yield from decode_range_bytes(
                    str(row.header_json),
                    raw,
                    int(row.rec_bytes),
                    int(row.rec0),
                    str(row.path).rsplit("/", 1)[-1],
                    wanted_signals,
                )

    return ranges.repartition(num_tasks).mapInPandas(
        gen, schema=SAMPLES_SCHEMA
    )


def decode_samples_ranged(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    wanted_signals: set[str] | None = None,
) -> DataFrame:
    """One-call ranged decode: plan + decode (S4 at any file size)."""
    return decode_samples_from_ranges(
        plan_edf_ranges(spark, path, target_bytes), wanted_signals
    )


# ---------------------------------------------------------------------------
# Ranged METADATA twins (r12): headers / status / annotations / chunk
# runs without ever materializing whole-file content.  Until r12 the
# pipeline's metadata stages still routed through the whole-file
# binaryFile scan, so a >2 GB recording kept failing there even with the
# ranged SAMPLE path on, and executor memory stayed file-size-bound in
# those stages.  Headers and the quarantine probe read ONLY the
# 256+256·ns header bytes; annotations and chunk runs ride the same
# record-aligned ranges as the sample decode (memory bounded by
# target_bytes; global record indices / sample positions carried via
# rec0, the downstream merge is the same O(chunks) window the per-file
# path already used).
# ---------------------------------------------------------------------------


def _header_bytes(path: str) -> bytes:
    head = _read_at(path, 0, 256)
    ns = int(head[252:256])
    return _read_at(path, 0, 256 + 256 * ns)


def scan_signal_headers_ranged(
    spark: SparkSession, path: str, listing: DataFrame | None = None
) -> DataFrame:
    """S2/S3 over header-byte range reads only — same rows as
    edf.parse_signal_headers, O(header) bytes per file at any file
    size."""
    if listing is None:
        listing = edf_listing(spark, path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                yield signal_header_rows(str(p), _header_bytes(str(p)))

    return listing.mapInPandas(gen, schema=SIGNAL_HEADERS_SCHEMA)


def signal_headers_from_plan(ranges: DataFrame) -> DataFrame:
    """S2/S3 rows derived from the range plan's ride-along header JSON
    — ZERO file I/O: the planner already read and parsed every header,
    so the signal-header scan is a projection of the plan (one row per
    file via dropDuplicates on path).  Parity with
    ``scan_signal_headers_ranged`` is pinned in
    tests/test_edf_ranges.py."""
    from processor_edf_spark.sources.edf import signal_header_rows_from_dict

    one_per_file = ranges.select("path", "header_json").dropDuplicates(
        ["path"]
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, hj in zip(pdf["path"], pdf["header_json"]):
                yield signal_header_rows_from_dict(str(p), json.loads(hj))

    return one_per_file.mapInPandas(gen, schema=SIGNAL_HEADERS_SCHEMA)


def file_status_ranged(
    spark: SparkSession, path: str, listing: DataFrame | None = None
) -> DataFrame:
    """The quarantine probe over header-byte range reads only — status
    rows identical to edf.file_status (the probe validates the data
    area from the header + the LISTING length, never the content)."""
    if listing is None:
        listing = edf_listing(spark, path)

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, length in zip(pdf["path"], pdf["length"]):
                p = str(p)
                try:
                    hdr = _header_bytes(p)
                except Exception as e:  # noqa: BLE001 — unreadable file
                    name = p.rsplit("/", 1)[-1]
                    rows.append(
                        (p, name, False, f"{type(e).__name__}: {e}",
                         None, None, int(length))
                    )
                    continue
                rows.append(status_probe(p, hdr, int(length)))
            yield pd.DataFrame(
                rows,
                columns=["path", "file", "ok", "error", "nb_signal",
                         "nb_data_rec", "n_bytes"],
            )

    return listing.mapInPandas(gen, schema=FILE_STATUS_SCHEMA)


def _ranged_matrix_rows(ranges: DataFrame, row_builder, schema) -> DataFrame:
    """Shared shape of the ranged annotation / chunk-run scans: per range
    row, range-read the bytes, rebuild the record matrix, and emit
    ``row_builder(file_name, header, matrix, rec0)`` rows."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if int(row.n_rec) <= 0:  # zero-range metadata row
                    continue
                h = json.loads(str(row.header_json))
                raw = _read_at(str(row.path), int(row.start_byte), int(row.n_bytes))
                rec_len = int(row.rec_bytes) // 2
                nb = len(raw) // int(row.rec_bytes)
                rec = np.frombuffer(
                    raw, dtype="<i2", count=nb * rec_len
                ).reshape(nb, rec_len)
                yield row_builder(
                    str(row.path).rsplit("/", 1)[-1], h, rec, int(row.rec0)
                )

    return ranges.mapInPandas(gen, schema=schema)


def decode_annotations_ranged(ranges: DataFrame) -> DataFrame:
    """S5 over record-aligned ranges: TAL rows identical to
    edf.decode_annotations (global record index via rec0), memory
    bounded by target_bytes."""
    return _ranged_matrix_rows(
        ranges, annotation_rows_from_matrix, ANNOTATIONS_SCHEMA
    )


def decode_chunk_runs_ranged(ranges: DataFrame) -> DataFrame:
    """W1-at-the-source over record-aligned ranges: per-range contiguous
    runs with GLOBAL sample positions.  A run spanning a range boundary
    emits as two adjacent rows here; the pipeline's merge_chunk_runs
    window coalesces them exactly as it already coalesces per-FILE runs
    (their boundary gap is one sampling period, under the 2/rate
    threshold), so channel metadata is identical to the whole-file
    path — pinned in tests/test_edf_ranges.py."""
    return _ranged_matrix_rows(
        ranges, chunk_run_rows_from_matrix, CHUNK_RUNS_SCHEMA
    )
