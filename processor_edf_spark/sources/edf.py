"""EDF / EDF+C / EDF+D source: Spark-native binary ingestion.

European Data Format: a 256-byte fixed-width ASCII global header, then
``256 * nb_signal`` bytes of per-signal headers, then ``nb_data_rec``
interleaved data records of 16-bit little-endian two's-complement samples.

Reference parity (all citations into /root/reference/):
- global header layout      processor/edf_processor/edf.py:34-45
- signal header layout      processor/edf_processor/edf.py:46-55
- sample decode+calibration processor/edf_processor/edf.py:8-18,56-76
- TAL annotation parse      processor/edf_processor/edf.py:65-70
- EDF+D record timestamps   processor/edf_processor/edf.py:105-109
- start datetime Y2K pivot  processor/edf_processor/edf.py:99-103

Spark-first design (NOT a port):
- Ingestion is ``spark.read.format("binaryFile")`` — one row per file, so N
  files decode on N executor cores with zero coordination.  The reference is
  hard-limited to one file per process (main.py:15-16); here the same decode
  scales horizontally to 100 TB of files.
- The decode itself is a ``mapInPandas`` UDTF: binary row in → long-format
  Arrow batches out.  Inside, decoding is one ``np.frombuffer('<i2')`` +
  a reshape per file (fully vectorized) instead of the reference's
  per-sample Python loop with O(n²) ``np.append`` (edf.py:73-76).
- Batches are yielded per signal/record-window so executor memory stays
  bounded regardless of file size (the reference holds the whole decoded
  file in RAM).
- Column pruning is pushed into the decoder via ``wanted_signals`` — the
  UDTF analog of parquet column pruning (SURVEY.md §4).

Known reference bugs intentionally NOT replicated:
- ``data_signal`` is indexed by raw signal index even though annotation
  signals were skipped when building it (edf.py:59-76) — misaligns when an
  annotation signal is not last.  We key by signal index correctly.
- The contiguous-path time step is ``(n-1)/n × (1/rate)`` due to paging
  math (timeseries/base.py:357-369); we synthesize the ideal ``i/rate``
  spacing (within the tests' ±1% tolerance).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_edf_spark.schemas import (
    ANNOTATIONS_SCHEMA,
    SAMPLES_SCHEMA,
    SIGNAL_HEADERS_SCHEMA,
)

USEC = 1_000_000
ANNOTATION_LABEL = "EDF Annotations"

# Samples per Arrow batch emitted by the decode UDTF.  Bounds executor
# memory: 2M rows ≈ 50 MB of Arrow buffers per in-flight batch.
_BATCH_ROWS = 2_000_000


# ---------------------------------------------------------------------------
# Pure-Python/numpy decode kernel (runs inside executors via mapInPandas)
# ---------------------------------------------------------------------------


def _ascii(b: bytes) -> str:
    return b.strip().decode("utf-8", "ignore")


def _fixed_fields(buf: bytes, width: int, n: int) -> list[bytes]:
    """Split ``buf`` into ``n`` fixed-width fields (EDF header convention,
    reference edf.py:46 uses ``re.findall(b'.{1,W}')``)."""
    return re.findall(b".{1,%d}" % width, buf[: width * n])


def parse_edf_header(content: bytes) -> dict:
    """Parse the 256-byte global header + per-signal header arrays.

    Field layout per reference edf.py:34-55 (EDF spec fixed widths).
    """
    h = {
        "version": _ascii(content[0:8]),
        "patient_id": _ascii(content[8:88]),
        "record_id": _ascii(content[88:168]),
        "start_date": _ascii(content[168:176]),
        "start_time": _ascii(content[176:184]),
        "nb_bytes": int(content[184:192]),
        "reserved": _ascii(content[192:236]),
        "nb_data_rec": int(content[236:244]),
        "duration": float(content[244:252]),
        "nb_signal": int(content[252:256]),
    }
    ns = h["nb_signal"]
    p = 256
    sig = content[p : p + 256 * ns]
    off = 0

    def take(width: int, conv):
        nonlocal off
        fields = _fixed_fields(sig[off : off + width * ns], width, ns)
        off += width * ns
        return [conv(f) for f in fields]

    h["labels"] = take(16, _ascii)
    h["transducer"] = take(80, _ascii)
    h["phy_dim"] = take(8, _ascii)
    h["phy_min"] = take(8, float)
    h["phy_max"] = take(8, float)
    h["dig_min"] = take(8, float)
    h["dig_max"] = take(8, float)
    h["prefiltering"] = take(80, _ascii)
    h["nr_samples"] = take(8, int)
    h["reserved_signal"] = take(32, _ascii)
    h["header_bytes"] = 256 + 256 * ns
    h["is_discontiguous"] = h["reserved"] == "EDF+D"
    return h


def edf_start_usec(start_date: str, start_time: str) -> int:
    """EDF 'dd.mm.yy'+'hh.mm.ss' → µs since epoch, Y2K pivot yy<85 → 2000s
    (reference edf.py:99-103; epoch conversion utils.py:55-66, naive UTC)."""
    day, month, year = map(int, start_date.split("."))
    hour, minute, second = map(int, start_time.split("."))
    year = year + 2000 if year < 85 else year + 1900
    dt = datetime(year, month, day, hour, minute, second, tzinfo=timezone.utc)
    return int(dt.timestamp() * USEC)


def _record_matrix(content: bytes, h: dict) -> np.ndarray:
    """All data records as an int16 matrix of shape (nb_data_rec, rec_len).

    One ``np.frombuffer`` for the whole data area — '<i2' natively gives the
    two's-complement semantics the reference reimplements per sample
    (edf.py:8-12 twos_comp of '<H' unpack).
    """
    rec_len = int(sum(h["nr_samples"]))
    nb_rec = h["nb_data_rec"]
    avail = (len(content) - h["header_bytes"]) // (2 * rec_len)
    nb_rec = min(nb_rec, avail)  # tolerate truncated files
    data = np.frombuffer(
        content, dtype="<i2", count=nb_rec * rec_len, offset=h["header_bytes"]
    )
    return data.reshape(nb_rec, rec_len)


def _signal_offsets(nr_samples: list[int]) -> list[int]:
    offs, acc = [], 0
    for n in nr_samples:
        offs.append(acc)
        acc += n
    return offs


def _tal_offsets_from_matrix(rec: np.ndarray, h: dict) -> np.ndarray | None:
    """EDF+D per-record start offsets (seconds) from the first TAL of each
    record's annotation signal (reference edf.py:65-70: the bytes before the
    first ``\\x14\\x14`` parse as a float offset).  Operates on a record
    matrix so both the whole-file and the byte-range decode paths share it
    — each data record carries its own TAL, so a record-aligned range is
    timestamp-self-contained."""
    try:
        ann_idx = h["labels"].index(ANNOTATION_LABEL)
    except ValueError:
        return None
    offs = _signal_offsets(h["nr_samples"])
    a0, n_a = offs[ann_idx], h["nr_samples"][ann_idx]
    out = np.empty(rec.shape[0], dtype=np.float64)
    for r in range(rec.shape[0]):
        segment = rec[r, a0 : a0 + n_a].tobytes()
        head = segment.split(b"\x14\x14")[0]
        try:
            out[r] = float(head)
        except ValueError:
            out[r] = np.nan
    return out


def _tal_record_offsets(content: bytes, h: dict) -> np.ndarray | None:
    return _tal_offsets_from_matrix(_record_matrix(content, h), h)


def _calibration(h: dict, i: int) -> tuple[float, float]:
    """Linear calibration constants for signal i: physical = gain·digital +
    bias.  Algebraically identical to the reference's per-sample
    ``bit_value * (offset + digital)`` (edf.py:14-18) with the constants
    hoisted out of the loop (Catalyst-style constant folding, done here
    because the decode is the one place Python touches samples)."""
    gain = (h["phy_max"][i] - h["phy_min"][i]) / (h["dig_max"][i] - h["dig_min"][i])
    bias = gain * ((h["phy_max"][i] / gain) - h["dig_max"][i])
    return gain, bias


def _signal_timestamps(
    h: dict,
    i: int,
    start_usec: int,
    nb_rec: int,
    rec_offsets_usec: np.ndarray | None,
    rec0: int = 0,
) -> np.ndarray:
    """Timestamps for signal i as an (nb_rec, n_i) int64 matrix — W3
    (contiguous, ideal spacing) or W4 (EDF+D per-record TAL offsets).

    ``rec0`` is the global index of the first record in this block, so a
    record-aligned byte range produces bit-identical timestamps to the
    whole-file decode: the contiguous formula uses the GLOBAL sample index
    ``(rec0·n_i … (rec0+nb_rec)·n_i)``, and the EDF+D path needs no offset
    at all (each record's TAL already carries its absolute offset)."""
    n_i = h["nr_samples"][i]
    if rec_offsets_usec is not None:
        within = np.round(np.arange(n_i) * (h["duration"] * USEC / n_i)).astype(
            np.int64
        )
        return (start_usec + rec_offsets_usec[:nb_rec])[:, None] + within[None, :]
    rate = n_i / h["duration"]
    idx = np.arange(
        rec0 * n_i, (rec0 + nb_rec) * n_i, dtype=np.int64
    ).reshape(nb_rec, n_i)
    return start_usec + np.round(idx * (USEC / rate)).astype(np.int64)


def decode_edf_bytes(
    path: str,
    content: bytes,
    wanted_signals: set[str] | None = None,
) -> Iterator[pd.DataFrame]:
    """Decode one EDF file into long-format sample batches.

    Yields pandas DataFrames with SAMPLES_SCHEMA columns.  Timestamps:
    - contiguous (EDF/EDF+C): t_i = start + round(i·1e6/rate)
      (reference W3, timeseries/base.py:357-372 — ideal spacing, see module
      docstring for the deliberate divergence)
    - discontiguous (EDF+D): per record r with TAL offset o_r:
      t_j = start + round(o_r·1e6 + j·1e6·duration/nr_samples)
      (reference W4, edf.py:105-109, endpoint exclusive)
    """
    h = parse_edf_header(content)
    rec = _record_matrix(content, h)
    file_name = path.rsplit("/", 1)[-1]
    yield from _decode_block(h, rec, 0, file_name, wanted_signals)


def _decode_block(
    h: dict,
    rec: np.ndarray,
    rec0: int,
    file_name: str,
    wanted_signals: set[str] | None = None,
) -> Iterator[pd.DataFrame]:
    """Decode one record-aligned block (``rec`` = int16 matrix of records
    ``rec0 … rec0+len(rec)``) into long-format sample batches.  Shared by
    the whole-file path (rec0=0, all records) and the byte-range path —
    the parity pin in tests/test_edf_ranges.py asserts bit-identical
    output between the two."""
    start_usec = edf_start_usec(h["start_date"], h["start_time"])
    nb_rec = rec.shape[0]
    offs = _signal_offsets(h["nr_samples"])

    rec_offsets_usec = None
    if h["is_discontiguous"]:
        tal = _tal_offsets_from_matrix(rec, h)
        if tal is not None:
            rec_offsets_usec = np.round(tal * USEC).astype(np.int64)

    for i, label in enumerate(h["labels"]):
        if label == ANNOTATION_LABEL:
            continue  # predicate pushed into the scan (reference P1)
        if wanted_signals is not None and label not in wanted_signals:
            continue  # column pruning pushed into the scan
        n_i = h["nr_samples"][i]
        if n_i <= 0 or nb_rec == 0:
            continue
        gain, bias = _calibration(h, i)
        digital = rec[:, offs[i] : offs[i] + n_i]  # (nb_rec, n_i) int16 view
        t_all = _signal_timestamps(
            h, i, start_usec, nb_rec, rec_offsets_usec, rec0
        )
        values = gain * digital.astype(np.float64) + bias

        rows_per_batch = max(1, _BATCH_ROWS // n_i)
        # Constant string columns go out dictionary-encoded (categorical
        # → Arrow DictionaryArray): one string + an int8 code vector
        # instead of n_rows Python objects — 4× end-to-end decode
        # throughput at the Arrow/JVM boundary.  The dtypes are built
        # ONCE per signal: CategoricalDtype construction + category
        # validation was ~half the whole decode kernel when rebuilt per
        # batch (profiled on the range-decode path).
        file_dt = pd.CategoricalDtype([file_name])
        chan_dt = pd.CategoricalDtype([label])
        for r0 in range(0, nb_rec, rows_per_batch):
            r1 = min(nb_rec, r0 + rows_per_batch)
            n_rows = (r1 - r0) * n_i
            codes = np.zeros(n_rows, dtype=np.int8)
            yield pd.DataFrame(
                {
                    "file": pd.Categorical.from_codes(codes, dtype=file_dt),
                    "channel": pd.Categorical.from_codes(codes, dtype=chan_dt),
                    "t_usec": t_all[r0:r1].ravel(),
                    "value": values[r0:r1].ravel(),
                }
            )


def chunk_run_rows(path: str, content: bytes) -> pd.DataFrame:
    """Per-signal contiguous runs (W1 pushed into the scan): one row per
    gap-free run — ``(file, channel, index, start, end, n_samples, rate)``.

    Gap detection is inherently file-local (the decoder already holds the
    whole timestamp axis), so computing it here — one ``np.diff`` per
    signal — emits O(chunks) rows instead of shuffling O(samples) rows
    through a per-channel window.  This is the aggregate-pushdown analog
    of the reference's in-process ``discontinuous_chunks``
    (timeseries/base.py:322-342), and the reason the channel-metadata plan
    never moves sample rows at all.
    """
    h = parse_edf_header(content)
    return chunk_run_rows_from_matrix(
        path.rsplit("/", 1)[-1], h, _record_matrix(content, h), 0
    )


def chunk_run_rows_from_matrix(
    file_name: str, h: dict, rec: np.ndarray, rec0: int
) -> pd.DataFrame:
    """Run detection over one record-aligned block (records
    ``rec0 … rec0+len(rec)``) — shared by the whole-file path (rec0=0,
    all records) and the byte-range path.  ``index`` is the run start's
    GLOBAL position in the channel's sample array (``rec0·n_i + local``),
    so per-range runs merge downstream exactly like per-file runs do
    (merge_chunk_runs coalesces range-adjacent runs; the boundary gap of
    two contiguous ranges is one sampling period, under the 2/rate
    threshold)."""
    start_usec = edf_start_usec(h["start_date"], h["start_time"])
    nb_rec = rec.shape[0]

    rec_offsets_usec = None
    if h["is_discontiguous"]:
        tal = _tal_offsets_from_matrix(rec, h)
        if tal is not None:
            rec_offsets_usec = np.round(tal * USEC).astype(np.int64)

    cols = {"file": [], "channel": [], "index": [], "start": [], "end": [], "n_samples": [], "rate": []}
    for i, label in enumerate(h["labels"]):
        n_i = h["nr_samples"][i]
        if label == ANNOTATION_LABEL or n_i <= 0 or nb_rec == 0:
            continue
        rate = n_i / h["duration"]
        flat = _signal_timestamps(
            h, i, start_usec, nb_rec, rec_offsets_usec, rec0
        ).ravel()
        gap = 2.0 * USEC / rate  # reference base.py:330
        bidx = np.where(np.diff(flat) > gap)[0] + 1
        starts = np.concatenate([[0], bidx])
        ends = np.concatenate([bidx, [len(flat)]])
        for s, e in zip(starts, ends):
            cols["file"].append(file_name)
            cols["channel"].append(label)
            cols["index"].append(int(rec0 * n_i + s))
            cols["start"].append(int(flat[s]))
            cols["end"].append(int(flat[e - 1]))
            cols["n_samples"].append(int(e - s))
            cols["rate"].append(rate)
    return pd.DataFrame(cols)


def signal_header_rows(path: str, content: bytes) -> pd.DataFrame:
    """One metadata row per signal (reference S2+S3)."""
    return signal_header_rows_from_dict(path, parse_edf_header(content))


def signal_header_rows_from_dict(path: str, h: dict) -> pd.DataFrame:
    """S2+S3 rows from an already-parsed header dict — lets the ranged
    pipeline derive signal headers from the range plan's ride-along
    JSON instead of re-reading header bytes per file."""
    start_usec = edf_start_usec(h["start_date"], h["start_time"])
    file_name = path.rsplit("/", 1)[-1]
    n = h["nb_signal"]
    return pd.DataFrame(
        {
            "file": [file_name] * n,
            "signal_idx": np.arange(n, dtype=np.int32),
            "label": h["labels"],
            "transducer": h["transducer"],
            "phy_dim": h["phy_dim"],
            "phy_min": h["phy_min"],
            "phy_max": h["phy_max"],
            "dig_min": h["dig_min"],
            "dig_max": h["dig_max"],
            "prefiltering": h["prefiltering"],
            "nr_samples": np.array(h["nr_samples"], dtype=np.int32),
            "rate": [ns / h["duration"] for ns in h["nr_samples"]],
            "n_total_samples": np.array(
                [ns * h["nb_data_rec"] for ns in h["nr_samples"]], dtype=np.int64
            ),
            "is_annotation": [lbl == ANNOTATION_LABEL for lbl in h["labels"]],
            "file_start_usec": np.int64(start_usec),
            "nb_data_rec": np.int32(h["nb_data_rec"]),
            "record_duration_sec": h["duration"],
            "is_discontiguous": h["is_discontiguous"],
        }
    )


def annotation_rows(path: str, content: bytes) -> pd.DataFrame:
    """Raw TAL segments per record (reference S5, edf.py:65-70)."""
    h = parse_edf_header(content)
    return annotation_rows_from_matrix(
        path.rsplit("/", 1)[-1], h, _record_matrix(content, h), 0
    )


def annotation_rows_from_matrix(
    file_name: str, h: dict, rec: np.ndarray, rec0: int
) -> pd.DataFrame:
    """TAL segments for one record-aligned block; ``record`` carries the
    GLOBAL record index (``rec0 + local``), so per-range annotation rows
    are identical to the whole-file rows (range parity pinned in
    tests/test_edf_ranges.py)."""
    cols = {"file": [], "record": [], "offset_sec": [], "raw": []}
    try:
        ann_idx = h["labels"].index(ANNOTATION_LABEL)
    except ValueError:
        return pd.DataFrame(cols)
    offs = _signal_offsets(h["nr_samples"])
    a0, n_a = offs[ann_idx], h["nr_samples"][ann_idx]
    for r in range(rec.shape[0]):
        segment = rec[r, a0 : a0 + n_a].tobytes()
        head = segment.split(b"\x14\x14")[0]
        try:
            offset = float(head)
        except ValueError:
            offset = None
        cols["file"].append(file_name)
        cols["record"].append(rec0 + r)
        cols["offset_sec"].append(offset)
        cols["raw"].append(segment)
    return pd.DataFrame(cols)


# ---------------------------------------------------------------------------
# Spark-facing API
# ---------------------------------------------------------------------------


def scan_edf_files(spark: SparkSession, path: str) -> DataFrame:
    """Distributed EDF file scan (reference S1, main.py:7-16 — minus the
    one-file limit).  Extension predicate is pushed to the file listing."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[eE][dD][fF]")
        .load(path)
    )


FILE_STATUS_SCHEMA = (
    "path string, file string, ok boolean, error string, "
    "nb_signal int, nb_data_rec int, n_bytes long"
)


def status_probe(path: str, header_content: bytes, n_bytes: int) -> tuple:
    """One file's structural probe: header validation + data-area
    consistency from the header and the FILE LENGTH alone — so the
    whole-file path (header_content = full content) and the byte-range
    path (header_content = the 256+256·ns header bytes) produce
    identical status rows."""
    name = path.rsplit("/", 1)[-1]
    try:
        h = parse_edf_header(header_content)
        if h["nb_signal"] <= 0:
            raise ValueError("no signals")
        if h["duration"] <= 0:
            raise ValueError(f"non-positive record duration {h['duration']}")
        edf_start_usec(h["start_date"], h["start_time"])  # validates dates
        rec_len = int(sum(h["nr_samples"]))
        if rec_len <= 0:
            raise ValueError("empty data records")
        avail = (n_bytes - h["header_bytes"]) // (2 * rec_len)
        return (path, name, True, None, h["nb_signal"], min(h["nb_data_rec"], avail), n_bytes)
    except Exception as e:  # noqa: BLE001 — any parse failure quarantines
        return (path, name, False, f"{type(e).__name__}: {e}", None, None, n_bytes)


def file_status(binary_df: DataFrame) -> DataFrame:
    """Per-file decode status (SURVEY.md §2.10): validate header structure
    and data-area consistency WITHOUT decoding samples.

    The reference swallows decode errors and publishes partial output
    (processor.py:66-69); the Spark design is the opposite — fail fast per
    FILE, never per job: corrupt files surface here as ``ok=false`` rows
    (PERMISSIVE-style status column) and the pipeline quarantines them,
    while every healthy file still processes.  At 100 TB a single bad file
    must never kill the run.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                status_probe(path, bytes(content), len(content))
                for path, content in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["path", "file", "ok", "error", "nb_signal", "nb_data_rec", "n_bytes"],
            )

    return binary_df.select("path", "content").mapInPandas(
        gen, schema=FILE_STATUS_SCHEMA
    )


def parse_signal_headers(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → signal-header dimension table (S2/S3)."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield signal_header_rows(path, bytes(content))

    return binary_df.select("path", "content").mapInPandas(
        gen, schema=SIGNAL_HEADERS_SCHEMA
    )


def decode_samples(
    binary_df: DataFrame, wanted_signals: set[str] | None = None
) -> DataFrame:
    """binaryFile rows → long-format samples (S4 + W3/W4 + P1/P3/P4).

    The returned plan is a narrow map over file rows — no shuffle; each file
    decodes independently on its executor.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield from decode_edf_bytes(path, bytes(content), wanted_signals)

    return binary_df.select("path", "content").mapInPandas(gen, schema=SAMPLES_SCHEMA)


CHUNK_RUNS_SCHEMA = (
    "file string, channel string, index long, start long, end long, "
    "n_samples long, rate double"
)


def decode_chunk_runs(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → per-(file, signal) contiguous-run table (W1 at
    the source; O(chunks) rows, no sample movement)."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield chunk_run_rows(path, bytes(content))

    return binary_df.select("path", "content").mapInPandas(
        gen, schema=CHUNK_RUNS_SCHEMA
    )


def decode_annotations(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → annotations table (S5)."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield annotation_rows(path, bytes(content))

    return binary_df.select("path", "content").mapInPandas(
        gen, schema=ANNOTATIONS_SCHEMA
    )


def parse_tal_annotations(annotations: DataFrame) -> DataFrame:
    """Full EDF+ TAL parse — the reference collects raw TAL segments but
    never publishes them (edf.py:117-118; extension point per SURVEY.md
    §2.8).  Parses every Timestamped Annotation List in the raw bytes:
    ``+onset[\\x15duration]\\x14text1\\x14text2…\\x14\\x00`` → one row per
    (TAL, text): file, record, onset_sec, duration_sec, text.

    Entirely declarative: split/explode/regexp column expressions (TAL
    payloads are ASCII), so it's codegen'd and runs wherever the
    annotations DataFrame lives — no extra Python pass over the bytes.
    Record-start TALs (empty text) are excluded; they surface via
    ``offset_sec`` on the annotations table instead.
    """
    tals = annotations.select(
        "file",
        "record",
        F.posexplode(F.split(F.col("raw").cast("string"), "\x00")).alias(
            "tal_idx", "tal"
        ),
    ).filter(F.col("tal") != "")
    onset = F.regexp_extract("tal", r"^([+-][0-9.]+)", 1).cast("double")
    duration = F.regexp_extract("tal", "\x15([0-9.]+)", 1)
    texts = F.split(F.regexp_replace("tal", "^[^\x14]*\x14", ""), "\x14")
    return (
        tals.select(
            "file",
            "record",
            "tal_idx",
            onset.alias("onset_sec"),
            F.when(duration != "", duration.cast("double")).alias("duration_sec"),
            F.explode(texts).alias("text"),
        )
        .filter(F.col("text") != "")
    )


def with_timestamp_view(samples: DataFrame) -> DataFrame:
    """Add a TimestampType view of t_usec (canonical stays int64 µs)."""
    return samples.withColumn("ts", F.timestamp_micros("t_usec"))
