"""Record-aligned byte-range EDF decode (sources/edf_ranges.py).

The contract: for ANY record-aligned split of a file, the ranged decode
is bit-identical to the whole-file decode — same rows, same int64
timestamps, same float64 values.  Reference semantics under test:
processor/edf_processor/edf.py:56-76 (whole-file sample decode, which
the whole-file path already parity-pins against goldens).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from processor_edf_spark.sources.edf import decode_samples, scan_edf_files
from processor_edf_spark.sources.edf_ranges import (
    decode_samples_from_ranges,
    decode_samples_ranged,
    plan_edf_ranges,
)
from tests.edf_fixtures import sine, write_edf, write_edf_fast


def _collect_sorted(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(["file", "channel", "t_usec"])
        .reset_index(drop=True)
        .astype({"file": str, "channel": str})
    )


def _assert_bit_identical(a, b) -> None:
    pa, pb = _collect_sorted(a), _collect_sorted(b)
    assert len(pa) == len(pb)
    assert list(pa["file"]) == list(pb["file"])
    assert list(pa["channel"]) == list(pb["channel"])
    assert (pa["t_usec"].to_numpy() == pb["t_usec"].to_numpy()).all()
    # bit-equal, not approx: both paths run the same kernel
    av, bv = pa["value"].to_numpy(), pb["value"].to_numpy()
    assert (av.view(np.int64) == bv.view(np.int64)).all()


@pytest.fixture(scope="module")
def edfc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edfc")
    write_edf(
        str(d / "a.edf"),
        signals=[
            {"label": "EEG F1", "unit": "uV", "rate": 200, "gen": sine(3.0)},
            {"label": "EMG c2", "unit": "uV", "rate": 57, "gen": sine(7.5)},
        ],
        nb_data_rec=240,
    )
    write_edf_fast(str(d / "b.edf"), n_signals=4, rate=128, nb_rec=300)
    return str(d)


@pytest.fixture(scope="module")
def edfd_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edfd")
    write_edf_fast(
        str(d / "d.edf"),
        n_signals=3,
        rate=64,
        nb_rec=200,
        variant="EDF+D",
        gap_every=37,
        gap_sec=12.5,
    )
    return str(d)


def test_range_plan_is_record_aligned(spark, edfc_dir):
    rows = plan_edf_ranges(spark, edfc_dir, target_bytes=32 * 1024).collect()
    assert len(rows) >= 8  # small target forces intra-file splits
    by_path: dict[str, list] = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    for path, rs in by_path.items():
        rs.sort(key=lambda r: r.rec0)
        assert rs[0].rec0 == 0
        for prev, nxt in zip(rs, rs[1:]):
            assert prev.rec0 + prev.n_rec == nxt.rec0  # no gap, no overlap
            assert prev.n_bytes == prev.n_rec * prev.rec_bytes
            assert nxt.start_byte == prev.start_byte + prev.n_bytes


def test_ranged_decode_parity_edfc(spark, edfc_dir):
    whole = decode_samples(scan_edf_files(spark, edfc_dir))
    ranged = decode_samples_ranged(spark, edfc_dir, target_bytes=32 * 1024)
    _assert_bit_identical(whole, ranged)


def test_ranged_decode_parity_edfd(spark, edfd_dir):
    whole = decode_samples(scan_edf_files(spark, edfd_dir))
    ranged = decode_samples_ranged(spark, edfd_dir, target_bytes=16 * 1024)
    _assert_bit_identical(whole, ranged)


def test_ranged_decode_spreads_across_tasks(spark, edfc_dir):
    ranges = plan_edf_ranges(spark, edfc_dir, target_bytes=32 * 1024)
    n_ranges = ranges.count()
    assert n_ranges >= 8
    decoded = decode_samples_from_ranges(ranges).withColumn(
        "pid", F.spark_partition_id()
    )
    n_tasks = decoded.select("pid").distinct().count()
    # one file's records decode in MANY tasks, not one straggler
    assert n_tasks >= min(8, n_ranges)


def test_planner_executes_once_per_file(spark, edfc_dir):
    """The r12 single-execution pin: plan + default-task-count decode
    performs EXACTLY one header read per file.  The r11 shape ran the
    uncached planner lineage twice (once for the sizing count, again
    for the decode job) — 2x small-read storms on an object store at a
    million-file listing; decode_samples_from_ranges now persists the
    O(ranges) metadata rows around the count so the decode job reads
    the cache instead of re-opening every header."""
    acc = spark.sparkContext.accumulator(0)
    ranges = plan_edf_ranges(
        spark, edfc_dir, target_bytes=32 * 1024, header_reads_acc=acc
    )
    decoded = decode_samples_from_ranges(ranges)
    assert decoded.count() > 0
    assert acc.value == 2  # two files in the fixture dir, one read each


def test_ranged_decode_single_range_per_file(spark, edfc_dir):
    # big target → one range per file → still exact
    ranges = plan_edf_ranges(spark, edfc_dir)
    assert ranges.count() == 2
    _assert_bit_identical(
        decode_samples(scan_edf_files(spark, edfc_dir)),
        decode_samples_from_ranges(ranges),
    )


def test_ranged_decode_wanted_signals_pruning(spark, edfc_dir):
    whole = decode_samples(scan_edf_files(spark, edfc_dir), {"EEG F1"})
    ranged = decode_samples_ranged(
        spark, edfc_dir, target_bytes=32 * 1024, wanted_signals={"EEG F1"}
    )
    assert ranged.select("channel").distinct().collect()[0][0] == "EEG F1"
    _assert_bit_identical(whole, ranged)


def test_ranged_decode_truncated_file(spark, tmp_path):
    d = tmp_path / "trunc"
    d.mkdir()
    p = d / "t.edf"
    write_edf(
        str(p),
        signals=[{"label": "s0", "unit": "uV", "rate": 100, "gen": sine(2.0)}],
        nb_data_rec=50,
    )
    raw = p.read_bytes()
    p.write_bytes(raw[: len(raw) - 75])  # chop mid-record
    whole = decode_samples(scan_edf_files(spark, str(d)))
    ranged = decode_samples_ranged(spark, str(d), target_bytes=2 * 1024)
    assert ranged.count() == 49 * 100  # only complete records decode
    _assert_bit_identical(whole, ranged)


def test_pipeline_ranged_samples_parity(spark, edfc_dir):
    from processor_edf_spark.pipeline import process_edf_directory

    whole, ch_a, _ = process_edf_directory(spark, edfc_dir)
    ranged, ch_b, _ = process_edf_directory(
        spark, edfc_dir, samples_target_bytes=32 * 1024
    )
    _assert_bit_identical(whole, ranged)
    # metadata path unchanged by the sample-source switch
    assert ch_a.count() == ch_b.count()


def test_pipeline_ranged_quarantine_skips_corrupt(spark, tmp_path):
    from processor_edf_spark.pipeline import process_edf_directory

    d = tmp_path / "q"
    d.mkdir()
    write_edf(
        str(d / "good.edf"),
        signals=[{"label": "s0", "unit": "uV", "rate": 100, "gen": sine(2.0)}],
        nb_data_rec=30,
    )
    (d / "bad.edf").write_bytes(b"not an edf at all" * 40)
    samples, channels, _ = process_edf_directory(
        spark, str(d), quarantine=True, samples_target_bytes=2 * 1024
    )
    assert samples.count() == 30 * 100  # the good file, fully decoded
    assert samples.select("file").distinct().collect()[0][0] == "good.edf"


def test_arrow_range_read_matches_local(tmp_path):
    """The pyarrow.fs branch of the range reader returns the same bytes
    as the plain-open fast path (driven through a file:// URI — the
    scheme production short-circuits, exercised here directly)."""
    from processor_edf_spark.sources.edf_ranges import (
        _read_at,
        _read_at_arrow,
    )

    p = tmp_path / "r.bin"
    p.write_bytes(bytes(range(256)) * 4)
    uri = p.as_uri()  # file:///...
    for off, n in ((0, 16), (100, 57), (1000, 24), (1020, 10)):
        assert _read_at_arrow(uri, off, n) == _read_at(str(p), off, n)


# ---------------------------------------------------------------------------
# r12: ranged METADATA twins — the pipeline's >2 GB cap removal must
# hold at EVERY stage, not just samples
# ---------------------------------------------------------------------------


def _sorted_pdf(df, keys):
    return (
        df.toPandas().sort_values(keys).reset_index(drop=True)
    )


def test_ranged_annotations_parity(spark, edfc_dir, edfd_dir):
    from processor_edf_spark.sources.edf import (
        decode_annotations,
        scan_edf_files,
    )
    from processor_edf_spark.sources.edf_ranges import (
        decode_annotations_ranged,
    )

    for d, tb in ((edfc_dir, 32 * 1024), (edfd_dir, 16 * 1024)):
        whole = _sorted_pdf(
            decode_annotations(scan_edf_files(spark, d)), ["file", "record"]
        )
        ranged = _sorted_pdf(
            decode_annotations_ranged(plan_edf_ranges(spark, d, target_bytes=tb)),
            ["file", "record"],
        )
        assert list(whole["file"]) == list(ranged["file"])
        assert list(whole["record"]) == list(ranged["record"])
        assert list(whole["raw"]) == list(ranged["raw"])
        wa = whole["offset_sec"].to_numpy()
        ra = ranged["offset_sec"].to_numpy()
        assert ((wa == ra) | (np.isnan(wa) & np.isnan(ra))).all()


def test_ranged_headers_parity(spark, edfc_dir):
    from processor_edf_spark.sources.edf import (
        parse_signal_headers,
        scan_edf_files,
    )
    from processor_edf_spark.sources.edf_ranges import (
        scan_signal_headers_ranged,
    )

    keys = ["file", "signal_idx"]
    whole = _sorted_pdf(
        parse_signal_headers(scan_edf_files(spark, edfc_dir)), keys
    )
    ranged = _sorted_pdf(scan_signal_headers_ranged(spark, edfc_dir), keys)
    pd.testing.assert_frame_equal(whole, ranged)


def test_ranged_file_status_parity(spark, tmp_path):
    from processor_edf_spark.sources.edf import file_status, scan_edf_files
    from processor_edf_spark.sources.edf_ranges import file_status_ranged

    d = tmp_path / "status"
    d.mkdir()
    write_edf(
        str(d / "good.edf"),
        signals=[{"label": "s0", "unit": "uV", "rate": 64, "gen": sine(1.0)}],
        nb_data_rec=20,
    )
    (d / "bad.edf").write_bytes(b"garbage bytes, not a header" * 30)
    keys = ["file"]
    whole = _sorted_pdf(file_status(scan_edf_files(spark, str(d))), keys)
    ranged = _sorted_pdf(file_status_ranged(spark, str(d)), keys)
    assert list(whole["ok"]) == list(ranged["ok"])
    assert list(whole["nb_signal"].fillna(-1)) == list(
        ranged["nb_signal"].fillna(-1)
    )
    assert list(whole["nb_data_rec"].fillna(-1)) == list(
        ranged["nb_data_rec"].fillna(-1)
    )
    assert list(whole["n_bytes"]) == list(ranged["n_bytes"])


def test_ranged_chunk_runs_merge_to_whole_file_runs(spark, edfd_dir):
    """Per-range runs + the pipeline's merge window == whole-file runs:
    range boundaries add NO spurious chunk boundaries (contiguous
    ranges coalesce), and real EDF+D gaps survive."""
    from processor_edf_spark.operators.sessionize import merge_chunk_runs
    from processor_edf_spark.sources.edf import (
        decode_chunk_runs,
        scan_edf_files,
    )
    from processor_edf_spark.sources.edf_ranges import (
        decode_chunk_runs_ranged,
    )

    whole = decode_chunk_runs(scan_edf_files(spark, edfd_dir))
    ranged = decode_chunk_runs_ranged(
        plan_edf_ranges(spark, edfd_dir, target_bytes=16 * 1024)
    )
    key = F.concat_ws("\x1f", "file", "channel")
    merged = merge_chunk_runs(
        ranged.withColumn("k", key), id_col="k", rate_col="rate"
    )
    base = merge_chunk_runs(
        whole.withColumn("k", key), id_col="k", rate_col="rate"
    )
    a = _sorted_pdf(base, ["k", "start"])
    b = _sorted_pdf(merged, ["k", "start"])
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_ranged_full_metadata_parity(spark, edfc_dir, edfd_dir):
    """channels + annotations from the all-ranged pipeline are identical
    to the whole-file pipeline (the r12 ADVICE fix: >2 GB recordings no
    longer hit binaryFile content at ANY stage)."""
    from processor_edf_spark.pipeline import channel_dicts, process_edf_directory

    for d in (edfc_dir, edfd_dir):
        s_a, ch_a, an_a = process_edf_directory(spark, d)
        s_b, ch_b, an_b = process_edf_directory(
            spark, d, samples_target_bytes=16 * 1024
        )
        da = sorted(channel_dicts(ch_a), key=lambda c: (c["name"],))
        db = sorted(channel_dicts(ch_b), key=lambda c: (c["name"],))
        for x in da + db:
            x.pop("id", None)  # ids are registry-assigned, run-local
        assert da == db
        assert an_a.count() == an_b.count()
        _assert_bit_identical(s_a, s_b)


def test_pipeline_ranged_quarantine_uses_header_probe(spark, tmp_path):
    from processor_edf_spark.pipeline import process_edf_directory

    d = tmp_path / "q2"
    d.mkdir()
    # EDF+D so the good file carries a TAL annotation channel
    write_edf_fast(
        str(d / "good.edf"), n_signals=1, rate=100, nb_rec=30,
        variant="EDF+D", gap_every=11, gap_sec=2.0,
    )
    (d / "bad.edf").write_bytes(b"\x00" * 600)
    samples, channels, annotations = process_edf_directory(
        spark, str(d), quarantine=True, samples_target_bytes=2 * 1024
    )
    assert samples.count() == 30 * 100
    # the ranged annotation scan sees only the quarantine survivors
    assert annotations.select("file").distinct().count() == 1


# ---------------------------------------------------------------------------
# r12: property-based planner fuzz — for ANY header geometry and
# truncation point, ranged decode == whole-file decode bit-for-bit
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    n_signals=st.integers(min_value=1, max_value=5),
    rate=st.sampled_from([16, 57, 100, 128]),
    nb_rec=st.integers(min_value=1, max_value=40),
    variant=st.sampled_from(["EDF+C", "EDF+D"]),
    target=st.sampled_from([256, 1024, 4096, 1 << 20]),
    chop=st.integers(min_value=0, max_value=300),
)
def test_planner_fuzz_ranged_equals_whole(
    spark, tmp_path_factory, n_signals, rate, nb_rec, variant, target, chop
):
    """Random header geometry (signal counts, record sizes, EDF+C/+D),
    random split target, random truncation: the record-aligned plan must
    decode bit-identically to the whole-file path (today's parity tests
    use fixed fixtures; this pins the planner ARITHMETIC itself —
    ranges_from_header record math, rec0 timestamp propagation, TAL
    self-containment, truncation tolerance)."""
    d = tmp_path_factory.mktemp("fuzz")
    path = str(d / "f.edf")
    write_edf_fast(
        path,
        n_signals=n_signals,
        rate=rate,
        nb_rec=nb_rec,
        variant=variant,
        gap_every=7 if variant == "EDF+D" else 0,
        gap_sec=3.5,
    )
    if chop:
        raw = open(path, "rb").read()
        keep = max(256 + 256 * (n_signals + 1), len(raw) - chop)
        open(path, "wb").write(raw[:keep])
    whole = decode_samples(scan_edf_files(spark, str(d)))
    ranged = decode_samples_ranged(spark, str(d), target_bytes=target)
    _assert_bit_identical(whole, ranged)


def test_signal_headers_from_plan_parity(spark):
    """Headers derived from the plan's ride-along JSON must equal the
    header-read scan row-for-row (incl. the free-text fields that now
    ride in the JSON) — the ranged pipeline issues ONE header read per
    file for everything."""
    from processor_edf_spark.sources.edf_ranges import (
        plan_edf_ranges,
        scan_signal_headers_ranged,
        signal_headers_from_plan,
    )

    src = "/root/reference/sample_data"
    ranges = plan_edf_ranges(spark, src, target_bytes=64 * 1024)
    via_plan = signal_headers_from_plan(ranges)
    via_read = scan_signal_headers_ranged(spark, src)
    cols = via_read.columns
    a = sorted(map(tuple, via_plan.select(cols).collect()))
    b = sorted(map(tuple, via_read.select(cols).collect()))
    assert a == b and len(a) > 0


def test_zero_record_files_keep_headers_and_channels(spark, tmp_path):
    """Files with a parseable header but NO decodable records — declared
    nb_data_rec = 0, or truncated below one record — must not vanish
    from the ranged pipeline's metadata stages (ADVICE r12: the plan
    returned no rows for them, so signal_headers_from_plan lost their
    signal-header/channel rows while the whole-file path kept them).
    The planner now emits a zero-range metadata row; decoders skip it,
    projections keep it — ranged output equals whole-file output on a
    mixed directory."""
    from processor_edf_spark.pipeline import process_edf_directory
    from processor_edf_spark.sources.edf import parse_signal_headers
    from processor_edf_spark.sources.edf_ranges import (
        scan_signal_headers_ranged,
        signal_headers_from_plan,
    )

    d = tmp_path / "zr"
    d.mkdir()
    write_edf_fast(str(d / "normal.edf"), n_signals=2, rate=64, nb_rec=20)
    # truncated below one record: header only
    write_edf_fast(str(d / "trunc.edf"), n_signals=3, rate=32, nb_rec=5)
    raw = (d / "trunc.edf").read_bytes()
    hdr_bytes = 256 + 256 * 4  # 3 signals + EDF Annotations channel
    (d / "trunc.edf").write_bytes(raw[:hdr_bytes])
    # declared zero records: patch nb_data_rec (bytes 236:244) to 0
    write_edf_fast(str(d / "zero.edf"), n_signals=2, rate=16, nb_rec=3)
    raw = bytearray((d / "zero.edf").read_bytes())
    raw[236:244] = b"0".ljust(8)
    (d / "zero.edf").write_bytes(bytes(raw))

    # header parity: plan-derived == header-read scan == whole-file
    ranges = plan_edf_ranges(spark, str(d), target_bytes=4096)
    cols = ["file", "signal_idx", "label", "rate"]
    via_plan = sorted(map(tuple, signal_headers_from_plan(ranges).select(cols).collect()))
    via_read = sorted(map(tuple, scan_signal_headers_ranged(spark, str(d)).select(cols).collect()))
    whole_hdr = sorted(map(tuple, parse_signal_headers(
        scan_edf_files(spark, str(d))).select(cols).collect()))
    assert via_plan == via_read == whole_hdr
    assert {t[0] for t in via_plan} == {"normal.edf", "trunc.edf", "zero.edf"}

    # full-pipeline parity: channels AND samples identical across paths
    s_w, c_w, _ = process_edf_directory(spark, str(d))
    s_r, c_r, _ = process_edf_directory(
        spark, str(d), samples_target_bytes=4096
    )
    ccols = sorted(set(c_w.columns) & set(c_r.columns))
    assert sorted(map(tuple, c_w.select(ccols).collect())) == sorted(
        map(tuple, c_r.select(ccols).collect())
    )
    _assert_bit_identical(s_w, s_r)
