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
