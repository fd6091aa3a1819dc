"""Equivalence properties for the two-level chunk plan: the optimized
paths (decoder-pushed runs + cross-unit merge; hierarchical per-unit
windows) must produce EXACTLY the chunks of the naive single window over
all samples — on randomized gap patterns, not just fixtures."""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from processor_edf_spark.operators.sessionize import (
    contiguous_chunks,
    hierarchical_chunks,
)
from processor_edf_spark.pipeline import process_edf_directory
from processor_edf_spark.sources.edf import decode_samples, scan_edf_files
from tests.edf_fixtures import sine, write_edf

USEC = 1_000_000


def _random_series(seed: int) -> list[tuple[str, str, int, float]]:
    """One channel's timestamps with random gaps, split into 'units'
    (files) at random non-interleaved boundaries."""
    rng = np.random.default_rng(seed)
    rate = 100.0
    period = int(USEC / rate)
    gap = int(2 * USEC / rate)
    t, ts = 0, []
    for _ in range(rng.integers(50, 300)):
        ts.append(t)
        # mostly regular steps, occasional gap bursts
        t += period if rng.random() > 0.07 else gap + int(rng.integers(1, 5 * USEC))
    cuts = sorted(rng.choice(len(ts), size=min(3, len(ts) - 1), replace=False))
    rows, unit, ci = [], 0, 0
    for i, tv in enumerate(ts):
        while ci < len(cuts) and i >= cuts[ci]:
            unit, ci = unit + 1, ci + 1
        rows.append((f"u{unit}", "ch", int(tv), rate))
    return rows


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_hierarchical_equals_flat(spark, seed):
    rows = _random_series(seed)
    df = spark.createDataFrame(
        rows, "unit string, id string, t_usec long, rate double"
    )
    flat = {
        (r["index"], r["start"], r["end"], r["n_samples"])
        for r in contiguous_chunks(df, keys=["id"], rate_col="rate").collect()
    }
    hier = {
        (r["index"], r["start"], r["end"], r["n_samples"])
        for r in hierarchical_chunks(
            df, id_col="id", unit_col="unit", rate_col="rate"
        ).collect()
    }
    assert flat == hier


def test_decoder_runs_equal_sample_window(spark, tmp_path):
    """The decoder's pushed-down chunk runs, after the cross-file merge in
    build_channel_metadata, must equal gap detection computed the naive
    way on the decoded samples themselves (EDF+D fixture with gaps)."""
    offsets = [0.0, 1.0, 5.0, 6.0, 30.0, 31.0, 32.0]
    write_edf(
        str(tmp_path / "gaps.edf"),
        signals=[{"label": "chanA", "rate": 100, "gen": sine(4.0)}],
        nb_data_rec=len(offsets),
        variant="EDF+D",
        record_offsets_sec=offsets,
    )
    samples, channels, _ = process_edf_directory(spark, str(tmp_path))

    naive = contiguous_chunks(
        decode_samples(scan_edf_files(spark, str(tmp_path))).withColumn(
            "rate", F.lit(100.0)
        ),
        keys=["file", "channel"],
        rate_col="rate",
    )
    naive_chunks = [
        (r["index"], r["start"], r["end"])
        for r in naive.orderBy("start").collect()
    ]
    meta_chunks = [
        (c["index"], c["start"], c["end"])
        for c in channels.collect()[0]["contiguousChunks"]
    ]
    assert meta_chunks == naive_chunks
    assert len(meta_chunks) == 3  # gaps at 1→5 s and 6→30 s
