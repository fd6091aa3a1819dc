"""Independent-reference parity for the smoothing queries: the DuckDB
oracle proves Spark and DuckDB agree, but both run the SQL I wrote —
pandas' own ewm/rolling implementations are a third, independently
authored reference, so agreement here rules out "both engines wrong the
same way".

Series are kept ≤ EWMA_WINDOW long so the query's documented
truncation is inert and pandas ``ewm(adjust=False)`` computes the
identical recursion.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

from processor_edf_spark.plans import QUERIES
from processor_edf_spark.plans.analytics_extra import (
    EWMA_ALPHA,
    EWMA_WINDOW,
    MEDIAN_WINDOW,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write_events(spark, tmp_path, seed: int) -> tuple[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 1, 1)
    for uid in range(1, 1 + int(rng.integers(2, 5))):
        n = int(rng.integers(1, EWMA_WINDOW + 1))  # ≤ window: no truncation
        for i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    t0 + datetime.timedelta(seconds=eid * 37),
                    uid,
                    "click",
                    float(np.round(rng.uniform(-1000, 1000), 3)),
                    "{}",
                )
            )
    sf_dir = str(tmp_path / f"sf_{seed}")
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    return sf_dir, pdf


@pytest.mark.parametrize("seed", [7, 77, 777])
def test_ewma_matches_pandas_ewm(spark, tmp_path, seed):
    sf_dir, pdf = _write_events(spark, tmp_path, seed)
    got = {
        r["event_id"]: r["ewma"]
        for r in QUERIES["ewma_user_values"](spark, sf_dir).collect()
    }
    want = (
        pdf.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=False).mean())
    )
    for eid, expect in zip(pdf["event_id"], want):
        assert got[int(eid)] == pytest.approx(expect, rel=1e-12), eid


@pytest.mark.parametrize("seed", [11, 1111])
def test_rolling_median_matches_pandas(spark, tmp_path, seed):
    sf_dir, pdf = _write_events(spark, tmp_path, seed)
    got = {
        r["event_id"]: r["rolling_median"]
        for r in QUERIES["rolling_median_user"](spark, sf_dir).collect()
    }
    want = (
        pdf.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["value"]
        .transform(
            lambda s: s.rolling(MEDIAN_WINDOW, min_periods=1).median()
        )
    )
    for eid, expect in zip(pdf["event_id"], want):
        assert got[int(eid)] == pytest.approx(expect, rel=1e-12), eid


@pytest.mark.parametrize("seed", [23])
def test_trend_and_corr_match_numpy(spark, tmp_path, seed):
    """user_value_trend / user_value_correlation vs numpy polyfit and
    corrcoef — the float path differs (numpy uses float sums), so the
    comparison is approximate, but a sign/scale bug would show."""
    sf_dir, pdf = _write_events(spark, tmp_path, seed)
    trend = {
        r["user_id"]: r["slope_per_day"]
        for r in QUERIES["user_value_trend"](spark, sf_dir).collect()
    }
    corr = {
        r["user_id"]: r["r"]
        for r in QUERIES["user_value_correlation"](spark, sf_dir).collect()
    }
    for uid, g in pdf.groupby("user_id"):
        if len(g) < 2:
            continue
        x = g["ts"].astype("int64").to_numpy() / 1e3  # ns → µs
        y = np.round(g["value"].to_numpy() * 1e6)  # the query's micro units
        slope = np.polyfit(x - x.min(), y, 1)[0]  # micro-units per µs
        expect_slope = slope * 86400e6 / 1e6
        assert trend[uid] == pytest.approx(expect_slope, rel=1e-6)
        expect_r = np.corrcoef(x, y)[0, 1]
        assert corr[uid] == pytest.approx(expect_r, rel=1e-6)
