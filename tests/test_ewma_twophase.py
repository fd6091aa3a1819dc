"""Bit-equality of the two-phase EWMA against the single-window plan.

``ewma_user_twophase`` promises BIT-EQUAL results to ``ewma_user_values``
(same oracle SQL, same raw-float driver hash), achieved by reassembling
each row's exact trailing-20 value sequence from day-chunks + carried
tails.  These tests pin that promise on the real testdata (sparse
chunks: ~2 events/user/day, so nearly every row crosses a chunk
boundary and exercises the carry path) and on synthetic streams built to
hit the other regimes: a dense single chunk (>20 rows — the carry-free
fast path), a chunk with exactly EWMA_WINDOW rows (tail-slice boundary),
and single-row chunks (carry must concatenate across many chunks).
"""

from __future__ import annotations

import pandas as pd

from processor_edf_spark.plans.analytics_extra import (
    EWMA_ALPHA,
    EWMA_WINDOW,
    ewma_user_values,
)
from processor_edf_spark.plans.analytics_r10 import (
    EWMA_CHUNK_US,
    ewma_user_twophase,
)


def _collect(df):
    return {
        r["event_id"]: (r["user_id"], r["ewma"]) for r in df.collect()
    }


def test_bit_equal_on_testdata(spark, sf_dir):
    base = _collect(ewma_user_values(spark, sf_dir))
    two = _collect(ewma_user_twophase(spark, sf_dir))
    assert set(base) == set(two)
    diverged = [
        (eid, base[eid], two[eid])
        for eid in base
        if base[eid] != two[eid]  # exact float ==, not approx
    ]
    assert diverged == [], f"{len(diverged)} rows diverge: {diverged[:5]}"


def _synthetic_events(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "t_us", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["t_us"], unit="us")
    pdf["event_type"] = "x"
    pdf["props"] = None
    return spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    )


def _reference_ewma(rows):
    """Plain-python trailing-window left fold, the definition both plans
    implement (same IEEE op order)."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, uid, t, v in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        ring = by_user.setdefault(uid, [])
        ring.append(float(v))
        if len(ring) > EWMA_WINDOW:
            del ring[0]
        acc = ring[0]
        for x in ring[1:]:
            acc = acc * (1 - EWMA_ALPHA) + x * EWMA_ALPHA
        out[eid] = (uid, acc)
    return out


def test_synthetic_chunk_regimes(spark, tmp_path):
    day = EWMA_CHUNK_US
    rows = []
    eid = 0
    # user 1: 50 rows inside ONE day-chunk (dense: rows past position 20
    # never touch the carry), values vary
    for i in range(50):
        rows.append((eid, 1, 10 * day + i * 1000, (i * 7 % 13) * 1.5))
        eid += 1
    # user 2: exactly EWMA_WINDOW rows in chunk 1, then EWMA_WINDOW-1 in
    # chunk 2 (tail slice at the == EWMA_WINDOW boundary)
    for i in range(EWMA_WINDOW):
        rows.append((eid, 2, 20 * day + i * 1000, i + 0.25))
        eid += 1
    for i in range(EWMA_WINDOW - 1):
        rows.append((eid, 2, 21 * day + i * 1000, 100.0 - i))
        eid += 1
    # user 3: one row per chunk across 30 chunks (carry concatenates
    # across many sub-(EWMA_WINDOW-1) tails)
    for i in range(30):
        rows.append((eid, 3, (40 + i) * day + 5, float(i) * 0.3 - 2.0))
        eid += 1
    # user 4: tie timestamps at a chunk boundary (event_id breaks ties)
    for i in range(6):
        rows.append((eid, 4, 60 * day, 1.0 + i))
        eid += 1
    events = _synthetic_events(spark, rows)
    sf = str(tmp_path / "sf")
    events.write.parquet(f"{sf}/events.parquet")

    got = _collect(ewma_user_twophase(spark, sf))
    want = _reference_ewma(rows)
    assert set(got) == set(want)
    diverged = [
        (eid, want[eid], got[eid]) for eid in want if want[eid] != got[eid]
    ]
    assert diverged == [], f"{len(diverged)} rows diverge: {diverged[:5]}"

    base = _collect(ewma_user_values(spark, sf))
    assert base == got
