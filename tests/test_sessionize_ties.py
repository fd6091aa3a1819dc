"""Tie-determinism for the sessionize oracles: sf0.01 testdata has no
duplicate (user_id, ts) pairs, so the driver never exercises the case
where the cumulative-sum window's ordering matters.  Round 2 review found
the oracle's running sum ordered by t alone while the lag window ordered
by (t, event_id) — nondeterministic the moment ties exist.  This test
builds an events table WITH ties (including a tie straddling a session
boundary) and asserts Spark and DuckDB agree row-for-row, type-exactly.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from processor_edf_spark.plans import ORACLE, QUERIES

GAP_US = 4 * 3600 * 1_000_000  # SESSION_GAP_USEC in plans.relational


def _events_with_ties(path: str) -> None:
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = []
    # user 1: a tied pair inside a session, then a gap, then a tied pair
    # exactly at the new session's start
    ts_us = [0, 1_000_000, 1_000_000, 2_000_000,
             2_000_000 + GAP_US + 5, 2_000_000 + GAP_US + 5]
    for i, us in enumerate(ts_us):
        rows.append((1, i, base + pd.Timedelta(us, "us")))
    # user 2: every event identical timestamp (one session, all tied)
    for i in range(4):
        rows.append((2, 100 + i, base))
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")  # TIMESTAMP(MICROS), like testdata
    df["user_id"] = df["user_id"].astype(np.int64)
    df["event_id"] = df["event_id"].astype(np.int64)
    df.to_parquet(path)


def test_sessionize_deterministic_under_ties(spark, tmp_path):
    _events_with_ties(str(tmp_path / "events.parquet"))

    for name in ("sessionize_events", "session_window_events"):
        sdf = QUERIES[name](spark, str(tmp_path))
        cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(r[c] for c in cols) for r in sdf.collect()
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')"
        )
        odf = con.execute(ORACLE[name]).fetchdf()
        odf.columns = [c.lower() for c in odf.columns]
        oracle_rows = sorted(
            tuple(
                v.item() if hasattr(v, "item") else v
                for v in (rec[c] for c in cols)
            )
            for rec in odf.to_dict("records")
        )

        assert spark_rows == oracle_rows, f"{name} diverged under ties"
        # type-exact: every count/chunk id must be int on both engines
        for row in oracle_rows:
            assert not any(isinstance(v, float) for v in row), (
                f"{name} oracle leaked a float: {row}"
            )

    # sanity on the data itself: user 1 splits into exactly 2 sessions with
    # the tied pair (4 events) in the first and the boundary tie (2) second
    sdf = QUERIES["sessionize_events"](spark, str(tmp_path))
    by_user = {
        (r["user_id"], r["chunk_id"]): r["n_events"] for r in sdf.collect()
    }
    assert by_user == {(1, 0): 4, (1, 1): 2, (2, 0): 4}
