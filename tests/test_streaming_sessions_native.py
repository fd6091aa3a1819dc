"""Parity: native session_window session stats vs the stateful twin.

``session_stats_native`` keeps all state JVM-side; the Python-stateful
path is ``stream_gaps`` (one frontier per key) whose gap rows a consumer
thresholds into sessions.  On in-order input the two must produce the
SAME session set — same boundaries (inclusive merge rule: a gap of
exactly gap_usec merges, pinned explicitly by exact-boundary events),
same counts, same dwell.  Each drop is written as a single file so the
file source replays in time order — out-of-order part files would be
watermark-dropped under the 0-second allowance (the documented
emit_late×watermark interaction, not a parity property).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from processor_edf_spark.streaming.lag import stream_gaps
from processor_edf_spark.streaming.sessions import session_stats_native

GAP_USEC = 60_000_000  # 1 minute


def _sessions_from_gap_rows(rows, gap_usec):
    """Threshold the stream_gaps output into sessions — the consumer
    chain the native flavor replaces.  Same-session rule matches
    session_window: INCLUSIVE (split only when gap exceeds the
    threshold)."""
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    out = set()
    for key, krows in by_key.items():
        krows.sort(key=lambda r: (r["t"], r["event_id"]))
        cur = []
        for r in krows:
            if r["gap_usec"] is None or r["gap_usec"] > gap_usec:
                if cur:
                    out.add((key, cur[0], cur[-1], cur[-1] - cur[0], len(cur)))
                cur = [r["t"]]
            else:
                cur.append(r["t"])
        if cur:
            out.add((key, cur[0], cur[-1], cur[-1] - cur[0], len(cur)))
    return out


def _run_available_now(df, checkpoint):
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401

    collected = []
    q = (
        df.writeStream.foreachBatch(
            lambda bdf, _i: collected.extend(bdf.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return collected


def test_native_session_stats_parity(spark, tmp_path):
    rng = np.random.default_rng(42)
    base = 1_700_000_000_000_000
    rows = []
    eid = 0
    for key in range(1, 9):
        t = base + int(rng.integers(0, 10_000_000))
        for _ in range(120):
            # gaps mostly short, ~20% beyond the session threshold,
            # including EXACT-boundary gaps to pin strictness
            u = rng.random()
            if u < 0.15:
                t += GAP_USEC + int(rng.integers(1, 5_000_000))
            elif u < 0.20:
                t += GAP_USEC  # exactly the gap -> must MERGE (inclusive)
            else:
                t += int(rng.integers(1, GAP_USEC // 3))
            rows.append((key, eid, t))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "t"])
    # sentinel: a far-future event on a reserved key advances the global
    # watermark so every real session closes in append mode
    sentinel_t = int(pdf["t"].max()) + 10 * GAP_USEC
    pdf = pd.concat(
        [pdf, pd.DataFrame([(999, eid, sentinel_t)], columns=pdf.columns)],
        ignore_index=True,
    )
    # two in-order drops (multi-file source); sentinel lands last
    pdf = pdf.sort_values(["t", "event_id"])
    src = tmp_path / "in"
    half = len(pdf) // 2
    # single file per drop: the file source's replay order must follow
    # event time or the 0-second watermark drops out-of-order parts
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(
        f"{src}/d1.parquet"
    )
    spark.createDataFrame(pdf.iloc[half:]).coalesce(1).write.parquet(
        f"{src}/d2.parquet"
    )
    schema = "user_id long, event_id long, t long"

    stream1 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    native_rows = _run_available_now(
        session_stats_native(stream1, GAP_USEC),
        str(tmp_path / "ckpt_native"),
    )
    native = {
        (r["key"], r["start_usec"], r["end_usec"], r["dwell_usec"],
         r["n_events"])
        for r in native_rows
        if r["key"] != 999
    }

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    gap_rows = _run_available_now(
        stream_gaps(stream2), str(tmp_path / "ckpt_gaps")
    )
    twin = _sessions_from_gap_rows(
        [r.asDict() for r in gap_rows if r["key"] != 999], GAP_USEC
    )

    assert native == twin
    assert len(native) > 8  # the threshold actually split sessions
