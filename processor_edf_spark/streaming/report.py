"""Streaming events_job_report — the composition proof for the r7
stateful primitives: every per-event computation in the batch report
(``plans/analytics_r7b.py events_job_report``) is streamable by
construction once ``stream_gaps`` carries the lag frontier and a
latest-wins upsert carries set membership.

Three streaming frames do the heavy per-event lifting; the report's
five numbers then fall out of bounded post-aggregation over their
replayed outputs (a handful of counts — driver-scale, same as the
batch report's own collect of five scalars):

- ``gaps``   — ``stream_gaps`` over (user, event, t): one 8-byte
  frontier per user.  sessions = rows with gap null/over the 4 h gap;
  dwell = rows with gap ≤ 30 min; input = all rows.  Exact parity with
  the batch lag window on in-order replay (the stream_gaps contract).
- ``daily``  — native streaming ``dropDuplicates`` on (day, type):
  emits each distinct pair once; count = the daily-rollup grid size.
- ``userday`` — ``stream_current_state`` keyed by the EXACT composite
  ``user_id·2^17 + day_index`` (day_index < 2^17 covers year 2328;
  the multiply is collision-free, unlike hashing): distinct keys =
  distinct (user, day), the WAU input.

State per frame is bounded per key and TTL-capable (``ttl_usec`` on
both stateful ops); the post-pass (``summarize_events_job_report``)
reproduces the batch report's stage rows bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from processor_edf_spark.streaming.lag import stream_gaps
from processor_edf_spark.streaming.upsert import stream_current_state

# day_index fits 17 bits until the year 2328; user_id·2^17 + day is an
# exact (collision-free) composite long for user_id < 2^46
_DAY_BITS = 17


def streaming_events_job_report_frames(
    events: DataFrame,
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> dict[str, DataFrame]:
    """The three streaming frames over an events stream with columns
    (user_id, event_id, event_type, t µs).  Each is an append-mode
    stream; replay them (availableNow or continuous) to sinks, then
    fold the sinks with :func:`summarize_events_job_report`.

    ``ttl_usec`` passes through to the two stateful frames (gaps and
    the user-day upsert) — a continuous deployment bounds the report's
    state to the active user/day sets.  Note the semantics trade the
    TTL docstrings describe: an evicted user's next event restarts its
    session (one extra session counted vs the batch report) and an
    evicted (user, day) re-emits — exact parity holds for the
    no-eviction replay, bounded state for the long-running one."""
    day_idx = F.datediff(
        F.to_date(F.timestamp_micros(F.col("t"))), F.lit("1970-01-01")
    )
    gaps = stream_gaps(
        events.select("user_id", "event_id", "t"),
        ttl_usec=ttl_usec,
        watermark=watermark,
    )
    daily = (
        events.withColumn("day_idx", day_idx)
        .select("day_idx", "event_type")
        .dropDuplicates(["day_idx", "event_type"])
    )
    userday = stream_current_state(
        events.select(
            (
                F.col("user_id") * F.lit(1 << _DAY_BITS)
                + day_idx.cast("long")
            ).alias("user_day"),
            "event_id",
            "t",
            F.lit(0.0).alias("value"),
        ),
        key_col="user_day",
        ttl_usec=ttl_usec,
        watermark=watermark,
    )
    return {"gaps": gaps, "daily": daily, "userday": userday}


def summarize_events_job_report(
    spark: SparkSession,
    gaps: DataFrame,
    daily: DataFrame,
    userday: DataFrame,
    session_gap_usec: int,
    dwell_gap_usec: int,
) -> DataFrame:
    """Fold the replayed frame outputs into the batch report's
    (stage, rows_out) rows — identical semantics, so a parity test can
    compare them row-for-row.  Every aggregate here is over the
    already-reduced streaming outputs (events for gaps; distinct pairs
    for daily/userday), and the WAU explode runs over distinct
    (user, day) pairs only — the same shape the batch report uses."""
    n_input = gaps.count()
    sess_dwell = gaps.agg(
        F.sum(
            F.when(
                F.col("gap_usec").isNull()
                | (F.col("gap_usec") > session_gap_usec),
                1,
            ).otherwise(0)
        ).alias("n_sessions"),
        F.sum(
            F.when(
                F.col("gap_usec").isNotNull()
                & (F.col("gap_usec") <= dwell_gap_usec),
                1,
            ).otherwise(0)
        ).alias("n_dwell"),
    ).collect()[0]
    n_daily = daily.select("day_idx", "event_type").distinct().count()

    pairs = userday.select(
        F.col("user_id").alias("user_day")
    ).distinct().select(
        F.pmod(F.col("user_day"), F.lit(1 << _DAY_BITS)).alias("day_idx")
    )
    mx = pairs.agg(F.max("day_idx").alias("mxd"))
    n_wau = (
        pairs.select(
            F.explode(
                F.sequence(
                    F.col("day_idx"), F.col("day_idx") + F.lit(6)
                )
            ).alias("d")
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("d") <= F.col("mxd"))
        .select("d")
        .distinct()
        .count()
    )
    return spark.createDataFrame(
        [
            ("input", n_input),
            ("sessions", int(sess_dwell["n_sessions"])),
            ("dwell_rows", int(sess_dwell["n_dwell"])),
            ("daily_rollup", n_daily),
            ("wau_days", n_wau),
        ],
        "stage string, rows_out long",
    )
