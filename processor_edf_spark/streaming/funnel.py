"""Streaming N-stage funnel — the stateful-streaming flavor of the
``funnel_k_stages`` batch query (plans/relational.py), built on
``applyInPandasWithState`` like the channel registry.

State per user is the stage-match vector t[0..k): stage i's match time,
-1 until matched.  Each micro-batch's events are processed in event-time
order with the SAME matching rule as the batch query: stage i matches
the earliest event of its type strictly after stage i-1's match, within
``horizon_usec`` of stage 0's match.  On one in-order pass the result
is EXACTLY the batch semantics — pinned by the stream/batch parity
test (tests/test_streaming.py); across micro-batches the state
finalizes greedily, so an event arriving out of order later than a
match it would have beaten is ignored (the same trade
``dropDuplicatesWithinWatermark`` makes: bounded state now, residual
exactness owned by the periodic batch pass).

Each batch emits one row per user seen in the batch with the current
(depth, t_first, t_last) — update-mode output; per-stage conversion
counts are one ``depth >= i`` aggregation over the latest row per user
(depth is monotone, so max(depth) per user is the latest).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("t_first", T.LongType(), True),
        T.StructField("t_last", T.LongType(), True),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("times", T.ArrayType(T.LongType()), True)]
)


def stream_funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...],
    horizon_usec: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    t_col: str = "t",
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Apply the stateful funnel to a stream (or batch) of events with
    columns (user_id, event_type, t µs).  The stage-type filter rides
    the scan before the shuffle, as in the batch plan.

    ``ttl_usec`` bounds state under user churn (watermark-tied
    ``EventTimeTimeout``): a user idle past the TTL evicts and a later
    event restarts their funnel at stage 0.  A TTL ≥ ``horizon_usec``
    past t_first only ever evicts funnels that could no longer advance
    (every later match must land within the horizon of stage 0), so
    the trade costs nothing for completed-or-expired funnels; only a
    user parked mid-funnel with the horizon still open restarts."""

    def track(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if ttl_usec is not None and state.hasTimedOut:
            state.remove()
            return
        times = list(state.get[0]) if state.exists else [-1] * len(stages)
        rows = [p for p in pdfs if len(p)]
        seen_t = None  # newest event time in batch, matched or not
        if rows:
            batch = pd.concat(rows, ignore_index=True).sort_values(t_col)
            if len(batch):
                seen_t = int(batch[t_col].iloc[-1])
            for typ, t in zip(batch[type_col], batch[t_col]):
                t = int(t)
                for i, stage in enumerate(stages):
                    if times[i] != -1 or typ != stage:
                        continue
                    if i == 0:
                        times[i] = t
                    elif (
                        times[i - 1] != -1
                        and t > times[i - 1]
                        and t <= times[0] + horizon_usec
                    ):
                        times[i] = t
                    break  # an event matches at most one stage
        state.update((times,))
        if ttl_usec is not None:
            # anchor on the newest event SEEN, not only matched: a key
            # whose events never hit stage 0 still holds a state row,
            # and a row with no registered timeout would be immortal
            # under EventTimeTimeout — the exact leak the TTL exists
            # to prevent
            newest = max(
                (v for v in times if v != -1), default=None
            )
            if seen_t is not None:
                newest = seen_t if newest is None else max(newest, seen_t)
            if newest is not None:
                state.setTimeoutTimestamp(
                    max(
                        (newest + ttl_usec) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        depth = 0
        for v in times:
            if v == -1:
                break
            depth += 1
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "depth": [depth],
                "t_first": [times[0] if times[0] != -1 else None],
                "t_last": [times[depth - 1] if depth else None],
            }
        )

    filtered = events.filter(F.col(type_col).isin(*stages)).select(
        F.col(user_col).alias("user_id"), type_col, t_col
    )
    timeout = GroupStateTimeout.NoTimeout
    if ttl_usec is not None:
        filtered = filtered.withColumn(
            "_wm_ts", F.timestamp_micros(F.col(t_col))
        ).withWatermark("_wm_ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return filtered.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
