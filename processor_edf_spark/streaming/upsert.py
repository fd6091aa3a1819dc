"""Streaming current-state upsert — the stateful twin of
``merge_upsert_current`` (plans/analytics_r7b.py): state per key is the
latest (t, id, value) and every micro-batch emits the keys whose
current row CHANGED (append mode: downstream materializes the current
table as last-emit-per-key, or feeds a changelog consumer).

Unlike the fold-order twins (EWMA/SCD2/lag), latest-wins is
COMMUTATIVE: the winner is the lexicographic max of (t, id), so the
result is EXACTLY the batch ranking window's under ANY arrival order —
no greedy trade, no late-data caveat.  Out-of-order events simply
lose (and emit nothing).  tests/test_streaming_upsert.py pins parity
against the batch window on randomly shuffled micro-batches.

Scale: one (long, long, double) per key, sharded by the groupBy
shuffle — the streaming half of the SCD1 story whose batch half is the
single-exchange union+window merge.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

UPSERT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("t", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
    ]
)

UPSERT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t", T.LongType(), True),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def stream_current_state(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    t_col: str = "t",
    value_col: str = "value",
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit (key, value, t, event_id) whenever a key's current row
    changes — latest-wins on lexicographic (t, id).

    ``ttl_usec`` bounds the state store under key churn (watermark-tied
    ``EventTimeTimeout``): a key whose current row is older than the
    watermark by more than the TTL is evicted.  The commutativity story
    narrows accordingly — an event for an evicted key re-registers it
    even if an already-emitted row had a LARGER (t, id), because the
    loser's memory is gone; that is the same retire-then-restart trade
    as ``stream_gaps``, chosen over unbounded state.  ``watermark`` is
    the out-of-orderness allowance on ``t_col`` (epoch µs)."""

    def fold(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if ttl_usec is not None and state.hasTimedOut:
            state.remove()
            return
        cur_t, cur_id, cur_v = state.get if state.exists else (
            None,
            None,
            None,
        )

        def save():
            state.update((cur_t, cur_id, cur_v))
            if ttl_usec is not None and cur_t is not None:
                state.setTimeoutTimestamp(
                    max(
                        (cur_t + ttl_usec) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        rows = [p for p in pdfs if len(p)]
        if not rows:
            save()
            return
        batch = pd.concat(rows, ignore_index=True)
        # the batch's own winner: max (t, id) — one vector pass
        idx = batch.sort_values([t_col, id_col]).index[-1]
        t, eid, v = (
            int(batch[t_col][idx]),
            int(batch[id_col][idx]),
            float(batch[value_col][idx]),
        )
        if cur_t is None or (t, eid) > (cur_t, cur_id):
            cur_t, cur_id, cur_v = t, eid, v
            save()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "value": [cur_v],
                    "t": [cur_t],
                    "event_id": [cur_id],
                }
            )
        else:
            save()

    keyed = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias(id_col),
        F.col(t_col).alias(t_col),
        F.col(value_col).alias(value_col),
    )
    timeout = GroupStateTimeout.NoTimeout
    if ttl_usec is not None:
        keyed = keyed.withColumn(
            "_wm_ts", F.timestamp_micros(F.col(t_col))
        ).withWatermark("_wm_ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return keyed.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=UPSERT_OUTPUT_SCHEMA,
        stateStructType=UPSERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def stream_current_state_native(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    t_col: str = "t",
    value_col: str = "value",
) -> DataFrame:
    """JVM-native current-state upsert — the ``session_stats_native``
    of the SCD1 story: a streaming ``groupBy(key).max(struct(t, id,
    value))`` in UPDATE mode, no Python state at all.  The struct max
    is lexicographic, so the winner is exactly the Python twin's
    max-(t, id) rule (value only breaks exact (t, id) ties, which a
    unique id column never produces).  Latest-wins is commutative, so
    the result is arrival-order-independent — the same contract as
    ``stream_current_state``, now computed entirely inside the JVM
    state store with codegen'd merges and no Arrow hop.

    Emission differs from the Python twin by design: update mode
    re-emits a key's row whenever the key receives input (changed or
    not), while the Python fold emits only on CHANGE.  Downstream both
    materialize the same current table as last-emit-per-key — the
    parity test pins that materialization equal under random arrival
    order.

    Scale/trade: this is the throughput flavor.  State is one struct
    per key in the JVM store; but a streaming aggregation without a
    windowed key has NO eviction path (watermarks do not TTL plain
    aggs) — for key-churn-bounded state use the Python twin's
    ``ttl_usec``, or the JVM-native windowed flavor below
    (``stream_current_state_native_windowed``), whose window close IS
    the eviction path.  Run with ``outputMode("update")``."""
    return (
        events.groupBy(F.col(key_col).alias("user_id"))
        .agg(
            F.max(
                F.struct(
                    F.col(t_col).alias("t"),
                    F.col(id_col).alias("event_id"),
                    F.col(value_col).alias("value"),
                )
            ).alias("cur")
        )
        .select(
            "user_id",
            F.col("cur.value").alias("value"),
            F.col("cur.t").alias("t"),
            F.col("cur.event_id").alias("event_id"),
        )
    )


def stream_current_state_native_windowed(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    t_col: str = "t",
    value_col: str = "value",
    window_usec: int = 4_000_000,
    watermark: str = "0 seconds",
) -> DataFrame:
    """JVM-native current-state with BOUNDED state (r11 — the native
    answer to the plain native agg's no-eviction trade above).

    Plain streaming aggregations have no eviction path: watermarks do
    not TTL un-windowed aggs, so ``stream_current_state_native`` grows
    state with every key ever seen.  Windowing the SAME max-struct
    aggregate restores eviction: state is one struct per (tumbling
    window, key), and once the watermark passes a window's end the
    window is emitted (append mode) and its state rows LEAVE the store
    — bounded-state evidence pinned at the store level by
    tests/test_streaming_native_bounded.py via lastProgress
    numRowsTotal and streaming/inspect.read_state.

    Downstream materializes the current table as last-emit-per-key,
    exactly like the update-mode native twin.  The trade is the same
    retire-then-restart contract as the Python twin's ``ttl_usec``
    (``window_usec`` plays the TTL role): a key idle past
    ``window_usec + watermark`` forgets its frontier, so a
    later-arriving OLDER (t, id) row wins its own window and the
    materialized row regresses — latest-wins is only guaranteed within
    a window.  Size ``window_usec`` to the out-of-orderness horizon,
    as with the TTL."""
    return (
        events.withColumn("_wm_ts", F.timestamp_micros(F.col(t_col)))
        .withWatermark("_wm_ts", watermark)
        .groupBy(
            F.window("_wm_ts", f"{window_usec} microseconds").alias("win"),
            F.col(key_col).alias("user_id"),
        )
        .agg(
            F.max(
                F.struct(
                    F.col(t_col).alias("t"),
                    F.col(id_col).alias("event_id"),
                    F.col(value_col).alias("value"),
                )
            ).alias("cur")
        )
        .select(
            "user_id",
            F.col("cur.value").alias("value"),
            F.col("cur.t").alias("t"),
            F.col("cur.event_id").alias("event_id"),
            F.unix_micros("win.end").alias("win_end_usec"),
        )
    )
