"""Streaming STRICT debounce — the stateful semantics the batch
``dedup_events_debounce`` query deliberately does not claim.

The batch query thins by gap-to-previous-RAW-event (a lag window).
Strict debounce suppresses an event unless it is more than ``gap_usec``
after the last KEPT event of the same (user, type) — a running fold
over the kept-set, inexpressible as a window function (each decision
depends on prior decisions).  That is exactly the
``applyInPandasWithState`` shape: state per (user, type) is ONE
integer — the last kept event time.

Semantics difference, by example (gap=10): events at t=0, 5, 12.
Gap-thinning keeps only {0} — both 5 (gap 5) and 12 (gap to previous
RAW event 5 is 7) follow within 10 of their predecessor, so a long
burst chain suppresses forever.  Strict debounce keeps {0, 12}: 5 is
suppressed (5-0 ≤ 10) but 12 measures against the last KEPT event,
and 12-0 > 10 — the anchor ages out and the key re-admits.  Both are
legitimate; the batch query documents which one it is, and this
operator provides the other.

Each micro-batch processes its events in (t, event_id) order and emits
the kept rows.  Across micro-batches the anchor is final (greedy, the
standard bounded-state trade).  Scale: one integer of state per
(user, type) key, sharded by the groupBy shuffle.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("t", T.LongType(), False),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType(
    [T.StructField("last_kept", T.LongType(), True)]
)


def stream_debounce(
    events: DataFrame,
    gap_usec: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    t_col: str = "t",
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Strict debounce over a stream of (user_id, event_type, event_id,
    t µs): emit an event iff it is the key's first, or more than
    ``gap_usec`` after the last emitted event of that key.

    ``ttl_usec`` bounds state under key churn (watermark-tied
    ``EventTimeTimeout``, same discipline as ``stream_gaps``): an idle
    key evicts, and on reappearance its first event is kept like a
    fresh key's.  A TTL ≥ ``gap_usec`` never changes output — an
    anchor older than the gap would have admitted the next event
    anyway — making debounce the one operator whose eviction trade is
    FREE when ttl_usec ≥ gap_usec."""

    def keep(
        key: Tuple[int, str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid, etype = key
        if ttl_usec is not None and state.hasTimedOut:
            state.remove()
            return
        last = state.get[0] if state.exists else None

        def save():
            state.update((last,))
            if ttl_usec is not None and last is not None:
                state.setTimeoutTimestamp(
                    max(
                        (last + ttl_usec) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        rows = [p for p in pdfs if len(p)]
        if not rows:
            save()
            return
        batch = pd.concat(rows, ignore_index=True).sort_values(
            [t_col, id_col]
        )
        ids, ts = [], []
        for eid, t in zip(batch[id_col], batch[t_col]):
            t = int(t)
            if last is None or t - last > gap_usec:
                ids.append(int(eid))
                ts.append(t)
                last = t
        save()
        if ids:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(ids),
                    "event_type": [etype] * len(ids),
                    "event_id": ids,
                    "t": ts,
                }
            )

    keyed = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(id_col).alias("event_id"),
        F.col(t_col).alias("t"),
    )
    timeout = GroupStateTimeout.NoTimeout
    if ttl_usec is not None:
        keyed = keyed.withColumn(
            "_wm_ts", F.timestamp_micros(F.col("t"))
        ).withWatermark("_wm_ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        keep,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
