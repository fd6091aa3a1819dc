"""Streaming per-key lag — the stateful primitive under every
"gap between consecutive events" shape (session dwell, inter-arrival
histograms, debounce-style rate limits): state per key is ONE long
(the last seen t), each event emits its gap to the predecessor.

This is the streaming twin of ``lag(t) OVER (PARTITION BY key ORDER BY
t, id)``: within a micro-batch events fold in (t, id) order, across
micro-batches the frontier is final (the bounded-state greedy trade
every stateful operator here makes).  ``emit_late=True`` applies the
same W2-quarantine policy as the EWMA/SCD2 twins: an event older than
the frontier emits ``late=true`` with a null gap and leaves the
frontier untouched.

Parity (tests/test_streaming_lag.py): on in-order input the emitted
(key, id, gap) set is EXACTLY the batch window's lag rows — so any
downstream aggregation (``session_dwell_stats``,
``inter_arrival_histogram``) computed on the stream equals the batch
query by construction.  Scale: 8 bytes of state per key, sharded by
the groupBy shuffle.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from processor_edf_spark.streaming._guards import check_emit_late_ttl

GAPS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("gap_usec", T.LongType(), True),  # null: first event
    ]
)

GAPS_LATE_OUTPUT_SCHEMA = T.StructType(
    GAPS_OUTPUT_SCHEMA.fields
    + [T.StructField("late", T.BooleanType(), False)]
)

GAPS_STATE_SCHEMA = T.StructType(
    [T.StructField("last_t", T.LongType(), True)]
)


def stream_gaps(
    events: DataFrame,
    key_col: str = "user_id",
    id_col: str = "event_id",
    t_col: str = "t",
    emit_late: bool = False,
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit (key, event_id, t, gap_usec) per event — gap to the key's
    previous event in (t, id) order, null for the key's first.

    ``ttl_usec`` bounds the state store under key churn: a key idle for
    ``ttl_usec`` of EVENT time (watermark-tied ``EventTimeTimeout``) is
    evicted, so total state tracks the ACTIVE key set instead of every
    key ever seen — the one resource that otherwise grows forever on an
    unbounded key domain.  The trade is the sibling of ``emit_late``'s
    late-data discipline: an evicted key that reappears restarts its
    fold (first event after re-arrival gaps null, like a fresh key).
    ``watermark`` is the out-of-orderness allowance on ``t_col``
    (interpreted as epoch µs) before eviction may fire.

    CAUTION — ``emit_late=True`` + ``ttl_usec``: the attached watermark
    makes Spark pre-filter rows at-or-below it BEFORE the fold, so with
    the default 0-second allowance cross-batch late rows are dropped
    upstream instead of emitted ``late=true``; size ``watermark`` to
    the expected lateness (warning fires on the default)."""
    check_emit_late_ttl(emit_late, ttl_usec, watermark)

    def fold(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if ttl_usec is not None and state.hasTimedOut:
            state.remove()
            return
        last_t = state.get[0] if state.exists else None
        def save():
            state.update((last_t,))
            if ttl_usec is not None and last_t is not None:
                # evict once the watermark passes the frontier + TTL;
                # clamp above the current watermark (a nearly-expired
                # key's timestamp must still be in the future)
                state.setTimeoutTimestamp(
                    max(
                        (last_t + ttl_usec) // 1000,
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
        ids, ts, gaps, lates = [], [], [], []
        for eid, t in zip(batch[id_col], batch[t_col]):
            eid, t = int(eid), int(t)
            if emit_late and last_t is not None and t < last_t:
                ids.append(eid)
                ts.append(t)
                gaps.append(None)
                lates.append(True)
                continue
            gaps.append(None if last_t is None else t - last_t)
            ids.append(eid)
            ts.append(t)
            lates.append(False)
            last_t = t
        save()
        out = {
            "key": [k] * len(ids),
            "event_id": ids,
            "t": ts,
            "gap_usec": pd.array(gaps, dtype="Int64"),
        }
        if emit_late:
            out["late"] = lates
        yield pd.DataFrame(out)

    keyed = events.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias(id_col),
        F.col(t_col).alias(t_col),
    )
    timeout = GroupStateTimeout.NoTimeout
    if ttl_usec is not None:
        keyed = keyed.withColumn(
            "_wm_ts", F.timestamp_micros(F.col(t_col))
        ).withWatermark("_wm_ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return keyed.groupBy("key").applyInPandasWithState(
        fold,
        outputStructType=(
            GAPS_LATE_OUTPUT_SCHEMA if emit_late else GAPS_OUTPUT_SCHEMA
        ),
        stateStructType=GAPS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
