"""Streaming EWMA — the stateful-streaming flavor of the
``ewma_user_values`` batch query (plans/analytics_extra.py), built on
``applyInPandasWithState`` like the funnel and the channel registry.

State per user is the ring of the last ``window - 1`` observed values
(oldest → newest).  Each micro-batch's events are processed in
(t, event_id) order; every event appends to the ring, the EWMA is the
SAME left fold the batch query runs — ewmaᵢ = (1-α)·ewmaᵢ₋₁ + α·xᵢ
seeded with the oldest in-window value — and one output row is emitted
per event.  Python floats are IEEE-754 doubles with the same
multiply/add rounding as the JVM fold, so on in-order input the
streamed ewma is BIT-EQUAL to the batch query's (pinned by the parity
test in tests/test_streaming_ewma.py).  Across micro-batches the ring
finalizes greedily: an event arriving in a later batch than one it
precedes in event time folds in arrival order (the bounded-state trade
every stateful operator here makes; the periodic batch pass owns
residual exactness).

Scale: state is ≤ window-1 doubles per user key — sharded by the
groupBy(user) shuffle, no global state, no growth with stream length.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from processor_edf_spark.streaming._guards import check_emit_late_ttl

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ewma", T.DoubleType(), True),
    ]
)

EWMA_LATE_OUTPUT_SCHEMA = T.StructType(
    EWMA_OUTPUT_SCHEMA.fields
    + [T.StructField("late", T.BooleanType(), False)]
)

EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("ring", T.ArrayType(T.DoubleType()), True)]
)

# emit_late tracks the fold frontier too — a SEPARATE state schema so
# default callers restarting from a pre-existing checkpoint keep the
# original 1-field state layout (schema change = checkpoint break).
EWMA_LATE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ring", T.ArrayType(T.DoubleType()), True),
        T.StructField("last_t", T.LongType(), True),
    ]
)


def stream_ewma(
    events: DataFrame,
    alpha: float = 0.1,
    window: int = 20,
    user_col: str = "user_id",
    id_col: str = "event_id",
    t_col: str = "t",
    value_col: str = "value",
    emit_late: bool = False,
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Apply the stateful EWMA to a stream (or batch) of events with
    columns (user_id, event_id, t µs, value).  Emits one row per input
    event with the trailing-``window`` EWMA at that event.

    ``emit_late=True`` switches on the out-of-order policy (the W2
    quarantine discipline): an event whose t is BEFORE the newest t
    already folded for its key is NOT folded into the ring — it is
    emitted with ``late=true`` and a null ewma, so late data is counted
    downstream instead of silently corrupting the fold order.  In-order
    rows carry ``late=false``.  Default (False) keeps the documented
    greedy fold-in-arrival-order trade and the original schema.

    Toggling ``emit_late`` changes the state schema (1 vs 2 fields) —
    restart on a FRESH checkpoint location.  Spark's state-schema
    compatibility check rejects the 1→2-field change at query start, so
    a stale 1-field checkpoint fails fast there rather than reaching
    the fold; the defensive ``len(got) > 1`` read below is
    belt-and-suspenders for state stores that skip schema validation.

    ``ttl_usec`` bounds the state store under key churn (watermark-tied
    ``EventTimeTimeout``): a key idle for ``ttl_usec`` of event time is
    evicted; if it reappears its ring restarts empty — the eviction
    sibling of the ``emit_late`` late-data discipline.  ``watermark``
    is the out-of-orderness allowance on ``t_col`` (epoch µs).

    CAUTION — ``emit_late=True`` + ``ttl_usec``: the watermark that
    ``ttl_usec`` attaches makes Spark pre-filter rows at-or-below it
    BEFORE the fold, so with the default 0-second allowance the
    cross-batch late rows the quarantine contract promises to emit as
    ``late=true`` are silently dropped upstream.  Size ``watermark``
    to the expected lateness when combining the two (a warning fires
    on the default — see ``streaming/_guards.py``)."""
    check_emit_late_ttl(emit_late, ttl_usec, watermark)
    one_minus = 1.0 - alpha

    def fold(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if ttl_usec is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            got = state.get
            ring = list(got[0])
            # defensive: a checkpoint written by the 1-field default
            # schema has no last_t slot — surface the documented
            # "fresh checkpoint required when toggling emit_late"
            # contract as a clean restart of the key's ordering watermark
            # instead of an opaque executor IndexError
            last_t = (
                got[1] if emit_late and len(got) > 1 else None
            )
        else:
            ring, last_t = [], None

        def save():
            state.update((ring, last_t) if emit_late else (ring,))
            if ttl_usec is not None and last_t is not None:
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
        ids, ewmas, lates = [], [], []
        for eid, t, x in zip(batch[id_col], batch[t_col], batch[value_col]):
            if emit_late and last_t is not None and int(t) < last_t:
                ids.append(int(eid))
                ewmas.append(None)
                lates.append(True)
                continue
            last_t = int(t)
            ring.append(float(x))
            if len(ring) > window:
                del ring[0]
            acc = ring[0]
            for v in ring[1:]:
                acc = acc * one_minus + v * alpha
            ids.append(int(eid))
            ewmas.append(acc)
            lates.append(False)
        # keep the window-1 values PRECEDING the next event (ring[-0:]
        # would be the whole list, so window=1 needs the explicit branch)
        ring = ring[-(window - 1):] if window > 1 else []
        save()
        out = {
            "event_id": ids,
            "user_id": [uid] * len(ids),
            "ewma": ewmas,
        }
        if emit_late:
            out["late"] = lates
        yield pd.DataFrame(out)

    keyed = events.select(
        F.col(user_col).alias("user_id"),
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
        outputStructType=(
            EWMA_LATE_OUTPUT_SCHEMA if emit_late else EWMA_OUTPUT_SCHEMA
        ),
        stateStructType=(
            EWMA_LATE_STATE_SCHEMA if emit_late else EWMA_STATE_SCHEMA
        ),
        outputMode="append",
        timeoutConf=timeout,
    )
