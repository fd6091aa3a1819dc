"""Streaming SCD2 — incremental history maintenance as a stream.

The batch side (`operators/scd2.py`) builds/merges the full history
table; this operator maintains it INCREMENTALLY over a change stream:
state per key is the OPEN row (valid_from, value), and every arriving
change CLOSES it — the closed interval is emitted downstream (append
mode), the new open row replaces it in state.  A consumer materializes
the history as (emitted closed rows) ∪ (a final batch pass for the
still-open rows) — the classic lambda split the batch ``scd2_build``
already covers.

Ordering: each micro-batch folds its changes in (t, tie) order; across
micro-batches the open row is final, so a change arriving LATER than
one it precedes in event time closes the open row at its own t (the
greedy bounded-state trade every stateful operator here makes;
``scd2_apply_delta`` owns exact out-of-order repair).  A change at
t STRICTLY BEFORE the open row's valid_from cannot close an interval
that starts after it: by default it is dropped; with ``emit_late=True``
it is emitted as a ``late=true`` row so the consumer counts/quarantines
it and feeds it to ``scd2_apply_delta`` for exact repair.  A change at
t EQUAL to the open row's valid_from closes it as a zero-length
interval, exactly what the batch build's lead() window emits for
duplicate (key, t) changes.

Parity (tests/test_streaming_scd2.py): on in-order input — including
timestamp ties — the emitted closed rows are EXACTLY the batch
build's ``is_current = false`` rows.
Scale: state is one (long, double) per key, sharded by the groupBy
shuffle.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from processor_edf_spark.streaming._guards import check_emit_late_ttl

SCD2_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("valid_from_usec", T.LongType(), False),
        T.StructField("valid_to_usec", T.LongType(), False),
        T.StructField("is_current", T.BooleanType(), False),
    ]
)

SCD2_STREAM_LATE_OUTPUT_SCHEMA = T.StructType(
    SCD2_STREAM_OUTPUT_SCHEMA.fields
    + [T.StructField("late", T.BooleanType(), False)]
)

SCD2_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_from", T.LongType(), True),
        T.StructField("open_value", T.DoubleType(), True),
    ]
)


def stream_scd2(
    changes: DataFrame,
    key_col: str = "user_id",
    t_col: str = "t",
    value_col: str = "value",
    emit_late: bool = False,
    ttl_usec: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit closed SCD2 intervals from a change stream of
    (user_id, t µs, value); the open row per key lives in state.

    ``emit_late=True`` turns the silent drop of out-of-order changes
    (t strictly before the open row's valid_from) into counted output:
    the dropped change is emitted as a ``late=true`` row carrying its
    own (value, t, t) so a downstream consumer can quarantine/count it
    and hand it to ``scd2_apply_delta`` for exact repair — the W2
    quarantine discipline.  Closed intervals carry ``late=false``.

    ``ttl_usec`` bounds state under key churn (watermark-tied
    ``EventTimeTimeout``): an idle key's eviction FINALIZES it — the
    open row is emitted once as ``is_current=true`` (with
    valid_to = valid_from, the open-ended marker) before the state is
    dropped, so the interval is published rather than lost.  A change
    arriving after eviction opens a NEW history (no closed row bridges
    the gap — the retire-then-restart trade; ``scd2_apply_delta`` owns
    exact repair as with late rows).

    CAUTION — ``emit_late=True`` + ``ttl_usec``: the attached watermark
    makes Spark pre-filter rows at-or-below it BEFORE the fold, so with
    the default 0-second allowance cross-batch late changes are dropped
    upstream instead of emitted ``late=true``; size ``watermark`` to
    the expected lateness (warning fires on the default)."""
    check_emit_late_ttl(emit_late, ttl_usec, watermark)

    def fold(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if ttl_usec is not None and state.hasTimedOut:
            open_from, open_value = (
                state.get if state.exists else (None, None)
            )
            state.remove()
            if open_from is not None:
                row = (uid, open_value, open_from, open_from, True)
                if emit_late:
                    row = row + (False,)
                cols = [
                    "user_id",
                    "value",
                    "valid_from_usec",
                    "valid_to_usec",
                    "is_current",
                ] + (["late"] if emit_late else [])
                yield pd.DataFrame([row], columns=cols)
            return
        open_from, open_value = (
            state.get if state.exists else (None, None)
        )

        def save():
            state.update((open_from, open_value))
            if ttl_usec is not None and open_from is not None:
                state.setTimeoutTimestamp(
                    max(
                        (open_from + ttl_usec) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        rows = [p for p in pdfs if len(p)]
        if not rows:
            save()
            return
        batch = pd.concat(rows, ignore_index=True).sort_values(
            [t_col, value_col]
        )
        closed: list[tuple] = []
        for t, v in zip(batch[t_col], batch[value_col]):
            t, v = int(t), float(v)
            if open_from is not None:
                if t < open_from:
                    # cannot close an interval starting later
                    if emit_late:
                        closed.append((uid, v, t, t, False, True))
                    continue
                # t == open_from emits the ZERO-LENGTH closed row, the
                # exact shape scd2_build's lead() window produces for
                # duplicate (key, t) changes — keeping the closed-row
                # parity claim true on timestamp ties, not just unique t
                closed.append(
                    (uid, open_value, open_from, t, False)
                    + ((False,) if emit_late else ())
                )
            open_from, open_value = t, v
        save()
        if closed:
            cols = [
                "user_id",
                "value",
                "valid_from_usec",
                "valid_to_usec",
                "is_current",
            ]
            if emit_late:
                cols.append("late")
            yield pd.DataFrame(closed, columns=cols)

    keyed = changes.select(
        F.col(key_col).alias("user_id"),
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
            SCD2_STREAM_LATE_OUTPUT_SCHEMA
            if emit_late
            else SCD2_STREAM_OUTPUT_SCHEMA
        ),
        stateStructType=SCD2_STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
