"""State eviction under key churn: with a TTL configured, every
stateful twin's state store tracks the ACTIVE key set — total state
rows PLATEAU as key generations retire and new ones arrive, instead of
growing with every key ever seen (the one unbounded resource in the
streaming layer without it).  Also pins the documented
expiry-then-reappear semantics: an evicted key restarts its fold.

Event-time operators (stream_gaps / stream_current_state / stream_ewma)
use watermark-tied EventTimeTimeout, so eviction is DETERMINISTIC in
the data: generation g's keys time out once generation g+2 advances the
watermark past their frontier + TTL.  The registry keys carry no event
time, so it uses a processing-time idle TTL (wall-clock sleeps below).
"""

from __future__ import annotations

import time

import pytest

pytestmark = pytest.mark.slow

from processor_edf_spark.streaming.ewma import stream_ewma
from processor_edf_spark.streaming.lag import stream_gaps
from processor_edf_spark.streaming.registry import (
    streaming_channel_registry,
)
from processor_edf_spark.streaming.upsert import stream_current_state

GEN = 10_000_000  # µs between key generations (event time)
TTL = 4_000_000   # µs idle before eviction — inside one generation gap

SCHEMA = "user_id long, event_id long, t long, value double"


def _state_rows(query) -> int:
    progress = query.lastProgress
    assert progress is not None, "no progress reported"
    ops = progress["stateOperators"]
    assert len(ops) == 1
    return ops[0]["numRowsTotal"]


def _drive(spark, tmp_path, build, rows_schema=SCHEMA,
           output_mode="append"):
    """availableNow micro-harness: each drop() appends a parquet file,
    replays the stream through `build` on a shared checkpoint, and
    returns the state-store row count after the run."""
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def drop(rows):
        spark.createDataFrame(rows, rows_schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(rows_schema).parquet(in_dir)
        q = (
            build(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return _state_rows(q), out_dir

    return drop


BASE = GEN  # keep event times past the initial watermark (0): with a
# watermark attached, Spark pre-filters rows at-or-below it before the
# stateful fold, so an epoch-0 event would silently vanish


def _generation(g: int, n_keys: int = 10):
    """n_keys fresh keys, two events each, at generation-g event time."""
    rows = []
    for i in range(n_keys):
        k = g * 1000 + i
        t0 = BASE + g * GEN
        rows.append((k, g * 100 + 2 * i, t0 + i, float(g)))
        rows.append((k, g * 100 + 2 * i + 1, t0 + 1000 + i, float(g)))
    return rows


def test_stream_gaps_state_plateaus_under_key_churn(spark, tmp_path):
    drop = _drive(
        spark, tmp_path, lambda s: stream_gaps(s, ttl_usec=TTL)
    )
    counts = []
    for g in range(5):
        n, out_dir = drop(_generation(g))
        counts.append(n)
    # generations retire as the watermark passes frontier+TTL (the
    # trailing no-data batch of each availableNow run applies the
    # freshly-advanced watermark, so in practice only the CURRENT
    # generation survives a run): state stays bounded at ≤2 generations
    # — never the 50 keys ever seen
    assert counts[0] == 10
    assert max(counts) <= 20 and counts[-1] <= 20, counts
    # and the output is still the per-key lag: every generation's second
    # event gaps 1000 µs to its first
    import pyspark.sql.functions as F

    out = spark.read.parquet(out_dir)
    gaps = out.where(F.col("gap_usec").isNotNull())
    assert gaps.count() == 50
    assert gaps.where(F.col("gap_usec") != 1000).count() == 0


def test_stream_gaps_evicted_key_restarts_fold(spark, tmp_path):
    drop = _drive(
        spark, tmp_path, lambda s: stream_gaps(s, ttl_usec=TTL)
    )
    key = 7
    drop([(key, 1, BASE, 0.0), (key, 2, BASE + 1000, 0.0)])
    drop([(999, 10, BASE + GEN, 0.0)])   # watermark past key 7 + TTL
    drop([(998, 11, BASE + 2 * GEN, 0.0)])  # timeout pass evicts 7
    n, out_dir = drop([(key, 3, BASE + 3 * GEN, 0.0)])  # 7 REAPPEARS
    rows = {
        r["event_id"]: r["gap_usec"]
        for r in spark.read.parquet(out_dir).collect()
        if r["key"] == key
    }
    # the reappearing event folds as a FRESH key: null gap, not the
    # 3·GEN-wide gap the retired frontier would have produced
    assert rows[1] is None and rows[2] == 1000
    assert rows[3] is None


def test_stream_current_state_plateaus_and_reemits(spark, tmp_path):
    drop = _drive(
        spark, tmp_path, lambda s: stream_current_state(s, ttl_usec=TTL)
    )
    counts = []
    for g in range(5):
        n, out_dir = drop(_generation(g))
        counts.append(n)
    assert counts[0] == 10 and max(counts) <= 20, counts
    # current-state semantics intact: each key's last emit carries its
    # latest (t, id) value
    out = spark.read.parquet(out_dir)
    assert out.where("user_id = 4007 and event_id = 415").count() == 1


def test_stream_ewma_plateaus_under_key_churn(spark, tmp_path):
    drop = _drive(
        spark,
        tmp_path,
        lambda s: stream_ewma(s, ttl_usec=TTL),
    )
    counts = []
    for g in range(4):
        n, out_dir = drop(_generation(g))
        counts.append(n)
    assert counts[0] == 10 and max(counts) <= 20, counts
    # parity on live keys is untouched: every row emitted an ewma
    out = spark.read.parquet(out_dir)
    assert out.where("ewma is null").count() == 0
    assert out.count() == 80


def test_registry_processing_time_ttl_evicts_idle_groups(
    spark, tmp_path
):
    """The channel registry's idle TTL (processing-time — headers carry
    no event time): groups idle past ttl_ms retire, and a retired group
    that reappears re-registers from #0 — is_new=True again.

    availableNow wrinkle this pins explicitly: a replay run DRAINS
    pending processing-time timeouts before terminating (observed as a
    tail of empty batches firing every registered timer), so each run
    ends with the registry state EMPTY — bounded by construction.  A
    continuous deployment instead sees idle groups retire ttl_ms after
    their last header while active groups keep resetting their timer on
    every update."""
    in_dir, ckpt, out_dir = (
        str(tmp_path / "in"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    schema = "name string, rate double, type string"

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            streaming_channel_registry(stream, ttl_ms=500)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return _state_rows(q)

    # every run updates state (proving the fold ran) then drains its
    # timers — terminal state row count is 0, never a growing ledger
    assert drop([("EEG F3", 200.0, "EEG"), ("EMG chin", 100.0, "EMG")]) == 0
    assert drop([("ECG II", 500.0, "ECG"), ("EOG left", 50.0, "EOG")]) == 0
    assert drop([("EEG F3", 200.0, "EEG")]) == 0  # retired group returns
    import pyspark.sql.functions as F

    eeg = (
        spark.read.parquet(out_dir)
        .where(F.col("name_key") == "eeg f3")
        .collect()
    )
    # both sightings registered as NEW #0 — the second proves the
    # group's registry state was evicted in between (without the TTL
    # the second sighting would be is_new=False against run 1's state)
    assert [r["is_new"] for r in eeg] == [True, True]
    assert {r["channel_id"] for r in eeg} == {"eeg f3/EEG#0"}


def test_stream_debounce_plateaus_and_ttl_is_free(spark, tmp_path):
    """Debounce with ttl_usec ≥ gap_usec: state plateaus under key
    churn AND the output is IDENTICAL to the no-TTL operator — an
    anchor older than the gap would have admitted the next event
    anyway, so eviction costs nothing (the one free-eviction
    operator)."""
    from processor_edf_spark.streaming.debounce import stream_debounce

    gap = 1_000_000  # 1 s
    drop = _drive(
        spark,
        tmp_path,
        lambda s: stream_debounce(s, gap_usec=gap, ttl_usec=TTL),
        rows_schema="user_id long, event_type string, event_id long, t long",
    )

    def gen(g):
        t0 = BASE + g * GEN
        rows = []
        for i in range(10):
            k = g * 1000 + i
            # burst of 3 within the gap: only the first is kept
            # (ids end in j, so kept rows are exactly the *0 ids)
            rows += [
                (k, "click", k * 10 + j, t0 + j * 1000 + i)
                for j in range(3)
            ]
        return rows

    counts = []
    for g in range(4):
        n, out_dir = drop(gen(g))
        counts.append(n)
    assert counts[0] == 10 and max(counts) <= 20, counts
    out = spark.read.parquet(out_dir)
    # strict debounce kept exactly the burst heads — 10 per generation
    assert out.count() == 40
    assert out.where("event_id % 10 != 0").count() == 0


def test_stream_funnel_ttl_evicts_and_restarts(spark, tmp_path):
    """Funnel with TTL: users idle past the TTL retire (state
    plateaus); a returning user restarts at stage 0 — depth resets
    instead of resuming the retired funnel."""
    from processor_edf_spark.streaming.funnel import stream_funnel_stages

    stages = ("click", "cart", "purchase")
    drop = _drive(
        spark,
        tmp_path,
        lambda s: stream_funnel_stages(
            s, stages, horizon_usec=GEN, t_col="t", ttl_usec=TTL
        ),
        rows_schema="user_id long, event_type string, t long",
        output_mode="update",
    )
    # user 7 reaches depth 2 in generation 0...
    n, _ = drop([(7, "click", BASE), (7, "cart", BASE + 1000)])
    assert n == 1
    n, _ = drop([(8, "click", BASE + GEN)])       # watermark advances
    n, _ = drop([(9, "click", BASE + 2 * GEN)])   # timeout pass evicts 7
    assert n <= 2
    # ...and restarts at stage 0 on return: a 'cart' event alone
    # matches nothing (stage 0 unmatched), so depth is 0, not 3
    n, out_dir = drop([(7, "cart", BASE + 3 * GEN)])
    rows = [
        r
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] == 7
    ]
    depths = sorted(r["depth"] for r in rows)
    # one gen-0 emit at depth 2 (click+cart in one batch), then the
    # post-eviction restart emit at depth 0
    assert depths == [0, 2]


def test_stream_scd2_eviction_finalizes_open_row(spark, tmp_path):
    """SCD2 with TTL: eviction EMITS the open row once as
    is_current=true (valid_to = valid_from, the open-ended marker)
    before dropping state — the interval is published, not lost — and
    a later change opens a fresh history with no bridging closed
    row."""
    from processor_edf_spark.streaming.scd2 import stream_scd2

    drop = _drive(
        spark,
        tmp_path,
        lambda s: stream_scd2(s, ttl_usec=TTL),
        rows_schema="user_id long, t long, value double",
    )
    drop([(5, BASE, 1.0), (5, BASE + 1000, 2.0)])  # closes [BASE,+1000)
    drop([(99, BASE + GEN, 0.0)])
    n, _ = drop([(98, BASE + 2 * GEN, 0.0)])  # timeout pass evicts 5
    n, out_dir = drop([(5, BASE + 3 * GEN, 9.0)])  # key 5 returns
    rows = sorted(
        (
            (r["valid_from_usec"], r["valid_to_usec"], r["is_current"])
            for r in spark.read.parquet(out_dir).collect()
            if r["user_id"] == 5
        )
    )
    # closed row from gen 0, then the eviction-finalized current row —
    # and NO closed row bridging t=+1000 to the post-eviction change
    assert rows == [
        (BASE, BASE + 1000, False),
        (BASE + 1000, BASE + 1000, True),
    ]


def test_state_store_reader_shows_surviving_keys(spark, tmp_path):
    """Store-level eviction pin, stronger than the progress metric:
    ``read_state`` on the TTL'd gaps checkpoint lists exactly the keys
    whose frontier survived — evicted generations are absent from the
    store itself, and each surviving row carries its last_t state."""
    from processor_edf_spark.streaming.inspect import (
        read_state,
        state_key_count,
    )

    drop = _drive(
        spark, tmp_path, lambda s: stream_gaps(s, ttl_usec=TTL)
    )
    drop(_generation(0, n_keys=3))
    drop(_generation(1, n_keys=3))
    drop(_generation(2, n_keys=3))
    ckpt = str(tmp_path / "ckpt")
    state = {
        r["key"]: r["last_t"] for r in read_state(spark, ckpt).collect()
    }
    # generation-2 keys only (2000..2002), with the frontier = each
    # key's second event time
    assert set(state) == {2000, 2001, 2002}, state
    t0 = BASE + 2 * GEN
    assert state == {2000 + i: t0 + 1000 + i for i in range(3)}
    assert state_key_count(spark, ckpt) == 3
