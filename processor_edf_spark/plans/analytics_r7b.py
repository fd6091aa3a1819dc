"""r7 batch 3 (post-window-freeze, mirror-checked; r8 window entrants
alongside heavy_hitters_audit): three shapes the surface still lacked —
MERGE-INTO-style latest-wins upsert, event co-occurrence lift, and a
log2-bucketed inter-arrival histogram.  All exact-integer or
ROUND-disciplined, hash-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register, ts_usec
from processor_edf_spark.plans.analytics_r7 import SESSION_GAP_USEC
from processor_edf_spark.materialize import materialize


@register(
    "merge_upsert_current",
    """
    WITH snapshot AS (
        -- the existing table: each user's state as of day < 15
        SELECT user_id, value, epoch_us(ts) AS t
        FROM (
            SELECT user_id, value, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-15'
        ) WHERE rn = 1
    ), delta AS (
        -- the incoming batch: state from day >= 15
        SELECT user_id, value, epoch_us(ts) AS t
        FROM (
            SELECT user_id, value, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-15'
        ) WHERE rn = 1
    ), merged AS (
        SELECT user_id, value, t, 1 AS pri FROM delta
        UNION ALL
        SELECT user_id, value, t, 0 AS pri FROM snapshot
    )
    SELECT user_id, value, CAST(t AS BIGINT) AS t_usec,
           pri = 1 AS from_delta
    FROM (
        SELECT user_id, value, t, pri,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY pri DESC, t DESC) AS rn
        FROM merged
    ) WHERE rn = 1
    """,
)
def merge_upsert_current(spark, sf_dir):
    """MERGE INTO semantics without a table format: latest-wins upsert
    of a delta batch into a snapshot (matched keys take the delta row,
    unmatched pass through), expressed as union + one ranking window —
    the SCD1 sibling of ``scd2_apply_delta``'s history-preserving
    merge.  ``from_delta`` marks which side won each key.

    Scale shape: no join at all — both sides shuffle once on the key
    into the ranking window, so a delta touching any fraction of keys
    costs the same single exchange (the classic upsert-by-window plan
    that beats full-outer-join merges when the key set is wide)."""
    (events,) = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")

    def latest(side, pri):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            side.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "value",
                ts_usec("ts").alias("t"),
                F.lit(pri).alias("pri"),
            )
        )

    snapshot = latest(events.filter(F.col("ts") < cut), 0)
    delta = latest(events.filter(F.col("ts") >= cut), 1)
    merged = delta.unionByName(snapshot)
    w = Window.partitionBy("user_id").orderBy(F.desc("pri"), F.desc("t"))
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "value",
            F.col("t").alias("t_usec"),
            (F.col("pri") == 1).alias("from_delta"),
        )
    )


@register(
    "event_cooccurrence_lift",
    """
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    cnt AS (
        SELECT event_type, COUNT(*) AS c FROM ut GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS both_users
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(both_users AS BIGINT) AS both_users,
           ROUND(CAST(both_users AS DOUBLE) * n_users /
                 (ca.c * cb.c), 6) AS lift
    FROM pairs
    JOIN cnt ca ON ca.event_type = type_a
    JOIN cnt cb ON cb.event_type = type_b
    CROSS JOIN n
    """,
)
def event_cooccurrence_lift(spark, sf_dir):
    """Event-type co-occurrence lift (market-basket association over
    the 5-type domain): P(A∧B)/(P(A)·P(B)) per unordered type pair,
    computed on distinct (user, type) sets.  lift > 1 = the behaviors
    attract; < 1 = they substitute.

    Shape: the self-join runs on the DISTINCT (user, type) frame —
    ≤ 5 rows per user — never on raw events, so the pair-generation is
    bounded at |types|²/2 per user; the type-count and user-count
    sides are tiny broadcast aggregates.  Exact integers until the one
    ROUND(…, 6)ed ratio."""
    (events,) = load(spark, sf_dir, "events")
    ut = materialize(events.select("user_id", "event_type").distinct())
    n = events.agg(
        F.countDistinct("user_id").alias("n_users")
    )
    cnt = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("both_users"))
    )
    return (
        pairs.join(
            F.broadcast(cnt.withColumnRenamed("event_type", "type_a")
                        .withColumnRenamed("c", "ca")),
            "type_a",
        )
        .join(
            F.broadcast(cnt.withColumnRenamed("event_type", "type_b")
                        .withColumnRenamed("c", "cb")),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("both_users").cast("long").alias("both_users"),
            F.round(
                F.col("both_users").cast("double")
                * F.col("n_users")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "inter_arrival_histogram",
    """
    WITH d AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT)
               - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id
                 ) AS gap
        FROM events
    )
    SELECT event_type,
           CAST(CASE WHEN gap <= 0 THEN -1
                     ELSE LENGTH(bin(gap)) - 1 END AS BIGINT)
               AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d WHERE gap IS NOT NULL
    GROUP BY event_type, 2
    """,
)
def inter_arrival_histogram(spark, sf_dir):
    """Inter-arrival-time histogram per event type on log2 buckets
    (bucket k = gaps in [2^k, 2^(k+1)) µs; zero/negative gaps — ties —
    land in bucket -1): the burstiness fingerprint that separates
    machine traffic from human traffic at a glance.

    log2 buckets are exact cross-engine BECAUSE the input is an
    integer and the bucket is computed as bit length
    (``length(bin(n)) - 1``), never a float log: libm's log2 is not
    correctly rounded, and at n = 2^k a 1-ulp engine difference would
    flip floor(log2) across the boundary.  One event_type-keyed window
    + one groupBy — a single narrow shuffle family; output is ≤ ~40
    buckets per type."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    d = events.select(
        "event_type",
        (ts_usec("ts") - F.lag(ts_usec("ts")).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    bucket = F.when(F.col("gap") <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(F.col("gap"))) - 1
    )
    return d.groupBy(
        "event_type", bucket.cast("long").alias("log2_bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


EVENTS_JOB_SESSION_GAP_USEC = 4 * 3600 * 1_000_000  # the sessionize gap


@register(
    "events_job_report",
    f"""
    WITH base AS (
        SELECT user_id, event_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS t,
               date_trunc('day', ts) AS day
        FROM events
    ), flagged AS (
        SELECT user_id,
               CASE WHEN t - LAG(t) OVER w > {EVENTS_JOB_SESSION_GAP_USEC}
                    OR LAG(t) OVER w IS NULL THEN 1 ELSE 0 END AS boundary,
               t - LAG(t) OVER w AS gap
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), sessions AS (
        SELECT CAST(SUM(boundary) AS BIGINT) AS n FROM flagged
    ), dwell AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM flagged
        WHERE gap IS NOT NULL AND gap <= {SESSION_GAP_USEC}
    ), daily AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT DISTINCT day, event_type FROM base)
    ), wau AS (
        SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n
        FROM (
            SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                          INTERVAL 1 DAY)) AS d
            FROM (SELECT DISTINCT user_id, day FROM base)
        ), (SELECT max(day) AS mxd FROM base)
        WHERE d <= mxd
    )
    SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS rows_out FROM base
    UNION ALL SELECT 'sessions', n FROM sessions
    UNION ALL SELECT 'dwell_rows', n FROM dwell
    UNION ALL SELECT 'daily_rollup', n FROM daily
    UNION ALL SELECT 'wau_days', n FROM wau
    """,
)
def events_job_report(spark, sf_dir):
    """End-to-end events-analytics job with per-stage accounting — the
    events-side sibling of ``corpus_job_report``: one pass derives the
    keyed base frame (checkpointed, reused by every stage), then the
    standard metric stages run on it — 4 h-gap sessionization (session
    count), intra-session dwell rows (30 min bound, the
    ``session_dwell_stats`` input), the daily (day, type) rollup grid,
    and the trailing-7-day WAU day count.  The report is the
    (stage, rows_out) frame a metrics job publishes for auditability;
    every stage is a shape an individually driver-checked query
    already verifies, so the composition adds accounting, not new
    semantics.

    Scale: the base checkpoint is the only materialization; stage
    counts are one window pass (sessions + dwell share the SAME lag
    window — one shuffle) plus two distinct aggregations.  Gap
    constants: sessions close at the 4 h sessionize gap, dwell rows
    keep the 30 min ``session_dwell_stats`` bound — matching each
    stage's individually verified query."""
    (events,) = load(spark, sf_dir, "events")
    base = materialize(events.select(
        "user_id",
        "event_id",
        "event_type",
        ts_usec("ts").alias("t"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ))

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    lagged = base.select(
        (F.col("t") - F.lag("t").over(w)).alias("gap")
    )
    # Every stage count is a LAZY single-row aggregate over the one
    # checkpointed base, stitched into the report with unions — the
    # whole report computes in ONE job at the sink instead of five
    # sequential driver actions (count/collect per stage cost ~0.4 s of
    # job latency each; at scale they also serialized five scans that
    # the scheduler can now overlap).  sessions + dwell still share a
    # single lag-window pass via stack().
    n_input = base.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("input").alias("stage"), F.col("n").cast("long").alias("rows_out")
    )
    sess_dwell = lagged.agg(
        F.sum(
            F.when(
                F.col("gap").isNull()
                | (F.col("gap") > EVENTS_JOB_SESSION_GAP_USEC),
                1,
            ).otherwise(0)
        ).alias("n_sessions"),
        F.sum(
            F.when(
                F.col("gap").isNotNull()
                & (F.col("gap") <= SESSION_GAP_USEC),
                1,
            ).otherwise(0)
        ).alias("n_dwell"),
    ).select(
        F.expr(
            "stack(2, 'sessions', CAST(n_sessions AS LONG), "
            "'dwell_rows', CAST(n_dwell AS LONG)) AS (stage, rows_out)"
        )
    )
    n_daily = (
        base.select("day", "event_type")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("daily_rollup").alias("stage"),
            F.col("n").cast("long").alias("rows_out"),
        )
    )
    mx = base.agg(F.max("day").alias("mxd"))
    n_wau = (
        base.select("user_id", "day")
        .distinct()
        .select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.col("day") + F.expr("interval 6 days"),
                    F.expr("interval 1 day"),
                )
            ).alias("d")
        )
        .crossJoin(F.broadcast(mx))
        .filter(F.col("d") <= F.col("mxd"))
        .select("d")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("wau_days").alias("stage"),
            F.col("n").cast("long").alias("rows_out"),
        )
    )
    return n_input.unionAll(sess_dwell).unionAll(n_daily).unionAll(n_wau)
