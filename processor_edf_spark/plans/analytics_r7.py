"""r7 analytics batch 2: linear interpolation, rolling-window distinct
reach, and intra-session dwell — three time-series shapes a metrics
stack runs daily, each hash-exact against its DuckDB oracle.

Float discipline: ``interp_linear_hourly`` is the one query here doing
float arithmetic — both engines evaluate the IDENTICAL expression tree
(prev + (next - prev) * (Δh_int / span_int)) over integer-derived
operands, and +, -, *, / are IEEE-754 correctly rounded in both JVMs
and DuckDB, so the doubles hash bit-equal (the ewma/gap-fill
precedent).  The other two queries stay in exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register, ts_usec


@register(
    "interp_linear_hourly",
    """
    WITH ranked AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               date_trunc('hour', ts) AS hour, value,
               row_number() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ), hourly AS (
        SELECT user_id, day, hour, value FROM ranked WHERE rn = 1
    ), spans AS (
        SELECT user_id, day, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY user_id, day
    ), grid AS (
        SELECT user_id, day,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM spans
    ), marked AS (
        SELECT g.user_id, g.day, g.hour, h.value,
               CAST(epoch_us(g.hour) AS BIGINT) AS h_us,
               CASE WHEN h.value IS NOT NULL
                    THEN CAST(epoch_us(g.hour) AS BIGINT) END AS obs_us
        FROM grid g LEFT JOIN hourly h USING (user_id, day, hour)
    ), ctx AS (
        SELECT user_id, h_us, value,
               last_value(value IGNORE NULLS) OVER w_asc AS prev_v,
               last_value(obs_us IGNORE NULLS) OVER w_asc AS prev_us,
               first_value(value IGNORE NULLS) OVER w_desc AS next_v,
               first_value(obs_us IGNORE NULLS) OVER w_desc AS next_us
        FROM marked
        WINDOW w_asc AS (PARTITION BY user_id, day ORDER BY h_us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_desc AS (PARTITION BY user_id, day ORDER BY h_us
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h_us AS hour_usec,
           CASE WHEN value IS NOT NULL THEN value
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) *
                     (CAST(h_us - prev_us AS DOUBLE) /
                      CAST(next_us - prev_us AS DOUBLE))
           END AS value_interp,
           value IS NOT NULL AS is_observed
    FROM ctx
    """,
)
def interp_linear_hourly(spark, sf_dir):
    """The linear-interpolation sibling of ``gap_fill_hourly``: same
    per-user-day hourly grid, but interior holes take the straight line
    between the surrounding observations instead of a forward fill
    (trailing holes still hold the last value — there is no right
    endpoint to interpolate toward).  ``is_observed`` marks real rows.

    Scale shape identical to the ffill flavor: one (user, day)-keyed
    window family, grid bounded at 24 rows/user-day; the interpolation
    itself is four window columns over the already-gridded frame — no
    extra shuffle."""
    (events,) = load(spark, sf_dir, "events")
    # gap_fill_hourly's r14 two-exchange shape: max_by dedup (one
    # exchange on (user, hour)), hour→value map per (user, day) (second
    # exchange), grid exploded from the span with values looked up in
    # the map — no grid⋈hourly join; the interpolation windows below
    # reuse the (user, day) partitioning (sorts only, no exchange).
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
    byday = hourly.groupBy(
        "user_id", F.date_trunc("day", F.col("hour")).alias("day")
    ).agg(
        F.min("hour").alias("h0"),
        F.max("hour").alias("h1"),
        F.map_from_entries(
            F.collect_list(F.struct("hour", "value"))
        ).alias("m"),
    )
    marked = byday.select(
        "user_id",
        "day",
        "m",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    ).select(
        "user_id",
        "day",
        F.element_at("m", F.col("hour")).alias("value"),
        ts_usec("hour").alias("h_us"),
        F.when(
            F.element_at("m", F.col("hour")).isNotNull(), ts_usec("hour")
        ).alias("obs_us"),
    )
    w_asc = (
        Window.partitionBy("user_id", "day")
        .orderBy("h_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_desc = (
        Window.partitionBy("user_id", "day")
        .orderBy("h_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = marked.select(
        "user_id",
        "h_us",
        "value",
        F.last("value", ignorenulls=True).over(w_asc).alias("prev_v"),
        F.last("obs_us", ignorenulls=True).over(w_asc).alias("prev_us"),
        F.first("value", ignorenulls=True).over(w_desc).alias("next_v"),
        F.first("obs_us", ignorenulls=True).over(w_desc).alias("next_us"),
    )
    frac = (F.col("h_us") - F.col("prev_us")).cast("double") / (
        F.col("next_us") - F.col("prev_us")
    ).cast("double")
    return ctx.select(
        "user_id",
        F.col("h_us").alias("hour_usec"),
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
        .alias("value_interp"),
        F.col("value").isNotNull().alias("is_observed"),
    )


@register(
    "rolling_7d_active_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), mx AS (SELECT max(day) AS mxd FROM ud),
    contrib AS (
        SELECT user_id,
               unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS d
        FROM ud
    )
    SELECT CAST(epoch_us(d) AS BIGINT) AS day_usec,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM contrib, mx WHERE d <= mxd
    GROUP BY d
    """,
)
def rolling_7d_active_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day (the WAU curve):
    each distinct (user, day) CONTRIBUTES to the 7 target days it is
    visible in — a bounded 7× explode — and the per-day count-distinct
    runs on the contribution frame.  This inverts the naive
    "distinct-over-a-sliding-range self-join" into one linear pass:
    contribution rows = 7 × |user-days|, shuffled once on the target
    day, with Spark's two-phase partial distinct underneath.

    At 100 TB the same plan swaps COUNT(DISTINCT) for the mergeable
    HLL sketch (`operators/approx.approx_distinct` on the identical
    contribution frame) — the explode trick is exactly what makes the
    sketch mergeable per target day.  The max-day cap is a broadcast
    1-row aggregate."""
    (events,) = load(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    mx = ud.agg(F.max("day").alias("mxd"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("interval 6 days"),
                F.expr("interval 1 day"),
            )
        ).alias("d"),
    )
    return (
        contrib.crossJoin(F.broadcast(mx))
        .filter(F.col("d") <= F.col("mxd"))
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("active_users_7d"))
        .select(ts_usec("d").alias("day_usec"), "active_users_7d")
    )


SESSION_GAP_USEC = 30 * 60 * 1_000_000


@register(
    "session_dwell_stats",
    f"""
    WITH d AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t,
               lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pt
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_dwells,
           CAST(SUM(t - pt) AS BIGINT) AS total_dwell_usec,
           CAST(MAX(t - pt) AS BIGINT) AS max_dwell_usec
    FROM d
    WHERE pt IS NOT NULL AND t - pt <= {SESSION_GAP_USEC}
    GROUP BY user_id
    """,
)
def session_dwell_stats(spark, sf_dir):
    """Intra-session dwell profile per user: the gaps between
    consecutive events that fall INSIDE the 30-minute session bound
    (the same gap constant the sessionize family uses), aggregated to
    (count, total, max) in exact integer µs — engagement-time
    accounting without ever materializing session ids.

    One user-keyed window (lag) + one groupBy on the same key — AQE
    coalesces them into a single shuffle family.  Deterministic
    ordering on (ts, event_id) so timestamp ties cannot flip the lag
    across engines."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.select(
        "user_id",
        ts_usec("ts").alias("t"),
        F.lag(ts_usec("ts")).over(w).alias("pt"),
    )
    dwell = F.col("t") - F.col("pt")
    return (
        d.filter(F.col("pt").isNotNull() & (dwell <= SESSION_GAP_USEC))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dwells"),
            F.sum(dwell).cast("long").alias("total_dwell_usec"),
            F.max(dwell).cast("long").alias("max_dwell_usec"),
        )
    )
