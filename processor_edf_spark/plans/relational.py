"""Relational query plans: TPC-H-style analytics + the reference's operator
inventory (SURVEY.md §2) expressed on the driver's synthetic tables.

Every plan is a declarative DataFrame build — Catalyst handles pushdown,
pruning, join strategy (dimension sides broadcast under AQE thresholds),
and whole-stage codegen.  Scale notes are per-query where non-obvious.

Reference operator citations (/root/reference/processor/...):
- P1/P6 filters+normalization      edf_processor/processor.py:19-20, base.py:191
- P4 linear calibration            edf_processor/edf.py:14-18
- J1 band join                     base_processor/timeseries/base.py:178-205
- J3 get-or-create upsert          base_processor/timeseries/base.py:146-176
- A1/A2 bounds+count               base_processor/timeseries/base.py:282-291
- A4 mode-of-diffs rate            base_processor/timeseries/utils.py:14-32
- A5 rate cross-check              base_processor/timeseries/tests.py:68-72
- W1 gap sessionization            base_processor/timeseries/base.py:322-342
- W2 non-overlap validation        base_processor/timeseries/base.py:87-95
- W3 timestamp synthesis           base_processor/timeseries/base.py:357-372
- F1-F4/F8 epoch & EDF date parse  timeseries/utils.py:55-74, edf.py:99-103
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import TS_US, load, register, spread

USEC = 1_000_000
SESSION_GAP_USEC = 4 * 3600 * USEC  # 4h gap → several sessions/user on events


def money_sum(col, scale: int = 2):
    """Order-independent money aggregation: round each row's (bit-identical
    IEEE) product to 4 decimals, sum exactly as decimal, emit double.

    Plain SUM(double) differs across engines in the last ulp (summation
    order), which flips ROUND(x, 2) at .xx5 boundaries — decimal summation
    makes the Spark and DuckDB results bit-equal.
    SQL equivalent: CAST(ROUND(SUM(CAST(ROUND(x,4) AS DECIMAL(28,4))), s) AS DOUBLE)
    """
    return F.round(F.sum(F.round(col, 4).cast("decimal(28,4)")), scale).cast("double")


def _msum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST(ROUND({expr}, 4) AS DECIMAL(28,4))), {scale}) AS DOUBLE)"


def money_avg(col, scale: int = 4):
    """avg via exact decimal sum / count — one double division of identical
    operands on both engines → identical result."""
    dec_sum = F.sum(F.round(col, 4).cast("decimal(28,4)")).cast("double")
    return F.round(dec_sum / F.count(F.lit(1)), scale)


def _mavg_sql(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST(SUM(CAST(ROUND({expr}, 4) AS DECIMAL(28,4))) AS DOUBLE)"
        f" / COUNT(*), {scale})"
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytical queries (the bench headliners)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           {sum_qty}        AS sum_qty,
           {sum_base_price} AS sum_base_price,
           {sum_disc_price} AS sum_disc_price,
           {sum_charge}     AS sum_charge,
           {avg_qty}        AS avg_qty,
           {avg_price}      AS avg_price,
           {avg_disc}       AS avg_disc,
           COUNT(*)         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=_msum_sql("l_quantity"),
        sum_base_price=_msum_sql("l_extendedprice"),
        sum_disc_price=_msum_sql("l_extendedprice * (1 - l_discount)"),
        sum_charge=_msum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
        avg_qty=_mavg_sql("l_quantity"),
        avg_price=_mavg_sql("l_extendedprice"),
        avg_disc=_mavg_sql("l_discount"),
    ),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy groupBy with map-side partial agg.
    At 100 TB: 4-group output, shuffle moves only partial states.

    r15: the heaviest per-row work here is the decimal casts/sums of the
    money_sum contract, and a small single-file scan reads as 3
    partitions — spread() widens the (projected) filtered rows across
    the session so the eight decimal aggregates run wide; a no-op once
    the scan itself is wide (registry.spread), and the filter stays
    pushed to the scan below the repartition."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        spread(
            spark,
            lineitem.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            ).select(
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
            ),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            money_avg(F.col("l_quantity")).alias("avg_qty"),
            money_avg(F.col("l_extendedprice")).alias("avg_price"),
            money_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_segment_revenue",
    """
    SELECT o.o_orderkey,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_usec,
           {rev} AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    HAVING SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(28,4))) > 100000
    """.format(rev=_msum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def q3_segment_revenue(spark, sf_dir):
    """TPC-H Q3 shape: dim filter → fact join → agg.  customer is the small
    side — broadcast it so lineitem never shuffles for the join."""
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(F.round(revenue, 4).cast("decimal(28,4)")).alias("_rev"))
        .filter(F.col("_rev") > 100000)
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_usec"
            ),
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        )
    )


@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           {rev} AS revenue
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """.format(rev=_msum_sql("l.l_extendedprice * (1 - l.l_discount)")),
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join.  region/nation/customer/supplier are all
    dimensions → broadcast chain; only orders⋈lineitem is a real shuffle."""
    region, nation, customer, orders, lineitem, supplier = load(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT {rev} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """.format(rev=_msum_sql("l_extendedprice * l_discount")),
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter+sum — all predicates push to parquet."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Reference operator analogs on `events`
# ---------------------------------------------------------------------------


@register(
    "filter_project_events",
    """
    SELECT event_id,
           LOWER(TRIM(event_type)) AS event_type_norm,
           user_id
    FROM events
    WHERE event_type <> 'error'
    """,
)
def filter_project_events(spark, sf_dir):
    """P1 annotation-filter + P6 name normalization analog."""
    (events,) = load(spark, sf_dir, "events")
    return events.filter(F.col("event_type") != "error").select(
        "event_id",
        F.lower(F.trim("event_type")).alias("event_type_norm"),
        "user_id",
    )


@register(
    "calibrate_events",
    """
    SELECT event_id,
           ROUND(((1000.0 - (-1000.0)) / (32767.0 - (-32768.0)))
                 * ((1000.0 / ((1000.0 - (-1000.0)) / (32767.0 - (-32768.0)))) - 32767.0 + value), 6)
             AS calibrated
    FROM events
    """,
)
def calibrate_events(spark, sf_dir):
    """P4 linear calibration: bit_value·(offset + digital) with the EDF
    constants (reference edf.py:14-18) — pure codegen'd column arithmetic."""
    (events,) = load(spark, sf_dir, "events")
    bit_value = (1000.0 - (-1000.0)) / (32767.0 - (-32768.0))
    offset = (1000.0 / bit_value) - 32767.0
    return events.select(
        "event_id",
        F.round(F.lit(bit_value) * (F.lit(offset) + F.col("value")), 6).alias(
            "calibrated"
        ),
    )


@register(
    "agg_user_bounds",
    """
    SELECT user_id,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS start,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS "end",
           COUNT(*) AS num_values
    FROM events
    GROUP BY user_id
    """,
)
def agg_user_bounds(spark, sf_dir):
    """A1+A2: per-series min/max/count in one map-side-combined pass."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min(F.expr(TS_US)).alias("start"),
        F.max(F.expr(TS_US)).alias("end"),
        F.count(F.lit(1)).alias("num_values"),
    )


@register(
    "rate_crosscheck_users",
    """
    SELECT user_id,
           ROUND(COUNT(*) / ((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0), 6)
             AS inferred_rate
    FROM events
    GROUP BY user_id
    """,
)
def rate_crosscheck_users(spark, sf_dir):
    """A5: inferred rate = n / duration_sec (reference tests.py:68-72)."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.round(
            F.count(F.lit(1))
            / ((F.max(F.expr(TS_US)) - F.min(F.expr(TS_US))) / float(USEC)),
            6,
        ).alias("inferred_rate")
    )


_SESSIONIZE_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS t, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_USEC}
                    OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), chunked AS (
        -- CAST: DuckDB window-SUM of INTEGER yields HUGEINT, which pandas
        -- materializes as float64 (3.0 vs Spark's 3 → hash mismatch).
        -- ORDER BY includes event_id so ties on t can't reorder the
        -- cumulative sum relative to the lag window above.
        SELECT user_id, t,
               CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS chunk_id
        FROM flagged
    )
    SELECT user_id, chunk_id,
           CAST(MIN(t) AS BIGINT) AS session_start,
           CAST(MAX(t) AS BIGINT) AS session_end,
           COUNT(*) AS n_events
    FROM chunked
    GROUP BY user_id, chunk_id
"""


@register("sessionize_events", _SESSIONIZE_ORACLE)
def sessionize_events(spark, sf_dir):
    """W1 gap sessionization: lag + running-sum boundary counting — the
    reference's contiguous-chunk detection (base.py:322-342) on a generic
    event stream.  One shuffle on user_id; linear within partitions."""
    (events,) = load(spark, sf_dir, "events")
    df = events.select("user_id", F.expr(TS_US).alias("t"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    boundary = F.when(
        F.lag("t").over(w).isNull()
        | ((F.col("t") - F.lag("t").over(w)) > SESSION_GAP_USEC),
        1,
    ).otherwise(0)
    chunked = df.withColumn(
        "chunk_id",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    return chunked.groupBy("user_id", "chunk_id").agg(
        F.min("t").alias("session_start"),
        F.max("t").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "session_window_events",
    f"""
    WITH flagged AS (
        SELECT user_id, epoch_us(ts) AS t, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= {SESSION_GAP_USEC}
                    OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), chunked AS (
        SELECT user_id, t,
               SUM(boundary) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS chunk_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(t) AS BIGINT) AS session_start,
           COUNT(*) AS n_events
    FROM chunked
    GROUP BY user_id, chunk_id
    """,
)
def session_window_events(spark, sf_dir):
    """W1, native flavor: Spark's built-in ``session_window`` (the
    Structured-Streaming-ready form — same code works under readStream).
    Note session_window closes a session when the NEXT event is >= gap
    away (merge condition is strict overlap), hence the >= in the oracle.
    """
    (events,) = load(spark, sf_dir, "events")
    df = events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    gap_sec = SESSION_GAP_USEC // USEC
    return (
        df.groupBy("user_id", F.session_window("ts", f"{gap_sec} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )


@register(
    "mode_period_users",
    """
    WITH diffs AS (
        SELECT user_id,
               CAST(ROUND((epoch_us(ts) - LAG(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
                     / 60000000.0) AS BIGINT) AS period_min
        FROM events
    ), counted AS (
        SELECT user_id, period_min, COUNT(*) AS cnt
        FROM diffs WHERE period_min IS NOT NULL
        GROUP BY user_id, period_min
    )
    SELECT user_id, period_min AS mode_period_min
    FROM counted
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, period_min ASC) = 1
    """,
)
def mode_period_users(spark, sf_dir):
    """A4 rate inference: mode of consecutive timestamp diffs (reference
    utils.py:14-32), made deterministic — diffs bucketed to minutes, ties
    broken by smallest period (a plain mode() is tie-ambiguous across
    engines)."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    diffs = (
        events.select("user_id", F.expr(TS_US).alias("t"), "event_id")
        .withColumn(
            "period_min",
            F.round((F.col("t") - F.lag("t").over(w)) / 60_000_000.0).cast("long"),
        )
        .filter(F.col("period_min").isNotNull())
    )
    counted = diffs.groupBy("user_id", "period_min").agg(F.count(F.lit(1)).alias("cnt"))
    rk = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("period_min").asc()
    )
    return (
        counted.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") == 1)
        .select("user_id", F.col("period_min").alias("mode_period_min"))
    )


# ---------------------------------------------------------------------------
# Joins (J1-J3 analogs)
# ---------------------------------------------------------------------------


@register(
    "band_join_acctbal",
    """
    SELECT s.s_suppkey, c.c_custkey,
           ROUND(ABS(1 - s.s_acctbal / c.c_acctbal), 6) AS band_dist
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey
     AND ABS(1 - s.s_acctbal / c.c_acctbal) < 0.02
    """,
)
def band_join_acctbal(spark, sf_dir):
    """J1 band join: equi keys + ±2% ratio band as residual — exactly the
    reference's fuzzy channel match (base.py:188-198).  Catalyst plans hash
    join on the equi key with the band as a post-join filter; the dimension
    side broadcasts."""
    supplier, customer = load(spark, sf_dir, "supplier", "customer")
    band = F.abs(F.lit(1.0) - F.col("s_acctbal") / F.col("c_acctbal"))
    return (
        F.broadcast(supplier)
        .join(
            customer,
            (F.col("s_nationkey") == F.col("c_nationkey")) & (band < 0.02),
        )
        .select("s_suppkey", "c_custkey", F.round(band, 6).alias("band_dist"))
    )


@register(
    "get_or_create_parts",
    """
    WITH incoming AS (
        SELECT DISTINCT p_brand, p_size FROM part
    ), existing AS (
        SELECT DISTINCT p_brand AS e_brand, p_size AS e_size,
               p_brand || '/' || CAST(p_size AS VARCHAR) AS id
        FROM part WHERE p_size <= 25
    )
    SELECT i.p_brand, i.p_size,
           COALESCE(e.id, 'new:' || i.p_brand || '/' || CAST(i.p_size AS VARCHAR)) AS channel_id,
           e.id IS NULL AS is_new
    FROM incoming i
    LEFT JOIN existing e ON i.p_brand = e.e_brand AND i.p_size = e.e_size
    """,
)
def get_or_create_parts(spark, sf_dir):
    """J3 get-or-create: left join registry + coalesce(existing, new id)
    (reference base.py:146-176)."""
    (part,) = load(spark, sf_dir, "part")
    incoming = part.select("p_brand", "p_size").distinct()
    existing = (
        part.filter(F.col("p_size") <= 25)
        .select(
            F.col("p_brand").alias("e_brand"),
            F.col("p_size").alias("e_size"),
            F.concat_ws("/", "p_brand", F.col("p_size").cast("string")).alias("id"),
        )
        .distinct()
    )
    return (
        incoming.join(
            F.broadcast(existing),
            (F.col("p_brand") == F.col("e_brand")) & (F.col("p_size") == F.col("e_size")),
            "left",
        )
        .select(
            "p_brand",
            "p_size",
            F.coalesce(
                F.col("id"),
                F.concat(
                    F.lit("new:"),
                    F.concat_ws("/", "p_brand", F.col("p_size").cast("string")),
                ),
            ).alias("channel_id"),
            F.col("id").isNull().alias("is_new"),
        )
    )


@register(
    "overlap_validation",
    """
    WITH intervals AS (
        SELECT o_custkey, o_orderkey,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS start,
               CAST(epoch_us(o_orderdate) AS BIGINT) + 2592000000000 AS "end"
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           COALESCE(start <= MAX("end") OVER (PARTITION BY o_custkey
                        ORDER BY start, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), FALSE)
             AS overlaps_previous
    FROM intervals
    """,
)
def overlap_validation(spark, sf_dir):
    """W2 non-overlap invariant: flag intervals that overlap any earlier
    interval of the same key (reference's sorted-insert asserts,
    base.py:87-95, as a distributed validation column).  Orders become
    30-day intervals per customer."""
    (orders,) = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("timestamp")  # parquet ms → NTZ; session TZ is UTC
    intervals = orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(od).alias("start"),
        (F.unix_micros(od) + F.lit(2_592_000_000_000)).alias("end"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("start", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return intervals.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.col("start") <= F.max("end").over(w), F.lit(False)).alias(
            "overlaps_previous"
        ),
    )


@register(
    "timestamp_synthesis",
    """
    WITH starts AS (
        SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_usec
        FROM events GROUP BY user_id
    )
    SELECT s.user_id, g.i AS pos,
           s.start_usec + g.i * 5000 AS t_usec
    FROM starts s
    CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 99)) AS i) g
    """,
)
def timestamp_synthesis(spark, sf_dir):
    """W3: synthesize 100 samples at 200 Hz from each series' start —
    `sequence` + `posexplode`, JVM-side row expansion (the distributed
    replacement for the reference's 30M-sample paging generator,
    base.py:357-372).  Integer µs math → exact cross-engine parity."""
    (events,) = load(spark, sf_dir, "events")
    starts = events.groupBy("user_id").agg(
        F.min(F.expr(TS_US)).alias("start_usec")
    )
    exploded = starts.select(
        "user_id",
        "start_usec",
        F.posexplode(F.sequence(F.lit(0).cast("long"), F.lit(99).cast("long"))).alias(
            "pos", "_i"
        ),
    )
    return exploded.select(
        "user_id",
        "pos",
        (F.col("start_usec") + F.col("_i") * 5000).alias("t_usec"),
    )


@register(
    "semi_join_returned_orders",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def semi_join_returned_orders(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS → left-semi join): orders with ≥1 returned
    item.  The semi join never duplicates the probe side, so the
    follow-up count is exact without a distinct — and the build side
    carries only the join key."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "anti_join_idle_customers",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY c.c_mktsegment
    """,
)
def anti_join_idle_customers(spark, sf_dir):
    """NOT EXISTS → left-anti join: customers with no orders since 2000,
    by segment.  ("Never ordered at all" returns ZERO rows on this
    testdata — every customer has an order — which made the green
    correctness row vacuous; the recency filter keeps the anti-join +
    pushed-filter shape and verifies ~135 real rows at sf0.01.)  At
    scale the orders side is huge, but only its key column ships into
    the join build — the date filter and column pruning keep the anti
    join key-only."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Window analytics over events (M5 extensions: tumbling / sliding; session
# is sessionize_events / session_window_events above)
# ---------------------------------------------------------------------------


@register(
    "tumbling_daily_stats",
    """
    SELECT CAST(epoch_us(time_bucket(INTERVAL 1 DAY, ts)) AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events,
           {sum_value} AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL 1 DAY, ts)
    """.format(sum_value=_msum_sql("value")),
)
def tumbling_daily_stats(spark, sf_dir):
    """Tumbling 1-day window aggregation via the native ``F.window``
    expression — the Structured-Streaming-compatible form (same plan works
    under readStream with a watermark).  Map-side partial agg; shuffle
    moves one partial state per (day, partition)."""
    (events,) = load(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return (
        events.groupBy(F.window(ts, "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_hour_counts",
    """
    SELECT event_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def sliding_hour_counts(spark, sf_dir):
    """Sliding event-time window: per user, events in the trailing hour —
    a RANGE frame on the integer µs axis (deterministic under ties: the
    frame is value-based, not row-based).  One shuffle on user_id."""
    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr(TS_US))
        .rangeBetween(-3600 * USEC, 0)
    )
    return events.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@register(
    "asof_last_signup",
    """
    WITH clicks AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS t
        FROM events WHERE event_type = 'click'
    ), signups AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t
        FROM events WHERE event_type = 'signup'
    )
    SELECT c.event_id, c.user_id, s.t AS signup_t
    FROM clicks c ASOF JOIN signups s
      ON c.user_id = s.user_id AND c.t >= s.t
    """,
)
def asof_last_signup(spark, sf_dir):
    """As-of join — an operator Spark lacks natively, built the scalable
    way: for each 'click', the same user's most recent 'signup' at
    t ≤ click.t.  Instead of a range join + per-row max (quadratic on hot
    keys), union both sides with a marker and take ``last(signup_t,
    ignorenulls)`` over one (user, time)-ordered window: one shuffle,
    linear scan, same plan shape at any scale.  Oracle: DuckDB's native
    ASOF JOIN."""
    (events,) = load(spark, sf_dir, "events")
    t = F.expr(TS_US)
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", t.alias("t"), F.lit(1).alias("is_click")
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        t.alias("t"),
        F.lit(0).alias("is_click"),
    )
    combined = clicks.unionByName(signups).withColumn(
        "sig_t", F.when(F.col("is_click") == 0, F.col("t"))
    )
    # signup sorts before click at equal t → ties are inclusive (>=)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_click")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        combined.withColumn("signup_t", F.last("sig_t", ignorenulls=True).over(w))
        .filter((F.col("is_click") == 1) & F.col("signup_t").isNotNull())
        .select("event_id", "user_id", "signup_t")
    )


@register(
    "rollup_event_daily",
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(epoch_us(ts) AS BIGINT) // 86400000000, -1) AS day,
           COUNT(*) AS n_events
    FROM events
    GROUP BY ROLLUP(event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000)
    """,
)
def rollup_event_daily(spark, sf_dir):
    """Hierarchical rollup (hypertable-style): per (type, day) counts
    plus per-type subtotals plus the grand total in ONE pass —
    ``rollup`` expands grouping sets; partial aggregation still applies,
    so the shuffle moves one state per (set, group).  Subtotal NULLs are
    coalesced to sentinels ('<all>', -1) so the output is null-free."""
    (events,) = load(spark, sf_dir, "events")
    day = F.expr(f"({TS_US}) div 86400000000").alias("day")
    return (
        events.select("event_type", day)
        .rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("day", F.lit(-1)).alias("day"),
            "n_events",
        )
    )


@register(
    "distinct_users_per_type",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def distinct_users_per_type(spark, sf_dir):
    """Distinct aggregation: exact COUNT(DISTINCT) — Catalyst expands it
    into a two-level aggregate (dedup on (type, user), then count), both
    levels with map-side partials.  At 100 TB swap in
    ``approx_count_distinct`` (HLL) when ±2% suffices — one pass, O(1)
    state per group."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "value_percentiles_per_type",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6)  AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles_per_type(spark, sf_dir):
    """Exact linear-interpolated percentiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont`` — verified bit-equal after
    rounding).  Exact percentile buffers the group's values; at 100 TB
    use ``approx_percentile`` (t-digest) for bounded state."""
    (events,) = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


RANGE_JOIN_WINDOW_USEC = 5 * 60 * USEC  # pair events within 5 minutes


@register(
    "range_join_close_events",
    f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_usec
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN -{RANGE_JOIN_WINDOW_USEC}
                                             AND {RANGE_JOIN_WINDOW_USEC}
    """,
)
def range_join_close_events(spark, sf_dir):
    """Range (interval) join — pairs of a user's events within ±5 min —
    without the inequality-join trap: a naive ``|ta-tb| ≤ Δ`` condition
    degrades to a per-key nested loop.  Instead each event lands in time
    bucket ``t div Δ`` and probes (bucket-1, bucket, bucket+1): the join
    is pure equi on (user, bucket) — hash join, linear — and the exact
    Δ filter runs on collided candidates only.  The oracle is the naive
    inequality join (same result, quadratic plan)."""
    (events,) = load(spark, sf_dir, "events")
    d = RANGE_JOIN_WINDOW_USEC
    # integer bucket math throughout: floor((t±Δ)/Δ) ≡ (t div Δ) ± 1, so
    # probing {base-1, base, base+1} is exact (no float-boundary drift)
    ev = events.select(
        "event_id",
        "user_id",
        F.expr(TS_US).alias("t"),
        F.expr(f"({TS_US}) div {d}").alias("base"),
    )
    a = ev.select(
        F.col("event_id").alias("event_a"),
        F.col("user_id").alias("u_a"),
        F.col("t").alias("t_a"),
        F.explode(
            F.array(F.col("base") - 1, F.col("base"), F.col("base") + 1)
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("u_b"),
        F.col("t").alias("t_b"),
        F.col("base").alias("bucket"),
    )
    return (
        a.join(b, ["bucket"])
        .filter(
            (F.col("u_a") == F.col("u_b"))
            & (F.col("event_b") > F.col("event_a"))
            & (F.abs(F.col("t_b") - F.col("t_a")) <= d)
        )
        .select(
            "event_a",
            "event_b",
            (F.col("t_b") - F.col("t_a")).alias("dt_usec"),
        )
        .distinct()
    )


@register(
    "json_props_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def json_props_stats(spark, sf_dir):
    """Semi-structured column support: extract a field from the JSON
    ``props`` payload and aggregate it — ``get_json_object`` is JVM-side;
    for hot fields at scale, parse once with ``from_json`` into a struct
    column and let pruning/pushdown work on it."""
    (events,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        events.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(k.cast("long")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "set_ops_event_types",
    """
    SELECT event_type FROM (
        SELECT event_type FROM events WHERE user_id % 2 = 0
        INTERSECT
        SELECT event_type FROM events WHERE user_id % 2 = 1
    )
    """,
)
def set_ops_event_types(spark, sf_dir):
    """Set operations: event types seen by BOTH user cohorts (INTERSECT
    plans as an aggregate + semi join — dedup before the join keeps the
    shuffle small)."""
    (events,) = load(spark, sf_dir, "events")
    even = events.filter(F.col("user_id") % 2 == 0).select("event_type")
    odd = events.filter(F.col("user_id") % 2 == 1).select("event_type")
    return even.intersect(odd)


# ---------------------------------------------------------------------------
# Scalar function parity (F1-F4, F8)
# ---------------------------------------------------------------------------


@register(
    "epoch_functions",
    """
    SELECT event_id,
           ROUND(epoch_us(ts) / 1000000.0, 6)   AS secs,
           epoch_ms(ts)                          AS msecs,
           CAST(epoch_us(ts) AS BIGINT)          AS usecs,
           CAST(FLOOR(value * 1000000) AS BIGINT) AS value_usecs
    FROM events
    WHERE event_id < 500
    """,
)
def epoch_functions(spark, sf_dir):
    """F1/F2/F4: seconds/millis/micros since epoch + secs→µs truncation
    (reference utils.py:55-74)."""
    (events,) = load(spark, sf_dir, "events")
    return events.filter(F.col("event_id") < 500).select(
        "event_id",
        F.round(F.expr(TS_US) / float(USEC), 6).alias("secs"),
        F.expr("unix_millis(cast(ts as timestamp))").alias("msecs"),
        F.expr(TS_US).alias("usecs"),
        F.floor(F.col("value") * USEC).cast("long").alias("value_usecs"),
    )


@register(
    "edf_date_parse",
    """
    WITH formatted AS (
        SELECT o_orderkey, strftime(o_orderdate, '%d.%m.%y') AS edf_date
        FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey, edf_date,
           CASE WHEN CAST(substr(edf_date, 7, 2) AS INT) < 85
                THEN CAST(substr(edf_date, 7, 2) AS INT) + 2000
                ELSE CAST(substr(edf_date, 7, 2) AS INT) + 1900 END AS pivot_year,
           CAST(epoch_us(make_timestamp(
               CASE WHEN CAST(substr(edf_date, 7, 2) AS INT) < 85
                    THEN CAST(substr(edf_date, 7, 2) AS INT) + 2000
                    ELSE CAST(substr(edf_date, 7, 2) AS INT) + 1900 END,
               CAST(substr(edf_date, 4, 2) AS INT),
               CAST(substr(edf_date, 1, 2) AS INT), 12, 57, 2.0)) AS BIGINT) AS start_usec
    FROM formatted
    """,
)
def edf_date_parse(spark, sf_dir):
    """F8: EDF 'dd.mm.yy' date parse with the Y2K pivot (year<85 → 2000s,
    reference edf.py:99-103).  Order years span 1995-2001 → both pivot
    branches exercised."""
    (orders,) = load(spark, sf_dir, "orders")
    formatted = orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey", F.date_format("o_orderdate", "dd.MM.yy").alias("edf_date")
    )
    yy = F.substring("edf_date", 7, 2).cast("int")
    year = F.when(yy < 85, yy + 2000).otherwise(yy + 1900)
    ts = F.make_timestamp(
        year,
        F.substring("edf_date", 4, 2).cast("int"),
        F.substring("edf_date", 1, 2).cast("int"),
        F.lit(12),
        F.lit(57),
        F.lit(2),
    )
    return formatted.select(
        "o_orderkey",
        "edf_date",
        year.alias("pivot_year"),
        F.unix_micros(ts).alias("start_usec"),
    )


# ---------------------------------------------------------------------------
# Round-1 widening: more TPC-H shapes + analytic window functions
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    (l_shipdate > o_orderdate).  Catalyst plans a shuffled hash semi-join
    on l_orderkey with the date conjunct as residual — lineitem is
    deduplicated by the semi-join itself, so no distinct shuffle.  At
    100 TB both sides partition on orderkey; no broadcast (fact⋈fact)."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        o.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(ROUND(100.00 * CAST({promo} AS DOUBLE) / CAST({total} AS DOUBLE), 4) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """.format(
        promo="SUM(CAST(ROUND(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END, 4) AS DECIMAL(28,4)))",
        total="SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(28,4)))",
    ),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio.  part is a dimension
    → broadcast; the month filter pushes to the lineitem parquet scan so
    only ~1/80th of the fact is read.  Decimal sums make the single
    double division bit-identical across engines."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    dec = lambda c: F.sum(F.round(c, 4).cast("decimal(28,4)")).cast("double")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * dec(promo) / dec(rev), 4).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT c.c_custkey, o.o_orderkey,
           CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_usec,
           o.o_totalprice,
           CAST(ROUND(SUM(CAST(ROUND(l.l_quantity, 4) AS DECIMAL(28,4))), 2) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(28,4))) > 300
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-subquery IN → aggregate-then-semi-join.
    The inner agg and outer agg share the l_orderkey partitioning, so AQE
    reuses one exchange; the tiny survivor set (sum_qty>300) broadcasts
    into the semi-join rather than shuffling lineitem twice."""
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    qty_dec = F.sum(F.round("l_quantity", 4).cast("decimal(28,4)"))
    # r15: the inner full-table decimal aggregate is the heavy pass
    # (the post-semi-join outer aggregate sees only the few survivors);
    # spread() its two-column projection so the partial agg runs wide
    # (no-op once the scan is wide — registry.spread)
    big = (
        spread(spark, lineitem.select("l_orderkey", "l_quantity"))
        .groupBy("l_orderkey")
        .agg(qty_dec.alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    return (
        lineitem.join(
            F.broadcast(big), F.col("l_orderkey") == F.col("_big_key"), "left_semi"
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(qty_dec, 2).cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_usec"
            ),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3 AND o_custkey < 200
    """,
)
def top3_orders_per_customer(spark, sf_dir):
    """Ranking window function (top-k per group).  ORDER BY carries the
    o_orderkey tie-break so ROW_NUMBER is deterministic on both engines.
    Catalyst rewrites rank-filter to a per-partition top-k (WindowGroupLimit)
    — no full sort of each customer's orders at scale."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") < 200))
    )


@register(
    "moving_avg_daily_revenue",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(28,4))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(ROUND(CAST(rev AS DOUBLE), 2) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w, 4) AS ma7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_daily_revenue(spark, sf_dir):
    """Sliding-frame window aggregate: 7-day moving average of daily
    revenue.  Decimal sums inside the frame + one double division keep
    engines bit-identical.  Daily rollup shrinks the input to ~2.4k rows
    before the (single-partition) ordered frame — at 100 TB the rollup is
    the shuffle; the frame runs on the tiny aggregate."""
    (orders,) = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round("o_totalprice", 4).cast("decimal(28,4)")).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rev").cast("double"), 2).cast("double").alias("revenue"),
        F.round(
            F.sum("rev").over(w).cast("double") / F.count(F.lit(1)).over(w), 4
        ).alias("ma7"),
    )


@register(
    "cube_event_user_bucket",
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(user_id % 10, -1) AS user_bucket,
           COUNT(*) AS n_events,
           {val} AS sum_value
    FROM events
    GROUP BY CUBE(event_type, user_id % 10)
    """.format(val=_msum_sql("value")),
)
def cube_event_user_bucket(spark, sf_dir):
    """Full CUBE grouping sets: (type, bucket), per-type, per-bucket, and
    grand total in one pass.  Like ROLLUP, cube expands to grouping sets
    with map-side partial aggregation — the shuffle carries one state per
    (set, group), 4× the groups but zero extra fact scans.  Subtotal
    NULLs → sentinels so the output is null-free for hashing."""
    (events,) = load(spark, sf_dir, "events")
    return (
        events.select("event_type", (F.col("user_id") % 10).alias("user_bucket"), "value")
        .cube("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("user_bucket", F.lit(-1)).alias("user_bucket"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "pivot_daily_event_counts",
    """
    SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events
    GROUP BY 1
    """,
)
def pivot_daily_event_counts(spark, sf_dir):
    """PIVOT (long → wide): one row per day, one column per event type.
    Uses ``groupBy().pivot(col, values)`` with the value list given
    explicitly — with an explicit list Spark skips the extra distinct-
    collection job and plans a single pass of conditional aggregates
    (exactly the FILTER clauses in the oracle).  At 100 TB an unlisted
    pivot would scan twice; the listed form never does."""
    (events,) = load(spark, sf_dir, "events")
    day = F.expr(f"({TS_US}) div 86400000000").alias("day")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        events.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    out = wide.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )
    return out


@register(
    "except_click_no_purchase",
    """
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
    FROM events WHERE event_type = 'purchase'
    """,
)
def except_click_no_purchase(spark, sf_dir):
    """EXCEPT (set difference): (user, day) pairs with a click but no
    purchase that day.  ``subtract`` is EXCEPT DISTINCT — Catalyst plans
    aggregate-dedup on each side then a left-anti hash join, so the
    shuffle carries distinct (user, day) pairs, not raw events.
    Completes the set-op family next to ``set_ops_event_types``
    (INTERSECT)."""
    (events,) = load(spark, sf_dir, "events")
    day = F.expr(f"({TS_US}) div 86400000000").alias("day")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    buys = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.subtract(buys)


@register(
    "q17_small_quantity_revenue",
    """
    WITH thresh AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE)
                      / COUNT(*)) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {rev} AS avg_weekly_revenue, COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p   ON p.p_partkey = l.l_partkey
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < t.qty_thresh
    """.format(rev=_msum_sql("l.l_extendedprice / 52.0", 4)),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + equi-join.  The Brand#11
    part-key filter is applied (broadcast semi-join) BEFORE the per-part
    threshold aggregate: since l_partkey determines the brand, the
    per-part average over the semi-joined lineitem equals the average over
    all of lineitem for every surviving part — same result, ~25× less agg
    input at 100 TB (only ~1/25 of parts are Brand#11).  The filtered
    probe and the threshold agg share l_partkey partitioning, so AQE
    reuses one exchange.  The threshold is an exact decimal sum / count
    double division — bit-identical on both engines, so the `<`
    comparison can't flip at the boundary."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    li_brand = lineitem.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = (
        li_brand.groupBy(F.col("l_partkey").alias("_tp"))
        .agg(
            (
                0.2
                * (
                    F.sum(F.round("l_quantity", 4).cast("decimal(28,4)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("qty_thresh")
        )
    )
    return (
        li_brand.join(thresh, F.col("l_partkey") == F.col("_tp"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            money_sum(F.col("l_extendedprice") / 52.0, 4).alias("avg_weekly_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


FUNNEL_WINDOW_USEC = 3600 * USEC  # click -> purchase conversion horizon


@register(
    "funnel_conversion",
    f"""
    WITH cp AS (
        SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    nxt AS (
        SELECT *,
               MIN(CASE WHEN event_type = 'purchase' THEN t END) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS next_purchase_t
        FROM cp
    )
    SELECT t // 86400000000 AS day,
           COUNT(*) AS n_clicks,
           CAST(SUM(CASE WHEN next_purchase_t - t <= {FUNNEL_WINDOW_USEC}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN next_purchase_t - t <= {FUNNEL_WINDOW_USEC}
                          THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4)
               AS conv_rate
    FROM nxt WHERE event_type = 'click'
    GROUP BY t // 86400000000
    """,
)
def funnel_conversion(spark, sf_dir):
    """Click→purchase funnel: per day, the fraction of clicks followed by
    a purchase from the same user within {FUNNEL_WINDOW_USEC}µs (1 h) —
    the sequential-pattern / conversion-attribution shape (the simplest
    MATCH_RECOGNIZE instance) a behavioral pipeline runs next to
    sessionization.

    Shape: filter to the two funnel stages FIRST (the predicate rides the
    scan — at 100 TB the window sees only funnel events, not the firehose),
    then ONE per-user forward-looking window (min over strictly-following
    rows of the conditional purchase time, ties broken by event_id on both
    engines) and a daily rollup.  One shuffle on user_id for the window +
    one partial-agg shuffle on day; linear within partitions — the as-of
    join family (asof_last_signup) pointed backward; this points forward."""
    (events,) = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    cp = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id", "event_id", "event_type", F.expr(TS_US).alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = cp.withColumn(
        "next_purchase_t",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("t"))
        ).over(w),
    )
    converted = F.when(
        F.col("next_purchase_t") - F.col("t") <= FUNNEL_WINDOW_USEC, 1
    ).otherwise(0)
    return (
        nxt.filter(F.col("event_type") == "click")
        .groupBy(F.expr("t div 86400000000").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(converted).alias("n_converted"),
            F.round(
                F.sum(converted) / F.count(F.lit(1)).cast("double"), 4
            ).alias("conv_rate"),
        )
    )


FUNNEL_STAGES = ("view", "click", "signup", "purchase")
FUNNEL_K_WINDOW_USEC = 7 * 86400 * USEC  # whole-funnel horizon from stage 1


@register(
    "funnel_k_stages",
    f"""
    WITH ev AS (
        SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS t
        FROM events
        WHERE event_type IN ('view', 'click', 'signup', 'purchase')
    ),
    s1 AS (
        SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN t END) AS t1
        FROM ev GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id,
               MIN(CASE WHEN event_type = 'click' AND t > t1
                         AND t <= t1 + {FUNNEL_K_WINDOW_USEC} THEN t END) AS t2,
               MIN(t1) AS t1
        FROM ev e JOIN s1 USING (user_id) GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id,
               MIN(CASE WHEN event_type = 'signup' AND t > t2
                         AND t <= t1 + {FUNNEL_K_WINDOW_USEC} THEN t END) AS t3,
               MIN(t1) AS t1, MIN(t2) AS t2
        FROM ev e JOIN s2 USING (user_id) GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id,
               MIN(CASE WHEN event_type = 'purchase' AND t > t3
                         AND t <= t1 + {FUNNEL_K_WINDOW_USEC} THEN t END) AS t4,
               MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
        FROM ev e JOIN s3 USING (user_id) GROUP BY e.user_id
    ),
    counts AS (
        SELECT CAST(COUNT(t1) AS BIGINT) AS c1, CAST(COUNT(t2) AS BIGINT) AS c2,
               CAST(COUNT(t3) AS BIGINT) AS c3, CAST(COUNT(t4) AS BIGINT) AS c4
        FROM s4
    )
    SELECT 1 AS stage, 'view' AS stage_name, c1 AS n_users,
           CAST(1.0 AS DOUBLE) AS conv_from_prev FROM counts
    UNION ALL SELECT 2, 'click', c2,
           ROUND(c2 / CAST(c1 AS DOUBLE), 4) FROM counts
    UNION ALL SELECT 3, 'signup', c3,
           ROUND(c3 / CAST(c2 AS DOUBLE), 4) FROM counts
    UNION ALL SELECT 4, 'purchase', c4,
           ROUND(c4 / CAST(c3 AS DOUBLE), 4) FROM counts
    """,
)
def funnel_k_stages(spark, sf_dir):
    """N-stage ordered funnel (view → click → signup → purchase) with
    MATCH_RECOGNIZE-style row-pattern semantics: stage i matches the
    EARLIEST event of its type strictly after the stage-i−1 match, and
    the whole funnel must complete within {FUNNEL_K_WINDOW_USEC}µs
    (7 days) of the stage-1 match — the general sequential-pattern
    workload the 2-stage funnel_conversion is the simplest instance of.
    Returns one row per stage: (stage, stage_name, n_users,
    conv_from_prev).

    Shape: filter to the funnel's event types FIRST (the predicate rides
    the scan), then ONE shuffle on user_id feeding a CHAIN of k window
    aggregates over the same partitioning — each stage's match time is
    min(t where type=sᵢ ∧ t > tᵢ₋₁ ∧ horizon), a window min whose
    condition references the previous stage's window column, so Catalyst
    plans k WindowExecs back-to-back with NO re-shuffle (pinned by
    tests/test_plan_shapes.py).  The per-user depth rollup is a
    partial agg to ONE row, unpivoted driver-free via stack(); the
    k-row conv_from_prev lag runs on a 4-row frame.  The oracle's
    equivalent chained-CTE formulation re-aggregates per stage; the
    window-chain form costs one shuffle total regardless of k."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    ev = events.filter(F.col("event_type").isin(*FUNNEL_STAGES)).select(
        "user_id", "event_type", F.expr(TS_US).alias("t")
    )
    w = Window.partitionBy("user_id")
    horizon = F.col("t1") + F.lit(FUNNEL_K_WINDOW_USEC)
    df = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("t"))).over(w)
    )
    prev = "t1"
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        df = df.withColumn(
            f"t{i}",
            F.min(
                F.when(
                    (F.col("event_type") == stage)
                    & (F.col("t") > F.col(prev))
                    & (F.col("t") <= horizon),
                    F.col("t"),
                )
            ).over(w),
        )
        prev = f"t{i}"
    ks = range(1, len(FUNNEL_STAGES) + 1)
    per_user = df.groupBy("user_id").agg(
        *[F.min(f"t{i}").alias(f"t{i}") for i in ks]
    )
    one = per_user.agg(
        *[F.count(f"t{i}").alias(f"c{i}") for i in ks]
    )
    stack_args = ", ".join(
        f"{i}, '{s}', c{i}" for i, s in zip(ks, FUNNEL_STAGES)
    )
    staged = one.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stack_args}) AS (stage, stage_name, n_users)"
    )
    lw = Window.orderBy("stage")
    return staged.select(
        "stage",
        "stage_name",
        "n_users",
        F.coalesce(
            F.round(
                F.col("n_users") / F.lag("n_users").over(lw).cast("double"), 4
            ),
            F.lit(1.0),
        ).alias("conv_from_prev"),
    )


@register(
    "cohort_retention",
    f"""
    WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN cohort c USING (user_id)
    WHERE a.day - c.cohort_day <= 14
    GROUP BY c.cohort_day, a.day - c.cohort_day
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active day, and
    for each (cohort, day-offset ≤ 14) the count still active — the
    standard growth-analytics rollup (and a two-level self-aggregation
    shape: min-per-user, join back, regroup).

    Scale: activity is the DISTINCT (user, day) projection (map-side
    dedup before the shuffle); the cohort table is one row per user and
    joins back on user_id — co-partitioned with activity's own shuffle,
    so AQE plans one shuffle for both sides; the final rollup carries
    partial states over ≤ cohorts×15 groups."""
    (events,) = load(spark, sf_dir, "events")
    day = F.expr(f"({TS_US}) div 86400000000")
    activity = events.select("user_id", day.alias("day")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
