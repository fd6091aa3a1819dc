"""Round-6 analytics extensions, four batches: robust anomaly detection,
time-weighted / exponentially-weighted / rolling-median smoothing,
gap-filling interpolation, Markov transition matrices, GROUPING SETS,
duplicate-span coverage AND the executing substring-dedup rewrite,
SCD2 history, triangle counting over the capped near-dup graph, event
debounce, percent rank, exact integer least-squares trend and Pearson
correlation, full-outer reconciliation, and table profiling.

These extend the time-series / training-data operator surface (SURVEY.md
extensions; the reference stops at EDF ETL — cited for scope:
/root/reference/processor/base_processor/timeseries/base.py has no
analytics layer).  Same driver contract as every plan module: identical
column aliases in Spark and oracle SQL, floats rounded identically on
both engines, exact integer/decimal accumulation wherever a float sum
would be order-dependent, and single-division/multiplication float
derivations whose operands are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.operators.textfns import tokens
from processor_edf_spark.plans.registry import load, register, spread, ts_usec
from processor_edf_spark.plans.relational import money_sum, _msum_sql
from processor_edf_spark.plans.text_dedup import _TOK_SQL
from processor_edf_spark.materialize import materialize

# ---------------------------------------------------------------------------
# Robust anomaly detection (median / MAD z-score)
# ---------------------------------------------------------------------------

RZ_THRESHOLD = 3.0  # |robust z| at/above this flags the event
MAD_SCALE = 0.6745  # Φ⁻¹(0.75): scales MAD to σ-equivalents under normality


@register(
    "anomaly_robust_z",
    f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ), mad AS (
        SELECT e.event_type, m.med,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value,
           {MAD_SCALE} * (e.value - s.med) / s.mad AS rz
    FROM events e JOIN mad s USING (event_type)
    WHERE s.mad > 0
      AND abs({MAD_SCALE} * (e.value - s.med) / s.mad) >= {RZ_THRESHOLD}
    """,
)
def anomaly_robust_z(spark, sf_dir):
    """Robust per-group outlier detection: flag events whose value is ≥3
    MAD-scaled deviations from the group median — the median/MAD robust
    z-score, immune to the outliers it hunts (a plain mean/σ z-score is
    dragged by the very tail it should flag, and a cross-engine float
    VARIANCE sum is order-dependent besides).

    Two exact-percentile aggregations (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, bit-equal — the value_percentiles_per_type
    contract), then one broadcast join back and a per-row derivation
    whose every operand is the identical double on both engines:
    ``MAD_SCALE * (value - med) / mad`` is three IEEE ops in fixed
    order, so the score is bit-identical and emitted RAW — a ROUND(x, 4)
    here would reintroduce divergence (Spark rounds the decimal
    expansion half-up, DuckDB rounds the scaled double half-away; they
    disagree at exact .5 boundaries), and the ≥3 threshold compares the
    same identical doubles on both engines.

    Scale: the stats frame is |event_type| rows — broadcast; the flag
    pass is a shuffle-free scan projection.  At 100 TB swap the exact
    percentiles for ``approx_percentile`` (t-digest, bounded state) —
    the flag pass is unchanged."""
    (events,) = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    rz = F.lit(MAD_SCALE) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) >= RZ_THRESHOLD)
        .select("event_id", "event_type", "value", "rz")
    )


# ---------------------------------------------------------------------------
# Time-weighted daily average
# ---------------------------------------------------------------------------


@register(
    "time_weighted_avg_daily",
    """
    WITH s AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v_micro,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id, date_trunc('day', ts)
                   ORDER BY ts, event_id) - epoch_us(ts) AS dt
        FROM events
    )
    SELECT user_id, CAST(epoch_us(day) AS BIGINT) AS day_usec,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt) AS BIGINT) AS total_usec,
           CAST(SUM(CAST(v_micro AS HUGEINT) * dt) AS DOUBLE)
                 / CAST(SUM(dt) AS DOUBLE) / 1000000.0 AS tw_avg
    FROM s WHERE dt IS NOT NULL
    GROUP BY user_id, day
    HAVING SUM(dt) > 0
    """,
)
def time_weighted_avg_daily(spark, sf_dir):
    """Time-weighted mean of an irregularly-sampled value per user-day —
    the correct daily average for sensor/price-style series where a plain
    AVG over-weights bursts: each observation is weighted by how long it
    was current (until the next event; the day's last observation carries
    no weight).

    Float discipline: value is fixed to integer micro-units once (the
    product and round are each one IEEE op on identical doubles), the
    (v_micro × Δt_µs) products and their sum are EXACT integer arithmetic
    — decimal(38,0) on Spark, HUGEINT on DuckDB, both overflow-free at
    ~10^20 per product — and the only float ops are the final two
    divisions of identical operands, emitted RAW (no cross-engine
    ROUND-boundary exposure).  One lag window + one aggregation,
    both partitioned by (user, day): a single shuffle, no hot keys
    (days bound per-key cardinality)."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    s = (
        events.withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn(
            "v_micro", F.round(F.col("value") * 1000000, 0).cast("long")
        )
        .withColumn("t", ts_usec())
        .withColumn("dt", F.lead("t").over(w) - F.col("t"))
        .filter(F.col("dt").isNotNull())
    )
    prod = F.col("v_micro").cast("decimal(19,0)") * F.col("dt").cast(
        "decimal(19,0)"
    )
    return (
        s.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("total_usec"),
            F.sum(prod).alias("sum_prod"),
        )
        .filter(F.col("total_usec") > 0)
        .select(
            "user_id",
            ts_usec("day").alias("day_usec"),
            "n_intervals",
            "total_usec",
            (
                F.col("sum_prod").cast("double")
                / F.col("total_usec").cast("double")
                / 1000000.0
            ).alias("tw_avg"),
        )
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (bounded recursive fold)
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.1
EWMA_WINDOW = 20  # the (1-α)^20 ≈ 0.12 tail is the documented truncation


@register(
    "ewma_user_values",
    f"""
    SELECT event_id, user_id,
           list_reduce(l, (acc, x) ->
                 acc * {1 - EWMA_ALPHA} + x * {EWMA_ALPHA}) AS ewma
    FROM (
        SELECT event_id, user_id,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW
               ) AS l
        FROM events)
    """,
)
def ewma_user_values(spark, sf_dir):
    """Per-user EWMA of the value stream (α=0.1), the classic smoothing /
    drift-detection primitive, truncated to the last {EWMA_WINDOW}
    observations so the window state is bounded (the dropped tail weight
    is (1-α)^20 ≈ 0.12 of an infinite-history EWMA's mass — documented
    truncation, identical on both engines, NOT an approximation gap
    between them).

    The recursion ewmaᵢ = (1-α)·ewmaᵢ₋₁ + α·xᵢ is evaluated as a LEFT
    FOLD over the frame's collected values — Spark ``aggregate`` and
    DuckDB ``list_reduce`` both fold left with the first element as the
    seed, so both engines execute the exact same IEEE multiply/add
    sequence and the results are bit-equal, emitted RAW (a final ROUND
    would diverge at .5 boundaries — measured: 1 row in 10k at sf0.01 —
    because Spark rounds the decimal expansion half-up while DuckDB
    rounds the scaled double half-away).  (A closed
    form Σ α(1-α)^j·xⱼ via pow() would hit libm cross-engine drift and
    (1-α)^-j overflow; the fold has neither problem.)

    Scale: one window shuffle partitioned by user; frame state is ≤20
    doubles/row.  The streaming twin is ``streaming/ewma.py`` —
    applyInPandasWithState carrying the same 20-value ring per key,
    bit-equal to this query on in-order input (parity pinned in
    tests/test_streaming_ewma.py)."""
    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.collect_list("value").over(w).alias("l"),
    ).select(
        "event_id",
        "user_id",
        F.expr(
            f"aggregate(slice(l, 2, size(l) - 1), element_at(l, 1),"
            f" (acc, x) -> acc * {1 - EWMA_ALPHA}D + x * {EWMA_ALPHA}D)"
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Gap-fill: hourly grid + forward fill
# ---------------------------------------------------------------------------


@register(
    "gap_fill_hourly",
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
    )
    SELECT g.user_id, CAST(epoch_us(g.hour) AS BIGINT) AS hour_usec,
           last_value(h.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id, g.day ORDER BY g.hour) AS value_filled,
           h.value IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN hourly h USING (user_id, day, hour)
    """,
)
def gap_fill_hourly(spark, sf_dir):
    """Regularize an irregular series onto an hourly grid with forward
    fill — the resample/interpolate step before any fixed-step model.
    Per user-day: take the LAST observed value of each active hour
    (deterministic tie-break on (ts, event_id)), generate the hour grid
    from first to last active hour, and forward-fill the holes with
    ``last(value, ignorenulls)``; ``is_observed`` marks real vs filled
    rows so downstream consumers can weight them.

    The filled value is a raw double passed through untouched (no
    arithmetic) → bit-identical cross-engine.  The grid generation is
    ``sequence``+``explode`` riding the span aggregate (integer-hour
    steps, no float boundaries).

    Plan shape (r14): two exchanges total.  The last-of-hour dedup is a
    max_by aggregation (partial map-side, one exchange on (user, hour))
    instead of a row_number window; the hour grid and its values come
    from ONE (user, day) aggregate carrying an hour→value map, so the
    old grid⋈hourly join (two more exchanges) disappears; the forward-
    fill window reuses the (user, day) aggregation's partitioning
    (sort only, no exchange).  max_by's (ts, event_id) struct ordering
    is exactly the row_number DESC/DESC tie-break (event_id is unique).
    Scale: grid density is bounded at 24 rows/user-day, so the per-day
    map holds ≤24 entries."""
    (events,) = load(spark, sf_dir, "events")
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
    grid = byday.select(
        "user_id",
        "day",
        "m",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    ).select(
        "user_id",
        "day",
        "hour",
        F.element_at("m", F.col("hour")).alias("value"),
    )
    wff = Window.partitionBy("user_id", "day").orderBy("hour")
    return grid.select(
        "user_id",
        ts_usec("hour").alias("hour_usec"),
        F.last("value", ignorenulls=True).over(wff).alias("value_filled"),
        F.col("value").isNotNull().alias("is_observed"),
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix
# ---------------------------------------------------------------------------


@register(
    "event_transitions",
    """
    WITH s AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ), c AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS cnt
        FROM s WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, cnt,
           CAST(cnt AS DOUBLE)
               / CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM c
    """,
)
def event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over each user's event
    stream: count (state → next state) bigrams across users and emit the
    per-source transition probability — the behavioral-model /
    next-event-prediction primitive (and the sanity check behind funnel
    definitions).

    One lag window partitioned by user, one (from,to) aggregation whose
    output is |types|² rows, then a window total per source row — the
    probability is one division of identical BIGINT-derived doubles.
    Scale: the bigram shuffle carries map-side partial counts; the
    |types|²-row matrix is driver-trivial."""
    (events,) = load(spark, sf_dir, "events")
    s = events.select(
        F.col("event_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = s.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy("from_type"))
    return c.select(
        "from_type",
        "to_type",
        "cnt",
        (F.col("cnt").cast("double") / total.cast("double")).alias("p"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (the explicit flavor between rollup and cube)
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           {rev} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """.format(rev=_msum_sql("l_extendedprice * (1 - l_discount)")),
)
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS — the third multi-level aggregation flavor
    beside rollup_event_daily and cube_event_user_bucket: exactly the
    requested (flag, status) / (flag) / () levels, no more (a rollup
    forced to this shape is coincidence; a cube computes an unwanted
    (status) level).  ``GROUPING(col)`` flags disambiguate a NULL group
    key from a super-aggregate row, emitted as int on both engines.

    Catalyst expands grouping sets into a single Expand + one aggregate:
    one pass over lineitem, map-side partials for every level at once —
    at 100 TB the shuffle carries |levels|·|groups| partial states, not
    data rows.  Revenue uses the money_sum exact-decimal contract (plain
    SUM(double) is summation-order-dependent cross-engine).

    r15: spread() widens the projected scan first — the Expand ×3 plus
    decimal aggregation is the per-row cost, and a small single-file
    scan reads as 3 partitions (no-op once the scan is wide; measured
    1.96 → ~1.0 s at sf0.1)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lineitem = spread(
        spark,
        lineitem.select(
            "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
        ),
    )
    return (
        lineitem.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            money_sum(disc_price).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "g_flag",
            "g_status",
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-span coverage (exact-substring-dedup statistic)
# ---------------------------------------------------------------------------

SPAN_K = 3  # word-gram width; a covered position sits under ≥1 dup gram


@register(
    "dup_span_coverage",
    f"""
    WITH d AS (
        SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ), g AS (
        SELECT doc_id, i AS s,
               array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')
                   AS gram
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {SPAN_K - 1})) AS i)
        WHERE len(t) >= {SPAN_K}
    ), dup AS (
        SELECT gram FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ), ds AS (
        SELECT g.doc_id, least({SPAN_K}, coalesce(
                   lead(g.s) OVER (PARTITION BY g.doc_id ORDER BY g.s) - g.s,
                   {SPAN_K})) AS contrib
        FROM g JOIN dup USING (gram)
    ), cov AS (
        SELECT doc_id, SUM(contrib) AS covered FROM ds GROUP BY doc_id
    )
    SELECT d.doc_id, len(d.t) AS n_tokens,
           CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(cov.covered, 0) AS DOUBLE) / len(d.t) AS coverage
    FROM d LEFT JOIN cov USING (doc_id)
    """,
)
def dup_span_coverage(spark, sf_dir):
    """Per-document duplicate-span coverage: the fraction of a document's
    token positions lying inside a word {SPAN_K}-gram that also occurs in
    at least one OTHER document — the per-document statistic behind
    exact-substring dedup (Lee et al.'s dedup removes these spans; this
    measures what it would remove, which is the audit/threshold step run
    first).

    The span union is computed WITHOUT interval materialization: dup-gram
    start positions are sorted per doc and each contributes
    ``min(K, next_start - start)`` (last contributes K) — exactly the
    union length of the overlapping [s, s+K-1] intervals, in one lag
    window over an integer column.  All-integer arithmetic until the one
    final division of identical operands.

    Scale: gram explode rides the scan with map-side distinct partials;
    the dup-gram dim is COUNT-DISTINCT-thresholded and joined back on the
    gram key (Zipf heads are many-to-one onto the dim — AQE skew-splits);
    the window is partitioned per doc with integer state.  At 100 TB this
    is boilerplate_ngrams' shuffle shape plus an O(doc-length) window."""
    (documents,) = load(spark, sf_dir, "documents")
    d = spread(spark, documents).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    g = materialize(
        d.filter(F.size("t") >= SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (SPAN_K - 1)),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.concat_ws(
                            " ", F.slice(F.col("t"), i, SPAN_K)
                        ).alias("gram"),
                    ),
                )
            ).alias("sg"),
        )
        .select("doc_id", "sg.s", "sg.gram")
        # feeds the dup-gram dim AND the
        # join side: one gram-explode pass instead of two
    )
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    wlead = Window.partitionBy("doc_id").orderBy("s")
    ds = g.join(dup, "gram").select(
        "doc_id",
        F.least(
            F.lit(SPAN_K),
            F.coalesce(
                F.lead("s").over(wlead) - F.col("s"), F.lit(SPAN_K)
            ),
        ).alias("contrib"),
    )
    cov = ds.groupBy("doc_id").agg(F.sum("contrib").alias("covered"))
    n = d.select("doc_id", F.size("t").alias("n_tokens"))
    return n.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("covered"), F.lit(0)).alias("covered_tokens"),
        (
            F.coalesce(F.col("covered"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Round-6 batch 2: rolling median, SCD2 history, triangle counting,
# substring-dedup rewrite
# ---------------------------------------------------------------------------

MEDIAN_WINDOW = 21  # odd so full frames need no interpolation


@register(
    "rolling_median_user",
    f"""
    SELECT event_id, user_id,
           CASE WHEN len(l) % 2 = 1
                THEN list_sort(l)[(len(l) + 1) // 2]
                ELSE (list_sort(l)[len(l) // 2]
                      + list_sort(l)[len(l) // 2 + 1]) / 2.0
           END AS rolling_median
    FROM (
        SELECT event_id, user_id,
               list(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {MEDIAN_WINDOW - 1} PRECEDING
                        AND CURRENT ROW) AS l
        FROM events)
    """,
)
def rolling_median_user(spark, sf_dir):
    """Per-user rolling median of the trailing {MEDIAN_WINDOW} values —
    the robust sibling of the EWMA smoother (one wild outlier shifts an
    EWMA for ~1/α steps but leaves the median untouched).  Partial
    frames at a series head interpolate the two middles, so every event
    gets a defined value from its first observation.

    Both engines sort the SAME multiset of doubles and index the same
    positions, and the even-size interpolation is one add + one divide
    of identical operands — raw-double emission, no ROUND exposure.
    Scale: one user-partitioned window shuffle; frame state is ≤21
    doubles per row (an O(log w) order-statistic tree beats re-sorting
    per row at large w — at w=21 the sort is cheaper than the
    bookkeeping)."""
    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MEDIAN_WINDOW - 1), 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.collect_list("value").over(w).alias("l"),
    ).select(
        "event_id",
        "user_id",
        F.expr(
            "CASE WHEN size(l) % 2 = 1"
            " THEN element_at(array_sort(l),"
            "                 CAST((size(l) + 1) div 2 AS INT))"
            " ELSE (element_at(array_sort(l),"
            "                  CAST(size(l) div 2 AS INT))"
            "       + element_at(array_sort(l),"
            "                    CAST(size(l) div 2 + 1 AS INT))) / 2.0"
            " END"
        ).alias("rolling_median"),
    )


@register(
    "scd2_user_value_history",
    """
    SELECT user_id, value,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_usec,
           coalesce(lead(CAST(epoch_us(ts) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 253402300800000000) AS valid_to_usec,
           lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS is_current
    FROM events
    """,
)
def scd2_user_value_history(spark, sf_dir):
    """Slowly-changing-dimension type 2 from a change stream: each
    user's event log becomes a versioned history table — every value
    carries its [valid_from, valid_to) interval, the open row flagged
    ``is_current`` — the warehouse-maintenance shape behind every
    dimension with history (CDC merge targets, as-of lookups via
    ``asof_last_signup``'s join).

    One lead window over the (user, time) ordering: the whole history
    build is a single shuffle, no self-join (the naive SCD2 build joins
    the log to itself on "next change").  At 100 TB the incremental
    flavor closes only the affected users' open rows — an anti-join +
    union on the daily delta, same operator shapes."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ts_usec()
    return events.select(
        "user_id",
        "value",
        t.alias("valid_from_usec"),
        # open rows close at the SCD2 high date (9999-12-31) — the
        # warehouse convention, and it keeps the column non-null so
        # both engines ship it as a plain BIGINT
        F.coalesce(
            F.lead(t).over(w), F.lit(253402300800000000)
        ).alias("valid_to_usec"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


TRI_TOPK = 5  # per-vertex nearest-neighbor cap before triangle counting
TRI_BUCKET_CAP = 10  # docs considered per LSH bucket for pair generation
TRI_MAX_HAMMING = 3


def _triangle_sql() -> str:
    """Oracle: the same bucket-capped pair generation the Spark plan
    runs (simhash byte-band buckets, first {TRI_BUCKET_CAP} doc_ids per
    bucket, exact hamming ≤ {TRI_MAX_HAMMING} on candidates), the
    per-vertex {TRI_TOPK} arc cap, then triangles with the identical
    degree-ordered orientation."""
    from processor_edf_spark.plans.text_dedup import _simhash_sql

    band_keys = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band,"
        f" (simhash // {1 << (8 * b)}) % 256 AS key FROM sims"
        for b in range(4)
    )
    return f"""
    WITH sims AS ({_simhash_sql(32)}),
    bands AS ({band_keys}),
    capped AS (
        SELECT doc_id, simhash, band, key FROM (
            SELECT *, row_number() OVER (
                PARTITION BY band, key ORDER BY doc_id) AS brn
            FROM bands)
        WHERE brn <= {TRI_BUCKET_CAP}
    ), p AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                   AS hamming
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {TRI_MAX_HAMMING}
    ),
    sym AS (
        SELECT doc_a AS u, doc_b AS v, hamming FROM p
        UNION ALL
        SELECT doc_b AS u, doc_a AS v, hamming FROM p
    ), topk AS (
        SELECT u, v FROM (
            SELECT u, v, row_number() OVER (
                PARTITION BY u ORDER BY hamming, v) AS rn
            FROM sym)
        WHERE rn <= {TRI_TOPK}
    ), e AS (
        SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM topk
    ), deg AS (
        SELECT id, COUNT(*) AS d FROM (
            SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e)
        GROUP BY id
    ), o AS (
        SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                    THEN e.a ELSE e.b END AS src,
               CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                    THEN e.b ELSE e.a END AS dst,
               CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                    THEN db.d ELSE da.d END AS dd
        FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
    ), tri AS (
        SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
        FROM o o1
        JOIN o o2 ON o2.src = o1.src
               AND ((o1.dd < o2.dd) OR (o1.dd = o2.dd AND o1.dst < o2.dst))
        JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
    )
    SELECT id AS doc_id, COUNT(*) AS n_triangles FROM (
        SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
    GROUP BY id
    """


@register("triangle_count_nn", _triangle_sql())
def triangle_count_nn(spark, sf_dir):
    """Per-document triangle participation counts over the capped
    near-duplicate graph — triangle density separates tight duplicate
    clusters (template families, mirror sites) from chance pairwise
    collisions, the classic graph-structure signal on similarity graphs.

    Graph: simhash byte-band LSH candidates with a PER-BUCKET cap —
    only the first {TRI_BUCKET_CAP} doc_ids of each (band, key) bucket
    generate pairs, so candidate generation is O(n·cap) however
    dup-heavy the corpus (the UNCAPPED banded join inherits the
    semantic quadratic on replica-heavy data: the first cut composed
    simhash_near_pairs and hit 83 s at the ×4 dup sweep; the cap holds
    it flat — same trade as lsh_dedup's bucket-star: pairs beyond the
    cap are not enumerated, and the verified-pair queries remain the
    exact path).  Exact hamming ≤ {TRI_MAX_HAMMING} filters candidates,
    each vertex keeps its {TRI_TOPK} nearest arcs, so the edge set —
    and with it the triangle output — is O(n·k) however dense the dup
    clusters get (the uncapped clique graph is cubic in group size).
    Counting uses the DEGREE-ORDERED node-iterator: every edge is
    oriented from its lower-(degree, id) endpoint, wedges form only at
    each triangle's lowest corner, and the closing probe is a plain
    equi-join — each triangle found exactly once, and the wedge fan-out
    per vertex is bounded by its ORIENTED out-degree, which degree
    ordering keeps ≤ O(√|E|) even for hub vertices (the reason this
    shape survives skewed graphs at 100 TB where a<b orientation piles
    every wedge onto low-id hubs)."""
    from processor_edf_spark.plans.text_dedup import _simhash_df

    sims = _simhash_df(spark, sf_dir, 32)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (F.shiftright("simhash", 8 * b) % 256).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bn"),
    ).select("doc_id", "simhash", "bn.band", "bn.key")
    wcap = Window.partitionBy("band", "key").orderBy("doc_id")
    capped = (
        bands.withColumn("brn", F.row_number().over(wcap))
        .filter(F.col("brn") <= TRI_BUCKET_CAP)
        .drop("brn")
    )
    ca, cb = capped.alias("ca"), capped.alias("cb")
    ham = F.bit_count(F.col("ca.simhash").bitwiseXOR(F.col("cb.simhash")))
    p = (
        ca.join(
            cb,
            (F.col("ca.band") == F.col("cb.band"))
            & (F.col("ca.key") == F.col("cb.key"))
            & (F.col("ca.doc_id") < F.col("cb.doc_id")),
        )
        .select(
            F.col("ca.doc_id").alias("doc_a"),
            F.col("cb.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= TRI_MAX_HAMMING)
        .distinct()
    )
    # symmetrize by exploding both directions from ONE pass over the
    # pair stream (a unionAll of two selects would compute the simhash
    # subtree twice — it dominated the first cut's cost)
    sym = p.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("u"),
                    F.col("doc_b").alias("v"),
                    F.col("hamming"),
                ),
                F.struct(
                    F.col("doc_b").alias("u"),
                    F.col("doc_a").alias("v"),
                    F.col("hamming"),
                ),
            )
        ).alias("x")
    ).select("x.u", "x.v", "x.hamming")
    wtop = Window.partitionBy("u").orderBy("hamming", "v")
    topk = (
        sym.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= TRI_TOPK)
        .select("u", "v")
    )
    e = topk.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    # the capped edge set is O(n·k) rows and feeds THREE consumers
    # (degree count, wedge sides, closing probe): checkpoint it so the
    # pair-generation subtree runs once (jaccard_prefix_pairs'
    # localCheckpoint discipline)
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        # three consumers (both wedge sides + the closing probe):
        # lazy-checkpoint so the degree joins run once
        .localCheckpoint(eager=False)
    )
    o1 = o.select(
        F.col("src"), F.col("dst").alias("y"), F.col("dd").alias("dy")
    )
    o2 = o.select(
        F.col("src"), F.col("dst").alias("z"), F.col("dd").alias("dz")
    )
    wedges = o1.join(o2, "src").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedges.join(closing, ["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    # one pass over the triangle stream: exploding the three corners
    # replaces the unionAll of three selects, which re-ran the WEDGE
    # JOIN once per branch (the plan's dominant subtree, three times)
    return (
        tri.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias(
                "doc_id"
            )
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@register(
    "dedup_substring_rewrite",
    f"""
    WITH d AS (
        SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ), g AS (
        SELECT doc_id, i AS s,
               array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')
                   AS gram
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {SPAN_K - 1})) AS i)
        WHERE len(t) >= {SPAN_K}
    ), dup AS (
        SELECT gram, MIN(doc_id) AS min_doc FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ), ds AS (
        SELECT g.doc_id, g.s FROM g
        JOIN dup USING (gram) WHERE g.doc_id <> dup.min_doc
    ), cov AS (
        SELECT doc_id, list(DISTINCT p) AS cov
        FROM ds, LATERAL (
            SELECT unnest(generate_series(s, s + {SPAN_K - 1})) AS p)
        GROUP BY doc_id
    )
    SELECT d.doc_id, len(d.t) AS n_tokens,
           CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed,
           coalesce(array_to_string(
               list_transform(
                   list_filter(generate_series(1, len(d.t)),
                       p -> NOT list_contains(
                           coalesce(c.cov, CAST([] AS BIGINT[])), p)),
                   p -> d.t[p]), ' '), '') AS new_text
    FROM d LEFT JOIN cov c USING (doc_id)
    """,
)
def dedup_substring_rewrite(spark, sf_dir):
    """Exact-substring dedup EXECUTED, not just audited
    (dup_span_coverage is the audit): every token position covered by a
    cross-document duplicate {SPAN_K}-gram is REMOVED, except in the
    gram's canonical document (its minimum doc_id), which keeps its
    text — the Lee et al. one-copy-survives policy at word-gram
    granularity, emitting the rebuilt text plus removal accounting.

    Plan: the gram stream and dup dim are dup_span_coverage's shapes
    (explode rides the scan, COUNT-DISTINCT-thresholded dim joined back
    on the gram key); covered positions explode {SPAN_K} rows per dup
    start and collapse to one per-doc position set; the rewrite is a
    per-row array filter — no second corpus scan, no pair enumeration,
    and the only strings shuffled are the grams, never the documents.
    The rebuilt text is whitespace-normalized (tokens rejoined with
    single spaces) on both engines identically."""
    (documents,) = load(spark, sf_dir, "documents")
    d = spread(spark, documents).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    g = materialize(
        d.filter(F.size("t") >= SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (SPAN_K - 1)),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.concat_ws(
                            " ", F.slice(F.col("t"), i, SPAN_K)
                        ).alias("gram"),
                    ),
                )
            ).alias("sg"),
        )
        .select("doc_id", "sg.s", "sg.gram")
        # feeds the dup-gram dim AND the
        # join side: one gram-explode pass instead of two
    )
    dup = (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("nd") >= 2)
        .select("gram", "min_doc")
    )
    ds = (
        g.join(dup, "gram")
        .filter(F.col("doc_id") != F.col("min_doc"))
        .select("doc_id", "s")
    )
    cov = (
        ds.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + (SPAN_K - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cov"))
    )
    cov_safe = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    return d.join(cov, "doc_id", "left").select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.sequence(F.lit(1), F.size("t")),
                    lambda p: ~F.array_contains(cov_safe, p),
                ),
                lambda p: F.element_at(F.col("t"), p),
            ),
        ).alias("new_text"),
    )


# ---------------------------------------------------------------------------
# Round-6 batch 3: debounce, percent rank, exact least-squares trend,
# table profiling
# ---------------------------------------------------------------------------

DEBOUNCE_USEC = 5 * 60 * 1_000_000  # 5 minutes


@register(
    "dedup_events_debounce",
    f"""
    SELECT event_id, user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS t
    FROM (
        SELECT event_id, user_id, event_type, ts,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS dt
        FROM events)
    WHERE dt IS NULL OR dt > {DEBOUNCE_USEC}
    """,
)
def dedup_events_debounce(spark, sf_dir):
    """Gap-based event thinning: keep an event only when the SAME
    (user, type)'s previous event is more than {DEBOUNCE_USEC} µs older
    — the sensor/telemetry de-bounce that collapses bursts of repeated
    signals before sessionization or counting.  (This is thinning
    relative to the previous RAW event — one lag window, stateless;
    strict debounce relative to the last KEPT event is a running fold,
    not a window — ``streaming/debounce.py stream_debounce`` provides
    exactly that as a stateful streaming operator, semantics difference
    pinned in tests/test_streaming_debounce.py.)

    One lag window on (user, type): single shuffle, predicate on an
    integer delta — no float, no boundary risk.  At 100 TB the window
    keys are fine-grained (user × type), so no hot partitions."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    t = ts_usec()
    return (
        events.withColumn("dt", t - F.lag(t).over(w))
        .filter(F.col("dt").isNull() | (F.col("dt") > DEBOUNCE_USEC))
        .select(
            "event_id", "user_id", "event_type", t.alias("t")
        )
    )


@register(
    "value_percent_rank",
    """
    SELECT event_id, event_type, value,
           percent_rank() OVER (
               PARTITION BY event_type ORDER BY value) AS pr
    FROM events
    """,
)
def value_percent_rank(spark, sf_dir):
    """Empirical CDF position of every value within its event type —
    percent_rank = (rank-1)/(n-1), the normalization step before
    cross-type comparison or rank-based feature engineering.  Both
    engines define it identically from integer rank and count, so the
    one division is of identical operands (ties share a rank on both
    sides).  One window shuffle per type partition."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return events.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "user_value_trend",
    """
    WITH c AS (
        SELECT user_id,
               epoch_us(ts) - min(epoch_us(ts)) OVER (
                   PARTITION BY user_id) AS x,
               CAST(ROUND(value * 1000000, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM c GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * 86400000000.0 / 1000000.0 AS DOUBLE) AS slope_per_day
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx > 0
    """,
)
def user_value_trend(spark, sf_dir):
    """Per-user least-squares trend of value over time (slope in
    value-units/day) — regression AS aggregation: the drift detector
    behind engagement/health scoring, computed in one grouped pass
    instead of per-key model fits.

    Exactness: timestamps are centered per user (window min) so the
    moment sums fit exact integer types — x ≤ the user's time span in
    µs, y in micro-units — and every Σx, Σy, Σxy, Σx² is EXACT
    (HUGEINT / decimal(38,0)); the closed form
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is integer-exact until ONE double
    division, then two scale multiplies — identical IEEE ops on
    identical operands, emitted raw.  Without centering, (Σx)² at
    epoch-µs magnitude (~10³⁹) would overflow both engines' 38-digit
    types — the centering IS the numeric design.

    One window + one aggregation, both on user_id: a single shuffle."""
    (events,) = load(spark, sf_dir, "events")
    t = ts_usec()
    c = events.select(
        "user_id",
        (
            t - F.min(t).over(Window.partitionBy("user_id"))
        ).alias("x"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("y"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("decimal(38,0)")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("decimal(38,0)")
    return (
        s.withColumn("num", num)
        .withColumn("den", den)
        .filter((F.col("n") >= 2) & (F.col("den") > 0))
        .select(
            "user_id",
            "n",
            (
                F.col("num").cast("double")
                / F.col("den").cast("double")
                * 86400000000.0
                / 1000000.0
            )
            .cast("double")
            .alias("slope_per_day"),
        )
    )


@register(
    "table_profile_events",
    """
    SELECT 'user_id' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(user_id) AS n_nulls,
           COUNT(DISTINCT user_id) AS n_distinct FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
           COUNT(DISTINCT event_type) FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
           COUNT(DISTINCT value) FROM events
    UNION ALL
    SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts),
           COUNT(DISTINCT ts) FROM events
    UNION ALL
    SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
           COUNT(DISTINCT props) FROM events
    """,
)
def table_profile_events(spark, sf_dir):
    """Column-level data profile — row count, null count, exact
    distinct cardinality per column — the data-quality audit run before
    trusting a new drop (nulls where none belong, cardinality drift,
    constant columns).

    One aggregation computes every column's stats in a single scan
    (COUNT(col) vs COUNT(*) for nulls, COUNT(DISTINCT col) per
    column), then unpivots to the long (column_name, stats) shape —
    Catalyst expands the multi-distinct into grouped dedup passes with
    partial aggregation.  At 100 TB swap exact distincts for
    approx_count_distinct (operators/approx.py HLL) — same shape, one
    pass, bounded state."""
    (events,) = load(spark, sf_dir, "events")
    agg = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}")
            for c in ("user_id", "event_type", "value", "ts", "props")
        ],
        *[
            F.countDistinct(c).alias(f"dist_{c}")
            for c in ("user_id", "event_type", "value", "ts", "props")
        ],
    )
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nulls_{c}").alias("n_nulls"),
            F.col(f"dist_{c}").alias("n_distinct"),
        )
        for c in ("user_id", "event_type", "value", "ts", "props")
    ]
    return agg.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.column_name", "r.n_rows", "r.n_nulls", "r.n_distinct")


# ---------------------------------------------------------------------------
# Round-6 batch 4: full-outer join coverage + exact Pearson correlation
# ---------------------------------------------------------------------------


@register(
    "full_outer_daily_activity",
    """
    WITH c AS (
        SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY user_id, day
    ), p AS (
        SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           CAST(epoch_us(coalesce(c.day, p.day)) AS BIGINT) AS day_usec,
           coalesce(c.n_clicks, 0) AS n_clicks,
           coalesce(p.n_purchases, 0) AS n_purchases,
           c.day IS NOT NULL AND p.day IS NOT NULL AS both_active
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    """,
)
def full_outer_daily_activity(spark, sf_dir):
    """Per-(user, day) reconciliation of two activity streams — click
    days vs purchase days, with zero-filled counts and a both-active
    flag: the FULL OUTER join shape (every other join flavor —
    inner/left/semi/anti/asof/range/band — already has a registered
    query; this completes the set).  Purchase-without-click days are
    attribution holes; click-without-purchase days feed the funnel —
    both null sides of the join carry meaning, which is exactly when
    FULL OUTER is the right tool.

    Two filtered daily aggregates (map-side partial, type predicate
    rides the scan) full-outer-joined on the (user, day) key.  At
    100 TB both sides are |users|·|days| at most — the join keys are
    fine-grained, no hot partitions, and Spark plans a sort-merge full
    outer which AQE sizes; the cost lives in the two scans' partial
    aggregation, not the join."""
    (events,) = load(spark, sf_dir, "events")

    def daily(event_type: str, out: str):
        return (
            events.filter(F.col("event_type") == event_type)
            .groupBy(
                "user_id", F.date_trunc("day", F.col("ts")).alias("day")
            )
            .agg(F.count(F.lit(1)).alias(out))
        )

    c = daily("click", "n_clicks")
    p = daily("purchase", "n_purchases")
    return c.join(p, ["user_id", "day"], "full_outer").select(
        "user_id",
        ts_usec("day").alias("day_usec"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        (
            F.col("n_clicks").isNotNull() & F.col("n_purchases").isNotNull()
        ).alias("both_active"),
    )


@register(
    "user_value_correlation",
    """
    WITH c AS (
        SELECT user_id,
               epoch_us(ts) - min(epoch_us(ts)) OVER (
                   PARTITION BY user_id) AS x,
               CAST(ROUND(value * 1000000, 0) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM c GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS r
    FROM s
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def user_value_correlation(spark, sf_dir):
    """Per-user Pearson correlation of value against time — the
    normalized companion of ``user_value_trend`` (slope says how fast,
    r says how consistently): the drift-vs-noise separator.

    Same exact-moment discipline as the trend query: centered-µs x and
    micro-unit y keep Σx, Σy, Σxy, Σx², Σy² in exact integer types
    (HUGEINT / decimal(38,0)); the closed form touches floats only in
    the last three IEEE ops — two casts' multiply, one sqrt, one
    divide.  sqrt IS correctly rounded under IEEE-754 (unlike pow/exp,
    which are why the temperature-mix query family is NOT oracle-safe),
    so the result is bit-identical cross-engine and emitted raw.
    A built-in corr() would be a float-sum-order gamble instead.

    One window + one aggregation on user_id: a single shuffle."""
    (events,) = load(spark, sf_dir, "events")
    t = ts_usec()
    c = events.select(
        "user_id",
        (t - F.min(t).over(Window.partitionBy("user_id"))).alias("x"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("y"),
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("decimal(38,0)")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("decimal(38,0)")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("decimal(38,0)")
    return (
        s.withColumn("num", num)
        .withColumn("dx", dx)
        .withColumn("dy", dy)
        .filter((F.col("n") >= 2) & (F.col("dx") > 0) & (F.col("dy") > 0))
        .select(
            "user_id",
            "n",
            (
                F.col("num").cast("double")
                / F.sqrt(F.col("dx").cast("double") * F.col("dy").cast("double"))
            ).alias("r"),
        )
    )
