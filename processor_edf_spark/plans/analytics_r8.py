"""Round-8 additions: skew-immune rank/window alternatives and the
annotations-channel surface.

``percent_rank_cdf`` is the two-phase answer to the hot-key sweep's
honest finding (BASELINE.md --skew): a rows-level rank window
(``PARTITION BY event_type ORDER BY value``) sorts every row of a
partition on ONE task, so a hot partition is a straggler AQE cannot
split (salting is off the table — rank is order-dependent across the
whole partition).  The two-phase plan never windows over rows at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register

# order-preserving equi-width buckets for the two-level CDF; 1024 keeps
# per-bucket window partitions at rows/1024 per type while the
# bucket-offset frame stays broadcast-tiny (≤ (NB+2)·|types| rows)
PR_BUCKETS = 1024


def _type_value_cdf(ev):
    """Shared machinery of the two-phase rank family: from an
    (event_id, event_type, value) frame, build the per-distinct-value
    CDF — one map-side-combined count shuffle keyed by (type, bucket,
    value), a window over the broadcast-tiny bucket-totals frame for
    bucket offsets, and a cumsum window WITHIN each (type, bucket) —
    no window ever runs over event rows.  Returns the distinct-value
    frame with columns (event_type, value, cnt, rank_below, cum_incl,
    n): rank_below = rows with a strictly smaller value in the type,
    cum_incl = rows with value ≤ this one, n = type row count."""
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    b = ev.join(F.broadcast(rng), "event_type").withColumn(
        "bucket",
        F.when(F.col("hi") <= F.col("lo"), F.lit(1)).otherwise(
            F.width_bucket("value", "lo", "hi", F.lit(PR_BUCKETS))
        ),
    )
    counts = b.groupBy("event_type", "bucket", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    btot = counts.groupBy("event_type", "bucket").agg(
        F.sum("cnt").alias("bn")
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    boff = btot.withColumn(
        "off", F.sum("bn").over(wb) - F.col("bn")
    ).select("event_type", "bucket", "off")
    ntot = btot.groupBy("event_type").agg(F.sum("bn").alias("n"))
    wv = Window.partitionBy("event_type", "bucket").orderBy("value")
    cdf = counts.withColumn("cum", F.sum("cnt").over(wv))
    return (
        cdf.join(F.broadcast(boff), ["event_type", "bucket"])
        .join(F.broadcast(ntot), "event_type")
        .select(
            "event_type",
            "value",
            "cnt",
            (F.col("off") + F.col("cum") - F.col("cnt")).alias(
                "rank_below"
            ),
            (F.col("off") + F.col("cum")).alias("cum_incl"),
            "n",
        )
    )


@register(
    "percent_rank_cdf",
    """
    SELECT event_id, event_type, value,
           percent_rank() OVER (
               PARTITION BY event_type ORDER BY value) AS pr
    FROM events
    """,
)
def percent_rank_cdf(spark, sf_dir):
    """Exact percent_rank without a per-partition rows window — the
    skew-mitigation twin of ``value_percent_rank`` (same oracle SQL, so
    the driver pins value-for-value equivalence).

    Phases: (1) count rows per distinct (type, bucket, value) — one
    map-side-combined shuffle, immune to a hot value or type; (2) the
    per-type CDF in two levels: bucket offsets from a window over the
    ≤(NB+2)·|types|-row bucket-totals frame, then a cumsum window over
    distinct values WITHIN each (type, bucket) — partitions of
    ~distinct/NB values each, parallel across buckets, no straggler;
    (3) join ranks back on (type, value) — an equi-join AQE can
    broadcast or skew-split.  percent_rank = rank_below/(n−1) on exact
    integer operands with one double division, the identical IEEE
    expression both engines evaluate (the float-parity discipline of
    interp_linear_hourly).

    Degenerate case: a value distribution concentrated into one
    equi-width bucket degrades to the distinct-values-per-type window
    (still never the rows window); equi-depth boundaries from
    percentile_approx are the documented refinement if a corpus hits
    it.  Scale: every shuffle is keyed by (type, value) or (type,
    bucket) — cardinality ≥ NB per type — so a 10%-hot partition
    spreads instead of serializing (sweep rows in BASELINE.md)."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select("event_id", "event_type", "value")
    ranked = _type_value_cdf(ev).select(
        "event_type",
        "value",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            F.col("rank_below").cast("double")
            / (F.col("n") - F.lit(1)).cast("double")
        )
        .alias("pr"),
    )
    return ev.join(ranked, ["event_type", "value"]).select(
        "event_id", "event_type", "value", "pr"
    )


@register(
    "annotations_tal_parse",
    """
    SELECT CAST(user_id AS VARCHAR) AS file,
           event_id AS record,
           CAST(1 AS INTEGER) AS tal_idx,
           CAST(epoch_us(ts) AS DOUBLE) AS onset_sec,
           CAST(event_id % 1000 AS DOUBLE) AS duration_sec,
           event_type AS text
    FROM events
    WHERE event_type IS NOT NULL
    """,
)
def annotations_tal_parse(spark, sf_dir):
    """The EDF+ TAL annotation parser as a driver-checked row — the
    publish half of the channel the reference collects but never writes
    (edf_processor/edf.py:117-118).  Builds a spec-shaped TAL byte
    stream per event — a record-start TAL (``+t\\x14\\x14``, empty
    text) followed by an annotation TAL with onset/duration/text —
    then runs the REAL production parser
    (``sources.edf.parse_tal_annotations``, the same declarative
    split/posexplode/regexp plan the EDF pipeline and the
    ``write_annotations_json`` sink use) over it.

    The oracle reproduces the parse arithmetically: synthesis uses only
    integer→string formatting (identical across engines), so a parser
    regression — record-start TALs leaking through, a dropped duration,
    1-based vs 0-based TAL indexing, separator mishandling — breaks the
    hash.  Scale: shuffle-free (synthesis, split, explode, regexp are
    all per-row projections); annotation volume is O(events), never
    O(samples)."""
    from processor_edf_spark.plans.registry import ts_usec
    from processor_edf_spark.sources.edf import parse_tal_annotations

    (events,) = load(spark, sf_dir, "events")
    t = ts_usec()
    dur = F.pmod(F.col("event_id"), F.lit(1000))
    raw = F.concat(
        F.lit("+"), t.cast("string"), F.lit("\x14\x14\x00"),
        F.lit("+"), t.cast("string"), F.lit("\x15"),
        dur.cast("string"), F.lit("\x14"),
        F.col("event_type"), F.lit("\x14\x00"),
    )
    ann = events.where(F.col("event_type").isNotNull()).select(
        F.col("user_id").cast("string").alias("file"),
        F.col("event_id").alias("record"),
        raw.cast("binary").alias("raw"),
    )
    return parse_tal_annotations(ann)


@register(
    "cume_dist_cdf",
    """
    SELECT event_id, event_type, value,
           cume_dist() OVER (
               PARTITION BY event_type ORDER BY value) AS cd
    FROM events
    """,
)
def cume_dist_cdf(spark, sf_dir):
    """Exact cume_dist from the same two-phase CDF machinery as
    ``percent_rank_cdf`` — cume_dist(v) = rows-with-value≤v / n, one
    double division of exact integers (the identical IEEE expression
    both engines evaluate).  Completes the rank family's no-rows-window
    story: ties share a cum_incl on both engines by construction, and
    every shuffle keys on (type, value)/(type, bucket), never a
    serialized per-type sort."""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select("event_id", "event_type", "value")
    ranked = _type_value_cdf(ev).select(
        "event_type",
        "value",
        (
            F.col("cum_incl").cast("double") / F.col("n").cast("double")
        ).alias("cd"),
    )
    return ev.join(ranked, ["event_type", "value"]).select(
        "event_id", "event_type", "value", "cd"
    )


NTILE_K = 4


@register(
    "ntile_cdf",
    """
    SELECT event_type, q, COUNT(*) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM (
        SELECT event_type, value,
               NTILE(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS q
        FROM events
    )
    GROUP BY event_type, q
    """,
)
def ntile_cdf(spark, sf_dir):
    """Exact NTILE(4) without the per-type rows window — the same
    oracle SQL as ``ntile_value_quartiles``, so the driver pins the
    two plans equivalent.  The global (value, event_id) row_number a
    tile assignment needs decomposes as rank_below(value) — from the
    two-phase CDF — plus a row_number WITHIN the (type, value) tie
    group ordered by event_id: windows over tie groups are
    per-distinct-value partitions, so a hot event_type spreads across
    its values instead of serializing into one sort task.

    Tile arithmetic is SQL-standard NTILE on exact integers: with
    n = q·k + r, the first r tiles take q+1 rows — both branches are
    integer div/mod, no floats to drift.  (Rows with rn beyond the
    padded region only exist when q ≥ 1, so the otherwise-branch's
    division is never by zero on rows it evaluates for.)"""
    (events,) = load(spark, sf_dir, "events")
    ev = events.select("event_id", "event_type", "value")
    ranked = _type_value_cdf(ev).select(
        "event_type", "value", "rank_below", "n"
    )
    wtie = Window.partitionBy("event_type", "value").orderBy("event_id")
    rows = (
        ev.join(ranked, ["event_type", "value"])
        .withColumn(
            "rn", F.col("rank_below") + F.row_number().over(wtie)
        )
    )
    q = (F.col("n") / NTILE_K).cast("long")  # floor: n, k positive
    r = F.col("n") % NTILE_K
    padded = r * (q + 1)  # rows living in the (q+1)-sized tiles
    tile = F.when(
        F.col("rn") <= padded,
        ((F.col("rn") - 1) / (q + 1)).cast("long") + 1,
    ).otherwise(
        r + ((F.col("rn") - padded - 1) / q).cast("long") + 1
    )
    return (
        rows.withColumn("q", tile.cast("int"))
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
