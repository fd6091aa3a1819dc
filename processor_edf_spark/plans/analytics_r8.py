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

from processor_edf_spark.plans.registry import load, register, spread

# order-preserving equi-width buckets for the two-level CDF; 1024 keeps
# per-bucket window partitions at rows/1024 per type while the
# bucket-offset frame stays broadcast-tiny (≤ (NB+2)·|types| rows)
PR_BUCKETS = 1024


def _rank_rows(events):
    """Common input frame of the two-phase rank family: non-null
    (event_type, value) rows ONLY, enforced identically in the oracle
    SQL.  Null rows in a rank window are cross-engine-undefined anyway
    (Spark orders NULLS FIRST, DuckDB NULLS LAST — ranks of every
    non-null row shift), and an equi-join back on (type, value) would
    silently drop them here while the window versions emitted them —
    the latent-parity class the r8 audit fixes called out.  Filtering
    BOTH sides makes the contract explicit instead of latent."""
    return events.select("event_id", "event_type", "value").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )


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
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    """,
)
def percent_rank_cdf(spark, sf_dir):
    """Exact percent_rank without a per-partition rows window — the
    skew-mitigation twin of ``value_percent_rank`` (same oracle SQL
    restricted to non-null rows — see ``_rank_rows`` — so the driver
    pins value-for-value equivalence on the whole non-null domain).

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
    ev = _rank_rows(events)
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
    WHERE value IS NOT NULL AND event_type IS NOT NULL
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
    ev = _rank_rows(events)
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
        WHERE value IS NOT NULL AND event_type IS NOT NULL
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
    ev = _rank_rows(events)
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
    # all-integer tile arithmetic: `div` is Spark SQL's integer
    # division, so no double rounds between the exact longs (a
    # `/`-then-cast can land one ULP under an exact quotient and
    # truncate a tile low on large groups)
    rows = rows.withColumn(
        "_q", F.expr(f"n div {NTILE_K}")
    ).withColumn("_r", F.col("n") % NTILE_K)
    padded = F.col("_r") * (F.col("_q") + 1)
    tile = F.when(
        F.col("rn") <= padded,
        F.expr("(rn - 1) div (_q + 1)") + 1,
    ).otherwise(
        F.col("_r") + F.expr("(rn - (_r * (_q + 1)) - 1) div _q") + 1
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


# ---------------------------------------------------------------------------
# fixed-point PageRank over the event-type transition graph (graph family)
# ---------------------------------------------------------------------------

PR_FP_SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units
PR_FP_ITERS = 10


def _pagerank_fp_oracle() -> str:
    """Build the oracle SQL: the 10 iterations unrolled as chained CTEs
    (recursive-member aggregation is not portable SQL), every step the
    SAME integer recurrence the Spark side runs — per-edge floor-div
    contribution, exact integer sums, so iteration order and engine
    cannot drift a single unit."""
    head = f"""
    WITH s AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ), e AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM s WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ), outt AS (
        SELECT from_type, SUM(cnt) AS tot FROM e GROUP BY from_type
    ), nodes AS (
        SELECT DISTINCT t FROM (
            SELECT from_type AS t FROM e
            UNION SELECT to_type AS t FROM e
        )
    ), consts AS (
        -- // (floor division): DuckDB's / on integers divides in
        -- float and CAST rounds-to-nearest, which differs from the
        -- Python side's floor for any node count that does not divide
        -- the scale exactly (n=6: 166666666667 vs ...666)
        SELECT CAST({PR_FP_SCALE} // COUNT(*) AS BIGINT) AS r0,
               CAST({PR_FP_SCALE} * 15 // 100 // COUNT(*) AS BIGINT)
                   AS base
        FROM nodes
    ), pr0 AS (
        SELECT t AS node, (SELECT r0 FROM consts) AS rank FROM nodes
    )"""
    steps = []
    for i in range(1, PR_FP_ITERS + 1):
        steps.append(f""", pr{i} AS (
        SELECT nd.t AS node,
               (SELECT base FROM consts)
                   + 85 * COALESCE(c.s, 0) // 100 AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.to_type AS node,
                   SUM(p.rank * e.cnt // o.tot) AS s
            FROM pr{i - 1} p
            JOIN e ON e.from_type = p.node
            JOIN outt o ON o.from_type = p.node
            GROUP BY e.to_type
        ) c ON c.node = nd.t
    )""")
    tail = f"""
    SELECT node, CAST(rank AS BIGINT) AS rank_fp
    FROM pr{PR_FP_ITERS}
    """
    return head + "".join(steps) + tail


@register("pagerank_type_graph", _pagerank_fp_oracle())
def pagerank_type_graph(spark, sf_dir):
    """PageRank over the event-type transition graph as a driver-hashed
    graph-family row — importance of each event type in the behavioral
    Markov graph the ``event_transitions`` matrix defines.

    Cross-engine float drift is the reason iterative PageRank normally
    cannot face a value oracle (summation order changes the double).
    This plan removes floats entirely: ranks live in 1e12 fixed-point
    BIGINT units and each iteration is
    ``base + 85 * Σ_edges(rank·cnt // out_total) // 100`` — per-edge
    FLOOR division before the sum, so the result is a pure integer
    recurrence both engines reproduce bit-for-bit (10 unrolled
    iterations in the oracle; same loop here).  Dangling mass is
    dropped by construction — deterministic, documented; the
    float-precision production operator remains ``operators/pagerank``
    (pytest-verified against numpy).

    Scale: the heavy stage is the distributed bigram aggregation over
    events (map-side-combined, |types|² output — same shape as
    ``event_transitions``); the iteration then runs driver-side over
    the bounded type-vocabulary graph, the same dimension-scale
    collect discipline as the channel registry and MG sketch (bounded
    by schema, never by data volume)."""
    (events,) = load(spark, sf_dir, "events")
    s = events.select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    edges = {
        (r["from_type"], r["to_type"]): r["cnt"]
        for r in s.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    out_tot: dict[str, int] = {}
    for (u, _v), c in edges.items():
        out_tot[u] = out_tot.get(u, 0) + c
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    if n == 0:
        # a corpus where no user has two consecutive events has no
        # transition edges; the oracle's empty-join CTE chain returns
        # zero rows, so match it instead of dividing by zero below
        return spark.createDataFrame([], "node string, rank_fp long")
    r0 = PR_FP_SCALE // n
    base = PR_FP_SCALE * 15 // 100 // n
    rank = {v: r0 for v in nodes}
    for _ in range(PR_FP_ITERS):
        contrib = {v: 0 for v in nodes}
        for (u, v), c in edges.items():
            contrib[v] += rank[u] * c // out_tot[u]
        rank = {v: base + 85 * contrib[v] // 100 for v in nodes}
    return spark.createDataFrame(
        [(v, rank[v]) for v in nodes], "node string, rank_fp long"
    )


@register(
    "image_decode_stats",
    """
    SELECT d.doc_id,
           CAST(4 + d.doc_id % 5 AS INTEGER) AS width,
           CAST(3 + d.doc_id % 4 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN x.g < 4 + d.doc_id % 5
                          AND y.g < 3 + d.doc_id % 4
                         THEN (d.doc_id + x.g + y.g) % 256 END)
                AS BIGINT) AS sum_r
    FROM documents d, range(0, 8) x(g), range(0, 6) y(g)
    GROUP BY d.doc_id
    """,
)
def image_decode_stats(spark, sf_dir):
    """The real image codec path as a driver-hashed multimodal row —
    the media sibling of ``annotations_tal_parse``: per document, a
    deterministic gradient image (dims and R channel pure integer
    functions of doc_id) is ENCODED to real PPM bytes and DECODED back
    through the production ``decode_image`` dispatch inside an
    Arrow-batched ``mapInPandas``, emitting decoded dims and the exact
    integer R-channel sum.  The oracle computes the same stats in
    closed form, so any codec regression — a stride bug, channel swap,
    header misparse — breaks dims or sum and the row goes red.

    Scale: embarrassingly parallel per-row kernel, no shuffle; media
    payload bytes never leave the executor (only O(1) stats per doc
    cross the wire) — the decode-heavy / emit-light shape a 100 TB
    multimodal corpus requires."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    # no spread(): measured 0.48 s single-task vs 0.86 s spread at
    # sf0.1 — this kernel is ~0.1 ms/doc, lighter than the shuffle it
    # would ride (video_frame_stats, ~7 ms/doc, is the opposite case)

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.media_codecs import (
            decode_image,
            encode_ppm,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = ((d + x + y) % 256).astype(np.uint8)
                img = np.stack(
                    [r, np.zeros_like(r), np.full_like(r, 7)], axis=2
                )
                dec = decode_image(encode_ppm(img))  # the REAL path
                rows.append(
                    (
                        d,
                        dec.shape[1],
                        dec.shape[0],
                        int(dec[:, :, 0].astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "sum_r"]
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, width int, height int, sum_r long"
    )


@register(
    "audio_decode_stats",
    """
    SELECT d.doc_id,
           CAST(50 + d.doc_id % 50 AS BIGINT) AS n_frames,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(SUM(CASE WHEN i.g < 50 + d.doc_id % 50
                         THEN (d.doc_id * 31 + i.g * 7) % 65536 - 32768
                    END) AS BIGINT) AS sum_pcm
    FROM documents d, range(0, 100) i(g)
    GROUP BY d.doc_id
    """,
)
def audio_decode_stats(spark, sf_dir):
    """The real WAV codec path as a driver-hashed row — the audio twin
    of ``image_decode_stats``: per document a deterministic int16 PCM
    signal is encoded to a real RIFF/WAVE payload and decoded back
    through the production ``decode_wav_pcm``, emitting frame count,
    rate, and the EXACT integer sample sum.  Exactness chain: the
    encoder stores round(f·32767) and the decoder returns raw/32768.0
    (a power-of-two divide, lossless in float64), so
    round(decoded·32768) recovers every int16 bit-for-bit and the sum
    faces a closed-form oracle.  Scale: same decode-heavy/emit-light
    no-shuffle shape as the image row."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    # no spread(): same measured trade as image_decode_stats

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.media_codecs import (
            decode_wav_pcm,
            encode_wav_pcm16,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 50 + d % 50
                s = ((d * 31 + np.arange(n) * 7) % 65536 - 32768).astype(
                    np.int64
                )
                payload = encode_wav_pcm16(s / 32767.0, 8000)
                rate, _nch, dec = decode_wav_pcm(payload)  # REAL path
                got = np.round(dec[:, 0] * 32768.0).astype(np.int64)
                rows.append((d, len(got), rate, int(got.sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "sample_rate", "sum_pcm"],
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema="doc_id long, n_frames long, sample_rate int, sum_pcm long",
    )


@register(
    "video_frame_stats",
    """
    SELECT d.doc_id,
           CAST(3 + d.doc_id % 5 AS BIGINT) AS n_frames,
           CAST(40000 AS BIGINT) AS usec_per_frame,
           CAST(SUM(CASE WHEN i.g < 3 + d.doc_id % 5
                         THEN 2 + (d.doc_id + i.g) % 3 END)
                AS BIGINT) AS sum_len,
           CAST(SUM(CASE WHEN i.g < 3 + d.doc_id % 5
                         THEN (d.doc_id + i.g) % 256 END)
                AS BIGINT) AS sum_first,
           CAST(((d.doc_id + 2 + d.doc_id % 5) % 251) * 48 AS BIGINT)
               AS anim_px_sum
    FROM documents d, range(0, 8) i(g)
    GROUP BY d.doc_id
    """,
)
def video_frame_stats(spark, sf_dir):
    """The real video container path as a driver-hashed row —
    completing the image/audio/video codec triple under the value
    oracle: per document a deterministic frame list is muxed into a
    real RIFF/AVI payload and demuxed back through the production
    ``demux_avi_frames`` (chunk walk, idx1, odd-size padding), emitting
    frame count, frame interval, and exact integer sums of frame
    lengths and first bytes against a closed-form oracle.  Frames of
    length 2+(d+i)%3 exercise the odd/even chunk-padding branch both
    ways.  r14 continuation: the same doc also muxes an animated WebP
    (VP8X/ANIM/ANMF, real VP8L frame payloads) and composes it back
    through ``compose_webp_anim``; every canvas must equal the
    closed-form solid color or anim_px_sum flips to -1.  Scale: same
    decode-heavy/emit-light shape as its siblings; the per-doc kernel
    runs under spread() (the r14-continuation's animated-WebP sweep
    multiplied per-doc CPU ~100x, and the single-file scan reads as ONE
    partition — 35.8 s on one core at sf0.1, 1/32 of the host busy;
    spread() restores the sibling rows' full-width layout, a no-op at
    real scale where the splitter already yields enough partitions)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    docs = spread(spark, docs.select("doc_id"))

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.media_codecs import (
            demux_avi_frames,
            encode_avi_raw,
        )
        from processor_edf_spark.operators.webp import (
            compose_webp_anim,
            encode_webp_anim,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 3 + d % 5
                frames = [
                    bytes([(d + i) % 256] * (2 + (d + i) % 3))
                    for i in range(nf)
                ]
                upf, got = demux_avi_frames(
                    encode_avi_raw(frames, usec_per_frame=40_000)
                )
                afr = [
                    (0, 0, 33, False,
                     np.full((4, 4, 3), (d + i) % 251, np.uint8))
                    for i in range(nf)
                ]
                _loop, canvases = compose_webp_anim(
                    encode_webp_anim(afr, 4, 4, background=(0, 0, 0))
                )
                anim_ok = len(canvases) == nf and all(
                    np.array_equal(
                        cv,
                        np.full((4, 4, 3), (d + i) % 251, np.uint8),
                    )
                    for i, cv in enumerate(canvases)
                )
                anim_px_sum = (
                    ((d + nf - 1) % 251) * 48 if anim_ok else -1
                )
                rows.append(
                    (
                        d,
                        len(got),
                        upf,
                        sum(len(f) for f in got),
                        sum(f[0] for f in got),
                        anim_px_sum,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "usec_per_frame",
                    "sum_len",
                    "sum_first",
                    "anim_px_sum",
                ],
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, usec_per_frame long, "
            "sum_len long, sum_first long, anim_px_sum long"
        ),
    )


@register(
    "edf_header_parse",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events)
    SELECT user_id,
           CAST(10 + user_id % 90 AS BIGINT) AS nb_data_rec,
           CAST(1 AS DOUBLE) AS duration,
           CAST(2 AS BIGINT) AS nb_signal,
           'EEG F' || CAST(user_id % 9 AS VARCHAR) AS label0,
           'EMG c' || CAST(user_id % 7 AS VARCHAR) AS label1,
           CAST(100 + user_id % 100 AS BIGINT) AS nr0,
           CAST(200 AS BIGINT) AS nr1,
           CAST((10 + user_id % 90) * (300 + user_id % 100) AS BIGINT)
               AS total_samples
    FROM u
    """,
)
def edf_header_parse(spark, sf_dir):
    """The EDF global+signal header parser (S2/S3) as a driver-hashed
    row — previously pytest-only because real .edf bytes have no DuckDB
    form.  Per distinct user a spec-layout header block (256-byte
    global + 2×256-byte signal arrays, space-padded fixed-width ASCII
    per EDF spec / reference edf.py:34-55) is synthesized from
    deterministic field values, then parsed back by the PRODUCTION
    ``parse_edf_header`` inside mapInPandas; the oracle reproduces the
    field values arithmetically.  Any layout drift — an off-by-one
    offset, a wrong field width, transposed signal arrays (the classic
    EDF bug: per-signal fields are COLUMN-major, all labels then all
    transducers) — changes a parsed value and reds the row.
    ``total_samples`` is the A3 header arithmetic
    (nb_data_rec · Σ nr_samples) computed from PARSED values.
    Scale: shuffle cost is one distinct over user_id; parse is per-row
    CPU, no data movement."""
    import pandas as pd

    (events,) = load(spark, sf_dir, "events")
    users = events.select("user_id").distinct()

    def gen(batches):
        from processor_edf_spark.sources.edf import parse_edf_header

        def field(v, w):
            return str(v).ljust(w)[:w].encode()

        for pdf in batches:
            rows = []
            for uid in pdf["user_id"]:
                u = int(uid)
                nrec, nr0 = 10 + u % 90, 100 + u % 100
                labels = [f"EEG F{u % 9}", f"EMG c{u % 7}"]
                g = b"".join(
                    [
                        field(0, 8),
                        field(f"P{u}", 80),
                        field(f"R{u}", 80),
                        field("02.01.11", 8),
                        field("12.30.00", 8),
                        field(256 + 256 * 2, 8),
                        field("", 44),
                        field(nrec, 8),
                        field(1, 8),
                        field(2, 4),
                    ]
                )
                # per-signal arrays are COLUMN-major (all labels, then
                # all transducers, ...) — the layout under test
                sig = (
                    b"".join(field(lb, 16) for lb in labels)
                    + b"".join(field("", 80) for _ in labels)      # transducer
                    + b"".join(field("uV", 8) for _ in labels)     # phy_dim
                    + b"".join(field(-100, 8) for _ in labels)     # phy_min
                    + b"".join(field(100, 8) for _ in labels)      # phy_max
                    + b"".join(field(-2048, 8) for _ in labels)    # dig_min
                    + b"".join(field(2047, 8) for _ in labels)     # dig_max
                    + b"".join(field("", 80) for _ in labels)      # prefilter
                    + b"".join(field(n, 8) for n in (nr0, 200))    # nr_samples
                    + b"".join(field("", 32) for _ in labels)      # reserved
                )
                h = parse_edf_header(g + sig)  # the REAL parser
                rows.append(
                    (
                        u,
                        h["nb_data_rec"],
                        h["duration"],
                        h["nb_signal"],
                        h["labels"][0],
                        h["labels"][1],
                        h["nr_samples"][0],
                        h["nr_samples"][1],
                        h["nb_data_rec"] * sum(h["nr_samples"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id",
                    "nb_data_rec",
                    "duration",
                    "nb_signal",
                    "label0",
                    "label1",
                    "nr0",
                    "nr1",
                    "total_samples",
                ],
            )

    return users.mapInPandas(
        gen,
        schema=(
            "user_id long, nb_data_rec long, duration double, "
            "nb_signal long, label0 string, label1 string, "
            "nr0 long, nr1 long, total_samples long"
        ),
    )
