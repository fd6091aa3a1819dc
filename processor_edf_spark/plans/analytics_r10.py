"""Round-10 analytics plans.

The two-phase, skew-immune flavor of the per-user EWMA, and the VP8L
(WebP lossless) and FLAC codec driver rows.
``ewma_user_values`` (plans/analytics_extra.py) is exact but shuffles
whole users into single window tasks — a 10% hot user degrades it
1.8–2.05× in the ×64 skew sweep (BASELINE.md ``--skew``).  The
two-phase plan here computes the SAME per-row result (bit-equal — same
values folded in the same IEEE order) while keying its heavy shuffle by
(user, time-chunk) so a hot user's rows spread across ~30 tasks instead
of serializing into one.  Registered under the same oracle SQL as
``ewma_user_values``, so the driver pins the two plans equivalent — the
same discipline as ``percent_rank_cdf`` vs ``value_percent_rank``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processor_edf_spark.plans.analytics_extra import EWMA_ALPHA, EWMA_WINDOW
from processor_edf_spark.plans.registry import load, register, spread

# One-day chunks: the testdata's event streams span ~30 days at every
# SF, so a hot user spreads over ~30 (user, chunk) tasks.  Chunk size
# only affects performance, never results — every row's frame is
# reassembled exactly.
EWMA_CHUNK_US = 86_400_000_000


@register(
    "ewma_user_twophase",
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
def ewma_user_twophase(spark, sf_dir):
    """Two-phase exact EWMA — bit-equal to ``ewma_user_values`` without
    the per-user single-task window.

    The trailing-{EWMA_WINDOW} truncation is what makes an exact
    decomposition possible: each row's EWMA is a pure left fold over its
    last ≤{EWMA_WINDOW} values, so any plan that reassembles the same
    value sequence per row and folds it in the same order reproduces the
    result bit-for-bit (no associativity gamble — unlike a
    (multiplier, offset) segment composition, which reorders the IEEE
    multiply/adds and drifts ulps against the oracle).

    Phases:

    1. **Chunk-local** (shuffle keyed (user, chunk), chunk = day of
       event time): row_number + trailing-{EWMA_WINDOW} collect_list
       per chunk — the heavy, per-row state, now spread across a hot
       user's ~30 day-chunks instead of one task.
    2. **Tails** (tiny): the last ≤{EWMA_WINDOW - 1} values of each
       chunk; a per-USER window over *chunks* (≈30 rows/user, not
       thousands) flattens the preceding tails and keeps the last
       {EWMA_WINDOW - 1} — exactly the values that can reach into the
       next chunk's frames.  Any value a tail drops is ≥{EWMA_WINDOW}
       deep in its own chunk and so unreachable from any later row.
    3. **Reassemble**: equi-join carries back on (user, chunk) — the
       same hash partitioning the window produced, so the big side
       does not re-shuffle — and take the last {EWMA_WINDOW} of
       carry ++ local-prefix.  Rows ≥{EWMA_WINDOW} deep in their chunk
       skip the carry entirely (their frame is chunk-local).

    The fold expression is literally the one ``ewma_user_values``
    runs — same seed (oldest in-frame value), same per-step multiply/
    add — on an identical value sequence, hence bit-equal, hence the
    SAME raw-float oracle hash."""
    (events,) = load(spark, sf_dir, "events")
    w1 = EWMA_WINDOW - 1
    ev = (
        events.select(
            "event_id",
            "user_id",
            "value",
            F.expr("unix_micros(cast(ts as timestamp))").alias("t_us"),
        )
        .withColumn("chunk", F.expr(f"t_us div {EWMA_CHUNK_US}"))
    )
    wloc = Window.partitionBy("user_id", "chunk").orderBy("t_us", "event_id")
    rows = ev.withColumn("rn_c", F.row_number().over(wloc)).withColumn(
        "l_local",
        F.collect_list("value").over(wloc.rowsBetween(-w1, 0)),
    )
    # chunk tails: at each chunk's last row, l_local holds the trailing
    # min(EWMA_WINDOW, chunk size) values; the next chunks can only see
    # the last EWMA_WINDOW-1 of them
    tails = (
        rows.withColumn(
            "n_c", F.count(F.lit(1)).over(Window.partitionBy("user_id", "chunk"))
        )
        .filter(F.col("rn_c") == F.col("n_c"))
        .select(
            "user_id",
            "chunk",
            F.when(
                F.size("l_local") >= EWMA_WINDOW,
                F.expr(f"slice(l_local, 2, {w1})"),
            )
            .otherwise(F.col("l_local"))
            .alias("tail"),
        )
    )
    wchunks = (
        Window.partitionBy("user_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = tails.withColumn(
        "prev_tails", F.collect_list("tail").over(wchunks)
    ).select(
        "user_id",
        "chunk",
        F.expr(
            f"CASE WHEN size(flatten(prev_tails)) > {w1} "
            f"THEN slice(flatten(prev_tails), -{w1}, {w1}) "
            f"ELSE flatten(prev_tails) END"
        ).alias("carry"),
    )
    frame = (
        f"CASE WHEN rn_c >= {EWMA_WINDOW} THEN l_local "
        f"WHEN size(concat(carry, l_local)) > {EWMA_WINDOW} "
        f"THEN slice(concat(carry, l_local), -{EWMA_WINDOW}, {EWMA_WINDOW}) "
        f"ELSE concat(carry, l_local) END"
    )
    return (
        rows.join(carries, ["user_id", "chunk"])
        .withColumn("frame", F.expr(frame))
        .select(
            "event_id",
            "user_id",
            F.expr(
                f"aggregate(slice(frame, 2, size(frame) - 1),"
                f" element_at(frame, 1),"
                f" (acc, x) -> acc * {1 - EWMA_ALPHA}D + x * {EWMA_ALPHA}D)"
            ).alias("ewma"),
        )
    )


@register(
    "webp_decode_stats",
    """
    SELECT d.doc_id,
           CAST(3 + d.doc_id % 6 AS INTEGER) AS width,
           CAST(2 + d.doc_id % 5 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN x.g < 3 + d.doc_id % 6
                          AND y.g < 2 + d.doc_id % 5
                         THEN (d.doc_id + 3 * x.g + 5 * y.g) % 256
                            + (2 * d.doc_id + x.g + 7 * y.g) % 256
                            + (5 * d.doc_id + 2 * x.g + y.g) % 256
                    END) AS BIGINT) AS sum_rgb
    FROM documents d, range(0, 8) x(g), range(0, 6) y(g)
    GROUP BY d.doc_id
    """,
)
def webp_decode_stats(spark, sf_dir):
    """The pure-python VP8L (WebP lossless) codec path as a
    driver-hashed row — the WebP sibling of ``image_decode_stats``:
    per document a deterministic RGB gradient (all three channels pure
    integer functions of doc_id) is ENCODED to a real RIFF/WEBP VP8L
    payload (`operators/webp.py`, alternating the subtract-green
    transform by doc parity so both encoder paths face the oracle) and
    DECODED back through the production ``decode_image`` magic-byte
    dispatch, emitting decoded dims and the exact integer sum over all
    channels.  Lossless end to end, so the closed-form oracle matches
    bit-for-bit; any VP8L regression — a prefix-code slip, transform
    inverse bug, channel swap — breaks dims or sum and the row goes
    red.

    Scale: the same decode-heavy / emit-light shape as the other codec
    rows — payload bytes never leave the executor.  Unlike the numpy
    codec rows, the per-doc kernel here is pure-python bit twiddling
    (~ms per payload), so the scan is ``spread()`` across the session's
    shuffle width: a small single-file scan would otherwise serialize
    5 000 encode+decode kernels into one task (measured 6.9 s at sf0.1;
    0.6 s spread)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    docs = spread(spark, docs.select("doc_id"))

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.media_codecs import decode_image
        from processor_edf_spark.operators.webp import encode_webp_lossless

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 3 + d % 6, 2 + d % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                img = np.stack(
                    [
                        (d + 3 * x + 5 * y) % 256,
                        (2 * d + x + 7 * y) % 256,
                        (5 * d + 2 * x + y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                payload = encode_webp_lossless(
                    img, subtract_green=bool(d % 2)
                )
                dec = decode_image(payload)  # the REAL router + VP8L path
                rows.append(
                    (
                        d,
                        dec.shape[1],
                        dec.shape[0],
                        int(dec.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "sum_rgb"]
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, width int, height int, sum_rgb long"
    )


@register(
    "flac_decode_stats",
    """
    SELECT d.doc_id,
           CAST(50 + d.doc_id % 50 AS INTEGER) AS n_samples,
           CAST(2 AS INTEGER) AS n_channels,
           CAST(SUM(CASE WHEN i.g < 50 + d.doc_id % 50 THEN
                 ((d.doc_id * 7 + i.g * 13) % 4001) - 2000
               + ((d.doc_id * 3 + i.g * 11) % 4001) - 2000 END) AS BIGINT)
             AS sum_pcm
    FROM documents d, range(0, 100) i(g)
    GROUP BY d.doc_id
    """,
)
def flac_decode_stats(spark, sf_dir):
    """The pure-python FLAC codec path as a driver-hashed row — the
    audio twin of ``webp_decode_stats``: per document a deterministic
    stereo int16 waveform (both channels pure integer functions of
    doc_id) is ENCODED to a real FLAC stream (`operators/flac.py`,
    alternating mid/side vs independent stereo by doc parity and
    LPC vs fixed-order subframes by doc_id % 3, partitioned Rice
    residuals, multi-frame at blocksize 32) and DECODED back through
    the production ``decode_audio`` magic-byte router, emitting the
    decoded sample/channel counts and the exact integer PCM sum.
    Lossless end to end, so the closed-form oracle matches
    bit-for-bit; any FLAC regression — a Rice slip, predictor bug,
    decorrelation swap, CRC/MD5 miscompute — breaks counts or sum and
    the row goes red.

    Scale: decode-heavy / emit-light like the sibling codec rows —
    payload bytes never leave the executor.  The per-doc kernel is
    pure-python bit twiddling (~ms per payload), so the scan is
    ``spread()`` across the session's shuffle width (the
    webp_decode_stats precedent: a small single-file scan would
    otherwise serialize the encode+decode kernels into one task)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    docs = spread(spark, docs.select("doc_id"))

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.flac import encode_flac
        from processor_edf_spark.operators.media_codecs import decode_audio

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 50 + d % 50
                i = np.arange(n)
                left = (d * 7 + i * 13) % 4001 - 2000
                right = (d * 3 + i * 11) % 4001 - 2000
                payload = encode_flac(
                    np.stack([left, right], axis=1),
                    16000,
                    blocksize=32,
                    stereo="mid_side" if d % 2 else "independent",
                    subframe="lpc" if d % 3 == 0 else "fixed2",
                    partition_order=1,
                )
                rate, ch, dec = decode_audio(payload)  # the REAL router
                pcm = np.round(dec * 32768.0).astype(np.int64)
                rows.append((d, pcm.shape[0], ch, int(pcm.sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "n_channels", "sum_pcm"]
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, n_samples int, n_channels int, sum_pcm long"
    )


@register(
    "h264_decode_stats",
    """
    SELECT d.doc_id,
           CAST(2 * (8 + d.doc_id % 13) AS INTEGER) AS width,
           CAST(2 * (6 + d.doc_id % 9) AS INTEGER) AS height,
           CAST(1 + d.doc_id % 3 AS INTEGER) AS n_frames,
           CAST(SUM(
             CASE WHEN f.f < 1 + d.doc_id % 3
                   AND yy.y < 2 * (6 + d.doc_id % 9)
                   AND xx.x < 2 * (8 + d.doc_id % 13)
                  THEN (d.doc_id * 7 + 3 * xx.x + 5 * yy.y + 11 * f.f) % 256
                  ELSE 0 END
           + CASE WHEN f.f < 1 + d.doc_id % 3
                   AND yy.y < 6 + d.doc_id % 9
                   AND xx.x < 8 + d.doc_id % 13
                  THEN (d.doc_id * 5 + 2 * xx.x + 7 * yy.y + 3 * f.f) % 256
                     + (d.doc_id * 3 + 11 * xx.x + 2 * yy.y + 13 * f.f) % 256
                  ELSE 0 END) AS BIGINT) AS sum_yuv
    FROM documents d, range(0, 3) f(f), range(0, 28) yy(y), range(0, 40) xx(x)
    GROUP BY d.doc_id
    """,
)
def h264_decode_stats(spark, sf_dir):
    """The pure-python H.264 I_PCM codec path as a driver-hashed row —
    the video twin of ``webp_decode_stats``/``flac_decode_stats``: per
    document a deterministic 4:2:0 YUV clip (every plane a pure integer
    function of doc_id, pixel coords and frame index) is ENCODED to a
    real Annex-B H.264 stream (`operators/h264.py` — baseline SPS with
    real frame cropping for the non-multiple-of-16 geometries,
    1 + doc_id % 4 I_PCM slices per IDR picture, emulation-prevention
    escaping) and DECODED back through the production
    ``decode_h264_video`` plugin router, emitting the decoder's
    cropped geometry, frame count and the exact integer sample sum.
    I_PCM is lossless by construction, so the closed-form oracle
    matches bit-for-bit; any regression — an Exp-Golomb slip, a crop
    off-by-one, an escaping bug, slice reassembly out of order —
    breaks geometry, counts or sum and the row goes red.

    Scale: decode-heavy / emit-light like the sibling codec rows —
    payload bytes never leave the executor.  The per-doc kernel is
    pure-python bit twiddling (~ms per payload), so the scan is
    ``spread()`` across the session's shuffle width (the
    webp_decode_stats precedent: a small single-file scan would
    otherwise serialize the encode+decode kernels into one task)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    docs = spread(spark, docs.select("doc_id"))

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.h264 import encode_h264_ipcm
        from processor_edf_spark.operators.media_codecs import (
            decode_h264_video,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 2 * (8 + d % 13), 2 * (6 + d % 9)
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                xc = np.arange(w // 2)[None, :]
                yc = np.arange(h // 2)[:, None]
                frames = []
                for f in range(1 + d % 3):
                    frames.append((
                        ((d * 7 + 3 * x + 5 * y + 11 * f) % 256)
                        .astype(np.uint8),
                        ((d * 5 + 2 * xc + 7 * yc + 3 * f) % 256)
                        .astype(np.uint8),
                        ((d * 3 + 11 * xc + 2 * yc + 13 * f) % 256)
                        .astype(np.uint8),
                    ))
                payload = encode_h264_ipcm(
                    frames, w, h, slices_per_frame=1 + d % 4
                )
                dw, dh, dec = decode_h264_video(payload)  # the REAL router
                total = sum(
                    int(plane.astype(np.int64).sum())
                    for fr in dec
                    for plane in fr
                )
                rows.append((d, dw, dh, len(dec), total))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_frames", "sum_yuv"],
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema=(
            "doc_id long, width int, height int, n_frames int, sum_yuv long"
        ),
    )


@register(
    "tiff_decode_stats",
    """
    SELECT d.doc_id,
           CAST(17 + d.doc_id % 16 AS INTEGER) AS width,
           CAST(16 + d.doc_id % 13 AS INTEGER) AS height,
           CAST(SUM(
             CASE WHEN xx.x < 17 + d.doc_id % 16
                   AND yy.y < 16 + d.doc_id % 13
                  THEN (d.doc_id * 7 + 3 * xx.x + 5 * yy.y) % 256
                     + (d.doc_id * 7 + 3 * xx.x + 5 * yy.y + 11) % 256
                     + (d.doc_id * 7 + 3 * xx.x + 5 * yy.y + 22) % 256
                  END) AS BIGINT) AS sum_rgb
    FROM documents d, range(0, 33) xx(x), range(0, 29) yy(y)
    GROUP BY d.doc_id
    """,
)
def tiff_decode_stats(spark, sf_dir):
    """The TIFF codec paths as a driver-hashed row — the scanned-doc
    twin of the other codec rows: per document a deterministic RGB
    image (every channel a pure integer function of doc_id and pixel
    coords) at a TILE-EXERCISING geometry (17-32 x 16-28 over a 16x16
    tile grid, so every payload has clipped edge tiles) is ENCODED as
    a tiled TIFF (`operators/tiff.py` §15 writer) with the compression
    scheme cycling by doc — uncompressed / Deflate / LZW, the two
    compressed schemes alternating the horizontal predictor — and
    DECODED back through the production ``decode_image`` magic-byte
    router, emitting the decoded geometry and exact integer RGB sum.
    All three schemes are lossless, so the closed-form oracle matches
    bit-for-bit; any regression — a tile-paste clip slip, a predictor
    restart bug, an LZW code-width miscount, an endian mix-up — breaks
    geometry or sum and the row goes red.

    Scale: decode-heavy / emit-light like the sibling codec rows;
    ``spread()`` for the same small-scan reason (the LZW inverse is
    pure-python per tile)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    docs = spread(spark, docs.select("doc_id"))

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.media_codecs import decode_image
        from processor_edf_spark.operators.tiff import encode_tiff_tiled

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 17 + d % 16, 16 + d % 13
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                img = ((d * 7 + 3 * x + 5 * y + 11 * c) % 256).astype(
                    np.uint8
                )
                comp = (1, 8, 5)[d % 3]
                pred = 2 if (d % 2 and comp != 1) else 1
                payload = encode_tiff_tiled(
                    img, 16, 16, compression=comp, predictor=pred
                )
                dec = decode_image(payload)  # the REAL router + TIFF path
                rows.append(
                    (
                        d,
                        dec.shape[1],
                        dec.shape[0],
                        int(dec.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "sum_rgb"]
            )

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id long, width int, height int, sum_rgb long"
    )
