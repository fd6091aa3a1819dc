"""r14 driver rows: the codec/pipeline ratchets under the value oracle.

``mp3_short_intensity_decode_stats`` gates the r14 MPEG-1 short-block
intensity-stereo path (operators/mp3.py §2.4.3.4.9.3): pure-short
joint-stereo granules whose right-channel windows end at DIFFERENT
bands, positions carried in the right channel's short scalefactors
(including an illegal position exercising the per-line MS fallback),
decoded through the production ``decode_mp3_frames`` and required
exact in the spectral domain against the per-window intensity law
computed inline before the integer construction sums are emitted.

All rows follow the ``mp3_decode_stats`` discipline
(plans/analytics_r12.py): deterministic per-doc fixtures, a REAL
bitstream through the production fixture encoder, decode through the
production decoder, -1 sentinel on any drift.  Reference scope:
Pennsieve/processor-EDF has no audio/image surface (builder's-brief
multimodal axis; SURVEY.md §2 extension table).
"""

from __future__ import annotations

import numpy as np

from processor_edf_spark.plans.registry import load, register
from processor_edf_spark.materialize import materialize

# 44100 Hz short scalefactor-band bounds (ISO 11172-3), embedded in the
# oracle SQL below as the right-channel transmitted ranges
_SB44 = (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)


@register(
    "mp3_short_intensity_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               1 + 2 * ((doc_id // 8) % 2) AS mode_ext
        FROM documents
        WHERE doc_id % 8 = 3
    ),
    lines AS (
        SELECT d.doc_id,
               ((1 + tk.k + d.doc_id) % 3) - 1 AS vl,
               CASE WHEN tk.k < 8
                         OR (tk.k >= 12 AND tk.k < 20)
                         OR (tk.k >= 24 AND tk.k < 32)
                         OR (tk.k >= 36 AND tk.k < 44)
                         OR (tk.k >= 48 AND tk.k < 54)
                         OR (tk.k >= 66 AND tk.k < 74)
                    THEN ((5 + tk.k + d.doc_id) % 3) - 1
                    ELSE 0 END AS vr
        FROM d CROSS JOIN range(0, 318) tk(k)
    )
    SELECT d.doc_id,
           CAST(d.mode_ext AS BIGINT) AS mode_ext,
           CAST(1152 AS BIGINT) AS n_samples,
           CAST(SUM(l.vl) AS BIGINT) AS sum_ix_left,
           CAST(SUM(CASE WHEN l.vl <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nz_left,
           CAST(SUM(l.vr) AS BIGINT) AS sum_ix_right,
           CAST(SUM(CASE WHEN l.vr <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nz_right
    FROM d JOIN lines l USING (doc_id)
    GROUP BY d.doc_id, d.mode_ext
    """,
)
def mp3_short_intensity_decode_stats(spark, sf_dir):
    """MPEG-1 short-block intensity stereo (operators/mp3.py, r14) as
    a driver-hashed row: per document a pure-short joint-stereo
    fixture — left coded through band 10, right-channel windows ending
    at bands 5/3/none so the intensity region starts PER WINDOW, short
    scalefactors carrying the positions ((b + w + doc) % 7 with an
    illegal 7 at band 8 / window 0) — is encoded to a REAL Layer III
    stream, decoded through the production ``decode_mp3_frames``, and
    required exact in the spectral domain against the §2.4.3.4.9.3
    per-window law (tan ratio split, illegal-position MS fallback,
    MS on the non-intensity remainder when mode_ext = 3) computed
    inline.  The emitted sums are closed forms over the INPUT
    construction, recomputed independently by the oracle.  Scale:
    per-doc pure-python kernel under spread(), same class as the
    sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 8 = 3"))

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            _Granule,
            _reorder_short,
            decode_mp3_frames,
            encode_mp3_frames,
        )

        sb = _SB44
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                mode_ext = 1 + 2 * ((d // 8) % 2)
                left_ix = np.zeros(576, dtype=np.int64)
                right_ix = np.zeros(576, dtype=np.int64)
                for b in range(11):
                    width = sb[b + 1] - sb[b]
                    base = 3 * sb[b]
                    for w in range(3):
                        for i in range(width):
                            k = base + w * width + i
                            left_ix[k] = ((1 + k + d) % 3) - 1
                            if (w == 0 and b <= 5) or (w == 1 and b <= 3):
                                right_ix[k] = ((5 + k + d) % 3) - 1
                sf_r = [[0, 0, 0] for _ in range(13)]
                for b in range(13):
                    for w in range(3):
                        in_region = (
                            (w == 0 and b >= 6)
                            or (w == 1 and b >= 4)
                            or w == 2
                        )
                        if in_region and b < 12:
                            sf_r[b][w] = (b + w + d) % 7
                sf_r[8][0] = 7  # illegal position -> MS fallback
                # left codes its full nonzero extent (through band
                # 10 = line 317, padded to 318); right codes through
                # band 5's w0 chunk with coded zeros behind it
                left = {
                    "ix": left_ix, "big_values_lines": 3 * sb[11],
                    "count1_quads": 0, "global_gain": 210,
                    "block_type": 2,
                }
                right = {
                    "ix": right_ix, "big_values_lines": 3 * sb[6],
                    "count1_quads": 0, "global_gain": 210,
                    "block_type": 2, "short_sf": sf_r,
                    "scalefac_compress": 13,
                }
                payload = encode_mp3_frames(
                    [[[left, right], [left, right]]],
                    rate=44100, n_channels=2, bitrate_kbps=256,
                    mode_ext=mode_ext,
                )
                decoded = decode_mp3_frames(payload)
                # expected spectra: the published per-window law
                g = _Granule()
                g.window_switching, g.block_type, g.mixed_block = 1, 2, 0
                l_in = _reorder_short(left_ix.astype(float), g, 44100)
                r_in = _reorder_short(right_ix.astype(float), g, 44100)
                exp_l, exp_r = l_in.copy(), r_in.copy()
                inv = 1.0 / np.sqrt(2.0)
                handled = np.zeros(576, bool)
                # per-window region start per the published detection
                # rule: the band above the right channel's last
                # nonzero band in that window (the %3 line pattern can
                # zero a whole boundary chunk, legitimately widening
                # the region below the construction bands 6/4/0)
                firsts = []
                for w in range(3):
                    fb = 0
                    for b in range(12, -1, -1):
                        width = sb[b + 1] - sb[b]
                        idx = np.arange(
                            3 * sb[b] + w,
                            3 * sb[b] + 3 * width + w, 3,
                        )[:width]
                        if np.any(r_in[idx] != 0):
                            fb = b + 1
                            break
                    firsts.append(fb)
                for w, first_band in enumerate(firsts):
                    for b in range(first_band, 13):
                        width = sb[b + 1] - sb[b]
                        idx = np.arange(
                            3 * sb[b] + w,
                            3 * sb[b] + 3 * width + w, 3,
                        )[:width]
                        handled[idx] = True
                        pos = sf_r[b][w] if b < 12 else 0
                        if pos >= 7:
                            if mode_ext == 3:
                                m, s = l_in[idx], r_in[idx]
                                exp_l[idx] = (m + s) * inv
                                exp_r[idx] = (m - s) * inv
                            continue
                        ratio = np.tan(pos * np.pi / 12.0)
                        exp_l[idx] = l_in[idx] * (ratio / (1.0 + ratio))
                        exp_r[idx] = l_in[idx] * (1.0 / (1.0 + ratio))
                if mode_ext == 3:
                    rest = ~handled
                    m, s = exp_l[rest].copy(), exp_r[rest].copy()
                    exp_l[rest] = (m + s) * inv
                    exp_r[rest] = (m - s) * inv
                ok = len(decoded) == 1
                if ok:
                    hdr, spectra, pcm = decoded[0]
                    ok = (
                        hdr["rate"] == 44100
                        and hdr["mode"] == 1
                        and hdr["mode_ext"] == mode_ext
                        and pcm.shape == (1152, 2)
                        and bool(np.isfinite(pcm).all())
                    )
                    for gr in range(2):
                        ok = ok and np.allclose(
                            spectra[gr, 0], exp_l, atol=1e-12
                        )
                        ok = ok and np.allclose(
                            spectra[gr, 1], exp_r, atol=1e-12
                        )
                if ok:
                    rows.append((
                        d, mode_ext, 1152,
                        int(left_ix.sum()),
                        int(np.count_nonzero(left_ix)),
                        int(right_ix.sum()),
                        int(np.count_nonzero(right_ix)),
                    ))
                else:
                    rows.append((d, mode_ext, -1, -1, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mode_ext", "n_samples",
                    "sum_ix_left", "nz_left",
                    "sum_ix_right", "nz_right",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, mode_ext long, n_samples long, "
            "sum_ix_left long, nz_left long, "
            "sum_ix_right long, nz_right long"
        ),
    )


@register(
    "h264_cabac_pb_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               3 + doc_id % 2 AS nf,
               22 + (doc_id % 3) * 7 AS qp
        FROM documents
        WHERE doc_id % 16 = 7
    ),
    ysum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 3 + c.j * 5 + d.doc_id + f.j * 17) % 160
                        + 40) AS BIGINT) AS y_sum
        FROM d, range(0, 32) r(j), range(0, 48) c(j), range(0, 4) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    ),
    csum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 7 + c.j * 11 + d.doc_id + f.j * 5) % 100
                        + 78) AS BIGINT) AS u_sum,
               CAST(SUM((r.j * 5 + c.j * 3 + 2 * d.doc_id + f.j * 9) % 120
                        + 60) AS BIGINT) AS v_sum
        FROM d, range(0, 16) r(j), range(0, 24) c(j), range(0, 4) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.qp AS BIGINT) AS qp,
           ysum.y_sum, csum.u_sum, csum.v_sum
    FROM d JOIN ysum USING (doc_id) JOIN csum USING (doc_id)
    """,
)
def h264_cabac_pb_decode_stats(spark, sf_dir):
    """The H.264 CABAC P/B entropy layer (spec §9.3, operators/h264.py
    r14) as a driver-hashed row: per document a deterministic YUV420
    sequence is encoded as a CABAC GOP (coded order I0 P2 B1 … via the
    shared ``_b_gop``) whose macroblock wheels cover mb_skip_flag, the
    Table 9-34 P and B mb_type binarizations (every P partition shape,
    B direct / L0 / L1 / Bi and mixed-list 16x8/8x16, B_8x8 sub-type
    wheel), U-binarized multi-ref ref_idx, UEG3 mvd, intra-in-P/B
    suffixes and the I_PCM-in-CABAC engine re-initialisation — decoded
    back through the production ``decode_h264``, and required
    BIT-EXACT against the encoder's reconstruction loop (which reuses
    the decoder's MC/direct/dequant helpers), so any binarization/
    context/engine drift desyncs the arithmetic decode and reds the
    row via the -1 sentinel.  The in-row gate also requires the
    macroblock mix to have actually run (every wheel count > 0 summed
    over the GOP).  The emitted sums are closed forms over the INPUT
    construction, recomputed independently by the oracle.  Scale:
    decode-heavy/emit-light per-doc pure-python kernel under
    spread(), same class as the sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 16 = 7"))

    def gen(batches):
        from processor_edf_spark.operators.h264 import (
            decode_h264,
            encode_h264_cabac_pb_recon,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                nf = 3 + d % 2
                qp = 22 + (d % 3) * 7
                frames = []
                for f in range(nf):
                    r = np.arange(H)[:, None]
                    c = np.arange(W)[None, :]
                    y = (((r * 3 + c * 5 + d + f * 17) % 160) + 40).astype(
                        np.uint8
                    )
                    r2 = np.arange(H // 2)[:, None]
                    c2 = np.arange(W // 2)[None, :]
                    u = (((r2 * 7 + c2 * 11 + d + f * 5) % 100) + 78).astype(
                        np.uint8
                    )
                    v = (
                        ((r2 * 5 + c2 * 3 + 2 * d + f * 9) % 120) + 60
                    ).astype(np.uint8)
                    frames.append((y, u, v))
                stream, recons, stats = encode_h264_cabac_pb_recon(
                    frames, W, H, qp=qp,
                    spatial_direct=bool(d % 2),
                )
                dw, dh, decoded = decode_h264(stream)
                bit_exact = (
                    (dw, dh) == (W, H)
                    and len(decoded) == nf
                    and all(
                        np.array_equal(a, b)
                        for rec, dec in zip(recons, decoded)
                        for a, b in zip(rec, dec)
                    )
                )
                mix_ran = all(
                    stats[k] > 0
                    for k in ("P_16x16", "B_Direct", "B_16x16",
                              "intra_in_p")
                )
                err_ok = all(
                    int(
                        np.abs(
                            rec[0].astype(np.int64)
                            - frm[0].astype(np.int64)
                        ).max()
                    )
                    <= 64
                    for rec, frm in zip(recons, frames)
                )
                if bit_exact and mix_ran and err_ok:
                    sums = [
                        int(sum(np.sum(frm[k], dtype=np.int64)
                                for frm in frames))
                        for k in range(3)
                    ]
                    rows.append((d, nf, qp, *sums))
                else:
                    rows.append((d, nf, qp, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "qp",
                    "y_sum", "u_sum", "v_sum",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, qp long, "
            "y_sum long, u_sum long, v_sum long"
        ),
    )


@register(
    "image_phash_dedup",
    """
    WITH d AS (
        SELECT doc_id, doc_id // 8 AS base
        FROM documents WHERE doc_id % 2 = 0
    )
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY base) AS group_min,
           COUNT(*) OVER (PARTITION BY base) AS group_size,
           CAST(1 AS BIGINT) AS phash_groups
    FROM d
    """,
)
def image_phash_dedup(spark, sf_dir):
    """Perceptual image near-dup dedup (operators/image_dedup.py, r14)
    as a driver-hashed row — the multimodal sibling of the text dedup
    family: per document a deterministic 24x24 RGB image is built from
    base = doc_id//8, brightness-shifted by the member index
    ((doc_id%8)//2 * 2 — dHash and pHash are EXACTLY invariant to
    constant shifts by construction), encoded through the real PNG
    writer, decoded through the real decoder registry, dHashed, and
    grouped through the LINEAR LSH-components path
    (perceptual_dedup_components, bucket-star edges + pointer
    jumping).  The oracle recomputes the groups from the doc_id
    arithmetic alone: equality holds ONLY if decode -> hash -> bucket
    -> closure reproduced the base partition exactly (a decode
    failure, a hash drift breaking shift invariance, or a cross-base
    hash collision all mismatch).  phash_groups pins the pHash's
    invariance per group (count of distinct pHashes, expected 1).
    Scale: hashing is per-doc linear; grouping is the measured linear
    dedup path (dedup_lsh_components x32 sweep)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 2 = 0"))

    def build(batches):
        from processor_edf_spark.operators.png import encode_png

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d // 8
                shift = (d % 8) // 2 * 2
                # avalanche-mixed per-cell noise keyed by (base, cell):
                # distinct bases give effectively independent images
                # (a linear-in-base pattern mod 120 would collide for
                # bases 120 apart and chain groups together)
                r = np.arange(24, dtype=np.uint64)[:, None, None]
                c = np.arange(24, dtype=np.uint64)[None, :, None]
                ch = np.arange(3, dtype=np.uint64)[None, None, :]
                cell = r * np.uint64(72) + c * np.uint64(3) + ch
                x = (
                    np.uint64((base + 1) * 2654435761 % (1 << 61))
                    + cell * np.uint64(1099511628211)
                )
                x = x * np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> np.uint64(31)
                x = x * np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(29)
                mix = (x % np.uint64(120)).astype(np.int64)
                img = (40 + mix + shift).astype(np.uint8)
                rows.append((d, encode_png(img)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    media = docs.mapInPandas(build, schema="doc_id long, payload binary")
    from processor_edf_spark.operators.image_dedup import (
        image_perceptual_hashes,
        perceptual_dedup_components,
    )
    from pyspark.sql import functions as F

    # hashes feeds THREE consumers (components, the label join, the
    # group stats) — without materialization each branch re-runs the
    # whole per-doc encode->decode->hash python kernel (~6x total,
    # measured 5.7 s); one eager checkpoint of the 4-column hash frame
    # (O(docs) longs) caps the kernel at exactly one pass: 1.5 s.
    hashes = materialize(image_perceptual_hashes(media))
    comps = perceptual_dedup_components(hashes, "dhash", max_hamming=0)
    labeled = hashes.join(comps, "doc_id")
    gstats = labeled.groupBy("component").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("phash").alias("phash_groups"),
    )
    return (
        labeled.join(gstats, "component")
        .select(
            F.col("doc_id"),
            F.col("component").alias("group_min"),
            F.col("group_size").cast("long").alias("group_size"),
            F.col("phash_groups").cast("long").alias("phash_groups"),
        )
    )


@register(
    "quality_classifier_score",
    """
    WITH d AS (
        SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents
    ),
    g AS (
        SELECT d.doc_id, md5(substr(d.t, tp.p + 1, 3)) AS hx
        FROM d JOIN range(0, 700) tp(p) ON tp.p < length(d.t) - 2
    ),
    hb AS (
        SELECT doc_id,
               ((strpos('0123456789abcdef', substr(hx, 15, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(hx, 16, 1)) - 1))
                   % 64 AS dim,
               CASE WHEN strpos('0123456789abcdef', substr(hx, 1, 1)) - 1
                         >= 8
                    THEN 1 ELSE -1 END AS sgn
        FROM g
    ),
    acc AS (
        SELECT doc_id, dim, CAST(SUM(sgn) AS DOUBLE) AS v
        FROM hb GROUP BY doc_id, dim
    ),
    dense AS (
        SELECT d.doc_id, td.dim, COALESCE(acc.v, 0.0) AS v
        FROM d CROSS JOIN range(0, 64) td(dim)
        LEFT JOIN acc ON acc.doc_id = d.doc_id AND acc.dim = td.dim
    ),
    nrm AS (
        SELECT doc_id, sqrt(SUM(v * v)) AS n FROM dense GROUP BY doc_id
    ),
    w AS (
        SELECT dim, (((dim * 37 + 11) % 21) - 10) / 10.0 AS wv
        FROM range(0, 64) t(dim)
    ),
    z AS (
        SELECT dense.doc_id,
               SUM((CASE WHEN nrm.n > 0 THEN dense.v / nrm.n
                         ELSE 0.0 END) * w.wv) AS logit
        FROM dense
        JOIN nrm USING (doc_id)
        JOIN w ON w.dim = dense.dim
        GROUP BY dense.doc_id
    )
    SELECT doc_id,
           ROUND(logit, 6) AS logit,
           CAST(CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS BIGINT)
               AS keep
    FROM z
    """,
)
def quality_classifier_score(spark, sf_dir):
    """fastText-style quality-classifier inference
    (operators/embed.py ``quality_classifier_scores``, r14) under the
    value oracle: a linear probe over the hashing-trick character
    3-gram embedding — the oracle recomputes the ENTIRE path from
    first principles in SQL (the hash_embed_stats embedding CTE, the
    closed-form weight vector ((dim*37+11)%21-10)/10, the dot
    product, the logit-sign gate).  The emitted gate compares LOGITS
    (sigmoid is monotone), so no engine exp() enters the hashed
    values.  Scale shape: one Arrow pass + a JVM-side fold over a
    literal weight array — shuffle-free, riding the corpus scan like
    the gopher rule gate."""
    from pyspark.sql import functions as F

    from processor_edf_spark.operators.embed import (
        quality_classifier_scores,
    )

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    scored = quality_classifier_scores(
        spread(spark, docs.select("doc_id", "text"))
    )
    return scored.select(
        "doc_id",
        F.round("logit", 6).alias("logit"),
        F.col("keep").cast("long").alias("keep"),
    )


@register(
    "audio_fingerprint_dedup",
    """
    WITH d AS (
        SELECT doc_id, doc_id // 8 AS base
        FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY base) AS group_min,
           COUNT(*) OVER (PARTITION BY base) AS group_size,
           CAST(1 AS BIGINT) AS afp_groups
    FROM d
    """,
)
def audio_fingerprint_dedup(spark, sf_dir):
    """Perceptual audio near-dup dedup (operators/audio_dedup.py, r14)
    as a driver-hashed row — the audio sibling of image_phash_dedup:
    per document a deterministic noise clip is built from
    base = doc_id//8 (avalanche-mixed per-(base, sample) so distinct
    bases are independent), gain-scaled by the member index
    (2^((doc_id%8)//2) — the spectral-difference fingerprint is
    EXACTLY invariant to power-of-two gains by construction), encoded
    through the real WAV-PCM16 or FLAC writer (members alternate
    codecs — both lossless, so the decoded floats are identical up to
    the exact gain), decoded through the real decode_audio registry,
    fingerprinted, and grouped through the LINEAR LSH-components path
    (perceptual_dedup_components, bucket-star edges + pointer
    jumping).  The oracle recomputes the groups from the doc_id
    arithmetic alone: equality holds ONLY if decode -> fingerprint ->
    bucket -> closure reproduced the base partition exactly (a decode
    failure, a gain-invariance drift, a WAV/FLAC convention mismatch,
    or a cross-base fingerprint collision all mismatch).  afp_groups
    pins one distinct fingerprint per group.  Scale: fingerprinting
    is per-doc linear; grouping is the measured linear dedup path
    (dedup_lsh_components x32 sweep)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 2 = 1"))

    def build(batches):
        from processor_edf_spark.operators.flac import encode_flac
        from processor_edf_spark.operators.media_codecs import (
            encode_wav_pcm16,
        )

        n = 2304
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                base = d // 8
                gain = 1 << ((d % 8) // 2)
                i = np.arange(n, dtype=np.uint64)
                x = (
                    np.uint64((base + 1) * 2654435761 % (1 << 61))
                    + i * np.uint64(1099511628211)
                )
                x = x * np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> np.uint64(31)
                x = x * np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(29)
                samples = (
                    (x % np.uint64(2048)).astype(np.int64) - 1024
                ) * gain
                if d % 4 == 1:
                    payload = encode_wav_pcm16(samples / 32767.0, 8000)
                else:
                    payload = encode_flac(samples, 8000)
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    media = docs.mapInPandas(build, schema="doc_id long, payload binary")
    from pyspark.sql import functions as F

    from processor_edf_spark.operators.audio_dedup import (
        audio_perceptual_fingerprints,
    )
    from processor_edf_spark.operators.image_dedup import (
        perceptual_dedup_components,
    )

    # same three-consumer materialization as image_phash_dedup: the
    # FLAC/WAV encode->decode->fingerprint kernel (~15 ms/doc) must run
    # once, not once per downstream branch (measured 9.1 -> 2.4 s)
    fps = materialize(audio_perceptual_fingerprints(media))
    comps = perceptual_dedup_components(fps, "afp", max_hamming=0)
    labeled = fps.join(comps, "doc_id")
    gstats = labeled.groupBy("component").agg(
        F.count("*").alias("group_size"),
        F.countDistinct("afp").alias("afp_groups"),
    )
    return (
        labeled.join(gstats, "component")
        .select(
            F.col("doc_id"),
            F.col("component").alias("group_min"),
            F.col("group_size").cast("long").alias("group_size"),
            F.col("afp_groups").cast("long").alias("afp_groups"),
        )
    )


@register(
    "mp3_mixed_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               CASE (doc_id // 16) % 8
                    WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    WHEN 2 THEN 32000 WHEN 3 THEN 22050
                    WHEN 4 THEN 24000 WHEN 5 THEN 16000
                    WHEN 6 THEN 11025 ELSE 12000 END AS rate,
               CASE WHEN (doc_id // 16) % 8 <= 2 THEN 1
                    WHEN (doc_id // 16) % 8 <= 5 THEN 2
                    ELSE 25 END AS ver
        FROM documents WHERE doc_id % 16 = 9
    ),
    lines AS (
        SELECT d.doc_id, ((tk.k * 5 + d.doc_id) % 3) - 1 AS v
        FROM d CROSS JOIN range(0, 48) tk(k)
    )
    SELECT d.doc_id,
           CAST(d.rate AS BIGINT) AS sample_rate,
           CAST(d.ver AS BIGINT) AS mpeg_version,
           CAST(CASE WHEN d.ver = 1 THEN 8 ELSE 6 END AS BIGINT)
               AS n_long_bands,
           CAST(SUM(l.v) AS BIGINT) AS sum_ix,
           CAST(SUM(CASE WHEN l.v <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonzero
    FROM d JOIN lines l USING (doc_id)
    GROUP BY d.doc_id, d.rate, d.ver
    """,
)
def mp3_mixed_decode_stats(spark, sf_dir):
    """MP3 mixed blocks (operators/mp3.py, r14 continuation) as a
    driver-hashed row: per document a mixed-block granule — long
    scalefactor bands below line 36 (8 for MPEG-1, 6 for LSF) plus
    short bands 3..11 with doc-derived subblock gains — is encoded to
    a REAL Layer III stream at one of eight sampling rates spanning
    MPEG-1, MPEG-2 and MPEG-2.5, decoded through the production
    ``decode_mp3_frames``, and required EXACT in the spectral domain
    against the §2.4.3.4.7.1 mixed requantization + band-3-up reorder
    recomputed inline from the closed forms.  The emitted sums are
    closed forms over the INPUT construction, recomputed independently
    by the oracle; any slip in the mixed scalefactor layouts, the
    36-line boundary, subblock gains, or the reorder flips the -1
    sentinel.  Scale: per-doc pure-python kernel under spread(), same
    class as the sibling codec rows (half their doc density)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 16 = 9"))

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            _PRETAB,
            _SFB_LONG,
            _SFB_SHORT,
            _Granule,
            _reorder_short,
            decode_mp3_frames,
            encode_mp3_frames,
        )

        cfg = (
            (44100, 1), (48000, 1), (32000, 1), (22050, 2),
            (24000, 2), (16000, 2), (11025, 25), (12000, 25),
        )
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate, ver = cfg[(d // 16) % 8]
                n_long = 8 if ver == 1 else 6
                long_sf = [(b * 3 + d) % 4 for b in range(n_long)]
                long_sf += [0] * (22 - n_long)
                short_sf = [[0, 0, 0]] * 3 + [
                    [(b + w + d) % 4 for w in range(3)]
                    for b in range(3, 12)
                ] + [[0, 0, 0]]
                sbg = (d % 3, (d // 3) % 3, (d // 9) % 3)
                sfs = d % 2
                ix = np.zeros(576, dtype=np.int64)
                for k in range(48):
                    ix[k] = ((k * 5 + d) % 3) - 1
                g = {
                    "ix": ix, "big_values_lines": 48, "count1_quads": 0,
                    "global_gain": 210, "block_type": 2,
                    "mixed_block": 1, "long_sf": long_sf,
                    "short_sf": short_sf, "subblock_gain": sbg,
                    "scalefac_scale": sfs,
                    "scalefac_compress": 9 if ver == 1 else 202,
                }
                frame = [[g]] if ver != 1 else [[g], [{
                    "ix": np.zeros(576, dtype=np.int64),
                    "big_values_lines": 0, "count1_quads": 0,
                    "global_gain": 210,
                }]]
                payload = encode_mp3_frames(
                    [frame], rate=rate, n_channels=1,
                    bitrate_kbps=128 if ver == 1 else 64, version=ver,
                )
                decoded = decode_mp3_frames(payload)
                # independent recomputation of the mixed law
                exp = ix.astype(np.float64)
                mult = 1.0 if sfs else 0.5
                lb = _SFB_LONG[rate]
                for b in range(n_long):
                    lo, hi = lb[b], min(lb[b + 1], 36)
                    exp[lo:hi] *= 2.0 ** (-mult * long_sf[b])
                sbnd = _SFB_SHORT[rate]
                for b in range(3, 13):
                    width = sbnd[b + 1] - sbnd[b]
                    base = 3 * sbnd[b]
                    for w in range(3):
                        exp[base + w * width : base + (w + 1) * width] *= (
                            2.0 ** (-2 * sbg[w] - mult * short_sf[b][w])
                        )
                gg = _Granule()
                gg.window_switching = 1
                gg.block_type = 2
                gg.mixed_block = 1
                exp = _reorder_short(exp, gg, rate)
                ok = (
                    len(decoded) == 1
                    and decoded[0][0]["rate"] == rate
                    and bool(
                        np.array_equal(decoded[0][1][0, 0], exp)
                    )
                )
                if ok:
                    rows.append((
                        d, rate, ver, n_long,
                        int(ix.sum()), int(np.count_nonzero(ix)),
                    ))
                else:
                    rows.append((d, rate, ver, n_long, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "mpeg_version",
                    "n_long_bands", "sum_ix", "n_nonzero",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, sample_rate long, mpeg_version long, "
            "n_long_bands long, sum_ix long, n_nonzero long"
        ),
    )


@register(
    "vorbis_decode_stats",
    """
    SELECT doc_id,
           CAST(1 + (doc_id // 16) % 2 AS BIGINT) AS channels,
           CAST(CASE WHEN (doc_id // 16) % 2 = 1 THEN 2
                     ELSE (doc_id // 16) % 3 END AS BIGINT)
               AS residue_type,
           CAST(CASE WHEN (doc_id // 16) % 2 = 1
                          AND ((doc_id // 16) // 2) % 2 = 1
                     THEN 1 ELSE 0 END AS BIGINT) AS coupled,
           CAST(4 + (doc_id // 16) % 3 AS BIGINT) AS n_blocks,
           CAST((3 + (doc_id // 16) % 3) * 80 AS BIGINT) AS n_samples,
           CAST(10 + (doc_id // 16) % 50 AS BIGINT) AS floor_c
    FROM documents WHERE doc_id % 16 = 11
    """,
)
def vorbis_decode_stats(spark, sf_dir):
    """The Vorbis decoder (operators/vorbis.py, r14 continuation) as a
    driver-hashed row: per document a REAL Ogg Vorbis stream — Ogg CRC
    pages, self-describing codebooks, floor1, a doc-derived residue
    type, optional square-polar stereo coupling, alternating
    long/short blocks (hybrid window splicing every transition) — is
    built by the fixture encoder and decoded back through the
    production ``decode_audio`` registry route; the decode must be
    BIT-EXACT against the encoder's mirrored synthesis and the PCM
    length must equal the closed-form granule rule
    (n_blocks - 1) * (64 + 256) / 4, which the oracle recomputes from
    doc_id arithmetic alone.  Any slip in Ogg reassembly, codeword
    assignment, floor/residue decode, coupling, the IMDCT or the
    overlap-add geometry flips the -1 sentinel.  Scale: per-doc
    pure-python kernel under spread(), same class as the sibling
    codec rows (1/16 doc density)."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 16 = 11"))

    def gen(batches):
        from processor_edf_spark.operators.media_codecs import (
            decode_audio,
        )
        from processor_edf_spark.operators.vorbis import (
            encode_vorbis_fixture,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = d // 16
                channels = 1 + (k % 2)
                if channels == 2:
                    rtype = 2
                    coupled = (k // 2) % 2 == 1
                else:
                    rtype = k % 3
                    coupled = False
                n_blocks = 4 + (k % 3)
                floor_c = 10 + (k % 50)
                modes = [(k + i) % 2 for i in range(n_blocks)]
                payload, (rate, ch, exp) = encode_vorbis_fixture(
                    modes, entry_seed=k, channels=channels,
                    residue_type=rtype, coupling=coupled,
                    blocksizes=(64, 256), floor_c=floor_c,
                )
                got_rate, got_ch, pcm = decode_audio(payload)
                ok = (
                    (got_rate, got_ch) == (rate, ch)
                    and pcm.shape == exp.shape
                    and bool(np.array_equal(pcm, exp))
                    and pcm.shape[0] == (n_blocks - 1) * 80
                )
                if ok:
                    rows.append((
                        d, channels, rtype, 1 if coupled else 0,
                        n_blocks, (n_blocks - 1) * 80, floor_c,
                    ))
                else:
                    rows.append(
                        (d, channels, rtype, 1 if coupled else 0,
                         n_blocks, -1, -1)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channels", "residue_type", "coupled",
                    "n_blocks", "n_samples", "floor_c",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, channels long, residue_type long, "
            "coupled long, n_blocks long, n_samples long, floor_c long"
        ),
    )
