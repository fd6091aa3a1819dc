"""r13 driver rows: the MPEG-2/2.5 (LSF) and Layer II audio paths
under the value oracle.

``mp3_lsf_decode_stats`` gates the r13 LSF ratchet (operators/mp3.py):
one-granule MPEG-2/2.5 Layer III frames — the 8-bit main_data_begin /
9-byte-mono side layout, the 9-bit scalefac_compress slen/partition
derivation with its DERIVED preflag, and the LSF scalefactor-band
tables — decoded through the production ``decode_mp3_frames`` and
required exact in the spectral domain (including scalefactor and
preflag gains computed from closed forms inline) before the integer
construction sums are emitted.

``mp3_layer2_decode_stats`` gates the Layer II path: quantization-class
allocation (Tables B.2a/c/d and the LSF table), scfsi sharing,
grouped 3/5/9-level codes, and the closed-form Table B.4
requantization — decoded subband samples required exact against
scf · requant(code) before the integer sums are emitted.

Both rows follow the ``mp3_decode_stats`` discipline
(plans/analytics_r12.py): deterministic per-doc fixtures, a REAL
bitstream through the production fixture encoder, decode through the
production decoder, -1 sentinel on any drift.  Reference scope:
Pennsieve/processor-EDF has no audio surface (builder's-brief
multimodal axis; SURVEY.md §2 extension table).
"""

from __future__ import annotations

import numpy as np

from processor_edf_spark.plans.registry import load, register

#: spectral lines per LSF fixture granule (12 big-value pairs + 2 quads)
_LSF_LINES = 32


@register(
    "mp3_lsf_decode_stats",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2),
    p AS (
        SELECT doc_id,
               1 + doc_id % 2 AS nf,
               CASE doc_id % 5 WHEN 0 THEN 22050 WHEN 1 THEN 24000
                    WHEN 2 THEN 16000 WHEN 3 THEN 12000
                    ELSE 8000 END AS sr,
               CASE WHEN doc_id % 5 <= 2 THEN 2 ELSE 25 END AS ver,
               CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS pre
        FROM d
    ),
    lines AS (
        SELECT p.doc_id,
               ((p.doc_id + 3 * tk.k + 11 * tf.f) % 3) - 1 AS v
        FROM p
        JOIN range(0, 2) tf(f) ON tf.f < p.nf
        CROSS JOIN range(0, 32) tk(k)
    )
    SELECT p.doc_id,
           CAST(p.nf AS BIGINT) AS n_frames,
           CAST(p.sr AS BIGINT) AS sample_rate,
           CAST(p.ver AS BIGINT) AS mpeg_version,
           CAST(p.pre AS BIGINT) AS preflag,
           CAST(576 * p.nf AS BIGINT) AS n_samples,
           CAST(SUM(l.v) AS BIGINT) AS sum_ix,
           CAST(SUM(CASE WHEN l.v <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonzero
    FROM p JOIN lines l USING (doc_id)
    GROUP BY p.doc_id, p.nf, p.sr, p.ver, p.pre
    """,
)
def mp3_lsf_decode_stats(spark, sf_dir):
    """MPEG-2/2.5 (LSF) Layer III under the value oracle — per doc a
    deterministic spectral fixture is encoded into a REAL one-granule
    LSF stream (8-bit main_data_begin, 9-bit scalefac_compress, no
    scfsi/preflag bits) and decoded back through the production
    ``decode_mp3_frames``; docs with doc_id % 3 = 0 use
    scalefac_compress 500, whose preflag is DERIVED, so the decoded
    spectra must carry the PRETAB gains without any preflag bit in the
    stream.  The row emits the integer construction sums only if every
    decoded line matches the closed-form requantization exactly and
    the PCM has the one-granule shape (576 x 1 per frame) — any slip
    in the LSF side layout, slen partitioning, band tables, or frame
    sizing flips the -1 sentinel.  The doc mix sweeps both versions
    and five LSF sampling rates.  Scale: decode-heavy/emit-light,
    spread() across the session width like the sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 4 = 2"))

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            _PRETAB,
            _SFB_LONG,
            decode_mp3_frames,
            encode_mp3_frames,
        )

        rates = (22050, 24000, 16000, 12000, 8000)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 1 + d % 2
                rate = rates[d % 5]
                version = 2 if d % 5 <= 2 else 25
                pre = 1 if d % 3 == 0 else 0

                def ix_for(f):
                    ix = np.zeros(576, dtype=np.int64)
                    for k in range(_LSF_LINES):
                        ix[k] = ((d + 3 * k + 11 * f) % 3) - 1
                    return ix

                frames = [
                    [[{
                        "ix": ix_for(f),
                        "big_values_lines": 24,
                        "count1_quads": 2,
                        "global_gain": 210,
                        "scalefac_compress": 500 if pre else 0,
                    }]]
                    for f in range(nf)
                ]
                payload = encode_mp3_frames(
                    frames, rate=rate, bitrate_kbps=64, version=version
                )
                decoded = decode_mp3_frames(payload)
                ok = len(decoded) == nf
                n_samples = 0
                if ok:
                    bounds = _SFB_LONG[rate]
                    gains = np.ones(576)
                    if pre:
                        for b in range(22):
                            gains[bounds[b] : bounds[b + 1]] = 2.0 ** (
                                -0.5 * _PRETAB[b]
                            )
                    for f, (hdr, spectra, pcm) in enumerate(decoded):
                        n_samples += pcm.shape[0]
                        ok = ok and hdr["rate"] == rate
                        ok = ok and hdr["version"] == version
                        ok = ok and pcm.shape == (576, 1)
                        ok = ok and bool(np.isfinite(pcm).all())
                        ix = ix_for(f)
                        exp = (
                            np.sign(ix)
                            * np.abs(ix).astype(np.float64) ** (4.0 / 3.0)
                            * gains
                        )
                        ok = ok and bool(
                            np.allclose(spectra[0, 0], exp, rtol=1e-12,
                                        atol=0.0)
                        )
                        ok = ok and bool(
                            np.array_equal(spectra[1, 0], np.zeros(576))
                        )
                if ok:
                    sum_ix = sum(int(ix_for(f).sum()) for f in range(nf))
                    n_nonzero = sum(
                        int(np.count_nonzero(ix_for(f))) for f in range(nf)
                    )
                    rows.append(
                        (d, nf, rate, version, pre, n_samples, sum_ix,
                         n_nonzero)
                    )
                else:
                    rows.append((d, nf, rate, version, pre, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "sample_rate", "mpeg_version",
                    "preflag", "n_samples", "sum_ix", "n_nonzero",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, sample_rate long, "
            "mpeg_version long, preflag long, n_samples long, "
            "sum_ix long, n_nonzero long"
        ),
    )


@register(
    "mp3_layer2_decode_stats",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
    p AS (
        SELECT doc_id,
               CASE (doc_id // 4) % 4 WHEN 0 THEN 44100 WHEN 1 THEN 44100
                    WHEN 2 THEN 32000 ELSE 16000 END AS sr,
               CASE (doc_id // 4) % 4 WHEN 0 THEN 'a' WHEN 1 THEN 'c'
                    WHEN 2 THEN 'd' ELSE 'lsf' END AS alloc_table,
               CASE (doc_id // 4) % 4 WHEN 0 THEN 27 WHEN 1 THEN 8
                    WHEN 2 THEN 12 ELSE 30 END AS sblimit
        FROM d
    ),
    sb AS (
        SELECT p.doc_id, p.sblimit, ts.sb
        FROM p JOIN range(0, 30) ts(sb) ON ts.sb < p.sblimit
        WHERE (p.doc_id + ts.sb) % 3 = 0
    ),
    codes AS (
        SELECT sb.doc_id, sb.sb, tg.gr, tk.s,
               (sb.doc_id + 5 * sb.sb + 7 * tg.gr + 11 * tk.s) % 3 AS c
        FROM sb CROSS JOIN range(0, 12) tg(gr)
        CROSS JOIN range(0, 3) tk(s)
    )
    SELECT p.doc_id,
           CAST(p.sr AS BIGINT) AS sample_rate,
           p.alloc_table,
           CAST(1152 AS BIGINT) AS n_samples,
           CAST(COALESCE(COUNT(DISTINCT c.sb), 0) AS BIGINT)
               AS n_allocated,
           CAST(COALESCE(SUM(c.c), 0) AS BIGINT) AS sum_codes
    FROM p LEFT JOIN codes c USING (doc_id)
    GROUP BY p.doc_id, p.sr, p.alloc_table
    """,
)
def mp3_layer2_decode_stats(spark, sf_dir):
    """Layer II under the value oracle — per doc a deterministic
    allocation pattern (class 1 = the 3-level grouped class on every
    third subband) with deterministic sample codes is encoded into a
    REAL Layer II frame and decoded back through the production
    ``decode_mp3_frames``; decoded subband samples are required EXACT
    against scf · requant(code) (the closed forms behind Table B.4)
    before the integer sums are emitted.  The doc mix covers
    allocation tables a (27 sb), c (8 sb), d (12 sb, 32 kHz) and the
    LSF table (30 sb at 16 kHz) — any drift in table selection, row
    structure, scfsi layout, grouped-code unpacking, or requantization
    flips the -1 sentinel.  Scale: same shape as the sibling rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 4 = 3"))

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            _SF_TABLE_L1,
            _l2_requant,
            decode_mp3_frames,
            encode_mp3_layer2,
        )

        cfg = {
            0: (44100, 64, 27, 1, "a"),
            1: (44100, 48, 8, 1, "c"),
            2: (32000, 48, 12, 1, "d"),
            3: (16000, 64, 30, 2, "lsf"),
        }
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate, kbps, sbl, version, tname = cfg[(d // 4) % 4]
                alloc = [[0] * sbl]
                for sb in range(sbl):
                    if (d + sb) % 3 == 0:
                        alloc[0][sb] = 1  # 3-level grouped class
                scf_idx = [[[(d + sb) % 63, 0, 0] for sb in range(sbl)]]
                scfsi = [[2] * sbl]  # one sf for all three parts

                def code(sb, gr, s):
                    return (d + 5 * sb + 7 * gr + 11 * s) % 3

                codes = [
                    [[[code(sb, gr, s) for s in range(3)]
                      for sb in range(sbl)]]
                    for gr in range(12)
                ]
                payload = encode_mp3_layer2(
                    [{"alloc": alloc, "scfsi": scfsi, "scf_idx": scf_idx,
                      "codes": codes}],
                    rate=rate, bitrate_kbps=kbps, n_channels=1,
                    version=version,
                )
                decoded = decode_mp3_frames(payload)
                ok = len(decoded) == 1
                if ok:
                    hdr, S, pcm = decoded[0]
                    ok = (
                        hdr["layer"] == 2
                        and hdr["rate"] == rate
                        and pcm.shape == (1152, 1)
                        and bool(np.isfinite(pcm).all())
                        and S.shape == (36, 1, 32)
                    )
                    for sb in range(sbl):
                        if not ok:
                            break
                        if not alloc[0][sb]:
                            ok = ok and bool(
                                (S[:, 0, sb] == 0.0).all()
                            )
                            continue
                        sf = float(_SF_TABLE_L1[(d + sb) % 63])
                        for gr in range(12):
                            for s in range(3):
                                exp = _l2_requant(code(sb, gr, s), 3) * sf
                                if abs(S[3 * gr + s, 0, sb] - exp) > 1e-12:
                                    ok = False
                if ok:
                    n_alloc = sum(alloc[0])
                    sum_codes = sum(
                        code(sb, gr, s)
                        for sb in range(sbl) if alloc[0][sb]
                        for gr in range(12) for s in range(3)
                    )
                    rows.append((d, rate, tname, 1152, n_alloc, sum_codes))
                else:
                    rows.append((d, rate, tname, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "alloc_table", "n_samples",
                    "n_allocated", "sum_codes",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, sample_rate long, alloc_table string, "
            "n_samples long, n_allocated long, sum_codes long"
        ),
    )


@register(
    "h264_cabac_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               1 + doc_id % 3 AS nf
        FROM documents
        WHERE doc_id % 8 = 5
    ),
    ysum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 3 + c.j * 5 + d.doc_id + f.j * 17) % 160
                        + 40) AS BIGINT) AS y_sum
        FROM d, range(0, 32) r(j), range(0, 48) c(j), range(0, 3) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    ),
    csum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 7 + c.j * 11 + d.doc_id + f.j * 5) % 100
                        + 78) AS BIGINT) AS u_sum,
               CAST(SUM((r.j * 5 + c.j * 3 + 2 * d.doc_id + f.j * 9) % 120
                        + 60) AS BIGINT) AS v_sum
        FROM d, range(0, 16) r(j), range(0, 24) c(j), range(0, 3) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.w AS BIGINT) AS width,
           CAST(d.h AS BIGINT) AS height,
           ysum.y_sum, csum.u_sum, csum.v_sum
    FROM d JOIN ysum USING (doc_id) JOIN csum USING (doc_id)
    """,
)
def h264_cabac_decode_stats(spark, sf_dir):
    """The H.264 CABAC entropy layer (spec §9.3, operators/h264.py
    r13) as a driver-hashed row: per document a deterministic YUV420
    sequence (every plane a pure integer function of doc_id and frame
    index) is encoded as CABAC-coded IDR I pictures (I_NxN + I_16x16
    mix, full residual path through the arithmetic engine) at a
    doc-dependent QP (20/28/36), decoded back through the production
    ``decode_h264_ipcm``, and required BIT-EXACT against the encoder's
    reconstruction loop — which reuses the decoder's dequant/IDCT/
    prediction helpers, so any engine/renorm/binarization/context
    drift desyncs the arithmetic decode and reds the row via the -1
    sentinel.  The emitted sums are closed forms over the INPUT
    construction, recomputed independently by the oracle.  Scale:
    decode-heavy/emit-light per-doc pure-python kernel under spread(),
    same class as the sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 8 = 5"))

    def gen(batches):
        from processor_edf_spark.operators.h264 import (
            decode_h264_ipcm,
            encode_h264_cabac_recon,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                nf = 1 + d % 3
                qp = 20 + (d % 3) * 8
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
                stream, recons = encode_h264_cabac_recon(
                    frames, W, H, qp=qp
                )
                dw, dh, decoded = decode_h264_ipcm(stream)
                bit_exact = (
                    (dw, dh) == (W, H)
                    and len(decoded) == nf
                    and all(
                        np.array_equal(a, b)
                        for rec, dec in zip(recons, decoded)
                        for a, b in zip(rec, dec)
                    )
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
                if bit_exact and err_ok:
                    sums = [
                        int(sum(np.sum(frm[k], dtype=np.int64)
                                for frm in frames))
                        for k in range(3)
                    ]
                    rows.append((d, nf, W, H, *sums))
                else:
                    rows.append((d, nf, W, H, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "width", "height",
                    "y_sum", "u_sum", "v_sum",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, width long, height long, "
            "y_sum long, u_sum long, v_sum long"
        ),
    )


@register(
    "vp8_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               10 + ((doc_id // 8) % 4) * 20 AS qi,
               (doc_id // 8) % 3 AS bpred_every,
               ((doc_id // 8) * 13) % 64 AS filter_level,
               CASE (doc_id // 8) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
                    ELSE 4 END AS n_token_parts,
               CASE ((doc_id // 8) // 3) % 3 WHEN 0 THEN 1 WHEN 1
                    THEN 2 ELSE 4 END AS n_segments
        FROM documents
        WHERE doc_id % 8 = 6
    ),
    ysum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 3 + c.j * 5 + d.doc_id) % 160 + 40)
                    AS BIGINT) AS y_sum
        FROM d, range(0, 32) r(j), range(0, 48) c(j)
        GROUP BY d.doc_id
    ),
    csum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 7 + c.j * 11 + d.doc_id) % 100 + 78)
                    AS BIGINT) AS u_sum,
               CAST(SUM((r.j * 5 + c.j * 3 + 2 * d.doc_id) % 120 + 60)
                    AS BIGINT) AS v_sum
        FROM d, range(0, 16) r(j), range(0, 24) c(j)
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(d.w AS BIGINT) AS width,
           CAST(d.h AS BIGINT) AS height,
           CAST(d.qi AS BIGINT) AS qindex,
           CAST(d.bpred_every AS BIGINT) AS bpred_every,
           CAST(d.filter_level AS BIGINT) AS filter_level,
           CAST(d.n_token_parts AS BIGINT) AS n_token_parts,
           CAST(d.n_segments AS BIGINT) AS n_segments,
           ysum.y_sum, csum.u_sum, csum.v_sum
    FROM d JOIN ysum USING (doc_id) JOIN csum USING (doc_id)
    """,
)
def vp8_decode_stats(spark, sf_dir):
    """The VP8 (lossy WebP) keyframe decoder (operators/vp8.py, r13;
    r14: B_PRED macroblocks + the §15 in-loop deblocking filter) as a
    driver-hashed row: per document a deterministic YUV420 source
    (every plane a pure integer function of doc_id) is encoded into a
    REAL VP8 keyframe (boolean arithmetic coder, whole-MB DC/V/H/TM
    AND per-4x4 B_PRED prediction mixes, Y2 WHT + 4x4 DCT residual
    tokens split across 1/2/4 §9.5 token partitions, normal/simple
    loop filter at doc-derived levels and
    sharpness), decoded back through the production
    ``decode_vp8_planes``, and required BIT-EXACT in the plane domain
    against the encoder's reconstruction loop — which runs the
    decoder's exact dequant/inverse-transform/prediction/deblock
    path, so any bool-coder/token/transform/prediction/filter drift
    desyncs and reds the row via the -1 sentinel.  The emitted sums
    are closed forms over the INPUT construction, recomputed
    independently by the oracle (the sweep parameters are emitted as
    closed-form columns too, so the oracle pins WHICH configurations
    ran).  Scale: decode-heavy/emit-light per-doc pure-python kernel
    under spread(), same class as the sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(spark, docs.select("doc_id").filter("doc_id % 8 = 6"))

    def gen(batches):
        from processor_edf_spark.operators.vp8 import (
            decode_vp8_planes,
            encode_vp8_keyframe,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                k = d // 8
                qi = 10 + (k % 4) * 20
                bpred_every = k % 3
                filter_level = (k * 13) % 64
                sharpness = (k // 3) % 8
                simple = k % 2 == 1
                n_tp = (1, 2, 4)[k % 3]
                n_seg = (1, 2, 4)[(k // 3) % 3]
                if n_seg > 1:
                    mb_h, mb_w = -(-H // 16), -(-W // 16)
                    mr = np.arange(mb_h)[:, None]
                    mc = np.arange(mb_w)[None, :]
                    seg_map = (mr * 2 + mc) % n_seg
                    # delta mode, non-positive quant deltas: effective
                    # quantizers only get FINER, so the plausibility
                    # threshold below stays an upper bound
                    seg_quant = [0, -5, -9, -13]
                    seg_lf = [0, -7, 6, -14]
                    qd = (-(k % 5), 0, -(k % 3), -(k % 7 % 4), 0)
                else:
                    seg_map = seg_quant = seg_lf = None
                    qd = None
                r = np.arange(H)[:, None]
                c = np.arange(W)[None, :]
                y = (((r * 3 + c * 5 + d) % 160) + 40).astype(np.uint8)
                r2 = np.arange(H // 2)[:, None]
                c2 = np.arange(W // 2)[None, :]
                u = (((r2 * 7 + c2 * 11 + d) % 100) + 78).astype(np.uint8)
                v = (((r2 * 5 + c2 * 3 + 2 * d) % 120) + 60).astype(
                    np.uint8
                )
                frame, (rY, rU, rV) = encode_vp8_keyframe(
                    y, u, v, qi=qi, bpred_every=bpred_every,
                    filter_level=filter_level, sharpness=sharpness,
                    simple_filter=simple, token_partitions=n_tp,
                    q_deltas=qd, segment_map=seg_map,
                    segment_quant=seg_quant, segment_lf=seg_lf,
                )
                dw, dh, dY, dU, dV = decode_vp8_planes(frame)
                ok = (
                    (dw, dh) == (W, H)
                    and np.array_equal(dY, rY)
                    and np.array_equal(dU, rU)
                    and np.array_equal(dV, rV)
                )
                # recon error must scale sanely with the quantizer
                # (the in-loop filter widens the bound slightly)
                ok = ok and int(
                    np.abs(rY[:H, :W].astype(np.int64) - y).max()
                ) <= (48 if qi <= 40 else 128)
                if ok:
                    rows.append((
                        d, W, H, qi, bpred_every, filter_level,
                        n_tp, n_seg,
                        int(np.sum(y, dtype=np.int64)),
                        int(np.sum(u, dtype=np.int64)),
                        int(np.sum(v, dtype=np.int64)),
                    ))
                else:
                    rows.append(
                        (d, W, H, qi, bpred_every, filter_level,
                         n_tp, n_seg, -1, -1, -1)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "qindex",
                    "bpred_every", "filter_level", "n_token_parts",
                    "n_segments", "y_sum", "u_sum", "v_sum",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, width long, height long, qindex long, "
            "bpred_every long, filter_level long, n_token_parts long, "
            "n_segments long, y_sum long, u_sum long, v_sum long"
        ),
    )
