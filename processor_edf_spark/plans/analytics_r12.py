"""Round-12 analytics plans: the PQ/ADC kernel under the driver gate.

``pq_adc_exact`` closes the one unfinished r10/r11 verdict item — the
product-quantization kernel (operators/pq.py) was the only major ANN
component with pytest-only evidence.  The row drives the PRODUCTION
``pq_encode`` → ``pq_search_adc`` chain over codebook-built vectors:
every fixture vector IS a codebook entry per subspace, so the ADC
approximation collapses to the EXACT squared L2 distance (Jégou et al.
2011 §III: ADC error is the quantization error of the DATABASE vector,
zero when the vector sits on its centroid) — and the DuckDB oracle
recomputes true squared L2 from the same closed forms.  Any encode slip
(wrong nearest code, subspace order, tie-break) or ADC slip (LUT
indexing, accumulation) shifts a distance or a rank and reds the row.

``ivf_pq_search_exact`` drives the FULL production ANN pipeline
(``ivf_pq_search``: IVF cell pruning → PQ/ADC shortlist → exact JVM
re-rank) end-to-end under the same exactness regime.  The oracle
reproduces the IVF routing itself — cell assignment (argmin, ties to
the lowest centroid id) and per-query probe sets (2 nearest centroids;
the fixture's query/centroid formulas are chosen so probe distances are
strictly distinct, see the tie audit in the row docstring) — then ranks
true distances inside the probed cells only.  A pruning bug (wrong
cell, wrong probe set, dropped candidate) changes the returned
neighbor set, not just a distance, so it cannot cancel out.

Fixture closed forms (all small integers — exact in float64 on both
engines):

- subspaces m=4 of width 2 (d=8), K=4 codes per subspace;
- codebook entry  B[j][c] = (4c + j, 3c + 2j)  — distinct per subspace,
  so nearest-code assignment is unique (distance 0 vs > 0);
- vector codes    c_j(i) = (i // (j+1)) mod 4  — 48-period mix across
  vec_ids, every subspace cycles through all 4 codes;
- queries         Q[q][t] = (q + t) mod 7, q in 0..2  (an id space
  disjoint from the fixture construction: ``exclude_self=False``);
- centroids       G[g] = the codebook vector with codes (g+j) mod 4.

No EDF analog: the reference has no ANN surface (nothing to cite); this
is the builder's-brief similarity-search axis (SURVEY.md §2 extension
table), sibling to ann_ivf_label / ann_ivf_multiprobe.

``mp3_decode_stats`` is the r12 codec-ratchet row: the pure-python
MPEG-1 Layer III decoder (operators/mp3.py) under the value oracle —
the seventh codec under the driver gate and the first LOSSY AUDIO one.
Same discipline as ``h264_cavlc_decode_stats``: per document a
deterministic spectral fixture is encoded into a REAL Layer III
bitstream (headers, side info, Huffman-coded big-values + count1
regions, sign bits), decoded back through the production
``decode_mp3_frames``, and the row emits the closed-form construction
sums ONLY if every decoded spectral line is bit-exact and the PCM has
the contracted shape — else the -1 sentinel reds the row.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from processor_edf_spark.plans.registry import load, register
from processor_edf_spark.materialize import materialize

_M, _SUB, _K = 4, 2, 4  # subspaces, dims per subspace, codes
_N_Q, _TOPK = 3, 5
_NPROBE, _SHORTLIST = 2, 50

# Shared CTE: one row per (subspace j, within-subspace dim s) and the
# vector/query/centroid component closed forms over them.
_DIMS_CTES = """
    dims AS (
        SELECT tj.j, ts.s
        FROM range(0, 4) tj(j) CROSS JOIN range(0, 2) ts(s)
    ),
    vc AS (
        SELECT e.vec_id AS i, d.j, d.s,
               CAST(CASE d.s
                    WHEN 0 THEN 4 * ((e.vec_id // (d.j + 1)) % 4) + d.j
                    ELSE 3 * ((e.vec_id // (d.j + 1)) % 4) + 2 * d.j
               END AS DOUBLE) AS x
        FROM embeddings e CROSS JOIN dims d
    ),
    qc AS (
        SELECT tq.q, d.j, d.s,
               CAST((tq.q + (2 * d.j + d.s)) % 7 AS DOUBLE) AS y
        FROM range(0, 3) tq(q) CROSS JOIN dims d
    )
"""

# True squared L2 between every (query, vector) pair from the closed
# forms — EQUAL to the ADC distance because the vectors are codebook
# entries (quantization error zero).
_TRUE_DIST_CTE = """
    dist AS (
        SELECT qc.q AS query_id, vc.i AS neighbor_id,
               ROUND(SUM((vc.x - qc.y) * (vc.x - qc.y)), 6) AS d2
        FROM vc JOIN qc ON vc.j = qc.j AND vc.s = qc.s
        GROUP BY qc.q, vc.i
    )
"""


def _codebooks() -> np.ndarray:
    B = np.empty((_M, _K, _SUB), dtype=np.float64)
    for j in range(_M):
        for c in range(_K):
            B[j, c] = (4 * c + j, 3 * c + 2 * j)
    return B


def _centroids() -> np.ndarray:
    B = _codebooks()
    return np.stack(
        [
            np.concatenate([B[j, (g + j) % _K] for j in range(_M)])
            for g in range(_K)
        ]
    )


def _queries() -> tuple[np.ndarray, np.ndarray]:
    Q = np.array(
        [[(q + t) % 7 for t in range(_M * _SUB)] for q in range(_N_Q)],
        dtype=np.float64,
    )
    return Q, np.arange(_N_Q)


def _fixture_vectors(emb):
    """(vec_id, embedding): the codebook-built vectors, all JVM column
    arithmetic (no Python until the PQ kernels' own Arrow passes)."""
    comps = []
    for j in range(_M):
        code = f"((vec_id div {j + 1}) % 4)"
        comps.append(F.expr(f"CAST(4 * {code} + {j} AS DOUBLE)"))
        comps.append(F.expr(f"CAST(3 * {code} + {2 * j} AS DOUBLE)"))
    return emb.select("vec_id", F.array(*comps).alias("embedding"))


@register(
    "pq_adc_exact",
    f"""
    WITH {_DIMS_CTES}, {_TRUE_DIST_CTE}
    SELECT query_id, neighbor_id, d2 AS adc_dist, rnk AS rank
    FROM (
        SELECT query_id, neighbor_id, d2,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY d2 ASC, neighbor_id ASC) AS rnk
        FROM dist
    ) WHERE rnk <= {_TOPK}
    """,
)
def pq_adc_exact(spark, sf_dir):
    """PQ encode + ADC top-k under the value oracle (operators/pq.py
    ``pq_encode``/``pq_search_adc``).  Vectors are codebook entries, so
    ADC == exact squared L2 and the oracle's true-distance ranking must
    match bit-for-bit: a wrong code flips a distance by an integer
    amount, a LUT indexing slip shifts whole columns, a tie-break slip
    reorders equal-distance neighbors — all hash-visible.  Scale shape:
    encode is one Arrow pass with broadcast codebooks (no shuffle); ADC
    scores each partition against broadcast per-query LUTs; the only
    shuffle is the per-query top-k window over (queries × candidates)
    scored rows, which WindowGroupLimit caps."""
    (emb,) = load(spark, sf_dir, "embeddings")
    from processor_edf_spark.operators.pq import pq_encode, pq_search_adc

    B = _codebooks()
    Q, qids = _queries()
    codes = pq_encode(_fixture_vectors(emb), B)
    return pq_search_adc(codes, B, Q, qids, k=_TOPK)


@register(
    "ivf_pq_search_exact",
    f"""
    WITH {_DIMS_CTES}, {_TRUE_DIST_CTE},
    gc AS (
        SELECT tg.g, d.j, d.s,
               CAST(CASE d.s
                    WHEN 0 THEN 4 * ((tg.g + d.j) % 4) + d.j
                    ELSE 3 * ((tg.g + d.j) % 4) + 2 * d.j
               END AS DOUBLE) AS z
        FROM range(0, 4) tg(g) CROSS JOIN dims d
    ),
    cell AS (
        SELECT i, g AS cell FROM (
            SELECT vc.i, gc.g,
                   ROW_NUMBER() OVER (
                       PARTITION BY vc.i
                       ORDER BY SUM((vc.x - gc.z) * (vc.x - gc.z)) ASC,
                                gc.g ASC) AS rnk
            FROM vc JOIN gc ON vc.j = gc.j AND vc.s = gc.s
            GROUP BY vc.i, gc.g
        ) WHERE rnk = 1
    ),
    probed AS (
        SELECT q AS query_id, g FROM (
            SELECT qc.q, gc.g,
                   ROW_NUMBER() OVER (
                       PARTITION BY qc.q
                       ORDER BY SUM((qc.y - gc.z) * (qc.y - gc.z)) ASC,
                                gc.g ASC) AS rnk
            FROM qc JOIN gc ON qc.j = gc.j AND qc.s = gc.s
            GROUP BY qc.q, gc.g
        ) WHERE rnk <= {_NPROBE}
    )
    SELECT query_id, neighbor_id, d2 AS dist_sq, rnk AS rank
    FROM (
        SELECT d.query_id, d.neighbor_id, d.d2,
               ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY d.d2 ASC, d.neighbor_id ASC) AS rnk
        FROM dist d
        JOIN cell c ON c.i = d.neighbor_id
        JOIN probed p ON p.query_id = d.query_id AND p.g = c.cell
    ) WHERE rnk <= {_TOPK}
    """,
)
def ivf_pq_search_exact(spark, sf_dir):
    """The full production ANN pipeline (operators/pq.py
    ``ivf_pq_search``: IVF pruning → ADC shortlist → exact re-rank)
    end-to-end under the value oracle.  The oracle reproduces the IVF
    ROUTING, not just distances: cell = argmin centroid (ties to lowest
    id — argmin first-min on the Spark side, (dist, g) row_number on
    the oracle side), probe set = the 2 nearest centroids per query
    (strictly distinct distances by fixture construction: the (q+t)%7
    query formula was tie-audited against all 4 centroids), candidates
    = probed cells only, final rank = true squared L2 with neighbor_id
    tie-break.  ADC is exact on this fixture, so the 50-deep shortlist
    is the true distance order and re-ranking cannot reshuffle it —
    the row pins PRUNING correctness, the adc row pins SCORING.
    Scale shape: centroid assign + encode are broadcast Arrow passes;
    the candidate filter prunes the scan to ~nprobe/C of the corpus;
    the re-rank join touches q·shortlist rows (tiny) against the raw
    vectors with exact JVM arithmetic (zip_with + aggregate)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    from processor_edf_spark.operators.pq import ivf_pq_search

    Q, qids = _queries()
    return ivf_pq_search(
        _fixture_vectors(emb),
        _centroids(),
        _codebooks(),
        Q,
        qids,
        k=_TOPK,
        nprobe=_NPROBE,
        shortlist=_SHORTLIST,
        exclude_self=False,
    )


# mp3_decode_stats fixture constants (module docstring): 40 spectral
# lines per (frame, granule, channel) — 16 big-value pairs + 2 count1
# quadruples — with line values ((d + 3k + 5g + 7c + 11f) % 3) - 1.
_MP3_LINES = 40


@register(
    "mp3_decode_stats",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
    p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS nf,
               1 + (doc_id // 4) % 2 AS nch,
               CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    ELSE 32000 END AS sr
        FROM d
    ),
    lines AS (
        SELECT p.doc_id,
               ((p.doc_id + 3 * tk.k + 5 * tg.g + 7 * tc.c + 11 * tf.f)
                % 3) - 1 AS v
        FROM p
        JOIN range(0, 2) tf(f) ON tf.f < p.nf
        CROSS JOIN range(0, 2) tg(g)
        JOIN range(0, 2) tc(c) ON tc.c < p.nch
        CROSS JOIN range(0, 40) tk(k)
    )
    SELECT p.doc_id,
           CAST(p.nf AS BIGINT) AS n_frames,
           CAST(p.nch AS BIGINT) AS n_channels,
           CAST(p.sr AS BIGINT) AS sample_rate,
           CAST(1152 * p.nf AS BIGINT) AS n_samples,
           CAST(SUM(l.v) AS BIGINT) AS sum_ix,
           CAST(SUM(CASE WHEN l.v <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nonzero
    FROM p JOIN lines l USING (doc_id)
    GROUP BY p.doc_id, p.nf, p.nch, p.sr
    """,
)
def mp3_decode_stats(spark, sf_dir):
    """The MPEG-1 Layer III path (operators/mp3.py, r12) as a
    driver-hashed row — per document a deterministic spectral fixture
    (every line an integer function of doc_id) is encoded to a REAL
    Layer III bitstream (the production fixture encoder over the
    transcribed Huffman subset: table-1 big values, count1 table B,
    sign bits, exact part2_3 accounting), decoded back through the
    production ``decode_mp3_frames``, and required BIT-EXACT in the
    spectral domain with the contracted PCM shape (1152 samples x nch
    per frame, all finite) before the closed-form construction sums
    are emitted — any Huffman slip, side-info misparse, requantization
    or region-boundary drift flips the row to the -1 sentinel (or
    changes dims) and reds it.  The doc mix sweeps mono/stereo, all
    three MPEG-1 sample rates, and 1- vs 2-frame streams.  Scale:
    decode-heavy/emit-light, payload never leaves the executor;
    pure-python kernel spread() across the session width like the
    sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(
        spark, docs.select("doc_id").filter("doc_id % 4 = 1")
    )

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            decode_mp3_frames,
            encode_mp3_frames,
        )

        rates = (44100, 48000, 32000)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 2 if d % 5 == 0 else 1
                nch = 1 + (d // 4) % 2
                rate = rates[d % 3]

                def ix_for(f, g, c):
                    ix = np.zeros(576, dtype=np.int64)
                    for k in range(_MP3_LINES):
                        ix[k] = ((d + 3 * k + 5 * g + 7 * c + 11 * f) % 3) - 1
                    return ix

                frames = [
                    [
                        [
                            {
                                "ix": ix_for(f, g, c),
                                "big_values_lines": 32,
                                "count1_quads": 2,
                                "global_gain": 210,
                            }
                            for c in range(nch)
                        ]
                        for g in range(2)
                    ]
                    for f in range(nf)
                ]
                payload = encode_mp3_frames(
                    frames, rate=rate, n_channels=nch, bitrate_kbps=128
                )
                decoded = decode_mp3_frames(payload)
                ok = len(decoded) == nf
                total_pcm = 0
                if ok:
                    for f, (hdr, spectra, pcm) in enumerate(decoded):
                        total_pcm += pcm.shape[0]
                        ok = ok and hdr["rate"] == rate
                        ok = ok and pcm.shape == (1152, nch)
                        ok = ok and bool(np.isfinite(pcm).all())
                        for g in range(2):
                            for c in range(nch):
                                ok = ok and np.array_equal(
                                    spectra[g, c],
                                    ix_for(f, g, c).astype(np.float64),
                                )
                if ok:
                    sum_ix = 0
                    n_nonzero = 0
                    for f in range(nf):
                        for g in range(2):
                            for c in range(nch):
                                v = ix_for(f, g, c)
                                sum_ix += int(v.sum())
                                n_nonzero += int(np.count_nonzero(v))
                    rows.append(
                        (d, nf, nch, rate, total_pcm, sum_ix, n_nonzero)
                    )
                else:
                    rows.append((d, nf, nch, rate, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_channels", "sample_rate",
                    "n_samples", "sum_ix", "n_nonzero",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, n_channels long, "
            "sample_rate long, n_samples long, sum_ix long, "
            "n_nonzero long"
        ),
    )


@register(
    "hash_embed_stats",
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
    )
    SELECT dense.doc_id AS vec_id, CAST(dense.dim AS BIGINT) AS dim,
           ROUND(CASE WHEN nrm.n > 0 THEN dense.v / nrm.n
                      ELSE 0.0 END, 6) AS val
    FROM dense JOIN nrm USING (doc_id)
    """,
)
def hash_embed_stats(spark, sf_dir):
    """The feature-hashing embedder (operators/embed.py ``hash_embed``,
    Weinberger et al. 2009) under the value oracle — the last
    pytest-only similarity kernel driver-gated.  The oracle recomputes
    the ENTIRE embedding from first principles in SQL: character
    3-grams of the padded lowercased text, md5 per gram (identical
    bytes on both engines), bucket = low 6 bits of the top-8-byte hash
    (the last md5 byte mod 64), sign = bit 63 (first hex digit >= 8),
    signed accumulation, L2 normalization — so a drift in ANY stage of
    the embedder (padding, gram window, hash slice, bucket/sign
    arithmetic, normalization) flips hashed values.  Long format
    (vec_id, dim, val) so every float is a scalar rounded identically
    on both sides.  Scale shape: one Arrow pass, no shuffle (the
    embedding itself); the posexplode projection is partition-local."""
    from pyspark.sql import functions as SF

    from processor_edf_spark.operators.embed import hash_embed

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    vecs = hash_embed(
        spread(spark, docs.select("doc_id", "text")), dim=64, ngram=3
    )
    return vecs.select(
        "vec_id", SF.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        SF.col("dim").cast("long").alias("dim"),
        SF.round("v", 6).alias("val"),
    )


@register(
    "mp3_layer1_decode_stats",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
    p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS nf,
               1 + (doc_id // 4) % 2 AS nch,
               CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    ELSE 32000 END AS sr
        FROM d
    ),
    sb AS (  -- allocated subbands and their widths
        SELECT p.doc_id, tsb.sb, 2 + tsb.sb % 3 AS a
        FROM p CROSS JOIN range(0, 32) tsb(sb)
        WHERE (p.doc_id + tsb.sb) % 3 = 0
    ),
    codes AS (
        SELECT p.doc_id,
               (p.doc_id + ts.s * 7 + tc.c * 11 + sb.sb * 13 + tf.f * 17)
                   % (1 << (sb.a + 1)) AS code
        FROM p
        JOIN sb ON sb.doc_id = p.doc_id
        JOIN range(0, 2) tf(f) ON tf.f < p.nf
        CROSS JOIN range(0, 12) ts(s)
        JOIN range(0, 2) tc(c) ON tc.c < p.nch
    ),
    scf AS (
        SELECT p.doc_id,
               SUM((p.doc_id + 5 * sb.sb + 29 * tc.c) % 63) AS sum_scf
        FROM p
        JOIN sb ON sb.doc_id = p.doc_id
        JOIN range(0, 2) tc(c) ON tc.c < p.nch
        GROUP BY p.doc_id
    )
    SELECT p.doc_id,
           CAST(p.nf AS BIGINT) AS n_frames,
           CAST(p.nch AS BIGINT) AS n_channels,
           CAST(p.sr AS BIGINT) AS sample_rate,
           CAST(384 * p.nf AS BIGINT) AS n_samples,
           CAST((SELECT COUNT(*) FROM sb WHERE sb.doc_id = p.doc_id)
                AS BIGINT) AS n_alloc,
           CAST((SELECT SUM(code) FROM codes c WHERE c.doc_id = p.doc_id)
                AS BIGINT) AS sum_codes,
           CAST(scf.sum_scf AS BIGINT) AS sum_scf
    FROM p JOIN scf USING (doc_id)
    """,
)
def mp3_layer1_decode_stats(spark, sf_dir):
    """The MPEG-1 Layer I path (operators/mp3.py r12) as a driver-hashed
    row — the eighth codec row.  Per document a deterministic
    allocation/scalefactor/code fixture is encoded into a REAL Layer I
    bitstream, decoded through the production ``decode_mp3_frames``,
    and every decoded subband value is required BIT-EXACT against the
    requantization closed form (computed with the decoder's own
    numpy ops, so equality is exact) with the contracted PCM shape —
    only then are the INTEGER construction stats emitted for the
    oracle (float subband values never cross the engine boundary, so
    no libm-pow parity bet).  Sweeps mono/stereo, all three rates,
    1- and 2-frame streams, allocations 2-4 bits-1 over every third
    subband.  Scale: same spread() per-doc CPU shape as the sibling
    codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(
        spark, docs.select("doc_id").filter("doc_id % 4 = 3")
    )

    def gen(batches):
        from processor_edf_spark.operators.mp3 import (
            _l1_requant,
            _SF_TABLE_L1,
            decode_mp3_frames,
            encode_mp3_layer1,
        )

        rates = (44100, 48000, 32000)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = 2 if d % 3 == 0 else 1
                nch = 1 + (d // 4) % 2
                rate = rates[d % 3]

                def build(f):
                    alloc = [[0] * 32 for _ in range(nch)]
                    scf = [[0] * 32 for _ in range(nch)]
                    codes = [
                        [[0] * 32 for _ in range(nch)] for _ in range(12)
                    ]
                    for sb in range(32):
                        if (d + sb) % 3:
                            continue
                        a = 2 + sb % 3
                        for ch in range(nch):
                            alloc[ch][sb] = a
                            scf[ch][sb] = (d + 5 * sb + 29 * ch) % 63
                        for s in range(12):
                            for ch in range(nch):
                                codes[s][ch][sb] = (
                                    d + s * 7 + ch * 11 + sb * 13 + f * 17
                                ) % (1 << (a + 1))
                    return {"alloc": alloc, "scf_idx": scf, "codes": codes}

                frames = [build(f) for f in range(nf)]
                payload = encode_mp3_layer1(
                    frames, rate=rate, n_channels=nch, bitrate_kbps=256
                )
                decoded = decode_mp3_frames(payload)
                ok = len(decoded) == nf
                total_pcm = 0
                if ok:
                    for f, (hdr, S, pcm) in enumerate(decoded):
                        total_pcm += pcm.shape[0]
                        ok = ok and hdr["layer"] == 1 and hdr["rate"] == rate
                        ok = ok and pcm.shape == (384, nch)
                        ok = ok and bool(np.isfinite(pcm).all())
                        fr = frames[f]
                        for s in range(12):
                            for ch in range(nch):
                                for sb in range(32):
                                    a = fr["alloc"][ch][sb]
                                    exp = (
                                        _l1_requant(
                                            fr["codes"][s][ch][sb], a + 1
                                        )
                                        * _SF_TABLE_L1[fr["scf_idx"][ch][sb]]
                                        if a
                                        else 0.0
                                    )
                                    ok = ok and S[s, ch, sb] == exp
                if ok:
                    n_alloc = sum(
                        1 for sb in range(32) if (d + sb) % 3 == 0
                    )
                    sum_codes = 0
                    sum_scf = 0
                    for f in range(nf):
                        fr = frames[f]
                        for s in range(12):
                            for ch in range(nch):
                                for sb in range(32):
                                    if fr["alloc"][ch][sb]:
                                        sum_codes += fr["codes"][s][ch][sb]
                    for ch in range(nch):
                        for sb in range(32):
                            if frames[0]["alloc"][ch][sb]:
                                sum_scf += frames[0]["scf_idx"][ch][sb]
                    rows.append(
                        (d, nf, nch, rate, total_pcm, n_alloc,
                         sum_codes, sum_scf)
                    )
                else:
                    rows.append((d, nf, nch, rate, -1, -1, -1, -1))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_channels", "sample_rate",
                    "n_samples", "n_alloc", "sum_codes", "sum_scf",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, n_channels long, "
            "sample_rate long, n_samples long, n_alloc long, "
            "sum_codes long, sum_scf long"
        ),
    )


@register(
    "h264_inter_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS nf
        FROM documents
        WHERE doc_id % 8 = 1
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
def h264_inter_decode_stats(spark, sf_dir):
    """The H.264 P-slice INTER path (quarter-pel motion compensation,
    median MV prediction, mb_skip_run, every P partition type,
    intra-in-P — operators/h264.py r12) as a driver-hashed row: the
    first inter-coded video under the value oracle.  Per document a
    deterministic YUV420 GOP (every plane a pure integer function of
    doc_id; IDR + 1-2 P frames) is encoded to a real Annex-B stream at
    a doc-dependent QP (20/28/36), decoded back through the production
    ``decode_h264_ipcm``, and the decode is required BIT-EXACT against
    the encoder's reconstruction loop (which calls the decoder's own
    MC/dequant/IDCT helpers) with recon-vs-source error inside the
    quantisation bound (<= 64; measured 61 at QP 36).  Only then does
    the row emit the closed-form SOURCE plane sums the oracle
    reproduces — any interpolation slip (6-tap window, quarter
    rounding), MV-predictor slip (median rule, directional 16x8/8x16
    cases, skip conditions), CBP-table or partition-geometry error
    flips the row to the -1 sentinel (or changes dims) and reds it.
    Frame geometry is fixed 48x32 (6 macroblocks) so the deterministic
    P-MB kind mix ``(mb*5 + f_idx*3) % 8`` reaches P_L0_16x16, 16x8,
    8x16, P_8x8 and intra-in-P within every document (P_Skip needs a
    vanishing quantised residual, which the mod-pattern sources never
    produce — skip coverage is pinned in tests/test_h264_inter.py on a
    static scene instead).
    Scale: decode-heavy/emit-light (~58 ms/doc pure-python kernel),
    payload never leaves the executor; spread() across the session
    width like the sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(
        spark, docs.select("doc_id").filter("doc_id % 8 = 1")
    )

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.h264 import (
            decode_h264_ipcm,
            encode_h264_inter_recon,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                nf = 3 if d % 3 == 0 else 2
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
                stream, recons, _stats = encode_h264_inter_recon(
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
                else:
                    sums = [-1, -1, -1]
                rows.append((d, len(decoded), dw, dh, *sums))
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
    "h264_deblock_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS nf
        FROM documents
        WHERE doc_id % 16 = 5
    ),
    ysum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 2 + c.j + d.doc_id + f.j * 3) % 48 * 3
                        + 70) AS BIGINT) AS y_sum
        FROM d, range(0, 32) r(j), range(0, 48) c(j), range(0, 3) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    ),
    csum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j + c.j * 2 + d.doc_id + f.j) % 40 * 2
                        + 90) AS BIGINT) AS u_sum,
               CAST(SUM((r.j * 2 + c.j + 2 * d.doc_id + f.j) % 36 * 2
                        + 80) AS BIGINT) AS v_sum
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
def h264_deblock_decode_stats(spark, sf_dir):
    """(Doc density halved to %16 in the r14 continuation — the
    VERDICT r13 item-10 bench-share guidance; sweep coverage per doc
    unchanged.)  The H.264 in-loop DEBLOCKING path (spec §8.7, operators/h264.py
    r12) as a driver-hashed row: the same inter GOP shape as
    ``h264_inter_decode_stats`` but with the filter ENABLED (idc 0) at
    the blocking-regime QPs 28/34/40 over low-gradient sawtooth
    sources, where the filter demonstrably fires on every document
    (verified in the row's construction sweep — the filtered and
    unfiltered recons differ for all fixture docs).  The decode is
    required BIT-EXACT against the encoder reconstruction loop, which
    applies the decoder's own ``_deblock_picture`` after each picture
    (P frames reference FILTERED pictures per §8.4) — any
    boundary-strength slip, α/β/tc0 table error, filter-order mistake
    (vertical-before-horizontal, raster MBs), or QP-averaging bug
    (incl. the I_PCM QPY=0 rule) changes reconstructed samples and
    flips the row to the -1 sentinel.  Recon-vs-source error must stay
    inside the quantisation bound (<= 80; measured 69 at QP 40).
    Scale: same class as the sibling codec rows — per-doc pure-python
    CPU under spread(), payload never leaves the executor."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(
        spark, docs.select("doc_id").filter("doc_id % 16 = 5")
    )

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.h264 import (
            decode_h264_ipcm,
            encode_h264_inter_recon,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                nf = 3 if d % 3 == 0 else 2
                qp = 28 + (d % 3) * 6
                frames = []
                for f in range(nf):
                    r = np.arange(H)[:, None]
                    c = np.arange(W)[None, :]
                    y = (((r * 2 + c + d + f * 3) % 48) * 3 + 70).astype(
                        np.uint8
                    )
                    r2 = np.arange(H // 2)[:, None]
                    c2 = np.arange(W // 2)[None, :]
                    u = (((r2 + c2 * 2 + d + f) % 40) * 2 + 90).astype(
                        np.uint8
                    )
                    v = (((r2 * 2 + c2 + 2 * d + f) % 36) * 2 + 80).astype(
                        np.uint8
                    )
                    frames.append((y, u, v))
                stream, recons, _stats = encode_h264_inter_recon(
                    frames, W, H, qp=qp, deblock=True
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
                    <= 80
                    for rec, frm in zip(recons, frames)
                )
                if bit_exact and err_ok:
                    sums = [
                        int(sum(np.sum(frm[k], dtype=np.int64)
                                for frm in frames))
                        for k in range(3)
                    ]
                else:
                    sums = [-1, -1, -1]
                rows.append((d, len(decoded), dw, dh, *sums))
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
    "h264_bipred_decode_stats",
    """
    WITH d AS (
        SELECT doc_id,
               48 AS w,
               32 AS h,
               CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 4 END AS nf
        FROM documents
        WHERE doc_id % 16 = 3
    ),
    ysum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 3 + c.j * 5 + d.doc_id + f.j * 17) % 160
                        + 40) AS BIGINT) AS y_sum
        FROM d, range(0, 32) r(j), range(0, 48) c(j), range(0, 5) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    ),
    csum AS (
        SELECT d.doc_id,
               CAST(SUM((r.j * 7 + c.j * 11 + d.doc_id + f.j * 5) % 100
                        + 78) AS BIGINT) AS u_sum,
               CAST(SUM((r.j * 5 + c.j * 3 + 2 * d.doc_id + f.j * 9) % 120
                        + 60) AS BIGINT) AS v_sum
        FROM d, range(0, 16) r(j), range(0, 24) c(j), range(0, 5) f(j)
        WHERE f.j < d.nf
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.nf // 2 AS BIGINT) AS n_b_frames,
           CAST(d.w AS BIGINT) AS width,
           CAST(d.h AS BIGINT) AS height,
           ysum.y_sum, csum.u_sum, csum.v_sum
    FROM d JOIN ysum USING (doc_id) JOIN csum USING (doc_id)
    """,
)
def h264_bipred_decode_stats(spark, sf_dir):
    """(Doc density halved to %16 in the r14 continuation — the
    VERDICT r13 item-10 bench-share guidance; sweep coverage per doc
    unchanged.)  The H.264 B-SLICE layer (spec §7.3.5/§8.4.1.2/§8.4.2.3,
    operators/h264.py r12 second ratchet) as a driver-hashed row: the
    first bi-predicted video under the value oracle.  Per document a
    deterministic YUV420 sequence (every plane a pure integer function
    of doc_id and the DISPLAY frame index; 4 or 5 frames by parity) is
    encoded as the coded-order GOP I0,P2,B1[,P4,B3 | ,B3] at a
    doc-dependent QP (20/28/36) with doc-mixed direct mode (spatial
    for doc_id % 3 != 0, temporal otherwise — POC-distance scaling
    under the value oracle), decoded back through the production
    ``decode_h264_ipcm``, and required BIT-EXACT against the encoder's
    reconstruction loop with recon-vs-source error inside the
    quantisation bound (<= 64).  The 12-kind macroblock mix reaches
    B_Skip/B_Direct_16x16, every explicit L0/L1/Bi 16x16/16x8/8x16
    family, B_8x8 sub-types and intra-in-B within the fixture set; the
    row additionally requires at least one bi-predicted partition and
    one direct/skip macroblock per document and cross-checks the
    decoded B-picture count (= nf // 2, reproduced in the oracle from
    the GOP arithmetic).  Any slip in Table 7-14/7-18 geometry, per-
    list median prediction, the (p0 + p1 + 1) >> 1 default bi average,
    default-list construction (incl. the §8.2.4.2.3 L1 first-two
    swap, hit by every odd-parity doc's trailing past-only B), POC
    derivation, or direct-mode derivation flips the -1 sentinel (or a
    count) and reds the row.  4-frame docs end in a past-only B whose
    RefPicList1[0] is the IDR picture (colocated-intra temporal path);
    5-frame docs exercise the classic between-references B twice.
    Scale: decode-heavy/emit-light per-doc pure-python kernel under
    spread(), payload never leaves the executor, same class as the
    sibling codec rows."""
    import pandas as pd

    (docs,) = load(spark, sf_dir, "documents")
    from processor_edf_spark.plans.registry import spread

    docs = spread(
        spark, docs.select("doc_id").filter("doc_id % 16 = 3")
    )

    def gen(batches):
        import numpy as np

        from processor_edf_spark.operators.h264 import (
            decode_h264_ipcm,
            encode_h264_bipred_recon,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                W, H = 48, 32
                nf = 5 if d % 2 == 0 else 4
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
                stream, recons, stats = encode_h264_bipred_recon(
                    frames, W, H, qp=qp,
                    spatial_direct=(d % 3 != 0),
                    # r13: sweep weighted prediction through the row —
                    # default / explicit (P+B tables) / POC-implicit
                    weighted=(None, "explicit", "implicit")[(d // 8) % 3],
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
                # recons (and the decode) are in DISPLAY order (r13),
                # so they pair positionally with the input frames
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
                n_b = sum(1 for _dsp, k in stats["order"] if k == "B")
                coverage = (
                    n_b == nf // 2
                    and stats["bi_parts"] > 0
                    and stats["B_Direct"] + stats["B_Skip"] > 0
                )
                if bit_exact and err_ok and coverage:
                    sums = [
                        int(sum(np.sum(frm[k], dtype=np.int64)
                                for frm in frames))
                        for k in range(3)
                    ]
                    nb_out = n_b
                else:
                    sums = [-1, -1, -1]
                    nb_out = -1
                rows.append(
                    (d, len(decoded), nb_out, dw, dh, *sums)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_b_frames", "width",
                    "height", "y_sum", "u_sum", "v_sum",
                ],
            )

    return docs.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_frames long, n_b_frames long, "
            "width long, height long, "
            "y_sum long, u_sum long, v_sum long"
        ),
    )


_VEC_BOUND = 512  # lifecycle-row fixture bound: keep the index small

_DIMS_CTES_BOUNDED = _DIMS_CTES.replace(
    "FROM embeddings e",
    f"FROM (SELECT * FROM embeddings WHERE vec_id < {_VEC_BOUND}) e",
)


@register(
    "ann_index_lifecycle_exact",
    f"""
    WITH {_DIMS_CTES_BOUNDED}, {_TRUE_DIST_CTE},
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings WHERE vec_id < {_VEC_BOUND}
    )
    SELECT r.query_id, r.rank, r.neighbor_id, r.dist_sq,
           tot.n AS n_vectors
    FROM (
        SELECT d.query_id, d.neighbor_id, d.d2 AS dist_sq,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY d.query_id
                   ORDER BY d.d2 ASC, d.neighbor_id ASC
               ) AS BIGINT) AS rank
        FROM dist d
    ) r CROSS JOIN tot
    WHERE r.rank <= {_TOPK}
    """,
)
def ann_index_lifecycle_exact(spark, sf_dir):
    """The PERSISTED incremental ANN index (operators/ann_index.py,
    r12) driven through its full production lifecycle under the value
    oracle: build (train + encode + base commit) on the even half of
    the bounded fixture vectors, append the odd half with the FROZEN
    model, re-drop the same batch (idempotence: 0 admitted), search
    with exact re-rank, compact the log, run the staleness audit,
    search again — post-compact results must be identical.  Probing
    ALL cells with a full-depth shortlist makes the searched set the
    whole index regardless of what k-means trained, so the exact
    re-ranked top-k equals the oracle's closed-form true-distance
    ranking (same codebook-built vectors as ``pq_adc_exact``) — while
    the lifecycle invariants (version numbering 0→1→compact 2,
    admitted counts summing to the fixture size, idempotent re-drop,
    compaction preserving every code row, bit-identical pre/post-
    compact search) are enforced Spark-side and collapse the row to
    the -1 sentinel on any violation.  Scale shape: training sample is
    bounded, append encodes only the drop, search prunes by the hive
    cell partition, and the emitted payload is queries x k rows; the
    row bounds the fixture at vec_id < {_VEC_BOUND} so the lifecycle
    cost stays flat across scale factors."""
    import shutil
    import tempfile

    from processor_edf_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_compact,
        ann_index_search,
        ann_index_staleness,
    )

    (emb,) = load(spark, sf_dir, "embeddings")
    # one scan of the base table; every lifecycle stage (train sample,
    # encode passes, re-rank joins, counts) reuses the tiny bounded
    # fixture instead of re-reading parquet per action
    vecs = materialize(
        _fixture_vectors(emb.filter(f"vec_id < {_VEC_BOUND}"))
        .repartition(1)  # 512 rows: single-task lifecycle jobs
    )
    build_df = vecs.filter("vec_id % 2 = 0")
    drop_df = vecs.filter("vec_id % 2 = 1")
    Q, qids = _queries()
    idx = tempfile.mkdtemp(prefix="annidx_")
    try:
        built = ann_index_build(
            spark, build_df, idx, n_cells=_K, m=_M, k=_K, n_iter=10
        )
        a1 = ann_index_append(spark, drop_df, idx)
        a2 = ann_index_append(spark, drop_df, idx)  # idempotent re-drop

        def search():
            return sorted(
                (
                    int(r["query_id"]),
                    int(r["rank"]),
                    int(r["neighbor_id"]),
                    float(r["dist_sq"]),
                )
                for r in ann_index_search(
                    spark, idx, Q, qids, k=_TOPK, nprobe=_K,
                    shortlist=2 * _VEC_BOUND, rerank_df=vecs,
                ).collect()
            )

        res = search()
        n_compact = ann_index_compact(spark, idx)
        stale = ann_index_staleness(spark, idx)
        res_after = search()
        n_total = vecs.count()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    ok = (
        built["version"] == 0
        and a1["version"] == 1
        and a1["n_appended"] > 0
        and a2["n_appended"] == 0
        and built["n_vectors"] + a1["n_appended"] == n_total
        and n_compact == n_total
        and stale["n_vectors"] == n_total
        and res_after == res
        and len(res) == _N_Q * _TOPK
    )
    rows = [
        (q, rk, nb if ok else -1, d if ok else -1.0,
         n_total if ok else -1)
        for q, rk, nb, d in res
    ]
    return spark.createDataFrame(
        rows,
        "query_id long, rank long, neighbor_id long, "
        "dist_sq double, n_vectors long",
    )
