"""Text analysis + deduplication plans over the `documents` table — the
training-data-pipeline operators (SURVEY.md §M5 extensions): exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard, language ID, quality scoring, token
stats, fingerprinting, multimodal metadata.

Scale notes:
- Exact dedup and MinHash are single groupBy passes — linear, shuffle on
  doc hash / (band, key): the 100 TB path.
- The pairwise n-gram Jaccard joins documents on shared shingles — at scale
  the shingle join explodes on hot shingles; it exists as the exact oracle
  for what MinHash+LSH approximates (use LSH for >1 TB corpora).
- All hashing is md5-based (operators/textfns.hash64) so DuckDB computes
  bit-identical values for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from processor_edf_spark.operators.textfns import (
    STOPWORDS,
    hash64,
    hash64_sql,
    lang_id,
    lang_id_sql,
    tokens,
    word_shingles,
)
from processor_edf_spark.plans.registry import load, register, spread
from processor_edf_spark.materialize import materialize

FP_PRIME = 1_000_000_007
MINHASH_K = 8  # 8 hash functions → 4 LSH bands of width 2
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.30

_TOK_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_SHINGLE_SQL = (
    "list_transform(generate_series(1, greatest(len({t}) - 2, 0)), "
    "i -> array_to_string(list_slice({t}, i, i + 2), ' '))"
).format(t=_TOK_SQL)


# ---------------------------------------------------------------------------
# Token stats / quality / language ID
# ---------------------------------------------------------------------------


@register(
    "token_stats",
    f"""
    SELECT doc_id,
           len({_TOK_SQL}) AS n_tokens,
           length(text) AS text_chars,
           ROUND(list_aggregate(list_transform({_TOK_SQL}, t -> length(t)), 'sum')
                 / CAST(len({_TOK_SQL}) AS DOUBLE), 4) AS avg_token_len
    FROM documents
    """,
)
def token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + average token length — all
    array-expression work, no shuffle, no Python."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    total_len = F.aggregate(
        F.transform(tok, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return documents.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.length("text").alias("text_chars"),
        F.round(total_len / F.size(tok).cast("double"), 4).alias("avg_token_len"),
    )


_STOP_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           ROUND((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
           ROUND(len(list_filter({_TOK_SQL}, x -> x IN ({_STOP_EN})))
                 / CAST(len({_TOK_SQL}) AS DOUBLE), 4) AS stopword_ratio,
           ROUND(LEAST(1.0, len({_TOK_SQL}) / 50.0)
                 * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                        / CAST(length(text) AS DOUBLE))
                 * (1.0 - ABS(len(list_filter({_TOK_SQL}, x -> x IN ({_STOP_EN})))
                        / CAST(len({_TOK_SQL}) AS DOUBLE) - 0.4)), 4) AS quality_score
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring: length, punctuation ratio, stopword ratio folded
    into one deterministic score — the usual pre-training quality gate."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.size(tok).cast("double")
    punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[^a-zA-Z0-9 ]", ""))
    ) / F.length("text").cast("double")
    stop_ratio = (
        F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS["en"]))) / n_tok
    )
    score = (
        F.least(F.lit(1.0), n_tok / 50.0)
        * (1.0 - punct)
        * (1.0 - F.abs(stop_ratio - 0.4))
    )
    return documents.select(
        "doc_id",
        F.round(punct, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


@register(
    "lang_id_heuristic",
    f"""
    SELECT doc_id, lang AS declared_lang, {lang_id_sql()} AS predicted_lang
    FROM documents
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Language ID via stopword-marker scoring with a deterministic argmax
    (operators/textfns.lang_id)."""
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        lang_id(F.col("text"), tokens(F.col("text"))).alias("predicted_lang"),
    )


@register(
    "doc_fingerprint",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS t FROM documents
    )
    SELECT doc_id,
           CAST(SUM({hash64_sql('t')} % {FP_PRIME}) % {FP_PRIME} AS BIGINT) AS fingerprint
    FROM tok GROUP BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprint: order-independent hash-sum over distinct
    tokens mod a prime — a compact content signature."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    )
    return tok.groupBy("doc_id").agg(
        (F.sum(hash64(F.col("t")) % FP_PRIME) % FP_PRIME)
        .cast("long")
        .alias("fingerprint")
    )


_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe_tokens,
           len({_TOK_SQL}) AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_count(spark, sf_dir):
    """Token counting, BPE-ish flavor: alpha runs / digit runs /
    single punctuation as separate tokens (the pre-tokenizer split BPE
    vocabularies build on), alongside the whitespace count.  Both are
    single regexp passes — JVM regex, no shuffle."""
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
    )


ROLL_BASE = 131


@register(
    "rolling_fingerprint",
    f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform({_TOK_SQL},
                                  t -> {hash64_sql('t')} % {FP_PRIME})),
               (acc, x) -> (acc * {ROLL_BASE} + x) % {FP_PRIME}
           ) AS fingerprint
    FROM documents
    """,
)
def rolling_fingerprint(spark, sf_dir):
    """Order-SENSITIVE document fingerprint: polynomial rolling hash over
    the token stream, fp = Σ h(tokᵢ)·B^(n-1-i) mod P — distinguishes
    reordered duplicates that the order-independent doc_fingerprint
    collapses.  Pure ``F.aggregate`` fold per row: no shuffle, no Python.
    Mod applied per step keeps every intermediate < P·B ≪ 2⁶³ (Spark longs
    wrap silently on overflow; DuckDB BIGINTs raise — staying small keeps
    both engines exact and identical)."""
    (documents,) = load(spark, sf_dir, "documents")
    tok_hashes = F.transform(
        tokens(F.col("text")), lambda t: hash64(t) % FP_PRIME
    )
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % FP_PRIME,
    )
    return documents.select("doc_id", fp.alias("fingerprint"))


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
)
def multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: treat content as an opaque binary column with
    typed metadata (byte length + content hash).  The same schema carries
    image/audio/video payloads; see operators/multimodal.py for the decode
    UDF scaffolding (stubbed — codec libs absent in this environment)."""
    (documents,) = load(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return documents.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha256"),
    )


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy, keep lowest doc_id as canonical.  One
    shuffle on the content hash — the always-first dedup pass at any scale."""
    (documents,) = load(spark, sf_dir, "documents")
    return documents.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS shingle
        FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs via shared-shingle join.
    This is the *exact* oracle that MinHash+LSH approximates; the shingle
    self-join is quadratic in hot shingles — at corpus scale run
    minhash_lsh_pairs instead and verify candidates with this on the
    candidate set only."""
    (documents,) = load(spark, sf_dir, "documents")
    sh = materialize(spread(spark, documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_K))
        ).alias("shingle"),
    ))  # feeds sizes + BOTH join sides: one
    # shingle+md5 pass instead of three (subtree reuse does not cross
    # broadcast/shuffle branches)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
        "double"
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# MinHash family: ONE md5 per shingle, then k affine rehashes
# h_k(x) = (a_k·x + b_k) mod P over the 31-bit base hash.  8 md5 calls per
# shingle row was the sf0.1 bench bottleneck; the affine family is the
# standard universal-hash construction and is pure integer codegen.
# Constants derived from md5 at import (deterministic, engine-portable);
# a_k < 2³¹ and base < 2³¹ keep a_k·base < 2⁶² — no int64 overflow in
# either engine.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _affine_const(tag: str, k: int, lo: int) -> int:
    import hashlib

    return int(hashlib.md5(f"mh-{tag}{k}".encode()).hexdigest()[:7], 16) % (
        MINHASH_P - lo
    ) + lo


MINHASH_AB = [
    (_affine_const("a", k, 1), _affine_const("b", k, 0)) for k in range(MINHASH_K)
]


def _minhash_sig_sql(src: str = "documents") -> str:
    """Signature SQL over any (doc_id, text) relation — ``src`` lets the
    corpus_job_report oracle run the identical minhash over its
    exact-dedup-survivor CTE."""
    base = f"({hash64_sql('shingle')} % {MINHASH_P})"
    mins = ",\n           ".join(
        f"MIN(({a} * base + {b}) % {MINHASH_P}) AS mh{k}"
        for k, (a, b) in enumerate(MINHASH_AB)
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {base} AS base
        FROM (SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS shingle
              FROM {src})
    )
    SELECT doc_id,
           {mins}
    FROM sh GROUP BY doc_id
    """


@register("minhash_signatures", _minhash_sig_sql())
def minhash_signatures(spark, sf_dir):
    """MinHash signatures: k=8 universal hashes h_k = (a_k·md5₆₀ + b_k)
    mod 2³¹-1, min per doc — one explode + one groupBy (linear, the
    100 TB dedup path); one md5 per shingle, rehashes are integer codegen."""
    (documents,) = load(spark, sf_dir, "documents")
    sh = spread(spark, documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_K))
        ).alias("shingle"),
    ).select("doc_id", (hash64(F.col("shingle")) % MINHASH_P).alias("base"))
    aggs = [
        F.min((F.lit(a) * F.col("base") + F.lit(b)) % MINHASH_P).alias(f"mh{k}")
        for k, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _lsh_pairs_sql() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"CAST(mh{2*b} AS VARCHAR) || ':' || CAST(mh{2*b+1} AS VARCHAR) AS band_key "
        f"FROM sig"
        for b in range(MINHASH_K // 2)
    )
    return f"""
    WITH sig AS ({_minhash_sig_sql()}),
    bands AS ({bands})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
    """


@register("minhash_lsh_pairs", _lsh_pairs_sql())
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash + LSH candidate pairs: signatures → 4 bands of width 2 →
    equi-join on (band, key).  All-equi join on banded keys means no
    quadratic blowup: candidate generation is proportional to true
    collisions.  This IS the scalable near-dup operator.

    The signature frame feeds BOTH join sides; Spark cannot reuse the
    subtree across a broadcast and a shuffle branch (measured: 2 full
    parquet scans, the shingle+md5 pass twice), so one eager
    localCheckpoint of the k-int-per-doc frame — O(docs), the same
    order as the join it feeds — caps the corpus pass at one."""
    sig = materialize(minhash_signatures(spark, sf_dir))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ":",
                    F.col(f"mh{2*b}").cast("string"),
                    F.col(f"mh{2*b+1}").cast("string"),
                ).alias("band_key"),
            )
            for b in range(MINHASH_K // 2)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _simhash_sql(bits: int = 16) -> str:
    tokhash = hash64_sql("t")
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, {tokhash} % {1 << bits} AS th
        FROM (SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS t FROM documents)
    ), sums AS (
        SELECT doc_id, {bit_sums} FROM tok GROUP BY doc_id
    )
    SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash FROM sums
    """


def _simhash_df(spark, sf_dir, bits: int = 16):
    """SimHash fingerprints at the given width: per distinct token take a
    ``bits``-wide md5-derived hash, vote ±1 per bit position, sign of the
    sum is the fingerprint bit.  One explode + one groupBy — linear.

    No ``spread`` here (unlike the minhash shingle kernel): the per-doc
    token kernel is light enough that the extra shuffle measured SLOWER
    at sf0.1 (0.24 s → 0.45 s for simhash_16)."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    ).select("doc_id", (hash64(F.col("t")) % (1 << bits)).alias("th"))
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("th"), j) % 2) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    simhash = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.cast("long").alias("simhash"))


@register("simhash_16", _simhash_sql(16))
def simhash_16(spark, sf_dir):
    """SimHash (16-bit): near-dups differ in few bits (hamming distance).
    See ``_simhash_df``."""
    return _simhash_df(spark, sf_dir, 16)


SIMHASH_MAX_HAMMING = 3
SIMHASH_PAIR_BITS = 32  # 4 bands × 8 bits: buckets stay small (see below)


@register(
    "simhash_near_pairs",
    f"""
    WITH sims AS ({_simhash_sql(SIMHASH_PAIR_BITS)})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs via byte-band LSH: split a 32-bit
    fingerprint into 4 bytes; candidates share (band, byte); exact
    hamming ≤ 3 filters survivors.  Pigeonhole guarantees perfect recall
    (≤3 differing bits leave ≥1 of 4 bands untouched), so the banded join
    returns EXACTLY the quadratic all-pairs result — which is what the
    oracle computes — while candidate generation stays linear in true
    collisions.  32-bit/8-bit bands rather than 16/4: 4-bit bands over a
    few thousand docs put ~6% of the corpus in every bucket (the
    candidate set went quadratic again — 15× slower); byte bands keep
    buckets sparse.

    r15: hamming distance depends only on the fingerprint VALUE, so docs
    are grouped by exact simhash first (5000 docs → 3122 distinct values
    at sf0.1, dup-heavy by construction) and the band join + distinct
    run over one representative per value; passing value pairs expand
    through the membership lists and same-value pairs emit hamming 0
    directly — the identical pair set, with the quadratic dup-cluster
    blowup collapsed out of the join (the jaccard_prefix_pairs
    discipline).  The grouped frame is the one materialization (feeds
    the band self-join and both expansion joins)."""
    sims = _simhash_df(spark, sf_dir, SIMHASH_PAIR_BITS)
    groups = materialize(
        sims.groupBy("simhash").agg(
            F.min("doc_id").alias("gid"),
            F.collect_list("doc_id").alias("members"),
        )
    )
    bands = groups.select(
        "gid",
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
    ).select(
        "gid", "simhash", F.col("bn.band").alias("band"),
        F.col("bn.key").alias("key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    gpairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.gid") < F.col("b.gid")),
        )
        .select(
            F.col("a.gid").alias("ga"),
            F.col("b.gid").alias("gb"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        # explicit-width pair-key repartition reused by the distinct:
        # AQE would coalesce the small-byte dedup to one partition and
        # serialize it plus the expansion (the jaccard fix)
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "ga", "gb"
        )
        .distinct()
    )
    mem = groups.select("gid", "members")
    inter = (
        gpairs.join(
            mem.withColumnRenamed("gid", "ga").withColumnRenamed(
                "members", "ma"
            ),
            "ga",
        )
        .join(
            mem.withColumnRenamed("gid", "gb").withColumnRenamed(
                "members", "mb"
            ),
            "gb",
        )
        .select(F.explode("ma").alias("x"), "mb", "hamming")
        .select("x", F.explode("mb").alias("y"), "hamming")
        .select(
            F.least("x", "y").alias("doc_a"),
            F.greatest("x", "y").alias("doc_b"),
            "hamming",
        )
    )
    intra = (
        groups.filter(F.size("members") >= 2)
        .select(F.explode("members").alias("x"), "members")
        .select("x", F.explode("members").alias("y"))
        .filter(F.col("x") < F.col("y"))
        .select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return inter.unionByName(intra)


# ---------------------------------------------------------------------------
# Corpus sampling + term weighting (training-pipeline staples)
# ---------------------------------------------------------------------------

SAMPLE_BUCKETS = 100
SAMPLE_KEEP = 10  # deterministic 10% sample


@register(
    "sample_hash_bucket",
    f"""
    SELECT doc_id, bucket FROM (
        SELECT doc_id,
               {hash64_sql("CAST(doc_id AS VARCHAR)", "sample")} % {SAMPLE_BUCKETS}
                 AS bucket
        FROM documents
    ) WHERE bucket < {SAMPLE_KEEP}
    """,
)
def sample_hash_bucket(spark, sf_dir):
    """Deterministic hash-bucket sampling — the reproducible alternative to
    rand()-based df.sample for corpus subsetting: md5(doc_id) % 100 < 10
    keeps the SAME 10% on every engine, every run, every cluster size, so
    a train/eval split or an ablation subset is stable across reruns and
    auditable from the id alone.  Pure column expressions, no shuffle; at
    100 TB the predicate rides the scan (row-group level after projection
    pushdown) and the sample never materializes the rejected 90%."""
    (documents,) = load(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string"), "sample") % SAMPLE_BUCKETS
    return (
        documents.select("doc_id", bucket.alias("bucket"))
        .filter(F.col("bucket") < SAMPLE_KEEP)
    )


def _lsh_components_sql() -> str:
    """Oracle for the linear LSH dedup path: the same minhash bands as
    minhash_lsh_pairs, bucket-star edges, and the transitive closure as
    a recursive CTE (DuckDB WITH RECURSIVE label propagation)."""
    sig = _minhash_sig_sql().strip()
    bands = " UNION ALL ".join(
        f"SELECT doc_id, CAST({b} AS VARCHAR) || ':' || "
        f"CAST(mh{2*b} AS VARCHAR) || ':' || CAST(mh{2*b+1} AS VARCHAR) "
        f"AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
    WITH RECURSIVE sig AS ({sig}),
    bands AS ({bands}),
    roots AS (SELECT band_key, MIN(doc_id) AS root FROM bands GROUP BY band_key),
    edges AS (
        SELECT DISTINCT r.root AS a, b.doc_id AS b
        FROM bands b JOIN roots r USING (band_key)
        WHERE b.doc_id <> r.root
    ),
    bidir AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
    ids AS (SELECT DISTINCT doc_id FROM bands),
    reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM ids
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN bidir e ON e.a = r.id
    )
    SELECT id AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
    FROM reach GROUP BY id
    """


@register("dedup_lsh_components", _lsh_components_sql())
def dedup_lsh_components(spark, sf_dir):
    """The LINEAR-scale dedup path as a driver-contract query: minhash
    band buckets → per-bucket star edges to the minimum doc_id → the
    transitive closure via ``operators/lsh_dedup.lsh_components``
    (pointer-jumping connected components) → (doc_id, component) with
    the component labeled by its minimum member.

    This is candidate-level clustering — the relaxation that makes
    dedup linear in corpus size (a size-g duplicate group costs g-1
    edges, never g²/2 pairs; see BASELINE.md's r5 scale sweep:
    2.8 s at 8× where pair enumeration takes 100-190 s).  Minhash band
    keys carry ~2¹²⁰ values, so chance collisions never chain unrelated
    docs.  The oracle expresses the same closure as a DuckDB recursive
    CTE — the one iterative operator in the repo that IS
    SQL-expressible, so even the graph path gets a hash-exact driver
    check."""
    from processor_edf_spark.operators.lsh_dedup import lsh_components

    sig = minhash_signatures(spark, sf_dir)
    bucketed = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(b),
                        F.col(f"mh{2*b}"),
                        F.col(f"mh{2*b+1}"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band_key"),
    )
    return lsh_components(bucketed, id_col="doc_id", key_col="band_key")


CHUNK_TOKENS = 64
CHUNK_STEP = 48  # 16-token overlap between consecutive chunks


@register(
    "chunk_documents",
    f"""
    WITH tok AS (
        SELECT doc_id, {_TOK_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(t, i * {CHUNK_STEP} + 1,
                               i * {CHUNK_STEP} + {CHUNK_TOKENS})) AS BIGINT)
               AS n_chunk_tokens,
           sha256(array_to_string(
               list_slice(t, i * {CHUNK_STEP} + 1,
                          i * {CHUNK_STEP} + {CHUNK_TOKENS}), ' '))
               AS chunk_sha
    FROM tok, UNNEST(generate_series(
        0, GREATEST(CAST(CEIL(len(t) / {CHUNK_STEP}.0) AS INT) - 1, 0)
    )) AS u(i)
    WHERE i * {CHUNK_STEP} < len(t)
    """,
)
def chunk_documents(spark, sf_dir):
    """Overlapping-window document chunking — the step between cleaning
    and sequence packing: long documents become {CHUNK_TOKENS}-token
    chunks advancing {CHUNK_STEP} tokens (16-token overlap, so context
    at a boundary appears in both neighbors — the standard pre-training
    and retrieval-index chunking).  Returns one row per chunk with its
    token count and the sha-256 of the chunk text (compact, hash-exact
    oracle compare; the text itself reconstructs from (doc_id, idx)).

    Scale: one explode of a per-row index sequence + pure array slices,
    no shuffle — the chunk rows stream out of the scan projection; at
    100 TB this composes with split_assignment and pack_sequences in
    the same pass."""
    (documents,) = load(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size(t)
    idx = F.filter(
        F.sequence(
            F.lit(0),
            F.greatest(F.ceil(n / CHUNK_STEP).cast("int") - 1, F.lit(0)),
        ),
        lambda i: i * CHUNK_STEP < n,
    )
    return (
        documents.select(
            "doc_id", t.alias("t"), F.explode(idx).alias("chunk_idx")
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(
                F.slice(F.col("t"), F.col("chunk_idx") * CHUNK_STEP + 1, CHUNK_TOKENS)
            ).cast("long").alias("n_chunk_tokens"),
            F.sha2(
                F.array_join(
                    F.slice(
                        F.col("t"), F.col("chunk_idx") * CHUNK_STEP + 1, CHUNK_TOKENS
                    ),
                    " ",
                ),
                256,
            ).alias("chunk_sha"),
        )
    )


SPLIT_BUCKETS = 1000
SPLIT_TRAIN = 900  # 90% train
SPLIT_VAL = 950    # 5% val, 5% test


@register(
    "split_assignment",
    f"""
    SELECT doc_id,
           CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
                WHEN bucket < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               {hash64_sql("CAST(doc_id AS VARCHAR)", "split")} % {SPLIT_BUCKETS}
                 AS bucket
        FROM documents
    )
    """,
)
def split_assignment(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) by salted
    md5-bucket of the document id — the split every training pipeline
    needs to be STABLE: the same doc lands in the same split on every
    engine, every run, every cluster size, and membership is auditable
    from the id alone (no persisted split table to drift).  The salt
    decorrelates it from ``sample_hash_bucket``'s buckets, so sampling
    and splitting never alias.

    Scale: pure column expressions — no shuffle, no state; at 100 TB
    this rides the scan as a projection and the split can gate
    per-split sinks in the same pass."""
    (documents,) = load(spark, sf_dir, "documents")
    bucket = hash64(F.col("doc_id").cast("string"), "split") % SPLIT_BUCKETS
    return documents.select(
        "doc_id",
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "normalize_text",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_raw,
           CAST(length(norm) AS BIGINT) AS n_norm,
           sha256(norm) AS norm_sha
    FROM (
        SELECT doc_id, text,
               lower(trim(regexp_replace(regexp_replace(text,
                   '[\x00-\x1f]+', ' ', 'g'), '\s+', ' ', 'g'))) AS norm
        FROM documents
    )
    """,
)
def normalize_text(spark, sf_dir):
    """Dedup-grade text normalization: strip control characters,
    collapse whitespace runs, trim, casefold — then sha-256 the
    normalized form.  Exact dedup on raw bytes misses trivially-mutated
    copies (extra spaces, CRLF vs LF, case); hashing the normalized
    form is the standard first pass before MinHash.  The normalization
    is two chained regexp passes chosen (like operators/redaction.py)
    to parse identically in Java regex and RE2, so the DuckDB oracle
    computes byte-identical hashes.

    Scale: pure JVM column expressions in one codegen stage — no
    shuffle, no Python; feed ``norm_sha`` to dedup_exact /
    dedup_incremental unchanged."""
    from processor_edf_spark.operators.textfns import normalized_text

    (documents,) = load(spark, sf_dir, "documents")
    norm = normalized_text(F.col("text"))
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_raw"),
        F.length(norm).cast("long").alias("n_norm"),
        F.sha2(norm, 256).alias("norm_sha"),
    )


TFIDF_TOPK = 3


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), idf AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ), n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT doc_id, term, score, rnk AS rank FROM (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(n.n / CAST(idf.df AS DOUBLE)), 6) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY ROUND(tf.tf * ln(n.n / CAST(idf.df AS DOUBLE)), 6) DESC,
                            tf.term ASC) AS rnk
        FROM tf JOIN idf USING (term) CROSS JOIN n
    ) WHERE rnk <= {TFIDF_TOPK}
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Top-{TFIDF_TOPK} terms per document by tf·idf (raw tf × ln(N/df)) —
    the keyword-extraction / relevance-weighting primitive.  Two linear
    aggregations (tf per (doc, term); df per term) + an equi-join on term
    + a per-doc top-k window that rewrites to WindowGroupLimit, so the
    final sort never sees more than k rows per doc.  The scores are
    rounded to 6 decimals BEFORE ranking with a term tiebreak, so the
    ordering is identical across engines (ln is within 1 ulp on both —
    far below the rounding grain).  df join is a plain shuffle equi-join
    (term dimension is unbounded at scale; AQE broadcasts it when small).
    """
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n"))
    score = F.round(
        F.col("tf") * F.log(F.col("n") / F.col("df").cast("double")), 6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "term", "score", "rank")
    )


NGRAM_TOPK = 10


@register(
    "ngram_lang_profile",
    f"""
    WITH d AS (
        SELECT lang, lower(trim(text)) AS t FROM documents
    ), g AS (
        SELECT lang, substr(t, i, 3) AS gram
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i
        )
    ), c AS (
        SELECT lang, gram, COUNT(*) AS cnt FROM g GROUP BY lang, gram
    )
    SELECT lang, gram, cnt, rnk AS rank FROM (
        SELECT lang, gram, cnt,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, gram ASC) AS rnk
        FROM c
    ) WHERE rnk <= {NGRAM_TOPK}
    """,
)
def ngram_lang_profile(spark, sf_dir):
    """Top-{NGRAM_TOPK} character trigrams per language — the profile a
    trainable language-ID model is built from (the ``lang_id_heuristic``
    query consumes a hand-rolled version of exactly this table).

    Plan: per-row trigram expansion via transform(sequence) + explode —
    ~n_chars rows out per doc, but the very next operator is a partial
    (map-side) count, so the shuffle carries only (lang, gram) partial
    counts, not the exploded corpus.  The per-lang top-k window rewrites
    to WindowGroupLimit.  Count ties are broken by gram text, so the
    selected k is deterministic cross-engine.  Both engines index
    characters (not bytes): substr/substring agree on multi-byte text.

    The normalization (lower∘trim) is hoisted BELOW the Generate: explode
    the position sequence first, then substring the already-normalized
    column — normalizing inside the per-element lambda re-lowercases the
    whole document once per trigram, an accidental O(n²) per doc that
    measured 3× slower at sf0.1."""
    (documents,) = load(spark, sf_dir, "documents")
    # drop docs shorter than one trigram BEFORE the explode: Spark's
    # sequence(1, 0) is the DESCENDING array [1, 0] (not empty like
    # DuckDB's generate_series), which would double-count short texts
    d = (
        spread(spark, documents)
        .select("lang", F.lower(F.trim(F.col("text"))).alias("t"))
        .filter(F.length("t") >= 3)
    )
    grams = d.select(
        "lang",
        "t",
        F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
    ).select("lang", F.expr("substring(t, i, 3)").alias("gram"))
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return (
        grams.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= NGRAM_TOPK)
    )


LEV_PREFIX = 12
LEV_MAX_DIST = 60


@register(
    "levenshtein_block_pairs",
    f"""
    WITH d AS (
        SELECT doc_id, lang, lower(trim(text)) AS t FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.t, b.t) AS edit_dist
    FROM d a
    JOIN d b ON a.lang = b.lang
            AND substr(a.t, 1, {LEV_PREFIX}) = substr(b.t, 1, {LEV_PREFIX})
            AND a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= {LEV_MAX_DIST}
    """,
)
def levenshtein_block_pairs(spark, sf_dir):
    """Edit-distance near-dup pairs, prefix-blocked: candidates share
    (lang, first {LEV_PREFIX} normalized chars), then exact Levenshtein
    ≤ {LEV_MAX_DIST} within the block.  The blocking is the scale story —
    the O(len²)-per-pair DP runs only inside prefix buckets (an equi-join
    both engines hash-partition), never across the corpus; the classic
    cheap recall-boosting complement to MinHash for short/templated text.
    Spark's levenshtein and DuckDB's are both the standard char-level DP,
    so the integer distances agree exactly.

    Two executed-plan refinements over the naive form (which measured
    5.4 s at sf0.1 — the DP ran unguarded, first in the join residual,
    in ONE task because the single parquet file scans as one partition):
    both sides spread (``registry.spread``: conditional round-robin
    repartition, a no-op when the scan is already wide) so block scoring
    parallelizes even from a one-file scan, and the Spark side uses the
    threshold form ``levenshtein(l, r, d)`` — a banded O(n·d) DP that
    returns -1 past the threshold, ~{LEV_MAX_DIST}/len of the full
    DP's work.  ``dist >= 0`` ≡ the oracle's ``dist <= {LEV_MAX_DIST}``
    for the surviving rows, whose emitted distance is exact.

    The join is a plain shuffle hash equi-join on ``(lang, prefix)`` —
    deliberately NOT a broadcast: the build side is the full document
    table (doc_id + normalized text for every row), which is unbounded
    at corpus scale — broadcasting it is an executor-OOM at 100 TB.
    Both engines hash-partition the same key, AQE may still downgrade
    to broadcast at runtime when stats show the build side is genuinely
    small; ``tests/test_plan_shapes.py`` pins the no-static-broadcast
    shape."""
    (documents,) = load(spark, sf_dir, "documents")
    d = documents.select(
        "doc_id", "lang", F.lower(F.trim(F.col("text"))).alias("t")
    )
    a = spread(spark, d).select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("t").alias("ta"),
        F.substring("t", 1, LEV_PREFIX).alias("pfx_a"),
    )
    b = spread(spark, d).select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("t").alias("tb"),
        F.substring("t", 1, LEV_PREFIX).alias("pfx_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang_a") == F.col("lang_b"))
            & (F.col("pfx_a") == F.col("pfx_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("ta"), F.col("tb"), LEV_MAX_DIST).alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") >= 0)
    )


HIST_BUCKET_CHARS = 100


@register(
    "doc_length_histogram",
    f"""
    SELECT lang,
           CAST(FLOOR(n_chars / {HIST_BUCKET_CHARS}.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
    FROM documents
    GROUP BY lang, CAST(FLOOR(n_chars / {HIST_BUCKET_CHARS}.0) AS BIGINT)
    """,
)
def doc_length_histogram(spark, sf_dir):
    """Document-length histogram per language ({HIST_BUCKET_CHARS}-char
    buckets) — the first plot of any corpus quality audit, and the input
    to length-based filtering decisions.  Pure single-pass groupBy on
    derived keys; the int sum is exact so the average divides identical
    operands on both engines."""
    (documents,) = load(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / float(HIST_BUCKET_CHARS)).cast("bigint")
    return (
        documents.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_chars"),
        )
    )


BOILER_K = 5  # words per phrase
BOILER_MIN_DOCS = 3


@register(
    "boilerplate_ngrams",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOK_SQL} AS ts FROM documents
    ), grams AS (
        SELECT doc_id, array_to_string(ts[i:i+{BOILER_K - 1}], ' ') AS gram
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, greatest(len(ts) - {BOILER_K - 1}, 0))) AS i
        )
    )
    SELECT gram, n_docs FROM (
        SELECT gram, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY gram
    ) WHERE n_docs >= {BOILER_MIN_DOCS}
    """,
)
def boilerplate_ngrams(spark, sf_dir):
    """Boilerplate-phrase detection: word {BOILER_K}-grams appearing in ≥
    {BOILER_MIN_DOCS} distinct documents — the cross-document repetition
    pass (CCNet-style) that finds headers/footers/templates for removal
    before training.  (The corpus has no sentence punctuation, so the
    repetition unit is the fixed-width word gram rather than the
    sentence/paragraph.)

    Explode → two-phase COUNT DISTINCT → threshold: the shuffle carries
    (gram, doc_id) pairs pre-deduplicated map-side, and at 100 TB the
    gram key space is bounded by the corpus vocabulary^k tail —
    hash-partitioned, no hot key (natural-language gram frequencies are
    Zipfian but the distinct-doc count dedup caps per-key work).
    ``spread`` widens the one-file local scan for the per-doc gram
    assembly (string joins dominate)."""
    (documents,) = load(spark, sf_dir, "documents")
    # docs with fewer than BOILER_K tokens contribute no grams; filtering
    # them BEFORE the explode matches the oracle's empty generate_series
    # (Spark's sequence(1, 0) is [1, 0] and slice(ts, 0, k) throws)
    toks = (
        spread(spark, documents)
        .select("doc_id", tokens(F.col("text")).alias("ts"))
        .filter(F.size("ts") >= BOILER_K)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ts) - {BOILER_K - 1}),"
                f" i -> array_join(slice(ts, i, {BOILER_K}), ' '))"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
    )


# ---------------------------------------------------------------------------
# MinHash Jaccard estimation, benchmark contamination, BM25 ranking
# ---------------------------------------------------------------------------


def _jaccard_est_sql() -> str:
    matches = " + ".join(
        f"CASE WHEN a.mh{k} = b.mh{k} THEN 1 ELSE 0 END"
        for k in range(MINHASH_K)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"CAST(mh{2*b} AS VARCHAR) || ':' || CAST(mh{2*b+1} AS VARCHAR) AS band_key "
        f"FROM sig"
        for b in range(MINHASH_K // 2)
    )
    return f"""
    WITH sig AS ({_minhash_sig_sql()}),
    bands AS ({bands}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(({matches}) / {MINHASH_K}.0, 4) AS est_jaccard
    FROM cand c
    JOIN sig a ON a.doc_id = c.doc_a
    JOIN sig b ON b.doc_id = c.doc_b
    """


@register("minhash_jaccard_estimate", _jaccard_est_sql())
def minhash_jaccard_estimate(spark, sf_dir):
    """Estimated Jaccard for every LSH candidate pair: the fraction of the
    {MINHASH_K} minhashes that agree — the unbiased MinHash estimator
    (Broder '97), the number a production dedup thresholds on INSTEAD of
    computing exact shingle intersections on the candidate set.

    The banded explode CARRIES the full signature ({MINHASH_K} ints per
    row, 4× exploded), so the band self-join compares signatures in the
    join residual and no join-back to the signature table exists — the
    naive compose (candidate pairs ⋈ sig ⋈ sig) costs three more
    computations of the signature aggregate (Spark does not reuse the
    subtree across join branches: measured 4 parquet scans), i.e. three
    extra full shingle+md5 passes over the corpus at 100 TB.  Carrying
    {MINHASH_K} ints through one shuffle is strictly cheaper.  The same
    estimate lands on every band a pair collides in (the mh columns are
    identical), so the OR-across-bands dedup stays a plain DISTINCT.
    The signature frame is checkpointed for the same two-join-branch
    reuse reason as minhash_lsh_pairs (one shingle+md5 pass, not two)."""
    sig = materialize(minhash_signatures(spark, sf_dir))
    mh_cols = [f"mh{k}" for k in range(MINHASH_K)]
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ":",
                    F.col(f"mh{2*b}").cast("string"),
                    F.col(f"mh{2*b+1}").cast("string"),
                ).alias("band_key"),
            )
            for b in range(MINHASH_K // 2)
        ]
    )
    bands = sig.select("doc_id", *mh_cols, F.explode(band_structs).alias("bb")).select(
        "doc_id", *mh_cols, F.col("bb.band_idx").alias("band_idx"),
        F.col("bb.band_key").alias("band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("band_idx").alias("ba"),
        F.col("band_key").alias("ka"),
        *[F.col(f"mh{k}").alias(f"a{k}") for k in range(MINHASH_K)],
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band_idx").alias("bb_"),
        F.col("band_key").alias("kb"),
        *[F.col(f"mh{k}").alias(f"b{k}") for k in range(MINHASH_K)],
    )
    matches = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        for k in range(MINHASH_K)
    )
    return (
        a.join(
            b,
            (F.col("ba") == F.col("bb_"))
            & (F.col("ka") == F.col("kb"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / float(MINHASH_K), 4).alias("est_jaccard"),
        )
        .distinct()
    )


CONTAM_BENCH_MOD = 50  # doc_id % 50 == 0 -> the "benchmark" holdout set


@register(
    "contamination_ngram_overlap",
    f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS shingle
        FROM documents
    ),
    bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
    ),
    eval_sh AS (
        SELECT sh.doc_id, sh.shingle,
               CASE WHEN bench.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM sh LEFT JOIN bench USING (shingle)
        WHERE sh.doc_id % {CONTAM_BENCH_MOD} <> 0
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(hit) AS BIGINT) AS n_contaminated,
           ROUND(SUM(hit) / CAST(COUNT(*) AS DOUBLE), 4) AS contam_frac
    FROM eval_sh GROUP BY doc_id
    """,
)
def contamination_ngram_overlap(spark, sf_dir):
    """Benchmark-contamination check (GPT-3 appx. C / PaLM style): for
    every training document, the fraction of its distinct word
    {SHINGLE_K}-grams that also occur in a holdout/benchmark set (here
    the deterministic doc_id %% {CONTAM_BENCH_MOD} == 0 slice standing in
    for an external eval suite).  High-overlap documents get dropped or
    flagged before training.

    Shape: explode both sides to distinct (doc, shingle), LEFT JOIN eval
    shingles against the benchmark shingle set on the shingle key, count
    hits per doc.  The benchmark side is DISTINCT shingles only — tiny
    relative to the corpus (eval suites are fixed-size) — so AQE
    broadcasts it at runtime; the eval side never shuffles more than its
    exploded shingles, map-side-deduped.  No quadratic anything."""
    (documents,) = load(spark, sf_dir, "documents")
    sh = spread(spark, documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_K))
        ).alias("shingle"),
    )
    bench = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    return (
        ev.join(bench, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("contam_frac"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "vector")
BM25_TOPK = 20


def _bm25_sql() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(MAX(CASE WHEN term = '{t}' THEN tf ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n               ".join(
        f"MAX(CASE WHEN term = '{t}' THEN df ELSE 0 END) AS df{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    # fixed-order float expression: idf_i * saturated-tf_i summed left to
    # right, so both engines evaluate bit-identically before the round
    score = " + ".join(
        f"ln((n.n - d.df{i} + 0.5) / (d.df{i} + 0.5) + 1.0)"
        f" * (t.tf{i} * {BM25_K1 + 1})"
        f" / (t.tf{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / ad.avgdl))"
        for i in range(len(BM25_TERMS))
    )
    terms_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    ad AS (SELECT SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl),
    n AS (SELECT COUNT(*) AS n FROM documents),
    tf_long AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN ({terms_in}) GROUP BY doc_id, term
    ),
    t AS (
        SELECT doc_id, {tf_cols}
        FROM tf_long GROUP BY doc_id
    ),
    df_long AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
        WHERE term IN ({terms_in}) GROUP BY term
    ),
    d AS (SELECT {df_cols} FROM df_long)
    SELECT doc_id, score, rnk AS rank FROM (
        SELECT t.doc_id,
               ROUND({score}, 6) AS score,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND({score}, 6) DESC, t.doc_id ASC) AS rnk
        FROM t
        JOIN dl USING (doc_id)
        CROSS JOIN d CROSS JOIN n CROSS JOIN ad
    ) WHERE rnk <= {BM25_TOPK}
    """


@register("bm25_top_docs", _bm25_sql())
def bm25_top_docs(spark, sf_dir):
    """BM25 retrieval (Robertson-Sparck Jones): top-{BM25_TOPK} documents
    for the fixed query {BM25_TERMS}, k1={BM25_K1}, b={BM25_B}, idf =
    ln((N-df+0.5)/(df+0.5)+1) — the classic lexical ranking a corpus
    pipeline runs next to embedding ANN (hybrid retrieval).

    Cross-engine float discipline: per-term tf/df are pivoted to COLUMNS
    so the score is one fixed-order arithmetic expression (no float SUM
    whose reduction order an engine may choose); every op is a correctly
    rounded IEEE op, ln within 1 ulp on both engines, rounded to 6 before
    ranking with a doc_id tiebreak (the tfidf_top_terms precedent).

    Scale: two linear aggregations over the tokenized corpus, the term
    filter rides the explode (only the {len(BM25_TERMS)} query terms
    shuffle), df/avgdl/N are one-row broadcast aggregates, and the final
    global top-k rewrites to a TakeOrdered — nothing quadratic, no
    full-corpus sort."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    ad = dl.agg(
        (F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl")
    )
    n = documents.agg(F.count(F.lit(1)).alias("n"))
    qtok = tok.filter(F.col("term").isin(*BM25_TERMS))
    tf_long = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    t = tf_long.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == term, F.col("tf")).otherwise(0))
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(BM25_TERMS)
        ]
    )
    df_long = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    d = df_long.agg(
        *[
            F.max(F.when(F.col("term") == term, F.col("df")).otherwise(0)).alias(
                f"df{i}"
            )
            for i, term in enumerate(BM25_TERMS)
        ]
    )
    score = None
    for i in range(len(BM25_TERMS)):
        term_score = (
            F.log(
                (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
                + 1.0
            )
            * (F.col(f"tf{i}") * (BM25_K1 + 1))
            / (
                F.col(f"tf{i}")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = term_score if score is None else score + term_score
    from pyspark.sql import Window

    # top-k FIRST via orderBy+limit (rewrites to TakeOrderedAndProject —
    # per-partition heaps, never a global single-partition sort of every
    # scored doc), THEN rank the k survivors; the no-partition window runs
    # over exactly BM25_TOPK rows.
    topk = (
        t.join(dl, "doc_id")
        .crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ad))
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w))


STRAT_N_PER_LANG = 20


@register(
    "stratified_sample_lang",
    f"""
    SELECT lang, doc_id, rnk AS rank FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)", "strat")} ASC,
                            doc_id ASC) AS rnk
        FROM documents
    ) WHERE rnk <= {STRAT_N_PER_LANG}
    """,
)
def stratified_sample_lang(spark, sf_dir):
    """Stratified deterministic sampling: the {STRAT_N_PER_LANG}
    lowest-md5-ranked documents PER LANGUAGE — the fixed-size-per-stratum
    companion to ``sample_hash_bucket``'s fixed-rate global sample.  This
    is how a multilingual corpus keeps low-resource languages represented
    in an eval split: rate-based sampling keeps ~0 docs of a 0.01% lang,
    top-n-by-hash keeps exactly n, and the md5 ranking makes the split
    reproducible on any engine, any run, any cluster size (no rand()).

    Shape: one shuffle on lang, per-stratum ROW_NUMBER rewrites to
    WindowGroupLimit (per-partition top-n heaps BEFORE the shuffle), so
    the sort never sees more than n rows per stratum per partition.  A
    skewed stratum (one lang = 90% of the corpus) still caps at n rows
    out per partition — the limit pushes ahead of the shuffle."""
    (documents,) = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    rk = hash64(F.col("doc_id").cast("string"), "strat")
    w = Window.partitionBy("lang").orderBy(rk.asc(), F.col("doc_id").asc())
    return (
        documents.select("lang", "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= STRAT_N_PER_LANG)
    )


@register(
    "token_entropy",
    f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           ROUND(CAST(SUM(CAST(ROUND(
               -(tf.tf / CAST(dl.n AS DOUBLE)) * ln(tf.tf / CAST(dl.n AS DOUBLE)),
               12) AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy,
           dl.n AS n_tokens
    FROM tf JOIN dl USING (doc_id)
    GROUP BY tf.doc_id, dl.n
    """,
)
def token_entropy(spark, sf_dir):
    """Unigram (Shannon) entropy of each document's token distribution —
    the information-density quality signal (template spam and keyword
    stuffing crater it; natural prose sits near the corpus band).
    Complements text_quality's surface ratios with a distributional one.

    Float discipline: the per-term contribution −p·ln p is rounded to 12
    decimals and summed as DECIMAL(28,12) — an exact, order-independent
    sum (float Σ would expose each engine's reduction order) — then one
    final round-6.  Two linear aggregations (tf per (doc, term), then the
    per-doc fold); the second groupBy carries partial decimal sums."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = materialize(tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ))  # feeds the doc-length agg + the join
    # side: one tokenize+tf pass instead of two
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("n"))
    p = F.col("tf") / F.col("n").cast("double")
    contrib = F.round(-p * F.log(p), 12).cast("decimal(28,12)")
    return (
        tf.join(dl, "doc_id")
        .groupBy("doc_id", "n")
        .agg(F.round(F.sum(contrib).cast("double"), 6).alias("entropy"))
        .select("doc_id", "entropy", F.col("n").alias("n_tokens"))
    )


def minhash_buckets_frame(
    spark, docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Frame-parameterized twin of the ``minhash_signatures`` →
    band-bucket construction used by ``dedup_lsh_components`` (same
    shingles, same hash family, same 4×2 banding), for callers that have
    an arbitrary document DataFrame instead of a testdata sf_dir —
    ``corpus_pipeline.run_corpus_job`` feeds its gated frame through
    this.  Returns (id_col, band_key)."""
    sh = spread(spark, docs).select(
        id_col,
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col(text_col)), SHINGLE_K))
        ).alias("shingle"),
    ).select(id_col, (hash64(F.col("shingle")) % MINHASH_P).alias("base"))
    aggs = [
        F.min((F.lit(a) * F.col("base") + F.lit(b)) % MINHASH_P).alias(f"mh{k}")
        for k, (a, b) in enumerate(MINHASH_AB)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":", F.lit(b), F.col(f"mh{2*b}"), F.col(f"mh{2*b+1}")
                    )
                    for b in range(4)
                ]
            )
        ).alias("band_key"),
    )
