"""Corpus-pipeline extensions, round-5 batch 2: statistical LM quality
scoring, prefix-filtered set-similarity join, weighted sampling, and
z-order layout clustering.

These extend the training-data operator surface (SURVEY.md training-data
extensions; no counterpart in the reference, which stops at EDF ETL —
cited for scope: /root/reference/processor/base_processor/timeseries/base.py
has no relational/corpus layer).  Same driver contract as every other
plan module: identical column aliases in Spark and oracle SQL, floats
rounded identically on both engines, integer accumulation wherever a
float sum would be order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from processor_edf_spark.operators.textfns import hash64, hash64_sql, tokens
from processor_edf_spark.plans.registry import load, register, spread
from processor_edf_spark.plans.text_dedup import _TOK_SQL

# ---------------------------------------------------------------------------
# Bigram language-model surprisal
# ---------------------------------------------------------------------------

LM_K = 0.5  # add-k smoothing constant


def _bigram_lm_sql() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, {_TOK_SQL} AS t FROM documents
        WHERE len({_TOK_SQL}) >= 2
    ), big AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i
        )
    ), c2 AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), v AS (
        SELECT COUNT(DISTINCT w1) AS v FROM c2
    ), s AS (
        SELECT big.doc_id,
               CAST(ROUND(-ln((c2.c2 + {LM_K}) / (c1.c1 + {LM_K} * v.v))
                          * 1000000, 0) AS BIGINT) AS s_micro
        FROM big
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        CROSS JOIN v
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(SUM(s_micro) / (COUNT(*) * 1000000.0), 4) AS avg_surprisal
    FROM s GROUP BY doc_id
    """


@register("bigram_lm_surprisal", _bigram_lm_sql())
def bigram_lm_surprisal(spark, sf_dir):
    """Per-document surprisal under a corpus-trained bigram LM with add-k
    smoothing — the classic perplexity-style quality gate (docs whose
    average -ln P(w2|w1) is high are boilerplate/garbled/outliers).

    Train and score in one plan, all linear passes:
    - bigram expansion rides the scan (explode → immediate partial agg,
      the ngram_lang_profile shape): the shuffle carries (w1,w2) partial
      counts, not the exploded corpus;
    - the context totals c1 and the context-vocabulary size V are derived
      from the COUNT TABLE, not from a second corpus scan;
    - scoring joins the bigram stream against the two count dims on token
      keys — plain shuffle equi-joins; hot heads ("of the") are
      many-to-one onto the dim side, which AQE skew-splits, and the dims
      themselves are AQE-broadcast when small.

    Float discipline: each bigram's surprisal is computed from exact
    doubles (int + 0.5 and 0.5·V are exact), rounded to integer
    MICRO-nats, summed as BIGINT (order-free, exact), divided once at the
    end — no float-sum order dependence anywhere.
    """
    (documents,) = load(spark, sf_dir, "documents")
    d = (
        spread(spark, documents)
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
    )
    big = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = c2.agg(F.countDistinct("w1").alias("v"))
    s_micro = F.round(
        -F.log((F.col("c2") + F.lit(LM_K)) / (F.col("c1") + F.lit(LM_K) * F.col("v")))
        * 1000000,
        0,
    ).cast("long")
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", s_micro.alias("s_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("s_micro") / (F.count(F.lit(1)) * 1000000.0), 4
            ).alias("avg_surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-style candidate generation)
# ---------------------------------------------------------------------------

PREFIX_JACCARD_T = 0.9


def _prefix_pairs_sql() -> str:
    # The oracle is the EXACT all-shared-token-pairs Jaccard — prefix
    # filtering is lossless for Jaccard >= t (Chaudhuri et al. 2006;
    # Xiao et al. PPJoin 2008), so the Spark plan must produce the
    # identical pair set despite generating candidates from prefixes only.
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct({_TOK_SQL})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 4)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE)
          >= {PREFIX_JACCARD_T}
    """


@register("jaccard_prefix_pairs", _prefix_pairs_sql())
def jaccard_prefix_pairs(spark, sf_dir):
    """Token-set Jaccard join at t=0.9 via PPJoin-style
    prefix filtering: order every document's distinct tokens by global
    rarity (document frequency asc, token asc), keep only the first
    |s| - ceil(t·|s|) + 1 tokens as the document's PREFIX, and generate
    candidate pairs from prefix-token collisions only — provably lossless
    for Jaccard >= t, so the result equals the exact shared-token-pairs
    oracle while the candidate join touches only each document's RAREST
    tokens (the frequency-ascending order makes prefix collision lists
    short by construction; the hot-token quadratic blowup of the naive
    shared-token join never happens).

    Verification joins the deduped candidate pairs back to per-document
    token ARRAYS (docs are row-sized; array_intersect is per-pair local
    work) — two broadcast-or-shuffle equi-joins, no corpus self-join.
    The threshold compares the RAW double; only the output is rounded
    (the dedup_ngram_jaccard discipline — both engines compute the same
    integer/integer division).
    """
    (documents,) = load(spark, sf_dir, "documents")
    docs = spread(spark, documents)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # rarity rank within each doc; prefix keeps rn <= n - ceil(t*n) + 1
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n") - F.ceil(F.lit(PREFIX_JACCARD_T) * F.col("n")) + 1
    ).select("doc_id", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    arrs = docs.select(
        "doc_id", F.array_distinct(tokens(F.col("text"))).alias("ta")
    )
    ver = (
        cands.join(arrs.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            arrs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("ta", "tb"),
            "doc_b",
        )
    )
    n_common = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - n_common
    jac = n_common / union.cast("double")
    return ver.filter(jac >= PREFIX_JACCARD_T).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES keys)
# ---------------------------------------------------------------------------

WSAMPLE_K = 100


def _weighted_sample_sql() -> str:
    h = hash64_sql("CAST(doc_id AS VARCHAR)", salt="ws")
    key = (
        f"ROUND(-ln((({h}) % 1000000 + 0.5) / 1000000.0)"
        f" / GREATEST(n_chars, 1), 9)"
    )
    return f"""
    WITH s AS (
        SELECT doc_id, GREATEST(n_chars, 1) AS weight, {key} AS sample_key
        FROM documents
    )
    SELECT doc_id, weight, sample_key,
           ROW_NUMBER() OVER (ORDER BY sample_key, doc_id) AS rank
    FROM s
    ORDER BY sample_key, doc_id
    LIMIT {WSAMPLE_K}
    """


@register("weighted_sample_aes", _weighted_sample_sql())
def weighted_sample_aes(spark, sf_dir):
    """Weighted sampling without replacement, k=100, weight =
    document length: the Efraimidis–Spirakis exponential-key scheme
    (key_i = -ln(u_i)/w_i, keep the k smallest — exactly equivalent to
    sequential weighted draws without replacement), with the uniform u_i
    derived from the portable md5 hash so both engines draw the SAME
    sample.  The shape every corpus builder needs for length-balanced /
    importance-weighted subset selection.

    Scale: key computation is per-row (no shuffle); the global top-k is
    orderBy().limit(k), which Spark executes as TakeOrderedAndProject —
    per-partition heaps + a k-row driver merge, never a global sort.
    The rank window runs AFTER the limit, over k rows.  Keys are rounded
    to 9 decimals BEFORE ranking with a doc_id tiebreak (tfidf
    discipline), so the selected set can't flip on a 1-ulp ln difference.
    """
    (documents,) = load(spark, sf_dir, "documents")
    u = (
        F.pmod(hash64(F.col("doc_id").cast("string"), salt="ws"), F.lit(1000000))
        + 0.5
    ) / 1000000.0
    weight = F.greatest(F.col("n_chars"), F.lit(1))
    key = F.round(-F.log(u) / weight, 9)
    top = (
        documents.select(
            "doc_id", weight.alias("weight"), key.alias("sample_key")
        )
        .orderBy(F.col("sample_key").asc(), F.col("doc_id").asc())
        .limit(WSAMPLE_K)
    )
    w = Window.orderBy(F.col("sample_key").asc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Z-order layout clustering
# ---------------------------------------------------------------------------

_Z_BUCKETS_SHIFT = 26  # 32-bit z-space >> 26 → 64 range buckets


def _zexpr(x: str, y: str) -> str:
    """Bit-interleave two 16-bit fields into a 32-bit z-value.  Pure
    integer <<|>>|&|+ arithmetic valid verbatim in BOTH Spark SQL and
    DuckDB — the Spark plan and the oracle share this exact string, so
    the two engines cannot diverge."""
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    ]
    return "(" + " + ".join(terms) + ")"


# sign-safe 16-bit field extraction, same text in both dialects
_ZX = "(((user_id % 65536) + 65536) % 65536)"
_ZY = "(((CAST(FLOOR(value * 100) AS BIGINT) % 65536) + 65536) % 65536)"


def _zorder_sql() -> str:
    z = _zexpr(_ZX, _ZY)
    return f"""
    WITH z AS (
        SELECT {_ZX} AS x16, {_ZY} AS y16,
               ({z} >> {_Z_BUCKETS_SHIFT}) AS z_bucket
        FROM events
    )
    SELECT z_bucket,
           COUNT(*) AS n_events,
           MIN(x16) AS min_x, MAX(x16) AS max_x,
           MIN(y16) AS min_y, MAX(y16) AS max_y
    FROM z GROUP BY z_bucket
    """


@register("zorder_layout", _zorder_sql())
def zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout clustering over (user_id, value): interleave
    the two dimensions' bits into one z-value, range-bucket it, and report
    per-bucket min/max of BOTH dimensions — the per-file statistics a
    z-ordered writer would persist for multi-column data skipping (each
    bucket covers a bounded rectangle in (x, y) space, so a predicate on
    EITHER column prunes buckets; a single-column sort only ever prunes
    its own column).  At scale the layout step is
    ``repartitionByRange(z_value)`` before the write — this query is the
    skipping-manifest aggregation over that layout, one partial-agg
    shuffle on 64 bucket keys.

    The bit-interleave expression is ONE shared SQL string evaluated by
    both engines (integer ops only — no float risk anywhere; FLOOR of the
    identical double is identical).
    """
    (events,) = load(spark, sf_dir, "events")
    z = _zexpr(_ZX, _ZY)
    return (
        events.select(
            F.expr(_ZX).alias("x16"),
            F.expr(_ZY).alias("y16"),
            F.expr(f"{z} >> {_Z_BUCKETS_SHIFT}").alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x16").alias("min_x"),
            F.max("x16").alias("max_x"),
            F.min("y16").alias("min_y"),
            F.max("y16").alias("max_y"),
        )
    )
