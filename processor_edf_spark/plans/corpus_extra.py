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

from processor_edf_spark.operators.layout import field16_sql, morton_sql
from processor_edf_spark.operators.textfns import (
    STOPWORDS,
    hash64,
    hash64_sql,
    tokens,
)
from processor_edf_spark.plans.registry import load, register, spread
from processor_edf_spark.plans.text_dedup import _TOK_SQL
from processor_edf_spark.materialize import materialize

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
    big = materialize(d.select(
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
    ).select("doc_id", "bg.w1", "bg.w2"))
    # ^ the bigram stream feeds the count tables AND the scoring join:
    # without materialization each branch re-runs scan+tokenize+explode
    # (subtree reuse does not cross broadcast/shuffle branches)
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

PREFIX_JACCARD_T = 0.95


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
    """Token-set Jaccard join at t=0.95 via exact-set GROUPING +
    PPJoin-style prefix filtering (r15 layout):

    1. Documents are grouped by their exact distinct-token SET (the
       sorted array is the group key) — Jaccard depends on the set
       alone, so every member of a group has the identical jaccard to
       any third document and intra-group pairs are all exactly 1.0.
       Candidate generation and verification then run over one
       REPRESENTATIVE per group (min doc_id); a dup-heavy corpus (the
       target workload) collapses quadratically: at sf0.1 the 5000 docs
       hold 3935 distinct sets (one 248-doc exact-dup group), and the
       candidate self-join falls 2.14 M → 1.19 M pairs.
    2. Representatives run the r14 PPJoin pipeline: tokens ordered by
       global rarity (document frequency asc over representatives, token
       asc — ANY consistent total order keeps the prefix filter lossless,
       per Chaudhuri et al. 2006), prefix = first |s| - ceil(t·|s|) + 1
       tokens, candidates from prefix collisions + length filter,
       verification by array_intersect on the group token arrays.
    3. Passing representative pairs expand through the group membership
       lists (same integer (na, nb, n_common) → bit-identical ROUND), and
       intra-group pairs emit jaccard 1.0 directly — exactly the pairs
       the shared-token oracle produces.

    The threshold compares the RAW double; only the output is rounded
    (the dedup_ngram_jaccard discipline — both engines compute the same
    integer/integer division).
    """
    (documents,) = load(spark, sf_dir, "documents")
    docs = spread(spark, documents)
    # Group key: the SORTED distinct-token array (exact, no hash
    # collisions).  Checkpointed: feeds the rep token stream, both
    # verification array joins, and both expansion membership joins.
    groups = materialize(
        docs.select(
            "doc_id",
            F.array_sort(F.array_distinct(tokens(F.col("text")))).alias("ts"),
        )
        .groupBy("ts")
        .agg(
            F.min("doc_id").alias("gid"),
            F.collect_list("doc_id").alias("members"),
        )
        .withColumn("n", F.size("ts"))
    )
    toks = groups.select(
        F.col("gid").alias("doc_id"), F.explode("ts").alias("tok"), "n"
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # rarity rank within each rep; prefix keeps rn <= n - ceil(t*n) + 1.
    # (n rides from the group row — the r14 COUNT window is gone.)
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
    # The prefix frame feeds BOTH sides of the candidate self-join;
    # localCheckpoint materializes it once instead of recomputing the
    # stream → dfreq join → window on each side (measured 2× end-to-end
    # at sf0.1).  It is ~(1-t) of the rep token stream (5% at t=0.95).
    prefix = materialize(
        toks.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(PREFIX_JACCARD_T) * F.col("n")) + 1
        )
        .select("doc_id", "tok", "n")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin length filter (lossless): J >= t forces t·|x| <= |y| <= |x|/t,
    # so cross-size collisions die as a join residual BEFORE the distinct
    cands = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") * F.lit(PREFIX_JACCARD_T) <= F.col("a.n"))
            & (F.col("a.n") * F.lit(PREFIX_JACCARD_T) <= F.col("b.n")),
        )
        .select(
            F.col("a.doc_id").alias("ga"),
            F.col("b.doc_id").alias("gb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        # r15 parallelism fix: a plain .distinct() shuffles with
        # ENSURE_REQUIREMENTS origin, and AQE coalesces its small-byte
        # output (1.19 M pairs ≈ 40 MB) to ONE post-shuffle partition —
        # which serialized the dedup AND the whole array_intersect
        # verification onto a single core (the r14 row's 8c/32c ratio
        # was 0.97).  An explicit hash repartition on the pair key is
        # exempt from AQE coalescing, and the distinct's aggregate then
        # REUSES that partitioning (same-key subset) — one shuffle, full
        # width through dedup, joins and verification.  The width tracks
        # the session shuffle conf, not a local constant.
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "ga", "gb"
        )
        .distinct()
    )
    arrs = groups.select("gid", "ts")
    ver = cands.join(
        arrs.withColumnRenamed("gid", "ga").withColumnRenamed("ts", "ta"), "ga"
    ).join(
        arrs.withColumnRenamed("gid", "gb").withColumnRenamed("ts", "tb"), "gb"
    )
    # The intersection is computed ONCE per candidate into a
    # materialized stats frame (pairs × 5 longs).  Filtering on a
    # derived jac column directly makes Catalyst push the threshold
    # filter through the projection by substituting the alias — the
    # array_intersect then evaluates TWICE per row (once in the pushed
    # filter, once in the output; verification in r14 measured exactly
    # 2× the single-eval cost).  The checkpoint is O(candidates) local
    # longs, the same order as the join output it truncates.
    stats = materialize(ver.select(
        "ga",
        "gb",
        "na",
        "nb",
        F.size(F.array_intersect("ta", "tb")).alias("n_common"),
    ))
    jac = F.col("n_common") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    gpass = stats.filter(jac >= PREFIX_JACCARD_T).select(
        "ga", "gb", F.round(jac, 4).alias("jaccard")
    )
    # Expansion: every member pair across two passing groups carries the
    # identical (na, nb, n_common) integers, hence the identical rounded
    # double; intra-group pairs are n/(n+n-n) = 1.0 exactly on both
    # engines.  Groups are disjoint and reps are ordered (ga < gb), so
    # each unordered doc pair is emitted exactly once.
    mem = groups.select("gid", "members")
    inter = (
        gpass.join(
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
        .select(F.explode("ma").alias("x"), "mb", "jaccard")
        .select("x", F.explode("mb").alias("y"), "jaccard")
        .select(
            F.least("x", "y").alias("doc_a"),
            F.greatest("x", "y").alias("doc_b"),
            "jaccard",
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
            F.lit(1.0).alias("jaccard"),
        )
    )
    return inter.unionByName(intra)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES keys)
# ---------------------------------------------------------------------------

WSAMPLE_K = 100


def aes_sample_key(id_col: str = "doc_id", weight_col: str = "n_chars"):
    """The Efraimidis–Spirakis key column, ONE definition shared by the
    batch ``weighted_sample_aes`` query and the streaming reservoir
    (``streaming/sample.py``): u from the portable md5 hash, key =
    round(-ln(u)/weight, 9).  Computing the key in Spark expressions on
    BOTH paths is what makes stream/batch parity exact — a Python
    re-derivation would race libm-vs-JVM ln and round-half-mode
    differences."""
    u = (
        F.pmod(
            hash64(F.col(id_col).cast("string"), salt="ws"), F.lit(1000000)
        )
        + 0.5
    ) / 1000000.0
    weight = F.greatest(F.col(weight_col), F.lit(1))
    return F.round(-F.log(u) / weight, 9), weight


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
    key, weight = aes_sample_key("doc_id", "n_chars")
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
_zexpr = morton_sql

# sign-safe 16-bit field extraction, same text in both dialects
_ZX = field16_sql("user_id")
_ZY = field16_sql("CAST(FLOOR(value * 100) AS BIGINT)")


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


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality gate
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 1000
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_ALPHA_MIN = 0.7
GOPHER_MIN_STOPWORDS = 2

_STOP_EN_SQL = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


def _gopher_passes_sql() -> str:
    """The gate conjunction as one SQL predicate (over a relation with a
    ``text`` column) — shared by _gopher_sql and the corpus_job_report
    oracle so a document passes identically in both."""
    t = _TOK_SQL
    n = f"len({t})"
    mean_len = (
        f"(list_aggregate(list_transform({t}, x -> length(x)), 'sum')"
        f" / CAST({n} AS DOUBLE))"
    )
    alpha = (
        f"(len(list_filter({t}, x -> regexp_matches(x, '[a-zA-Z]')))"
        f" / CAST({n} AS DOUBLE))"
    )
    stops = f"len(list_distinct(list_filter({t}, x -> x IN ({_STOP_EN_SQL}))))"
    return " AND ".join(
        (
            f"({n} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})",
            f"({mean_len} >= {GOPHER_MEAN_LEN_LO} AND {mean_len} <= {GOPHER_MEAN_LEN_HI})",
            f"({alpha} >= {GOPHER_ALPHA_MIN})",
            f"({stops} >= {GOPHER_MIN_STOPWORDS})",
        )
    )


def _gopher_sql() -> str:
    t = _TOK_SQL
    n = f"len({t})"
    mean_len = (
        f"(list_aggregate(list_transform({t}, x -> length(x)), 'sum')"
        f" / CAST({n} AS DOUBLE))"
    )
    alpha = (
        f"(len(list_filter({t}, x -> regexp_matches(x, '[a-zA-Z]')))"
        f" / CAST({n} AS DOUBLE))"
    )
    stops = f"len(list_distinct(list_filter({t}, x -> x IN ({_STOP_EN_SQL}))))"
    flags = {
        "flag_word_count": f"{n} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}",
        "flag_mean_word_len": f"{mean_len} >= {GOPHER_MEAN_LEN_LO} AND {mean_len} <= {GOPHER_MEAN_LEN_HI}",
        "flag_alpha_ratio": f"{alpha} >= {GOPHER_ALPHA_MIN}",
        "flag_stopwords": f"{stops} >= {GOPHER_MIN_STOPWORDS}",
    }
    cols = ",\n           ".join(f"({v}) AS {k}" for k, v in flags.items())
    passes = " AND ".join(f"({v})" for v in flags.values())
    return f"""
    SELECT doc_id,
           {n} AS n_words,
           ROUND({mean_len}, 4) AS mean_word_len,
           ROUND({alpha}, 4) AS alpha_ratio,
           {cols},
           ({passes}) AS passes
    FROM documents
    """


def gopher_flag_cols(text: Column) -> dict[str, Column]:
    """The rule gate's Column builders — ONE definition shared by the
    oracle-checked ``gopher_quality_flags`` query and
    ``corpus_pipeline.run_corpus_job``, so a document passes the gate
    identically in both (the streaming/batch shared-definition
    discipline of normalize_text)."""
    tok = tokens(text)
    n = F.size(tok)
    sum_len = F.aggregate(
        F.transform(tok, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_len = sum_len / n.cast("double")
    alpha = F.size(F.filter(tok, lambda x: x.rlike("[a-zA-Z]"))) / n.cast(
        "double"
    )
    stops = F.size(
        F.array_distinct(F.filter(tok, lambda x: x.isin(*STOPWORDS["en"])))
    )
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "alpha_ratio": alpha,
        "flag_word_count": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "flag_mean_word_len": (mean_len >= GOPHER_MEAN_LEN_LO)
        & (mean_len <= GOPHER_MEAN_LEN_HI),
        "flag_alpha_ratio": alpha >= GOPHER_ALPHA_MIN,
        "flag_stopwords": stops >= GOPHER_MIN_STOPWORDS,
    }


@register("gopher_quality_flags", _gopher_sql())
def gopher_quality_flags(spark, sf_dir):
    """Gopher/Dolma-style RULE-based quality gate: word-count bounds,
    mean-word-length band, alphabetic-token ratio, and minimum distinct
    stopword presence, each surfaced as its own boolean flag plus the
    conjunctive ``passes`` — the auditable rule filter run before any
    model-based scoring (each rule's rejection rate is measurable from
    the flags).  All shuffle-free per-row array expressions riding the
    scan; the flag comparisons operate on exact integer counts or on the
    one identical double both engines compute (sum-int/count), so the
    booleans can't diverge cross-engine."""
    (documents,) = load(spark, sf_dir, "documents")
    c = gopher_flag_cols(F.col("text"))
    return documents.select(
        "doc_id",
        c["n_words"].alias("n_words"),
        F.round(c["mean_word_len"], 4).alias("mean_word_len"),
        F.round(c["alpha_ratio"], 4).alias("alpha_ratio"),
        c["flag_word_count"].alias("flag_word_count"),
        c["flag_mean_word_len"].alias("flag_mean_word_len"),
        c["flag_alpha_ratio"].alias("flag_alpha_ratio"),
        c["flag_stopwords"].alias("flag_stopwords"),
        (
            c["flag_word_count"]
            & c["flag_mean_word_len"]
            & c["flag_alpha_ratio"]
            & c["flag_stopwords"]
        ).alias("passes"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (target-vs-raw bigram LM log-ratio)
# ---------------------------------------------------------------------------

DSIR_TARGET_SOURCES = ("src0", "src1")
_DSIR_TGT_SQL = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)


def _dsir_sql() -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, source, {_TOK_SQL} AS t FROM documents
        WHERE len({_TOK_SQL}) >= 2
    ), big AS (
        SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
        FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 1)) AS i
        )
    ), c2 AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1
    ), v AS (
        SELECT COUNT(DISTINCT w1) AS v FROM c2
    ), tc2 AS (
        SELECT w1, w2, COUNT(*) AS tc2 FROM big
        WHERE source IN ({_DSIR_TGT_SQL}) GROUP BY w1, w2
    ), tc1 AS (
        SELECT w1, SUM(tc2) AS tc1 FROM tc2 GROUP BY w1
    ), tv AS (
        SELECT COUNT(DISTINCT w1) AS tv FROM tc2
    ), s AS (
        SELECT big.doc_id,
               CAST(ROUND((ln((COALESCE(tc2.tc2, 0) + {LM_K})
                              / (COALESCE(tc1.tc1, 0) + {LM_K} * tv.tv))
                           - ln((c2.c2 + {LM_K}) / (c1.c1 + {LM_K} * v.v)))
                          * 1000000, 0) AS BIGINT) AS r_micro
        FROM big
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        LEFT JOIN tc2 USING (w1, w2)
        LEFT JOIN tc1 USING (w1)
        CROSS JOIN v CROSS JOIN tv
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(SUM(r_micro) / (COUNT(*) * 1000000.0), 4) AS avg_log_ratio
    FROM s GROUP BY doc_id
    """


@register("dsir_importance", _dsir_sql())
def dsir_importance(spark, sf_dir):
    """DSIR-style data-selection importance weight (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    train a TARGET bigram LM on a declared high-quality slice (sources
    {src0, src1}) and a RAW LM on the whole corpus, then score every
    document by its average log importance ratio
    ln P_target(w2|w1) − ln P_raw(w2|w1) — documents most target-like
    rank highest and get sampled into the training mix.

    Same one-plan shape as bigram_lm_surprisal, doubled: both models'
    count tables derive from the SAME exploded-bigram stream (the target
    side is a filter over it, partial-aggregated before its shuffle);
    scoring left-joins the target counts (unseen bigrams coalesce to the
    smoothing floor) and inner-joins the raw counts.  Integer micro-nat
    sums keep the per-doc average order-independent cross-engine."""
    (documents,) = load(spark, sf_dir, "documents")
    d = (
        spread(spark, documents)
        .select("doc_id", "source", tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
    )
    big = materialize(d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "source", "bg.w1", "bg.w2"))
    # ^ seven consumers (both models' count tables + the scoring join
    # chain) — one corpus tokenize+explode pass instead of seven
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = c2.agg(F.countDistinct("w1").alias("v"))
    tgt = big.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
    tc2 = tgt.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("tc2"))
    tc1 = tc2.groupBy("w1").agg(F.sum("tc2").alias("tc1"))
    tv = tc2.agg(F.countDistinct("w1").alias("tv"))
    p_tgt = (F.coalesce(F.col("tc2"), F.lit(0)) + F.lit(LM_K)) / (
        F.coalesce(F.col("tc1"), F.lit(0)) + F.lit(LM_K) * F.col("tv")
    )
    p_raw = (F.col("c2") + F.lit(LM_K)) / (
        F.col("c1") + F.lit(LM_K) * F.col("v")
    )
    r_micro = F.round((F.log(p_tgt) - F.log(p_raw)) * 1000000, 0).cast("long")
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(tc2, ["w1", "w2"], "left")
        .join(tc1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(tv))
        .select("doc_id", r_micro.alias("r_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("r_micro") / (F.count(F.lit(1)) * 1000000.0), 4
            ).alias("avg_log_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Training-mix planning
# ---------------------------------------------------------------------------


@register(
    "source_mix_rates",
    """
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n_docs FROM documents
        GROUP BY source, lang
    ), t AS (
        SELECT CAST(CEIL(SUM(n_docs) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
            AS target_docs
        FROM c
    )
    SELECT source, lang, n_docs, t.target_docs,
           LEAST(n_docs, t.target_docs) AS planned_docs,
           ROUND(LEAST(1.0, t.target_docs / CAST(n_docs AS DOUBLE)), 6)
               AS sample_rate
    FROM c CROSS JOIN t
    """,
)
def source_mix_rates(spark, sf_dir):
    """Training-mix planning: per-(source, lang) stratum counts → the
    per-stratum sampling rate that equalizes contribution at the uniform
    target (total/strata), capped by availability — the audit table a
    mix rebalancer consumes before `stratified_sample_lang` /
    `weighted_sample_aes` do the actual drawing.  One partial-agg shuffle
    on ~|sources|·|langs| keys + a 1-row scalar broadcast; rates derive
    from exact integer counts so both engines round the same double."""
    (documents,) = load(spark, sf_dir, "documents")
    c = documents.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    t = c.agg(
        F.ceil(F.sum("n_docs") / F.count(F.lit(1)).cast("double"))
        .cast("long")
        .alias("target_docs")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "target_docs",
        F.least(F.col("n_docs"), F.col("target_docs")).alias("planned_docs"),
        F.round(
            F.least(
                F.lit(1.0), F.col("target_docs") / F.col("n_docs").cast("double")
            ),
            6,
        ).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Per-document shingle novelty
# ---------------------------------------------------------------------------


def _novelty_sql() -> str:
    from processor_edf_spark.plans.text_dedup import _SHINGLE_SQL

    return f"""
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct({_SHINGLE_SQL})) AS shingle
        FROM documents
    ), first AS (
        SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS novelty
    FROM sh JOIN first USING (shingle)
    GROUP BY sh.doc_id
    """


@register("shingle_novelty", _novelty_sql())
def shingle_novelty(spark, sf_dir):
    """Per-document novelty: the fraction of a document's distinct
    3-word shingles whose FIRST corpus occurrence (minimum doc_id) is
    this document — the audit view of incremental dedup (a near-zero
    novelty document is pure recombination of earlier text; streaming
    ingest order maps onto the id order, so this is exactly the
    "how much genuinely new text did today's drop add" number).

    Two linear aggregations over the exploded shingle stream (first-doc
    per shingle; per-doc counts) joined on the shingle key — partial agg
    rides the explode, the join is a plain shuffle equi-join with the
    first-doc dim AQE-broadcast when small; counts are exact integers so
    the one division rounds identically cross-engine."""
    from processor_edf_spark.plans.text_dedup import SHINGLE_K
    from processor_edf_spark.operators.textfns import word_shingles

    (documents,) = load(spark, sf_dir, "documents")
    sh = materialize(spread(spark, documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_K))
        ).alias("shingle"),
    ))  # feeds first-doc agg + the join side:
    # one shingle+md5 pass instead of two
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(novel / F.count(F.lit(1)).cast("double"), 4).alias(
                "novelty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# The end-to-end corpus job as a driver-contract query (r6)
# ---------------------------------------------------------------------------


def _corpus_job_report_sql() -> str:
    """Oracle for run_corpus_job's stage-accounting report: replays the
    whole pipeline in DuckDB — normalize, gopher gate (over NORMALIZED
    text, as the pipeline gates), exact dedup by distinct normalized
    text, the minhash-band transitive closure (the dedup_lsh_components
    recursive CTE, re-rooted at the exact-survivor CTE), and the
    no-drop scrub/split stage — then emits the same 5 accounting rows."""
    from processor_edf_spark.plans.text_dedup import _minhash_sig_sql

    norm = (
        r"lower(trim(regexp_replace(regexp_replace(text, "
        r"'[\x00-\x1f]+', ' ', 'g'), '\s+', ' ', 'g')))"
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, CAST({b} AS VARCHAR) || ':' || "
        f"CAST(mh{2*b} AS VARCHAR) || ':' || CAST(mh{2*b+1} AS VARCHAR) "
        f"AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
    WITH RECURSIVE
    norm_docs AS (SELECT doc_id, {norm} AS text FROM documents),
    gate AS (SELECT doc_id, text FROM norm_docs WHERE {_gopher_passes_sql()}),
    exact_docs AS (SELECT MIN(doc_id) AS doc_id, text FROM gate GROUP BY text),
    sig AS ({_minhash_sig_sql("exact_docs")}),
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
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    counts AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n0,
               (SELECT COUNT(*) FROM gate) AS n1,
               (SELECT COUNT(*) FROM exact_docs) AS n2,
               (SELECT COUNT(DISTINCT component) FROM comp) AS n3
    )
    SELECT stage, rows_in, rows_out, rows_in - rows_out AS dropped FROM (
        SELECT 'input' AS stage, n0 AS rows_in, n0 AS rows_out FROM counts
        UNION ALL SELECT 'rule_gate', n0, n1 FROM counts
        UNION ALL SELECT 'exact_dedup', n1, n2 FROM counts
        UNION ALL SELECT 'near_dedup_lsh', n2, n3 FROM counts
        UNION ALL SELECT 'scrub_and_split', n3, n3 FROM counts
    )
    """


@register("corpus_job_report", _corpus_job_report_sql())
def corpus_job_report(spark, sf_dir):
    """The flagship composition as a driver-checked query: run the full
    run_corpus_job pipeline (normalize → gopher gate → exact dedup →
    linear LSH near-dup → scrub/split) over the documents table and
    return its per-stage accounting report — (stage, rows_in, rows_out,
    dropped) × 5 stages.  The oracle replays every stage in DuckDB
    (including the minhash-band transitive closure as a recursive CTE),
    so the hash check pins the END-TO-END survivor counts, not just
    each operator in isolation.

    Scale notes are the pipeline's own: gate/scrub ride the scan, exact
    dedup is one shuffle on the normalized text, near-dup is the linear
    bucket-star components path (never pair enumeration), and the
    report itself is 5 driver-side rows."""
    from processor_edf_spark.corpus_pipeline import run_corpus_job

    (documents,) = load(spark, sf_dir, "documents")
    _, report = run_corpus_job(spark, documents.select("doc_id", "text"))
    return report
