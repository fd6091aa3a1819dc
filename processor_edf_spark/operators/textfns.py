"""Text-analysis column builders: tokenization, shingles, portable hashing,
language-ID scoring, quality metrics (SURVEY.md training-data extensions).

All are pure Column expressions (JVM-side, codegen'd) — no Python UDFs in
the hot path.  The 64-bit hash is md5-based so the exact same values are
computable in any engine (the DuckDB oracle uses the identical
construction), unlike engine-private hashes (xxhash64 etc.).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic cross-engine 64-bit hash: first 15 hex chars of md5 → int.
# 15 hex digits = 60 bits, always fits a signed 64-bit integer.
# DuckDB equivalent: ('0x' || substr(md5(x), 1, 15))::BIGINT


def hash64(col: Column, salt: str | None = None) -> Column:
    x = F.concat(F.lit(f"{salt}|"), col) if salt is not None else col
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, salt: str | None = None) -> str:
    x = f"'{salt}|' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({x}), 1, 15))::BIGINT"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (DuckDB: regexp_split_to_array(x, '\\s+'))."""
    return F.split(F.trim(col), r"\s+")


def normalized_text(col: Column) -> Column:
    """Dedup-grade normalization: strip control characters, collapse
    whitespace runs, trim, casefold — the ONE definition shared by the
    ``normalize_text`` batch query and the streaming ingest dedup, so a
    document dedups identically in both modes.  Patterns parse
    identically in Java regex and RE2 (the redaction.py discipline).
    DuckDB: lower(trim(regexp_replace(regexp_replace(x,
    '[\\x00-\\x1f]+', ' ', 'g'), '\\s+', ' ', 'g')))"""
    return F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(col, r"[\x00-\x1f]+", " "), r"\s+", " "
            )
        )
    )


def word_shingles(tok: Column, k: int = 3) -> Column:
    """k-word shingles: array of space-joined k-grams.
    DuckDB: list_transform(generate_series(1, len(t)-k+1),
                           i -> array_to_string(list_slice(t, i, i+k-1), ' '))
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - (k - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(tok, i, k), " "))


STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "de", "et", "les", "des"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
}
LANG_PRIORITY = ("en", "es", "fr", "de", "zh")  # deterministic tie-break order


def stopword_count(tok: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def lang_id(text: Column, tok: Column) -> Column:
    """Stopword-marker language ID: score each language by marker-token
    hits (zh by CJK character presence), argmax with fixed priority order.
    A heuristic n-gram classifier — deterministic, engine-portable."""
    scores = {
        lang: stopword_count(tok, words).cast("double")
        for lang, words in STOPWORDS.items()
    }
    # \x{...} hex escapes work in both Java regex (Spark) and RE2 (DuckDB)
    scores["zh"] = F.when(
        text.rlike(r"[\x{4e00}-\x{9fff}]"), F.lit(1000.0)
    ).otherwise(F.lit(0.0))
    pred = None
    remaining = list(LANG_PRIORITY)
    while len(remaining) > 1:
        lang = remaining.pop(0)
        others = F.greatest(*[scores[o] for o in remaining]) if len(remaining) > 1 else scores[remaining[0]]
        cond = scores[lang] >= others
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred.otherwise(F.lit(remaining[0]))


def lang_id_sql(text_expr: str = "text", tok_expr: str | None = None) -> str:
    """DuckDB SQL mirroring lang_id() exactly."""
    tok = tok_expr or f"regexp_split_to_array(trim({text_expr}), '\\s+')"
    score = {
        lang: (
            "CAST(len(list_filter({t}, x -> x IN ({w}))) AS DOUBLE)".format(
                t=tok, w=", ".join(f"'{x}'" for x in words)
            )
        )
        for lang, words in STOPWORDS.items()
    }
    score["zh"] = (
        f"CASE WHEN regexp_matches({text_expr}, '[\\x{{4e00}}-\\x{{9fff}}]') "
        "THEN 1000.0 ELSE 0.0 END"
    )
    clauses = []
    remaining = list(LANG_PRIORITY)
    while len(remaining) > 1:
        lang = remaining.pop(0)
        if len(remaining) > 1:
            others = "GREATEST(" + ", ".join(score[o] for o in remaining) + ")"
        else:
            others = score[remaining[0]]
        clauses.append(f"WHEN {score[lang]} >= {others} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{remaining[0]}' END"
