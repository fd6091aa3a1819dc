"""PII detection/redaction and intra-document repetition analysis —
the privacy-scrub and quality-filter passes of a training-data pipeline
(run after dedup, before tokenization).

Both operators are pure column expressions (JVM regex / array ops, no
Python in the hot path): at 100 TB they are embarrassingly parallel row
transforms that ride the parquet scan — no shuffle, no state.

The synthetic `documents` testdata contains no PII-shaped strings or
newline structure, so these register no driver-oracle query; the
operators are pinned by fixture-based tests (tests/test_redaction.py)
the same way the media codecs are.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Deliberately simple patterns that parse identically in Java regex
# (Spark) and RE2 (DuckDB/others): character classes + bounded repeats,
# no lookaround, no backrefs — so an oracle can be added verbatim the
# day the corpus carries PII-shaped text.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NNN-NNN-NNNN / (NNN) NNN-NNNN / NNN.NNN.NNNN
    "phone": r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-.][0-9]{4}",
    # dotted-quad (over-matches out-of-range octets on purpose: cheap,
    # recall-first — scrubbing favors false positives)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # NNN-NN-NNNN (US SSN shape)
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

# Redaction order matters: SSN before phone (an SSN also matches no
# phone pattern here, but keep the more specific first as a policy),
# email before ipv4 (domains can contain dotted quads).
_REDACT_ORDER = ("email", "ssn", "phone", "ipv4")


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-row match counts ``n_<kind>`` for every PII pattern
    plus ``has_pii`` — the audit pass that decides whether a document
    needs the (more expensive) rewrite."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
        )
    flags = [F.col(f"n_{k}") > 0 for k in PII_PATTERNS]
    has = flags[0]
    for f in flags[1:]:
        has = has | f
    return out.withColumn("has_pii", has)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with a typed placeholder ``<KIND>`` —
    chained regexp_replace in :data:`_REDACT_ORDER`, one JVM pass per
    pattern, no Python."""
    col: Column = F.col(text_col)
    for kind in _REDACT_ORDER:
        col = F.regexp_replace(col, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.withColumn(out_col or text_col, col)


def repetition_stats(
    df: DataFrame, text_col: str = "text", unit_sep: str = r"\n+"
) -> DataFrame:
    """Intra-document repetition ratios (the Gopher/MassiveText repetition
    filters): fraction of repeated units (lines by default) and fraction
    of characters inside repeated units.  A document whose line-repeat
    fraction is high is boilerplate/template spam and gets filtered.

    All array expressions: split → non-empty filter → distinct compare.
    ``dup_unit_frac`` = 1 - distinct/total units; ``dup_char_frac`` =
    1 - chars(distinct)/chars(all) (each repeated unit's extra copies
    count their characters as duplicated)."""
    units = F.filter(
        F.split(F.col(text_col), unit_sep), lambda u: F.length(u) > 0
    )
    n_units = F.size(units)
    n_distinct = F.size(F.array_distinct(units))
    chars_all = F.aggregate(
        F.transform(units, lambda u: F.length(u)),
        F.lit(0),
        lambda a, x: a + x,
    )
    chars_distinct = F.aggregate(
        F.transform(F.array_distinct(units), lambda u: F.length(u)),
        F.lit(0),
        lambda a, x: a + x,
    )
    safe = F.when(n_units > 0, 1.0).otherwise(F.lit(None))
    return (
        df.withColumn("n_units", n_units)
        .withColumn(
            "dup_unit_frac",
            F.round(safe * (1.0 - n_distinct / n_units.cast("double")), 4),
        )
        .withColumn(
            "dup_char_frac",
            F.round(
                safe * (1.0 - chars_distinct / chars_all.cast("double")), 4
            ),
        )
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = 6
) -> DataFrame:
    """Append ``zlib_ratio`` = deflate(text) bytes / utf-8 bytes — the
    classic cheap repetitiveness signal (C4/Gopher family): template spam
    and pathological repetition compress far below natural prose, so a
    low ratio is a drop/inspect flag (and a very high one flags
    already-compressed or random bytes masquerading as text).

    zlib is stdlib — no container dependency — and a fixed level makes
    the bytes (hence the ratio) deterministic across runs and workers.
    Arrow-batched pandas_udf: compression is genuinely per-row Python,
    but the batch transfer amortizes it; there is no JVM deflate
    expression to prefer.  At corpus scale this is a compute-once
    column: persist it with the document (it is deterministic) rather
    than re-deriving it per downstream query."""
    import zlib

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 4)

        return texts.map(one)

    return df.withColumn("zlib_ratio", ratio(F.col(text_col)))
