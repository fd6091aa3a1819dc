"""Distributed BPE (byte-pair encoding) vocabulary training + encoding —
the tokenizer-construction step of a training-data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units").

The key scale property: BPE trains on the WORD-FREQUENCY table, not the
corpus.  One corpus-sized pass builds (word, count) — a vocabulary-sized
frame (10-100 M rows at web scale, reshuffled never again) — and every
merge round then runs over that frame:

- pair counting is JVM-side (transform + posexplode of adjacent symbol
  pairs, weighted by word count, partial-agg before the shuffle);
- the winning pair is one TakeOrdered(1) to the driver (count desc,
  then lexicographic pair — the deterministic tie-break);
- the merge rewrite is one Arrow pass replacing non-overlapping (a, b)
  adjacencies left-to-right; the word frame is localCheckpoint()ed per
  round (the components/pagerank lineage discipline).

Driver state per round is exactly one pair — O(1).  Training stops at
``n_merges`` or when the best pair's count drops below
``min_pair_count``.

`bpe_encode` applies the learned merge list with the rank-priority
algorithm (lowest-rank pair first, the standard inference order, which
reproduces training exactly) in one Arrow pass.

Determinism: no RNG anywhere; ties break lexicographically; pinned
against a pure-python reference implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (distinguishes "low" from "lower"'s prefix)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the one corpus-sized pass."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_symbols(symbols: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn the merge list.  Returns [(a, b), ...] in merge order."""
    wc = word_counts(df, text_col).select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias(
            "symbols"
        ),
        "n",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    pair_struct = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at(F.col("symbols"), i).alias("a"),
                F.element_at(F.col("symbols"), i + 1).alias("b"),
            ),
        )
    )
    for _ in range(n_merges):
        best = (
            wc.filter(F.size("symbols") >= 2)
            .select(pair_struct.alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))

        def gen(batches: Iterator[pd.DataFrame], a=a, b=b) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["symbols"] = [
                    _merge_symbols(list(s), a, b) for s in pdf["symbols"]
                ]
                yield pdf

        wc = wc.mapInPandas(
            gen, "symbols array<string>, n long"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list: adds ``out_col`` (array of subword
    tokens, EOW markers attached).  Rank-priority inference (always merge
    the lowest-rank applicable pair first) — exactly reproduces what
    training produced on the training corpus.  One Arrow pass; the merge
    table broadcasts as a plain dict."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: rank for rank, pair in enumerate(merges)}
    )

    def encode_word(word: str, ranks: dict) -> list[str]:
        symbols = list(word) + [EOW]
        while len(symbols) >= 2:
            pairs = [
                (ranks[(symbols[i], symbols[i + 1])], i)
                for i in range(len(symbols) - 1)
                if (symbols[i], symbols[i + 1]) in ranks
            ]
            if not pairs:
                break
            rank, _ = min(pairs)
            a, b = merges_by_rank[rank]
            symbols = _merge_symbols(symbols, a, b)
        return symbols

    merges_by_rank = {rank: pair for rank, pair in enumerate(merges)}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                row: list[str] = []
                for w in str(text).split():
                    row.extend(encode_word(w, ranks))
                toks.append(row)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>"
    return df.mapInPandas(gen, schema)


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as rank-ordered parquet — the
    artifact a tokenizer deployment ships; readable by any engine."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Inverse of :func:`save_merges` — rank order restored explicitly
    (parquet row order is not a contract)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]
