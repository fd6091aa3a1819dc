"""Distributed BPE (byte-pair encoding) vocabulary training + encoding —
the tokenizer-construction step of a training-data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units").

The key scale property: BPE trains on the WORD-FREQUENCY table, not the
corpus.  One corpus-sized pass builds (word, count) — a frame bounded by
VOCABULARY size, not corpus size (10-100 M rows even at web scale) —
and the merge loop then runs over that frame.  Two loop shapes:

- **driver-local (the default path)**: when the distinct-word count
  fits ``max_local_words``, the frequency table is collected ONCE and
  the whole merge loop runs in-process with incremental pair-count
  maintenance (only words containing the merged pair are touched per
  round) — 32k production merges cost zero additional Spark jobs.
  This is the right shape at any real scale: even a 100 TB corpus
  collapses to a word-frequency table of ~10-100 M rows, and a capped
  ``word_counts().orderBy(n desc).limit(max_local_words)`` head
  preserves BPE's behavior because merge decisions are dominated by
  high-frequency words.
- **distributed fallback** (``force_distributed=True`` or table too
  big): per round, pair counting JVM-side (transform + explode of
  adjacent pairs, weighted by count, partial-agg before the shuffle),
  TakeOrdered(1) for the winner, one Arrow rewrite pass,
  localCheckpoint per round.  O(1) driver state, but one Spark job
  round-trip per merge — correct, and the reason the local path
  exists.

Both paths produce IDENTICAL merge lists (count desc, then
lexicographic (a, b) tie-break; overlapping adjacencies counted the
same way) — pinned by tests.  Training stops at ``n_merges`` or when
the best pair's count drops below ``min_pair_count``.

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


def _train_local(
    words: list[tuple[list[str], int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Driver-local merge loop with incremental pair-count maintenance:
    per round only the words indexed under the winning pair are
    re-counted (remove their old adjacencies, apply the merge, add the
    new ones — symmetric, so overlap handling matches the distributed
    count exactly).  The index may hold stale word ids; a stale entry's
    remove/re-add cancels, costing time but never correctness."""
    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += n
            index[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        for wi in list(index.get((a, b), ())):
            syms, n = words[wi]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= n
                if pair_counts[p] == 0:
                    del pair_counts[p]
            new = _merge_symbols(syms, a, b)
            words[wi] = (new, n)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] += n
                index[p].add(wi)
        index.pop((a, b), None)
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    max_local_words: int = 2_000_000,
    force_distributed: bool = False,
) -> list[tuple[str, str]]:
    """Learn the merge list.  Returns [(a, b), ...] in merge order.

    When the distinct-word count is ≤ ``max_local_words`` (and
    ``force_distributed`` is False), the frequency table is collected
    once and the merge loop runs driver-local — the vocab-scale path
    (200+ merges in seconds, no per-merge Spark jobs).  Otherwise the
    distributed per-round loop runs.  Both produce identical merges."""
    if not force_distributed:
        wc_df = word_counts(df, text_col)
        if wc_df.limit(max_local_words + 1).count() <= max_local_words:
            rows = wc_df.collect()
            words = [
                (list(r["word"]) + [EOW], int(r["n"])) for r in rows
            ]
            return _train_local(words, n_merges, min_pair_count)
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
    table ships ONCE, as a broadcast rank-ordered pair list; the ranks
    dict and every pair lookup derive from that broadcast value inside
    the executor, so the task closure carries no merge data (a closure
    copy would ship the table a second time per task, defeating the
    broadcast)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast([tuple(p) for p in merges])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_rank = bc.value
        ranks = {pair: rank for rank, pair in enumerate(by_rank)}

        def encode_word(word: str) -> list[str]:
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
                a, b = by_rank[rank]
                symbols = _merge_symbols(symbols, a, b)
            return symbols

        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                row: list[str] = []
                for w in str(text).split():
                    row.extend(encode_word(w))
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
