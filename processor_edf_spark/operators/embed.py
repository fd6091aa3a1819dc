"""Feature-hashing text embeddings (the hashing trick, Weinberger et al.
2009): character-n-gram counts hashed into a fixed-dim signed vector,
L2-normalized — the trainable-model-free embedder that lets the WHOLE
similarity/dedup/ANN stack (cosine LSH, SemDeDup, kmeans → IVF → PQ) run
end-to-end from raw text when no neural embedding column exists.

Properties the downstream stack needs, all held by construction:
- deterministic and portable: buckets/signs derive from md5 of the
  n-gram bytes (the textfns.hash64 discipline) — same text, same vector,
  any machine, any run;
- identical texts → identical vectors (cosine exactly 1.0), near-dup
  texts → high cosine (shared n-grams dominate the sum);
- fixed dim regardless of vocabulary: collisions are the accepted noise
  (signed hashing keeps them zero-mean).

Shape: one Arrow pass, no shuffle; per-row n-gram hashing is genuinely
per-row CPU (the compression_ratio caveat applies — at corpus scale,
compute once and persist next to the text).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _embed_one(text: str, dim: int, n: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    t = " " + text.lower() + " "  # pad so edge n-grams are distinct
    for i in range(max(len(t) - n + 1, 0)):
        h = int.from_bytes(
            hashlib.md5(t[i : i + n].encode("utf-8")).digest()[:8], "big"
        )
        bucket = h % dim
        sign = 1.0 if (h >> 63) & 1 else -1.0
        v[bucket] += sign
    norm = np.sqrt((v * v).sum())
    return v / norm if norm > 0 else v


def hash_embed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    ngram: int = 3,
    out_id: str = "vec_id",
    out_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding array<double> of ``dim``) from character
    ``ngram``-grams — column names default to the embeddings-table
    convention so the output drops straight into kmeans_fit /
    ivf_pq_search / cosine LSH."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    out_id: pdf[id_col].to_numpy(),
                    out_col: [
                        _embed_one(str(t), dim, ngram) for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{out_id} long, {out_col} array<double>"
    )


def default_quality_weights(dim: int = 64) -> list:
    """A fixed linear probe in [-1, 1]: w[j] = ((j*37 + 11) % 21 - 10)
    / 10 — closed-form, so a DuckDB oracle can recompute the scores
    from first principles (the deployment path swaps in TRAINED
    weights; the inference shape is identical)."""
    return [((j * 37 + 11) % 21 - 10) / 10.0 for j in range(dim)]


def quality_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    ngram: int = 3,
    weights: list | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-style quality classifier INFERENCE (linear model over
    the hashing-trick bag of character n-grams): (id, logit, score,
    keep).  logit = w . hash_embed(text) + bias; score = sigmoid;
    keep = logit >= threshold (sigmoid is monotone, so the gate is the
    logit comparison — float-stable across engines).

    Scale shape: the embedding is one Arrow pass and the dot product
    folds JVM-side over a LITERAL weight array (64 doubles ride the
    plan — the broadcast-weights pattern without even a broadcast
    join); shuffle-free end to end, so the gate rides the corpus scan
    at 100 TB like the gopher rule gate does."""
    from pyspark.sql import functions as F

    if weights is None:
        weights = default_quality_weights(dim)
    if len(weights) != dim:
        raise ValueError("weights length must equal dim")
    emb = hash_embed(
        df, text_col=text_col, id_col=id_col, dim=dim, ngram=ngram,
        out_id=id_col,
    )
    w_arr = F.array(*[F.lit(float(x)) for x in weights])
    logit = F.aggregate(
        F.zip_with("embedding", w_arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) + F.lit(float(bias))
    return emb.select(
        F.col(id_col),
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
        (logit >= F.lit(float(threshold))).alias("keep"),
    )
