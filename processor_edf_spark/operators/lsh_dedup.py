"""Linear-scale LSH dedup: bucket-star edges + connected components.

Motivated by the r5 scale sweep (BASELINE.md): the pair-enumeration
queries (`simhash_near_pairs`, `cosine_lsh_pairs`) are oracle-pinned to
emit ALL near-dup pairs, and a duplicate group of size g contains
g·(g-1)/2 pairs — on a duplication-heavy corpus the OUTPUT itself is
quadratic (measured: 8× replicated corpus → ~30-60× pair-query time).
That is intrinsic to "emit every pair", not a plan flaw — but a dedup
pipeline does not need every pair; it needs the duplicate GROUPS.

This operator takes any LSH bucketing frame (id, bucket_key) — minhash
bands, simhash byte-bands, hyperplane buckets — and computes the
transitive closure of "shared at least one bucket" with edge count
LINEAR in Σ bucket sizes: each bucket contributes a star to its minimum
id (bucket of size g → g-1 edges, not g²/2), and stars sharing members
merge in ``connected_components`` (pointer jumping, O(log diameter)
rounds).  Semantics: candidate-level clustering — a RELAXATION of the
verified-pair queries (no hamming/cosine check inside a bucket), the
standard trade production LSH dedup makes for linearity; the verified
pair queries remain the exact path when pair-level output is the
requirement.

Band-key entropy matters: unverified transitive closure needs bucket
keys whose value space dwarfs the corpus, or chance collisions chain
everything into one component.  Minhash band keys (hash-pair strings,
~2¹²⁰ values) cluster correctly — measured on the 8× replica corpus:
40,000 docs → 4,482 survivors in 2.8 s, vs 100-190 s for the
pair-enumeration queries on the same input.  Simhash BYTE bands (256
values per band) collapse a few thousand docs into one component —
use verified simhash pairs for that fingerprint, or widen the bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from processor_edf_spark.operators.components import connected_components
from processor_edf_spark.materialize import materialize


def lsh_components(
    bucketed: DataFrame, id_col: str = "doc_id", key_col: str = "band_key"
) -> DataFrame:
    """(id, component) for every distinct id in ``bucketed``: ids
    transitively sharing any bucket key get one component label (the
    minimum member id); ids sharing no bucket are singletons labeled by
    themselves."""
    roots = bucketed.filter(F.col(key_col).isNotNull()).groupBy(
        key_col
    ).agg(F.min(id_col).alias("_root"))
    # One checkpointed (root, id) membership frame feeds BOTH the edge
    # list and the id universe: without it, `ids` below would re-run the
    # caller's whole bucketing lineage (for minhash bands, a second md5
    # scan of the corpus).  Size is ≤ Σ bucket sizes rows of two longs —
    # linear in the corpus, the same order as the shuffle that builds it.
    # LEFT join + coalesce-to-self: a row whose bucket key is NULL (a
    # caller's "unbucketable" marker) matches no root — it must stay in
    # the id universe as a SINGLETON, not silently drop out of the
    # labeling (and out of the survivor keep-list downstream).
    sets = materialize(
        bucketed.join(roots, key_col, "left")
        .select(
            F.coalesce(F.col("_root"), F.col(id_col)).alias("src"),
            F.col(id_col).alias("dst"),
        )
        .distinct()
    )
    edges = sets.filter(F.col("src") != F.col("dst"))
    # `sets` is distinct and checkpointed, so the star edges are a
    # narrow filter over its blocks — connected_components can skip its
    # own dedup shuffle + re-materialization (assume_deduped contract)
    comp = connected_components(
        edges, src="src", dst="dst", assume_deduped=True
    )
    ids = sets.select(F.col("dst").alias(id_col)).distinct()
    return (
        ids.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )


def lsh_dedup_survivors(
    bucketed: DataFrame, id_col: str = "doc_id", key_col: str = "band_key"
) -> DataFrame:
    """Keep-list: the minimum id of every LSH component — the linear
    companion to the pair-based ``dedup_survivors`` composition."""
    comp = lsh_components(bucketed, id_col=id_col, key_col=key_col)
    return (
        comp.groupBy("component")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
