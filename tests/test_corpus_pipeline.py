"""run_corpus_job end-to-end: every stage drops exactly the crafted
casualties, the report's accounting chains, and surviving text is
scrubbed + split-assigned identically to the oracle-checked queries."""

from __future__ import annotations

import pytest

from processor_edf_spark.corpus_pipeline import run_corpus_job
from tests.conftest import SF_SMALL

pytestmark = pytest.mark.slow

BASE = (
    "the quick brown fox jumps over a lazy dog of seventeen "
    "curious researchers to annotate corpus documents with careful "
    "and deliberate structured metadata during long afternoon sessions"
)  # 26 words, 5 distinct stopwords — passes the gate with room


def _docs(spark):
    rows = [
        # passes everything
        (1, BASE + " alpha beta gamma"),
        # exact dup of 1 after normalization (case + whitespace mangling)
        (2, "  " + BASE.upper() + "   ALPHA    BETA GAMMA "),
        # near-dup of 1: one word differs → same minhash component
        (3, BASE + " alpha beta delta"),
        # distinct survivor carrying PII
        (4, "please contact jane of archives at jane.doe@example.com "
            "to request the quarterly ledger scans and a bound folio "
            "of marginalia indexed by provenance custodians during "
            "the winter accession review in reading room seven"),
        # fails the rule gate: too short
        (5, "tiny doc"),
        # distinct survivor
        (6, "a completely different narrative about the distributed "
            "query engines of today shuffling partitions across "
            "executors while catalyst optimizes logical plans into "
            "physical stages with adaptive execution and broadcast "
            "joins to everywhere"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_job_stage_accounting(spark):
    clean, report = run_corpus_job(spark, _docs(spark))
    rep = {r["stage"]: r for r in report.collect()}
    assert rep["input"]["rows_out"] == 6
    assert rep["rule_gate"]["dropped"] == 1          # doc 5
    assert rep["exact_dedup"]["dropped"] == 1        # doc 2 (normalized dup)
    assert rep["near_dedup_lsh"]["dropped"] == 1     # doc 3 (minhash twin)
    assert rep["scrub_and_split"]["dropped"] == 0
    # the chain: each stage's rows_in is the previous stage's rows_out
    order = ["input", "rule_gate", "exact_dedup", "near_dedup_lsh",
             "scrub_and_split"]
    for prev, cur in zip(order, order[1:]):
        assert rep[cur]["rows_in"] == rep[prev]["rows_out"]
        assert rep[cur]["dropped"] == rep[cur]["rows_in"] - rep[cur]["rows_out"]

    rows = {r["doc_id"]: r for r in clean.collect()}
    assert sorted(rows) == [1, 4, 6]
    # PII scrubbed in-place, typed placeholder
    assert "<EMAIL>" in rows[4]["text"]
    assert "jane.doe@example.com" not in rows[4]["text"]
    # split column matches the oracle-checked split_assignment semantics
    assert all(r["split"] in ("train", "val", "test") for r in rows.values())
    assert all(r["n_words"] >= 25 for r in rows.values())


def test_corpus_job_deterministic(spark):
    a, _ = run_corpus_job(spark, _docs(spark))
    b, _ = run_corpus_job(spark, _docs(spark))
    ra = sorted((r["doc_id"], r["split"], r["text"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["split"], r["text"]) for r in b.collect())
    assert ra == rb


def test_corpus_job_on_real_documents(spark):
    """Smoke over the real testdata: accounting chains, survivors
    nonempty, and the dup-heavy template corpus actually loses rows to
    the near-dup stage."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    clean, report = run_corpus_job(spark, docs)
    rep = {r["stage"]: r for r in report.collect()}
    n_in = rep["input"]["rows_out"]
    n_out = rep["scrub_and_split"]["rows_out"]
    assert n_in == 500
    assert 0 < n_out < n_in
    assert rep["near_dedup_lsh"]["dropped"] > 0  # template corpus near-dups
    assert clean.count() == n_out


def test_apply_mix_rates_deterministic_thinning(spark):
    from pyspark.sql import functions as F

    from processor_edf_spark.corpus_pipeline import apply_mix_rates
    from processor_edf_spark.plans import QUERIES

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rates = QUERIES["source_mix_rates"](spark, SF_SMALL)
    kept = apply_mix_rates(docs, rates)
    kept2 = apply_mix_rates(docs, rates)
    a = sorted(r["doc_id"] for r in kept.collect())
    assert a == sorted(r["doc_id"] for r in kept2.collect())  # deterministic
    # per-stratum: never exceeds the stratum population; full-rate strata
    # keep everything; reduced-rate strata actually thin
    pop = {
        (r["source"], r["lang"]): r["n_docs"] for r in rates.collect()
    }
    rate = {
        (r["source"], r["lang"]): r["sample_rate"] for r in rates.collect()
    }
    got = {
        (r["source"], r["lang"]): r["n"]
        for r in kept.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert any(v < 1.0 for v in rate.values())  # the plan actually thins
    for key, n in got.items():
        assert n <= pop[key]
        if rate[key] == 1.0:
            assert n == pop[key]
    thinned = [k for k, v in rate.items() if v < 0.8 and pop[k] >= 10]
    assert thinned and all(got.get(k, 0) < pop[k] for k in thinned)


def test_apply_mix_rates_missing_stratum_kept_at_full_rate(spark):
    """A stratum absent from the rates frame (computed from an earlier
    corpus snapshot) must be kept in full — rate 1.0 — not silently
    dropped by an inner join."""
    from processor_edf_spark.corpus_pipeline import apply_mix_rates

    docs = spark.createDataFrame(
        [(i, "web", "en", "t") for i in range(50)]
        + [(100 + i, "books", "fr", "t") for i in range(30)],
        "doc_id long, source string, lang string, text string",
    )
    # rates only know the (web, en) stratum; (books, fr) is new
    rates = spark.createDataFrame(
        [("web", "en", 0.5)], "source string, lang string, sample_rate double"
    )
    kept = apply_mix_rates(docs, rates)
    by = {
        (r["source"], r["lang"]): r["n"]
        for r in kept.groupBy("source", "lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by[("books", "fr")] == 30  # unknown stratum untouched
    assert 0 < by.get(("web", "en"), 0) < 50  # known stratum thinned


def test_prepare_training_shards_rejects_negative_doc_id(spark, tmp_path):
    """chunk_id arithmetic is only collision-free for doc_id >= 0 and
    chunk_idx < 1e6 — violations raise instead of corrupting the pack
    join."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from processor_edf_spark.corpus_pipeline import prepare_training_shards

    docs = spark.createDataFrame(
        [(-5, "train", "some words repeated " * 20)],
        "doc_id long, split string, text string",
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError, Exception),
                       match="chunk_id envelope"):
        prepare_training_shards(
            spark, docs, str(tmp_path / "bad"), pack_budget=256
        )


def test_corpus_job_survives_empty_survivor_set(spark):
    """Every stage dropping everything must yield a clean empty frame
    and a coherent report, not a crash (the realistic no-good-docs
    drop directory)."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "also tiny")], "doc_id long, text string"
    )
    clean, report = run_corpus_job(spark, docs)
    assert clean.count() == 0
    rep = {r["stage"]: r for r in report.collect()}
    assert rep["rule_gate"]["rows_out"] == 0
    assert rep["scrub_and_split"]["rows_out"] == 0


def test_prepare_training_shards_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from processor_edf_spark.corpus_pipeline import prepare_training_shards

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    clean, _ = run_corpus_job(spark, docs)
    out_dir = str(tmp_path / "shards")
    out = prepare_training_shards(
        spark, clean, out_dir, pack_budget=256
    )
    back = spark.read.parquet(out_dir)
    assert back.count() == out.count() > 0
    # every chunk landed in a sequence, and no sequence exceeds budget
    per_seq = (
        back.groupBy("seq_id").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    assert per_seq and all(r["tot"] <= 256 for r in per_seq)
    # split survives into the shards; chunk ids are stable doc-derived
    assert set(r["split"] for r in back.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    re_out = prepare_training_shards(
        spark, clean, str(tmp_path / "shards2"), pack_budget=256
    )
    assert sorted(r["chunk_id"] for r in out.select("chunk_id").collect()) == \
        sorted(r["chunk_id"] for r in re_out.select("chunk_id").collect())


def test_corpus_job_null_text_dropped_at_gate(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, BASE + " alpha beta gamma")],
        "doc_id long, text string",
    )
    clean, report = run_corpus_job(spark, docs)
    rep = {r["stage"]: r for r in report.collect()}
    assert rep["rule_gate"]["dropped"] == 1  # null text fails the gate
    assert [r["doc_id"] for r in clean.collect()] == [2]
