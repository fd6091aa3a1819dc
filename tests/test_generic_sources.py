"""Corrupt-tolerant CSV/NDJSON ingestion: malformed rows land in
quarantine with their raw bytes, clean rows parse typed, nothing is
silently dropped and nothing kills the scan."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from processor_edf_spark.sources.generic import (
    read_csv_tolerant,
    read_ndjson_tolerant,
    split_quarantine,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
    ]
)


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "doc_id,lang,text\n"
        "1,en,hello world\n"
        "not_a_number,en,bad id row\n"
        "2,de,guten tag\n"
    )
    df = read_csv_tolerant(spark, str(p), SCHEMA)
    clean, quar = split_quarantine(df)
    crows = {r["doc_id"]: r for r in clean.collect()}
    assert set(crows) == {1, 2}
    assert crows[2]["lang"] == "de"
    q = quar.collect()
    assert len(q) == 1
    assert "not_a_number" in q[0]["raw_record"]
    assert q[0]["input_file"].endswith("in.csv")
    assert sorted(clean.columns) == ["doc_id", "lang", "text"]


def test_ndjson_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "ok"}\n'
        "{broken json line\n"
        '{"doc_id": 2, "lang": "fr", "text": "bon"}\n'
    )
    df = read_ndjson_tolerant(spark, str(p), SCHEMA)
    clean, quar = split_quarantine(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    q = quar.collect()
    assert len(q) == 1 and "broken json" in q[0]["raw_record"]


def test_all_clean_yields_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("doc_id,lang,text\n1,en,a\n2,en,b\n")
    clean, quar = split_quarantine(read_csv_tolerant(spark, str(p), SCHEMA))
    assert clean.count() == 2 and quar.count() == 0
