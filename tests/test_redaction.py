"""PII scrub + repetition filters over constructed fixtures (the
synthetic documents corpus contains no PII-shaped strings or newlines,
so these operators are pinned here rather than by a driver oracle)."""

from __future__ import annotations

from processor_edf_spark.operators.redaction import (
    pii_stats,
    redact_pii,
    repetition_stats,
)

ROWS = [
    (0, "contact me at jane.doe+spam@example.co.uk or 415-555-1234 today"),
    (1, "server 10.0.255.3 logged ssn 123-45-6789 and (212) 555-9876"),
    (2, "clean text with no sensitive content at all"),
    (3, ""),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_pii_stats_counts(spark):
    got = {r["doc_id"]: r for r in pii_stats(_docs(spark)).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"], got[0]["n_ssn"]) == (1, 1, 0, 0)
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"], got[1]["n_ssn"]) == (0, 1, 1, 1)
    assert got[0]["has_pii"] and got[1]["has_pii"]
    assert not got[2]["has_pii"] and not got[3]["has_pii"]


def test_redact_replaces_with_typed_placeholders(spark):
    got = {r["doc_id"]: r["text"] for r in redact_pii(_docs(spark)).collect()}
    assert got[0] == "contact me at <EMAIL> or <PHONE> today"
    assert "<IPV4>" in got[1] and "<SSN>" in got[1] and "<PHONE>" in got[1]
    assert "123-45-6789" not in got[1] and "10.0.255.3" not in got[1]
    assert got[2] == ROWS[2][1]  # untouched


def test_repetition_stats_line_fractions(spark):
    rows = [
        (0, "a line\nb line\na line\na line"),   # 4 units, 2 distinct
        (1, "x\ny\nz"),                           # no repeats
        (2, ""),                                  # no units -> nulls
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["n_units"] == 4
    assert abs(got[0]["dup_unit_frac"] - 0.5) < 1e-9
    # chars: all units 6+6+6+6=24, distinct 6+6=12 -> 0.5 duplicated
    assert abs(got[0]["dup_char_frac"] - 0.5) < 1e-9
    assert got[1]["dup_unit_frac"] == 0.0 and got[1]["dup_char_frac"] == 0.0
    assert got[2]["dup_unit_frac"] is None and got[2]["dup_char_frac"] is None


def test_compression_ratio_orders_repetitive_below_prose(spark):
    from processor_edf_spark.operators.redaction import compression_ratio

    rows = [
        (0, "spam " * 200),                      # highly repetitive
        (1, "the quick brown fox jumps over the lazy dog and then "
            "wanders through seventeen distinct meadows describing "
            "each flower it encounters in novel unrepeated vocabulary"),
        (2, None),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got[0] < 0.1                  # template spam craters
    assert got[1] > 0.5                  # natural-ish prose doesn't
    assert got[2] is None and got[3] is None
    # deterministic across invocations
    again = {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got == again
