"""S6/S7 job-parameter sources (reference base_processor/base.py:55-109,
settings.py:8-13, main.py:7-20): JSON params file, CLI args, env fallbacks,
and a params-file-driven append-mode pipeline run end-to-end."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

import json
import os

from processor_edf_spark.sources.params import (
    load_inputs,
    load_params_file,
    parse_cli_args,
    run_job,
)
from tests.edf_fixtures import sine, write_edf


def test_params_file_roundtrip_and_fallback(tmp_path):
    p = tmp_path / "inputs.json"
    p.write_text(json.dumps({"input_dir": "/data/in", "mode": "append"}))
    assert load_params_file(str(p)) == {"input_dir": "/data/in", "mode": "append"}
    # non-.json, missing, and unparseable paths fall back to the raw string
    assert load_params_file("/nonexistent/inputs.json") == "/nonexistent/inputs.json"
    assert load_params_file("plain-value") == "plain-value"
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_params_file(str(bad)) == str(bad)


def test_cli_args_reference_semantics(tmp_path):
    nested = tmp_path / "nested.json"
    nested.write_text(json.dumps({"rate": 200}))
    got = parse_cli_args(
        [
            "prog",  # no '=' → ignored
            "--input-dir=/data/in",
            '--label="EEG F3"',
            f"--extra={nested}",  # .json value indirection
            "--tag=a",
            "--tag=b",  # repeated key → list
            "--tag=c",
        ]
    )
    assert got["input_dir"] == "/data/in"  # --/- → _
    assert got["label"] == "EEG F3"  # quote literals stripped
    assert got["extra"] == {"rate": 200}
    assert got["tag"] == ["a", "b", "c"]


def test_load_inputs_env_file_and_required(tmp_path):
    p = tmp_path / "inputs.json"
    p.write_text(json.dumps({"input_dir": "/data/in"}))
    env = {"INPUT_FILE": str(p)}
    got = load_inputs(env=env, argv=["--mode=append"], required=["input_dir"])
    assert got == {"input_dir": "/data/in", "mode": "append"}
    try:
        load_inputs(env={}, required=["input_dir"])
    except KeyError as e:
        assert "input_dir" in str(e)
    else:  # pragma: no cover
        raise AssertionError("missing required key did not raise")


def test_run_job_params_file_append_mode(spark, tmp_path):
    """End-to-end: INPUT_FILE json params drive an append-mode run that
    matches an existing platform channel (J1 band) and publishes to
    output_dir — the reference main.py flow minus its one-file limit."""
    indir = tmp_path / "in"
    indir.mkdir()
    write_edf(
        str(indir / "a.edf"),
        signals=[{"label": "EEG F3", "rate": 200, "gen": sine(8.0)}],
        nb_data_rec=2,
    )
    write_edf(  # second file: the reference would refuse this directory
        str(indir / "b.edf"),
        signals=[{"label": "EEG F4", "rate": 100, "gen": sine(4.0)}],
        nb_data_rec=2,
    )
    outdir = tmp_path / "out"
    params = tmp_path / "inputs.json"
    params.write_text(
        json.dumps(
            {
                "input_dir": str(indir),
                "output_dir": str(outdir),
                "mode": "append",
            }
        )
    )
    existing = spark.createDataFrame(
        [("platform-1", "eeg f3", 201.0, "CONTINUOUS")],
        "id string, name string, rate double, type string",
    )
    samples, channels, _ = run_job(
        spark, env={"INPUT_FILE": str(params)}, existing_channels=existing
    )
    by_name = {r["name"]: r for r in channels.collect()}
    assert by_name["EEG F3"]["id"] == "platform-1"  # J1 band match reused
    assert by_name["EEG F4"]["id"] != "platform-1"  # new channel minted
    # published artifacts
    published = spark.read.parquet(str(outdir / "samples"))
    assert published.count() == samples.count() > 0
    chans = [
        json.loads(line)
        for f in os.listdir(outdir / "channels")
        if f.endswith(".json")
        for line in open(outdir / "channels" / f)
        if line.strip()
    ]
    assert {c["name"] for c in chans} == {"EEG F3", "EEG F4"}
    assert all(c["valid"] for c in chans)
