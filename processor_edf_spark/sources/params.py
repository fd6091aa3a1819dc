"""S6/S7 job-parameter sources — the reference's last entry points.

Reference parity (semantics, not code):
- S6 JSON inputs file    base_processor/base.py:55-76 (``_load_inputs`` /
  ``_load_inputs_file``): ``INPUT_FILE`` env var names a ``.json`` file
  whose object becomes the processor's inputs; a value that is itself a
  path to a valid ``.json`` file is read through (indirection); anything
  unreadable falls back to the raw string.
- S7 CLI args            base_processor/base.py:78-109
  (``_load_inputs_cmd_line``): ``--variable=value`` pairs; quotes are
  stripped, ``--``/``-`` normalize to ``_`` names, values pointing at a
  ``.json`` file are read through, and a repeated key accumulates a list.
- Entry point            main.py:7-20 + settings.py:8-13: scan
  ``INPUT_DIR`` for ``.edf`` files and run; outputs land in
  ``OUTPUT_DIR``.  The reference raises unless exactly one file is found
  (main.py:15-16); that limit is an artifact of its eager single-file
  reader and deliberately does NOT apply here — the Spark pipeline
  processes a whole directory as one plan.

``required_inputs`` validation (base.py:58-60) maps to the ``required``
argument of :func:`load_inputs`.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from processor_edf_spark.pipeline import process_edf_directory, validate_channels
from processor_edf_spark.sinks.writers import (
    write_channels_json,
    write_samples_parquet,
)


def load_params_file(path: str):
    """Read a ``.json`` params file; mirror the reference's forgiving
    fallback (base.py:64-76): a missing / non-JSON / unparseable path is
    returned unchanged as a plain string value rather than raising —
    job-submission surfaces pass opaque strings through this same slot."""
    if isinstance(path, str) and path.endswith(".json") and os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return path
    return path


def parse_cli_args(argv: Sequence[str], inputs: dict | None = None) -> dict:
    """``--variable=value`` parsing with the reference's exact rules
    (base.py:78-109): split on the first ``=``, strip quote literals,
    ``--var-name`` → ``var_name``, values naming a valid ``.json`` file
    are read through, repeated keys accumulate into a list."""
    out = dict(inputs or {})
    for arg in argv:
        if "=" not in arg:
            continue
        key, value = arg.split("=", 1)
        value = value.replace('"', "").replace("'", "")
        key = key.replace("--", "").replace("-", "_")
        value = load_params_file(value)
        if key in out:
            if isinstance(out[key], list):
                # copy, don't append: the seed dict may be caller-owned
                out[key] = [*out[key], value]
            else:
                out[key] = [out[key], value]
        else:
            out[key] = value
    return out


def load_inputs(
    inputs: dict | None = None,
    argv: Sequence[str] | None = None,
    env: Mapping[str, str] | None = None,
    required: Sequence[str] = (),
) -> dict:
    """Assemble job inputs exactly as the reference does (base.py:55-60):
    seed dict → ``INPUT_FILE`` JSON params file (replaces the seed when it
    parses to an object) → CLI ``--key=value`` overrides → required-key
    validation."""
    env = os.environ if env is None else env
    out = dict(inputs or {})
    input_file = env.get("INPUT_FILE")
    if input_file is not None:
        loaded = load_params_file(input_file)
        if isinstance(loaded, dict):
            out = loaded
    if argv is not None:
        out = parse_cli_args(argv, out)
    missing = [k for k in required if k not in out]
    if missing:
        raise KeyError(f"required input keys missing: {missing}")
    return out


def run_job(
    spark: SparkSession,
    inputs: dict | None = None,
    argv: Sequence[str] | None = None,
    env: Mapping[str, str] | None = None,
    existing_channels: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The reference ``main.py`` entry point, params-file/CLI-driven.

    Recognized inputs (every one optional except ``input_dir``):
    - ``input_dir``  directory of ``.edf`` files (env ``INPUT_DIR``
      fallback, settings.py:9) — no single-file limit (see module doc).
    - ``output_dir`` where to publish (env ``OUTPUT_DIR`` fallback);
      omitted → the returned DataFrames are not materialized.
    - ``mode``       ``"append"`` switches on existing-channel matching
      (J1/J3) when ``existing_channels`` is supplied — the batch analog of
      the reference's append mode (timeseries/base.py:129-135).
    - ``quarantine`` truthy → structurally-bad files are dropped and
      reported instead of failing the job (SURVEY.md §2.10).

    Returns ``(samples, channels, annotations)``; when ``output_dir`` is
    set, samples land as partitioned parquet and validated channel
    metadata as newline-delimited JSON (the canonical sinks — the
    byte-parity reference sink stays opt-in via sinks.writers)."""
    env = os.environ if env is None else env
    params = load_inputs(inputs=inputs, argv=argv, env=env)
    input_dir = params.get("input_dir", env.get("INPUT_DIR"))
    if not input_dir:
        raise KeyError("input_dir is required (inputs/CLI/INPUT_DIR)")
    output_dir = params.get("output_dir", env.get("OUTPUT_DIR"))

    samples, channels, annotations = process_edf_directory(
        spark,
        input_dir,
        existing_channels=existing_channels
        if params.get("mode") == "append"
        else None,
        quarantine=bool(params.get("quarantine")),
    )
    if output_dir:
        write_samples_parquet(samples, os.path.join(output_dir, "samples"))
        write_channels_json(
            validate_channels(channels), os.path.join(output_dir, "channels")
        )
    return samples, channels, annotations
