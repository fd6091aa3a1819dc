"""Property-based fuzz of the TAL annotation roundtrip (S5, the trickiest
parse path): arbitrary onsets/durations/texts written through the EDF+D
fixture must come back EXACTLY from the declarative TAL parser — order,
values, and optional-duration handling included.  The example-based test
covers three hand-picked TALs; hypothesis walks the input space (empty
texts, many TALs per record, fractional onsets, zero durations, etc.)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.edf_fixtures import sine, write_edf

# TAL text: printable ASCII minus the TAL control bytes (\x14, \x15) and
# NUL; the EDF header charset.  min_size=1 — an EMPTY annotation inside a
# TAL is not an event in EDF+: it is either the record-timekeeping marker
# (first TAL, empty by spec) or the annotation-list terminator, and the
# parser rightly excludes both (hypothesis found this boundary on the
# unconstrained space).  Onsets/durations written with %g by the fixture,
# so restrict to values %g round-trips exactly (2 decimals).
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x7E, exclude_characters="\x14\x15"
    ),
    min_size=1,
    max_size=12,
)
_onset = st.integers(min_value=0, max_value=390).map(lambda v: v / 100.0)
_duration = st.one_of(
    st.none(), st.integers(min_value=0, max_value=500).map(lambda v: v / 100.0)
)
_tal = st.tuples(_onset, _duration, _text)
_record_tals = st.lists(_tal, min_size=0, max_size=3)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tals0=_record_tals, tals1=_record_tals)
def test_tal_roundtrip_fuzz(spark, tmp_path_factory, tals0, tals1):
    from processor_edf_spark.pipeline import process_edf_directory as run
    from processor_edf_spark.sources.edf import parse_tal_annotations

    tmp_path = tmp_path_factory.mktemp("tal_fuzz")
    write_edf(
        str(tmp_path / "ann.edf"),
        signals=[{"label": "chanA", "rate": 100, "gen": sine(5.0)}],
        nb_data_rec=2,
        variant="EDF+D",
        record_offsets_sec=[0.0, 1.0],
        annotation_nr_samples=128,  # room for the fuzzed TALs
        annotations_per_record={0: tals0, 1: tals1},
    )
    _, _, annotations = run(spark, str(tmp_path))
    parsed = parse_tal_annotations(annotations).orderBy("record", "tal_idx").collect()
    got = [(r["onset_sec"], r["duration_sec"], r["text"]) for r in parsed]
    assert got == list(tals0) + list(tals1)
