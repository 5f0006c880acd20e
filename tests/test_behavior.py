"""Behavior-test suite: the `vector test` analogue.

Each tests/behavior/*.toml covers the same-named reference file from
/root/reference/tests/behavior/transforms/ (22 of 22). As of round 5,
14 of the 22 are VERBATIM copies of the reference fixtures — original
configs, VRL / check_fields conditions, nested field paths, and inputs
(filter, route, regex_parser, split, tokenizer, grok_parser,
ansi_stripper, coercer, concat, remove_fields, rename_fields, compound,
logfmt_parser, plus remap whose only tweaks are local fixture paths).
The remaining 8 are documented mirrors: add_fields (heterogeneous
array literals), dedupe/merge/reduce/json_parser (per-row heterogeneous
shapes that one Spark column type cannot hold), key_value_parser
(dynamic keys inserted at the event root — static-schema divergence,
the typed/target_field form is covered), and lua_v1/lua_v2 (Python
hook dialect; timer hooks covered by applyInPandasWithState in
test_streaming.py).
"""

from __future__ import annotations

import pathlib

import pytest

BEHAVIOR_DIR = pathlib.Path(__file__).parent / "behavior"
FILES = sorted(BEHAVIOR_DIR.glob("*.toml"))


@pytest.mark.parametrize("path", FILES, ids=[p.stem for p in FILES])
def test_behavior(spark, path):
    from vector_spark.plans.unit_test import assert_unit_tests

    assert_unit_tests(spark, path.read_text())


def test_all_reference_files_mirrored():
    """Every reference behavior file is either mirrored or explicitly
    declared out of scope."""
    ref = pathlib.Path("/root/reference/tests/behavior/transforms")
    if not ref.is_dir():  # reference absent in some environments
        pytest.skip("reference checkout not present")
    ref_names = {p.stem for p in ref.glob("*.toml")}
    ours = {p.stem for p in FILES}
    missing = ref_names - ours
    assert not missing, f"unmirrored behavior files: {sorted(missing)}"
