"""The reference's own VRL language test corpus, run VERBATIM.

tools/vrl_corpus.py executes all 169 fixtures from
/root/reference/lib/vrl/tests/tests (the reference's language test
suite — runner main.rs, format test.rs) against the vector_spark VRL
front-end. This test pins a representative slice per category so CI
catches regressions fast; the full sweep is one command:

    python tools/vrl_corpus.py --json CORPUS_VRL_r5.json

Full-run status at pin time: 169/169 green (126 value_match,
40 error_code_match, 2 error_match, 1 abort_match) — the complete
reference language suite, including issues/8068 (out-of-range indexes
of homogeneous concrete arrays keep their ELEMENT type with an error
channel, the reference's string|null) and the scalar-root fixture
(compile-diagnostic only, classified without running).
"""

from pathlib import Path

import pytest

from tools.vrl_corpus import CORPUS, load_fixture, run_fixture

GREEN = ("value_match", "abort_match", "error_match", "error_code_match")

# one or more representatives per corpus category
PINNED = [
    # values / literals / queries
    "expressions/literal/timestamp.vrl",
    "expressions/literal/raw_string.vrl",
    "expressions/query/ampersat.vrl",          # coalesced @-field paths
    "expressions/query/mixed.vrl",             # digit-led segments
    "expressions/query/function_call.vrl",
    # statements-as-expressions
    "expressions/assignment/infallible_err_return_value.vrl",
    "expressions/assignment/infallible_mixed_path.vrl",
    "expressions/assignment/indexing.vrl",     # negative-index insert
    "expressions/if_statement/multiline_predicates.vrl",
    "expressions/block/multiple_expressions_multi_line.vrl",
    "expressions/abort/abort.vrl",             # partial-mutation abort
    # operators
    "expressions/arithmetic/division/integer.vrl",
    "expressions/arithmetic/addition/invalid.vrl",  # 86 typed error strings
    "expressions/arithmetic/merge/multiple_maps.vrl",
    "expressions/logical/or.vrl",              # value-semantics ||
    "expressions/logical/err.vrl",             # ?? chains
    "expressions/comparison/gt.vrl",
    "internal/short_circuit.vrl",              # gated side effects
    "internal/coalesced_fallible_op.vrl",      # 40-arm fallibility matrix
    # diagnostics (compile-time strictness)
    "diagnostics/unhandled_expression_error.vrl",   # E100
    "diagnostics/invalid_if_condition_type.vrl",    # E102
    "diagnostics/reserved_keyword.vrl",             # E205
    "diagnostics/cant_abort_infallible_function.vrl",  # E620
    "diagnostics/unnest_typedefs.vrl",              # deep-path unnest
    # end-to-end examples
    "examples/blog_vector_remap_language.vrl",
    "examples/parse_nginx_access_log.vrl",
    "examples/successful_parse_syslog_type.vrl",
]


@pytest.fixture(scope="module")
def corpus_spark(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


@pytest.mark.parametrize("rel", PINNED)
def test_corpus_fixture(corpus_spark, rel):
    path = Path(CORPUS) / rel
    if not path.exists():
        pytest.skip("reference corpus not present")
    fx = load_fixture(path)
    res = run_fixture(corpus_spark, fx)
    assert res["status"] in GREEN, (
        f"{rel}: {res['status']}\n got: {res.get('got')}\n want: {res.get('want')}")
