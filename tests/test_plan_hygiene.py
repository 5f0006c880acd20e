"""Repo-wide physical-plan invariants over EVERY driver query.

Two sweeps across all __spark_entry__.queries() plans at sf0.001:

1. No CartesianProduct / BroadcastNestedLoopJoin — except the
   explicitly documented all-pairs baselines, whose broadcast
   nested-loop shape IS the algorithm (brute-force ANN scoring).
2. No whole-stage-codegen method over HotSpot's ~8000-bytecode JIT
   ceiling (past it the stage runs interpreted, a silent 3-7× tax —
   see NOTES_r2.md). The allowlist is EMPTY as of round 3: the statsd
   codec's extraction moved into one Arrow UDF (a codegen barrier),
   which also must stay a SINGLE ArrowEvalPython node (sweep 3).

A new query that regresses either shows up here by name instead of as
an unexplained bench slowdown two rounds later.
"""

import contextlib
import io
import re

import pytest

# broadcast nested-loop is the documented *algorithm* for these
# (embedding_neardup's all-pairs scan hides inside mapInPandas with a
# broadcast variable, and ivf_topk equi-joins on cell — neither shows a
# BNL node, so neither needs an exemption)
CARTESIAN_OK = {
    "ann_topk",        # brute-force exact baseline (broadcast query side)
    "enrich_range",    # BetweenDates range join (broadcast dim, non-equi)
    "token_freq",      # single-row broadcast of the corpus total (share denominator)
    "unigram_nll",     # single-row broadcast of the corpus total (logprob denominator)
    "domain_mix_rates",   # single-row broadcast reductions over the tiny source-count table
    "domain_mix_sample",  # same (rates build inside the sample query)
    "dsir_weights",       # two single-row broadcast totals (raw/target feature denominators)
    "dsir_select",        # same (weights build inside the select query)
    "bigram_nll",         # single-row broadcast of the unigram total (interpolation floor)
    "pmi_bigrams",        # two single-row broadcast totals (pair/unigram denominators)
    "source_kl",          # sources × vocab smoothing grid (two tiny tables) + single-row total
}
JIT_CEILING_OK: set[str] = set()  # empty since r3 (statsd now Arrow-split)
JIT_LIMIT = 8000


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as e

    out = {}
    for name, q in e.queries().items():
        df = q(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        sizes = [int(x) for x in re.findall(r"maxMethodCodeSize:(\d+)", buf.getvalue())]
        out[name] = (plan, max(sizes) if sizes else 0)
    return out


def test_no_unexpected_cartesian_joins(plans):
    bad = {
        name
        for name, (plan, _) in plans.items()
        if name not in CARTESIAN_OK
        and ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
    }
    assert not bad, f"unexpected cartesian/BNL joins in: {sorted(bad)}"


def test_allowlisted_cartesians_still_needed(plans):
    # prune the allowlist when an entry stops needing it
    stale = {
        name
        for name in CARTESIAN_OK
        if name in plans
        and "CartesianProduct" not in plans[name][0]
        and "BroadcastNestedLoopJoin" not in plans[name][0]
    }
    assert not stale, f"allowlist entries no longer cartesian: {sorted(stale)}"


def test_codegen_methods_under_jit_ceiling(plans):
    bad = {
        name: size
        for name, (_, size) in plans.items()
        if size > JIT_LIMIT and name not in JIT_CEILING_OK
    }
    assert not bad, f"codegen methods past the 8000-byte JIT ceiling: {bad}"


def test_single_arrow_eval_per_query(plans):
    """Repeated references to the same Arrow UDF must collapse into ONE
    ArrowEvalPython node (Python boundary crossings are the expensive
    part — the ipv6 lesson from r2). More than one per plan means a UDF
    stopped being shared."""
    bad = {
        name: plan.count("ArrowEvalPython")
        for name, (plan, _) in plans.items()
        if plan.count("ArrowEvalPython") > 1
    }
    assert not bad, f"plans with multiple ArrowEvalPython nodes: {bad}"


def test_every_query_has_a_scale_class():
    """Every registry query is either scale-profiled-linear or an
    explicitly tagged quadratic-by-design baseline naming its linear
    twin (VERDICT r4 item 4). New queries default to "linear", which
    the decade profiles (tools/scale_sweep.py) are expected to defend;
    anything quadratic MUST be tagged at registration."""
    import __spark_entry__ as entry

    sc = entry.scale_class()
    qs = entry.queries()
    assert set(sc) == set(qs)
    allowed = {"linear", "baseline"}
    bad = {k: v for k, v in sc.items() if v["class"] not in allowed}
    assert not bad, bad
    for name, meta in sc.items():
        if meta["class"] == "baseline":
            assert meta.get("linear_twin"), f"{name} baseline without a linear twin"
    # the known quadratic verification twins must stay tagged
    must_be_baseline = {
        "ngram_jaccard", "shingle_suite", "embedding_neardup",
        "embedding_neardup_lsh", "semantic_dedup", "ann_topk",
    }
    tagged = {k for k, v in sc.items() if v["class"] == "baseline"}
    assert must_be_baseline <= tagged, must_be_baseline - tagged
