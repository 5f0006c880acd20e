"""Physical-plan guards for the 100 TB design claims.

These tests pin the properties that make the pipeline scale — if a
refactor breaks column pruning, filter pushdown, or the broadcast join
strategy, correctness tests won't notice but these will.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    from vector_spark.corpus import sequences

    p = str(tmp_path_factory.mktemp("plans") / "corpus")
    sequences(spark, 500, seed=3).write.mode("overwrite").parquet(p)
    return p


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_metrics_mode_prunes_tokens_from_scan(spark, corpus_path):
    """The metric path must never read the token arrays: at 100 TB the
    corpus IS mostly tokens, so this pruning is the difference between
    scanning terabytes and scanning everything."""
    from vector_spark.operators.route import Route
    from vector_spark.plans.pipeline import lanes, parse_stage

    df = spark.read.parquet(corpus_path)
    tagged = Route(lanes(), with_unmatched=True).tagged(parse_stage(df).drop("tokens", "message"))
    final = tagged.groupBy("lane", "source", "severity").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("s")
    )
    plan = _explain(final)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    assert "tokens" not in scan[0], scan[0]


def test_filter_pushdown_reaches_scan(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    q = df.filter(F.col("source") == "app").select("doc_id", "n_tok")
    plan = _explain(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "source" in pushed[0], plan
    # and the projection prunes to just the needed columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "tokens" not in read and "message" not in read


def test_enrichment_is_broadcast_join(spark, corpus_path):
    from vector_spark.corpus import enrichment_table
    from vector_spark.enrich import EnrichmentTable

    df = spark.read.parquet(corpus_path)
    et = EnrichmentTable(enrichment_table(spark), keys=["source"])
    plan = _explain(et.enrich(df))
    assert "BroadcastHashJoin" in plan, plan


def test_salted_agg_is_two_exchanges_of_partials(spark, corpus_path):
    """Salted two-phase aggregation: the only exchanges in the plan
    move (partial-)aggregate rows, never corpus rows — both HashAggregate
    pairs surround the shuffles (map-side combine)."""
    from vector_spark.plans.pipeline import parse_stage, salted_sink_aggregate

    df = spark.read.parquet(corpus_path)
    agg = salted_sink_aggregate(parse_stage(df))
    plan = _explain(agg)
    assert plan.count("Exchange") >= 2
    # partial aggregate (before any exchange) exists → map-side combine
    first_exchange = plan.index("Exchange")
    assert "HashAggregate" in plan[:first_exchange], plan[:first_exchange]


def test_parse_stays_jvm_side(spark, corpus_path):
    """The parse projection must stay JVM-side: whole-stage codegen for
    the scan+regex pipeline (from_json is CodegenFallback — interpreted
    but still JVM) and absolutely no Python eval boundary in the hot
    path."""
    from vector_spark.plans.pipeline import parse_stage

    df = spark.read.parquet(corpus_path)
    plan = _explain(parse_stage(df).drop("tokens", "message"))
    assert "codegen id" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_analytics_prune_document_scan(spark):
    """Every tokens-axis document query must scan ONLY the columns it
    uses — at 100 TB the documents table is dominated by text/tokens,
    and an accidental full-width ReadSchema is the classic silent
    regression. vocab_stats needs (source, text); token_freq,
    pmi_bigrams and dup_spans need (text[, doc_id]) and must NOT read
    lang/n_chars."""
    import __spark_entry__ as e

    for name, banned in {
        "vocab_stats": ("lang", "n_chars", "doc_id"),
        "token_freq": ("lang", "n_chars", "source", "doc_id"),
        "pmi_bigrams": ("lang", "n_chars", "source", "doc_id"),
        "dup_spans": ("lang", "n_chars", "source"),
        "length_stats": ("lang", "n_chars", "doc_id"),
        "source_kl": ("lang", "n_chars", "doc_id"),
    }.items():
        df = e.queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert scans, f"{name}: no file scan found"
        for line in scans:
            for col in banned:
                assert col not in line, f"{name} scan reads pruned column {col}: {line}"
