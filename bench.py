#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from __spark_entry__.queries() against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the flagship parse→enrich→route→aggregate
pipeline on a deterministic synthetic corpus, and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1,
     "pipeline": {"rows": N, "secs": s, "rows_per_sec": r}}

Each query is forced with a noop-format write (full execution, no
driver-side result materialization cost). Timings exclude session
startup; the first (untimed) warmup query absorbs JVM/codegen warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline subset: every operator family, weighted toward the
# scan/parse/join/agg shapes that dominate the 100 TB workload.
HEADLINE = [
    "filter",
    "route_errors",
    "route_unmatched",
    "sample_keyed",
    "dedupe",
    "reduce_merge",
    "aggregate_window",
    "log_to_metric",
    "json_parser",
    "regex_parser",
    "grok_parser",
    "kv_parser",
    "coercer",
    "field_shaping",
    "enrich_broadcast",
    "enrich_range",
    "tag_cardinality_limit",
    "dedup_exact",
    "fingerprint",
    "token_count",
    "quality_score",
    "langid",
    "minhash_signature",
    "simhash",
    "ngram_jaccard",
    "embedding_neardup",
    "ann_topk",
    "pricing_summary",
    "sessionize",
    "logfmt_parser",
    "csv_parser",
    "ip_functions",
    "url_parser",
    "apache_log_parser",
    "syslog_parser",
    "merge_partials",
    "lsh_candidates",
    "hamming_neardup",
    "metric_quantiles",
    "metric_to_log",
    "klog_parser",
    "alb_log_parser",
    "user_agent_parser",
    "percent_codec",
    "xml_parser",
    "embedding_neardup_lsh",
    "ipv6_functions",
    "nginx_access_parser",
    "syslog_maps",
    "object_ops",
    "datadog_search",
    "statsd_parser",
    "prometheus_parser",
    "logplex_parser",
    "journald_parser",
    "splunk_hec_parser",
    "dedup_clusters",
    "sequence_packing",
    "decontaminate",
]

PIPELINE_ROWS = int(os.environ.get("BENCH_PIPELINE_ROWS", "500000"))
# best-of-N per query: the sandbox VM suffers multi-second hypervisor
# pauses; a single sample can be 5-10x inflated. 2 keeps bench time sane.
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from vector_spark.corpus import enrichment_table, sequences
    from vector_spark.plans.pipeline import run_pipeline
    from vector_spark.session import get_spark

    spark = get_spark("vector_spark.bench", cpus=cpus)
    queries = entry_mod.queries()

    force(queries["filter"](spark, sf_dir))  # warmup, untimed

    only = [q for q in os.environ.get("BENCH_ONLY", "").split(",") if q]
    headline = [q for q in HEADLINE if not only or q in only]
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # flagship pipeline throughput on the synthetic tokenized-log corpus.
    # Materialize the corpus first (untimed): the timed section measures
    # the pipeline reading parquet, which is what runs at 100 TB — not
    # the fixture generator.
    import shutil
    import tempfile

    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{PIPELINE_ROWS}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        sequences(spark, PIPELINE_ROWS, seed=42).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    pipe_secs = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        run_pipeline(spark, corpus, enrichment=enrichment_table(spark), out_dir=None)
        pipe_secs = min(pipe_secs, time.time() - t0)
    timings["pipeline"] = round(pipe_secs, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite + flagship pipeline wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "pipeline": {
                    "rows": PIPELINE_ROWS,
                    "secs": round(pipe_secs, 3),
                    "rows_per_sec": round(PIPELINE_ROWS / pipe_secs, 1),
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
