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

Calibration gating (same motive as tools/scaling_bench.py): this
sandbox VM sits on a contended hypervisor — single samples can be
5-10x inflated (BENCH_r02 showed 4x phantom "regressions" on untouched
plans). The probe is a FIXED parallel Spark job (range-sum across one
partition per core): a single-core spin misses the dominant failure
mode here, where the guest's 32 vCPUs map to ~8 effective host cores
and neighbors starve the executor pool while one thread still runs
clean (measured: a 6.3 s sample of a 0.8 s query passed a single-core
gate). Probes interleave between samples — each doubles as the
post-check of one sample and the pre-check of the next; a sample is
valid only if both neighboring probes are within 40% of the session
best. Kept number = best valid sample (retrying up to
BENCH_MAX_TRIES); queries that never saw a clean window are listed in
`tainted`, their timing untrusted for regression adjudication.
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
    "shingle_suite",
    "pack_fill_compare",
    "token_freq",
    "concat_chunk",
    "repetition_scores",
    "dup_spans",
    "dup_span_removal",
    "unigram_nll",
    "bigram_nll",
    "dsir_select",
    "semantic_dedup",
    "domain_mix_sample",
    "vocab_stats",
    "pmi_bigrams",
    "epoch_shuffle",
    "split_corpus",
    "source_kl",
    "length_stats",
    "vrl_compile",  # round 5: the VRL source-text compiler flagship
]

PIPELINE_ROWS = int(os.environ.get("BENCH_PIPELINE_ROWS", "500000"))
# valid (clean-window) samples wanted per query / retry budget
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
MAX_TRIES = int(os.environ.get("BENCH_MAX_TRIES", "5"))
TAINT_TOLERANCE = 0.40
_PROBE_ROWS_PER_CORE = 100_000_000


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


class Gate:
    """Validates sample windows against a fixed parallel Spark probe
    (one range-sum partition per core, ~0.6 s clean): slow probe → the
    executor pool is being starved right now and timings are garbage."""

    def __init__(self, spark, cpus: int) -> None:
        self.spark, self.cpus = spark, cpus
        for _ in range(2):  # JIT warmup for the probe itself
            self._probe()
        self.best = min(self._probe() for _ in range(3))

    def _probe(self) -> float:
        t0 = time.time()
        self.spark.range(0, _PROBE_ROWS_PER_CORE * self.cpus, 1, self.cpus).selectExpr(
            "sum(id % 1000) as s"
        ).collect()
        return time.time() - t0

    def _clean(self, cal: float) -> bool:
        self.best = min(self.best, cal)
        return cal <= self.best * (1 + TAINT_TOLERANCE)

    def best_of(self, fn) -> tuple[float, bool]:
        """Best of REPEATS clean samples (retrying tainted windows up to
        MAX_TRIES); falls back to best raw sample, flagged, if the VM
        never quiets down. Probes interleave between samples: sample i
        is valid iff the probes immediately before and after it are
        both within tolerance of the session-best probe.

        Every sample starts COLD: queries that persist() internally
        (shingle_suite, ngram_jaccard) leave their blocks in the cache
        manager, and Spark substitutes any matching plan fragment in a
        LATER sample or query with the cached relation — sample 2 of a
        suite, or a sibling op sharing a subplan, would silently time a
        warm read instead of the operator (observed: 2.1 s "cold" suite
        that was 9.6 s when actually cold)."""
        valid, raw = [], []
        pre_ok = self._clean(self._probe())
        for _ in range(MAX_TRIES):
            self.spark.catalog.clearCache()
            t0 = time.time()
            fn()
            secs = time.time() - t0
            raw.append(secs)
            post_ok = self._clean(self._probe())
            if pre_ok and post_ok:
                valid.append(secs)
                if len(valid) >= REPEATS:
                    break
            pre_ok = post_ok
        if valid:
            return min(valid), True
        return min(raw), False


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
    gate = Gate(spark, cpus)
    timings: dict[str, float] = {}
    tainted: list[str] = []
    for name in headline:
        secs, ok = gate.best_of(lambda: force(queries[name](spark, sf_dir)))
        timings[name] = round(secs, 3)
        if not ok:
            tainted.append(name)

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
    enrichment = enrichment_table(spark)
    pipe_secs, pipe_ok = gate.best_of(
        lambda: run_pipeline(spark, corpus, enrichment=enrichment, out_dir=None)
    )
    timings["pipeline"] = round(pipe_secs, 3)
    if not pipe_ok:
        tainted.append("pipeline")

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
                "calibration": {
                    "best_probe_secs": round(gate.best, 3),
                    "taint_tolerance": TAINT_TOLERANCE,
                    "repeats": REPEATS,
                    "tainted_queries": tainted,
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
