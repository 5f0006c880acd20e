#!/usr/bin/env python
"""Soak-style throughput measurement in the reference's own units.

The reference's soaks report BYTES/SECOND of log traffic through a full
topology (soaks/README.md:1-80; the closest shape to ours is
`syslog_regex_logs2metric_ddmetrics`, soaks/README.md:13, and the
published single-node regex-parsing figure is 13.2 MiB/s,
README.md:105). This runner measures the same quantity directly instead
of inferring it from rows/sec: render the corpus, sum the actual
`message` byte lengths, run the full parse → enrich → route → aggregate
pipeline, and report MiB/s = rendered bytes / pipeline wall.

    python tools/soak.py --rows 4000000 --cpus 8 --repeats 3

Prints one JSON line. Methodology mirrors bench.py: corpus materialized
and byte-counted BEFORE timing (generation excluded), best-of-N to ride
out hypervisor pauses (see BENCH_SCALING methodology note).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from vector_spark.corpus import enrichment_table, sequences
    from vector_spark.plans.pipeline import run_pipeline
    from vector_spark.session import get_spark

    spark = get_spark("vector_spark.soak", cpus=args.cpus)

    corpus_dir = tempfile.mkdtemp(prefix="soak_corpus_")
    sequences(spark, args.rows, seed=args.seed).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    n_rows = corpus.count()
    total_bytes = corpus.select(
        F.sum(F.octet_length("message")).alias("b")
    ).first()["b"]
    enrich = enrichment_table(spark)

    best = None
    walls = []
    for _ in range(args.repeats):
        t0 = time.time()
        run_pipeline(spark, corpus, enrich, out_dir=None)
        wall = time.time() - t0
        walls.append(round(wall, 3))
        best = wall if best is None else min(best, wall)

    mib = total_bytes / (1024 * 1024)
    print(
        json.dumps(
            {
                "metric": "soak throughput, parse+enrich+route+aggregate over rendered log bytes",
                "rows": n_rows,
                "message_mib": round(mib, 1),
                "cpus": args.cpus,
                "walls_secs": walls,
                "best_wall_secs": round(best, 3),
                "mib_per_sec": round(mib / best, 2),
                "mib_per_sec_per_core": round(mib / best / args.cpus, 2),
                "reference_regex_parse_mib_per_sec": 13.2,
                "reference_citation": "README.md:105 (single node, vector-test-harness)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
