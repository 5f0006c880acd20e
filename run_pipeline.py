#!/usr/bin/env python
"""spark-submit entry point for the vector_spark flagship pipeline.

Usage:
    spark-submit --master local[8] --py-files vector_spark.zip \
        run_pipeline.py --rows 100000 --out /tmp/vector_out

or, resuming against an existing corpus with checkpointing:
    spark-submit run_pipeline.py --input /path/corpus --out /path/out \
        --checkpoint /path/ckpt

Runs source → parse → enrich → route → per-sink aggregate
(BASELINE.json north_rule) and prints one JSON line of lineage +
throughput metrics. Build the zip with:
    python -c "import shutil; shutil.make_archive('vector_spark','zip','.','vector_spark')"
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=100_000, help="synthetic corpus size (ignored with --input)")
    ap.add_argument("--input", default=None, help="existing parquet corpus dir (overrides --rows)")
    ap.add_argument("--out", default=None, help="sink dir; omit for count-only (bench mode)")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir for resumable partition loop")
    ap.add_argument("--no-salt", action="store_true", help="disable salted two-phase aggregation")
    ap.add_argument(
        "--sink-layout",
        choices=["fanout", "tagged"],
        default="fanout",
        help="fanout: one tree per lane (K write jobs); tagged: one pass, one table partitioned by (lane, source)",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run the pipeline once untimed first (JIT/codegen warmup, for benchmarking)",
    )
    args = ap.parse_args(argv)

    from vector_spark.corpus import enrichment_table, sequences
    from vector_spark.plans.pipeline import run_pipeline
    from vector_spark.session import get_spark

    spark = get_spark("vector_spark.run_pipeline", cpus=args.cpus)
    t0 = time.time()
    if args.input:
        df = spark.read.parquet(args.input)
    else:
        df = sequences(spark, args.rows, seed=args.seed)
    enrich = enrichment_table(spark)

    if args.checkpoint and args.input:
        from vector_spark.sinks.checkpoint import run_with_checkpoint

        result = run_with_checkpoint(spark, args.input, enrich, args.out, args.checkpoint)
        pipeline_secs = time.time() - t0
    else:
        if args.warmup:
            run_pipeline(spark, df, enrichment=enrich, out_dir=None, salted=not args.no_salt)
            t0 = time.time()
        result = run_pipeline(
            spark, df, enrichment=enrich, out_dir=args.out, salted=not args.no_salt,
            sink_layout=args.sink_layout,
        )
        pipeline_secs = result.wall_secs
    rows_in = args.rows if not args.input else df.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rows_in": rows_in,
                "lane_counts": result.lane_counts,
                "rows_routed": result.rows_routed,
                "wall_secs": round(wall, 3),
                "rows_per_sec": round(rows_in / wall, 1),
                # pipeline-only numbers: exclude session startup and the
                # rows_in count scan — what a long-lived cluster job sees
                "pipeline_wall_secs": round(pipeline_secs, 3),
                "pipeline_rows_per_sec": round(rows_in / pipeline_secs, 1),
                "sample_metrics": {k: v[:3] for k, v in result.metrics.items()},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
