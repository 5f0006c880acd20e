#!/usr/bin/env python
"""spark-submit entry point for TOML-configured topologies — the
`vector --config vector.toml` analogue.

Usage:
    spark-submit --py-files vector_spark.zip run_config.py pipeline.toml
    python run_config.py pipeline.toml --cpus 8

The config shape mirrors Vector's: [sources.X] / [transforms.Y] /
[sinks.Z] with `type` and `inputs`; `route` and `compound` macros
expand exactly like the reference compiler. See
vector_spark/plans/config.py for supported component types.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="TOML config file")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from vector_spark.plans.config import compile_config
    from vector_spark.session import get_spark

    spark = get_spark("vector_spark.run_config", cpus=args.cpus)
    with open(args.config) as f:
        toml_text = f.read()
    t0 = time.time()
    topo = compile_config(spark, toml_text)
    results = topo.run()
    summary = {
        name: (len(r) if isinstance(r, list) else r) for name, r in results.items()
    }
    print(json.dumps({"sinks": summary, "wall_secs": round(time.time() - t0, 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
