#!/usr/bin/env python
"""spark-submit entry point for TOML-configured topologies — the
`vector --config vector.toml` analogue.

Usage:
    spark-submit --py-files vector_spark.zip run_config.py pipeline.toml
    python run_config.py pipeline.toml --cpus 8
    python run_config.py pipeline.toml --test      # `vector test` mode

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
    ap.add_argument(
        "--test",
        action="store_true",
        help="run the config's [[tests]] blocks (the `vector test` subcommand)",
    )
    ap.add_argument(
        "--graph",
        action="store_true",
        help="print the topology as Graphviz DOT (the `vector graph` subcommand)",
    )
    ap.add_argument(
        "--validate",
        action="store_true",
        help="compile-only check, no execution (the `vector validate` subcommand)",
    )
    ap.add_argument(
        "--tap",
        default=None,
        metavar="COMPONENT",
        help="print up to --limit events from one component's output as JSON "
        "lines (the `vector tap` subcommand, src/api/tap.rs — here a "
        "one-shot sample instead of a live subscription)",
    )
    ap.add_argument("--limit", type=int, default=10, help="--tap sample size")
    ap.add_argument(
        "--top",
        type=float,
        default=None,
        metavar="SECS",
        help="emit periodic internal-metrics snapshots (`vector top` "
        "analogue, src/top/): per-component cumulative sent-event "
        "counters + rates as Prometheus exposition files in --top-dir, "
        "one snapshot after every sink plus every SECS seconds "
        "(pass 0 for per-sink snapshots only)",
    )
    ap.add_argument("--top-dir", default="top_snapshots", help="--top output dir")
    ap.add_argument(
        "--reload-from",
        default=None,
        metavar="OLD_TOML",
        help="reload semantics (`vector` config reload, src/config/diff.rs): "
        "diff OLD_TOML against the config, keep unchanged sinks' streaming "
        "checkpoints (the run continues where the old config stopped), "
        "rotate checkpoints of changed stateful chains, and print the diff",
    )
    args = ap.parse_args(argv)

    if args.graph:
        # no Spark session needed — pure config rendering
        from vector_spark.plans.config import topology_dot

        with open(args.config) as f:
            print(topology_dot(f.read()), end="")
        return 0

    from vector_spark.plans.config import compile_config
    from vector_spark.session import get_spark

    # session shutdown belongs to process exit (or the calling
    # harness) — same convention as run_prep/run_dedup, and required
    # for in-process callers (pytest) sharing one session
    spark = get_spark("vector_spark.run_config", cpus=args.cpus)
    with open(args.config) as f:
        toml_text = f.read()

    if args.test:
        from vector_spark.plans.unit_test import run_unit_tests

        results = run_unit_tests(spark, toml_text)
        for r in results:
            status = "passed" if r.ok else "FAILED"
            print(f"test {r.name!r} ... {status}")
            for err in r.errors:
                print(f"  error: {err}")
            for c in r.checks:
                for f_ in c.failures:
                    print(f"  check {c.extract_from!r} ({c.n_rows} rows): {f_}")
        n_bad = sum(1 for r in results if not r.ok)
        print(json.dumps({"tests": len(results), "failed": n_bad}))
        return 1 if n_bad else 0

    if args.validate:
        from vector_spark.plans.config import ConfigError
        from vector_spark.streaming.kafka import EnvironmentBlocked
        from vector_spark.vrl import VrlCompileError, VrlSyntaxError

        try:
            # validate applies the reference's compile-time VRL
            # diagnostics (error[E###]) — `vector validate` behavior
            compile_config(spark, toml_text, strict_vrl=True)
        except EnvironmentBlocked as e:
            # config compiles and the component is wired; only the
            # runtime dependency (jars/broker) is missing here
            print(f"ok (environment-blocked at runtime: {e})")
            return 0
        except (ConfigError, VrlCompileError, VrlSyntaxError) as e:
            print(f"invalid: {e}")
            return 1
        print("ok")
        return 0

    if args.tap:
        topo = compile_config(spark, toml_text)
        if args.tap not in topo.outputs:
            print(
                f"unknown component {args.tap!r}; available: {sorted(topo.outputs)}",
                file=sys.stderr,
            )
            return 1
        for line in topo.outputs[args.tap].limit(args.limit).toJSON().collect():
            print(line)
        return 0

    t0 = time.time()
    diff = None
    if args.reload_from:
        from vector_spark.plans.config import recompile

        with open(args.reload_from) as f:
            old_text = f.read()
        topo, diff = recompile(spark, old_text, toml_text)
    else:
        topo = compile_config(spark, toml_text)
    top = None
    if args.top is not None:
        from vector_spark.plans.top import TopMonitor

        top = TopMonitor(spark, args.top_dir, interval_secs=args.top or None)
        top.start()
    results = topo.run(top=top)
    if top is not None:
        top.stop()
    summary = {
        name: (len(r) if isinstance(r, list) else r) for name, r in results.items()
    }
    out = {"sinks": summary, "wall_secs": round(time.time() - t0, 3)}
    if diff is not None:
        out["diff"] = diff.as_dict()
    if top is not None:
        out["top_snapshots"] = top.snapshots_taken
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
