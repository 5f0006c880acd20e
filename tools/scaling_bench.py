#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

The rule's criterion — ≥0.8 throughput scaling efficiency between
cluster sizes N and 4N — cannot use a real cluster in this sandbox, so
we run the SAME job on the SAME materialized corpus at local[N] and
local[4N] in separate processes (a Spark master is fixed per JVM) and
report pipeline-only throughput at both plus
efficiency = thr(4N) / (4 · thr(N)).

Measurement hygiene — this sandbox VM sits on a contended hypervisor
(multi-second whole-guest pauses; /proc/stat steal time in the
thousands of seconds), so:
  * levels are INTERLEAVED (N, 4N, N, 4N, ...) so both sample the same
    environmental windows;
  * every run is preceded by a single-core CPU calibration spin; runs
    whose calibration deviates >15% from the session best are marked
    tainted and excluded (the guest was being throttled);
  * the kept metric is best-of-valid-runs per level;
  * timings are pipeline-only (post-warmup, measured inside the job),
    excluding JVM/session startup, which a long-lived cluster amortizes.

Usage: python tools/scaling_bench.py [--rows 8000000] [--repeats 4]
Writes BENCH_SCALING.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def calibrate() -> float:
    """Single-core spin; returns seconds for a fixed workload. A slow
    result means the hypervisor is stealing cycles right now."""
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i * i
    return time.time() - t0


def materialize(rows: int) -> str:
    path = f"/tmp/scale_corpus_{rows}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        code = (
            "from vector_spark.session import get_spark\n"
            "from vector_spark.corpus import sequences\n"
            "spark = get_spark('materialize', cpus=32)\n"
            f"sequences(spark, {rows}, seed=42).write.mode('overwrite').parquet('{path}')\n"
        )
        subprocess.run([sys.executable, "-c", code], cwd=REPO, check=True)
    return path


def run_once(corpus: str, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "run_pipeline.py", "--input", corpus, "--cpus", str(cpus), "--warmup"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--levels", type=int, nargs=2, default=[1, 4])
    ap.add_argument("--taint-tolerance", type=float, default=0.15)
    args = ap.parse_args()

    corpus = materialize(args.rows)
    n, n4 = args.levels
    runs: list[dict] = []
    for r in range(args.repeats):
        for cpus in (n, n4):
            cal = calibrate()
            res = run_once(corpus, cpus)
            rec = {
                "cpus": cpus,
                "calibration_secs": round(cal, 3),
                "pipeline_wall_secs": res["pipeline_wall_secs"],
                "rows_per_sec": res["pipeline_rows_per_sec"],
            }
            runs.append(rec)
            print(
                f"local[{cpus}] run {r + 1}: {rec['pipeline_wall_secs']}s "
                f"({rec['rows_per_sec']} rows/s) cal={rec['calibration_secs']}s",
                file=sys.stderr,
            )

    best_cal = min(r["calibration_secs"] for r in runs)
    for r in runs:
        r["tainted"] = r["calibration_secs"] > best_cal * (1 + args.taint_tolerance)
    valid = {c: [r for r in runs if r["cpus"] == c and not r["tainted"]] for c in (n, n4)}
    # if throttling tainted every run of a level, fall back to its best
    for c in (n, n4):
        if not valid[c]:
            valid[c] = [min((r for r in runs if r["cpus"] == c), key=lambda r: r["pipeline_wall_secs"])]
    best = {c: max(valid[c], key=lambda r: r["rows_per_sec"]) for c in (n, n4)}
    thr_n, thr_4n = best[n]["rows_per_sec"], best[n4]["rows_per_sec"]
    eff = thr_4n / (thr_n * (n4 / n))
    report = {
        "rows": args.rows,
        "metric": "sequences/sec end-to-end parse→enrich→route→aggregate (pipeline-only, post-warmup)",
        "levels": {
            str(c): {
                "best_wall_secs": best[c]["pipeline_wall_secs"],
                "best_rows_per_sec": best[c]["rows_per_sec"],
            }
            for c in (n, n4)
        },
        "speedup": round(thr_4n / thr_n, 3),
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8 between N and 4N parallelism",
        "pass": bool(eff >= 0.8),
        "all_runs": runs,
        "best_calibration_secs": round(best_cal, 3),
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "all_runs"}))
    print(
        f"\n| level | best wall (s) | rows/s |\n|---|---|---|\n"
        f"| local[{n}] | {best[n]['pipeline_wall_secs']} | {thr_n} |\n"
        f"| local[{n4}] | {best[n4]['pipeline_wall_secs']} | {thr_4n} |\n"
        f"\nspeedup {n}→{n4}: {report['speedup']}× — efficiency {report['scaling_efficiency']}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
