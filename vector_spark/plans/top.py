"""`vector top` analogue: periodic internal-metrics snapshots.

The reference's `vector top` TUI (src/top/) polls the GraphQL API
(src/api/) for per-component cumulative event totals and rates, fed by
the internal-events instrumentation (src/internal_events/). The batch
analogue here: the topology run records per-component cumulative output
rows into a TopMonitor, which emits numbered Prometheus
text-exposition snapshots (functions/metrics_codec.py
encode_prometheus — the same encoder the prometheus_exporter sink
half uses), i.e. the node-exporter textfile-collector shape of the same
telemetry:

    vector_component_sent_events_total{component="a"} 12345
    vector_component_sent_rows_per_second{component="a"} 417.2
    vector_uptime_seconds 3.41

Snapshots fire (a) after every sink completes, so even a pure-batch run
yields a monotone series, and (b) every `interval_secs` from a monitor
thread when the run is long (streaming backlogs). Files are written
atomically (tmp+rename) as top-NNNN.prom so a collector never reads a
torn snapshot.
"""

from __future__ import annotations

import os
import threading
import time


class TopMonitor:
    """Cumulative per-component counters + snapshot writer."""

    def __init__(self, spark, out_dir: str, interval_secs: float | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.interval_secs = interval_secs
        self.counters: dict[str, int] = {}
        self._lock = threading.Lock()
        self._seq = 0
        self._t0 = time.time()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        os.makedirs(out_dir, exist_ok=True)

    def record(self, component: str, rows: int | None) -> None:
        if rows is None:
            return
        with self._lock:
            self.counters[component] = self.counters.get(component, 0) + int(rows)

    def snapshot(self) -> str:
        """Write one exposition snapshot; returns the file path.

        Rendered driver-side with encode_prometheus_py (byte-parity
        mirror of the executor encoder) — a telemetry tick must never
        schedule a Spark job, or the interval thread would contend with
        the data plane it is supposed to observe."""
        from vector_spark.functions.metrics_codec import encode_prometheus_py

        with self._lock:
            counts = dict(self.counters)
            seq = self._seq
            self._seq += 1
        uptime = time.time() - self._t0
        rows = [
            ("vector_component_sent_events_total", float(n), {"component": c})
            for c, n in sorted(counts.items())
        ]
        rows += [
            (
                "vector_component_sent_rows_per_second",
                round(n / uptime, 3) if uptime > 0 else 0.0,
                {"component": c},
            )
            for c, n in sorted(counts.items())
        ]
        rows.append(("vector_uptime_seconds", round(uptime, 3), {}))
        lines = [encode_prometheus_py(n, v, lb) for n, v, lb in rows]
        path = os.path.join(self.out_dir, f"top-{seq:04d}.prom")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
        return path

    @property
    def snapshots_taken(self) -> int:
        with self._lock:
            return self._seq

    # ---- optional periodic thread (long streaming backlogs) ----

    def start(self) -> None:
        if not self.interval_secs:
            return

        def loop():
            while not self._stop.wait(self.interval_secs):
                self.snapshot()

        self._thread = threading.Thread(target=loop, daemon=True, name="vector-top")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.snapshot()  # final snapshot always lands


def parse_snapshot(path: str) -> dict[tuple[str, tuple], float]:
    """Tiny exposition reader for tests/tools: {(name, ((k,v),...)): value}."""
    out: dict[tuple[str, tuple], float] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            head, _, val = line.rpartition(" ")
            if "{" in head:
                name, _, blob = head.partition("{")
                blob = blob.rstrip("}")
                labels = []
                for pair in blob.split(","):
                    if not pair:
                        continue
                    k, _, v = pair.partition("=")
                    labels.append((k, v.strip('"')))
                out[(name, tuple(sorted(labels)))] = float(val)
            else:
                out[(head, ())] = float(val)
    return out
