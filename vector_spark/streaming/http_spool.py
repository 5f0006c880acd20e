"""HTTP server sources via the landing-zone (spool) pattern.

Vector's `http`, `heroku_logs`/logplex, `splunk_hec` and `datadog_agent`
sources (/root/reference/src/sources/{http.rs,heroku_logs.rs,
splunk_hec/mod.rs,datadog_agent.rs}) are HTTP listeners that decode each
request body into events. Spark has no server sources — and at scale
nobody points producers at an executor: the production shape is a thin
I/O-only listener fleet writing request bodies to an object-store
prefix, which Spark's incremental file stream consumes. This module IS
that pattern, sized for one process:

- `HttpSpoolServer`: a stdlib HTTP listener that writes every POST body
  ATOMICALLY into a spool directory (tmp-file + rename, the same
  visibility trick as sinks/checkpoint.py) and answers 200. No parsing
  in the hot path — decode belongs to the stream side.
- `http_spool_stream`: the matching incremental reader — one event per
  newline-framed body line, decoded downstream by the shared codec
  layer (functions/parse.py: parse_logplex, parse_splunk_hec,
  parse_datadog_agent, plain json...).

Scale-out = N listeners behind a load balancer writing to one prefix;
the Spark side is unchanged (file-source listing + checkpoint gives
exactly-once over whatever the fleet lands).
"""

from __future__ import annotations

import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class HttpSpoolServer:
    """Minimal ingestion listener: POST /<anything> lands the body as
    one spool file. I/O-only by design; keep it thin."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool = Path(spool_dir)
        self.spool.mkdir(parents=True, exist_ok=True)
        spool = self.spool

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib naming
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                tmp = spool / f".{uuid.uuid4().hex}.tmp"
                tmp.write_bytes(body)
                tmp.rename(spool / f"{uuid.uuid4().hex}.txt")  # atomic visibility
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")

            def log_message(self, *a):  # silence per-request stderr noise
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "HttpSpoolServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def http_spool_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Incremental reader over the spool: one row per newline-framed
    body line (`value: string`), exactly-once via the file-source
    checkpoint — run with trigger(availableNow=True) for catch-up or a
    processing-time trigger for tailing."""
    return spark.readStream.text(f"{spool_dir}/*.txt")
