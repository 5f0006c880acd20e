"""vector_spark — a from-scratch PySpark-native rebuild of the Vector
(timberio/vector, snapshot at /root/reference) observability pipeline.

Vector is a per-event streaming dataflow engine (sources → transforms →
sinks, each a tokio task connected by channels). This package keeps its
*semantics* — the operator inventory, data model, routing and aggregation
contracts catalogued in SURVEY.md — and re-expresses the *execution* as
idiomatic Spark: DataFrames + Spark SQL expressions (whole-stage codegen),
vectorized pandas/Arrow UDFs only where procedural logic is unavoidable,
broadcast hash joins for enrichment tables, predicate fan-out over one
cached DataFrame for `route`, and partitioned columnar sinks.

Layout:
  session     — tuned SparkSession builder (AQE, UTC, Arrow)
  corpus      — deterministic synthetic tokenized-log corpus (the
                `(doc_id, tokens, n_tok, source)` table from BASELINE.json)
  functions/  — VRL-stdlib → Column translation layer (parse_*, grok, ...)
  operators/  — the 30+ Vector transforms as DataFrame stages
  plans/      — topology compiler: config dict → DAG → execution
  sources/ sinks/ — scan & partitioned-write surface + checkpointing
  streaming/  — Structured Streaming variants (windowed aggregate, dedupe)
  training/   — large-scale training-data ops (dedup, ANN, text quality)
"""

__version__ = "0.1.0"

from vector_spark.session import get_spark  # noqa: F401
