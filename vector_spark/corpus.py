"""Deterministic synthetic tokenized-log corpus (FIXTURES.md F1/F2).

Rebuilds Vector's ``generator`` source (the synthetic-format corpus at
/root/reference/src/sources/generator.rs:55-69) as pure Spark expressions
over ``spark.range(n)`` — no per-row Python anywhere, so generation is a
narrow, codegen'd stage that scales linearly with cores and rows.

Authoritative table shape (BASELINE.json input_hint):
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string
plus the log-event well-known keys Vector names via LogSchema
(/root/reference/lib/vector-core/src/config/log_schema.rs:9-12):
    ts:timestamp, host:string, message:string
and hidden ground-truth columns (``true_severity``, ``true_component``,
``fmt``) that parser tests compare against but the pipeline must not read.

Everything is a deterministic function of the row index ``i`` and ``seed``
(xxhash64-based), so the same (n, seed) always produces byte-identical
rows at any parallelism/partitioning — the property the correctness gate
(token-array equality per doc_id) relies on.

``source`` is Zipf-skewed by construction (app≈40%) so the salted
two-phase aggregation path has real skew to chew on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50_257
MAX_TOKENS = 512

# Zipf-ish weights over sources (percent buckets, sums to 100).
SOURCES = [
    ("app", 40), ("web", 20), ("db", 12), ("auth", 9),
    ("cron", 7), ("kernel", 5), ("mail", 4), ("proxy", 3),
]
SEVERITIES = [("DEBUG", 40), ("INFO", 35), ("WARN", 15), ("ERROR", 8), ("FATAL", 2)]
COMPONENTS = ["ingest", "router", "worker", "api", "scheduler", "compactor"]

# Apache-format lines carry severity as an HTTP status (reversible map).
SEVERITY_TO_STATUS = {"DEBUG": 204, "INFO": 200, "WARN": 429, "ERROR": 500, "FATAL": 503}
STATUS_TO_SEVERITY = {v: k for k, v in SEVERITY_TO_STATUS.items()}

EPOCH = "2026-01-01 00:00:00"


def _hmod(i: Column, salt: str, mod: int, seed: int) -> Column:
    """Deterministic uniform draw in [0, mod) from (i, salt, seed)."""
    return F.pmod(F.xxhash64(i, F.lit(salt), F.lit(seed)), F.lit(mod))


def _weighted_pick(draw: Column, table: list[tuple[str, int]]) -> Column:
    """Map a uniform [0,100) draw to a weighted categorical value."""
    expr = None
    upper = 0
    for name, weight in table:
        upper += weight
        cond = draw < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(table[-1][0]))


def sequences(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """The primary input table, deterministic in (n, seed)."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    n_tok = (F.lit(1) + _hmod(i, "len", MAX_TOKENS, seed)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: F.pmod(F.xxhash64(i, j, F.lit(seed)), F.lit(VOCAB_SIZE)).cast("int"),
    )
    source = _weighted_pick(_hmod(i, "src", 100, seed), SOURCES)
    severity = _weighted_pick(_hmod(i, "sev", 100, seed), SEVERITIES)
    component = F.element_at(
        F.array(*[F.lit(c) for c in COMPONENTS]), (_hmod(i, "cmp", len(COMPONENTS), seed) + 1).cast("int")
    )
    latency = _hmod(i, "lat", 500, seed)
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(EPOCH)) + i)

    df = rng.select(
        F.format_string("doc-%012d", i).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        ts.alias("ts"),
        F.format_string("host-%d", F.pmod(i, F.lit(97))).alias("host"),
        severity.alias("true_severity"),
        component.alias("true_component"),
        latency.alias("latency_ms"),
        F.pmod(i, F.lit(4)).cast("int").alias("fmt"),
    )
    return df.withColumn("message", _render_message(df))


def _render_message(df: DataFrame) -> Column:
    """Render `message` in one of 4 formats chosen by ``fmt`` (FIXTURES F2)."""
    sev, comp, lat = F.col("true_severity"), F.col("true_component"), F.col("latency_ms")
    iso_ts = F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")

    # 1. syslog-ish / grok target: "<iso ts> <level> component=<c> latency_ms=<n> processed doc"
    grok_line = F.format_string(
        "%s %s component=%s latency_ms=%d processed doc", iso_ts, F.lower(sev), comp, lat
    )

    # 2. Apache common log; severity encoded as status
    status = sev  # map severity -> status code
    status_expr = None
    for s, code in SEVERITY_TO_STATUS.items():
        cond = status == F.lit(s)
        status_expr = F.when(cond, F.lit(code)) if status_expr is None else status_expr.when(cond, F.lit(code))
    apache_ts = F.date_format(F.col("ts"), "dd/MMM/yyyy:HH:mm:ss")
    apache_line = F.format_string(
        '10.0.%d.%d - user%d [%s +0000] "GET /api/v1/%s HTTP/1.1" %d %d',
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit("ip1")), F.lit(256)),
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit("ip2")), F.lit(256)),
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit("user")), F.lit(50)),
        apache_ts,
        comp,
        status_expr,
        lat * 10 + 200,
    )

    # 3. JSON object
    json_line = F.format_string(
        '{"severity":"%s","component":"%s","latency_ms":%d,"ts":"%s"}', sev, comp, lat, iso_ts
    )

    # 4. logfmt
    logfmt_line = F.format_string(
        'level=%s component=%s latency_ms=%d ts=%s msg="processed doc"', F.lower(sev), comp, lat, iso_ts
    )

    f = F.col("fmt")
    return (
        F.when(f == 0, grok_line)
        .when(f == 1, apache_line)
        .when(f == 2, json_line)
        .otherwise(logfmt_line)
    )


def enrichment_table(spark: SparkSession) -> DataFrame:
    """Dimension table keyed (uniquely) by ``source`` — FIXTURES F3.

    Mirrors Vector's enrichment-table CSV semantics
    (/root/reference/src/enrichment_tables/file.rs:14-44): a small
    in-memory lookup table; our lookup is a broadcast hash join.
    """
    rows = [
        ("app", "platform", "prod", "us-east-1", 4211),
        ("web", "edge", "prod", "us-east-1", 4212),
        ("db", "storage", "prod", "us-west-2", 4213),
        ("auth", "identity", "prod", "eu-west-1", 4214),
        ("cron", "platform", "staging", "us-east-1", 4215),
        ("kernel", "infra", "prod", "us-west-2", 4216),
        ("mail", "comms", "staging", "eu-west-1", 4217),
        ("proxy", "edge", "prod", "us-east-1", 4218),
    ]
    return spark.createDataFrame(rows, "source string, team string, tier string, region string, cost_center int")


def write_corpus(spark: SparkSession, n: int, path: str, seed: int = 42) -> None:
    """Materialize the corpus partitioned by the routing key ``source``
    (the Iceberg layout stand-in; partition pruning then serves per-lane
    scans). Parquet fallback — Iceberg jars are absent in this image."""
    sequences(spark, n, seed).write.mode("overwrite").partitionBy("source").parquet(path)
