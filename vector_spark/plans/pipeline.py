"""The flagship topology: source → parse (remap) → enrich → route →
per-sink aggregate, per BASELINE.json north_star.

This is Vector's `syslog_regex_logs2metric_ddmetrics` soak shape
(/root/reference/soaks/README.md:13) rebuilt Spark-first:
  * parse     — format-dispatched remap (grok/apache/json/logfmt) as one
                codegen'd projection; the original row always survives a
                parse failure (remap.rs:134-173 semantics)
  * enrich    — broadcast hash join on `source` (enrichment-table contract)
  * route     — parallel lane predicates over ONE persisted DataFrame
                (multi-match, route.rs:101-120)
  * aggregate — per-lane groupBy(source, severity).agg(count, sum(n_tok))
                with map-side partial agg; salted two-phase variant for
                the Zipf-hot `source` key

Invariant: NO stage reads or writes `tokens` except the final sink
projection — column pruning keeps the token arrays out of every shuffle
(the single most important 100 TB design choice: metrics stages move
kilobytes, not the corpus).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.corpus import STATUS_TO_SEVERITY
from vector_spark.functions import grok as grok_mod
from vector_spark.functions import parse as parse_fns

GROK_LINE = "%{TIMESTAMP_ISO8601:g_ts} %{LOGLEVEL:g_level} %{GREEDYDATA:g_msg}"
APACHE_RX = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\w+) (\S+) HTTP/([0-9.]+)" (\d+) (\d+)'
)
JSON_SCHEMA = "severity string, component string, latency_ms long, ts string"


def parse_stage(df: DataFrame, message_col: str = "message") -> DataFrame:
    """Normalize the 4 wire formats (FIXTURES F2) into
    (severity, component, latency_ms, event_ts) — all vectorized Spark
    expressions; format dispatch is cheap prefix/regex probes, and every
    branch is computed columnar with coalesce picking the winner."""
    msg = F.col(message_col)

    is_json = msg.startswith("{")
    json_parsed = parse_fns.parse_json(msg, JSON_SCHEMA)

    is_apache = msg.rlike(APACHE_RX)
    apache_status = F.regexp_extract(msg, APACHE_RX, 8).cast("int")
    status_to_sev = F.create_map(
        *[x for code, sev in STATUS_TO_SEVERITY.items() for x in (F.lit(code), F.lit(sev))]
    )
    apache_sev = F.element_at(status_to_sev, apache_status)
    apache_component = F.regexp_extract(F.regexp_extract(msg, APACHE_RX, 6), r"/api/v1/(\w+)", 1)
    apache_ts = F.try_to_timestamp(F.regexp_extract(msg, APACHE_RX, 4), F.lit("dd/MMM/yyyy:HH:mm:ss Z"))

    is_logfmt = msg.startswith("level=")
    logfmt_map = parse_fns.parse_key_value(msg)

    grok_caps = grok_mod.grok_extract(msg, GROK_LINE)
    grok_kv = parse_fns.parse_key_value(grok_caps["g_msg"])

    severity = F.upper(
        F.when(is_json, json_parsed["severity"])
        .when(is_apache, apache_sev)
        .when(is_logfmt, F.element_at(logfmt_map, "level"))
        .otherwise(grok_caps["g_level"])
    )
    component = (
        F.when(is_json, json_parsed["component"])
        .when(is_apache, apache_component)
        .when(is_logfmt, F.element_at(logfmt_map, "component"))
        .otherwise(F.element_at(grok_kv, "component"))
    )
    latency = (
        F.when(is_json, json_parsed["latency_ms"])
        .when(is_apache, (F.regexp_extract(msg, APACHE_RX, 9).cast("long") - 200) / 10)
        .when(is_logfmt, F.element_at(logfmt_map, "latency_ms").cast("long"))
        .otherwise(F.element_at(grok_kv, "latency_ms").cast("long"))
    ).cast("long")
    event_ts = (
        F.when(is_json, F.try_to_timestamp(json_parsed["ts"], F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
        .when(is_apache, apache_ts)
        .when(is_logfmt, F.try_to_timestamp(F.element_at(logfmt_map, "ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
        .otherwise(F.try_to_timestamp(grok_caps["g_ts"], F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")))
    )
    parse_ok = severity.isNotNull()

    return df.select(
        "*",
        severity.alias("severity"),
        component.alias("component"),
        latency.alias("latency_ms_parsed"),
        event_ts.alias("event_ts"),
        parse_ok.alias("parse_ok"),
    )


def lanes() -> dict[str, Column]:
    """FIXTURES F4 route lanes — deliberately overlapping (multi-match)."""
    return {
        "errors": F.col("severity").isin("ERROR", "FATAL"),
        "bigdocs": F.col("n_tok") >= 256,
        "webish": F.col("source").isin("web", "proxy"),
    }


def sink_aggregate(lane_df: DataFrame) -> DataFrame:
    """Per-sink metric stage (north_star): count + sum(n_tok) by
    (source, severity). One exchange, map-side combined."""
    return lane_df.groupBy("source", "severity").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_tok").alias("sum_n_tok"),
    )


def salted_sink_aggregate(lane_df: DataFrame, buckets: int = 16, extra_keys: list[str] | None = None) -> DataFrame:
    """Two-phase salted aggregation for the Zipf-hot `source` key
    (SURVEY.md §7 step 7): salt → partial agg (spreads the hot key over
    `buckets` reducers) → final agg on the tiny partial table. For
    algebraic aggs Spark's map-side combine already bounds reducer skew;
    the salted form is the general pattern for when partial agg can't
    help (collect-heavy or high-cardinality-amplified keys)."""
    keys = list(extra_keys or []) + ["source", "severity"]
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(buckets)).alias("__salt")
    partial = lane_df.groupBy(*keys, salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("n_tok").alias("pt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("pn").alias("n_events"),
        F.sum("pt").alias("sum_n_tok"),
    )


@dataclass
class PipelineResult:
    lane_counts: dict[str, int] = field(default_factory=dict)
    metrics: dict[str, list] = field(default_factory=dict)
    wall_secs: float = 0.0
    rows_in: int = 0

    @property
    def rows_routed(self) -> int:
        return sum(self.lane_counts.values())


def run_pipeline(
    spark: SparkSession,
    df: DataFrame,
    enrichment: DataFrame | None = None,
    out_dir: str | None = None,
    salted: bool = True,
    with_unmatched: bool = True,
    sink_layout: str = "fanout",
    sink=None,
) -> PipelineResult:
    """Execute the full topology.

    out_dir=None → metrics-only, computed in a SINGLE pass (tagged route
    → one two-phase aggregation): no persist, no per-lane jobs, one
    shuffle of partial aggregates.

    out_dir set → routed rows land as parquet (Iceberg-layout stand-in)
    plus per-sink metric tables, in one of two layouts:
      - ``fanout`` (default): one independent tree per lane
        (`lane=<x>/{data,metrics}`) from a persisted parse — Vector's
        separate-sinks contract verbatim; K write jobs.
      - ``tagged``: ONE pass writes a single table partitioned by
        (lane, source) plus one metrics table — same routed rows
        (multi-match rows appear once per matching lane partition), but
        the corpus is scanned once and nothing is persisted. The right
        shape when all sinks share a format at 100 TB.
    """
    from vector_spark.enrich import EnrichmentTable
    from vector_spark.operators.route import Route
    from vector_spark.sinks.writer import ParquetSink

    if sink is None:
        sink = ParquetSink()
    t0 = time.time()
    parsed = parse_stage(df)
    if enrichment is not None:
        et = EnrichmentTable(enrichment, keys=["source"])
        parsed = et.enrich(parsed)

    router = Route(lanes(), with_unmatched=with_unmatched)

    if out_dir and sink_layout == "tagged":
        tagged = router.tagged(parsed).drop("parse_ok")
        sink.write(tagged, f"{out_dir}/data", ["lane", "source"])
        agg = (
            salted_sink_aggregate(tagged, extra_keys=["lane"])
            if salted
            else tagged.groupBy("lane", "source", "severity").agg(
                F.count(F.lit(1)).alias("n_events"), F.sum("n_tok").alias("sum_n_tok")
            )
        )
        # one aggregate job: collect the (tiny) result, then write the
        # metrics table from the collected rows — the tagged DAG is not
        # rebuilt from the source for a second action
        agg_rows = agg.collect()
        metrics_df = spark.createDataFrame(agg_rows, agg.schema)
        sink.write(metrics_df, f"{out_dir}/metrics", ["lane"])
        result = PipelineResult()
        for r in agg_rows:
            result.lane_counts[r["lane"]] = result.lane_counts.get(r["lane"], 0) + r["n_events"]
            result.metrics.setdefault(r["lane"], []).append(
                (r["source"], r["severity"], r["n_events"], r["sum_n_tok"])
            )
        for lane in result.metrics:
            result.metrics[lane].sort()
        result.wall_secs = time.time() - t0
        return result

    if not out_dir:
        # single-pass metrics: explode matched-lane tags, then aggregate
        # (lane, source, severity) with an optional salted first phase.
        # The corpus is read once; only partial-agg rows ever shuffle.
        tagged = router.tagged(parsed.drop("tokens", "message"))
        keys = ["lane", "source", "severity"]
        if salted:
            salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(16)).alias("__salt")
            partial = tagged.groupBy(*keys, salt).agg(
                F.count(F.lit(1)).alias("pn"), F.sum("n_tok").alias("pt")
            )
            final = partial.groupBy(*keys).agg(
                F.sum("pn").alias("n_events"), F.sum("pt").alias("sum_n_tok")
            )
        else:
            final = tagged.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n_events"), F.sum("n_tok").alias("sum_n_tok")
            )
        result = PipelineResult()
        for r in final.collect():
            result.lane_counts[r["lane"]] = result.lane_counts.get(r["lane"], 0) + r["n_events"]
            result.metrics.setdefault(r["lane"], []).append(
                (r["source"], r["severity"], r["n_events"], r["sum_n_tok"])
            )
        for lane in result.metrics:
            result.metrics[lane].sort()
        result.wall_secs = time.time() - t0
        return result

    # sink mode: fan-out reads `parsed` once per lane; persist so
    # parse+enrich run once across the K lane writes
    parsed = parsed.persist()
    try:
        routed = router.apply(parsed)
        result = PipelineResult()
        # rows_in from the cached parse — no second scan of the input
        # (checkpoint.py consumes this instead of re-counting)
        result.rows_in = parsed.count()
        for name, lane_df in routed.items():
            agg = salted_sink_aggregate(lane_df) if salted else sink_aggregate(lane_df)
            sink.write(lane_df.drop("parse_ok"), f"{out_dir}/lane={name}/data", ["source"])
            sink.write(agg, f"{out_dir}/lane={name}/metrics")
            # counts come from the (small) metric table, not a sink
            # re-read: an empty lane writes no parquet footers at all
            rows = agg.collect()
            result.lane_counts[name] = sum(r["n_events"] for r in rows)
            result.metrics[name] = sorted((r["source"], r["severity"], r["n_events"], r["sum_n_tok"]) for r in rows)
        result.wall_secs = time.time() - t0
        return result
    finally:
        parsed.unpersist()
