"""`metric_to_log`: serialize a Metric row to a structured log event.

Reference: /root/reference/src/transforms/metric_to_log.rs:18-21, 113 —
the metric is serialized to its JSON shape and re-read as a LogEvent;
the `host` tag is promoted to the log's host field.

Spark: a canonical-JSON projection + tag promotion. Narrow (no shuffle).

The message is CANONICAL by construction — fixed field order
(name, namespace, tags, ts, kind, value_type, value[, set_values]),
tags sorted by key, timestamps as unix microseconds, doubles as %.4f —
rather than engine-default ``to_json`` formatting, so any engine
(our DuckDB oracle included) reproduces it byte-for-byte. Null metric
fields never null the whole message: tags coalesce to {}, name to '',
ts to JSON null. Tag keys/values are JSON-escaped (backslash, quote) —
identifier-like values pass through byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


def _esc(c: Column) -> Column:
    """JSON string escape for the two structurally dangerous bytes."""
    return F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), r'"', r'\\"')


def _tags_json(tags: Column) -> Column:
    # null tags serialize as {} (reference: a metric without tags still
    # serializes; None tags simply omit entries)
    entries = F.array_sort(F.map_entries(F.coalesce(tags, F.create_map())))
    kv = F.transform(
        entries,
        lambda e: F.concat(
            F.lit('"'), _esc(e["key"]), F.lit('":"'), _esc(e["value"]), F.lit('"')
        ),
    )
    return F.concat(F.lit("{"), F.concat_ws(",", kv), F.lit("}"))


class MetricToLog(Transform):
    def __init__(self, host_tag: str = "host", timestamp_col: str = "ts"):
        self.host_tag, self.timestamp_col = host_tag, timestamp_col

    def apply(self, df: DataFrame) -> DataFrame:
        def col_or(name: str, default: str) -> Column:
            return F.col(name) if name in df.columns else F.lit(default)

        ts_us = F.unix_micros(F.col(self.timestamp_col).cast("timestamp"))
        val_json = (
            F.when(F.col("value").isNotNull(), F.format_string("%.4f", F.col("value")))
            .otherwise(F.lit("null"))
            if "value" in df.columns
            else F.lit("null")
        )
        if "set_values" in df.columns:
            sets_json = F.when(
                F.col("set_values").isNotNull(),
                F.concat(
                    F.lit(',"set_values":['),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.col("set_values"),
                            lambda v: F.concat(F.lit('"'), v, F.lit('"')),
                        ),
                    ),
                    F.lit("]"),
                ),
            ).otherwise(F.lit(""))
        else:
            sets_json = F.lit("")
        message = F.concat(
            F.lit('{"name":"'), _esc(F.coalesce(F.col("name"), F.lit(""))),
            F.lit('","namespace":"'), F.coalesce(col_or("namespace", "vector"), F.lit("vector")),
            F.lit('","tags":'), _tags_json(F.col("tags")),
            F.lit(',"ts":'), F.coalesce(ts_us.cast("string"), F.lit("null")),
            F.lit(',"kind":"'), F.coalesce(col_or("kind", "absolute"), F.lit("absolute")),
            F.lit('","value_type":"'), F.coalesce(col_or("value_type", "gauge"), F.lit("gauge")),
            F.lit('","value":'), val_json,
            sets_json,
            F.lit("}"),
        )
        return df.select(
            message.alias("message"),
            F.element_at(F.col("tags"), self.host_tag).alias("host"),
            ts_us.alias("ts_us"),
            F.lit("metric_to_log").alias("source_type"),
        )
