"""`aggregate` transform: metric roll-up over tumbling flush intervals.

Reference: /root/reference/src/transforms/aggregate.rs:18-26 (interval_ms
config, default 10s), :72-107 (record/flush kernel), merge math
/root/reference/lib/vector-core/src/event/metric.rs:605-622:
- Incremental metrics fold: counters add, gauges add, sets union,
  distribution samples concat, histogram buckets add element-wise,
  timestamp = max.
- Absolute metrics: last-write-wins per series.

Metric data model (metric.rs:18-30, 103-106, 138-169) as a DataFrame:
    name string, namespace string, tags map<string,string>,
    ts timestamp, kind string ('incremental'|'absolute'),
    value_type string ('counter'|'gauge'|'set'|...), value double,
    set_values array<string>   -- only for value_type='set'

Spark: groupBy(series key [, window(ts, interval)]).agg(...). The series
key includes the tags map — we canonicalize it to a sorted string so the
shuffle hashes a scalar, mirroring Vector's MetricSeries BTreeMap-ordered
identity. Partial aggregation (map-side combine) keeps the shuffle small:
this is the flagship per-sink stage and must stay one exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


def series_key(tags: Column) -> Column:
    """Canonical tag identity: sorted k=v list (BTreeMap order parity)."""
    entries = F.map_entries(tags)
    kv = F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"]))
    return F.array_join(F.sort_array(kv), ",")


class Aggregate(Transform):
    def __init__(self, interval: str | None = None, ts_col: str = "ts"):
        """interval: Spark window duration string ('10 seconds'); None =
        single global flush (Vector's behavior when the batch spans one
        interval)."""
        self.interval, self.ts_col = interval, ts_col

    def apply(self, df: DataFrame) -> DataFrame:
        keys = [
            F.col("name"),
            F.col("namespace"),
            series_key(F.col("tags")).alias("series_tags"),
            F.col("kind"),
            F.col("value_type"),
        ]
        if self.interval is not None:
            keys.append(F.window(F.col(self.ts_col), self.interval).alias("window"))
        inc = F.col("kind") == "incremental"
        counterish = F.col("value_type").isin("counter", "gauge")
        merged_value = F.when(inc & counterish, F.sum("value")).otherwise(
            F.max_by(F.col("value"), F.col(self.ts_col))  # absolute: last-write-wins
        )
        return df.groupBy(*keys).agg(
            merged_value.alias("value"),
            F.array_distinct(F.flatten(F.collect_list("set_values"))).alias("set_values")
            if "set_values" in df.columns
            else F.lit(None).cast("array<string>").alias("set_values"),
            F.max(self.ts_col).alias("ts"),  # merged timestamp = max (metric.rs:605-622)
            F.count(F.lit(1)).alias("n_merged"),
        )
