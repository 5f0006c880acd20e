"""`log_to_metric`: derive metric events from logs.

Reference: /root/reference/src/transforms/log_to_metric.rs:23-79 (config:
counter/gauge/set/histogram/summary, `increment_by_value`, templated
name/namespace/tags), :206+ (to_metric kernel — missing field → skip).

Spark: a projection building metric rows + (usually) the aggregate stage
fused into one groupBy. Our pipeline's per-sink stage is the fused form:
    groupBy(source, severity).agg(count(*), sum(n_tok))
which is exactly Vector's counter-per-log + counter-increment_by_value
pair followed by `aggregate`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


@dataclass
class MetricSpec:
    type: str  # counter | gauge | set | histogram | summary
    field: str  # source log field
    name: str | None = None
    namespace: str = "vector"
    increment_by_value: bool = False  # counters: add field value vs +1
    tags: dict[str, str] = None  # literal or "{{field}}" template values


class LogToMetric(Transform):
    """Emit one metric row per (log, spec): the un-aggregated form.
    Missing/null field → row skipped (log_to_metric.rs kernel)."""

    def __init__(self, specs: list[MetricSpec]):
        self.specs = specs

    def apply(self, df: DataFrame) -> DataFrame:
        branches = []
        for spec in self.specs:
            src = F.col(spec.field)
            name = F.lit(spec.name or spec.field)
            tags = F.map_from_arrays(
                F.array(*[F.lit(k) for k in (spec.tags or {})]),
                F.array(*[_template(v) for v in (spec.tags or {}).values()]),
            )
            if spec.type == "counter":
                value = src.cast("double") if spec.increment_by_value else F.lit(1.0)
                kind = "incremental"
            elif spec.type == "gauge":
                value, kind = src.cast("double"), "absolute"
            elif spec.type in ("histogram", "summary"):
                value, kind = src.cast("double"), "incremental"
            elif spec.type == "set":
                value, kind = F.lit(None).cast("double"), "incremental"
            else:
                raise KeyError(f"unknown metric type {spec.type}")
            row = df.filter(src.isNotNull()).select(
                name.alias("name"),
                F.lit(spec.namespace).alias("namespace"),
                tags.alias("tags"),
                F.col("ts"),
                F.lit(kind).alias("kind"),
                F.lit(spec.type).alias("value_type"),
                value.alias("value"),
                (F.array(src.cast("string")) if spec.type == "set" else F.lit(None).cast("array<string>")).alias(
                    "set_values"
                ),
            )
            branches.append(row)
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out


def _template(v: str):
    """'{{field}}' tag templates → column ref; literals → lit
    (log_to_metric.rs template rendering)."""
    if v.startswith("{{") and v.endswith("}}"):
        return F.col(v[2:-2].strip()).cast("string")
    return F.lit(v)


def sink_metrics(df: DataFrame, keys: list[str] = ("source", "severity"), n_tok: str = "n_tok") -> DataFrame:
    """The fused per-sink metric stage from BASELINE.json north_star:
    groupBy(source, severity).agg(count(*), sum(n_tok)). One shuffle with
    map-side partial aggregation."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(n_tok).alias("sum_n_tok"),
    )
