"""`metric_to_log`: serialize a Metric row to a structured log event.

Reference: /root/reference/src/transforms/metric_to_log.rs:18-21, 113 —
the metric is serialized to its JSON shape and re-read as a LogEvent;
the `host` tag is promoted to the log's host field.

Spark: to_json(struct(...)) projection + tag promotion. Narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


class MetricToLog(Transform):
    def __init__(self, host_tag: str = "host", timestamp_col: str = "ts"):
        self.host_tag, self.timestamp_col = host_tag, timestamp_col

    def apply(self, df: DataFrame) -> DataFrame:
        payload = F.struct(*[F.col(c) for c in df.columns])
        return df.select(
            F.to_json(payload).alias("message"),
            F.element_at(F.col("tags"), self.host_tag).alias("host"),
            F.col(self.timestamp_col).alias("ts"),
            F.lit("metric_to_log").alias("source_type"),
        )
