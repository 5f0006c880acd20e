"""`filter` transform: keep event iff condition true.

Reference: /root/reference/src/transforms/filter.rs:12-14, 65-71.
Spark: df.filter(expr) — narrow, codegen'd, pushed into the scan by
Catalyst when the predicate touches only scan columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from vector_spark.operators.base import Transform


class Filter(Transform):
    def __init__(self, condition: Column | str):
        self.condition = condition

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.condition)


class FieldFilter(Transform):
    """Deprecated `field_filter`: keep iff field == value
    (/root/reference/src/transforms/field_filter.rs:9-16)."""

    def __init__(self, field: str, value):
        self.field, self.value = field, value

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(df[self.field] == self.value)
