"""`dedupe` transform: drop events whose key was already seen.

Reference: /root/reference/src/transforms/dedupe.rs:33-58 (match/ignore
field config, defaults [timestamp, host, message]), :126-129 (type-aware
key), :155-163 (LRU kernel, cache.num_events=5000).

Spark mapping: the LRU window is a single-node streaming artifact; the
distributed equivalents we provide are
- exact batch dedupe: first-by-order within key via row_number (keeps the
  EARLIEST event per key — Vector keeps the first seen, so order_by must
  be the event-time/arrival column), or dropDuplicates when "which
  survivor" doesn't matter;
- streaming: dropDuplicatesWithinWatermark (operators in streaming/).

The wide shuffle hashes only the key columns; at 100 TB the win is to
pre-partition the table by the dedupe key so AQE turns this into a
mostly-local exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform

DEFAULT_MATCH_FIELDS = ["ts", "host", "message"]  # Vector defaults: timestamp, host, message


def typed_key(col) -> "F.Column":
    """Vector's dedupe key is (type-tag, bytes) — string "1" ≠ int 1
    (dedupe.rs:126-129). In a fixed-schema DataFrame every column has
    exactly one type, so the tag is implied by the schema and plain
    column keys already satisfy the contract. For a DYNAMIC column
    (variant / parsed-JSON string that may hold either), wrap it with
    this helper to restore the type tag explicitly."""
    return F.struct(F.typeof(col).alias("t"), col.cast("string").alias("v"))


class Dedupe(Transform):
    def __init__(
        self,
        match: list[str] | None = None,
        ignore: list[str] | None = None,
        order_by: str | None = None,
        tiebreak: str | None = None,
    ):
        if match and ignore:
            raise ValueError("dedupe: `match` and `ignore` are mutually exclusive (dedupe.rs:33-58)")
        self.match, self.ignore = match, ignore
        self.order_by, self.tiebreak = order_by, tiebreak

    def key_columns(self, df: DataFrame) -> list[str]:
        if self.ignore is not None:
            return [c for c in df.columns if c not in self.ignore]
        return self.match or [c for c in DEFAULT_MATCH_FIELDS if c in df.columns]

    def apply(self, df: DataFrame) -> DataFrame:
        keys = self.key_columns(df)
        if self.order_by is None:
            return df.dropDuplicates(keys)
        order = [F.col(self.order_by)]
        if self.tiebreak:
            order.append(F.col(self.tiebreak))
        w = Window.partitionBy(*keys).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
