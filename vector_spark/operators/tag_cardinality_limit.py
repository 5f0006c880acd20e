"""`tag_cardinality_limit`: cap per-tag-key value cardinality.

Reference: /root/reference/src/transforms/tag_cardinality_limit.rs:25-54
(value_limit default 500, mode exact|probabilistic), :220 (drop_tag),
:256 (drop_event). Vector's semantics are first-seen-wins: the first
`limit` distinct values of each tag key are accepted; later new values
trigger the overflow action.

Spark mapping (documented): "first seen" is defined by min event-time per
(key, value) — deterministic in a distributed batch, unlike arrival
order. Values ranked > limit by first-seen time are over-cap:
  drop_tag   → null out the tag for over-cap values
  drop_event → filter the row out
Two shuffles (rank build + broadcast-back); the rank table is tiny
(≤ limit+overflow per key) so the application join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


class TagCardinalityLimit(Transform):
    def __init__(self, tag: str, value_limit: int = 500, action: str = "drop_tag", ts_col: str = "ts"):
        assert action in ("drop_tag", "drop_event")
        self.tag, self.value_limit, self.action, self.ts_col = tag, value_limit, action, ts_col

    def apply(self, df: DataFrame) -> DataFrame:
        first_seen = df.groupBy(self.tag).agg(F.min(self.ts_col).alias("__first_ts"))
        w = Window.orderBy(F.col("__first_ts").asc(), F.col(self.tag).asc())
        accepted = (
            first_seen.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= self.value_limit)
            .select(self.tag)
        )
        if self.action == "drop_event":
            return df.join(F.broadcast(accepted), on=self.tag, how="left_semi")
        flagged = df.join(
            F.broadcast(accepted.withColumn("__ok", F.lit(True))), on=self.tag, how="left"
        )
        return flagged.withColumn(
            self.tag, F.when(F.col("__ok"), F.col(self.tag)).otherwise(F.lit(None))
        ).drop("__ok")
