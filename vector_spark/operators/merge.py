"""`merge`: reassemble partial events into whole ones.

Reference: /root/reference/src/transforms/merge.rs:18-28, 148 and
/root/reference/lib/vector-core/src/event/merge_state.rs — events carry a
`_partial` marker; partials buffer per stream discriminant until a
non-partial event arrives, concatenating `merge_fields` in order.

Spark (batch): segmentation by "the next non-partial row terminates the
run". With an order column, each row's segment id = the number of
non-partial rows at-or-before it counted from the END — implemented as a
reverse cumulative sum window; then groupBy(discriminant, segment) and
concat in order. Wide (one shuffle on the discriminant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


class MergePartials(Transform):
    def __init__(
        self,
        merge_fields: list[str],
        stream_discriminant: list[str] = ("host",),
        partial_marker: str = "_partial",
        order_by: str = "ts",
    ):
        self.merge_fields = list(merge_fields)
        self.discriminant = list(stream_discriminant)
        self.marker = partial_marker
        self.order_by = order_by

    def apply(self, df: DataFrame) -> DataFrame:
        is_final = ~F.coalesce(F.col(self.marker), F.lit(False))
        # segment id: count of terminators from this row to stream end —
        # all partials in a run share the id of their terminating final
        # row. Expressed as a DESCENDING running sum: Spark executes
        # [unboundedPreceding, currentRow] frames incrementally (O(n)),
        # while the equivalent [currentRow, unboundedFollowing] frame
        # re-scans the tail per row (O(n²) per partition).
        w = (
            Window.partitionBy(*self.discriminant)
            .orderBy(F.col(self.order_by).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        seg = F.sum(is_final.cast("long")).over(w)
        with_seg = df.withColumn("__seg", seg).withColumn("__final", is_final)
        ordered = F.sort_array(
            F.collect_list(
                F.struct(F.col(self.order_by).alias("o"), *[F.col(f).alias(f) for f in self.merge_fields])
            )
        )
        aggs = [
            F.array_join(F.transform(ordered, lambda p: p[f]), "").alias(f) for f in self.merge_fields
        ]
        merged = (
            with_seg.filter(F.col("__seg").isNotNull() & (F.col("__seg") > 0))
            .groupBy(*self.discriminant, "__seg")
            .agg(
                *aggs,
                F.max(self.order_by).alias(self.order_by),
                F.count(F.lit(1)).alias("n_parts"),
                F.max(F.col("__final").cast("int")).alias("__has_final"),
            )
        )
        # trailing partials with no terminator stay buffered in Vector —
        # in batch we emit only terminated segments
        return merged.filter(F.col("__has_final") == 1).drop("__has_final", "__seg")
