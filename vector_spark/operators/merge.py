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
        # discriminant fields absent from the frame can't discriminate —
        # the reference's Discriminant::from_log_event treats a missing
        # field as None for every event (merge_state.rs), i.e. one stream
        discriminant = [c for c in self.discriminant if c in df.columns]
        order_by = self.order_by
        if order_by not in df.columns and "__arrival" in df.columns:
            order_by = "__arrival"  # behavior-test arrival sequence
        try:
            marker_col = F.col(self.marker)
            df.select(marker_col)  # probe: marker may be absent entirely
        except Exception:
            marker_col = F.lit(None).cast("boolean")
        is_final = ~F.coalesce(marker_col.cast("boolean"), F.lit(False))
        # segment id: count of terminators from this row to stream end —
        # all partials in a run share the id of their terminating final
        # row. Expressed as a DESCENDING running sum: Spark executes
        # [unboundedPreceding, currentRow] frames incrementally (O(n)),
        # while the equivalent [currentRow, unboundedFollowing] frame
        # re-scans the tail per row (O(n²) per partition).
        w = (
            Window.partitionBy(*discriminant)
            .orderBy(F.col(order_by).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        seg = F.sum(is_final.cast("long")).over(w)
        with_seg = df.withColumn("__seg", seg).withColumn("__final", is_final)
        alias_of = {
            f: f"__mf_{i}" if "." in f else f for i, f in enumerate(self.merge_fields)
        }
        ordered = F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_by).alias("o"),
                    *[F.col(f).alias(alias_of[f]) for f in self.merge_fields],
                )
            )
        )
        # dotted fields keep placeholder aliases throughout (a flat column
        # literally named "a.b" is ambiguous with the path a.b) and
        # re-nest in the final select
        def _getter(name):  # one-arg lambda per field (higher-order fn arity)
            return lambda p: p[name]

        aggs = [
            F.array_join(F.transform(ordered, _getter(alias_of[f])), "").alias(alias_of[f])
            for f in self.merge_fields
        ]
        merged = (
            with_seg.filter(F.col("__seg").isNotNull() & (F.col("__seg") > 0))
            .groupBy(*discriminant, "__seg")
            .agg(
                *aggs,
                F.max(order_by).alias(order_by),
                F.count(F.lit(1)).alias("n_parts"),
                F.max(F.col("__final").cast("int")).alias("__has_final"),
            )
        )
        # trailing partials with no terminator stay buffered in Vector —
        # in batch we emit only terminated segments
        merged = merged.filter(F.col("__has_final") == 1).drop("__has_final", "__seg")
        dotted = {f: a for f, a in alias_of.items() if f != a}
        if dotted:  # merged fields insert back by PATH (merge.rs fields)
            from vector_spark.operators.remap import nest_outputs

            keep = [c for c in merged.columns if c not in dotted.values()]
            outs = nest_outputs(merged, {f: merged[a] for f, a in dotted.items()})
            merged = merged.select(
                *[merged[c] for c in keep],
                *[c.alias(n) for n, c in outs.items()],
            )
        return merged
