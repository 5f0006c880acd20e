"""`reduce` transform: multi-event collapse with per-field merge strategies.

Reference: /root/reference/src/transforms/reduce/mod.rs:26-43, 103-132,
221-257; strategies /root/reference/src/transforms/reduce/merge_strategy.rs:9-21:
Discard Retain Sum Max Min Array Concat ConcatNewline ConcatRaw
ShortestArray LongestArray FlatUnique.

Spark mapping: groupBy(group_by).agg(per-field agg map). Order-sensitive
strategies (Discard=first-seen, Retain=last-seen, Concat in arrival
order) need an explicit order column — Vector relies on stream arrival
order, which doesn't exist in a distributed batch; we use an `order_by`
column (event time) and min_by/max_by/sorted collect. Partial (map-side)
aggregation applies to sum/max/min automatically; collect_list-based
strategies shuffle full values — at scale prefer Sum/Max/Min or bound
group size upstream.

Session semantics (`expire_after_ms` windows) → streaming
session_window / applyInPandasWithState in streaming/reduce_stream.py;
batch mode collapses to one aggregation per key like Vector's final
flush.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


def strategy_agg(name: str, field: str, order_by: str) -> Column:
    """One merge strategy → one aggregate expression (aliased to field)."""
    c, o = F.col(field), F.col(order_by)
    table = {
        "discard": lambda: F.min_by(c, o),  # keep first event's value
        "retain": lambda: F.max_by(c, o),  # keep last event's value
        "sum": lambda: F.sum(c),
        "max": lambda: F.max(c),
        "min": lambda: F.min(c),
        "array": lambda: _ordered_values(c, o),
        "concat": lambda: F.array_join(_ordered_values(c, o), " "),
        "concat_newline": lambda: F.array_join(_ordered_values(c, o), "\n"),
        "concat_raw": lambda: F.array_join(_ordered_values(c, o), ""),
        "shortest_array": lambda: F.min_by(c, F.size(c)),
        "longest_array": lambda: F.max_by(c, F.size(c)),
        "flat_unique": lambda: F.array_distinct(F.flatten(F.collect_list(c))),
    }
    if name not in table:
        raise KeyError(f"unknown merge strategy: {name} (merge_strategy.rs:9-21)")
    return table[name]().alias(field)


def _ordered_values(c: Column, o: Column) -> Column:
    """collect values ordered by the order column (arrival order stand-in).
    sort_array on (order, value) structs keeps the result deterministic
    regardless of partitioning — collect_list alone is not."""
    pairs = F.sort_array(F.collect_list(F.struct(o.alias("o"), c.alias("v"))))
    return F.transform(pairs, lambda p: p["v"])


class Reduce(Transform):
    def __init__(
        self,
        group_by: list[str],
        merge_strategies: dict[str, str],
        order_by: str = "ts",
        count_alias: str = "n_events",
    ):
        self.group_by = group_by
        self.merge_strategies = merge_strategies
        self.order_by = order_by
        self.count_alias = count_alias

    def apply(self, df: DataFrame) -> DataFrame:
        aggs = [strategy_agg(s, f, self.order_by) for f, s in self.merge_strategies.items()]
        aggs.append(F.count(F.lit(1)).alias(self.count_alias))
        return df.groupBy(*self.group_by).agg(*aggs)


class BoundedReduce(Transform):
    """`reduce` with `starts_when`/`ends_when` condition boundaries
    (reduce/mod.rs:221-257): within each group (ordered by `order_by`),
    an event matching `ends_when` CLOSES the current collapse (it is
    merged in, the next event opens a new one); an event matching
    `starts_when` OPENS a new collapse (it is the new first event).

    Plan shape: one window pass computes a cumulative boundary count as
    the segment id — `sum(flag) over (partition by keys order by ts)`
    with the frame ending at the PREVIOUS row for ends_when (inclusive
    close) and at the CURRENT row for starts_when (inclusive open) —
    then the ordinary strategy aggregation groups on (keys, segment).
    The window partitions by the reduce keys, so parallelism is the key
    cardinality (same skew profile as the aggregation itself; no global
    single-partition ordering)."""

    def __init__(
        self,
        group_by: list[str],
        merge_strategies: dict[str, str],
        order_by: str = "ts",
        starts_when: Column | str | None = None,
        ends_when: Column | str | None = None,
        count_alias: str = "n_events",
        segment_alias: str = "segment",
    ):
        if (starts_when is None) == (ends_when is None):
            raise ValueError("exactly one of starts_when / ends_when required")
        self.group_by = group_by
        self.merge_strategies = merge_strategies
        self.order_by = order_by
        self.starts_when = F.expr(starts_when) if isinstance(starts_when, str) else starts_when
        self.ends_when = F.expr(ends_when) if isinstance(ends_when, str) else ends_when
        self.count_alias = count_alias
        self.segment_alias = segment_alias

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window as W

        base = W.partitionBy(*self.group_by).orderBy(self.order_by)
        if self.ends_when is not None:
            flag = self.ends_when.cast("int")
            # boundary counted from the row AFTER the closer
            w = base.rowsBetween(W.unboundedPreceding, -1)
        else:
            flag = self.starts_when.cast("int")
            # the starter itself already belongs to the new segment
            w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        seg = F.coalesce(F.sum(flag).over(w), F.lit(0))
        staged = df.withColumn(self.segment_alias, seg)
        aggs = [strategy_agg(s, f, self.order_by) for f, s in self.merge_strategies.items()]
        aggs.append(F.count(F.lit(1)).alias(self.count_alias))
        return staged.groupBy(*self.group_by, self.segment_alias).agg(*aggs)
