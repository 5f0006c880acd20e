"""`tag_cardinality_limit`: cap per-tag-key value cardinality.

Reference: /root/reference/src/transforms/tag_cardinality_limit.rs:25-54
(value_limit default 500, mode exact|probabilistic), :220 (drop_tag),
:256 (drop_event). Vector's semantics are first-seen-wins: the first
`limit` distinct values of each tag key are accepted; later new values
trigger the overflow action.

Spark mapping (documented): "first seen" is defined by min event-time per
(key, value) — deterministic in a distributed batch, unlike arrival
order. Values ranked > limit by (first-seen time, value) are over-cap:
  drop_tag   → null out / remove the tag for over-cap values
  drop_event → filter the row out

Scale shape: the accept set is built with ``orderBy(...).limit(k)``,
which Spark plans as TakeOrderedAndProject — per-partition top-K
merged at the driver, NO single-partition Exchange (the previous
implementation ranked through an un-partitioned window, which funnels
every distinct value through one task — precisely what explodes when
this operator is needed). The accept set (≤ limit values) then
broadcasts back.

Vector's `mode = "probabilistic"` (Bloom-filter membership, bounded
memory, arrival-order first-seen) maps to the streaming side — see
``vector_spark.streaming.tag_cardinality`` — because arrival order only
exists in a stream; the batch operator here is the exact mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform


def _accepted_values(df: DataFrame, value_col, ts_col: str, limit: int) -> DataFrame:
    """Top-`limit` distinct values by (first-seen ts, value).

    groupBy is map-side combined (shuffle carries distinct values, not
    rows); orderBy+limit plans as TakeOrderedAndProject (distributed
    partial top-K, driver merge) — scale-safe for the limits this
    operator is built for (default 500)."""
    first_seen = (
        df.select(value_col.alias("__v"), F.col(ts_col).alias("__ts"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.min("__ts").alias("__first_ts"))
    )
    return (
        first_seen.orderBy(F.col("__first_ts").asc(), F.col("__v").asc())
        .limit(limit)
        .select("__v")
    )


class TagCardinalityLimit(Transform):
    """Single string-column form: the tag is a top-level column."""

    def __init__(self, tag: str, value_limit: int = 500, action: str = "drop_tag", ts_col: str = "ts"):
        assert action in ("drop_tag", "drop_event")
        self.tag, self.value_limit, self.action, self.ts_col = tag, value_limit, action, ts_col

    def apply(self, df: DataFrame) -> DataFrame:
        accepted = _accepted_values(df, F.col(self.tag), self.ts_col, self.value_limit).select(
            F.col("__v").alias(self.tag)
        )
        if self.action == "drop_event":
            return df.join(F.broadcast(accepted), on=self.tag, how="left_semi")
        flagged = df.join(
            F.broadcast(accepted.withColumn("__ok", F.lit(True))), on=self.tag, how="left"
        )
        return flagged.withColumn(
            self.tag, F.when(F.col("__ok"), F.col(self.tag)).otherwise(F.lit(None))
        ).drop("__ok")


class MapTagCardinalityLimit(Transform):
    """Multi-key form over a ``map<string,string>`` tags column — the
    shape Vector actually applies the transform to (every tag key of a
    metric event is limited independently, tag_cardinality_limit.rs:
    accept_tag loop).

    drop_tag   → the over-cap key is REMOVED from the map (map_filter),
                 other keys untouched;
    drop_event → the row is dropped if ANY limited key carries an
                 over-cap value.

    One broadcast accept-set per limited key; keys' accept sets are
    independent, as in the reference (per-key AcceptedTagValueSet).
    """

    def __init__(
        self,
        keys: list[str],
        value_limit: int = 500,
        action: str = "drop_tag",
        tags_col: str = "tags",
        ts_col: str = "ts",
    ):
        assert action in ("drop_tag", "drop_event")
        self.keys, self.value_limit = list(keys), value_limit
        self.action, self.tags_col, self.ts_col = action, tags_col, ts_col

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        ok_cols: list[str] = []
        for i, key in enumerate(self.keys):
            v = F.element_at(F.col(self.tags_col), key)
            accepted = _accepted_values(df, v, self.ts_col, self.value_limit)
            ok = f"__ok_{i}"
            acc = F.broadcast(
                accepted.select(F.col("__v").alias(f"__val_{i}")).withColumn(ok, F.lit(True))
            )
            out = out.join(acc, on=v == F.col(f"__val_{i}"), how="left").drop(f"__val_{i}")
            ok_cols.append(ok)

        if self.action == "drop_event":
            # absent key (null value) is fine; present key must be accepted
            cond = F.lit(True)
            for key, ok in zip(self.keys, ok_cols):
                v = F.element_at(F.col(self.tags_col), key)
                cond = cond & (v.isNull() | F.col(ok).isNotNull())
            return out.filter(cond).drop(*ok_cols)

        # drop_tag: remove over-cap keys from the map
        def _without_key(tags_expr, key: str):
            return F.map_filter(tags_expr, lambda k, _v: k != F.lit(key))

        tags = F.col(self.tags_col)
        for key, ok in zip(self.keys, ok_cols):
            drop_this = F.element_at(tags, key).isNotNull() & F.col(ok).isNull()
            tags = F.when(drop_this, _without_key(tags, key)).otherwise(tags)
        return out.withColumn(self.tags_col, tags).drop(*ok_cols)
