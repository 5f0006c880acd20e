"""`route` (alias `swimlanes`): N named conditions → N output lanes.

Reference: /root/reference/src/transforms/route.rs:69-120 — the config
expands into N *parallel* independent Lane filters (ExpandType::Parallel).
An event may match several lanes (multi-match), and events matching no
lane are discarded unless the caller asks for an `_unmatched` lane.

Spark: predicate fan-out over ONE cached DataFrame — each lane is an
independent filter (NOT a first-match-wins `when` chain, which would
break multi-match semantics). The caller decides persistence: for K
lanes all feeding sinks, `df.persist()` before fan-out makes the parse
stage run once instead of K times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Route:
    def __init__(self, lanes: dict[str, Column], with_unmatched: bool = False):
        self.lanes = lanes
        self.with_unmatched = with_unmatched

    def apply(self, df: DataFrame) -> dict[str, DataFrame]:
        out = {name: df.filter(cond) for name, cond in self.lanes.items()}
        if self.with_unmatched:
            none_match = F.lit(True)
            for cond in self.lanes.values():
                none_match = none_match & ~F.coalesce(cond, F.lit(False))
            out["_unmatched"] = df.filter(none_match)
        return out

    def tagged(self, df: DataFrame) -> DataFrame:
        """Single-pass variant: one row per (event, matched lane) via an
        array of matched lane names + explode. Same multi-match semantics
        as the parallel filters but reads the input once — the right shape
        when all lanes land in ONE partitioned sink (partitionBy("lane")),
        trading the K scans for one explode."""
        lane_arr = F.array(
            *[F.when(cond, F.lit(name)) for name, cond in self.lanes.items()]
        )
        matched = F.filter(lane_arr, lambda x: x.isNotNull())
        if self.with_unmatched:
            matched = F.when(F.size(matched) == 0, F.array(F.lit("_unmatched"))).otherwise(matched)
        return df.withColumn("lane", F.explode(matched))
