"""Connected components over near-duplicate candidate pairs.

The missing last stage of a dedup pipeline: LSH/SimHash band joins
produce PAIRS (training/dedup.py), but a 100 TB dedup must collapse
pairs into CLUSTERS and keep one representative per cluster — pair
(a,b) and (b,c) must retire both b and c, not just one of each pair.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame groupBy/join rounds:

- large-star(u): every neighbor v > u re-points to m = min(N(u) ∪ {u});
- small-star(u): every neighbor v ≤ u (plus u itself) re-points to the
  minimum of the small neighborhood.

Each round is two shuffles on the edge set; the edge count never grows
beyond the input edge count + node count, and the round count is
O(log n) (in practice 3-5 rounds for dedup graphs, whose components are
band-join near-cliques with tiny diameter). This is the
scale-correct choice over naive min-label propagation, whose round
count is the component DIAMETER — linear in the worst (chain) case.

Per-round `localCheckpoint(eager=True)` truncates the otherwise
exponentially-deepening iterative join lineage; on a real cluster with
a fault-tolerance requirement, swap for `checkpoint()` against a
reliable store (same call site, noted inline). Convergence is detected
by an order-insensitive edge-set signature (count + sum of xxhash64),
one tiny aggregate action per round.

No Vector analogue (Vector has no joins at all, SURVEY.md §2.7) — this
is pipeline-completing functionality for the training-data tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    bi = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bi.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    return (
        bi.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small, then connect each small neighborhood
    (and u itself) to its minimum."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    re_pointed = (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    to_min = mins.select("u", F.col("m").alias("v"))
    return re_pointed.unionByName(to_min).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (the edge set is
    # distinct, so xor cancellation can't collide two different sets
    # short of a 64-bit hash coincidence)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    out_id: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) undirected pair set → (out_id, component) for every
    node that appears in a pair, component = the minimum node id of its
    connected component. Deterministic; ~2 shuffles per round,
    O(log n) rounds."""
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        e.select("u").unionByName(e.select(F.col("v").alias("u"))).distinct()
    )
    e = e.localCheckpoint(eager=True)  # cluster: .checkpoint() on HDFS/S3
    sig = _signature(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _signature(e2)
        e.unpersist()
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    # at the fixpoint every edge points a node at its component minimum
    comp = e.groupBy("u").agg(F.min("v").alias("component"))
    out = nodes.join(comp, "u", "left").select(
        F.col("u").alias(out_id),
        F.coalesce("component", F.col("u")).alias("component"),
    )
    return out


def keep_representatives(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id", comp_id: str = "id"
) -> DataFrame:
    """Dedup decision: keep every document that is its own component
    minimum (the representative) or in no candidate pair at all.
    `comp_id` names the id column of `components` (the `out_id` passed
    to connected_components)."""
    losers = components.filter(F.col(comp_id) != F.col("component")).select(
        F.col(comp_id).alias(id_col)
    )
    # no broadcast hint: the loser set scales with the corpus (can be a
    # large fraction at 100 TB) — let AQE pick broadcast when it is small
    return docs.join(losers, id_col, "left_anti")
