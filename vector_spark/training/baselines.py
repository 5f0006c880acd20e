"""TEST-ONLY ORACLE BASELINES — not for production-scale tables.

These are the exact, exhaustive counterparts the banded operators are
verified against (and the correctness-gate oracles replay). Each one
deliberately violates a scale rule the rest of the training tier
enforces:

- ``all_pairs_neardup`` collects the ENTIRE embedding table to the
  driver and broadcasts it — a block-nested-loop scan that is exact and
  fast at test scale but driver-OOMs past the broadcast contract
  (~a few GB). The user-facing path is
  :func:`vector_spark.training.similarity.lsh_near_pairs` (banded
  hyperplane buckets, linear shuffle) or
  :func:`vector_spark.training.similarity.semantic_dedup` (cell-bounded
  pair work), which is what ``run_prep.py --embedding-neardup`` /
  ``--semantic-dedup-cells`` route through.
- ``brute_force_topk`` scores EVERY (query, candidate) pair — exact
  O(Q x N); the scale paths are
  :func:`vector_spark.training.similarity.lsh_topk` and
  :func:`vector_spark.training.similarity.ivf_topk`.

Keeping them importable (and registered as ``embedding_neardup`` /
``ann_topk`` oracle queries) is intentional: every approximate path
needs its exact twin for recall measurement (`test_training.py` pins
LSH recall >= 0.9 against these).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.training.similarity import cosine


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "qid",
    q_vec: str = "qe",
    c_id: str = "cid",
    c_vec: str = "ce",
) -> DataFrame:
    """Exact top-k BASELINE: broadcast the (small) query side, score
    every candidate, window-rank per query. The candidate scan is a
    single narrow pass; only (qid, cid, cos) rows shuffle into the
    rank. Candidates are repartitioned first so scoring parallelizes
    past the input's row-group granularity. O(Q x N) — recall oracle
    for lsh_topk / ivf_topk, not a production path."""
    pairs = candidates.repartition(c_id).join(F.broadcast(queries))
    scored = pairs.select(q_id, c_id, cosine(F.col(q_vec), F.col(c_vec)).alias("cos_raw"))
    w = Window.partitionBy(q_id).orderBy(F.col("cos_raw").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def all_pairs_neardup(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold BASELINE over one embedding table.

    Block nested-loop shape: the build side is collected once into a
    numpy matrix and broadcast to every executor; the stream side is
    repartitioned (single-row-group inputs would otherwise pin the O(n²)
    stage to one task) and scored in Arrow batches inside mapInPandas —
    only pairs passing the threshold ever materialize as rows, so the
    n² intermediate never exists JVM-side. Valid ONLY while one side
    fits in executor memory (same contract as a broadcast join); the
    production path is lsh_near_pairs (banded buckets) with this as its
    recall oracle.

    Numerics match the HOF `cosine` exactly: products rounded to the
    input precision (float32), accumulated in float64, norms likewise —
    so the DuckDB oracle agrees at any sane rounding."""
    import numpy as np

    spark = emb.sparkSession
    id_dtype = [f.dataType.simpleString() for f in emb.schema.fields if f.name == id_col][0]
    build = emb.select(id_col, vec_col).collect()
    b_ids = np.array([r[0] for r in build])
    b_mat = np.array([r[1] for r in build], dtype=np.float32)
    b_norm = np.sqrt((b_mat * b_mat).sum(axis=1, dtype=np.float64))
    bcast = spark.sparkContext.broadcast((b_ids, b_mat, b_norm))

    out_schema = f"id_a {id_dtype}, id_b {id_dtype}, cos_raw double"

    def score(batches):
        ids_b, mat_b, norm_b = bcast.value
        for pdf in batches:
            rows_a, rows_b, rows_c = [], [], []
            for ida, va in zip(pdf[id_col].to_numpy(), pdf[vec_col]):
                va32 = np.asarray(va, dtype=np.float32)
                prods = mat_b * va32  # float32 products — HOF-identical rounding
                dots = prods.sum(axis=1, dtype=np.float64)
                na = np.sqrt((va32 * va32).sum(dtype=np.float64))
                cos = dots / (na * norm_b)
                mask = (cos >= threshold) & (ida < ids_b)
                rows_a.append(np.full(mask.sum(), ida))
                rows_b.append(ids_b[mask])
                rows_c.append(cos[mask])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(rows_a) if rows_a else [],
                    "id_b": np.concatenate(rows_b) if rows_b else [],
                    "cos_raw": np.concatenate(rows_c) if rows_c else [],
                }
            )

    return emb.repartition(id_col).select(id_col, vec_col).mapInPandas(score, out_schema)
