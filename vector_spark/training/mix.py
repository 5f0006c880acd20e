"""Domain-mix construction for training corpora: temperature-weighted
source resampling (the multilingual-LM mixing rule — p_i ∝ q_i^α with
temperature α ∈ (0, 1]; α=1 keeps the natural mix, α→0 flattens toward
uniform). Downsample-only: the largest-deficit source keeps rate 1.0
and every other source is thinned toward the tempered target, so no
document is ever duplicated.

No Vector analogue — pipeline-completing functionality for the
training tier over the declared corpus shape (doc_id, ..., source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.training.dedup import md5_long


def domain_mix_rates(
    corpus: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """Per-source tempered target shares and deterministic keep rates.

    With source counts c_i (total T): tempered weight w_i = (c_i/T)^α,
    target share m_i = w_i/Σw, and the largest feasible total K =
    min_i(c_i/m_i) under the no-upsampling constraint; keep_rate_i =
    K·m_i/c_i (==1 for the binding source). Expected kept counts then
    follow the tempered distribution exactly.

    Distributed shape: one map-side-combined groupBy whose output is
    source-cardinality-sized (domains are few by nature — this table is
    always tiny), then two single-row broadcast reductions over it for
    the Σw and min terms. Nothing here scales with the corpus beyond
    the first count scan.

    Emits (source, n, share, target_share, keep_rate), rounded to 6
    decimals for cross-engine replay.
    """
    c = corpus.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("double").alias("__tot"))
    w = c.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n",
        (F.col("n") / F.col("__tot")).alias("share"),
        F.pow(F.col("n") / F.col("__tot"), F.lit(alpha)).alias("__w"),
    )
    sums = w.agg(
        F.sum("__w").alias("__sw"), F.min(F.col("n") / F.col("__w")).alias("__k")
    )
    # m_i = w_i/Σw; K = min(c_i/m_i) = Σw · min(c_i/w_i); r_i = K·m_i/c_i
    return w.crossJoin(F.broadcast(sums)).select(
        source_col,
        "n",
        F.round("share", 6).alias("share"),
        F.round(F.col("__w") / F.col("__sw"), 6).alias("target_share"),
        F.round(
            F.least(F.lit(1.0), F.col("__k") * F.col("__w") / F.col("n")), 6
        ).alias("keep_rate"),
    )


def split_corpus(
    corpus: DataFrame,
    weights: dict[str, float],
    seed: int | str = 0,
    key_col: str = "doc_id",
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: hash `seed:id` into
    [0, precision) and carve it by cumulative weight — every engine,
    run, and cluster layout agrees row-for-row, and resplitting with a
    new seed is an independent draw. Weights must sum to ~1.

    Distributed shape: a pure narrow projection — no shuffle, no RNG
    state, no sampling pass. Stamps a `split` column.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = F.pmod(
        md5_long(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))),
        F.lit(precision),
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = u < int(round(cum * precision))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return corpus.withColumn("split", expr)


def domain_mix_resample(
    corpus: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    precision: int = 1_000_000,
) -> DataFrame:
    """Apply domain_mix_rates as a deterministic keyed Bernoulli filter:
    keep a row iff md5_long(key) % precision < round(keep_rate ·
    precision) — the same portable-hash decision style as the sample
    operator (re-runs and external engines agree row-for-row; the
    rounded rate keeps the integer threshold bit-stable across
    engines).

    Distributed shape: the rates table (source-cardinality rows)
    BROADCASTS onto the corpus; the decision is a narrow filter — no
    corpus-scale shuffle at all. Stamps keep_rate so downstream loss
    weighting can de-bias if needed.
    """
    rates = domain_mix_rates(corpus, alpha, source_col)
    thresh = F.round(F.col("keep_rate") * precision, 0).cast("long")
    keep = F.pmod(md5_long(F.col(key_col).cast("string")), F.lit(precision)) < thresh
    return (
        corpus.join(
            F.broadcast(rates.select(source_col, "keep_rate")), source_col
        )
        .where(keep)
        .select(*corpus.columns, "keep_rate")
    )
