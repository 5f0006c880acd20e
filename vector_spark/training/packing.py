"""Sequence packing: bin variable-length tokenized documents into
fixed-capacity training examples.

The standard LLM-training preprocessing step over the exact table shape
this repo targets (doc_id, tokens array<int>, n_tok): concatenate short
sequences until the next one would overflow `max_len`, then start a new
pack. No Vector analogue (pipeline-completing functionality for the
training tier, like training/components.py).

Distributed shape: rows shard by a deterministic key (`id % shards`),
each shard packs INDEPENDENTLY with a sequential next-fit sweep inside
one `applyInPandas` group — the standard practice at scale (each worker
packs its shard; bin count is within a whisker of a global sweep, which
is inherently sequential and therefore not distributable). One shuffle
(the groupBy), then embarrassingly parallel; shards = parallelism knob.
Deterministic: shard key is a pure function of the id and the in-shard
sweep orders by id, so the assignment is reproducible across runs and
cluster layouts (and replicated exactly by the DuckDB recursive-CTE
oracle in __spark_entry__.py). First-fit-decreasing (sort by length
desc, search open bins) drops in as an alternative sweep for ~2-4%
better fill at higher cost; next-fit matches what production packers do
when the stream is length-shuffled anyway.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SHARD_STRIDE = 1_000_000


def pack_sequences(
    df: DataFrame,
    max_len: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    shards: int = 16,
) -> DataFrame:
    """(id, len) → (id, pack_id, pack_pos). A sequence longer than
    max_len gets a pack of its own (next-fit semantics: the overflow
    check is `fill + n > max_len` against the CURRENT pack only).
    pack_id = shard * 1e6 + local bin index."""

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        bins, pos = [], []
        bin_id, fill, p = 0, 0, 0
        first = True
        for n in pdf[len_col]:
            n = int(n)
            if not first and fill + n > max_len:
                bin_id, fill, p = bin_id + 1, 0, 0
            first = False
            bins.append(shard * _SHARD_STRIDE + bin_id)
            pos.append(p)
            fill += n
            p += 1
        out = pdf[[id_col, len_col]].copy()
        out["pack_id"] = bins
        out["pack_pos"] = pos
        return out

    schema = f"{id_col} long, {len_col} long, pack_id long, pack_pos int"
    return (
        df.select(F.col(id_col).cast("long"), F.col(len_col).cast("long"))
        .withColumn("__shard", F.pmod(id_col, F.lit(shards)))
        .groupBy("__shard")
        .applyInPandas(pack, schema)
    )


def pack_stats(packed: DataFrame, max_len: int, len_col: str = "n_tok") -> DataFrame:
    """Per-pack fill metrics: n_seqs, total tokens, fill fraction."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(len_col).alias("total_tok"),
        F.round(F.sum(len_col) / max_len, 4).alias("fill"),
    )


def materialize_packs(
    corpus: DataFrame,
    assignment: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Join the pack assignment back to the corpus and emit one row per
    pack with the concatenated token array (order = pack_pos, i.e. the
    deterministic sweep order). This is the one place tokens legally
    shuffle: producing reshuffled token sequences IS the operator's
    output (unlike the log pipeline, whose invariant is that tokens
    pass through untouched). The shuffle carries each token array
    exactly once, keyed by pack_id."""
    joined = corpus.select(id_col, tokens_col).join(assignment, id_col)
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("pack_pos").alias("p"), F.col(tokens_col).alias("t")))
        ),
        lambda s: s["t"],
    )
    return joined.groupBy("pack_id").agg(
        F.flatten(ordered).alias(tokens_col),
        F.sum(F.size(tokens_col)).alias("n_tok"),
        F.count(F.lit(1)).alias("n_seqs"),
    )
