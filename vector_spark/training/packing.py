"""Sequence packing: bin variable-length tokenized documents into
fixed-capacity training examples.

The standard LLM-training preprocessing step over the exact table shape
this repo targets (doc_id, tokens array<int>, n_tok): concatenate short
sequences until the next one would overflow `max_len`, then start a new
pack. No Vector analogue (pipeline-completing functionality for the
training tier, like training/components.py).

Distributed shape: rows shard by a deterministic HASH of the id (works
for string doc_ids — the pipeline's declared input contract — as well
as numeric ones; a numeric cast/modulo would NULL out on 'doc-…' ids
and silently collapse everything into one shard). Each shard packs
INDEPENDENTLY with a sequential sweep inside one `applyInPandas` group
— the standard practice at scale (each worker packs its shard; bin
count is within a whisker of a global sweep, which is inherently
sequential and therefore not distributable). One shuffle (the groupBy),
then embarrassingly parallel; shards = parallelism knob. Deterministic:
the shard key is a pure function of the id and the in-shard sweep
orders by id, so the assignment is reproducible across runs and cluster
layouts (and replicated exactly by the DuckDB recursive-CTE oracle in
__spark_entry__.py when the SQL-portable shard key is used).

Two sweeps:
- next-fit (default): close the pack on first overflow. What production
  packers do when the stream is length-shuffled anyway.
- first-fit-decreasing (`strategy="ffd"`): sort by length desc, place
  each doc in the first open pack with room. ~2-4% better fill at
  higher cost; still deterministic (ties broken by id).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SHARD_STRIDE = 1_000_000


def portable_shard(id_col: str, shards: int) -> Column:
    """SQL-portable deterministic shard key (md5-based, mirrors
    `pmod(conv(substr(md5(id),1,15),16,10), shards)` which DuckDB can
    replay verbatim). Used by the oracle-checked query surface."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(shards))


def pack_sequences(
    df: DataFrame,
    max_len: int,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    shards: int = 16,
    shard_key: Column | None = None,
    strategy: str = "next_fit",
) -> DataFrame:
    """(id, len) → (id, len, pack_id, pack_pos). A sequence longer than
    max_len gets a pack of its own (next-fit semantics: the overflow
    check is `fill + n > max_len` against the CURRENT pack only; FFD
    opens a new pack when no open pack fits). pack_id = shard * 1e6 +
    local bin index. The id column keeps its native type end-to-end.

    Default shard key is `pmod(xxhash64(id), shards)` — cheap, JVM-side,
    and valid for any id type. Pass `shard_key=portable_shard(...)` when
    an external SQL engine must replay the exact assignment."""
    if strategy not in ("next_fit", "ffd"):
        raise ValueError(f"unknown packing strategy {strategy!r}")
    if shard_key is None:
        shard_key = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))

    def pack_next_fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
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

    def pack_ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # Decreasing length, id tiebreak → deterministic placement.
        pdf = pdf.sort_values([len_col, id_col], ascending=[False, True]).reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        fills: list[int] = []  # fill level per open bin, index = local bin id
        counts: list[int] = []  # rows placed per bin (next pack_pos)
        bins, pos = [], []
        for n in pdf[len_col]:
            n = int(n)
            placed = -1
            for b, fill in enumerate(fills):
                if fill + n <= max_len:
                    placed = b
                    break
            if placed < 0:
                fills.append(0)
                counts.append(0)
                placed = len(fills) - 1
            bins.append(shard * _SHARD_STRIDE + placed)
            pos.append(counts[placed])
            fills[placed] += n
            counts[placed] += 1
        out = pdf[[id_col, len_col]].copy()
        out["pack_id"] = bins
        out["pack_pos"] = pos
        return out

    fn = pack_next_fit if strategy == "next_fit" else pack_ffd
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {len_col} long, pack_id long, pack_pos int"
    return (
        df.select(F.col(id_col), F.col(len_col).cast("long"))
        .withColumn("__shard", shard_key)
        .groupBy("__shard")
        .applyInPandas(fn, schema)
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
