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


def chunk_documents(
    corpus: DataFrame,
    ctx_len: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Doc-boundary sliding-window chunking: split each document's token
    array into windows of `ctx_len` tokens advancing by
    `ctx_len - overlap` (the BERT/long-doc preprocessing shape; the last
    window may be short, a window never starts inside the final
    `overlap` tokens — range(0, max(n - overlap, 1), step) semantics).

    Distributed shape: NARROW — pure posexplode + slice per row, no
    shuffle anywhere; chunking parallelizes with the scan at any corpus
    size (contrast pack_sequences, whose bin assignment needs one
    shuffle). Emits (doc_id, chunk_idx, tok_start, tokens, n_tok).
    """
    if overlap >= ctx_len:
        raise ValueError(f"overlap {overlap} must be < ctx_len {ctx_len}")
    step = ctx_len - overlap
    n = F.size(tokens_col)
    n_starts = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(step)).cast("int")
    starts = F.sequence(F.lit(0), n_starts - 1)
    out = corpus.select(
        F.col(id_col),
        F.col(tokens_col),
        F.posexplode(starts).alias("chunk_idx", "__i"),
    )
    tok_start = (F.col("chunk_idx") * step).cast("int")
    chunk = F.slice(F.col(tokens_col), tok_start + 1, ctx_len)
    return out.select(
        id_col,
        F.col("chunk_idx"),
        tok_start.alias("tok_start"),
        chunk.alias(tokens_col),
        F.size(chunk).alias("n_tok"),
    )


def concat_and_chunk(
    corpus: DataFrame,
    ctx_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    shards: int = 16,
    shard_key: Column | None = None,
    sep_token: int | None = None,
) -> DataFrame:
    """GPT-style stream packing: concatenate documents (deterministic id
    order within hash shards) into one token stream and cut it at exact
    `ctx_len` boundaries — every chunk is full except each shard's tail.
    The complement of pack_sequences (which never splits a document).

    Distributed shape: offsets come from a per-shard cumulative sum
    (window over the shard — each shard sorts independently, shards are
    the parallelism knob); each document then computes WHICH chunks it
    spans and slices its own tokens per chunk (narrow), and one groupBy
    (shard, chunk) reassembles pieces in stream order. Tokens cross the
    shuffle exactly once — inherent, reshuffled sequences ARE the
    output (same argument as materialize_packs). No token-per-row
    explode: pieces move as arrays.

    Emits (chunk_id, tokens, n_tok, n_docs). chunk_id = shard * stride
    + in-shard chunk index; deterministic for any cluster layout.

    `sep_token` (GPT convention) terminates EVERY document — including
    empty ones — with one separator before packing, so the loader can
    recover doc boundaries; total output tokens = input tokens + docs.
    """
    from pyspark.sql import Window

    if sep_token is not None:
        # withColumn, not a narrowing select: a custom shard_key may
        # reference other corpus columns
        corpus = corpus.withColumn(
            tokens_col,
            F.concat(F.col(tokens_col), F.array(F.lit(sep_token).cast("int"))),
        )
    if shard_key is None:
        shard_key = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    w = Window.partitionBy("__shard").orderBy(id_col)
    n = F.size(tokens_col)
    off = (F.sum(n).over(w) - n).alias("__off")
    staged = corpus.select(
        F.col(id_col), F.col(tokens_col), shard_key.alias("__shard")
    ).select("*", off)

    first_c = F.floor(F.col("__off") / ctx_len).cast("long")
    last_c = F.floor((F.col("__off") + n - 1) / ctx_len).cast("long")
    spans = staged.where(n > 0).select(
        "__shard",
        "__off",
        F.col(tokens_col),
        F.explode(F.sequence(first_c, last_c)).alias("__chunk"),
    )
    # document-local [s, e) span of this chunk's piece
    s = F.greatest(F.col("__chunk") * ctx_len - F.col("__off"), F.lit(0)).cast("int")
    e = F.least(
        (F.col("__chunk") + 1) * ctx_len - F.col("__off"), F.size(tokens_col)
    ).cast("int")
    pieces = spans.select(
        "__shard",
        "__chunk",
        F.col("__off"),
        F.slice(F.col(tokens_col), s + 1, e - s).alias("__piece"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("__off").alias("o"), F.col("__piece").alias("t")))
        ),
        lambda x: x["t"],
    )
    return (
        pieces.groupBy("__shard", "__chunk")
        .agg(F.flatten(ordered).alias(tokens_col), F.count(F.lit(1)).alias("n_docs"))
        .select(
            (F.col("__shard") * _SHARD_STRIDE + F.col("__chunk")).alias("chunk_id"),
            tokens_col,
            F.size(tokens_col).alias("n_tok"),
            "n_docs",
        )
    )


def epoch_shuffle(
    packed: DataFrame,
    seed: int | str,
    id_col: str = "chunk_id",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic epoch-level shuffle of training sequences: stamp
    every row with `shuffle_key` = the portable 60-bit md5 hash of
    `seed:id`, then range-repartition and sort on it. Reading the
    output partitions in order IS the shuffled epoch; a different seed
    is a fresh, reproducible permutation.

    Distributed shape: ONE range-partitioned sort (sampling pass +
    shuffle) — the distributed way to shuffle 10^12 sequences. Never a
    global row_number window (single partition) or a driver-side
    permutation. The hash key is engine-replayable (same md5 contract
    as training/dedup.py), so loaders in any system agree on the order.
    """
    from vector_spark.training.dedup import md5_long

    key = md5_long(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = packed.withColumn("shuffle_key", key)
    n = partitions or packed.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(n, "shuffle_key").sortWithinPartitions("shuffle_key")
