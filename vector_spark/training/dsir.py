"""Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every raw document by how much more likely its hashed-n-gram bag is
under a small target corpus than under the raw corpus, then resample
the raw corpus toward the target distribution with Gumbel-top-k.

No Vector analogue — pipeline-completing functionality for the
training tier over the declared corpus shape (doc_id, tokens
array<int>, ...), like training/mix.py.

Distributed shape (the part that matters at 10^12 sequences):
- The feature space is HASHED to a fixed bucket count B (the paper
  uses 10k buckets of unigrams+bigrams), so both distribution tables
  are <= B rows REGARDLESS of corpus size: one map-side-combined
  groupBy each, then the (<= B)-row log-ratio table BROADCASTS back
  onto the exploded corpus. The scoring pass is narrow; token arrays
  never shuffle — only (doc_id, bucket) pairs reach the per-doc
  re-aggregation, exactly the unigram_logprob cost envelope.
- Selection is deterministic Gumbel-top-k: the Gumbel perturbation is
  derived from the portable md5 hash of doc_id (no RNG state), so
  re-runs and external engines agree row-for-row. Top-n uses
  TakeOrderedAndProject at test scale; at corpus scale compute the
  score column once, take an approxQuantile threshold, and filter —
  the score itself is already a plain column either way.

All hashes are the portable 60-bit md5 digest so the DuckDB oracle
replays bit-for-bit (swap xxhash64 in production via `hasher`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.training.dedup import md5_long


def hashed_ngram_buckets(
    tokens_col: str | Column,
    n: int = 2,
    buckets: int = 10_000,
    hasher=None,
) -> Column:
    """Per-doc array of hashed n-gram feature ids: each n-token window
    (comma-joined) hashes into one of `buckets` buckets. Narrow — a
    pure expression over the token array, no shuffle."""
    if hasher is None:
        hasher = md5_long
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    gram = lambda i: F.concat_ws(  # noqa: E731
        ",", F.slice(toks, i + 1, n).cast("array<string>")
    )
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.pmod(hasher(gram(i)), F.lit(buckets)),
    )


def _bucket_counts(
    corpus: DataFrame, id_col: str, tokens_col: str, n: int, buckets: int, hasher
) -> DataFrame:
    feats = corpus.where(F.size(tokens_col) >= n).select(
        F.col(id_col),
        F.explode(hashed_ngram_buckets(tokens_col, n, buckets, hasher)).alias("bucket"),
    )
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    buckets: int = 10_000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """Per-bucket log importance ratio ln(p_b) - ln(q_b) with add-one
    smoothing over the full B-bucket space: p from the target corpus,
    q from the raw corpus. Only buckets observed in the RAW corpus are
    emitted (a raw doc can only ever look up those). Output is <= B
    rows — broadcastable by construction.

    Emits (bucket, raw_n, target_n, log_ratio)."""
    q = _bucket_counts(raw, id_col, tokens_col, n, buckets, hasher)
    p = _bucket_counts(target, id_col, tokens_col, n, buckets, hasher)
    q_tot = q.agg(F.sum("n").cast("double").alias("__qt"))
    p_tot = p.agg(F.coalesce(F.sum("n"), F.lit(0)).cast("double").alias("__pt"))
    joined = (
        q.withColumnRenamed("n", "raw_n")
        .join(p.withColumnRenamed("n", "target_n"), "bucket", "left")
        .crossJoin(F.broadcast(q_tot))
        .crossJoin(F.broadcast(p_tot))
    )
    b = F.lit(float(buckets))
    p_b = (F.coalesce(F.col("target_n"), F.lit(0)) + 1.0) / (F.col("__pt") + b)
    q_b = (F.col("raw_n") + 1.0) / (F.col("__qt") + b)
    return joined.select(
        "bucket",
        "raw_n",
        F.coalesce(F.col("target_n"), F.lit(0)).alias("target_n"),
        (F.log(p_b) - F.log(q_b)).alias("log_ratio"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    buckets: int = 10_000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """Per-doc log importance weight: the sum of per-feature log ratios
    over the doc's hashed n-gram bag (the multinomial bag-of-features
    log-likelihood ratio of Xie et al. 2023 §3.1).

    Docs shorter than n tokens have no features and score 0.0 (kept
    neutral rather than dropped — selection policy belongs to
    dsir_select). Rounded to 6 decimals for cross-engine replay.

    Emits (doc_id, n_feat, logw)."""
    ratios = dsir_log_ratios(raw, target, n, buckets, id_col, tokens_col, hasher)
    feats = raw.where(F.size(tokens_col) >= n).select(
        F.col(id_col),
        F.explode(hashed_ngram_buckets(tokens_col, n, buckets, hasher)).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(ratios.select("bucket", "log_ratio")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_feat"),
            F.round(F.sum("log_ratio"), 6).alias("logw"),
        )
    )
    return raw.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_feat"), F.lit(0)).cast("int").alias("n_feat"),
        F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
    )


def gumbel_key(logw: Column, id_col: Column, precision: int = 1_000_000) -> Column:
    """Deterministic Gumbel perturbation: u = (md5('gumbel:'+id) % P
    + 0.5) / P (strictly inside (0,1)), g = -ln(-ln(u)); the sampling
    key is logw + g. Sorting by this key without replacement IS
    Gumbel-top-k sampling from the softmax of the log weights (Vieira
    2014) — the paper's \"sample w/o replacement from the importance
    weights\" realized as a plain ORDER BY any engine replays.

    The hash is SALTED with 'gumbel:' so it is independent of every
    other keyed decision in the repo — domain_mix_resample thins on the
    UNsalted md5(id) % P, and feeding its survivors (all u below their
    source's keep threshold) into an unsalted Gumbel would cap their
    noise and systematically exclude thinned sources from selection
    regardless of importance weight."""
    u = (
        F.pmod(md5_long(F.concat(F.lit("gumbel:"), id_col.cast("string"))), F.lit(precision))
        + F.lit(0.5)
    ) / F.lit(float(precision))
    return logw + -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n_keep: int,
    n: int = 2,
    buckets: int = 10_000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """Gumbel-top-k selection of `n_keep` raw docs toward the target
    distribution. The key is rounded to 6 decimals and tied on doc_id
    so the ranking is bit-portable across engines and partitionings.

    Top-n is TakeOrderedAndProject (per-partition heads merged on the
    driver) — fine while n_keep is driver-sized; for a corpus-scale
    keep fraction, threshold the `key` column with approxQuantile and
    filter instead (the scoring stays identical).

    Emits (doc_id, logw, key), the kept set."""
    w = dsir_log_weights(raw, target, n, buckets, id_col, tokens_col, hasher)
    keyed = w.select(
        id_col, "logw", F.round(gumbel_key(F.col("logw"), F.col(id_col)), 6).alias("key")
    )
    return keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(n_keep)
