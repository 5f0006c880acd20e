"""Token-array analytics over the pipeline's declared input shape
(doc_id, tokens array<int>, n_tok, source): vocabulary statistics and
deterministic text->token derivation for oracle-checked test surfaces.

No Vector analogue — pipeline-completing functionality for the
training tier (like training/packing.py), operating on the same
pre-tokenized corpus contract as BASELINE's input_hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.training.dedup import md5_long


def derive_tokens(text: Column, vocab: int = 50257) -> Column:
    """Deterministic whitespace word -> int32 token ids via the portable
    60-bit md5 hash mod `vocab`. Stands in for a real tokenizer on
    text-only fixtures; SQL engines replay it verbatim
    (list_transform(string_split(text,' '), t ->
    ('0x'||substr(md5(t),1,15))::BIGINT % vocab)).
    """
    return F.transform(
        F.split(text, " "), lambda t: (md5_long(t) % F.lit(vocab)).cast("int")
    )


def token_frequencies(
    corpus: DataFrame,
    tokens_col: str = "tokens",
    k: int = 100,
) -> DataFrame:
    """Global top-k unigram counts with corpus share: explode -> count.

    Distributed shape: the groupBy is map-side combined, so the shuffle
    carries one row per (partition, distinct token) — vocabulary-sized,
    not corpus-sized (vocab ~50k vs 10^12 sequences x ~1k tokens). The
    top-k is TakeOrderedAndProject (per-partition heads merged on the
    driver), never a global sort. Ties break on token id so the result
    is deterministic and SQL-replayable.
    """
    total = corpus.agg(F.sum(F.size(tokens_col)).cast("double").alias("__total"))
    counts = (
        corpus.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # share via a broadcast single-row join: stays one job, no
    # driver-side collect and no single-partition window
    return (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select("token", "n", F.round(F.col("n") / F.col("__total"), 6).alias("share"))
    )
