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


def duplicated_spans(
    corpus: DataFrame,
    window: int = 50,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """Exact substring duplication over token arrays (the ExactSubstr
    dedup of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": any `window`-token run that appears more
    than once corpus-wide is a duplicated span; the paper's default
    window is 50 tokens).

    The suffix-array construction the paper uses is single-machine; the
    distributed equivalent is window fingerprints: every doc emits one
    hash per token position (posexplode over the slice hashes), hashes
    occurring >1 time corpus-wide mark their source positions, and
    per-doc overlapping position runs merge into maximal spans with one
    ordinary interval-union window.

    Distributed shape: two corpus-position-scale shuffles — the
    fingerprint groupBy (map-side combined to per-partition distinct
    hashes) and the left_semi join of positions against the duplicated
    hash set (too big to broadcast at corpus scale, so a shuffle
    hash-join on the 8-byte key; token bodies never shuffle — only
    (hash, doc_id, pos) triples). The interval merge windows per doc
    (small partitions). Matches minhash shingling's cost envelope.

    Hash is the portable md5-based 60-bit digest so the DuckDB oracle
    replays it bit-for-bit; pass `hasher` (Column -> Column) to swap in
    xxhash64 in production (same argument as training/dedup.py).

    Emits (doc_id, span_start, span_end, n_dup_tok): token positions
    are 0-based, span_end exclusive, spans maximal (overlapping or
    adjacent windows merged).
    """
    from pyspark.sql import Window

    if hasher is None:
        hasher = lambda c: md5_long(c)  # noqa: E731
    n = F.size(tokens_col)
    gram = lambda i: F.concat_ws(  # noqa: E731
        ",", F.slice(F.col(tokens_col), i + 1, window).cast("array<string>")
    )
    grams = corpus.where(n >= window).select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n - window), lambda i: hasher(gram(i)))
        ).alias("pos", "__h"),
    )
    dup = grams.groupBy("__h").count().where(F.col("count") > 1).select("__h")
    hits = grams.join(dup, "__h", "left_semi")

    w_ord = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_grp = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    grouped = hits.select(
        id_col, "pos", F.sum(new_grp).over(w_ord).alias("__grp")
    )
    return grouped.groupBy(id_col, "__grp").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") + window).cast("int").alias("span_end"),
        (F.max("pos") + window - F.min("pos")).cast("int").alias("n_dup_tok"),
    ).drop("__grp")


def remove_duplicated_spans(
    corpus: DataFrame,
    window: int = 50,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """The ExactSubstr dedup ACTION (Lee et al. 2021 §4.1: delete every
    duplicated substring, leaving one copy corpus-wide). Rule: a token
    position is excised when some `window`-gram covering it is
    duplicated corpus-wide AND that occurrence is not the CANONICAL one
    (the corpus-first (doc_id, pos) for its hash). The canonical copy
    survives; later copies — in other docs or later in the same doc —
    lose exactly the duplicated extent (merged to maximal spans, like
    duplicated_spans). Mildly more aggressive than the paper at span
    edges where a surviving copy overlaps another hash's removal zone —
    same global one-copy guarantee.

    Distributed shape: identical cost envelope to duplicated_spans —
    per-position fingerprints, one map-side-combined groupBy producing
    (hash, canonical) via min_by, one shuffle join of positions against
    it — plus one doc-keyed join of the (tiny) per-doc span list back
    onto the corpus; the excision itself is a narrow higher-order
    filter. Token arrays never shuffle.

    Emits (doc_id, tokens, n_tok, n_removed): the cleaned array, its
    length, and how many tokens were cut (0 for untouched docs).
    """
    from pyspark.sql import Window

    if hasher is None:
        hasher = lambda c: md5_long(c)  # noqa: E731
    n = F.size(tokens_col)
    gram = lambda i: F.concat_ws(  # noqa: E731
        ",", F.slice(F.col(tokens_col), i + 1, window).cast("array<string>")
    )
    grams = corpus.where(n >= window).select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), n - window), lambda i: hasher(gram(i)))
        ).alias("pos", "__h"),
    )
    # duplicated hashes with their corpus-first occurrence
    canon = (
        grams.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("__c"),
        )
        .where(F.col("__n") > 1)
        .select("__h", "__c")
    )
    hits = grams.join(canon, "__h").where(
        ~((F.col(id_col) == F.col("__c.d")) & (F.col("pos") == F.col("__c.p")))
    )

    w_ord = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_grp = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    grouped = hits.select(id_col, "pos", F.sum(new_grp).over(w_ord).alias("__grp"))
    spans = (
        grouped.groupBy(id_col, "__grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + window).alias("e"))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("__spans"))
    )

    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    cleaned = F.filter(
        F.zip_with(
            F.col(tokens_col),
            F.sequence(F.lit(0), F.size(tokens_col) - 1),
            lambda t, i: F.struct(t.alias("t"), covered(i).alias("cut")),
        ),
        lambda x: ~x["cut"],
    )
    return (
        corpus.join(spans, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("__spans").isNull(), F.col(tokens_col))
            .otherwise(F.transform(cleaned, lambda x: x["t"]))
            .alias("tokens"),
            F.size(tokens_col).alias("__orig"),
        )
        .select(
            id_col,
            "tokens",
            F.size("tokens").cast("int").alias("n_tok"),
            (F.col("__orig") - F.size("tokens")).cast("int").alias("n_removed"),
        )
    )


def dup_span_stats(
    corpus: DataFrame,
    window: int = 50,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    hasher=None,
) -> DataFrame:
    """Per-doc duplicated-token fraction from duplicated_spans: every
    doc with its n_tok, total tokens inside duplicated spans, and the
    fraction (0.0 for clean docs — a left join back to the corpus, so
    the output is a per-doc quality column, not a span list)."""
    spans = duplicated_spans(corpus, window, id_col, tokens_col, hasher)
    per_doc = spans.groupBy(id_col).agg(F.sum("n_dup_tok").alias("__dup"))
    return corpus.join(per_doc, id_col, "left").select(
        id_col,
        F.size(tokens_col).alias("n_tok"),
        F.coalesce(F.col("__dup"), F.lit(0)).cast("int").alias("dup_tok"),
        F.round(
            F.coalesce(F.col("__dup"), F.lit(0)) / F.size(tokens_col), 6
        ).alias("dup_tok_frac"),
    )


def length_stats(
    corpus: DataFrame,
    source_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-source sequence-length distribution (docs, mean, p50/p90/p99
    of n_tok) — the packing/ctx-len sizing dashboard.

    Exact `percentile` here so DuckDB replays the value bit-for-bit
    (both engines linear-interpolate); it buffers each group's values,
    fine while per-source doc counts fit an executor. At 10^12 rows
    swap `approx_percentile` (t-digest sketch, mergeable, same plan
    shape) — the one-line scale switch, same contract as vocab_stats'
    exact-distinct note.

    Emits (source, n_docs, mean_tok, p50, p90, p99) rounded to 6.
    """
    n = F.size(tokens_col).cast("double")
    return (
        corpus.select(F.col(source_col).alias("source"), n.alias("__n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__n"), 6).alias("mean_tok"),
            F.round(F.expr("percentile(__n, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(__n, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(__n, 0.99)"), 6).alias("p99"),
        )
    )


def source_kl_divergence(
    corpus: DataFrame,
    source_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    KL(p_source || p_corpus) with add-one smoothing over the corpus
    vocabulary — the domain-skew dashboard a mixing/temperature decision
    reads next to domain_mix_rates (a source far from the mix gets
    up-weighted or investigated).

    Distributed shape: one (source, token) map-side-combined groupBy
    (≤ |sources| × vocab rows), the corpus marginal derived FROM it by
    a second tiny groupBy; the KL sum runs over the FULL sources × vocab
    grid (a cross of two tiny tables — the smoothing terms of tokens a
    source never emits are part of the divergence) — nothing after the
    first explode scales with the corpus. V = corpus distinct vocab.

    Emits (source, n_tok, kl), rounded to 6 decimals.
    """
    st = (
        corpus.select(F.col(source_col).alias("source"), F.explode(tokens_col).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("sn"))
    )
    ct = st.groupBy("token").agg(F.sum("sn").alias("cn"))
    totals = st.groupBy("source").agg(F.sum("sn").alias("st_tot"))
    grand = ct.agg(
        F.sum("cn").cast("double").alias("__ct_tot"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    grid = totals.crossJoin(F.broadcast(ct)).join(
        st, ["source", "token"], "left"
    ).crossJoin(F.broadcast(grand))
    p_s = (F.coalesce(F.col("sn"), F.lit(0)) + 1.0) / (F.col("st_tot") + F.col("__v"))
    p_c = (F.col("cn") + 1.0) / (F.col("__ct_tot") + F.col("__v"))
    return (
        grid.groupBy("source")
        .agg(
            F.max("st_tot").cast("long").alias("n_tok"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl"),
        )
    )


def pmi_bigrams(
    corpus: DataFrame,
    k: int = 100,
    min_count: int = 5,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Top-k adjacent-pair collocations by pointwise mutual information
    (Church & Hanks 1990): PMI(a,b) = ln(p(a,b)/(p(a)p(b))) over the
    corpus's adjacent token pairs — the phrase-mining pass a tokenizer
    or n-gram-merge step runs before training. `min_count` floors the
    pair support (unsmoothed PMI otherwise ranks hapax pairs first).

    Distributed shape: both count tables are map-side combined and
    vocabulary-bounded (pairs by vocab², in practice by observed
    adjacency); the unigram table BROADCASTS onto the pair table (two
    tiny joins), the totals are single-row broadcasts, and the top-k is
    TakeOrderedAndProject. Token arrays never shuffle.

    Emits (tok_a, tok_b, n_pair, pmi) with deterministic (pmi desc,
    tok_a, tok_b) order, rounded to 6 decimals for cross-engine replay.
    """
    pairs = corpus.where(F.size(tokens_col) >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col(tokens_col), 1, F.size(tokens_col) - 1),
                F.slice(F.col(tokens_col), 2, F.size(tokens_col) - 1),
                lambda a, b: F.struct(a.alias("tok_a"), b.alias("tok_b")),
            )
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    pair_n = pairs.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = corpus.select(F.explode(tokens_col).alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).alias("un")
    )
    pair_tot = pair_n.agg(F.sum("n_pair").cast("double").alias("__pt"))
    uni_tot = uni.agg(F.sum("un").cast("double").alias("__ut"))
    scored = (
        pair_n.where(F.col("n_pair") >= min_count)
        .join(F.broadcast(uni.select(F.col("token").alias("tok_a"), F.col("un").alias("__na"))), "tok_a")
        .join(F.broadcast(uni.select(F.col("token").alias("tok_b"), F.col("un").alias("__nb"))), "tok_b")
        .crossJoin(F.broadcast(pair_tot))
        .crossJoin(F.broadcast(uni_tot))
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("__pt"))
                    / ((F.col("__na") / F.col("__ut")) * (F.col("__nb") / F.col("__ut")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b")).limit(k)


def vocab_stats(
    corpus: DataFrame,
    source_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-source vocabulary profile: docs, tokens, distinct tokens and
    type-token ratio — the corpus-diversity dashboard a mixing decision
    reads next to domain_mix_rates.

    Distributed shape: explode → groupBy(source, token) is map-side
    combined, so the shuffle carries at most |sources| × vocab rows;
    the second groupBy is over that already-tiny table. Exact distinct
    (not approx_count_distinct) so external engines replay the value
    bit-for-bit; swap in approx_count_distinct at 10^12 scale if the
    per-source vocab itself stops fitting the agg — same plan shape.

    Emits (source, n_docs, n_tok, n_vocab, ttr)."""
    ex = corpus.select(F.col(source_col).alias("source"), F.explode(tokens_col).alias("token"))
    per_tok = ex.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    vocab = per_tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_vocab"), F.sum("n").alias("n_tok")
    )
    docs = corpus.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return docs.join(vocab, "source").select(
        "source",
        "n_docs",
        "n_tok",
        "n_vocab",
        F.round(F.col("n_vocab") / F.col("n_tok"), 6).alias("ttr"),
    )


def bigram_logprob(
    corpus: DataFrame,
    lam: float = 0.75,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-doc mean NLL under a Jelinek-Mercer-interpolated bigram LM
    trained on the corpus itself: p(t|prev) = λ·c(prev,t)/c(prev) +
    (1-λ)·c(t)/T. The KenLM-perplexity quality filter of CCNet
    (Wenzek et al. 2020) with the corpus's own counts standing in for
    the external LM; one interpolation level (no backoff chain) keeps
    it closed-form and engine-replayable.

    Estimator note: c(prev) is the UNIGRAM count of prev, not its
    bigram-context count, so the conditional is deliberately deficient
    (sums to < 1 when prev also ends a document) — the standard
    stupid-backoff-style shortcut; consistent across the oracle and
    tests, and a monotone re-ranking of docs only where doc-final
    tokens are involved.

    Distributed shape: the unigram table is vocab-sized and BROADCASTS
    (as in unigram_logprob). The bigram table is vocab²-BOUNDED but can
    be large, so the bigram lookup is a plain shuffle hash-join on the
    (prev, cur) key — Spark/AQE broadcasts it when it turns out small.
    Token arrays never shuffle; only (doc_id, prev, cur) triples reach
    the join and the per-doc re-agg. At real scale prune the bigram
    table to count >= K before the join (rare bigrams then score
    through the unigram floor) — that cap is the standard KenLM-style
    memory bound.

    Scores positions 1..n-1 (docs need >= 2 tokens; shorter docs are
    left out, matching "no bigram evidence"). Emits (doc_id, n_big,
    avg_nll, ppl) rounded to 6 decimals.
    """
    pairs = corpus.where(F.size(tokens_col) >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(tokens_col) - 2),
                lambda i: F.struct(
                    F.element_at(F.col(tokens_col), i + 1).alias("prev"),
                    F.element_at(F.col(tokens_col), i + 2).alias("cur"),
                ),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))

    uni = corpus.select(F.explode(tokens_col).alias("token")).groupBy("token").agg(
        F.count(F.lit(1)).alias("un")
    )
    tot = uni.agg(F.sum("un").cast("double").alias("__tot"))
    uni_p = uni.crossJoin(F.broadcast(tot)).select(
        "token",
        F.col("un").alias("un"),
        (F.col("un") / F.col("__tot")).alias("up"),
    )
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bn"))

    scored = (
        pairs.join(big, ["prev", "cur"])
        .join(
            F.broadcast(uni_p.select(F.col("token").alias("prev"), F.col("un").alias("prev_n"))),
            "prev",
        )
        .join(
            F.broadcast(uni_p.select(F.col("token").alias("cur"), F.col("up").alias("cur_p"))),
            "cur",
        )
        .select(
            F.col(id_col),
            F.log(
                F.lit(lam) * F.col("bn") / F.col("prev_n")
                + F.lit(1.0 - lam) * F.col("cur_p")
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_big"),
        F.round(-F.avg("__lp"), 6).alias("avg_nll"),
        F.round(F.exp(-F.avg("__lp")), 6).alias("ppl"),
    )


def unigram_logprob(
    corpus: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Per-doc mean negative log-likelihood under the corpus's own
    unigram distribution (the CCNet/Wenzek et al. 2020 shape: language-
    model perplexity as a quality score, with the corpus unigram table
    standing in for the LM — docs of rare tokens score high, boilerplate
    of frequent tokens scores low).

    Distributed shape: one vocabulary-sized groupBy (map-side combined;
    the shuffle carries <= vocab rows per partition), then the frequency
    table — at most vocab (~50k) rows regardless of corpus size —
    BROADCASTS back onto the exploded corpus, so the scoring pass is
    narrow: no corpus-scale shuffle except the per-doc re-aggregation
    keyed by doc_id. Token arrays themselves never shuffle.

    Emits (doc_id, n_tok, avg_nll, ppl), rounded to 6 decimals for
    cross-engine replay.
    """
    toks = corpus.select(F.col(id_col), F.explode(tokens_col).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
    total = freq.agg(F.sum("__n").alias("__total"))
    logp = freq.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("__n") / F.col("__total")).alias("__logp")
    )
    return (
        toks.join(F.broadcast(logp), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tok"),
            F.round(-F.avg("__logp"), 6).alias("avg_nll"),
            F.round(F.exp(-F.avg("__logp")), 6).alias("ppl"),
        )
    )
