"""Large-scale dedup for training corpora: exact, n-gram Jaccard,
MinHash(+LSH), SimHash, embedding-cosine.

Design points for the 100 TB case:
- exact dedupe hashes the text ONCE (md5 projection) and shuffles only
  (hash, doc_id) — never the text bodies;
- shingling explodes to (doc_id, shingle) rows; the self-join for
  Jaccard is shuffle-heavy and only correct for bounded corpora — the
  scale path is MinHash banding (lsh_candidate_pairs) which shuffles
  (band_key → doc_id) buckets instead of the cross-join;
- the hash everywhere is md5-derived (60-bit) so results are portable
  across engines (the DuckDB oracle reproduces them bit-for-bit) —
  xxhash64 would be faster but engine-specific; swap via the `hasher`
  arg in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _release_after_compute(df: DataFrame, cached: DataFrame) -> DataFrame:
    """Release `cached` once the returned frame is consumed, so repeated
    calls in a long-lived session don't leak cached blocks: the frame's
    collect()/toPandas()/count() are wrapped to unpersist afterwards,
    and an explicit `release()` handle covers any other consumer
    (write, further transformations, tests)."""
    def _wrap(action):
        def run(*a, **kw):
            try:
                return action(*a, **kw)
            finally:
                cached.unpersist()
        return run

    for name in ("collect", "toPandas", "count"):
        setattr(df, name, _wrap(getattr(df, name)))
    df._cached_dep = cached
    df.release = lambda: cached.unpersist()
    return df


def md5_long(col: Column) -> Column:
    """Portable 60-bit hash (matches ('0x'||substr(md5,1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    keeper (min id) and copy count."""
    return docs.groupBy(md5_long(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only the keeper row per distinct text (min id wins)."""
    keepers = exact_duplicates(docs, text_col, id_col).select(F.col("keeper").alias(id_col))
    return docs.join(keepers, on=id_col, how="left_semi")


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) rows: distinct n-word shingles per document.
    Degenerate docs (< n words) contribute their first-words shingle,
    mirroring the oracle's greatest(len-1, 1) guard.

    The input is repartitioned first: shingling is compute-dense (HOF
    transform + array_distinct + explode), and a single-row-group
    parquet scan would otherwise pin the whole map side to one task.
    One cheap shuffle of the raw text buys full-width parallelism on
    the expensive stage — the standard move whenever compute-per-byte
    is high relative to scan width."""
    docs = docs.repartition(id_col)
    ws = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *[F.get(ws, i + j) for j in range(n)]))
    return docs.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via shingle equi-join.

    Correct but O(pairs-sharing-a-shingle) — the verification/baseline
    path. At corpus scale use minhash_signatures + lsh_candidate_pairs
    to cut candidate generation to banded buckets.

    The shingle set feeds three plan branches (two join sides + sizes);
    persist it so the explode runs once. At corpus scale you'd write it
    to a bucketed table instead of caching. Lifecycle: the returned
    frame releases the cached blocks after its first collect/toPandas/
    count (or explicitly via `.release()`), so a long-lived session
    calling this repeatedly does not accumulate cached RDDs.

    `shingle_df` supplies a precomputed (id, shingle) table — the
    shared-scan path when minhash / jaccard / decontamination run over
    the same corpus in one job (see shared_shingles): the caller owns
    its lifecycle and the per-call persist/release wrapper is skipped."""
    if shingle_df is not None:
        sh = shingle_df
    else:
        sh = shingles(docs, n, text_col, id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )
    if shingle_df is None:
        out = _release_after_compute(out, sh)
    return out


# Mersenne prime 2^31-1: affine minhash permutations stay in exact
# int64 range in every engine (a*x products < 2^62 — DuckDB raises on
# BIGINT overflow where Spark would wrap, so the arithmetic must be
# portable-exact, not wrap-dependent)
_MINHASH_P = 2_147_483_647
# (a, b) pairs: any fixed odd multipliers work; these are LCG classics
MINHASH_PERMS = ((1_664_525, 1_013_904_223), (22_695_477, 1), (69_069, 12_345), (1_103_515_245, 12_345))


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    salts: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_df: DataFrame | None = None,
    perms: tuple[tuple[int, int], ...] = MINHASH_PERMS,
) -> DataFrame:
    """MinHash signature per doc, one column h{i} per permutation. One
    explode + one groupBy; the min() aggregations are map-side combined
    so the shuffle carries one row per (doc, partial). `shingle_df`
    supplies a precomputed shared (id, shingle) table (shared_shingles).

    Default permutations are AFFINE over one md5 base hash:
    h_i = (a_i * (md5_long(shingle) % P) + b_i) % P, P = 2^31-1 —
    one digest per shingle instead of one per permutation. Measured at
    sf0.1 the salted-md5 path spent ~75% of its aggregate time in the
    k extra digests; the affine family is the standard MinHash
    construction (universal hashing) and stays engine-portable (exact
    int64 arithmetic, no overflow wrap — DuckDB replays it verbatim).
    Pass `salts` for the legacy one-digest-per-permutation form."""
    sh = shingle_df if shingle_df is not None else shingles(docs, n, text_col, id_col)
    if salts is not None:
        aggs = [
            F.min(md5_long(F.concat(F.lit(s), F.col("shingle")))).alias(f"h{i}")
            for i, s in enumerate(salts)
        ]
    else:
        base = F.pmod(md5_long(F.col("shingle")), F.lit(_MINHASH_P))
        aggs = [
            F.min(F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MINHASH_P))).alias(f"h{i}")
            for i, (a, b) in enumerate(perms)
        ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: list[list[str]], id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding: docs sharing ANY band (all hashes in the band equal)
    become a candidate pair. `bands` is a list of signature-column
    groups, e.g. [["h0","h1"],["h2","h3"]]. Shuffles (band_key, id) —
    linear in corpus size, no cross-join. Signatures are persisted:
    every band reads them twice (both join sides), and recomputing the
    MinHash per branch would multiply the shingling cost by 2×bands."""
    signatures = signatures.persist()  # read by every band twice; released below
    pair_sets = []
    for band_cols in bands:
        key = F.xxhash64(*[F.col(c) for c in band_cols])
        bucketed = signatures.select(F.col(id_col), key.alias("band_key"))
        a = bucketed.select(F.col(id_col).alias("id_a"), "band_key")
        b = bucketed.select(F.col(id_col).alias("id_b"), "band_key")
        pair_sets.append(
            a.join(b, "band_key").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.unionByName(p)
    return _release_after_compute(out.distinct(), signatures)


def simhash(docs: DataFrame, bits: int = 48, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over distinct whitespace tokens: bit j of the fingerprint
    is the sign of sum(±1) over tokens' hash-bit j. Expressed as one
    explode + one groupBy with `bits` conditional sums — fully
    map-side-combinable, no window functions.

    `bits` must be <= 60 (md5_long yields 60 portable bits). The default
    is 48: a 16-bit fingerprint saturates its 65k-value space at ~10^5
    docs, at which point "Hamming distance <= d" stops meaning "similar"
    (measured: 14% of ALL pairs within d=3 at 10^3 docs) and the banded
    near-pair join degrades to quadratic. 48 bits keeps collision-born
    false neighbors negligible through ~10^12 docs."""
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    toks = docs.repartition(id_col).select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    h = md5_long(F.col("tok"))
    hashed = toks.select(id_col, h.alias("h"))
    bit_terms = []
    for j in range(bits):
        bit_j = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
        signed = F.when(bit_j == 1, 1).otherwise(-1)
        bit_terms.append(
            F.when(F.sum(signed) > 0, F.lit(1 << j)).otherwise(F.lit(0)).alias(f"b{j}")
        )
    agged = hashed.groupBy(id_col).agg(*bit_terms)
    total = agged.columns[1]
    expr = F.col(agged.columns[1])
    for c in agged.columns[2:]:
        expr = expr + F.col(c)
    return agged.select(id_col, expr.alias("simhash"))


def hamming_near_pairs(
    sim: DataFrame,
    max_dist: int = 2,
    bits: int = 48,
    id_col: str = "doc_id",
    n_seg: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance ≤ max_dist. Result is
    identical to the brute-force all-pairs scan; the plan is built for
    the dedup-heavy distribution this operator exists for:

    1. COLLAPSE: group ids by fingerprint (one shuffle, map-side
       combined). Near-dup corpora concentrate massively — a segment-
       bucket join over raw docs would be quadratic in the hottest
       duplicate group, which is precisely the skew this step removes.
    2. BAND over DISTINCT fingerprints: pigeonhole split into `n_seg`
       segments — a pair within distance max_dist differs in ≤ max_dist
       segments, so it agrees EXACTLY on some (n_seg − max_dist)-subset
       of them (Manku/Jain/Sarma, WWW'07 §3, generalized from the
       classic n_seg = max_dist+1 case). Every fingerprint is exploded
       into C(n_seg, max_dist) combination keys (hash of combo id + the
       chosen segment values) and ONE self-equi-join over the distinct
       fingerprint set yields candidates, verified exactly with
       bit_count(xor). No cross join anywhere; one shuffle of
       C(n_seg, max_dist) × |distinct fps| narrow rows.
    3. EXPAND: surviving fingerprint pairs join back to their member
       lists and explode — output-bound work; intra-group pairs
       (distance 0) explode directly. Groups are disjoint so no final
       distinct is needed.

    `n_seg` is the scale dial: the combination key carries
    bits·(n_seg−max_dist)/n_seg bits, and each key bucket goes
    quadratic once distinct fingerprints ≫ 2^key_bits. The default
    max_dist+1 (key = one segment) is right for ≤ ~2^(bits/(d+1))
    docs; raise it as the corpus grows (e.g. bits=48, d=3, n_seg=6 →
    20 combos on 24-bit keys: good to ~10^7 distinct fps; n_seg=8 →
    56 combos on 30-bit keys: ~10^9). Cost grows as C(n_seg, d) while
    bucket load shrinks exponentially — measured at 500k docs,
    n_seg=6 turned a 202 s run into single-digit seconds.

    At extreme scale the duplicate-group member lists are the exact-dup
    mass; run exact dedup first (standard pipeline order) or emit
    (keeper, member) edges instead of all pairs.
    """
    import itertools

    n_seg = n_seg or (max_dist + 1)
    if not max_dist < n_seg <= bits:
        raise ValueError(f"need max_dist < n_seg <= bits, got {max_dist=} {n_seg=} {bits=}")
    groups = sim.groupBy("simhash").agg(F.collect_list(id_col).alias("ids"))

    base, rem = divmod(bits, n_seg)
    bounds: list[tuple[int, int]] = []
    start = 0
    for i in range(n_seg):
        ln = base + (1 if i < rem else 0)
        bounds.append((start, ln))
        start += ln

    def seg_expr(i: int) -> Column:
        seg_start, seg_len = bounds[i]
        return F.shiftright(F.col("simhash"), seg_start).bitwiseAND(F.lit((1 << seg_len) - 1))

    combos = list(itertools.combinations(range(n_seg), n_seg - max_dist))
    keys = [
        F.xxhash64(F.lit(ci), *[seg_expr(i) for i in combo])
        for ci, combo in enumerate(combos)
    ]
    fps = groups.select(F.col("simhash"))
    keyed = fps.select(F.col("simhash"), F.explode(F.array(*keys)).alias("bkey"))
    a = keyed.select(F.col("simhash").alias("sa"), "bkey")
    b = keyed.select(F.col("simhash").alias("sb"), "bkey")
    dist = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    fp_pairs = (
        a.join(b, "bkey")
        .filter((F.col("sa") < F.col("sb")) & (dist <= max_dist))
        .select("sa", "sb", dist.alias("hamming"))
        .distinct()
    )

    ga = groups.select(F.col("simhash").alias("sa"), F.col("ids").alias("ids_a"))
    gb = groups.select(F.col("simhash").alias("sb"), F.col("ids").alias("ids_b"))
    inter = (
        fp_pairs.join(ga, "sa")
        .join(gb, "sb")
        .select(F.explode("ids_a").alias("ia"), "ids_b", "hamming")
        .select("ia", F.explode("ids_b").alias("ib"), "hamming")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    intra = (
        groups.filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("ia"), "ids")
        .select("ia", F.explode("ids").alias("ib"))
        .filter(F.col("ia") < F.col("ib"))
        .select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    return inter.unionByName(intra)


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_shingles: DataFrame | None = None,
    benchmark_shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing
    >= `min_hits` distinct n-gram shingles with a benchmark/eval set —
    the standard guard against test-set leakage in a training corpus.

    Scale shape: the benchmark side is small by nature (eval sets are
    KBs-MBs against a 100 TB corpus), so its distinct shingle set
    BROADCASTS; the corpus side is one linear shingle explode and the
    join is broadcast-hash — no shuffle of corpus text, and the
    aggregation carries one (doc, hits) row per contaminated doc only
    (inner join drops clean shingles before the groupBy).

    Returns (id, n_hits) for contaminated docs; anti-join against it to
    scrub (same keep-shape as components.keep_representatives).

    `corpus_shingles` / `benchmark_shingles` supply precomputed
    (id, shingle) tables for the shared-scan path (shared_shingles)."""
    corpus_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingles(docs, n, text_col, id_col)
    )
    bench_sh = (
        benchmark_shingles
        if benchmark_shingles is not None
        else shingles(benchmark, n, text_col, id_col)
    ).select("shingle").distinct()
    hits = corpus_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy(id_col)
        .agg(F.countDistinct("shingle").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def shared_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One persisted (id, shingle) table serving every shingle consumer
    in a dedup job — minhash_signatures, ngram_jaccard_pairs and
    contamination_flags each accept it via their *shingles arguments.

    Shingling is the compute-dense stage of all three (HOF transform +
    array_distinct + explode over the full text); computing it once and
    sharing the result turns three corpus scans into one. At 100 TB
    this is a bucketed table written to storage (bucketBy shingle for
    the jaccard self-join, or by id for the minhash groupBy) rather
    than an in-memory persist — same plan position, durable medium.

    Caller owns the lifecycle: `.unpersist()` when the job's consumers
    have all run."""
    return shingles(docs, n, text_col, id_col).persist()
