"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(Q×N), fine when the query
set is small enough to broadcast. Scale path: LSH-bucketed (random
hyperplane signs) candidate generation so N never cross-joins N.

All vector math is built-in expressions (zip_with + aggregate) —
JVM-side, no Python. A vectorized pandas-UDF variant is provided for
wide embeddings where numpy's SIMD beats codegen'd loops.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def __getattr__(name):  # pragma: no cover - thin compat shim
    # The exact exhaustive twins (brute_force_topk, all_pairs_neardup)
    # moved to vector_spark.training.baselines — TEST-ONLY oracles whose
    # driver-collect / O(Q x N) shapes must not look like production
    # paths. Old imports keep working; new code should import from
    # `baselines` explicitly and know what it is asking for.
    if name in ("brute_force_topk", "all_pairs_neardup"):
        from vector_spark.training import baselines

        return getattr(baselines, name)
    raise AttributeError(name)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived ±1 comps) —
    no RNG state, reproducible across runs and engines."""
    import hashlib

    planes = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            comps.append(1.0 if h[0] % 2 == 0 else -1.0)
        planes.append(comps)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH signature as a bit-packed long."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    q_id: str = "qid",
    q_vec: str = "qe",
    c_id: str = "cid",
    c_vec: str = "ce",
) -> DataFrame:
    """Approximate top-k: bucket both sides by hyperplane signs, score
    only same-bucket pairs. The equi-join on bucket replaces the cross
    join — the 100 TB path (recall < 1.0; raise recall by probing
    neighboring buckets or unioning several plane sets)."""
    planes = random_hyperplanes(dim, n_planes)
    qb = queries.withColumn("bucket", lsh_bucket(F.col(q_vec), planes))
    cb = candidates.withColumn("bucket", lsh_bucket(F.col(c_vec), planes))
    pairs = cb.join(F.broadcast(qb), on="bucket")
    scored = pairs.select(q_id, c_id, cosine(F.col(q_vec), F.col(c_vec)).alias("cos_raw"))
    w = Window.partitionBy(q_id).orderBy(F.col("cos_raw").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def dot_pandas_udf():
    """Arrow-vectorized dot product matching the HOF `dot` numerics:
    products rounded in the input precision (float32 for array<float>,
    exactly what zip_with's x*y does), accumulated in float64. The only
    divergence from the sequential HOF fold is float64 addition order
    (~1e-15), far below any rounding the oracles compare at."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.stack(a.to_numpy())
        vb = np.stack(b.to_numpy())
        return pd.Series((va * vb).sum(axis=1, dtype=np.float64))

    return _dot


def cosine_pandas_udf():
    """Arrow-vectorized cosine for wide embeddings: numpy batch kernel.
    Use when dim ≳ 512 makes the expression-tree loop the bottleneck."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.stack(a.to_numpy())
        vb = np.stack(b.to_numpy())
        num = (va * vb).sum(axis=1)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        return pd.Series(num / den)

    return _cos


# ---------------------------------------------------------------- IVF


def ivf_centroids(df, n_cells: int, id_col: str, vec_col: str):
    """Deterministic coarse quantizer: the centroid set is the n_cells
    rows with the smallest xxhash64(id) — reproducible across runs and
    engines, no RNG, no iterative training. `ivf_centroids_lloyd`
    refines this seed set with spherical k-means rounds when bucketing
    quality matters more than bit-determinism."""
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h", id_col)
        .limit(n_cells)
        .collect()
    )
    mat = np.array([r[1] for r in rows], dtype=np.float32)
    nrm = np.sqrt((mat * mat).sum(axis=1, dtype=np.float64))
    return mat, nrm


def ivf_assign(df, centroids, nprobe: int, id_col: str, vec_col: str) -> DataFrame:
    """Attach the ``nprobe`` nearest cells to every row (one output row
    per (id, cell)). Arrow-batched; the centroid matrix is broadcast.
    At 10^12 scale the assignment output is what you'd write as the
    partition/bucket column of the index table."""
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    id_dtype = [f.dataType.simpleString() for f in df.schema.fields if f.name == id_col][0]
    schema = f"{id_col} {id_dtype}, {vec_col} array<float>, cell int"

    def assign(batches):
        mat, nrm = bc.value
        for pdf in batches:
            ids, vecs, cells = [], [], []
            for i, v in zip(pdf[id_col].to_numpy(), pdf[vec_col]):
                va = np.asarray(v, dtype=np.float32)
                dots = (mat * va).sum(axis=1, dtype=np.float64)
                cos = dots / (np.sqrt((va * va).sum(dtype=np.float64)) * nrm)
                top = np.argsort(-cos)[:nprobe]
                for c in top:
                    ids.append(i)
                    vecs.append(v)
                    cells.append(int(c))
            yield pd.DataFrame({id_col: ids, vec_col: vecs, "cell": cells})

    return df.repartition(id_col).select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_centroids_lloyd(
    df: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    iters: int = 3,
):
    """Spherical k-means (Lloyd) refinement of the hash-seeded coarse
    quantizer: per round, every vector is assigned to its nearest cell
    (Arrow-batched, one pass) and the new centroid is the per-cell
    component mean — computed distributedly as a posexplode +
    groupBy(cell, pos) partial-aggregated mean, so only n_cells × dim
    tiny rows ever reach the driver. Empty cells keep their previous
    centroid. The round count is fixed (no convergence action needed —
    inertia is monotone non-increasing, pytest-asserted).

    Determinism note: float mean summation order varies with
    partitioning, so centroid bits can differ at ULP level between
    cluster layouts — fine for an approximate index, which is why the
    driver-checked `ivf_topk` oracle query keeps the exact
    (nprobe == n_cells) mode instead."""
    import numpy as np

    cents = ivf_centroids(df, n_cells, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(df, cents, 1, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        mat = cents[0].astype(np.float64).copy()
        seen = set()
        for r in means:
            mat[r["cell"], r["pos"]] = r["m"]
            seen.add(r["cell"])
        mat = mat.astype(np.float32)
        nrm = np.sqrt((mat * mat).sum(axis=1, dtype=np.float64))
        nrm[nrm == 0] = 1.0
        cents = (mat, nrm)
    return cents


def ivf_inertia(df: DataFrame, centroids, id_col: str, vec_col: str) -> float:
    """Mean cosine distance (1 - cos) of every vector to its assigned
    centroid — the quantity Lloyd iterations minimize."""
    assigned = ivf_assign(df, centroids, 1, id_col, vec_col)
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    import pandas as pd

    def score(batches):
        mat, nrm = bc.value
        for pdf in batches:
            out = []
            for v, c in zip(pdf[vec_col], pdf["cell"]):
                va = np.asarray(v, dtype=np.float32)
                dot = (mat[c] * va).sum(dtype=np.float64)
                out.append(1.0 - dot / (np.sqrt((va * va).sum(dtype=np.float64)) * nrm[c]))
            yield pd.DataFrame({"d": out})

    row = assigned.mapInPandas(score, "d double").agg(F.avg("d")).first()
    return float(row[0])


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    q_id: str = "qid",
    q_vec: str = "qe",
    c_id: str = "cid",
    c_vec: str = "ce",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: candidates are bucketed by nearest
    centroid (1 cell each); each query probes its ``nprobe`` nearest
    cells; only same-cell pairs are scored. Exact when
    nprobe == n_cells (every cell probed → identical to brute force).
    The 100 TB shape: the candidate assignment is a one-off index build
    written bucketed-by-cell; per query batch only nprobe/n_cells of the
    corpus shuffles into scoring. ``refine_iters`` > 0 runs that many
    Lloyd rounds on the quantizer before assignment (better-balanced
    cells, higher recall at the same nprobe)."""
    if refine_iters > 0:
        cents = ivf_centroids_lloyd(candidates, n_cells, c_id, c_vec, refine_iters)
    else:
        cents = ivf_centroids(candidates, n_cells, c_id, c_vec)
    cand_cells = ivf_assign(candidates, cents, 1, c_id, c_vec)
    q_cells = ivf_assign(queries, cents, nprobe, q_id, q_vec)

    dot_udf = dot_pandas_udf()
    cb = cand_cells.withColumn("_nc", norm(F.col(c_vec)))
    qb = q_cells.withColumn("_nq", norm(F.col(q_vec)))
    pairs = cb.join(F.broadcast(qb), on="cell")
    scored = pairs.select(
        q_id, c_id, (dot_udf(F.col(q_vec), F.col(c_vec)) / (F.col("_nq") * F.col("_nc"))).alias("cos_raw")
    ).dropDuplicates([q_id, c_id])
    w = Window.partitionBy(q_id).orderBy(F.col("cos_raw").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 0,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_target: int = 512,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    into k cells, compare pairs ONLY within a cell, and mark a row as a
    semantic duplicate when some other same-cell row with a smaller id
    sits above the cosine threshold (the paper keeps one exemplar per
    near-dup group; smaller-id-wins is the deterministic tie policy).

    Distributed shape: the quantizer is the n_cells rows with the
    smallest portable md5 hash of their id (no RNG, replayable by any
    engine — swap for ivf_centroids_lloyd when cell balance matters
    more than bit-determinism). Assignment is NARROW: the centroid
    matrix broadcasts and every row argmaxes in an Arrow batch — no
    shuffle, mirroring ivf_assign. The only corpus-scale shuffle is the
    within-cell self-join keyed on cell; per-cell work is quadratic in
    cell size, which is the SemDeDup contract (n_cells grows with the
    corpus so cells stay bounded — the paper uses ~10k-100k-row cells).

    Assignment ranks on round(cos, 4) with ties to the smallest cell id
    so Spark and external engines agree bit-for-bit; pair cosines
    compare unrounded (same contract as all_pairs_neardup).

    `n_cells=0` (the default) sizes the codebook from the data:
    ceil(count / cell_target) cells, min 16 — cells stay ~cell_target
    rows as the corpus grows, so total pair work is
    ~cell_target x count = LINEAR, the paper's contract. A fixed
    n_cells (the oracle-pinned registry form) is quadratic in corpus
    size and only appropriate when n is known and bounded. At
    billion-row scale the collected codebook itself grows (count/512
    centroids broadcast to every executor); past ~10^8 rows raise
    cell_target or swap the quantizer for ivf_centroids_lloyd with a
    coarse-then-fine assignment.

    Emits (vec_id, cell_id, max_cos, is_dup): every input row, its
    cell (labelled by the centroid's id), the max cosine to any
    same-cell neighbor (null for singleton cells), and the dup flag.
    """
    import math

    import numpy as np

    from vector_spark.training.dedup import md5_long

    spark = emb.sparkSession
    if not n_cells:
        n_cells = max(16, math.ceil(emb.count() / cell_target))
    cents = (
        emb.select(id_col, vec_col)
        .orderBy(md5_long(F.col(id_col).cast("string")), id_col)
        .limit(n_cells)
        .collect()
    )
    c_ids = [r[0] for r in cents]
    c_mat = np.array([r[1] for r in cents], dtype=np.float32)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1, dtype=np.float64))
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_nrm))
    id_dtype = [f.dataType.simpleString() for f in emb.schema.fields if f.name == id_col][0]
    schema = f"{id_col} {id_dtype}, {vec_col} array<float>, cell_id {id_dtype}"

    def assign(batches):
        ids_c, mat, nrm = bc.value
        # priority = rank of the centroid's id, so round-4 ties go to
        # the smallest cell id in ANY engine's replay
        pri = np.argsort(np.argsort(np.asarray(ids_c, dtype=object)))
        for pdf in batches:
            cells = []
            for v in pdf[vec_col]:
                va = np.asarray(v, dtype=np.float32)
                dots = (mat * va).sum(axis=1, dtype=np.float64)
                cos = np.round(dots / (np.sqrt((va * va).sum(dtype=np.float64)) * nrm), 4)
                best = np.lexsort((pri, -cos))[0]
                cells.append(ids_c[best])
            yield pd.DataFrame(
                {id_col: pdf[id_col], vec_col: pdf[vec_col], "cell_id": cells}
            )

    # the assignment feeds THREE plan branches (self-join sides a and b
    # plus the left-join probe); mapInPandas sits above the exchange, so
    # without a persist the full scan + Arrow argmax would run 3x.
    # The cache is released via the same convention as minhash/shingles:
    # the returned frame's collect/toPandas/count unpersist it, and a
    # .release() handle covers write()/other consumers (see
    # _release_after_compute).
    assigned = (
        emb.repartition(id_col).select(id_col, vec_col).mapInPandas(assign, schema).persist()
    )

    a = assigned.select(
        F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"), "cell_id"
    )
    b = assigned.select(
        F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"), "cell_id"
    )
    pair_cos = cosine(F.col("__va"), F.col("__vb"))
    stats = (
        a.join(b, "cell_id")
        .where(F.col("__ida") != F.col("__idb"))
        .select(
            F.col("__ida"),
            pair_cos.alias("__cos"),
            (F.col("__idb") < F.col("__ida")).alias("__smaller"),
        )
        .groupBy("__ida")
        .agg(
            F.max("__cos").alias("__mc"),
            F.max(
                F.when(F.col("__smaller") & (F.col("__cos") >= threshold), 1).otherwise(0)
            ).alias("__dup"),
        )
    )
    from vector_spark.training.dedup import _release_after_compute

    out = (
        assigned.join(stats, assigned[id_col] == stats["__ida"], "left")
        .select(
            id_col,
            "cell_id",
            F.round("__mc", 4).alias("max_cos"),
            F.coalesce(F.col("__dup") == 1, F.lit(False)).alias("is_dup"),
        )
    )
    return _release_after_compute(out, assigned)


def auto_band_planes(n_rows: int, bucket_target: int = 256, floor: int = 4) -> int:
    """Planes per band so a band's bucket space holds ~bucket_target
    rows per bucket: p = ceil(log2(n / bucket_target)). A FIXED p is a
    fixed 2^p-bucket space, and same-bucket pair work grows
    quadratically with the corpus (measured: 8 planes = 256 buckets was
    fine at 20k vectors and an ENOSPC-grade 312M-candidate blowup at
    200k); growing p with log2(n) keeps expected bucket occupancy — and
    with it per-band candidate count, n x bucket_target — LINEAR."""
    import math

    return max(floor, math.ceil(math.log2(max(n_rows / max(bucket_target, 1), 2.0))))


def estimate_lsh_recall(threshold: float, n_bands: int, band_planes: int) -> float:
    """Expected recall of sign-LSH banding for a pair at exactly
    `threshold` cosine: per-plane collision q = 1 - acos(t)/pi, a band
    collides with q^p, any-of-b bands → 1 - (1 - q^p)^b. Pairs above
    the threshold do better, so this is the worst-case (boundary)
    recall the b/r tradeoff must defend."""
    import math

    q = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - q ** band_planes) ** n_bands


def auto_lsh_params(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.9,
    bucket_target: int = 256,
    floor: int = 4,
    max_bands: int = 64,
) -> tuple[int, int]:
    """Joint (n_bands, band_planes) from the standard LSH b·r tradeoff.

    p comes from bucket occupancy (auto_band_planes) so per-band
    candidate volume stays ~n·bucket_target — linear in the corpus.
    Holding b fixed while p grows with log2(n) makes recall decay
    GEOMETRICALLY (at cosine 0.9: ~0.61 with b=4/p=10 at 200k rows,
    ~0.44 at p=13/2M rows), so b must grow with p:
        b = ceil( ln(1-target) / ln(1-q^p) ),  q = 1 - acos(t)/pi.
    b grows slowly (≈ q^-p scaled), and total candidate volume stays
    b·n·bucket_target — still linear in n per decade, which is the
    100 TB contract. Capped at max_bands as a runaway guard (hit only
    for thresholds far below any dedup setting; the cap is reported by
    the caller via estimate_lsh_recall)."""
    p = auto_band_planes(n_rows, bucket_target, floor)
    return bands_for_recall(threshold, p, target_recall, max_bands), p


def bands_for_recall(threshold: float, band_planes: int,
                     target_recall: float = 0.9, max_bands: int = 64) -> int:
    """Bands needed so boundary-cosine recall reaches target_recall at a
    given per-band width: b = ceil(ln(1-target) / ln(1-q^p))."""
    import math

    q = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    band_hit = q ** band_planes
    if band_hit >= 1.0 - 1e-12:
        return 1
    b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - band_hit))
    return max(1, min(max_bands, b))


def lsh_near_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_bands: int = 0,
    band_planes: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_target: int = 256,
    target_recall: float = 0.9,
) -> DataFrame:
    """Near-dup PAIRS at scale: LSH banding instead of the all-pairs
    scan. Each band hashes every vector to a `band_planes`-bit
    hyperplane-sign bucket (independent plane set per band, seeded by
    band index); same-bucket pairs within ANY band become candidates
    via a per-band equi-join — no cross join and no driver-side collect
    (the shape `all_pairs_neardup`'s broadcast-build contract can't
    reach). An exact cosine verify keeps precision at 100%; recall is
    tunable with n_bands / band_planes (more bands → higher recall,
    more candidates; more planes → fewer candidates, lower recall — at
    high p favor more bands, or the semantic_dedup cell path whose
    recall is occupancy- not angle-driven).

    `band_planes=0` (the default) auto-sizes the bucket space from the
    data: p = ceil(log2(count / bucket_target)), the same
    grow-the-codebook contract as semantic_dedup's n_cells=0. A fixed p
    (the oracle-pinned registry form) is quadratic in corpus size —
    2^p buckets saturate — and only appropriate when n is known and
    bounded. Costs one count() job (over a frame persisted for the
    2·b band scans + the two join-backs, released on first consumption
    via the _release_after_compute convention).

    `n_bands=0` (the default) derives b JOINTLY with p from the
    standard b·r tradeoff (auto_lsh_params): recall at the threshold is
    1-(1-q^p)^b, so a fixed b under a growing p under-recalls large
    corpora geometrically — b must scale with p to hold
    `target_recall`. The resolved plan is exposed on the returned frame
    as `df.lsh_params = {n_bands, band_planes, est_recall}` so callers
    can put it in lineage; an explicit n_bands>0 is honored as given
    (the oracle-pinned forms) with est_recall still reported.

    Candidates travel as bare (id_a, id_b) pairs — vectors join back
    AFTER the cross-band dedup, so the wide rows cross the shuffle once
    per SIDE, not once per candidate (at 200k x dim-64 the carry-through
    form shuffled ~160 GB and died; join-back ships 16-byte pairs and
    lets AQE broadcast the vector side when it fits)."""
    from vector_spark.training.dedup import _release_after_compute

    auto = not band_planes or not n_bands
    if auto:
        emb = emb.persist()  # count + 2·b band scans + 2 join-backs
    if not band_planes and not n_bands:
        n_bands, band_planes = auto_lsh_params(
            emb.count(), threshold, target_recall, bucket_target)
    elif not band_planes:
        band_planes = auto_band_planes(emb.count(), bucket_target)
    elif not n_bands:
        n_bands = bands_for_recall(threshold, band_planes, target_recall)
    est_recall = estimate_lsh_recall(threshold, n_bands, band_planes)
    pair_sets = []
    for band in range(n_bands):
        planes = random_hyperplanes(dim, band_planes, seed=1000 + band)
        keyed = emb.select(
            F.col(id_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
        )
        a = keyed.select(F.col(id_col).alias("id_a"), "bucket")
        b = keyed.select(F.col(id_col).alias("id_b"), "bucket")
        pair_sets.append(
            a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    cands = pair_sets[0]
    for p in pair_sets[1:]:
        cands = cands.unionByName(p)
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    cos = cosine(F.col("__va"), F.col("__vb"))
    out = (
        cands.dropDuplicates(["id_a", "id_b"])
        .join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", "cos_raw")
    )
    if auto:
        out = _release_after_compute(out, emb)
    else:
        out.release = lambda: None  # uniform caller contract
    out.lsh_params = {
        "n_bands": n_bands,
        "band_planes": band_planes,
        "est_recall": round(est_recall, 4),
    }
    return out
