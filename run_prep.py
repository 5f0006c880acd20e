#!/usr/bin/env python
"""spark-submit entry point for the full training-data prep pipeline.

Chains the training tier end-to-end the way a corpus build actually
runs it — quality filter → exact dedup → fuzzy dedup (MinHash-LSH →
connected components → keep representatives) → optional embedding-space
dedup (LSH-banded near-dup clustering and/or SemDeDup cells — ALWAYS
the banded paths; the exact all-pairs twins live in
training/baselines.py as test oracles and are not CLI-reachable) →
optional domain-mix resampling → optional DSIR target-domain selection
→ optional benchmark decontamination → tokenize → pack into
fixed-length training sequences → partitioned parquet write — and
prints ONE JSON line of per-stage lineage (rows in/out, per-source row
counts, tokens, wall seconds) plus pack fill efficiency.

    spark-submit --master local[8] --py-files vector_spark.zip \
        run_prep.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/prep_out --ctx-len 256

Every stage is the scale path: the quality pass is one narrow
projection (Column expressions + one Arrow-batched struct UDF for the
Gopher repetition metrics), dedup never cross-joins, the packer's
tokens cross the shuffle exactly once, and the final write partitions
by hash shard so downstream loaders get even splits. At 100 TB the
only change is pointing --input at the Iceberg table and sizing
spark.sql.shuffle.partitions.

Quality thresholds default to the Gopher paper's (Rae et al. 2021,
table A1) where we implement the metric, loosened where the synthetic
fixture corpus is not web text; every threshold is a flag.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", default=None, help="packed-sequence output dir (omit for stats-only)")
    ap.add_argument("--benchmark", default=None, help="optional benchmark parquet to decontaminate against")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--ctx-len", type=int, default=256)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--pack-mode", choices=["concat", "whole-doc"], default="concat",
                    help="concat: GPT-style stream packing (splits docs at chunk "
                    "boundaries); whole-doc: next-fit binning, never splits a doc")
    # quality thresholds (Gopher A1 defaults where applicable)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-words", type=int, default=10_000_000)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.30)
    ap.add_argument("--max-dup-line-char-frac", type=float, default=0.20)
    ap.add_argument("--max-top2gram-char-frac", type=float, default=1.0)
    ap.add_argument("--max-dup5gram-frac", type=float, default=1.0)
    ap.add_argument("--min-distinct-ratio", type=float, default=0.0)
    ap.add_argument("--mix-alpha", type=float, default=None,
                    help="temperature for domain-mix resampling over the `source` "
                    "column after dedup (p_i ∝ q_i^α; downsample-only); omit to skip")
    ap.add_argument("--dsir-target", default=None,
                    help="optional target-domain documents parquet: keep the "
                    "--dsir-keep docs closest to it by DSIR importance weight "
                    "(hashed-bigram Gumbel-top-k; Xie et al. 2023)")
    ap.add_argument("--dsir-keep", type=int, default=None,
                    help="number of docs DSIR selection keeps (required with --dsir-target)")
    ap.add_argument("--exact-substr-window", type=int, default=None,
                    help="ExactSubstr dedup (Lee et al. 2021) after tokenize: excise "
                    "every duplicated N-token run, keeping the corpus-first copy; "
                    "omit to skip")
    # embedding-space dedup — BANDED paths only (the exact all-pairs /
    # brute-force twins live in training/baselines.py as test oracles
    # and are deliberately not reachable from this CLI: nothing here
    # collects an embedding table to the driver).
    ap.add_argument("--embeddings", default=None,
                    help="embedding parquet (vec_id, embedding array<float>) keyed to "
                    "doc_id; required by --semantic-dedup-cells / --embedding-neardup")
    ap.add_argument("--semantic-dedup-cells", type=int, default=None,
                    help="SemDeDup (Abbas et al. 2023): cluster embeddings into N cells "
                    "and drop rows with a smaller-id same-cell neighbor above "
                    "--semantic-dedup-threshold; pair work is cell-bounded (banded path). "
                    "0 = auto-size cells from the corpus (ceil(n/512), min 16) so total "
                    "pair work stays linear as the input grows")
    ap.add_argument("--semantic-dedup-threshold", type=float, default=0.35)
    ap.add_argument("--embedding-neardup", type=float, default=None, metavar="COS",
                    help="embedding near-dup dedup: LSH-banded candidate pairs at "
                    "cosine >= COS -> connected components -> keep the min-id "
                    "representative per cluster (banded path, linear shuffle)")
    ap.add_argument("--neardup-bands", type=int, default=0,
                    help="LSH bands; 0 = derive jointly with --neardup-planes "
                         "from the b*r tradeoff so boundary recall holds ~0.9 "
                         "as the corpus (and with it the auto plane count) "
                         "grows. Default changed 4 -> 0 in round 5; the "
                         "resolved plan is recorded in the stage lineage")
    ap.add_argument("--neardup-planes", type=int, default=0,
                    help="planes per LSH band; 0 = auto-size the bucket space "
                         "from the corpus (ceil(log2(n/256)) — keeps candidate "
                         "volume linear as the corpus grows)")
    ap.add_argument("--neardup-recall", type=float, default=0.9,
                    help="target boundary recall for the auto b*r derivation")
    args = ap.parse_args(argv)
    if args.dsir_target and not args.dsir_keep:
        ap.error("--dsir-target requires --dsir-keep")
    if (
        args.semantic_dedup_cells is not None or args.embedding_neardup is not None
    ) and not args.embeddings:
        ap.error("--semantic-dedup-cells / --embedding-neardup require --embeddings")

    from vector_spark.session import get_spark
    from vector_spark.training.components import connected_components, keep_representatives
    from vector_spark.training.dedup import (
        contamination_flags,
        drop_exact_duplicates,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from vector_spark.training.packing import (
        concat_and_chunk,
        materialize_packs,
        pack_sequences,
    )
    from vector_spark.training.text import quality_features, repetition_scores
    from vector_spark.training.tokens import derive_tokens

    spark = get_spark("vector_spark.prep", cpus=args.cpus)
    stages: dict[str, dict] = {}

    def stage(name: str, t0: float, rows: int, **extra) -> None:
        stages[name] = {"rows": rows, "secs": round(time.time() - t0, 3), **extra}

    def rows_by_source(df) -> tuple[int, dict | None]:
        """Per-source lineage in the SAME job as the row count: one
        map-side-combined groupBy over the (tiny) source domain; the
        total is its sum, so no second scan."""
        if "source" not in df.columns:
            return df.count(), None
        counts = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
        # a NULL source is legal input — key it as "null" (its JSON form)
        order = sorted(counts, key=lambda k: (k is None, k))
        return sum(counts.values()), {
            (k if k is not None else "null"): counts[k] for k in order
        }

    def stage_counted(name: str, t0: float, df, prev_rows: int, **extra) -> int:
        n, by_src = rows_by_source(df)
        if by_src is not None:
            extra["by_source"] = by_src
        stage(name, t0, n, dropped=prev_rows - n, **extra)
        return n

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in, by_src = rows_by_source(docs)
    stage("load", t0, n_in, **({"by_source": by_src} if by_src else {}))

    # 1. quality filter: narrow feature projection + one Arrow UDF pass,
    # then a plain predicate — pushdown-friendly, zero shuffle.
    t0 = time.time()
    feat = quality_features(docs)
    rep = repetition_scores(docs).withColumnRenamed("doc_id", "__rid")
    scored = feat.join(rep, feat["doc_id"] == F.col("__rid"), "left").drop("__rid")
    kept = scored.where(
        (F.col("q_n_words") >= args.min_words)
        & (F.col("q_n_words") <= args.max_words)
        & (F.col("q_distinct_ratio") >= args.min_distinct_ratio)
        & (F.col("dup_line_frac") <= args.max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= args.max_dup_line_char_frac)
        & (F.col("top2gram_char_frac") <= args.max_top2gram_char_frac)
        & (F.col("dup5gram_frac") <= args.max_dup5gram_frac)
    ).select(*docs.columns).persist()
    n_quality = stage_counted("quality_filter", t0, kept, n_in)

    # 2. exact dedup: md5 groupBy keeps min-id per distinct text.
    t0 = time.time()
    exact = drop_exact_duplicates(kept).persist()
    n_exact = stage_counted("exact_dedup", t0, exact, n_quality)
    kept.unpersist()

    # 3. fuzzy dedup: MinHash → banded LSH → star-contraction → keep.
    t0 = time.time()
    sigs = minhash_signatures(exact)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    comp = connected_components(pairs, "id_a", "id_b")
    fuzzy = keep_representatives(exact, comp).persist()
    n_fuzzy = stage_counted("fuzzy_dedup", t0, fuzzy, n_exact)
    exact.unpersist()

    # 3b. optional embedding-space dedup over the survivors — BOTH
    # stages route through the banded/bucketed paths (lsh_near_pairs,
    # semantic_dedup); the exact baselines in training/baselines.py are
    # recall oracles, never CLI-reachable. Docs with no embedding row
    # cannot be semantic duplicates and pass through (anti-join on the
    # drop set, not semi-join on the keep set).
    if args.embeddings:
        emb_all = spark.read.parquet(args.embeddings)
        live_emb = emb_all.join(
            fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        ).select("vec_id", "embedding")

        if args.embedding_neardup is not None:
            from vector_spark.training.similarity import lsh_near_pairs

            t0 = time.time()
            dim = live_emb.select(F.size("embedding")).first()[0]
            pairs_e = lsh_near_pairs(
                live_emb,
                threshold=args.embedding_neardup,
                dim=int(dim),
                n_bands=args.neardup_bands,
                band_planes=args.neardup_planes,
                target_recall=args.neardup_recall,
            )
            comp_e = connected_components(pairs_e, "id_a", "id_b")
            losers = comp_e.filter(F.col("id") != F.col("component")).select(
                F.col("id").alias("doc_id")
            )
            nd = fuzzy.join(losers, "doc_id", "left_anti").persist()
            n_nd = stage_counted(
                "embedding_neardup", t0, nd, n_fuzzy,
                threshold=args.embedding_neardup,
                # resolved LSH plan + boundary-recall estimate, so runs
                # stay comparable across corpus sizes and rounds
                **pairs_e.lsh_params,
            )
            pairs_e.release()  # the embedding cache behind the band scans
            fuzzy.unpersist()
            fuzzy, n_fuzzy = nd, n_nd

        if args.semantic_dedup_cells is not None:
            from vector_spark.training.similarity import semantic_dedup

            t0 = time.time()
            if args.embedding_neardup is not None:
                live_emb = emb_all.join(
                    fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
                ).select("vec_id", "embedding")
            sem = semantic_dedup(
                live_emb,
                n_cells=args.semantic_dedup_cells,
                threshold=args.semantic_dedup_threshold,
            )
            dup_ids = sem.filter(F.col("is_dup")).select(F.col("vec_id").alias("doc_id"))
            sd = fuzzy.join(dup_ids, "doc_id", "left_anti").persist()
            sd.count()  # materialize, then release semantic_dedup's assignment cache
            sem.release()
            n_sd = stage_counted(
                "semantic_dedup",
                t0,
                sd,
                n_fuzzy,
                n_cells=args.semantic_dedup_cells,
                threshold=args.semantic_dedup_threshold,
            )
            fuzzy.unpersist()
            fuzzy, n_fuzzy = sd, n_sd

    # 4. optional domain-mix temperature resampling (after dedup, the
    # standard order: duplicates would otherwise distort source shares).
    if args.mix_alpha is not None:
        from vector_spark.training.mix import domain_mix_resample

        t0 = time.time()
        mixed = domain_mix_resample(fuzzy, alpha=args.mix_alpha).drop("keep_rate").persist()
        n_mixed = stage_counted("domain_mix", t0, mixed, n_fuzzy, alpha=args.mix_alpha)
        fuzzy.unpersist()
        fuzzy, n_fuzzy = mixed, n_mixed

    # 5. optional DSIR selection toward a target domain (Xie et al.
    # 2023): rank the deduped docs by hashed-bigram importance weight
    # against --dsir-target and keep the Gumbel-top---dsir-keep set.
    if args.dsir_target:
        from vector_spark.training.dsir import dsir_select

        t0 = time.time()
        target_docs = spark.read.parquet(args.dsir_target)
        raw_tok = fuzzy.select("doc_id", derive_tokens(F.col("text")).alias("tokens"))
        tgt_tok = target_docs.select("doc_id", derive_tokens(F.col("text")).alias("tokens"))
        sel = dsir_select(raw_tok, tgt_tok, n_keep=args.dsir_keep)
        selected = fuzzy.join(sel.select("doc_id"), "doc_id", "left_semi").persist()
        n_sel = stage_counted("dsir_select", t0, selected, n_fuzzy, n_keep=args.dsir_keep)
        fuzzy.unpersist()
        fuzzy, n_fuzzy = selected, n_sel

    # 6. optional decontamination against a benchmark set.
    clean = fuzzy
    if args.benchmark:
        t0 = time.time()
        bench = spark.read.parquet(args.benchmark)
        flags = contamination_flags(fuzzy, bench)  # (doc_id, n_hits), contaminated rows only
        clean = fuzzy.join(flags.select("doc_id"), "doc_id", "left_anti").persist()
        n_clean = stage_counted("decontaminate", t0, clean, n_fuzzy)
        fuzzy.unpersist()
    else:
        n_clean = n_fuzzy

    # 7. tokenize (+ optional ExactSubstr span excision) + pack into
    # fixed-length training sequences.
    t0 = time.time()
    corpus = clean.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        derive_tokens(F.col("text")).alias("tokens"),
    )
    if args.exact_substr_window:
        from vector_spark.training.tokens import remove_duplicated_spans

        t0 = time.time()
        scrubbed = remove_duplicated_spans(
            corpus, window=args.exact_substr_window
        ).persist()
        removed = scrubbed.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_removed").alias("cut")
        ).collect()[0]
        stage(
            "exact_substr",
            t0,
            int(removed["n"]),
            tokens_removed=int(removed["cut"] or 0),
            window=args.exact_substr_window,
        )
        clean.unpersist()  # scrubbed is materialized; keep one live stage cached
        corpus = scrubbed.select("doc_id", "tokens")
        t0 = time.time()
    if args.pack_mode == "concat":
        packed = concat_and_chunk(corpus, ctx_len=args.ctx_len, shards=args.shards)
    else:
        assign = pack_sequences(
            corpus.select("doc_id", F.size("tokens").alias("n_tok")),
            max_len=args.ctx_len,
            shards=args.shards,
        )
        packed = materialize_packs(corpus, assign).withColumnRenamed("pack_id", "chunk_id")
    out_part = F.pmod(F.col("chunk_id"), F.lit(args.shards)).alias("part")
    packed = packed.select("*", out_part)

    if args.out:
        packed.write.mode("overwrite").partitionBy("part").parquet(args.out)
        packed_out = spark.read.parquet(args.out)
    else:
        packed = packed.persist()
        packed_out = packed
    agg = packed_out.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_tok").alias("n_tok"),
        F.avg(F.col("n_tok") / args.ctx_len).alias("fill"),
    ).collect()[0]
    stage(
        "tokenize_pack",
        t0,
        int(agg["n_seqs"]),
        tokens=int(agg["n_tok"] or 0),
        fill_efficiency=round(float(agg["fill"] or 0.0), 4),
    )

    print(
        json.dumps(
            {
                "rows_in": n_in,
                "rows_clean": n_clean,
                "sequences_out": int(agg["n_seqs"]),
                "tokens_out": int(agg["n_tok"] or 0),
                "ctx_len": args.ctx_len,
                "pack_mode": args.pack_mode,
                "stages": stages,
                "total_secs": round(sum(s["secs"] for s in stages.values()), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
