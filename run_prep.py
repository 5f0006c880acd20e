#!/usr/bin/env python
"""spark-submit entry point for the full training-data prep pipeline.

Chains the training tier end-to-end the way a corpus build actually
runs it — quality filter → exact dedup → fuzzy dedup (MinHash-LSH →
connected components → keep representatives) → optional benchmark
decontamination → tokenize → pack into fixed-length training sequences
→ partitioned parquet write — and prints ONE JSON line of per-stage
lineage (rows in/out, tokens, wall seconds) plus pack fill efficiency.

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
    args = ap.parse_args(argv)

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

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    stage("load", t0, n_in)

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
    n_quality = kept.count()
    stage("quality_filter", t0, n_quality, dropped=n_in - n_quality)

    # 2. exact dedup: md5 groupBy keeps min-id per distinct text.
    t0 = time.time()
    exact = drop_exact_duplicates(kept).persist()
    n_exact = exact.count()
    kept.unpersist()
    stage("exact_dedup", t0, n_exact, dropped=n_quality - n_exact)

    # 3. fuzzy dedup: MinHash → banded LSH → star-contraction → keep.
    t0 = time.time()
    sigs = minhash_signatures(exact)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    comp = connected_components(pairs, "id_a", "id_b")
    fuzzy = keep_representatives(exact, comp).persist()
    n_fuzzy = fuzzy.count()
    exact.unpersist()
    stage("fuzzy_dedup", t0, n_fuzzy, dropped=n_exact - n_fuzzy)

    # 4. optional domain-mix temperature resampling (after dedup, the
    # standard order: duplicates would otherwise distort source shares).
    if args.mix_alpha is not None:
        from vector_spark.training.mix import domain_mix_resample

        t0 = time.time()
        mixed = domain_mix_resample(fuzzy, alpha=args.mix_alpha).drop("keep_rate").persist()
        n_mixed = mixed.count()
        fuzzy.unpersist()
        stage("domain_mix", t0, n_mixed, dropped=n_fuzzy - n_mixed, alpha=args.mix_alpha)
        fuzzy, n_fuzzy = mixed, n_mixed

    # 5. optional decontamination against a benchmark set.
    clean = fuzzy
    if args.benchmark:
        t0 = time.time()
        bench = spark.read.parquet(args.benchmark)
        flags = contamination_flags(fuzzy, bench)  # (doc_id, n_hits), contaminated rows only
        clean = fuzzy.join(flags.select("doc_id"), "doc_id", "left_anti").persist()
        n_clean = clean.count()
        fuzzy.unpersist()
        stage("decontaminate", t0, n_clean, dropped=n_fuzzy - n_clean)
    else:
        n_clean = n_fuzzy

    # 6. tokenize + pack into fixed-length training sequences.
    t0 = time.time()
    corpus = clean.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        derive_tokens(F.col("text")).alias("tokens"),
    )
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
