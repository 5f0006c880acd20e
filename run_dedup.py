#!/usr/bin/env python
"""spark-submit entry point for the training-data dedup pipeline.

Chains the training tier end-to-end: MinHash signatures → banded LSH
candidate pairs → connected components (large-star/small-star) →
keep-one-representative-per-cluster, writing the surviving documents
and printing one JSON line of lineage/stats.

    spark-submit --master local[8] --py-files vector_spark.zip \
        run_dedup.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/dedup_out

Every stage is the scale path (no cross joins, no driver collects of
row data): signatures are one explode + map-side-combined mins, the
candidate join is banded equi-join, clustering is O(log n) star rounds,
and the final keep is a left-anti join. At 100 TB the only change is
pointing --input at the Iceberg table and sizing
spark.sql.shuffle.partitions.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text, ...)")
    ap.add_argument("--out", default=None, help="deduped output dir (omit for stats-only)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--ledger", default=None,
                    help="seen-hash ledger dir for INCREMENTAL ingestion: docs whose "
                    "exact-text hash is already in the ledger are dropped before "
                    "dedup, and this run's survivors are appended — re-running on "
                    "overlapping input batches is idempotent")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from vector_spark.session import get_spark
    from vector_spark.training.components import connected_components, keep_representatives
    from vector_spark.training.dedup import lsh_candidate_pairs, md5_long, minhash_signatures

    spark = get_spark("vector_spark.dedup", cpus=args.cpus)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    # incremental mode: subtract everything a previous run already kept.
    # The ledger holds only 8-byte hashes — at 10^12 docs it is a few TB
    # of pure keys, and the subtraction is one shuffle hash-join (or a
    # broadcast while it still fits); no text ever re-reads.
    n_ledger_dropped = 0
    ledger_df = None
    if args.ledger:
        import os

        # NULL text must still hash to a real key: a NULL __h never
        # matches in the left_anti gate (NULL-safe it is not), so such
        # docs would be re-ingested — and a NULL hash row appended —
        # on EVERY run, breaking the idempotency contract.
        docs = docs.withColumn("__h", md5_long(F.coalesce(F.col("text"), F.lit(""))))
        if os.path.isdir(args.ledger) and any(
            f.endswith(".parquet") for f in os.listdir(args.ledger)
        ):
            ledger_df = spark.read.parquet(args.ledger).select("h").distinct()
            docs = docs.join(
                ledger_df, docs["__h"] == ledger_df["h"], "left_anti"
            ).persist()
            n_after = docs.count()
            n_ledger_dropped = n_in - n_after

    sigs = minhash_signatures(docs, n=args.ngram)  # affine permutations (one digest per shingle)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    comp = connected_components(pairs, "id_a", "id_b")
    n_pairs = pairs.count()
    clusters = comp.groupBy("component").count()
    n_clusters = clusters.count()

    kept = keep_representatives(docs.drop("__h"), comp)
    if args.out:
        kept.write.mode("overwrite").parquet(args.out)
        kept = spark.read.parquet(args.out)
    else:
        kept = kept.persist()
    n_kept = kept.count()

    if args.ledger:
        # record every doc this run SAW (not just survivors): a near-dup
        # that lost to a kept representative must not resurface when the
        # same batch is re-ingested. Only hashes the ledger does not
        # already hold are appended, so re-runs are no-ops (idempotent).
        new_h = docs.select(F.col("__h").alias("h")).distinct()
        if ledger_df is not None:
            new_h = new_h.join(ledger_df, "h", "left_anti")
        new_h.write.mode("append").parquet(args.ledger)

    print(
        json.dumps(
            {
                "rows_in": n_in,
                "ledger_dropped": n_ledger_dropped,
                "candidate_pairs": n_pairs,
                "clusters": n_clusters,
                "rows_kept": n_kept,
                "rows_removed": n_in - n_kept - n_ledger_dropped,
                "wall_secs": round(time.time() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
