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
    args = ap.parse_args(argv)

    from vector_spark.session import get_spark
    from vector_spark.training.components import connected_components, keep_representatives
    from vector_spark.training.dedup import lsh_candidate_pairs, minhash_signatures

    spark = get_spark("vector_spark.dedup", cpus=args.cpus)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    sigs = minhash_signatures(docs, n=args.ngram)  # affine permutations (one digest per shingle)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    comp = connected_components(pairs, "id_a", "id_b")
    n_pairs = pairs.count()
    clusters = comp.groupBy("component").count()
    n_clusters = clusters.count()

    kept = keep_representatives(docs, comp)
    if args.out:
        kept.write.mode("overwrite").parquet(args.out)
        n_kept = spark.read.parquet(args.out).count()
    else:
        n_kept = kept.count()

    print(
        json.dumps(
            {
                "rows_in": n_in,
                "candidate_pairs": n_pairs,
                "clusters": n_clusters,
                "rows_kept": n_kept,
                "rows_removed": n_in - n_kept,
                "wall_secs": round(time.time() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
