#!/usr/bin/env python
"""Independent scale-tier oracles for the graph-shaped dedup operators.

The DuckDB oracles for `dedup_clusters`/`dedup_keep` (recursive CTE
transitive closure) and `hamming_neardup` (all-pairs inequality join)
are value-hash-green at the driver's sf0.01 gate but computationally
infeasible at sf1.0 (the recursive CTE enumerates full reachability —
quadratic per clique; the all-pairs join is 1.25B string comparisons).
This tool verifies the SAME contracts at a scale tier DuckDB can't
reach, with exact driver-side references that are independent of the
distributed implementations:

- dedup_clusters: candidate edges from the (oracle-green) MinHash/LSH
  building blocks are collected and labeled with a plain union-find;
  labels must equal the distributed large-star/small-star output
  exactly (same min-id-representative convention).
- dedup_keep: the kept doc set must equal {docs that are NULL-component
  or their own component's min} under the union-find labels.
- hamming_neardup: 48-bit SimHash fingerprints (pure columnar, shared
  with the oracle-green `simhash` query) are collected and compared
  all-pairs with vectorized numpy popcount; the pair set must equal the
  engine's combination-banded candidate join exactly (pigeonhole
  banding is exact, not approximate, for radius <= n_seg-1 designs).

Usage: python tools/check_scale_graph.py [sf_dir]   (default sf1.0 tier)
Prints one JSON line; exit 0 iff all three contracts hold.
"""

from __future__ import annotations

import json
import sys
import time


def union_find_labels(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min id in component (the engine's representative rule)
    return {n: find(n) for n in nodes}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1.0"
    sys.path.insert(0, ".")
    import numpy as np
    from pyspark.sql import functions as F

    from vector_spark.session import get_spark
    from vector_spark.training.components import connected_components, keep_representatives
    from vector_spark.training.dedup import (
        hamming_near_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
    )

    spark = get_spark("scale_graph_check", cpus=24)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    report: dict[str, dict] = {}

    # ---- dedup_clusters ------------------------------------------------
    t0 = time.time()
    sigs = minhash_signatures(docs, n=3)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]]).persist()
    edge_rows = [(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()]
    nodes = {x for e in edge_rows for x in e}
    ref = union_find_labels(nodes, edge_rows)
    got = {r["id"]: r["component"] for r in connected_components(pairs, "id_a", "id_b").collect()}
    report["dedup_clusters"] = {
        "edges": len(edge_rows),
        "nodes": len(nodes),
        "match": got == ref,
        "secs": round(time.time() - t0, 1),
    }

    # ---- dedup_keep ----------------------------------------------------
    t0 = time.time()
    comp = connected_components(pairs, "id_a", "id_b")
    kept = {
        r.doc_id
        for r in keep_representatives(docs, comp, id_col="doc_id").select("doc_id").collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    ref_kept = {d for d in all_ids if d not in ref or ref[d] == d}
    report["dedup_keep"] = {
        "kept": len(kept),
        "total": len(all_ids),
        "match": kept == ref_kept,
        "secs": round(time.time() - t0, 1),
    }
    pairs.unpersist()

    # ---- hamming_neardup -----------------------------------------------
    # The near-pair relation is DENSE in this corpus (77M pairs at
    # sf1.0, 6% of all pairs — template-generated docs saturate the
    # fingerprint space), so the comparison is by sorted uint64 pair
    # keys (i*N+j over the id-sorted index), never Python pair objects.
    t0 = time.time()
    fp = simhash(docs, bits=48).persist()
    fpd = fp.toPandas()
    order = np.argsort(fpd["doc_id"].to_numpy())
    ids = fpd["doc_id"].to_numpy()[order]
    h = fpd["simhash"].to_numpy().astype(np.uint64)[order]
    n = len(ids)
    ref_chunks = []
    chunk = 1024
    for i0 in range(0, n, chunk):
        x = h[i0 : i0 + chunk, None] ^ h[None, :]
        # vectorized 64-bit popcount
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        d = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
        ii, jj = np.nonzero(d <= 3)
        gi = ii.astype(np.uint64) + np.uint64(i0)
        jj = jj.astype(np.uint64)
        keep = gi < jj  # canonical order, drops self-pairs
        ref_chunks.append(gi[keep] * np.uint64(n) + jj[keep])
    ref_keys = np.sort(np.concatenate(ref_chunks))
    del ref_chunks

    # build the id→index map in the column's NATIVE type: a str() cast
    # here would make both joins silently drop every pair for non-string
    # doc_ids and degrade the check to comparing empty sets
    id_type = dict(zip(fp.schema.names, fp.schema))["doc_id"].dataType.simpleString()
    idx_map = spark.createDataFrame(
        # .item() unwraps numpy scalars (toPandas gives np.int64 for long
        # ids; the Row verifier rejects them for LongType)
        [(d.item() if hasattr(d, "item") else d, int(i)) for i, d in enumerate(ids)],
        f"doc_id {id_type}, idx long",
    )
    got = hamming_near_pairs(fp, max_dist=3, bits=48, n_seg=6, id_col="doc_id")
    got_count = got.count()
    got_keys_df = (
        got.select(
            F.least("id_a", "id_b").alias("lo"), F.greatest("id_a", "id_b").alias("hi")
        )
        .join(F.broadcast(idx_map.withColumnRenamed("doc_id", "lo").withColumnRenamed("idx", "i")), "lo")
        .join(F.broadcast(idx_map.withColumnRenamed("doc_id", "hi").withColumnRenamed("idx", "j")), "hi")
        .select((F.col("i") * n + F.col("j")).alias("key"))
    )
    got_keys = np.sort(got_keys_df.toPandas()["key"].to_numpy().astype(np.uint64))
    # every pair must survive the index joins — a lossy join here would
    # otherwise read as a (vacuous) pass
    assert len(got_keys) == got_count, (
        f"id join dropped pairs: {got_count} pairs, {len(got_keys)} joined"
    )
    fp.unpersist()
    report["hamming_neardup"] = {
        "pairs": int(len(got_keys)),
        "ref_pairs": int(len(ref_keys)),
        "match": bool(len(got_keys) == len(ref_keys) and (got_keys == ref_keys).all()),
        "secs": round(time.time() - t0, 1),
    }

    ok = all(v["match"] for v in report.values())
    print(json.dumps({"sf_dir": sf_dir, "pass": ok, "checks": report}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
