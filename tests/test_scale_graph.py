"""Guards for the driver-side scale-tier oracles (tools/check_scale_graph.py).

At sf1.0 the DuckDB oracles for the graph-shaped dedup ops are
computationally infeasible (recursive-CTE closure; all-pairs inequality
join), so the scale artifact relies on tools/check_scale_graph.py's
exact references instead. These tests pin those references at the
smallest driver tier so the comparison plumbing itself stays verified:
the union-find labeler must agree with the distributed
large-star/small-star components, and the vectorized-numpy popcount
must agree with the banded SimHash join, on real testdata.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_union_find_matches_distributed_components(spark, docs):
    from tools.check_scale_graph import union_find_labels
    from vector_spark.training.components import connected_components
    from vector_spark.training.dedup import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(docs, n=3)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    edge_rows = [(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()]
    nodes = {x for e in edge_rows for x in e}
    ref = union_find_labels(nodes, edge_rows)
    got = {r["id"]: r["component"] for r in connected_components(pairs, "id_a", "id_b").collect()}
    assert got == ref


def test_union_find_path_compression_and_representative_rule():
    from tools.check_scale_graph import union_find_labels

    # chain a-b-c-d plus isolated e: representative is the min id
    labels = union_find_labels(
        {"a", "b", "c", "d", "e"}, [("c", "d"), ("a", "b"), ("b", "c")]
    )
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}


def test_numpy_popcount_matches_banded_hamming_join(spark, docs):
    import numpy as np

    from vector_spark.training.dedup import hamming_near_pairs, simhash

    fp = simhash(docs, bits=48)
    fpd = fp.toPandas()
    ids = fpd["doc_id"].to_numpy()
    h = fpd["simhash"].to_numpy().astype(np.uint64)
    ref = set()
    x = h[:, None] ^ h[None, :]
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    d = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    for i, j in zip(*np.nonzero(d <= 3)):
        if ids[i] < ids[j]:
            ref.add((ids[i], ids[j]))
    got = {
        (r.id_a, r.id_b) if r.id_a < r.id_b else (r.id_b, r.id_a)
        for r in hamming_near_pairs(fp, max_dist=3, bits=48, n_seg=6, id_col="doc_id")
        .select("id_a", "id_b")
        .collect()
    }
    assert got == ref
