"""Checkpointed per-partition runs: resume skips done partitions,
reruns invalidated ones, and end-state equals a single-shot run.

Contract mirrored from the reference file-source checkpointer
(/root/reference/lib/file-source/src/checkpointer.rs:18-67): atomic
tmp-swap persistence + fingerprint keying.
"""

from __future__ import annotations

import json
import os

import pytest

from vector_spark.corpus import enrichment_table, write_corpus
from vector_spark.sinks.checkpoint import (
    CheckpointManager,
    list_input_partitions,
    run_with_checkpoint,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt_corpus") / "corpus")
    write_corpus(spark, 800, d, seed=7)
    return d


def test_partition_listing(corpus_dir):
    parts = list_input_partitions(corpus_dir)
    assert all(p.startswith("source=") for p in parts)
    assert len(parts) == 8  # all 8 sources present at n=800


def test_first_run_then_full_resume(spark, corpus_dir, tmp_path):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    enrich = enrichment_table(spark)

    r1 = run_with_checkpoint(spark, corpus_dir, enrich, out, ck)
    assert len(r1.partitions_run) == 8 and not r1.partitions_skipped
    assert r1.rows_routed > 0

    # checkpoint document exists with done records + lineage fields
    state = json.load(open(os.path.join(ck, "checkpoints.json")))
    assert len(state) == 8
    rec = next(iter(state.values()))
    for k in ("status", "input_snapshot", "rows_in", "lane_counts", "wall_ms", "rows_per_sec"):
        assert k in rec, k
    assert all(v["status"] == "done" for v in state.values())

    # second run: everything skipped, same totals (idempotent resume)
    r2 = run_with_checkpoint(spark, corpus_dir, enrich, out, ck)
    assert len(r2.partitions_skipped) == 8 and not r2.partitions_run
    assert r2.lane_counts == r1.lane_counts
    # per-lane metrics are restored from the checkpoint record too —
    # a resumed result is complete, not counts-only
    assert {k: sorted(v) for k, v in r2.metrics.items()} == {
        k: sorted(v) for k, v in r1.metrics.items()
    }
    # rows_in comes from the pipeline's cached parse (no re-count scan)
    assert all(rec["rows_in"] > 0 for rec in state.values())


def test_partial_resume_reruns_only_invalidated(spark, corpus_dir, tmp_path):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    enrich = enrichment_table(spark)
    r1 = run_with_checkpoint(spark, corpus_dir, enrich, out, ck)

    # invalidate one partition's record (simulates crash mid-partition)
    mgr = CheckpointManager(ck)
    victim = sorted(mgr.state)[0]
    mgr.record(victim, status="running", input_snapshot=mgr.state[victim]["input_snapshot"])

    r2 = run_with_checkpoint(spark, corpus_dir, enrich, out, ck)
    assert r2.partitions_run == [victim]
    assert len(r2.partitions_skipped) == 7
    assert r2.lane_counts == r1.lane_counts


def test_checkpointed_totals_match_single_shot(spark, corpus_dir, tmp_path):
    from vector_spark.corpus import sequences
    from vector_spark.plans.pipeline import run_pipeline

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    enrich = enrichment_table(spark)
    ckpt_result = run_with_checkpoint(spark, corpus_dir, enrich, out, ck)

    single = run_pipeline(spark, sequences(spark, 800, seed=7), enrichment=enrich)
    assert ckpt_result.lane_counts == single.lane_counts
    # per-sink aggregate rows also agree after merging partition pieces:
    # re-aggregate the union of per-partition metric tables
    for lane, rows in single.metrics.items():
        merged: dict = {}
        for src, sev, n, s in ckpt_result.metrics[lane]:
            k = (src, sev)
            pn, ps = merged.get(k, (0, 0))
            merged[k] = (pn + n, ps + s)
        assert sorted((k[0], k[1], v[0], v[1]) for k, v in merged.items()) == rows


def test_tagged_sink_layout_equals_fanout(spark, tmp_path):
    """One-pass partitioned write must produce the same routed-row sets
    and per-sink metrics as the per-lane fan-out trees."""
    import duckdb

    from vector_spark.corpus import enrichment_table, sequences
    from vector_spark.plans.pipeline import run_pipeline

    df = sequences(spark, 600, seed=5)
    enrich = enrichment_table(spark)
    fan = run_pipeline(spark, df, enrich, out_dir=str(tmp_path / "fan"), sink_layout="fanout")
    tag = run_pipeline(spark, df, enrich, out_dir=str(tmp_path / "tag"), sink_layout="tagged")
    assert fan.lane_counts == tag.lane_counts
    assert fan.metrics == tag.metrics

    con = duckdb.connect()
    for lane, n in fan.lane_counts.items():
        fan_ids = {
            r[0]
            for r in con.sql(
                f"SELECT doc_id FROM parquet_scan('{tmp_path}/fan/lane={lane}/data/source=*/*.parquet', hive_partitioning=0)"
            ).fetchall()
        }
        tag_ids = {
            r[0]
            for r in con.sql(
                f"SELECT doc_id FROM parquet_scan('{tmp_path}/tag/data/lane={lane}/source=*/*.parquet', hive_partitioning=0)"
            ).fetchall()
        }
        assert fan_ids == tag_ids and len(fan_ids) == n, lane
