"""End-to-end test for the run_prep.py training-data prep CLI: stage
lineage is monotone, token totals are conserved through packing in both
pack modes, and the partitioned output parquet is loadable."""

from __future__ import annotations

import json
import sys

import pytest

INPUT = "/root/testdata/sf0.001/documents.parquet"


def _run(capsys, argv):
    sys.path.insert(0, "/root/repo")
    import run_prep

    rc = run_prep.main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_run_prep_concat_mode(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "packed")
    stats = _run(
        capsys,
        ["--input", INPUT, "--out", out_dir, "--ctx-len", "64", "--shards", "4"],
    )
    st = stats["stages"]
    # lineage: each filter stage is monotone non-increasing
    assert (
        stats["rows_in"]
        >= st["quality_filter"]["rows"]
        >= st["exact_dedup"]["rows"]
        >= st["fuzzy_dedup"]["rows"]
        == stats["rows_clean"]
        > 0
    )

    # output parquet reloads; totals match the stats line; tokens are
    # conserved: every chunk is a slice of the concatenated clean corpus
    packed = spark.read.parquet(out_dir)
    rows = packed.collect()
    assert len(rows) == stats["sequences_out"]
    assert sum(r["n_tok"] for r in rows) == stats["tokens_out"]
    assert all(len(r["tokens"]) == r["n_tok"] <= 64 for r in rows)
    # concat mode: within each shard only the tail chunk is short
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["chunk_id"] // 1_000_000, []).append(r)
    for chunks in by_shard.values():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert all(c["n_tok"] == 64 for c in chunks[:-1])


def test_run_prep_whole_doc_mode_conserves_tokens(spark, tmp_path, capsys):
    a = _run(capsys, ["--input", INPUT, "--ctx-len", "64", "--shards", "4"])
    b = _run(
        capsys,
        ["--input", INPUT, "--ctx-len", "64", "--shards", "4", "--pack-mode", "whole-doc"],
    )
    # both modes pack the identical cleaned token stream
    assert a["tokens_out"] == b["tokens_out"] > 0
    assert a["rows_clean"] == b["rows_clean"]
    # whole-doc never splits: at least as many (>=) sequences as concat
    # only when docs pack imperfectly; fill efficiency <= concat's
    assert b["stages"]["tokenize_pack"]["fill_efficiency"] <= a["stages"]["tokenize_pack"][
        "fill_efficiency"
    ] + 1e-9


def test_run_prep_decontaminate_self_drops_all(spark, capsys):
    stats = _run(capsys, ["--input", INPUT, "--benchmark", INPUT, "--ctx-len", "64"])
    # decontaminating a corpus against itself scrubs every doc
    assert stats["stages"]["decontaminate"]["rows"] == 0
    assert stats["sequences_out"] == 0


def test_run_prep_dsir_and_source_lineage(spark, tmp_path, capsys):
    """--dsir-target keeps exactly --dsir-keep docs; every doc-level
    stage carries per-source lineage that sums to its row count."""
    tgt = str(tmp_path / "target")
    spark.read.parquet(INPUT).where("lang = 'en'").write.parquet(tgt)
    stats = _run(
        capsys,
        ["--input", INPUT, "--dsir-target", tgt, "--dsir-keep", "20", "--ctx-len", "64"],
    )
    st = stats["stages"]
    assert st["dsir_select"]["rows"] == 20
    assert st["dsir_select"]["rows"] <= st["fuzzy_dedup"]["rows"]
    assert stats["rows_clean"] == 20
    for s in ("load", "quality_filter", "exact_dedup", "fuzzy_dedup", "dsir_select"):
        assert sum(st[s]["by_source"].values()) == st[s]["rows"], s


def test_run_prep_exact_substr_stage(spark, capsys):
    """--exact-substr-window reports excised tokens and the packed
    output shrinks by exactly that amount vs the un-scrubbed run."""
    base = _run(capsys, ["--input", INPUT, "--ctx-len", "64", "--pack-mode", "concat"])
    scrub = _run(
        capsys,
        ["--input", INPUT, "--ctx-len", "64", "--pack-mode", "concat",
         "--exact-substr-window", "10"],
    )
    cut = scrub["stages"]["exact_substr"]["tokens_removed"]
    assert cut >= 0
    assert scrub["tokens_out"] == base["tokens_out"] - cut
    assert scrub["stages"]["exact_substr"]["rows"] == scrub["rows_clean"]


def test_run_prep_mix_then_dsir_composition(spark, tmp_path, capsys):
    """--mix-alpha and --dsir-target compose: DSIR selects from the mix
    survivors and thinned sources remain selectable (the unsalted-
    Gumbel bug would have excluded them systematically)."""
    tgt = str(tmp_path / "target")
    spark.read.parquet(INPUT).where("lang = 'en'").write.parquet(tgt)
    stats = _run(
        capsys,
        ["--input", INPUT, "--mix-alpha", "0.5", "--dsir-target", tgt,
         "--dsir-keep", "15", "--ctx-len", "64"],
    )
    st = stats["stages"]
    assert st["dsir_select"]["rows"] == 15 <= st["domain_mix"]["rows"]
    # selection drew from more than one source (independence smoke)
    assert len(st["dsir_select"]["by_source"]) >= 2


def test_run_dedup_ledger_incremental(spark, tmp_path, capsys):
    """Two runs over the same input with a shared ledger: the second
    run drops every doc at the ledger gate (idempotent ingestion), and
    the ledger itself holds no duplicate hashes afterwards."""
    import run_dedup

    ledger = str(tmp_path / "ledger")

    def run():
        rc = run_dedup.main(["--input", INPUT, "--ledger", ledger])
        assert rc == 0
        import json as _json

        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    first = run()
    assert first["ledger_dropped"] == 0 and first["rows_kept"] > 0
    second = run()
    # every doc of the re-ingested batch is already SEEN -> all dropped
    # at the gate, nothing re-kept, nothing appended twice
    assert second["ledger_dropped"] == second["rows_in"]
    assert second["rows_kept"] == 0 and second["candidate_pairs"] == 0
    hashes = spark.read.parquet(ledger)
    n_h = hashes.count()
    assert n_h == hashes.distinct().count()  # idempotent append
    assert first["rows_kept"] <= n_h <= first["rows_in"]  # distinct texts seen


def test_run_dedup_ledger_null_text(spark, tmp_path, capsys):
    """NULL-text docs hash through coalesce('') so the ledger gate drops
    them on re-ingest like any other doc — a NULL __h would never match
    the left_anti join and such docs would re-ingest (and append a NULL
    hash row) on every run."""
    import json as _json

    import run_dedup

    inp = str(tmp_path / "docs_null")
    spark.createDataFrame(
        [("d1", "alpha beta gamma delta"), ("d2", None), ("d3", None)],
        "doc_id string, text string",
    ).write.parquet(inp)
    ledger = str(tmp_path / "ledger_null")

    def run():
        assert run_dedup.main(["--input", inp, "--ledger", ledger]) == 0
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    first = run()
    assert first["ledger_dropped"] == 0
    second = run()
    assert second["ledger_dropped"] == second["rows_in"] == 3  # NULLs gated too
    hashes = spark.read.parquet(ledger)
    assert hashes.count() == hashes.distinct().count() == 2  # d2/d3 share ''
    assert hashes.where("h is null").count() == 0


def test_run_prep_embedding_dedup_stages(spark, capsys):
    """--embedding-neardup / --semantic-dedup-cells route through the
    banded paths (lsh_near_pairs, semantic_dedup) and thread lineage;
    docs without an embedding row pass through (anti-join contract)."""
    EMB = "/root/testdata/sf0.001/embeddings.parquet"
    stats = _run(
        capsys,
        ["--input", INPUT, "--embeddings", EMB,
         "--embedding-neardup", "0.9", "--semantic-dedup-cells", "8",
         "--ctx-len", "64"],
    )
    st = stats["stages"]
    assert (
        st["fuzzy_dedup"]["rows"]
        >= st["embedding_neardup"]["rows"]
        >= st["semantic_dedup"]["rows"]
        == stats["rows_clean"]
        > 0
    )
    assert st["semantic_dedup"]["n_cells"] == 8
    # lineage arithmetic: dropped counts tie the stage rows together
    surv = st["embedding_neardup"]["rows"]
    assert st["semantic_dedup"]["dropped"] >= 0
    assert surv - st["semantic_dedup"]["rows"] == st["semantic_dedup"]["dropped"]


def test_run_prep_embedding_flags_require_embeddings():
    import run_prep

    with pytest.raises(SystemExit):
        run_prep.main(["--input", INPUT, "--semantic-dedup-cells", "8"])
