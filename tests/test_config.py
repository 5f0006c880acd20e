"""Config→topology compiler: TOML in, executed DAG out, mirroring the
reference compile pipeline (macro expansion, fan-in union, fan-out
reuse, cycle/unknown-input rejection — src/config/compiler.rs:7-151).
"""

from __future__ import annotations

import pytest

from vector_spark.plans.config import ConfigError, compile_config


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cfg") / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.mode("overwrite").parquet(p)
    return p


def test_toml_topology_end_to_end(spark, events_path):
    """The flagship mini-topology as a vector.toml: source → parse →
    route → per-lane aggregate → memory sinks."""
    toml = f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.parsed]
type = "json_parser"
inputs = ["events"]
field = "props"
keys = ["k"]

[transforms.router]
type = "route"
inputs = ["parsed"]
[transforms.router.route]
errors = "event_type = 'error' OR value >= 95.0"
clicky = "event_type IN ('click', 'view')"

[transforms.err_metrics]
type = "aggregate"
inputs = ["router.errors"]
group_by = ["event_type"]
[transforms.err_metrics.aggregates]
n = "count:"
total = "sum:value"

[sinks.errors_out]
type = "memory"
inputs = ["err_metrics"]

[sinks.clicky_out]
type = "memory"
inputs = ["router.clicky"]

[sinks.unmatched_out]
type = "memory"
inputs = ["router._unmatched"]
"""
    topo = compile_config(spark, toml)
    results = topo.run()

    ev = spark.read.parquet(events_path)
    from pyspark.sql import functions as F

    want_err = {
        (r["event_type"], r["n"], round(r["total"], 4))
        for r in ev.filter("event_type = 'error' OR value >= 95.0")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got_err = {(r["event_type"], r["n"], round(r["total"], 4)) for r in results["errors_out"]}
    assert got_err == want_err

    n_clicky = ev.filter("event_type IN ('click','view')").count()
    n_unmatched = ev.filter(
        "NOT coalesce((event_type = 'error' OR value >= 95.0) OR (event_type IN ('click','view')), false)"
    ).count()
    assert len(results["clicky_out"]) == n_clicky
    assert len(results["unmatched_out"]) == n_unmatched


def test_compound_serial_and_fanin_union(spark, events_path):
    cfg = {
        "sources": {
            "a": {"type": "parquet", "path": events_path},
            "b": {"type": "parquet", "path": events_path},
        },
        "transforms": {
            "chain": {
                "type": "compound",
                "inputs": ["a", "b"],  # fan-in union of both sources
                "steps": [
                    {"type": "filter", "condition": "value >= 50"},
                    {"type": "add_fields", "fields": {"stage": "final"}},
                ],
            },
        },
        "sinks": {"out": {"type": "memory", "inputs": ["chain"]}},
    }
    topo = compile_config(spark, cfg)
    rows = topo.run()["out"]
    n = spark.read.parquet(events_path).filter("value >= 50").count()
    assert len(rows) == 2 * n  # both sources unioned
    assert all(r["stage"] == "final" for r in rows)


def test_compile_errors(spark, events_path):
    with pytest.raises(ConfigError, match="unknown input"):
        compile_config(
            spark,
            {"sources": {}, "transforms": {}, "sinks": {"s": {"type": "memory", "inputs": ["ghost"]}}},
        ).run()
    with pytest.raises(ConfigError, match="cycle"):
        compile_config(
            spark,
            {
                "sources": {},
                "transforms": {
                    "x": {"type": "filter", "inputs": ["y"], "condition": "true"},
                    "y": {"type": "filter", "inputs": ["x"], "condition": "true"},
                },
                "sinks": {"s": {"type": "memory", "inputs": ["x"]}},
            },
        ).run()
    with pytest.raises(ConfigError, match="duplicate"):
        compile_config(
            spark,
            {
                "sources": {"x": {"type": "parquet", "path": events_path}},
                "transforms": {"x": {"type": "filter", "inputs": ["x"], "condition": "true"}},
                "sinks": {},
            },
        )


def test_route_with_datadog_search_lanes(spark):
    """Typed lane conditions: datadog_search routes + computed
    _unmatched complement (conditions/datadog_search.rs as a lane)."""
    import tomllib

    from vector_spark.plans.unit_test import run_unit_tests

    toml_text = """
[transforms.r]
  inputs = []
  type = "route"
  [transforms.r.route]
    errors = {type = "datadog_search", source = "status:error"}
    big = {type = "sql", source = "n > 100"}

[[tests]]
  name = "dd lane"
  [tests.input]
    insert_at = "r"
    type = "rows"
    schema = "status string, n long"
    rows = [{status = "error", n = 1}, {status = "ok", n = 500}, {status = "ok", n = 5}]
  [[tests.outputs]]
    extract_from = "r.errors"
    [[tests.outputs.conditions]]
      type = "sql"
      source = "status = 'error'"
  [[tests.outputs]]
    extract_from = "r.big"
    [[tests.outputs.conditions]]
      type = "sql"
      source = "n = 500"
  [[tests.outputs]]
    extract_from = "r._unmatched"
    [[tests.outputs.conditions]]
      type = "sql"
      source = "n = 5 AND status = 'ok'"
"""
    results = run_unit_tests(spark, toml_text)
    assert all(r.ok for r in results), [
        (c.extract_from, c.failures) for r in results for c in r.checks
    ]


def test_new_registry_types(spark, events_path):
    """Round-2 registry additions: csv_parser, add_tags/remove_tags,
    metric_to_log, geoip, swimlanes alias — all through the TOML
    front-end."""
    toml = f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.lines]
type = "add_fields"
inputs = ["events"]
  [transforms.lines.fields]
  message = "{{{{event_type}}}},{{{{user_id}}}}"
  ip = "10.1.2.3"

[transforms.csvd]
type = "csv_parser"
inputs = ["lines"]
field = "message"
schema = "etype string, uid long"

[transforms.lanes]
type = "swimlanes"
inputs = ["csvd"]
  [transforms.lanes.route]
  clicky = "etype = 'click'"

[transforms.located]
type = "geoip"
inputs = ["lanes.clicky"]
source = "ip"
target = "geo"
  [transforms.located.table]
  schema = "ip_lo long, ip_hi long, country string"
  rows = [[167837696, 167903231, "NL"]]

[transforms.tagged]
type = "add_tags"
inputs = ["located"]
  [transforms.tagged.tags]
  env = "prod"
  tmp = "x"

[transforms.untagged]
type = "remove_tags"
inputs = ["tagged"]
tags = ["tmp"]

[sinks.out]
type = "memory"
inputs = ["untagged"]
"""
    topo = compile_config(spark, toml)
    rows = topo.run()["out"]
    assert rows, "clicky lane empty"
    r = rows[0].asDict()
    assert r["etype"] == "click" and isinstance(r["uid"], int)
    # 10.1.2.3 is inside 10.1.0.0/16 -> country joined
    assert r["geo_country"] == "NL"
    assert r["tags"] == {"env": "prod"}


def test_metric_to_log_registry_type(spark):
    from pyspark.sql import Row

    import vector_spark.plans.config as C

    df = spark.createDataFrame(
        [Row(name="req", ts="2026-08-17 00:00:00", value=1.5, tags={"host": "h1"})],
    )
    out = C.TRANSFORMS["metric_to_log"](df, {}).collect()
    assert len(out) == 1 and '"name":"req"' in out[0]["message"]
    assert out[0]["host"] == "h1"


def test_statsd_registry_type(spark):
    import pyspark.sql.functions as F  # noqa: F401

    import vector_spark.plans.config as C

    df = spark.createDataFrame(
        [("api.latency:320|ms|@0.5|#env:prod",), ("bad",)], "message string"
    )
    out = {r["message"][:3]: r for r in C.TRANSFORMS["statsd_parser"](df, {}).collect()}
    good = out["api"]
    assert good["name"] == "api.latency"
    assert good["value"] == 0.32 and good["sample_rate"] == 2.0
    assert good["tags_s"] == "env:prod"
    assert out["bad"]["error"] is not None


def test_topology_dot():
    """`vector graph` DOT rendering (src/graph.rs:82-118 shapes)."""
    from vector_spark.plans.config import topology_dot

    dot = topology_dot(
        {
            "sources": {"s": {"type": "parquet"}},
            "transforms": {"t": {"type": "filter", "inputs": ["s"]}},
            "sinks": {"o": {"type": "memory", "inputs": ["t"]}},
        }
    )
    assert '"s" [shape=trapezium]' in dot
    assert '"t" [shape=diamond]' in dot
    assert '"o" [shape=invtrapezium]' in dot
    assert '"s" -> "t"' in dot and '"t" -> "o"' in dot


def test_streaming_topology(spark, tmp_path):
    """stream_parquet source → filter → checkpointed parquet sink via
    the TOML front-end: incremental availableNow runs process each file
    once; a memory sink on the same stream collects the filtered rows."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "id int, kind string"
    ).coalesce(1).write.parquet(src + "/p1")

    toml = f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, kind string"

[transforms.kept]
type = "filter"
inputs = ["stream"]
condition = "kind = 'keep'"

[sinks.out]
type = "parquet"
inputs = ["kept"]
path = "{out}"
checkpoint = "{ck}"
"""
    topo = compile_config(spark, toml)
    assert topo.run()["out"] == "written"
    assert [r["id"] for r in spark.read.parquet(out).collect()] == [1]

    # second incremental batch only processes the new file
    spark.createDataFrame(
        [(3, "keep")], "id int, kind string"
    ).coalesce(1).write.parquet(src + "/p2")
    compile_config(spark, toml).run()
    assert sorted(r["id"] for r in spark.read.parquet(out).collect()) == [1, 3]


def test_streaming_partitioned_sink_defaults_to_append(spark, tmp_path):
    """A PARTITIONED streaming parquet sink defaults to append: a later
    micro-batch touching an existing partition must not delete rows
    earlier batches wrote there (ADVICE r2: the old
    overwrite_partitions default silently dropped data)."""
    import pytest

    from vector_spark.plans.config import ConfigError

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, source string"
    ).coalesce(1).write.parquet(src + "/p1")

    toml = f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, source string"

[sinks.out]
type = "parquet"
inputs = ["stream"]
path = "{out}"
checkpoint = "{ck}"
partition_by = ["source"]
"""
    compile_config(spark, toml).run()
    spark.createDataFrame(
        [(3, "b")], "id int, source string"
    ).coalesce(1).write.parquet(src + "/p2")
    compile_config(spark, toml).run()
    got = {(r["id"], r["source"]) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "b")}

    # overwrite_partitions without partition_by is a config error
    bad = toml.replace('partition_by = ["source"]', 'stream_mode = "overwrite_partitions"')
    with pytest.raises(ConfigError):
        compile_config(spark, bad).run()


def test_streaming_watermarked_aggregate_toml(spark, tmp_path):
    """A stateful `aggregate` through the TOML front-end over a
    streaming source: compiles to a watermarked tumbling window; each
    finalized window row reaches the parquet sink EXACTLY once, across
    micro-batches within a run and across incremental availableNow
    runs (the checkpointed state store carries open windows over)."""
    from datetime import datetime

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def write_file(name, rows):
        spark.createDataFrame(
            [(i, s, n, datetime(2026, 1, 1, h, m, sec)) for i, s, n, (h, m, sec) in rows],
            "id int, source string, n_tok int, ts timestamp",
        ).coalesce(1).write.parquet(f"{src}/{name}")

    # two events in the [00:00:00, 00:00:10) window for source=app
    write_file("p1", [(1, "app", 5, (0, 0, 1)), (2, "app", 7, (0, 0, 2))])
    # one event an hour later: its arrival pushes the watermark far past
    # the p1 window, which therefore finalizes during this run
    write_file("p2", [(3, "web", 11, (1, 0, 0))])

    toml = f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, source string, n_tok int, ts timestamp"
max_files_per_trigger = 1

[transforms.agg]
type = "aggregate"
inputs = ["stream"]
group_by = ["source"]
interval_ms = 10000
watermark = "1 second"

[transforms.agg.aggregates]
n_events = "count:"
sum_n_tok = "sum:n_tok"

[sinks.out]
type = "parquet"
inputs = ["agg"]
path = "{out}"
checkpoint = "{ck}"
"""
    assert compile_config(spark, toml).run()["out"] == "written"
    got = {
        (str(r["window_start"]), r["source"], r["n_events"], r["sum_n_tok"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("2026-01-01 00:00:00", "app", 2, 12)}

    # next incremental run: a still-later file closes the p2 window;
    # the p1 window must NOT be re-emitted (exactly-once via checkpoint)
    write_file("p3", [(4, "app", 3, (2, 0, 0))])
    compile_config(spark, toml).run()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # no duplicate of the app window
    got = {(str(r["window_start"]), r["source"], r["n_events"]) for r in rows}
    assert got == {
        ("2026-01-01 00:00:00", "app", 2),
        ("2026-01-01 01:00:00", "web", 1),
    }


def test_streaming_dedupe_toml(spark, tmp_path):
    """A stateful `dedupe` through the TOML front-end: duplicates of a
    match key arriving within the watermark horizon are dropped, both
    inside one micro-batch and across micro-batches of the backlog."""
    from datetime import datetime

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))

    def write_file(name, rows):
        spark.createDataFrame(
            [(i, k, datetime(2026, 1, 1, 0, 0, s)) for i, k, s in rows],
            "id int, k string, ts timestamp",
        ).coalesce(1).write.parquet(f"{src}/{name}")

    write_file("p1", [(1, "a", 1), (2, "a", 2), (3, "b", 3)])  # intra-batch dup of 'a'
    write_file("p2", [(4, "b", 4), (5, "c", 5)])  # cross-batch dup of 'b'

    toml = f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, k string, ts timestamp"
max_files_per_trigger = 1

[transforms.uniq]
type = "dedupe"
inputs = ["stream"]
watermark = "1 hour"

[transforms.uniq.fields]
match = ["k"]

[sinks.out]
type = "parquet"
inputs = ["uniq"]
path = "{out}"
checkpoint = "{ck}"
"""
    compile_config(spark, toml).run()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == ["a", "b", "c"]


def test_enrich_from_csv_table(spark, events_path, tmp_path):
    """Reference-native enrichment format: a CSV file with headers +
    typed schema broadcast-joined through the TOML front-end
    (src/enrichment_tables/file.rs loads exactly this shape)."""
    csv = tmp_path / "dim.csv"
    csv.write_text("event_type;label\nerror;bad\nclick;ui\n")
    toml = f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.enriched]
type = "enrich"
inputs = ["events"]
keys = ["event_type"]
[transforms.enriched.table]
path = "{csv}"
delimiter = ";"
schema = "event_type string, label string"

[sinks.out]
type = "memory"
inputs = ["enriched"]
"""
    rows = compile_config(spark, toml).run()["out"]
    labels = {r["event_type"]: r["label"] for r in rows}
    assert labels["error"] == "bad" and labels["click"] == "ui"
    assert all(r["label"] is None for r in rows if r["event_type"] not in ("error", "click"))


def test_enrich_csv_schema_map(spark, events_path, tmp_path):
    """The reference's per-column schema map (file.rs FileConfig.schema,
    parse_column:52-106): {col = "integer", d = "date|%m/%d/%Y"} —
    a reference-shaped TOML table must load, with typed columns."""
    import datetime

    csv = tmp_path / "dim2.csv"
    csv.write_text("event_type,weight,since\nerror,10,01/15/2023\nclick,3,06/30/2024\n")
    toml = f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.enriched]
type = "enrich"
inputs = ["events"]
keys = ["event_type"]
[transforms.enriched.table]
path = "{csv}"
[transforms.enriched.table.schema]
event_type = "string"
weight = "integer"
since = "date|%m/%d/%Y"

[sinks.out]
type = "memory"
inputs = ["enriched"]
"""
    rows = compile_config(spark, toml).run()["out"]
    by_type = {r["event_type"]: r for r in rows if r["event_type"] in ("error", "click")}
    assert by_type["error"]["weight"] == 10 and by_type["click"]["weight"] == 3
    assert by_type["error"]["since"] == datetime.datetime(2023, 1, 15)  # midnight, date-parse


def test_enrich_csv_schema_errors(spark, events_path, tmp_path):
    """Bad schema shapes raise a NAMED ConfigError (the reference-shaped
    claim used to die with an opaque Spark error)."""
    import pytest

    from vector_spark.plans.config import ConfigError

    csv = tmp_path / "dim3.csv"
    csv.write_text("event_type,weight\nerror,10\n")
    base = f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.enriched]
type = "enrich"
inputs = ["events"]
keys = ["event_type"]
[transforms.enriched.table]
path = "{csv}"
{{schema}}

[sinks.out]
type = "memory"
inputs = ["enriched"]
"""
    with pytest.raises(ConfigError, match="unknown enrichment schema type"):
        compile_config(
            spark, base.format(schema='[transforms.enriched.table.schema]\nweight = "quaternion"')
        ).run()
    with pytest.raises(ConfigError, match="not present in the CSV header"):
        compile_config(
            spark, base.format(schema='[transforms.enriched.table.schema]\nnope = "integer"')
        ).run()
    with pytest.raises(ConfigError, match="unsupported chrono directive"):
        compile_config(
            spark, base.format(schema='[transforms.enriched.table.schema]\nweight = "date|%Q"')
        ).run()


def test_tap_prints_component_sample(spark, events_path, tmp_path, capsys):
    """`--tap` (the vector tap analogue): one-shot JSON-line sample of
    any component's output; unknown names list what exists."""
    import json as _json

    import run_config

    cfg = tmp_path / "tap.toml"
    cfg.write_text(f"""
[sources.events]
type = "parquet"
path = "{events_path}"

[transforms.errors]
type = "filter"
inputs = ["events"]
condition = "event_type = 'error'"

[sinks.out]
type = "noop"
inputs = ["errors"]
""")
    rc = run_config.main([str(cfg), "--tap", "errors", "--limit", "5"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert 0 < len(lines) <= 5
    assert all(_json.loads(l)["event_type"] == "error" for l in lines)

    rc = run_config.main([str(cfg), "--tap", "nope"])
    assert rc == 1
    assert "unknown component" in capsys.readouterr().err


def test_recompile_preserves_unchanged_checkpoints(spark, tmp_path):
    """Config reload (diff.rs / topology/running.rs analogue): swapping
    one transform between two availableNow runs keeps every untouched
    sink's checkpoint — only data that arrived since the old run is
    processed — and the changed (stateless) chain keeps its offsets
    too, applying the new logic from the next file on."""
    from vector_spark.plans.config import recompile

    src, out_a, out_b, ck_a, ck_b = (
        str(tmp_path / d) for d in ("src", "out_a", "out_b", "ck_a", "ck_b")
    )
    spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "id int, kind string"
    ).coalesce(1).write.parquet(src + "/p1")

    def cfg(t_b_condition):
        return f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, kind string"

[transforms.t_a]
type = "filter"
inputs = ["stream"]
condition = "kind = 'keep'"

[transforms.t_b]
type = "filter"
inputs = ["stream"]
condition = "{t_b_condition}"

[sinks.a]
type = "parquet"
inputs = ["t_a"]
path = "{out_a}"
checkpoint = "{ck_a}"

[sinks.b]
type = "parquet"
inputs = ["t_b"]
path = "{out_b}"
checkpoint = "{ck_b}"
"""

    old = cfg("id < 10")
    compile_config(spark, old).run()
    assert sorted(r["id"] for r in spark.read.parquet(out_a).collect()) == [1]
    assert sorted(r["id"] for r in spark.read.parquet(out_b).collect()) == [1, 2]

    # new data arrives; t_b's condition is swapped
    spark.createDataFrame(
        [(3, "keep"), (4, "drop")], "id int, kind string"
    ).coalesce(1).write.parquet(src + "/p2")
    new = cfg("kind = 'drop'")
    topo, diff = recompile(spark, old, new)
    assert diff.transforms.to_change == {"t_b"}
    assert not diff.sources.any_changes() and not diff.sinks.any_changes()
    # stateless chain: checkpoints untouched for BOTH sinks
    assert topo.sink_configs["a"]["checkpoint"] == ck_a
    assert topo.sink_configs["b"]["checkpoint"] == ck_b
    topo.run()
    # unchanged sink a processed ONLY p2 (checkpoint preserved)
    assert sorted(r["id"] for r in spark.read.parquet(out_a).collect()) == [1, 3]
    # changed sink b kept its offsets: p1 NOT re-ingested under the new
    # condition (a reset would have appended id=2 again), p2 filtered
    # by the new logic
    assert sorted(r["id"] for r in spark.read.parquet(out_b).collect()) == [1, 2, 4]


def test_recompile_rotates_stateful_checkpoint_and_purges_removed(spark, tmp_path):
    """A changed chain that carries streaming-stateful operator state
    gets a deterministic checkpoint rotation (Spark refuses state
    restores under a changed plan); removed sinks can purge their
    checkpoints."""
    import os

    from vector_spark.plans.config import recompile

    src, out, ck, ck_gone = (
        str(tmp_path / d) for d in ("src", "out", "ck", "ck_gone")
    )
    import datetime

    spark.createDataFrame(
        [(1, "keep", datetime.datetime(2026, 1, 1))], "id int, kind string, ts timestamp"
    ).coalesce(1).write.parquet(src + "/p1")
    os.makedirs(ck_gone, exist_ok=True)

    def cfg(cond, with_b=True):
        b = f"""
[sinks.b]
type = "noop"
inputs = ["pre"]
checkpoint = "{ck_gone}"
""" if with_b else ""
        return f"""
[sources.stream]
type = "stream_parquet"
path = "{src}/p*"
schema = "id int, kind string, ts timestamp"

[transforms.pre]
type = "filter"
inputs = ["stream"]
condition = "{cond}"

[transforms.agg]
type = "dedupe"
inputs = ["pre"]
fields = {{ match = ["id"] }}

[sinks.a]
type = "parquet"
inputs = ["agg"]
path = "{out}"
checkpoint = "{ck}"
{b}
"""

    old, new = cfg("id < 10"), cfg("id < 99", with_b=False)
    topo, diff = recompile(spark, old, new, purge_removed=True)
    assert diff.transforms.to_change == {"pre"}
    assert diff.sinks.to_remove == {"b"}
    rotated = topo.sink_configs["a"]["checkpoint"]
    assert rotated != ck and rotated.startswith(ck + "-gen")
    # deterministic: recompiling the same pair rotates to the same dir
    topo2, _ = recompile(spark, old, new)
    assert topo2.sink_configs["a"]["checkpoint"] == rotated
    # removed sink's checkpoint purged
    assert not os.path.exists(ck_gone)


def test_top_snapshots_monotone(spark, tmp_path, capsys):
    """`vector top` analogue: the run emits >=2 Prometheus exposition
    snapshots with monotone per-component counters, via the
    run_config.py --top flag."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo")
    import run_config
    from vector_spark.plans.top import parse_snapshot

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(10)], "id int, kind string"
    ).write.parquet(src)
    top_dir = str(tmp_path / "top")
    cfg = tmp_path / "top.toml"
    cfg.write_text(f"""
[sources.ev]
type = "parquet"
path = "{src}"

[transforms.kept]
type = "filter"
inputs = ["ev"]
condition = "kind = 'keep'"

[sinks.all_rows]
type = "noop"
inputs = ["ev"]

[sinks.kept_rows]
type = "noop"
inputs = ["kept"]
""")
    rc = run_config.main([str(cfg), "--top", "0", "--top-dir", top_dir])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # one snapshot per sink + the final stop() snapshot
    assert out["top_snapshots"] >= 3

    import glob

    files = sorted(glob.glob(top_dir + "/top-*.prom"))
    assert len(files) == out["top_snapshots"]
    first, last = parse_snapshot(files[0]), parse_snapshot(files[-1])
    # counters monotone between snapshots; final values = real row counts
    for key, v in first.items():
        if key[0] == "vector_component_sent_events_total":
            assert last[key] >= v
    assert last[
        ("vector_component_sent_events_total", (("component", "all_rows"),))
    ] == 10.0
    assert last[
        ("vector_component_sent_events_total", (("component", "kept_rows"),))
    ] == 5.0
    assert ("vector_uptime_seconds", ()) in last


def test_internal_metrics_source(spark, tmp_path):
    """internal_metrics source: TopMonitor exposition snapshots re-enter
    the topology as metric events (src/sources/internal_metrics.rs
    plan position), composable with transforms and sinks."""
    from vector_spark.plans.top import TopMonitor

    top_dir = str(tmp_path / "snaps")
    mon = TopMonitor(spark, top_dir)
    mon.record("lane_a", 7)
    mon.snapshot()
    mon.record("lane_a", 3)
    mon.record("lane_b", 2)
    mon.snapshot()

    toml = f"""
[sources.metrics]
type = "internal_metrics"
path = "{top_dir}/top-*.prom"

[transforms.sent]
type = "filter"
inputs = ["metrics"]
condition = "name = 'vector_component_sent_events_total'"

[sinks.out]
type = "memory"
inputs = ["sent"]
"""
    rows = compile_config(spark, toml).run()["out"]
    got = {(r["labels"]["component"], r["value"]) for r in rows}
    # snapshot 1: a=7; snapshot 2: a=10, b=2 — counters cumulative
    assert got == {("lane_a", 7.0), ("lane_a", 10.0), ("lane_b", 2.0)}


def test_validate_strict_vrl_rejects_unhandled_fallible(spark):
    """`vector validate` behavior: strict_vrl applies the reference's
    compile-time fallibility diagnostics to remap programs — an
    unhandled fallible assignment is error[E103] at VALIDATE time,
    while normal execution keeps the lenient runtime error channel."""
    import pytest as _pytest

    from vector_spark.vrl import VrlCompileError

    toml = """
[sources.logs]
type = "generator"
rows = 5

[transforms.bad]
type = "remap"
inputs = ["logs"]
source = '.x = 1 / 0'

[sinks.out]
type = "memory"
inputs = ["bad"]
"""
    # lenient (execution) path compiles
    compile_config(spark, toml)
    # strict (validate) path rejects with the reference's code
    with _pytest.raises(VrlCompileError, match=r"error\[E103\]"):
        compile_config(spark, toml, strict_vrl=True)
    # a handled program passes strict too
    ok = toml.replace("'.x = 1 / 0'", "'.x = 1 / 0 ?? 0.0'")
    compile_config(spark, ok, strict_vrl=True)
