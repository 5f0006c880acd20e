"""Per-operator golden tests (mirrors Vector's behavior-test layer,
tests/behavior/transforms/*.toml — SURVEY.md §5)."""

import pyspark.sql.functions as F

from tests import py_oracle


def test_route_multimatch(spark, corpus, corpus_rows):
    """Multi-match parallel lanes — an event can land in several
    (route.rs:101-120); golden per-lane doc_id sets from the oracle."""
    from vector_spark.plans.pipeline import lanes, parse_stage
    from vector_spark.operators.route import Route

    parsed = parse_stage(corpus)
    routed = Route(lanes(), with_unmatched=True).apply(parsed)
    expected = py_oracle.route_oracle(corpus_rows)
    for lane, exp_ids in expected.items():
        got = {r["doc_id"] for r in routed[lane].select("doc_id").collect()}
        assert got == exp_ids, f"lane {lane}: {len(got)} vs {len(exp_ids)}"


def test_route_tagged_equivalent(spark, corpus):
    """Single-pass explode variant produces the same (doc, lane) pairs."""
    from vector_spark.plans.pipeline import lanes, parse_stage
    from vector_spark.operators.route import Route

    parsed = parse_stage(corpus)
    router = Route(lanes(), with_unmatched=True)
    multi = {
        (r["doc_id"], name)
        for name, df in router.apply(parsed).items()
        for r in df.select("doc_id").collect()
    }
    tagged = {
        (r["doc_id"], r["lane"]) for r in router.tagged(parsed).select("doc_id", "lane").collect()
    }
    assert multi == tagged


def test_sink_metrics_golden(spark, corpus, corpus_rows):
    """Per-sink aggregate counts equal the Python oracle (north_star)."""
    from vector_spark.plans.pipeline import lanes, parse_stage, sink_aggregate, salted_sink_aggregate
    from vector_spark.operators.route import Route

    parsed = parse_stage(corpus)
    routed = Route(lanes(), with_unmatched=True).apply(parsed)
    expected_sets = py_oracle.route_oracle(corpus_rows)
    for lane, df in routed.items():
        exp = py_oracle.sink_metrics_oracle(corpus_rows, expected_sets[lane])
        for agg_fn in (sink_aggregate, salted_sink_aggregate):
            got = {
                (r["source"], r["severity"]): (r["n_events"], r["sum_n_tok"])
                for r in agg_fn(df).collect()
            }
            assert got == exp, f"lane {lane} via {agg_fn.__name__}"


def test_token_array_invariant(spark, corpus):
    """tokens byte-identical through parse+route (the shared invariant)."""
    from vector_spark.plans.pipeline import lanes, parse_stage
    from vector_spark.operators.route import Route

    parsed = parse_stage(corpus)
    routed = Route(lanes()).apply(parsed)
    orig = corpus.select("doc_id", F.xxhash64("tokens").alias("h0"))
    for name, df in routed.items():
        out = df.select("doc_id", F.xxhash64("tokens").alias("h1"))
        assert orig.join(out, "doc_id").filter("h0 <> h1").count() == 0


def test_filter(spark):
    from vector_spark.operators.filter import FieldFilter, Filter

    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "k string, v int")
    assert Filter(F.col("v") > 1).apply(df).count() == 2
    assert FieldFilter("k", "a").apply(df).count() == 2


def test_sample_keyed_deterministic(spark):
    from vector_spark.operators.sample import Sample

    df = spark.createDataFrame([(f"host-{i}",) for i in range(200)], "host string")
    a = {r["host"] for r in Sample(10, key_field="host").apply(df).collect()}
    b = {r["host"] for r in Sample(10, key_field="host").apply(df).collect()}
    assert a == b and 0 < len(a) < 200
    # exclude bypass: excluded rows always kept
    ex = Sample(10, key_field="host", exclude=F.col("host") == "host-0").apply(df)
    assert "host-0" in {r["host"] for r in ex.collect()}
    # sample_rate stamped (sample.rs:131)
    assert ex.select("sample_rate").distinct().collect()[0][0] == 10


def test_dedupe_default_fields(spark, corpus, corpus_rows):
    from vector_spark.operators.dedupe import Dedupe

    # plant duplicates: union the corpus head onto itself
    dup = corpus.limit(50)
    df = corpus.unionByName(dup)
    out = Dedupe(match=["ts", "host", "message"]).apply(df)
    assert out.count() == corpus.count()  # all planted dups dropped


def test_dedupe_first_seen(spark):
    from vector_spark.operators.dedupe import Dedupe

    df = spark.createDataFrame(
        [("k1", 1, "first"), ("k1", 2, "second"), ("k2", 3, "only")],
        "k string, t int, payload string",
    )
    rows = {r["k"]: r["payload"] for r in Dedupe(match=["k"], order_by="t").apply(df).collect()}
    assert rows == {"k1": "first", "k2": "only"}


def test_dedupe_ignore_fields(spark):
    from vector_spark.operators.dedupe import Dedupe

    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 1, 200), ("b", 1, 300)], "k string, v int, noise int"
    )
    out = Dedupe(ignore=["noise"]).apply(df)
    assert out.count() == 2


def test_reduce_merge_strategies(spark):
    """F5 golden: one group of 5 events per strategy (merge_strategy.rs:9-21)."""
    from vector_spark.operators.reduce import Reduce

    rows = [("g", i, float(i), f"m{i}", [i] * i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, ts int, v double, m string, arr array<int>")
    out = Reduce(
        group_by=["g"],
        merge_strategies={"v": "sum", "m": "concat", "arr": "longest_array"},
        order_by="ts",
    ).apply(df).collect()[0]
    assert out["v"] == 15.0
    assert out["m"] == "m1 m2 m3 m4 m5"
    assert out["arr"] == [5, 5, 5, 5, 5]
    assert out["n_events"] == 5

    out2 = Reduce(
        group_by=["g"],
        merge_strategies={"v": "min", "m": "retain", "arr": "flat_unique"},
        order_by="ts",
    ).apply(df).collect()[0]
    assert out2["v"] == 1.0 and out2["m"] == "m5"
    assert sorted(out2["arr"]) == [1, 2, 3, 4, 5]

    out3 = Reduce(
        group_by=["g"],
        merge_strategies={"m": "discard", "arr": "shortest_array", "v": "max"},
        order_by="ts",
    ).apply(df).collect()[0]
    assert out3["m"] == "m1" and out3["arr"] == [1] and out3["v"] == 5.0


def test_aggregate_incremental_and_absolute(spark):
    """F5 golden: incremental counters 42+43=85; absolute last-write-wins
    (aggregate.rs:166-200)."""
    from vector_spark.operators.aggregate import Aggregate

    rows = [
        ("c", "ns", {"h": "1"}, "2026-01-01 00:00:01", "incremental", "counter", 42.0),
        ("c", "ns", {"h": "1"}, "2026-01-01 00:00:02", "incremental", "counter", 43.0),
        ("g", "ns", {"h": "1"}, "2026-01-01 00:00:01", "absolute", "gauge", 1.0),
        ("g", "ns", {"h": "1"}, "2026-01-01 00:00:05", "absolute", "gauge", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "name string, namespace string, tags map<string,string>, ts string, "
        "kind string, value_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["name"]: r for r in Aggregate().apply(df).collect()}
    assert out["c"]["value"] == 85.0 and out["c"]["n_merged"] == 2
    assert out["g"]["value"] == 9.0  # last write wins
    assert out["c"]["ts"].second == 2  # merged timestamp = max


def test_log_to_metric(spark):
    from vector_spark.operators.log_to_metric import LogToMetric, MetricSpec

    df = spark.createDataFrame(
        [("a", 1.5, "2026-01-01"), ("b", None, "2026-01-01")], "t string, v double, ts string"
    )
    out = LogToMetric(
        [MetricSpec(type="counter", field="v", increment_by_value=True, tags={"t": "{{t}}"})]
    ).apply(df)
    rows = out.collect()
    assert len(rows) == 1  # null field → event skipped
    assert rows[0]["value"] == 1.5 and rows[0]["tags"]["t"] == "a"


def test_fields_ops(spark):
    from vector_spark.operators.fields import (
        AddFields,
        AddTags,
        Coercer,
        Concat,
        RemoveFields,
        RemoveTags,
        RenameFields,
    )

    df = spark.createDataFrame([("x", "7", "2026-01-01 00:00:00")], "a string, n string, t string")
    out = AddFields({"lit": "v", "tpl": "pre-{{a}}"}).apply(df).collect()[0]
    assert out["lit"] == "v" and out["tpl"] == "pre-x"
    assert "a" not in RemoveFields(["a"]).apply(df).columns
    assert "b" in RenameFields({"a": "b"}).apply(df).columns
    # missing source leaves the target untouched (rename_fields.rs:
    # only touches target when remove(old) yields a value)
    untouched = RenameFields({"ghost": "a"}).apply(df).collect()[0]
    assert untouched["a"] == "x"
    co = Coercer({"n": "int", "t": "timestamp"}).apply(df).collect()[0]
    assert co["n"] == 7 and co["t"].year == 2026
    cc = Concat("out", [("a", None, None), ("n", 0, 1)], joiner="-").apply(df).collect()[0]
    assert cc["out"] == "x-7"

    tdf = spark.createDataFrame([({"x": "1", "y": "2"},)], "tags map<string,string>")
    tagged = AddTags({"x": "9", "z": "3"}).apply(tdf).collect()[0]["tags"]
    assert tagged == {"x": "9", "y": "2", "z": "3"}
    kept = AddTags({"x": "9"}, overwrite=False).apply(tdf).collect()[0]["tags"]
    assert kept["x"] == "1"
    rm = RemoveTags(["y"]).apply(tdf).collect()[0]["tags"]
    assert rm == {"x": "1"}


def test_tag_cardinality_limit(spark):
    from vector_spark.operators.tag_cardinality_limit import TagCardinalityLimit

    rows = [(f"v{i % 5}", i) for i in range(50)]  # v0..v4 first seen in order
    df = spark.createDataFrame(rows, "tag string, ts int")
    kept = TagCardinalityLimit("tag", value_limit=3, action="drop_event").apply(df)
    assert {r["tag"] for r in kept.collect()} == {"v0", "v1", "v2"}
    nulled = TagCardinalityLimit("tag", value_limit=3, action="drop_tag").apply(df)
    vals = {r["tag"] for r in nulled.collect()}
    assert vals == {"v0", "v1", "v2", None} and nulled.count() == 50

    # scale shape: accept-set build is a distributed top-K, not a
    # global single-partition window rank
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan


def test_map_tag_cardinality_limit(spark):
    from vector_spark.operators.tag_cardinality_limit import MapTagCardinalityLimit

    rows = []
    for i in range(40):
        rows.append(({"host": f"h{i % 5}", "app": f"a{i % 2}", "static": "s"}, i))
    df = spark.createDataFrame(rows, "tags map<string,string>, ts int")

    # host capped at 3 (h0..h2 accepted), app capped at 3 (both accepted)
    out = MapTagCardinalityLimit(["host", "app"], value_limit=3, action="drop_tag").apply(df)
    got = out.collect()
    assert len(got) == 40
    for r in got:
        t = r["tags"]
        assert t["static"] == "s" and t["app"] in ("a0", "a1")
        if "host" in t:
            assert t["host"] in ("h0", "h1", "h2")
    n_dropped = sum(1 for r in got if "host" not in r["tags"])
    assert n_dropped == 16  # h3, h4 rows: 8 each

    dropped = MapTagCardinalityLimit(["host"], value_limit=3, action="drop_event").apply(df)
    kept_hosts = {r["tags"]["host"] for r in dropped.collect()}
    assert kept_hosts == {"h0", "h1", "h2"} and dropped.count() == 24


def test_merge_partials(spark):
    from vector_spark.operators.merge import MergePartials

    rows = [
        ("h1", 1, "hel", True),
        ("h1", 2, "lo ", True),
        ("h1", 3, "world", False),  # terminator
        ("h1", 4, "solo", False),
        ("h2", 5, "a", True),  # trailing partial, never terminated → buffered
    ]
    df = spark.createDataFrame(rows, "host string, ts int, message string, _partial boolean")
    out = MergePartials(["message"], stream_discriminant=["host"], order_by="ts").apply(df)
    got = {(r["host"], r["message"]) for r in out.collect()}
    assert got == {("h1", "hello world"), ("h1", "solo")}


def test_metric_to_log(spark):
    from vector_spark.operators.metric_to_log import MetricToLog

    df = spark.createDataFrame(
        [("c", {"host": "h9"}, "2026-01-01 00:00:00")], "name string, tags map<string,string>, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    row = MetricToLog().apply(df).collect()[0]
    assert row["host"] == "h9" and '"name":"c"' in row["message"]

    # null tags / null name serialize, not NULL out the message
    nulls = spark.createDataFrame(
        [(None, None, "2026-01-01 00:00:00")],
        "name string, tags map<string,string>, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    nrow = MetricToLog().apply(nulls).collect()[0]
    assert nrow["message"] is not None
    assert '"name":""' in nrow["message"] and '"tags":{}' in nrow["message"]

    # quotes/backslashes in tag values are JSON-escaped
    import json

    spicy = spark.createDataFrame(
        [("m", {"q": 'say "hi"', "b": "a\\b"}, "2026-01-01 00:00:00")],
        "name string, tags map<string,string>, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    srow = MetricToLog().apply(spicy).collect()[0]
    parsed = json.loads(srow["message"])
    assert parsed["tags"] == {"q": 'say "hi"', "b": "a\\b"}


def test_enrichment_unique_contract(spark):
    from vector_spark.enrich import EnrichmentTable

    import pytest

    dim = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v int")
    with pytest.raises(ValueError):
        EnrichmentTable(dim, keys=["k"]).assert_unique()


def test_enrichment_broadcast_join(spark, corpus):
    from vector_spark.corpus import enrichment_table
    from vector_spark.enrich import EnrichmentTable

    et = EnrichmentTable(enrichment_table(spark), keys=["source"])
    et.assert_unique()
    out = et.enrich(corpus)
    assert out.count() == corpus.count()  # left join keeps all
    assert out.filter(F.col("team").isNull()).count() == 0  # all sources resolve
    # plan actually broadcasts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_geoip_range_join(spark):
    from vector_spark.enrich import geoip_enrich

    cidr = spark.createDataFrame(
        [(int("0A000000", 16), int("0AFFFFFF", 16), "ten-net")], "ip_lo long, ip_hi long, zone string"
    )
    df = spark.createDataFrame([("10.0.0.5",), ("11.0.0.5",)], "ip string")
    rows = {r["ip"]: r["geoip_zone"] for r in geoip_enrich(df, "ip", cidr).collect()}
    assert rows == {"10.0.0.5": "ten-net", "11.0.0.5": None}


def test_ec2_metadata_operator(spark):
    from vector_spark.enrich import Ec2Metadata

    import pytest

    fake = {"instance-id": "i-0abc", "region": "us-east-1", "secret-thing": "nope"}
    df = spark.createDataFrame([(1,)], "id int")
    out = Ec2Metadata(fetcher=lambda: fake).apply(df).collect()[0]
    assert out["instance_id"] == "i-0abc" and out["region"] == "us-east-1"
    assert "secret_thing" not in out.asDict()  # allowlist filter

    only = Ec2Metadata(fetcher=lambda: fake, fields=["region"], prefix="ec2_").apply(df)
    assert only.columns == ["id", "ec2_region"]

    with pytest.raises(RuntimeError):
        Ec2Metadata().apply(df)  # no IMDS in sandbox → explicit error


def test_bounded_reduce_starts_and_ends_when(spark):
    """reduce/mod.rs:221-257 boundary semantics: ends_when merges the
    closer into the current collapse; starts_when opens a new collapse
    AT the starter."""
    import pyspark.sql.functions as F

    from vector_spark.operators.reduce import BoundedReduce

    rows = [
        ("a", 1, "start", 10), ("a", 2, "mid", 20), ("a", 3, "end", 30),
        ("a", 4, "start", 40), ("a", 5, "end", 50),
        ("b", 6, "mid", 60),
    ]
    df = spark.createDataFrame(rows, "g string, ts long, kind string, v long")

    ended = BoundedReduce(
        ["g"], {"v": "sum", "kind": "concat"}, order_by="ts",
        ends_when="kind = 'end'",
    ).apply(df)
    got = {(r["g"], r["segment"]): (r["v"], r["kind"], r["n_events"]) for r in ended.collect()}
    assert got[("a", 0)] == (60, "start mid end", 3)   # closer merged in
    assert got[("a", 1)] == (90, "start end", 2)
    assert got[("b", 0)] == (60, "mid", 1)

    started = BoundedReduce(
        ["g"], {"v": "sum"}, order_by="ts", starts_when="kind = 'start'",
    ).apply(df)
    got = {(r["g"], r["segment"]): (r["v"], r["n_events"]) for r in started.collect()}
    # first 'start' opens segment 1 immediately: a -> [start,mid,end] [start,end]
    assert got[("a", 1)] == (60, 3)
    assert got[("a", 2)] == (90, 2)
    assert got[("b", 0)] == (60, 1)


def test_bounded_reduce_edge_shapes(spark):
    """All rows are closers (every event its own segment); no rows
    match (single segment per key)."""
    from vector_spark.operators.reduce import BoundedReduce

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)], "g string, ts long, v long"
    )
    all_end = BoundedReduce(["g"], {"v": "sum"}, order_by="ts", ends_when="true").apply(df)
    assert sorted((r["segment"], r["v"]) for r in all_end.collect()) == [(0, 10), (1, 20), (2, 30)]

    none_end = BoundedReduce(["g"], {"v": "sum"}, order_by="ts", ends_when="false").apply(df)
    assert [(r["segment"], r["v"], r["n_events"]) for r in none_end.collect()] == [(0, 60, 3)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        BoundedReduce(["g"], {}, starts_when="true", ends_when="true")
