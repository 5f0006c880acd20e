"""Metric codec + type-reflection tests: the branches the driver's
oracle fixtures don't reach (error arms, h/d statsd types, signed
gauges, prometheus escapes/Inf/NaN, tag_types recursion)."""

import math

import pyspark.sql.functions as F
import pytest

from vector_spark.functions.metrics_codec import (
    parse_prometheus,
    parse_statsd,
    serialize_tags,
)
from vector_spark.functions import types as T


def _statsd_rows(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    p = parse_statsd(F.col("line"))
    cols = [v.alias(k) for k, v in p.items() if k != "tags"]
    cols.append(
        F.when(p["tags"].isNotNull(), serialize_tags(p["tags"])).alias("tags_sorted")
    )
    return {r["line"]: r.asDict() for r in df.select("line", *cols).collect()}


def test_statsd_reference_matrix(spark):
    # mirrors src/sources/statsd/parser.rs tests: counter with rate,
    # signed gauges, timer base-unit conversion, set, distribution,
    # sanitization, malformed packets
    rows = _statsd_rows(
        spark,
        [
            "foo:1|c",
            "bar:2|c|@0.1",                      # value scaled 2*10
            "gorky:-3|g",                        # incremental delta
            "glork:320|ms|@0.1",                 # 0.32s, weight 10
            "set:42|s",
            "dist:6.7|d",
            "histo:7|h",
            "a/b c:1|c",                         # sanitize: a-b_c
            "weird$name!:1|c",                   # strip non-alnum
            "tagged:1|c|#empty,env:prod",        # valueless tag -> true
            "nobody",                            # no colon
            "foo:1",                             # no type
            "foo:1|x",                           # unknown type
            "foo:1|c|@-0.5",                     # negative rate
            "foo:abc|c",                         # bad value
            "foo:*5|g",                          # bad gauge prefix
        ],
    )
    r = rows["foo:1|c"]
    assert (r["name"], r["kind"], r["value"], r["error"]) == ("foo", "incremental", 1.0, None)
    assert rows["bar:2|c|@0.1"]["value"] == pytest.approx(20.0)
    assert rows["bar:2|c|@0.1"]["sample_rate"] == pytest.approx(10.0)
    g = rows["gorky:-3|g"]
    assert (g["kind"], g["value"]) == ("incremental", -3.0)
    t = rows["glork:320|ms|@0.1"]
    assert (t["value"], t["statistic"]) == (pytest.approx(0.32), "histogram")
    s = rows["set:42|s"]
    assert (s["set_value"], s["value"], s["kind"]) == ("42", None, "incremental")
    assert rows["dist:6.7|d"]["statistic"] == "summary"
    assert rows["histo:7|h"]["statistic"] == "histogram"
    assert rows["a/b c:1|c"]["name"] == "a-b_c"
    assert rows["weird$name!:1|c"]["name"] == "weirdname"
    # both serializations: inline (input order) and map-sorted agree here
    assert rows["tagged:1|c|#empty,env:prod"]["tags_s"] == "empty:true,env:prod"
    assert rows["tagged:1|c|#empty,env:prod"]["tags_sorted"] == "empty:true,env:prod"
    for bad in ("nobody", "foo:1", "foo:1|x", "foo:1|c|@-0.5", "foo:abc|c", "foo:*5|g"):
        assert rows[bad]["error"] is not None, bad
        assert rows[bad]["name"] is None


def test_statsd_multicolon_tags_and_bad_rate(spark):
    """parser.rs splits tag chunks on ':' and takes pair[1]: 'k:a:b'
    keeps only 'a' (both serializations); a non-numeric sample rate is a
    parse error, not a silent null."""
    rows = _statsd_rows(spark, ["t:1|c|#k:a:b,env:prod", "foo:1|c|@abc"])
    r = rows["t:1|c|#k:a:b,env:prod"]
    assert r["tags_s"] == "k:a,env:prod"
    assert r["tags_sorted"] == "env:prod,k:a"
    bad = rows["foo:1|c|@abc"]
    assert bad["error"] is not None
    assert bad["name"] is None and bad["value"] is None


def test_statsd_absolute_gauge_and_zero_rate(spark):
    rows = _statsd_rows(spark, ["g1:3|g", "g2:+4|g", "z:5|c|@0"])
    assert rows["g1:3|g"]["kind"] == "absolute"
    assert rows["g2:+4|g"]["kind"] == "incremental"
    assert rows["g2:+4|g"]["value"] == 4.0
    # sanitize_sampling: rate 0 behaves as 1 (parser.rs:174-180)
    assert rows["z:5|c|@0"]["value"] == 5.0


def _prom_rows(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    p = parse_prometheus(F.col("line"))
    cols = [v.alias(k) for k, v in p.items() if k != "labels"]
    cols.append(
        F.when(p["labels"].isNotNull(), serialize_tags(p["labels"])).alias(
            "labels_sorted"
        )
    )
    return {r["line"]: r.asDict() for r in df.select("line", *cols).collect()}


def test_prometheus_reference_matrix(spark):
    rows = _prom_rows(
        spark,
        [
            "http_requests_total 1027",
            'http_requests_total{method="post",code="200"} 1027 1395066363000',
            'msdos_file_access_time{path="C:\\\\DIR\\\\FILE.TXT",error="Cannot find file:\\n\\"FILE.TXT\\""} 1.458255915e9',
            "something_weird{problem=\"division by zero\"} +Inf -3982045",
            "bad_value{} oops",
            "# HELP http_requests_total The total number of HTTP requests.",
            "# TYPE http_requests_total counter",
            "",
        ],
    )
    r = rows["http_requests_total 1027"]
    assert (r["name"], r["value"], r["timestamp_ms"], r["labels_s"]) == (
        "http_requests_total", 1027.0, None, "")
    r = rows['http_requests_total{method="post",code="200"} 1027 1395066363000']
    assert r["labels_s"] == "method:post,code:200"  # exposition order
    assert r["labels_sorted"] == "code:200,method:post"  # map, sorted
    assert r["timestamp_ms"] == 1395066363000
    # escape handling: \\ -> \, \" -> ", \n -> newline (line.rs)
    r = rows['msdos_file_access_time{path="C:\\\\DIR\\\\FILE.TXT",error="Cannot find file:\\n\\"FILE.TXT\\""} 1.458255915e9']
    assert r["labels_sorted"] == 'error:Cannot find file:\n"FILE.TXT",path:C:\\DIR\\FILE.TXT'
    assert r["labels_s"] == 'path:C:\\DIR\\FILE.TXT,error:Cannot find file:\n"FILE.TXT"'
    assert r["value"] == pytest.approx(1.458255915e9)
    r = rows["something_weird{problem=\"division by zero\"} +Inf -3982045"]
    assert math.isinf(r["value"]) and r["value"] > 0
    assert r["timestamp_ms"] == -3982045
    assert rows["bad_value{} oops"]["error"] == "bad value"
    for c in (
        "# HELP http_requests_total The total number of HTTP requests.",
        "# TYPE http_requests_total counter",
        "",
    ):
        assert rows[c]["error"] == "not_a_metric_line"


def test_prometheus_nan_and_neg_inf(spark):
    rows = _prom_rows(spark, ["a NaN", "b -Inf"])
    assert math.isnan(rows["a NaN"]["value"])
    assert rows["b -Inf"]["value"] == float("-inf")


def test_prometheus_encode_label_key_order(spark):
    """Labels sort by KEY (collector.rs make_labels: BTreeMap over
    (key, value) tuples), not by the rendered `k="v"` string — with
    {app, app2}, string-sorting the rendered pairs would emit app2
    first because '2' < '=' in ASCII."""
    from pyspark.sql import functions as F

    from vector_spark.functions.metrics_codec import encode_prometheus

    df = spark.createDataFrame([(1,)], "i long").select(
        encode_prometheus(
            F.lit("m"),
            F.lit(1.0),
            F.create_map(
                F.lit("app2"), F.lit("x"), F.lit("app"), F.lit("y")
            ),
        ).alias("line")
    )
    assert df.first()["line"] == 'm{app="y",app2="x"} 1.0'


def test_typeof_and_is_family(spark):
    cases = [
        ('{"a":1}', "object"),
        ("[1,2]", "array"),
        ('"hi"', "string"),
        ("true", "boolean"),
        ("false", "boolean"),
        ("null", "null"),
        (None, "null"),
        ("42", "integer"),
        ("-7", "integer"),
        ("3.5", "float"),
        ("1e3", "float"),        # exponent form is not i64-shaped
        ("not json", "invalid"),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v string")
    got = [r[0] for r in df.select(T.typeof_value(F.col("v"))).collect()]
    assert got == [t for _, t in cases]
    flags = df.select(
        T.is_object(F.col("v")), T.is_array(F.col("v")), T.is_string(F.col("v")),
        T.is_boolean(F.col("v")), T.is_integer(F.col("v")), T.is_float(F.col("v")),
        T.is_null(F.col("v")),
    ).collect()
    assert list(flags[0]) == [True, False, False, False, False, False, False]
    assert list(flags[-1]) == [False] * 7


def test_tag_types_externally_recursion(spark):
    # the three reference examples (tag_types_externally.rs examples)
    cases = [
        ("123", '{"integer":123}'),
        (
            '{"message":"Hello world","request":{"duration_ms":67.9}}',
            '{"message":{"string":"Hello world"},"request":{"duration_ms":{"float":67.9}}}',
        ),
        ('["foo","bar"]', '[{"string":"foo"},{"string":"bar"}]'),
        ("null", "null"),  # Value::Null passes through (variant text form)
        ('{"a":null,"b":[true,2]}', '{"a":null,"b":[{"boolean":true},{"integer":2}]}'),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v string")
    got = [r[0] for r in df.select(T.tag_types_externally(F.col("v"))).collect()]
    assert got == [t for _, t in cases]


def test_assert_eq(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "a int, b int")
    T.assert_eq(df, F.col("a"), F.col("b"))  # passes
    bad = spark.createDataFrame([(1, 1), (2, 3)], "a int, b int")
    with pytest.raises(AssertionError):
        T.assert_eq(bad, F.col("a"), F.col("b"), "a vs b")


def test_regex_value_kind(spark):
    # to_regex validates; invalid patterns -> NULL struct (VRL errors)
    df = spark.createDataFrame(
        [("^a.c$",), ("(unbalanced",), (None,), ("[0-9]+",)], "p string"
    )
    rx = df.select(T.to_regex(F.col("p")).alias("rx"))
    assert T.is_regex_type(rx, "rx")
    assert not T.is_regex_type(df, "p")
    got = [r[0] for r in rx.select(F.col("rx.regex")).collect()]
    assert got == ["^a.c$", None, None, "[0-9]+"]

    # regex_match applies a runtime regex value; NULL regex propagates
    m = spark.createDataFrame(
        [("abc", "^a.c$"), ("xbc", "^a.c$"), ("abc", "(bad")],
        "s string, p string",
    )
    got = [
        r[0]
        for r in m.select(
            T.regex_match(F.col("s"), T.to_regex(F.col("p")))
        ).collect()
    ]
    assert got == [True, False, None]

    # is_regex over the JSON variant: exactly the one-key {"regex": ...} form
    j = spark.createDataFrame(
        [('{"regex":"^a$"}',), ('{"regex":"^a$","x":1}',), ('"plain"',),
         ('{"string":"^a$"}',), (None,)],
        "v string",
    )
    got = [r[0] for r in j.select(T.is_regex(F.col("v"))).collect()]
    assert got[0] is True and got[1] is False and got[2] in (False, None)
    assert got[3] is False


def test_prometheus_python_mirror_parity(spark):
    """encode_prometheus_py (the driver-side renderer plans/top.py uses
    so a telemetry tick never schedules a Spark job) must be
    BYTE-identical to the executor-side encode_prometheus — including
    Java Double.toString value rendering (plain for 1e-3 <= |x| < 1e7,
    bare-exponent scientific outside) and raw-key label sorting."""
    from pyspark.sql import functions as F

    from vector_spark.functions.metrics_codec import (
        encode_prometheus,
        encode_prometheus_py,
    )

    cases = [
        ("up", 1.0, None, None),
        ("vector_uptime_seconds", 3.41, {}, None),
        ("sent_total", 12345.0, {"component": "lane_a"}, None),
        ("rate", 417.123, {"component": "a b/c!"}, 1395066363000),
        ("weird", float("nan"), {"k": 'v"q\\x\ny'}, None),
        ("inf", float("inf"), {"app": "1", "app2": "2"}, None),
        ("ninf", float("-inf"), None, -5),
        ("big", 12345678.0, None, None),          # 1.2345678E7
        ("huge", 1e21, None, None),               # 1.0E21
        ("tiny", 0.0001, None, None),             # 1.0E-4
        ("edge_lo", 0.001, None, None),           # 0.001 (plain)
        ("edge_hi", 9999999.0, None, None),       # plain
        ("neg", -0.25, None, None),
        ("zero", 0.0, None, None),
        ("negzero", -0.0, None, None),
        ("frac", 2000000000.5, None, None),       # 2.0000000005E9
    ]
    df = spark.createDataFrame(
        [(n, v, lb, ts) for n, v, lb, ts in cases],
        "name string, value double, labels map<string,string>, ts long",
    )
    jvm = [
        r[0]
        for r in df.select(
            encode_prometheus(F.col("name"), F.col("value"), F.col("labels"), F.col("ts"))
        ).collect()
    ]
    py = [encode_prometheus_py(n, v, lb, ts) for n, v, lb, ts in cases]
    assert py == jvm
