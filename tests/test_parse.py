"""Parser goldens (FIXTURES F2, Vector behavior-test pattern)."""

import pyspark.sql.functions as F
import pytest

from vector_spark.functions.grok import expand, grok_extract


def test_grok_expand_basic():
    rx, caps = expand("%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:msg}")
    assert [c[0] for c in caps] == ["timestamp", "level", "msg"]
    import re

    m = re.match(rx, "2026-01-01T00:00:12Z info worker=7 processed doc")
    assert m and m.group(2) == "info" and m.group(3) == "worker=7 processed doc"


def test_grok_typed_captures():
    rx, caps = expand("%{WORD:w} %{INT:n:int}")
    assert caps == [("w", None), ("n", "int")]


def test_grok_unknown_pattern():
    with pytest.raises(KeyError):
        expand("%{NOPE:x}")


def test_grok_nested_named_capture_order():
    """User library whose named pattern BODY itself contains named refs:
    the outer capture's group opens before the inner ones, so the
    capture list must be [outer, inner...] in group-number order
    (regression: the list used to come out [inner..., outer])."""
    lib = {"PAIR": r"%{WORD:k}=%{WORD:v}"}
    rx, caps = expand("%{PAIR:pair} %{INT:n}", patterns=lib)
    assert [c[0] for c in caps] == ["pair", "k", "v", "n"]
    import re

    m = re.match(rx, "alpha=beta 42")
    got = {name: m.group(i) for i, (name, _) in enumerate(caps, start=1)}
    assert got == {"pair": "alpha=beta", "k": "alpha", "v": "beta", "n": "42"}


def test_grok_nested_named_capture_spark(spark):
    lib = {"PAIR": r"%{WORD:k}=%{WORD:v}"}
    df = spark.createDataFrame([("alpha=beta 42",), ("nomatch",)], "line string")
    caps = grok_extract(F.col("line"), "%{PAIR:pair} %{INT:n:int}", patterns=lib)
    rows = df.select(*[c.alias(n) for n, c in caps.items()]).collect()
    assert rows[0]["pair"] == "alpha=beta" and rows[0]["k"] == "alpha"
    assert rows[0]["v"] == "beta" and rows[0]["n"] == 42
    assert all(rows[1][c] is None for c in ("pair", "k", "v", "n"))


def test_parse_stage_golden(spark, corpus):
    """All four formats normalize to the ground-truth severity/component."""
    from vector_spark.plans.pipeline import parse_stage

    p = parse_stage(corpus)
    bad = p.filter(
        ~F.col("parse_ok")
        | (F.col("severity") != F.col("true_severity"))
        | (F.col("component") != F.col("true_component"))
        | F.col("event_ts").isNull()
        | (F.col("latency_ms_parsed") != F.col("latency_ms"))
    )
    assert bad.count() == 0


def test_parse_failure_passthrough(spark):
    """drop_on_error=false: the original row passes unchanged with null
    outputs (remap.rs:134-173)."""
    from vector_spark.plans.pipeline import parse_stage

    df = spark.createDataFrame(
        [("g1", "totally not a log line", 3)], "doc_id string, message string, n_tok int"
    )
    out = parse_stage(df).collect()[0]
    assert out["severity"] is None and not out["parse_ok"]
    assert out["message"] == "totally not a log line" and out["n_tok"] == 3


def test_parse_grok_function(spark):
    df = spark.createDataFrame([("2026-01-01T00:00:12Z info hello",)], "line string")
    caps = grok_extract(F.col("line"), "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl} %{GREEDYDATA:m}")
    row = df.select(*[c.alias(n) for n, c in caps.items()]).collect()[0]
    assert row["lvl"] == "info" and row["m"] == "hello"


def test_parse_key_value(spark):
    from vector_spark.functions.parse import parse_key_value

    df = spark.createDataFrame([('a=1 b=x c="q v"',)], "line string")
    m = df.select(parse_key_value(F.col("line")).alias("m")).collect()[0]["m"]
    assert m["a"] == "1" and m["b"] == "x"


def test_parse_apache(spark):
    from vector_spark.functions.parse import parse_apache_log

    line = '10.0.0.1 - frank [01/Jan/2026:00:00:12 +0000] "GET /api/v1/docs HTTP/1.1" 200 2326'
    df = spark.createDataFrame([(line,)], "line string")
    caps = parse_apache_log(F.col("line"))
    row = df.select(*[c.alias(n) for n, c in caps.items()]).collect()[0]
    assert row["method"] == "GET" and row["status"] == 200 and row["size"] == 2326
    assert row["path"] == "/api/v1/docs" and row["user"] == "frank"


def test_parse_syslog_5424(spark):
    from vector_spark.functions.parse import parse_syslog

    line = "<34>1 2026-01-01T00:00:12Z host1 app 123 MSGID - hello world"
    df = spark.createDataFrame([(line,)], "line string")
    caps = parse_syslog(F.col("line"))
    row = df.select(*[c.alias(n) for n, c in caps.items()]).collect()[0]
    assert row["hostname"] == "host1" and row["appname"] == "app"
    assert row["message"] == "hello world"


def test_parse_duration_and_int(spark):
    from vector_spark.functions.parse import parse_duration, parse_int

    df = spark.createDataFrame([("300ms", "ff")], "d string, h string")
    row = df.select(
        parse_duration(F.col("d")).alias("secs"), parse_int(F.col("h"), base=16).alias("n")
    ).collect()[0]
    assert abs(row["secs"] - 0.3) < 1e-9 and row["n"] == 255


def test_ip_functions(spark):
    from vector_spark.functions.ip import ip_aton, ip_cidr_contains, ip_ntoa, ip_subnet

    df = spark.createDataFrame([("10.1.2.3",), ("192.168.0.7",), ("bogus",)], "ip string")
    rows = df.select(
        "ip",
        ip_aton(F.col("ip")).alias("n"),
        ip_cidr_contains(F.col("ip"), "10.0.0.0/8").alias("in10"),
        ip_subnet(F.col("ip"), 24).alias("net"),
    ).collect()
    byip = {r["ip"]: r for r in rows}
    assert byip["10.1.2.3"]["n"] == (10 << 24) + (1 << 16) + (2 << 8) + 3
    assert byip["10.1.2.3"]["in10"] and not byip["192.168.0.7"]["in10"]
    assert byip["192.168.0.7"]["net"] == "192.168.0.0"
    assert byip["bogus"]["n"] is None and not byip["bogus"]["in10"]
    # round-trip
    rt = df.filter("ip != 'bogus'").select(ip_ntoa(ip_aton(F.col("ip"))).alias("rt"), "ip")
    assert rt.filter("rt != ip").count() == 0


def test_vrl_parser_tail(spark):
    """klog / linux auth / ALB / UA / ruby hash / xml — reference
    examples from the respective stdlib docstrings."""
    from vector_spark.functions.parse import (
        parse_aws_alb_log,
        parse_klog,
        parse_linux_authorization,
        parse_ruby_hash,
        parse_user_agent,
        parse_xml,
    )

    df = spark.createDataFrame(
        [("I0505 17:59:40.692994   28133 klog.go:70] hello from klog",)], "l string"
    )
    r = df.select(*[c.alias(k) for k, c in parse_klog(F.col("l"), year=2021).items()]).collect()[0]
    assert (r["level"], r["id"], r["file"], r["line"], r["message"]) == (
        "info", 28133, "klog.go", 70, "hello from klog"
    )
    assert r["timestamp"].month == 5 and r["timestamp"].microsecond == 692994

    df = spark.createDataFrame(
        [("Mar 23 01:49:58 localhost sshd[1111]: Accepted publickey for eng",)], "l string"
    )
    r = df.select(
        *[c.alias(k) for k, c in parse_linux_authorization(F.col("l"), year=2021).items()]
    ).collect()[0]
    assert (r["hostname"], r["appname"], r["procid"]) == ("localhost", "sshd", 1111)

    alb = (
        'http 2026-08-17T10:00:00.000000Z my-elb 10.0.0.1:54321 10.0.1.1:80 0.001 0.005 0.000 '
        '200 200 120 512 "GET http://example.com:80/x HTTP/1.1" "curl/7.68.0" - - arn:tg "Root=1"'
    )
    r = spark.createDataFrame([(alb,)], "l string").select(
        *[c.alias(k) for k, c in parse_aws_alb_log(F.col("l")).items()]
    ).collect()[0]
    assert r["request_method"] == "GET" and r["ssl_cipher"] is None
    assert r["received_bytes"] == 120 and r["request_processing_time"] == 0.001

    r = spark.createDataFrame(
        [("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",)], "l string"
    ).select(*[c.alias(k) for k, c in parse_user_agent(F.col("l")).items()]).collect()[0]
    assert (r["browser_family"], r["browser_version"], r["device_category"], r["os_family"]) == (
        "Firefox", "115.0", "pc", "Linux"
    )

    r = spark.createDataFrame([('{ "k" => "v", "n" => 1, "x" => nil }',)], "l string").select(
        parse_ruby_hash(F.col("l"), "k string, n int, x string").alias("h")
    ).collect()[0]["h"]
    assert (r["k"], r["n"], r["x"]) == ("v", 1, None)

    r = spark.createDataFrame(
        [('<log level="info"><msg>hi</msg><code>7</code></log>',)], "l string"
    ).select(parse_xml(F.col("l"), "_level string, msg string, code int").alias("x")).collect()[0]["x"]
    assert (r["_level"], r["msg"], r["code"]) == ("info", "hi", 7)


def test_percent_codec_and_format_int(spark):
    from vector_spark.functions.strings import decode_percent, encode_percent, format_int

    df = spark.createDataFrame([("foo bar?+baz",), ("héllo",)], "s string")
    rows = df.select(
        encode_percent(F.col("s")).alias("na"),
        encode_percent(F.col("s"), "FRAGMENT").alias("frag"),
        decode_percent(encode_percent(F.col("s"))).alias("rt"),
        "s",
    ).collect()
    assert rows[0]["na"] == "foo%20bar%3F%2Bbaz"
    assert rows[0]["frag"] == "foo%20bar?+baz"  # FRAGMENT keeps ? and +
    assert rows[1]["na"] == "h%C3%A9llo"  # UTF-8 per-byte
    for r in rows:
        assert r["rt"] == r["s"]  # decode inverts encode, '+' preserved
    r = spark.range(1).select(
        format_int(F.lit(255), 16).alias("h"), format_int(F.lit(10), 2).alias("b")
    ).collect()[0]
    assert r["h"] == "ff" and r["b"] == "1010"


def test_ipv6_functions(spark):
    import ipaddress

    from vector_spark.functions.ip import (
        ip6_aton,
        ip6_cidr_contains,
        ip6_ntoa,
        ip_to_ipv6,
        ipv6_to_ipv4,
    )

    cases = [
        "2001:db8::1", "::1", "fe80::abcd:1234", "::ffff:192.168.1.7",
        "2001:0db8:0000:0000:0000:ff00:0042:8329", "::", "1:2:3:4:5:6:7:8",
        "bogus", "1::2::3", "12345::1",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "ip string")
    rows = df.select(
        "ip",
        ip6_aton(F.col("ip")).alias("p"),
        ipv6_to_ipv4(F.col("ip")).alias("v4"),
        ip6_cidr_contains(F.col("ip"), "2001:db8::/32").alias("in_db8"),
        ip6_ntoa(ip6_aton(F.col("ip"))).alias("full"),
    ).collect()
    expected = {}
    for r in rows:
        try:
            n = int(ipaddress.ip_address(r["ip"]))
            exp = (n >> 64, n & ((1 << 64) - 1))
            exp = tuple(v - (1 << 64) if v >= (1 << 63) else v for v in exp)
        except ValueError:
            exp = None
        expected[r["ip"]] = exp
        got = (r["p"]["hi"], r["p"]["lo"]) if r["p"] else None
        assert got == exp, r["ip"]
    # round-trip: the emitted full text re-parses to the same halves
    # (materialized between steps — nesting aton(ntoa(aton(.))) in one
    # projection squares the expression tree, see ip6_aton docstring)
    fulls = [(r["ip"], r["full"]) for r in rows if expected[r["ip"]] is not None]
    rt_rows = spark.createDataFrame(fulls, "orig string, full string").select(
        "orig", ip6_aton(F.col("full")).alias("p")
    ).collect()
    for r in rt_rows:
        assert (r["p"]["hi"], r["p"]["lo"]) == expected[r["orig"]], r["orig"]
    byip = {r["ip"]: r for r in rows}
    assert byip["::ffff:192.168.1.7"]["v4"] == "192.168.1.7"
    assert byip["2001:db8::1"]["in_db8"] and not byip["::1"]["in_db8"]
    assert spark.range(1).select(
        ip_to_ipv6(F.lit("10.1.2.3")).alias("m")
    ).first()["m"] == "::ffff:10.1.2.3"


def _build_tiny_mmdb(path, networks):
    """Hand-assemble a minimal valid MaxMind DB (v4 tree, 24-bit
    records) per the public spec — tree + 16-null separator + data
    section + metadata marker + metadata map."""

    def enc_str(s):
        b = s.encode()
        assert len(b) < 29
        return bytes([0x40 | len(b)]) + b

    def enc_uint(n, type_num):
        b = n.to_bytes(max((n.bit_length() + 7) // 8, 1), "big") if n else b""
        return bytes([(type_num << 5) | len(b)]) + b

    def enc_map(items):  # items: list[(key, encoded_value)]
        out = bytes([0xE0 | len(items)])
        for k, v in items:
            out += enc_str(k) + v
        return out

    # data section: one record per network
    data = b""
    data_offsets = []
    for _, _, iso in networks:
        data_offsets.append(len(data))
        data += enc_map([("country", enc_map([("iso_code", enc_str(iso))]))])

    # binary trie
    nodes = [{}]  # each: {0: child, 1: child} where child = ("n", idx) | ("d", i)
    for i, (net, plen, _) in enumerate(networks):
        cur = 0
        for depth in range(plen):
            bit = (net >> (31 - depth)) & 1
            if depth == plen - 1:
                nodes[cur][bit] = ("d", i)
            else:
                child = nodes[cur].get(bit)
                if child is None or child[0] != "n":
                    nodes.append({})
                    nodes[cur][bit] = ("n", len(nodes) - 1)
                cur = nodes[cur][bit][1]

    node_count = len(nodes)

    def record(child):
        if child is None:
            return node_count
        kind, idx = child
        if kind == "n":
            return idx
        return node_count + 16 + data_offsets[idx]

    tree = b""
    for n in nodes:
        tree += record(n.get(0)).to_bytes(3, "big") + record(n.get(1)).to_bytes(3, "big")

    meta = enc_map(
        [
            ("record_size", enc_uint(24, 5)),
            ("node_count", enc_uint(node_count, 6)),
            ("ip_version", enc_uint(4, 5)),
        ]
    )
    blob = tree + b"\x00" * 16 + data + b"\xab\xcd\xefMaxMind.com" + meta
    with open(path, "wb") as f:
        f.write(blob)


def test_mmdb_geoip_onramp(spark, tmp_path):
    """.mmdb → CIDR table → broadcast interval join: the full geoip
    on-ramp, on a spec-built fixture database."""
    from vector_spark.enrich import geoip_enrich
    from vector_spark.functions.mmdb import mmdb_to_cidr_table, mmdb_to_rows

    networks = [
        (10 << 24, 8, "AA"),            # 10.0.0.0/8
        ((192 << 24) | (168 << 16), 16, "BB"),  # 192.168.0.0/16
    ]
    db = str(tmp_path / "tiny.mmdb")
    _build_tiny_mmdb(db, networks)

    rows = mmdb_to_rows(db)
    got = {(lo, hi): attrs["country.iso_code"] for lo, hi, attrs in rows}
    assert got[(10 << 24, (11 << 24) - 1)] == "AA"
    assert got[((192 << 24) | (168 << 16), (192 << 24) | (169 << 16) - 1)] == "BB"

    dim = mmdb_to_cidr_table(spark, db, fields=["country.iso_code"])
    events = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "192.168.0.9"), (3, "8.8.8.8")], "id int, ip string"
    )
    out = {r["id"]: r["geoip_country_iso_code"] for r in geoip_enrich(events, "ip", dim).collect()}
    assert out == {1: "AA", 2: "BB", 3: None}


def test_object_path_functions(spark):
    from vector_spark.functions.objects import (
        compact_map,
        del_path,
        get_path,
        merge_maps,
        only_fields,
        set_path,
        unnest,
    )

    df = spark.createDataFrame(
        [({"a": "1", "b": "", "c": None},)], "m map<string,string>"
    )
    m = F.col("m")
    r = df.select(
        get_path(m, "a").alias("g"),
        get_path(set_path(m, "a", F.lit("9")), "a").alias("s"),
        F.size(del_path(m, ["a", "b"])).alias("d"),
        F.size(only_fields(m, ["a"])).alias("o"),
        F.size(compact_map(m)).alias("c"),
        get_path(merge_maps(m, F.create_map(F.lit("a"), F.lit("z"))), "a").alias("mg"),
    ).collect()[0]
    assert (r["g"], r["s"], r["d"], r["o"], r["c"], r["mg"]) == ("1", "9", 1, 1, 1, "z")

    arr_df = spark.createDataFrame([(1, ["x", "y"])], "id int, evs array<string>")
    rows = unnest(arr_df, "evs").collect()
    assert [(r["id"], r["evs"]) for r in rows] == [(1, "x"), (1, "y")]


def test_misc_vrl_functions(spark):
    import os as _os

    from vector_spark.functions.strings import (
        assert_,
        encode_key_value,
        get_env_var,
        match_any,
        match_array,
        to_syslog_facility,
        to_syslog_level,
        to_syslog_severity,
    )

    df = spark.createDataFrame([("error here", ["ab", "cd"])], "s string, arr array<string>")
    r = df.select(
        match_any(F.col("s"), ["^nope", "error"]).alias("ma"),
        match_array(F.col("arr"), "^a").alias("any"),
        match_array(F.col("arr"), "^[a-z]+$", all_=True).alias("all"),
        to_syslog_level(F.lit(3)).alias("lvl"),
        to_syslog_facility(F.lit(10)).alias("fac"),
        to_syslog_severity(F.lit("WARNING")).alias("sev"),
        to_syslog_level(F.lit(99)).alias("bad"),
        encode_key_value({"a": F.lit(1), "b": F.lit("x")}, ";", ":").alias("kv"),
    ).collect()[0]
    assert r["ma"] and r["any"] and r["all"]
    assert (r["lvl"], r["fac"], r["sev"], r["bad"]) == ("err", "authpriv", 4, None)
    assert r["kv"] == "a:1;b:x"

    _os.environ["VECTOR_SPARK_TEST_VAR"] = "hello"
    assert spark.range(1).select(
        get_env_var("VECTOR_SPARK_TEST_VAR").alias("v")
    ).first()["v"] == "hello"

    ok = spark.range(1).select(assert_(F.lit(True), "boom").alias("a")).first()["a"]
    assert ok is True
    import pytest

    with pytest.raises(Exception, match="boom"):
        spark.range(1).select(assert_(F.lit(False), "boom").alias("a")).collect()


def test_nginx_combined_reference_example(spark):
    from vector_spark.functions.parse import parse_nginx_combined_log

    line = '172.17.0.1 - - [31/Mar/2021:12:04:07 +0000] "GET / HTTP/1.1" 200 612 "-" "curl/7.75.0" "-"'
    r = spark.createDataFrame([(line,)], "l string").select(
        *[c.alias(k) for k, c in parse_nginx_combined_log(F.col("l")).items()]
    ).collect()[0]
    assert r["client"] == "172.17.0.1" and r["user"] is None
    assert r["method"] == "GET" and r["status"] == 200 and r["size"] == 612
    assert r["referer"] is None and r["agent"] == "curl/7.75.0"
    assert r["compression"] is None and r["timestamp"].year == 2021


def test_datadog_search(spark):
    from vector_spark.functions.datadog_search import datadog_search as dd

    rows = [
        (1, "error in worker", "error", 503, "web"),
        (2, "all good here", "info", 200, "web"),
        (3, "slow request warning", "warn", 200, "api"),
        (4, None, "error", 404, None),
    ]
    df = spark.createDataFrame(
        rows, "id int, message string, status string, code int, service string"
    )

    def ids(q):
        return {r["id"] for r in df.filter(dd(q)).collect()}

    assert ids("*") == {1, 2, 3, 4}
    assert ids("status:error") == {1, 4}
    assert ids("-status:error") == {2, 3}
    assert ids("NOT status:error") == {2, 3}
    assert ids("status:error AND code:503") == {1}
    assert ids("status:error code:503") == {1}          # adjacency = AND
    assert ids("status:error OR service:api") == {1, 3, 4}
    assert ids("(status:error OR status:warn) AND service:web") == {1}
    assert ids("error") == {1}                          # default-field contains
    assert ids('"slow request"') == {3}                 # quoted phrase
    assert ids("service:w*") == {1, 2}                  # wildcard
    assert ids("code:>400") == {1, 4}
    assert ids("code:>=503") == {1}
    assert ids("code:[200 TO 404]") == {2, 3, 4}
    assert ids("code:{200 TO 503}") == {4}
    assert ids("_exists_:service") == {1, 2, 3}
    assert ids("_missing_:service") == {4}
    assert ids("status:*") == {1, 2, 3, 4}              # attr exists form
    assert ids('status:"error"') == {1, 4}


def test_logplex_reference_sample(spark):
    """The reference's own SAMPLE_BODY (heroku_logs.rs:342) plus the
    warn-and-forward fallback for non-logplex lines."""
    import pyspark.sql.functions as F

    from vector_spark.functions.parse import parse_logplex

    sample = (
        "267 <158>1 2020-01-08T22:33:57.353034+00:00 host heroku router - "
        'at=info method=GET path="/cart_link" status=304'
    )
    df = spark.createDataFrame([(sample,), ("three parts only",)], "line string")
    p = parse_logplex(F.col("line"))
    rows = {r["line"][:3]: r for r in df.select("line", *[v.alias(k) for k, v in p.items()]).collect()}
    good = rows["267"]
    assert good["host"] == "host"
    assert good["app_name"] == "heroku"
    assert good["proc_id"] == "router"
    assert good["message"].startswith("at=info method=GET")
    assert good["timestamp"] is not None
    bad = rows["thr"]
    assert bad["message"] == "three parts only"
    assert bad["host"] is None and bad["timestamp"] is None


def test_journald_reference_record(spark):
    """journald.rs:661-664 FAKE_JOURNAL records: field remap + micros
    timestamp + the received-timestamp fallback."""
    import pyspark.sql.functions as F

    from vector_spark.functions.parse import parse_journald_record

    recs = [
        '{"_SYSTEMD_UNIT":"sysinit.target","MESSAGE":"System Initialization",'
        '"__CURSOR":"1","_SOURCE_REALTIME_TIMESTAMP":"1578529839140001","PRIORITY":"6"}',
        '{"_SYSTEMD_UNIT":"stdout","MESSAGE":"Missing timestamp","__CURSOR":"3",'
        '"__REALTIME_TIMESTAMP":"1578529839140004","PRIORITY":"2"}',
    ]
    df = spark.createDataFrame([(r,) for r in recs], "rec string")
    p = parse_journald_record(F.col("rec"))
    rows = df.select(
        *[v.alias(k) for k, v in p.items() if k != "fields"],
        F.unix_micros(p["timestamp"]).alias("us"),
    ).collect()
    assert rows[0]["message"] == "System Initialization"
    assert rows[0]["unit"] == "sysinit.target"
    assert rows[0]["priority"] == 6
    assert rows[0]["us"] == 1578529839140001
    # fallback to __REALTIME_TIMESTAMP when source timestamp is absent
    assert rows[1]["us"] == 1578529839140004
    assert rows[1]["source_type"] == "journald"


def test_splunk_hec_time_magnitudes(spark):
    """splunk_hec.rs:535-556: seconds / millis / nanos land on the same
    instant; negative time -> null."""
    import pyspark.sql.functions as F

    from vector_spark.functions.parse import parse_splunk_hec

    base = 1577836800
    envs = [
        f'{{"time":{base},"event":"a"}}',
        f'{{"time":{base * 1000},"event":"b"}}',
        f'{{"time":{base * 1_000_000_000},"event":"c"}}',
        '{"time":-5,"event":"d"}',
    ]
    df = spark.createDataFrame([(e,) for e in envs], "env string")
    p = parse_splunk_hec(F.col("env"))
    us = [r[0] for r in df.select(F.unix_micros(p["timestamp"])).collect()]
    assert us[0] == us[1] == us[2] == base * 1_000_000
    assert us[3] is None


def test_syslog_structured_data_reference_example(spark):
    """parse_syslog.rs:26-31: SD params flatten to '<id>.<param>',
    tolerating spaces around '='; multiple elements; '-' (no SD) ->
    null map."""
    import pyspark.sql.functions as F

    from vector_spark.functions.parse import parse_syslog_structured_data

    ref = (
        "<13>1 2020-03-13T20:45:38.119Z dynamicwireless.name non 2426 ID931 "
        '[exampleSDID@32473 iut="3" eventSource= "Application" eventID="1011"] '
        "Try to override the THX port!"
    )
    multi = (
        '<13>1 2020-03-13T20:45:38.119Z host app 1 ID1 [a x="1"][b@2 y="2"] msg'
    )
    plain = "<13>1 2020-03-13T20:45:38.119Z host app 1 ID1 - msg [not sd]"
    df = spark.createDataFrame([(ref,), (multi,), (plain,)], "line string")
    p = parse_syslog_structured_data(F.col("line"))
    rows = df.select(*[v.alias(k) for k, v in p.items()]).collect()
    assert rows[0]["sd"] == {
        "exampleSDID@32473.iut": "3",
        "exampleSDID@32473.eventSource": "Application",
        "exampleSDID@32473.eventID": "1011",
    }
    assert rows[1]["sd_s"] == "a.x=1,b@2.y=2"
    assert rows[1]["n_elements"] == 2
    # '-' line: the trailing bracketed text in the MESSAGE must not parse
    assert rows[2]["sd"] is None and rows[2]["n_elements"] == 0


def test_framing_codecs(spark):
    """framers/*.rs: character/newline-delimited splits and the
    octet-counting unframe incl. malformed-chunk rejection."""
    import pyspark.sql.functions as F

    from vector_spark.functions.framing import (
        character_delimited_frames,
        newline_delimited_frames,
        octet_counting_frames,
    )

    df = spark.createDataFrame(
        [
            ("5 hello6 world!",),        # two clean frames
            ("3 abc",),                   # single frame
            ("abc def",),                 # no integer prefix
            ("10 short",),                # truncated payload
            ("",),                        # empty chunk -> zero frames
        ],
        "chunk string",
    )
    got = [r[0] for r in df.select(octet_counting_frames(F.col("chunk"))).collect()]
    assert got[0] == ["hello", "world!"]
    assert got[1] == ["abc"]
    assert got[2] is None and got[3] is None
    assert got[4] == []

    d2 = spark.createDataFrame([("a|b|c\nd",)], "s string")
    assert d2.select(character_delimited_frames(F.col("s"), "|")).first()[0] == ["a", "b", "c\nd"]
    assert d2.select(newline_delimited_frames(F.col("s"))).first()[0] == ["a|b|c", "d"]


def test_length_delimited_framing(spark):
    import pyspark.sql.functions as F

    from vector_spark.functions.framing import length_delimited_frames

    chunk = (3).to_bytes(4, "big") + b"abc" + (2).to_bytes(4, "big") + b"xy"
    trunc = (9).to_bytes(4, "big") + b"abc"
    df = spark.createDataFrame([(chunk,), (trunc,), (b"",)], "c binary")
    got = [r[0] for r in df.select(length_delimited_frames(F.col("c"))).collect()]
    assert [bytes(b) for b in got[0]] == [b"abc", b"xy"]
    assert got[1] is None
    assert got[2] == []


def test_reverse_dns_loopback(spark):
    """reverse_dns resolves loopback via the local resolver and returns
    NULL (not an error) for unresolvable addresses — one lookup per
    distinct IP per batch."""
    import pyspark.sql.functions as F

    from vector_spark.functions.ip import reverse_dns

    rdns = reverse_dns()
    df = spark.createDataFrame(
        [("127.0.0.1",), ("127.0.0.1",), ("192.0.2.1",), (None,)], "ip string"
    )
    out = {r["ip"]: r["host"] for r in df.select("ip", rdns(F.col("ip")).alias("host")).collect()}
    assert out["127.0.0.1"] == "localhost"
    assert out["192.0.2.1"] is None  # TEST-NET-1: never resolvable
    assert out[None] is None


def test_reverse_dns_no_global_timeout_mutation(spark):
    """reverse_dns must not touch socket.setdefaulttimeout: the reused
    executor Python worker serves OTHER UDFs afterwards, and a leaked
    1s default would silently apply to every socket they open. The
    probe UDF runs in the same select (same worker, same batch) and
    reads the global AFTER the resolver column is computed."""
    import pandas as pd
    import pyspark.sql.functions as F

    from vector_spark.functions.ip import reverse_dns

    @F.pandas_udf("string")
    def default_timeout_after(s: pd.Series) -> pd.Series:
        import socket

        return pd.Series([repr(socket.getdefaulttimeout())] * len(s))

    df = spark.createDataFrame([("127.0.0.1",), ("192.0.2.1",)], "ip string")
    rows = df.select(
        reverse_dns()(F.col("ip")).alias("host"),
        default_timeout_after(F.col("ip")).alias("tmo"),
    ).collect()
    assert all(r["tmo"] == "None" for r in rows)
