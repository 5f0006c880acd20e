"""VRL front-end tests: lexer → parser → Column compiler.

The behavior suite (tests/behavior/remap.toml — the reference's own 34
active cases with their original VRL programs) is the parity gate; this
module pins the compiler internals those cases ride on: grammar shapes,
the error channel, rollback, multi-emit, the type lattice, and the
divergences documented in vector_spark/vrl/compiler.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.vrl import compile_condition, compile_program
from vector_spark.vrl.lexer import VrlSyntaxError, tokenize
from vector_spark.vrl import parser as P


# ------------------------------------------------------------- lexer
def test_lexer_tokens():
    kinds = [t.kind for t in tokenize('.a = "x\\n" + 1.5 # c\nb = r\'\\d+\'')]
    assert kinds == ["DOT", "IDENT", "OP", "STRING", "OP", "FLOAT",
                     "NEWLINE", "IDENT", "OP", "REGEX", "EOF"]


def test_lexer_string_escapes():
    toks = tokenize('"a\\"b\\\\c\\td"')
    assert toks[0].value == 'a"b\\c\td'


def test_lexer_unterminated():
    with pytest.raises(VrlSyntaxError):
        tokenize('"abc')


def test_lexer_operators_longest_match():
    vals = [t.value for t in tokenize("a!=b ?? c == d")][:-1]
    assert vals == ["a", "!=", "b", "??", "c", "==", "d"]


# ------------------------------------------------------------ parser
def test_parser_precedence():
    e = P.parse_expr(".a + .b > 9")
    assert isinstance(e, P.Bin) and e.op == ">"
    assert isinstance(e.left, P.Bin) and e.left.op == "+"

    e = P.parse_expr(".a * (.b + .c) - .d")
    assert e.op == "-" and e.left.op == "*" and e.left.right.op == "+"


def test_parser_coalesce_binds_loosest():
    e = P.parse_expr('parse_json("x") ?? "nope"')
    assert e.op == "??" and isinstance(e.left, P.Call)


def test_parser_assignment_forms():
    prog = P.parse(".a, err = .x / .y\nv = 1\n.p.q = v")
    a0, a1, a2 = prog.stmts
    assert isinstance(a0.target, P.Path) and isinstance(a0.err_target, P.Var)
    assert isinstance(a1.target, P.Var) and a1.err_target is None
    assert a2.target.segments == ("p", "q")


def test_parser_quoted_path_and_index():
    p = P.parse_expr('.a."b.c"[2]')
    assert p.segments == ("a", "b.c", 2)


def test_parser_if_else_chain():
    prog = P.parse('if .a == 1 { .t = "one" } else if .a == 2 { .t = "two" } '
                   'else { .t = "many" }')
    node = prog.stmts[0]
    assert isinstance(node, P.If) and len(node.clauses) == 2
    assert node.otherwise is not None


def test_parser_named_args_and_bang():
    c = P.parse_expr('to_string!(value: .in)')
    assert c.bang and c.args[0][0] == "value"


def test_parser_condition_continuation_lines():
    prog = P.parse('.a == 1 &&\n.b == 2')
    assert len(prog.stmts) == 1


# ---------------------------------------------------------- compiler
def _run(spark, src, rows, schema=None, **kw):
    df = spark.createDataFrame(rows, schema)
    return compile_program(src, **kw).apply(df)


def test_assignment_and_variables(spark):
    out = _run(spark, 'size = .n * 2\n.double = size\n.label = "x"',
               [{"n": 21}]).collect()[0]
    assert out.double == 42 and out.label == "x"


def test_division_always_float_and_zero_value(spark):
    out = _run(spark, '.q, err = .a / .b\n.z, .e2 = .a / .c',
               [{"a": 9, "b": 12, "c": 0}]).collect()[0]
    assert out.q == 0.75
    assert out.z == 0.0  # zero-value on captured error (remap_arithmetic_error)
    # exact reference message (corpus infallible_err_return_value fixture)
    assert out.e2 == "can't divide by zero"


def test_unhandled_error_rolls_back_event(spark):
    # drop_on_error=False: the ORIGINAL event passes (remap.rs:130-148)
    out = _run(spark, '.a = 1\n.bad = to_int!(.msg)\n.b = 2',
               [{"msg": "not-a-number", "keep": True}]).collect()[0]
    assert out.keep is True and out.bad is None
    assert out.a is None and out.b is None  # earlier assignments rolled back too


def test_drop_on_error_filters_failed_rows(spark):
    out = _run(spark, '.n = to_int!(.msg)', [{"msg": "5"}, {"msg": "x"}],
               drop_on_error=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].n == 5


def test_abort_semantics(spark):
    kept = _run(spark, '.x = 1\nabort\n.y = 2', [{"m": "a"}],
                drop_on_abort=False).collect()[0]
    assert kept.m == "a" and kept.x is None  # rollback, not partial apply
    dropped = _run(spark, 'abort', [{"m": "a"}], drop_on_abort=True)
    assert dropped.count() == 0


def test_conditional_abort_only_hits_matching_rows(spark):
    out = _run(spark, 'if .lvl == "debug" { abort }\n.seen = true',
               [{"lvl": "debug"}, {"lvl": "error"}], drop_on_abort=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].lvl == "error" and rows[0].seen is True


def test_if_else_chain_compiles_to_when(spark):
    out = _run(spark,
               'if .n > 10 { .t = "big" } else if .n > 5 { .t = "mid" } '
               'else { .t = "small" }',
               [{"n": 20}, {"n": 7}, {"n": 1}])
    got = {r.n: r.t for r in out.collect()}
    assert got == {20: "big", 7: "mid", 1: "small"}


def test_multi_emit_explodes(spark):
    out = _run(spark, '. = [{"m": "a", "i": 1}, {"m": "b"}]', [{"x": 1}])
    rows = out.orderBy("m").collect()
    assert [(r.m, r.i) for r in rows] == [("a", 1), ("b", None)]
    assert out.columns == ["m", "i"]


def test_root_scalar_becomes_message(spark):
    out = _run(spark, '. = 5', [{"x": 1}])
    assert out.columns == ["message"] and out.collect()[0].message == 5


def test_del_and_exists(spark):
    out = _run(spark, '.had = exists(.gone)\ndel(.gone)\n.fresh = exists(.nope)',
               [{"gone": "v", "keep": 1}])
    row = out.collect()[0]
    assert "gone" not in out.columns
    assert row.had is True and row.fresh is False and row.keep == 1


def test_nested_and_array_materialization(spark):
    out = _run(spark, '.a.b = 1\n.c[0] = 1\n.c[1] = 2', [{"m": ""}]).collect()[0]
    assert out.a.b == 1 and list(out.c) == [1, 2]


def test_heterogeneous_array_variant_encoding(spark):
    # mixed-type arrays materialize as canonical-JSON strings; the
    # condition compiler uses the same encoder so == agrees
    out = _run(spark, '.a[0] = 0\n.a[1] = "1"\n.a[2] = 2.0', [{"m": ""}])
    assert [f.dataType.simpleString() for f in out.schema.fields if f.name == "a"] \
        == ["array<string>"]
    n = out.filter(compile_condition('.a == [0, "1", 2.0]', out.schema)).count()
    assert n == 1


def test_error_coalesce_operator(spark):
    out = _run(spark, '.v = to_int(.msg) ?? -1', [{"msg": "nope"}]).collect()[0]
    assert out.v == -1


def test_err_capture_message_format(spark):
    out = _run(spark, '.ok, .err = parse_json("{ bad }")', [{"m": ""}]).collect()[0]
    assert out.err.startswith('function call error for "parse_json" at (')
    assert "unable to parse json" in out.err


def test_merge_operator_and_function(spark):
    out = _run(spark, '.o = merge({"a": 1}, {"b": 2})', [{"m": ""}]).collect()[0]
    assert out.o.a == 1 and out.o.b == 2


def test_string_concat_plus(spark):
    out = _run(spark, '.s = .a + "-" + .b', [{"a": "x", "b": "y"}]).collect()[0]
    assert out.s == "x-y"


def test_type_assertion_static_mismatch_always_errors(spark):
    out = _run(spark, '.s = string!(.flag)', [{"flag": True}], drop_on_error=True)
    assert out.count() == 0


def test_condition_program_value_is_last_expression(spark):
    df = spark.createDataFrame([{"a": 1, "b": 2}])
    # first line is dead code — reference conditions resolve the final expr
    cond = compile_condition('.a == 99\n.b == 2', df.schema)
    assert df.filter(cond).count() == 1


def test_condition_null_equality_is_is_null(spark):
    df = spark.createDataFrame([{"a": "x"}])
    assert df.filter(compile_condition('.missing == null', df.schema)).count() == 1
    assert df.filter(compile_condition('.a != null', df.schema)).count() == 1


def test_condition_type_mismatch_is_false(spark):
    df = spark.createDataFrame([{"a": "1"}])
    assert df.filter(compile_condition('.a == 1', df.schema)).count() == 0


def test_enrichment_lookup_compiles_to_map_literal(spark):
    rows = [{"id": 1, "tree": "oak"}, {"id": 3, "tree": "yew"},
            {"id": 5, "tree": "yew"}]
    df = spark.createDataFrame([{"id": 3}])
    prog = compile_program('. = get_enrichment_table_record!("t", { "id": .id })',
                           enrichment={"t": rows})
    out = prog.apply(df)
    got = out.collect()[0]
    assert got.tree == "yew" and got.id == 3
    # no join, no shuffle: the lookup is a map-literal element_at
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_find_enrichment_records_groups(spark):
    rows = [{"id": 3, "tree": "yew"}, {"id": 5, "tree": "yew"},
            {"id": 1, "tree": "oak"}]
    df = spark.createDataFrame([{"tree": "yew"}])
    prog = compile_program('.hits = find_enrichment_table_records!("t", '
                           '{ "tree": .tree })', enrichment={"t": rows})
    got = prog.apply(df).collect()[0]
    assert [h.id for h in got.hits] == [3, 5]


def test_whole_program_stays_in_codegen(spark):
    """The compiled select must be pure Column expressions — one
    WholeStageCodegen scan, no Python evaluation nodes."""
    df = spark.createDataFrame([{"msg": "a=1 b=2", "n": 3}])
    out = compile_program(
        '.kv = parse_key_value!(.msg)\n.big = .n * 100\n'
        'if .big > 100 { .lane = "hot" } else { .lane = "cold" }'
    ).apply(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_unknown_function_is_named_compile_error(spark):
    df = spark.createDataFrame([{"m": ""}])
    with pytest.raises(Exception, match=r"error\[E105\].*undefined function"):
        compile_program('.x = definitely_not_a_function(.m)').apply(df)


def test_wide_stdlib_registry(spark):
    """The widened VRL registry (parsers / ip family / redact): each
    call compiles to Columns, object results support member access for
    both struct- and map-typed values (getItem), and fallibility flows
    through the error channel."""
    df = spark.createDataFrame([{
        "apache": '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
                  '"GET /x HTTP/1.0" 200 2326',
        "url": "https://u:p@h.example.com:8080/a/b?k=v#f",
        "qs": "a=1&b=two",
        "lf": "lvl=info msg=ok",
        "dur": "15ms",
        "num": "ff",
        "ip": "10.1.2.3",
        "card": "my card 4242424242424242 thanks",
    }])
    out = compile_program(
        '.st = parse_apache_log!(.apache).status\n'
        '.host = parse_url!(.url).host\n'
        '.qa = parse_query_string(.qs).a\n'
        '.level = parse_logfmt(.lf).lvl\n'
        '.ms, err = parse_duration(.dur, unit: "ms")\n'
        '.n = parse_int!(.num, base: 16)\n'
        '.ipn = ip_aton!(.ip)\n'
        '.subnet = ip_subnet(.ip, 8)\n'
        '.red = redact(.card, patterns: ["[0-9]{16}"])'
    ).apply(df)
    r = out.collect()[0]
    assert str(r.st) == "200" and r.host == "h.example.com"
    assert r.qa == "1" and r.level == "info"
    assert abs(r.ms - 15.0) < 1e-9 and r.n == 255
    assert r.ipn == 167838211 and r.subnet == "10.0.0.0"
    assert "4242" not in r.red and "[REDACTED]" in r.red
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ----------------------------------------------- round-5 stdlib tail
def test_type_predicates_static_and_variant(spark):
    out = _run(
        spark,
        '.s = is_string(.msg)\n'
        '.i = is_integer(.n)\n'
        '.f = is_float(.n)\n'
        '.nn = is_null(.gone)\n'
        'obj = parse_json!(.j)\n'
        '.vs = is_string(obj.a)\n'
        '.vi = is_integer(obj.b)\n'
        '.vb = is_boolean(obj.c)\n'
        '.va = is_array(obj.d)',
        [{"msg": "x", "n": 3, "j": '{"a": "s", "b": 7, "c": true, "d": [1]}'}])
    r = out.collect()[0]
    assert (r.s, r.i, r.f, r.nn) == (True, True, False, True)
    assert (r.vs, r.vi, r.vb, r.va) == (True, True, True, True)


def test_to_regex_and_dynamic_match(spark):
    out = _run(
        spark,
        'rx = to_regex!(.pat)\n.hit = match(.msg, rx)\n.isrx = is_regex(rx)',
        [{"pat": "^err", "msg": "error: boom"},
         {"pat": "^ok", "msg": "error: boom"}])
    rows = {r.pat: (r.hit, r.isrx) for r in out.collect()}
    assert rows == {"^err": (True, True), "^ok": (False, True)}


def test_assert_eq_error_channel(spark):
    out = _run(spark, 'ok, err = assert_eq(.a, .b, message: "nope")\n.e = err',
               [{"a": 1, "b": 1}, {"a": 1, "b": 2}])
    got = {(r.a, r.b): r.e for r in out.collect()}
    assert got[(1, 1)] is None and "nope" in got[(1, 2)]


def test_get_set_remove_paths(spark):
    out = _run(
        spark,
        'obj = {"a": {"b": 7}, "keep": "y"}\n'
        '.got = get!(obj, ["a", "b"])\n'
        'obj2 = set!(obj, ["a", "c"], 9)\n'
        '.setv = get!(obj2, ["a", "c"])\n'
        'obj3 = remove!(obj2, ["keep"])\n'
        '.dropped = encode_json(obj3)',
        [{"x": 1}])
    r = out.collect()[0]
    assert r.got == 7 and r.setv == 9
    assert "keep" not in r.dropped and '"c":9' in r.dropped


def test_only_fields_keeps_named_root_fields(spark):
    out = _run(spark, 'only_fields(["a", "c"])', [{"a": 1, "b": 2, "c": 3}])
    assert sorted(out.columns) == ["a", "c"]


def test_match_any_and_match_array(spark):
    out = _run(
        spark,
        '.any = match_any(.msg, [r\'^foo\', r\'bar$\'])\n'
        '.one = match_array(.tags, r\'^prod\')\n'
        '.all = match_array(.tags, r\'^prod\', all: true)',
        [{"msg": "xbar", "tags": ["prod-a", "prod-b"]},
         {"msg": "none", "tags": ["prod-a", "dev-b"]}])
    rows = {r.msg: (r.any, r.one, r.all) for r in out.collect()}
    assert rows["xbar"] == (True, True, True)
    assert rows["none"] == (False, True, False)


def test_match_datadog_query_reads_current_event(spark):
    out = _run(
        spark,
        '.status = upcase(.status)\n'
        '.hit = match_datadog_query(., "status:ERROR AND @http.code:>400")',
        [{"status": "error", "http": {"code": 500}},
         {"status": "error", "http": {"code": 200}},
         {"status": "ok", "http": {"code": 500}}])
    got = [(r.status, r.http["code"], r.hit) for r in out.collect()]
    assert sorted(got) == [("ERROR", 200, False), ("ERROR", 500, True),
                           ("OK", 500, False)]


def test_encode_logfmt_and_key_value(spark):
    out = _run(
        spark,
        'obj = {"lvl": .lvl, "n": .n}\n'
        '.lf = encode_logfmt(obj)\n'
        '.kv = encode_key_value(obj, field_delimiter: "|", '
        'key_value_delimiter: ":")',
        [{"lvl": "info", "n": 3}])
    r = out.collect()[0]
    assert r.lf == "lvl=info n=3" and r.kv == "lvl:info|n:3"


def test_percent_codecs_roundtrip(spark):
    out = _run(spark, '.enc = encode_percent(.s)\n.dec = decode_percent(.enc)',
               [{"s": "a b&c"}])
    r = out.collect()[0]
    assert r.enc == "a%20b%26c" and r.dec == "a b&c"


def test_tally_counts_array_values(spark):
    out = _run(spark, '.t = tally(.arr)', [{"arr": ["a", "b", "a"]}])
    assert out.collect()[0].t == {"a": 2, "b": 1}


def test_parse_klog_and_nginx(spark):
    out = _run(
        spark,
        '.k = parse_klog!(.klog).level\n'
        '.n = parse_nginx_log!(.ng, format: "combined").status',
        [{"klog": "I0505 17:59:40.692994   28133 klog.go:70] hello",
          "ng": '172.17.0.1 alice - [01/Apr/2021:12:02:31 +0000] '
                '"POST /not-found HTTP/1.1" 404 153 "http://x/" "curl/7.68.0"'}])
    r = out.collect()[0]
    assert r.k == "info" and str(r.n) == "404"


def test_parse_regex_all_and_ruby_hash_and_xml(spark):
    out = _run(
        spark,
        '.nums = parse_regex_all(.s, r\'\\d+\')\n'
        '.rb = parse_ruby_hash!(.ruby, schema: "hello string, n int").hello\n'
        '.x = parse_xml!(.xml, schema: "v int").v',
        [{"s": "a1 b22 c333",
          "ruby": '{ "hello" => "world", "n" => 2 }',
          "xml": "<root><v>7</v></root>"}])
    r = out.collect()[0]
    assert r.nums == ["1", "22", "333"]
    assert r.rb == "world" and r.x == 7


def test_parse_cloudwatch_subscription_message(spark):
    msg = ('{"messageType": "DATA_MESSAGE", "owner": "111", '
           '"logGroup": "g", "logStream": "s", "subscriptionFilters": ["f"], '
           '"logEvents": [{"id": "1", "timestamp": 1600000000000, '
           '"message": "hello"}, {"id": "2", "timestamp": 1600000000001, '
           '"message": "world"}]}')
    out = _run(spark,
               'parsed = parse_aws_cloudwatch_log_subscription_message!(.m)\n'
               '.group = parsed.logGroup\n.events = parsed.logEvents\n'
               'del(.m)\n. = unnest(.events)',
               [{"m": msg}], drop_on_error=True)
    rows = out.collect()
    assert [r.events.message for r in rows] == ["hello", "world"]
    assert all(r.group == "g" for r in rows)


def test_unnest_explodes_event_per_element(spark):
    out = _run(spark, '. = unnest(.events)',
               [{"host": "h1", "events": [{"m": "a"}, {"m": "b"}]},
                {"host": "h2", "events": []}])
    rows = out.collect()
    assert [(r.host, r.events["m"]) for r in rows] == [("h1", "a"), ("h1", "b")]


def test_full_stdlib_identifier_coverage():
    """Every identifier of the reference stdlib
    (/root/reference/lib/vrl/stdlib/src/lib.rs — 119 Box::new entries)
    resolves in the VRL front-end (registry or compiler special form)."""
    import re as re_
    from pathlib import Path as Path_

    from vector_spark.vrl.compiler import registry

    lib = Path_("/root/reference/lib/vrl/stdlib/src/lib.rs")
    if not lib.exists():
        pytest.skip("reference checkout not available")
    src = lib.read_text()
    idents = set()
    for m in re_.finditer(r"Box::new\((\w+)\)", src):
        rs = re_.sub(r"(?<!^)(?=[A-Z0-9])", "_", m.group(1)).lower()
        rs = re_.sub(r"_+", "_", rs)
        idents.add(rs)
    # snake_case of the Rust struct != the VRL identifier for these
    fixups = {
        "md_5": "md5", "sha_1": "sha1", "sha_2": "sha2", "sha_3": "sha3",
        "uuid_v_4": "uuid_v4", "boolean": "bool", "integer": "int",
        "decode_base_6_4": "decode_base64", "encode_base_6_4": "encode_base64",
        "ip_to_ipv_6": "ip_to_ipv6", "ipv_6_to_ip_v_4": "ipv6_to_ipv4",
        "parse_log_fmt": "parse_logfmt",
        "parse_aws_cloud_watch_log_subscription_message":
            "parse_aws_cloudwatch_log_subscription_message",
    }
    idents = {fixups.get(i, i) for i in idents}
    wired = set(registry()) | {"exists", "del", "unnest"}
    missing = sorted(idents - wired)
    assert not missing, f"stdlib identifiers not wired: {missing}"
