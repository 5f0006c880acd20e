"""Property-style randomized tests (the reference's proptest layer,
lib/vrl/proptests/ — SURVEY.md §5): seeded random corpora, one Spark
job per property, expectations computed independently in Python.
"""

from __future__ import annotations

import base64
import random
import string

from pyspark.sql import functions as F


def _rng():
    return random.Random(20260817)


def test_ip_aton_ntoa_roundtrip(spark):
    from vector_spark.functions.ip import ip_aton, ip_ntoa

    rng = _rng()
    valid = [
        ".".join(str(rng.randint(0, 255)) for _ in range(4)) for _ in range(300)
    ]
    invalid = ["256.1.1.1", "1.2.3", "a.b.c.d", "", "1.2.3.4.5", "999.999.999.999", "-1.2.3.4"]
    df = spark.createDataFrame([(ip,) for ip in valid + invalid], "ip string")
    got = {
        r["ip"]: (r["n"], r["rt"])
        for r in df.select(
            "ip", ip_aton(F.col("ip")).alias("n"), ip_ntoa(ip_aton(F.col("ip"))).alias("rt")
        ).collect()
    }
    for ip in valid:
        a, b, c, d = map(int, ip.split("."))
        expect = a * 16777216 + b * 65536 + c * 256 + d
        assert got[ip] == (expect, ip), ip
    for ip in invalid:
        assert got[ip][0] is None, ip


def test_base64_roundtrip(spark):
    from vector_spark.functions.strings import decode_base64, encode_base64

    rng = _rng()
    alphabet = string.ascii_letters + string.digits + " éüλ→🙂\t{}[]\"'\\"
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200))) for _ in range(200)]
    cases = list(dict.fromkeys(cases))  # unique keys for the lookup below
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select(
        "s", encode_base64(F.col("s")).alias("b64"), decode_base64(encode_base64(F.col("s"))).alias("rt")
    ).collect()
    for r in rows:
        assert r["rt"] == r["s"]
        assert r["b64"] == base64.b64encode(r["s"].encode()).decode()


def test_key_value_parse_recovers_pairs(spark):
    from vector_spark.functions.parse import parse_key_value

    rng = _rng()
    cases = []
    for _ in range(150):
        n = rng.randint(1, 8)
        pairs = {
            "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 10))): "".join(
                rng.choice(string.ascii_letters + string.digits + "_-./:") for _ in range(rng.randint(1, 15))
            )
            for _ in range(n)
        }
        line = " ".join(f"{k}={v}" for k, v in pairs.items())
        cases.append((line, pairs))
    df = spark.createDataFrame([(l,) for l, _ in cases], "line string")
    got = {r["line"]: r["m"] for r in df.select("line", parse_key_value(F.col("line")).alias("m")).collect()}
    for line, pairs in cases:
        assert got[line] == pairs, line


def test_grok_number_word_roundtrip(spark):
    from vector_spark.functions.grok import grok_extract

    rng = _rng()
    cases = []
    for _ in range(150):
        w = "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 12)))
        i = rng.randint(-10**9, 10**9)
        f = round(rng.uniform(-1e6, 1e6), rng.randint(0, 6))
        cases.append((f"{w} {i} {f:.6f}", w, i, f))
    df = spark.createDataFrame([(c[0],) for c in cases], "line string")
    caps = grok_extract(F.col("line"), "^%{WORD:w} %{INT:i:int} %{NUMBER:f:float}$")
    got = {
        r["line"]: (r["w"], r["i"], r["f"])
        for r in df.select("line", caps["w"].alias("w"), caps["i"].alias("i"), caps["f"].alias("f")).collect()
    }
    for line, w, i, f in cases:
        gw, gi, gf = got[line]
        assert gw == w and gi == i and abs(gf - f) < 1e-6, line


def test_truncate_slice_match_python(spark):
    from vector_spark.functions.strings import slice_, truncate

    rng = _rng()
    cases = list(
        dict.fromkeys(
            "".join(rng.choice(string.printable[:94]) for _ in range(rng.randint(0, 60))) for _ in range(150)
        )
    )
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    rows = df.select(
        "s",
        truncate(F.col("s"), 10).alias("t10"),
        slice_(F.col("s"), 3, 8).alias("s38"),
    ).collect()
    for r in rows:
        assert r["t10"] == r["s"][:10]
        assert r["s38"] == r["s"][3:8]


def test_sha3_matches_hashlib(spark):
    import hashlib

    from vector_spark.functions.strings import sha3_

    rng = _rng()
    cases = list(dict.fromkeys("".join(rng.choice(string.ascii_letters) for _ in range(20)) for _ in range(50)))
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", sha3_(F.col("s"), 256).alias("h")).collect()}
    for s in cases:
        assert got[s] == hashlib.sha3_256(s.encode()).hexdigest()


def test_percent_encode_matches_python(spark):
    """encode_percent(NON_ALPHANUMERIC) encodes every byte outside
    [A-Za-z0-9] as uppercase %XX (the percent-encoding crate's set —
    stricter than urllib.parse.quote, which keeps '~_.-' bare); decode
    inverts, '+' preserved verbatim."""

    from vector_spark.functions.strings import decode_percent, encode_percent

    def ref_encode(s: str) -> str:
        out = []
        for ch in s:
            if ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ("0" <= ch <= "9"):
                out.append(ch)
            else:
                out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
        return "".join(out)

    rng = _rng()
    alphabet = string.ascii_letters + string.digits + " ?&=+%#/:;@'\"<>~é☃"
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30))) for _ in range(200)]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    rows = df.select(
        "s",
        encode_percent(F.col("s")).alias("enc"),
        decode_percent(encode_percent(F.col("s"))).alias("rt"),
    ).collect()
    for r in rows:
        expect = ref_encode(r["s"])
        assert r["enc"] == expect, (r["s"], r["enc"], expect)
        assert r["rt"] == r["s"]


def test_ip6_matches_python_ipaddress(spark):
    """ip6_aton agrees with stdlib ipaddress on random valid/invalid
    addresses (full, compressed, v4-mapped, malformed)."""
    import ipaddress

    from vector_spark.functions.ip import ip6_aton

    rng = _rng()
    samples = []
    for _ in range(120):
        groups = [format(rng.randrange(1 << 16), "x") for _ in range(8)]
        samples.append(":".join(groups))
        # compressed variant: zero a run then compress it
        k = rng.randint(0, 5)
        run = rng.randint(1, 3)
        comp = groups[:k] + ["" ] + groups[k + run:]
        samples.append(":".join(comp).replace(":::", "::"))
    samples += [
        f"::ffff:{rng.randint(0,255)}.{rng.randint(0,255)}.{rng.randint(0,255)}.{rng.randint(0,255)}"
        for _ in range(30)
    ]
    samples += ["not an ip", "1::2::3", ":::", "12345::", "g::1", ""]
    df = spark.createDataFrame([(s,) for s in samples], "ip string")
    rows = df.select("ip", ip6_aton(F.col("ip")).alias("p")).collect()
    for r in rows:
        try:
            a = ipaddress.ip_address(r["ip"])
            n = int(a) if a.version == 6 else None
        except ValueError:
            n = None
        if n is None:
            assert r["p"] is None, r["ip"]
        else:
            exp = (n >> 64, n & ((1 << 64) - 1))
            exp = tuple(v - (1 << 64) if v >= (1 << 63) else v for v in exp)
            assert (r["p"]["hi"], r["p"]["lo"]) == exp, r["ip"]


def test_single_pass_extraction_matches_python_re(spark):
    """regex_extract_named ≡ python re first-match group extraction on
    random lines for a multi-capture pattern."""
    import re as pyre

    from vector_spark.functions.grok import regex_extract_named

    rng = _rng()
    rx = r"(\w+)=(\d+);(\w*)"
    lines = []
    for _ in range(200):
        kind = rng.randint(0, 3)
        if kind == 0:
            lines.append(f"{'x'*rng.randint(1,5)}={rng.randint(0,999)};{'t'*rng.randint(0,3)}")
        elif kind == 1:
            lines.append(f"junk {'k'*rng.randint(1,4)}={rng.randint(0,99)}; tail")
        elif kind == 2:
            lines.append("no match here at all")
        else:
            lines.append("")
    df = spark.createDataFrame([(l,) for l in lines], "l string")
    caps = regex_extract_named(
        F.col("l"), rx, [("k", None), ("n", "long"), ("t", None)]
    )
    rows = df.select("l", *[c.alias(name) for name, c in caps.items()]).collect()
    crx = pyre.compile(rx)
    for r in rows:
        m = crx.search(r["l"])
        if m is None:
            assert r["k"] is None and r["n"] is None and r["t"] is None, r["l"]
        else:
            assert r["k"] == m.group(1), r["l"]
            assert r["n"] == int(m.group(2)), r["l"]
            exp_t = m.group(3) if m.group(3) != "" else None
            assert r["t"] == exp_t, r["l"]


def test_statsd_matches_python_reference(spark):
    """Random datagram battery vs a Python port of parser.rs:16-185
    (same math, same ''-capture→NULL normalization as the Spark side)."""
    import random
    import re

    import pyspark.sql.functions as F

    from vector_spark.functions.metrics_codec import parse_statsd

    rng = random.Random(11)

    def py_ref(line):
        m = re.match(
            r"^([^:]*):([^|]*)\|([^|]*)(?:\|(@[^|]*))?(?:\|(#[^|]*))?(?:\|.*)?$",
            line,
        )
        none = dict(name=None, mtype=None, kind=None, value=None,
                    sample_rate=None, statistic=None, set_value=None, tags_s=None)
        if not m:
            return {**none, "error": "malformed packet"}
        key, value_str, mtype, rate_s, tags_s_raw = (
            g if g != "" else None for g in m.groups()
        )
        mtype_raw = m.group(3)
        if mtype_raw == "" or mtype_raw not in ("c", "g", "ms", "h", "d", "s"):
            return {**none, "error": "unknown metric type" if mtype_raw else "malformed packet"}
        raw_rate = None
        if rate_s is not None:
            try:
                raw_rate = float(rate_s[1:])
            except ValueError:
                raw_rate = None
            if raw_rate is not None and raw_rate < 0:
                return {**none, "error": "negative sample rate"}
            # non-numeric @rate is a parse error (parser.rs sampling
            # parse failure), not a silent null
            if raw_rate is None:
                return {**none, "error": "invalid sample rate"}
        rate_mult = 1.0 if rate_s is None else (
            1.0 / (1.0 if (raw_rate == 0.0) else raw_rate) if raw_rate is not None else None
        )
        try:
            v = float(value_str) if value_str is not None else None
        except ValueError:
            v = None
        first = (value_str or "")[:1]
        g_signed, g_digit = first in "+-", first.isdigit()
        if mtype_raw in ("c", "ms", "h", "d") and v is None:
            return {**none, "error": "bad value"}
        if mtype_raw == "g":
            if not (g_signed or g_digit):
                return {**none, "error": "invalid gauge value prefix"}
            if v is None:
                return {**none, "error": "bad value"}
        name = re.sub(r"[^a-zA-Z_\-0-9.]", "", re.sub(r"\s+", "_", (key or "").replace("/", "-")))
        value = {
            "c": (v * rate_mult) if v is not None and rate_mult is not None else None,
            "ms": v / 1000.0 if v is not None else None,
        }.get(mtype_raw, v if mtype_raw in ("h", "d", "g") else None)
        tags_s = None
        if tags_s_raw is not None:
            chunks = tags_s_raw[1:].split(",")
            tags_s = ",".join(c if ":" in c else c + ":true" for c in chunks)
        return {
            "name": name or None,
            "mtype": mtype_raw,
            "kind": "absolute" if (mtype_raw == "g" and g_digit) else "incremental",
            "value": value,
            "sample_rate": rate_mult,
            "statistic": {"ms": "histogram", "h": "histogram", "d": "summary"}.get(mtype_raw),
            "set_value": value_str if mtype_raw == "s" else None,
            "tags_s": tags_s or None,
            "error": None,
        }

    lines = []
    keys = ["api.lat", "a/b c", "x$!y", "", "plain"]
    for _ in range(250):
        key = rng.choice(keys)
        mtype = rng.choice(["c", "g", "ms", "h", "d", "s", "x", ""])
        val = rng.choice(["12", "-3.5", "+7", "0.25", "abc", "", "*9"])
        parts = [f"{key}:{val}", mtype]
        if rng.random() < 0.5:
            parts.append("@" + rng.choice(["0.5", "0", "-1", "2", "junk"]))
        if rng.random() < 0.5:
            parts.append("#" + rng.choice(["a:1,b", "env:prod", "only"]))
        if rng.random() < 0.2:
            parts.append("ignored")
        lines.append("|".join(parts))
    lines += ["nocolon", "k:v", "k:1|c|x|#t"]

    df = spark.createDataFrame([(l,) for l in lines], "line string")
    p = parse_statsd(F.col("line"))
    cols = ["name", "mtype", "kind", "value", "sample_rate", "statistic", "set_value", "tags_s", "error"]
    rows = df.select("line", *[p[k].alias(k) for k in cols]).collect()
    for r in rows:
        want = py_ref(r["line"])
        got = {k: r[k] for k in cols}
        for k in cols:
            w, g = want[k], got[k]
            if isinstance(w, float) and g is not None:
                assert abs(w - g) < 1e-9, (r["line"], k, w, g)
            elif k == "error":
                assert (w is None) == (g is None), (r["line"], w, g)
            else:
                assert w == g, (r["line"], k, w, g)


def test_octet_framing_roundtrip(spark):
    """Random frame lists render → unframe → identity; corrupted
    prefixes reject the chunk."""
    import random

    import pyspark.sql.functions as F

    from vector_spark.functions.framing import octet_counting_frames

    rng = random.Random(5)
    cases = []
    for _ in range(100):
        frames = [
            "".join(rng.choice("abc |<>:0123") for _ in range(rng.randrange(0, 12)))
            for _ in range(rng.randrange(1, 5))
        ]
        chunk = "".join(f"{len(f.encode())} {f}" for f in frames)
        cases.append((chunk, frames))
    df = spark.createDataFrame([(c,) for c, _ in cases], "c string")
    got = [r[0] for r in df.select(octet_counting_frames(F.col("c"))).collect()]
    for (chunk, want), g in zip(cases, got):
        assert g == want, (chunk, want, g)


def test_prometheus_matches_python_reference(spark):
    """Random exposition-line battery vs a Python port of the line
    grammar (lib/prometheus-parser/src/line.rs semantics as implemented:
    full-line match, escape handling, NaN/±Inf, optional timestamp)."""
    import math
    import random
    import re

    import pyspark.sql.functions as F

    from vector_spark.functions.metrics_codec import (
        PROM_LINE_RX,
        parse_prometheus,
    )

    label_rx = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"')

    def unescape(v):
        out, i = [], 0
        while i < len(v):
            if v[i] == "\\" and i + 1 < len(v):
                out.append({"\\": "\\", '"': '"', "n": "\n"}.get(v[i + 1], "\\" + v[i + 1]))
                i += 2
            else:
                out.append(v[i])
                i += 1
        return "".join(out)

    def py_ref(line):
        t = line.strip()
        m = re.match(PROM_LINE_RX, t)
        if not m:
            return {"name": None, "labels_s": None, "value": None,
                    "timestamp_ms": None, "error": "not_a_metric_line"}
        name, blob, vs, ts = m.groups()
        if vs == "NaN":
            v = float("nan")
        elif vs in ("+Inf", "Inf"):
            v = float("inf")
        elif vs == "-Inf":
            v = float("-inf")
        else:
            try:
                v = float(vs)
            except ValueError:
                v = None
        if v is None:
            return {"name": None, "labels_s": None, "value": None,
                    "timestamp_ms": None, "error": "bad value"}
        labels_s = ",".join(
            f"{k}:{unescape(val)}" for k, val in label_rx.findall(blob or "")
        )
        return {"name": name, "labels_s": labels_s, "value": v,
                "timestamp_ms": int(ts) if ts else None, "error": None}

    rng = random.Random(17)
    lines = []
    for _ in range(200):
        name = rng.choice(["up", "http_req_total", "node:cpu", "_x9"])
        nl = rng.randrange(0, 3)
        val_pool = ["v", "1", "x y", 'q\\"z', "w\\\\u", "n\\nl"]
        parts = []
        for _ in range(nl):
            k = rng.choice(["a", "bb", "c_1"])
            v = rng.choice(val_pool)
            parts.append(k + '="' + v + '"')
        labels = ",".join(parts)
        blob = "{" + labels + "}" if (nl or rng.random() < 0.2) else ""
        val = rng.choice(["1", "0.5", "-2e3", "NaN", "+Inf", "-Inf", "oops"])
        ts = f" {rng.randrange(-5, 2_000_000_000_000)}" if rng.random() < 0.4 else ""
        lines.append(f"{name}{blob} {val}{ts}")
    lines += ["# HELP x y", "", "9bad 1", "ok 1 2 3"]

    df = spark.createDataFrame([(l,) for l in lines], "line string")
    p = parse_prometheus(F.col("line"))
    cols = ["name", "labels_s", "value", "timestamp_ms", "error"]
    rows = df.select("line", *[p[k].alias(k) for k in cols]).collect()
    for r in rows:
        want = py_ref(r["line"])
        for k in cols:
            w, g = want[k], r[k]
            if isinstance(w, float) and g is not None:
                assert (math.isnan(w) and math.isnan(g)) or w == g, (r["line"], k, w, g)
            else:
                assert w == g, (r["line"], k, w, g)


def test_remove_duplicated_spans_matches_python(spark):
    """ExactSubstr removal vs an exact-gram Python reference (dict of
    gram tuples — collision-free, unlike the 60-bit hash, so it also
    bounds collision damage): a tiny alphabet forces heavy natural
    duplication; verbatim doc copies force cross-doc spans."""
    from vector_spark.training.tokens import remove_duplicated_spans

    rng = _rng()
    W = 5
    docs = [(d, [rng.randint(0, 3) for _ in range(rng.randint(0, 30))]) for d in range(40)]
    docs += [(100 + d, list(toks)) for d, toks in docs[:5]]  # verbatim copies
    docs.append((200, []))  # empty doc edge

    grams: dict[tuple, list] = {}
    for d, toks in docs:
        for q in range(len(toks) - W + 1):
            grams.setdefault(tuple(toks[q : q + W]), []).append((d, q))
    rm: dict[int, set] = {d: set() for d, _ in docs}
    for occ in grams.values():
        if len(occ) > 1:
            canon = min(occ)
            for d, q in occ:
                if (d, q) != canon:
                    rm[d].update(range(q, q + W))
    expected = {d: [t for i, t in enumerate(toks) if i not in rm[d]] for d, toks in docs}

    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, window=W).collect()}
    assert set(out) == set(expected)
    for d, toks in docs:
        assert out[d]["tokens"] == expected[d], d
        assert out[d]["n_removed"] == len(toks) - len(expected[d]), d


def test_prometheus_encode_parse_roundtrip(spark):
    """encode_prometheus → parse_prometheus recovers name, labels and
    value exactly, including escaped quotes/backslashes/newlines in
    label values and NaN/±Inf specials."""
    import math

    from pyspark.sql import functions as F

    from vector_spark.functions.metrics_codec import encode_prometheus, parse_prometheus

    rng = _rng()
    cases = []
    tricky = ['pla"in', "back\\slash", "new\nline", 'mix\\"ed\n', ""]
    for i in range(150):
        labels = {
            f"k{j}": rng.choice(tricky) + str(rng.randint(0, 99))
            for j in range(rng.randint(0, 4))
        }
        val = rng.choice([rng.uniform(-1e6, 1e6), float("nan"), float("inf"), float("-inf"), 0.0])
        cases.append((i, f"metric_{i}", labels, val, rng.choice([None, 1700000000000 + i])))
    df = spark.createDataFrame(
        cases, "i long, name string, labels map<string,string>, value double, ts long"
    )
    enc = df.select(
        "i", "name", "labels", "value", "ts",
        encode_prometheus(
            F.col("name"), F.col("value"), F.col("labels"), F.col("ts")
        ).alias("line"),
    )
    parsed = enc.select(
        "i", "name", "labels", "value", "ts",
        *[c.alias("p_" + n) for n, c in parse_prometheus(F.col("line")).items()],
    )
    for r in parsed.collect():
        assert r["p_error"] is None, (r["line"] if "line" in r else r["p_error"])
        assert r["p_name"] == r["name"]
        assert dict(r["p_labels"]) == dict(r["labels"])
        assert r["p_timestamp_ms"] == r["ts"]
        if math.isnan(r["value"]):
            assert math.isnan(r["p_value"])
        else:
            assert r["p_value"] == r["value"]
