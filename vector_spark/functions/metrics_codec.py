"""Metric wire-format codecs: statsd/dogstatsd datagrams and Prometheus
text exposition lines.

Reference semantics:
- statsd: /root/reference/src/sources/statsd/parser.rs:16-185 — packet
  `key:body` where body is `value|type[|@rate][|#tags]`; key sanitized
  (`/`->`-`, whitespace->`_`, strip non [a-zA-Z_\\-0-9.]); counter value
  scaled by 1/rate; `ms` samples converted to base seconds; gauge with
  `+`/`-` prefix is an incremental delta, bare digit is absolute; `s` is
  a set member; tags are `#k:v,k2` with missing value -> "true"
  (parse_tags, parser.rs:131-152).
- prometheus: /root/reference/lib/prometheus-parser/src/line.rs — a
  metric line `name{label="value",...} value [timestamp_ms]` with label
  escapes `\\\\`, `\\"`, `\\n`; value may be `NaN`/`+Inf`/`-Inf`.

Plan shape (the same single-pass architecture as functions/grok.py):
each grammar is ONE regex executed once per row via
`regex_extract_named` (the captures come out of a single hoisted
split), and every output column is small scalar math over those shared
captures. Earlier drafts that split per component, or re-packed
computed fields behind a when() root, generated projection methods of
10.7-16 KB of bytecode — past HotSpot's 8000-byte JIT ceiling, so the
stage ran interpreted at 3-7× the cost (measured; sizes via
`df.explain("codegen")` maxMethodCodeSize). The `tags`/`labels` MAP
outputs keep the HOF construction for API completeness, but the flat
`tags_s`/`labels_s` serializations are plain regexp_replace pipelines,
so the hot path never pays an interpreted HOF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from vector_spark.functions.grok import regex_extract_named

_BIG = 1 << 30  # "rest of string" length for substring()

# -- statsd -----------------------------------------------------------


def _sanitize_key(key: Column) -> Column:
    """parser.rs:167-172 sanitize_key: '/'->'-', \\s+ -> '_', then strip
    anything outside [a-zA-Z_\\-0-9.] (same order as the reference)."""
    s = F.translate(key, "/", "-")  # single-char swap: no regex needed
    s = F.regexp_replace(s, r"\s+", "_")
    return F.regexp_replace(s, r"[^a-zA-Z_\-0-9.]", "")


def _tags_map(tags_part: Column) -> Column:
    """'#k:v,k2,k3:x' -> map<string,string>; valueless keys get 'true'
    (parser.rs:131-152). HOF-based — prefer the flat `tags_s` output on
    hot paths (see module docstring)."""
    chunks = F.split(F.substring(tags_part, 2, _BIG), ",")
    keys = F.transform(chunks, lambda c: F.substring_index(c, ":", 1))
    # 'k:a:b' keeps only 'a': parser.rs splits on ':' and takes pair[1]
    vals = F.transform(
        chunks,
        lambda c: F.when(
            F.instr(c, ":") > 0, F.regexp_extract(c, "^[^:]*:([^:]*)", 1)
        ).otherwise(F.lit("true")),
    )
    return F.map_from_arrays(keys, vals)


def _tags_inline(tags_part: Column) -> Column:
    """'#k:v,k2' -> 'k:v,k2:true' (input order, valueless -> true) with
    two regexp_replaces — no HOFs, codegen-friendly. Multi-colon chunks
    truncate to the first value segment ('k:a:b' -> 'k:a', matching
    parser.rs split(':') pair[1])."""
    s = F.substring(tags_part, 2, _BIG)
    s = F.regexp_replace(s, r"(^|,)([^:,]+)(?=,|$)", "$1$2:true")
    return F.regexp_replace(s, r"(^|,)([^:,]*):([^:,]*)[^,]*", "$1$2:$3")


# the whole datagram grammar as ONE regex (it is regular): key : value
# | type [|@rate] [|#tags] [|ignored...]. Trailing parts that are
# neither sampling nor tags are absorbed silently, matching
# parser.rs:37-55 (parts.get(2/3).filter(starts_with ...) — a non-@,
# non-# extra component is simply not sampling/tags, never an error).
STATSD_RX = (
    r"^([^:]*):([^|]*)\|([^|]*)"  # key, value, type
    r"(?:\|(@[^|]*))?"            # optional @rate (kept with the @)
    r"(?:\|(#[^|]*))?"            # optional #tags (kept with the #)
    r"(?:\|.*)?$"                 # ignored trailing components
)


def _statsd_captures_udf():
    """Arrow-batched capture extraction for the statsd grammar: one
    vectorized `Series.str.extract` over the SAME one-regex grammar,
    returning the five raw captures as a struct.

    Why Python here when grok/syslog stay pure-JVM: the statsd
    projection (extraction + ~10 shaped outputs) generated an 11 KB
    whole-stage-codegen method — past HotSpot's 8000-byte JIT ceiling,
    so the stage ran INTERPRETED at ~50 µs/row (NOTES_r2.md; neither
    re-packing nor spark.sql.codegen.hugeMethodLimit=8000 got it under
    ~4.8 s at sf0.1). Moving just the extraction into one Arrow UDF is
    a codegen barrier: the remaining JVM shaping is small scalar math
    that JITs, and the measured total dropped ~4x. One UDF invocation
    per row (Catalyst collapses the repeated references into a single
    ArrowEvalPython — asserted in tests/test_plan_hygiene.py)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def statsd_captures(s):
        out = s.str.extract(STATSD_RX)
        out.columns = ["key", "value", "type", "rate", "tags"]
        # same ''-capture → NULL normalization as regex_extract_named,
        # so the two extraction paths are drop-in interchangeable
        return out.where(out != "", None)

    statsd_captures.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return pandas_udf("struct<key:string,value:string,type:string,rate:string,tags:string>")(
        statsd_captures
    )


def parse_statsd(col: Column, jvm_regex: bool = False) -> dict[str, Column]:
    """Parse one statsd/dogstatsd datagram into flat metric columns.

    Returns: name, mtype (c|g|ms|h|d|s), kind (incremental|absolute),
    value (double; counters pre-scaled by 1/rate, ms converted to
    seconds), sample_rate (the 1/@rate multiplier, 1.0 when absent),
    statistic (histogram|summary for timing/distribution types),
    set_value (the raw member for 's'), tags_s ('k:v,...' input order),
    tags (map form), error.

    One regex execution per row; every output is small scalar math over
    the five shared captures. Default extraction is the Arrow-batched
    UDF (see _statsd_captures_udf for the JIT-ceiling rationale);
    `jvm_regex=True` keeps the pure-expression regex_extract_named path
    (identical semantics, pytest-pinned) for UDF-free contexts."""
    if jvm_regex:
        g = regex_extract_named(
            col,
            STATSD_RX,
            [("key", None), ("value", None), ("type", None), ("rate", None), ("tags", None)],
        )
    else:
        cap = _statsd_captures_udf()(col)
        g = {k: cap[k] for k in ("key", "value", "type", "rate", "tags")}
    key, value_str, mtype = g["key"], g["value"], g["type"]
    rate_str, tags_str = g["rate"], g["tags"]

    raw_rate = F.substring(rate_str, 2, _BIG).try_cast("double")
    # sanitize_sampling: 0.0 behaves as 1.0 (parser.rs:174-180)
    rate_mult = F.when(rate_str.isNull(), F.lit(1.0)).otherwise(
        1.0 / F.when(raw_rate == 0.0, F.lit(1.0)).otherwise(raw_rate)
    )

    v = value_str.try_cast("double")
    first = F.substring(value_str, 1, 1)
    g_signed = first.isin("+", "-")
    g_digit = (first >= "0") & (first <= "9")

    error = (
        F.when(mtype.isNull(), F.lit("malformed packet"))
        .when(~mtype.isin("c", "g", "ms", "h", "d", "s"), F.lit("unknown metric type"))
        .when(rate_str.isNotNull() & (raw_rate < 0), F.lit("negative sample rate"))
        .when(rate_str.isNotNull() & raw_rate.isNull(), F.lit("invalid sample rate"))
        .when(mtype.isin("c", "ms", "h", "d") & v.isNull(), F.lit("bad value"))
        .when((mtype == "g") & ~(g_signed | g_digit), F.lit("invalid gauge value prefix"))
        .when((mtype == "g") & v.isNull(), F.lit("bad value"))
    )
    ok = error.isNull()

    kind = F.when((mtype == "g") & g_digit, F.lit("absolute")).otherwise(
        F.lit("incremental")
    )
    value = (
        F.when(mtype == "c", v * rate_mult)
        .when(mtype == "ms", v / 1000.0)
        # '+5'/'-5' parse fine as doubles; the branch split in
        # parser.rs:80-101 reduces to the same arithmetic
        .when(mtype.isin("h", "d", "g"), v)
    )
    statistic = F.when(mtype.isin("ms", "h"), F.lit("histogram")).when(
        mtype == "d", F.lit("summary")
    )

    null_if_err = lambda c: F.when(ok, c)  # noqa: E731
    return {
        "name": null_if_err(_sanitize_key(key)),
        "mtype": null_if_err(mtype),
        "kind": null_if_err(kind),
        "value": null_if_err(value),
        "sample_rate": null_if_err(rate_mult),
        "statistic": null_if_err(statistic),
        "set_value": null_if_err(F.when(mtype == "s", value_str)),
        "tags_s": null_if_err(_tags_inline(tags_str)),
        "tags": null_if_err(F.when(tags_str.isNotNull(), _tags_map(tags_str))),
        "error": error,
    }


# -- prometheus text format -------------------------------------------

# keep ^/$ INSIDE the pattern: regex_extract_named's `(?:.*?)` wrapper
# would otherwise let a comment line match mid-string; the inner anchors
# still bind to the string ends (no MULTILINE), keeping full-line match
# semantics
PROM_LINE_RX = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
PROM_LABEL_RX = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"'


def _unescape_label(v: Column) -> Column:
    """Prometheus label escapes: \\\\ -> \\, \\" -> ", \\n -> newline
    (line.rs parse_escaped_string). Backslash pairs are swapped to a
    reserved sentinel first so '\\\\n' does not turn into a newline."""
    s = F.regexp_replace(v, r"\\\\", "\x00")
    s = F.regexp_replace(s, r'\\"', '"')
    s = F.regexp_replace(s, r"\\n", "\n")
    return F.regexp_replace(s, "\x00", r"\\")


def parse_prometheus(col: Column) -> dict[str, Column]:
    """Parse one Prometheus exposition metric line.

    Returns: name, labels_s ('k:v,...' exposition order, unescaped),
    labels (map form), value (double; NaN/+Inf/-Inf honored),
    timestamp_ms (nullable long), error ('not_a_metric_line' for
    comments/blank/HELP/TYPE lines). Single regex pass per row via
    regex_extract_named (anchored by that helper)."""
    line = F.trim(col)
    g = regex_extract_named(
        line,
        PROM_LINE_RX,
        [("name", None), ("blob", None), ("value_str", None), ("ts", "long")],
    )
    name, blob, value_str, ts = g["name"], g["blob"], g["value_str"], g["ts"]
    matched = name.isNotNull()

    value = (
        F.when(value_str == "NaN", F.lit(float("nan")))
        .when(value_str.isin("+Inf", "Inf"), F.lit(float("inf")))
        .when(value_str == "-Inf", F.lit(float("-inf")))
        .otherwise(value_str.try_cast("double"))
    )
    error = F.when(~matched, F.lit("not_a_metric_line")).when(
        value.isNull(), F.lit("bad value")
    )
    ok = error.isNull()

    # 'k="v",k2="v2"' -> 'k:v,k2:v2' without HOFs: strip the ="..."
    # decoration in one pass, then apply the unescapes to the joined
    # string (identical per-value result; a label value containing the
    # \\x00 sentinel byte is outside the codec's input contract)
    labels_s = _unescape_label(
        F.regexp_replace(F.coalesce(blob, F.lit("")), PROM_LABEL_RX, "$1:$2")
    )
    keys = F.regexp_extract_all(blob, F.lit(PROM_LABEL_RX), 1)
    vals = F.transform(
        F.regexp_extract_all(blob, F.lit(PROM_LABEL_RX), 2), _unescape_label
    )

    null_if_err = lambda c: F.when(ok, c)  # noqa: E731
    return {
        "name": null_if_err(name),
        "labels_s": null_if_err(labels_s),
        "labels": null_if_err(F.map_from_arrays(F.coalesce(keys, F.array()), F.coalesce(vals, F.array()))),
        "value": null_if_err(value),
        "timestamp_ms": null_if_err(ts),
        "error": error,
    }


def serialize_tags(tags: Column) -> Column:
    """Deterministic 'k:v,k2:v2' form (sorted by key) for hashing/
    comparison — BTreeMap iteration order in the reference. HOF-based;
    prefer the codecs' inline `tags_s`/`labels_s` on hot paths."""
    return F.concat_ws(
        ",",
        F.array_sort(
            F.transform(
                F.map_entries(tags), lambda e: F.concat_ws(":", e["key"], e["value"])
            )
        ),
    )


def _escape_label(v: Column) -> Column:
    """Inverse of _unescape_label: \\ -> \\\\, " -> \\", newline -> \\n
    (backslashes first so later escapes are not double-escaped)."""
    s = F.regexp_replace(v, r"\\", r"\\\\")
    s = F.regexp_replace(s, '"', '\\\\"')
    return F.regexp_replace(s, "\n", r"\\n")


def encode_prometheus(
    name: Column,
    value: Column,
    labels: Column | None = None,
    timestamp_ms: Column | None = None,
) -> Column:
    """One Prometheus text-exposition metric line — the encode half of
    the `prometheus_exporter` sink (src/sinks/prometheus/exporter.rs /
    collector.rs encode_metric): `name{k="v",...} value [ts]`, label
    keys sorted (BTreeMap order in the reference), label values escaped
    (backslash, quote, newline), NaN/±Inf spelled the exposition way.
    Empty/null label maps emit no braces. Round-trips through
    parse_prometheus (property-tested).

    Write lines to a .prom text file for the node-exporter
    textfile-collector pattern — the batch-Spark shape of a scrape
    endpoint."""
    # Sort the (key, value) ENTRIES (struct sort = key then value), not
    # the rendered `k="escaped-v"` strings: the reference's BTreeMap
    # orders by raw key, and string-sorting rendered pairs diverges when
    # one key is a prefix of another whose next char sorts below '='
    # (e.g. {app, app2} would emit app2 first).
    entries = F.array_sort(
        F.map_entries(F.coalesce(labels, F.create_map()) if labels is not None else F.create_map())
    )
    pairs = F.transform(
        entries,
        lambda e: F.concat(
            _sanitize_key(e["key"]), F.lit('="'), _escape_label(e["value"]), F.lit('"')
        ),
    )
    blob = F.when(
        F.size(pairs) > 0, F.concat(F.lit("{"), F.concat_ws(",", pairs), F.lit("}"))
    ).otherwise(F.lit(""))
    val_s = (
        F.when(F.isnan(value), F.lit("NaN"))
        .when(value == F.lit(float("inf")), F.lit("+Inf"))
        .when(value == F.lit(float("-inf")), F.lit("-Inf"))
        .otherwise(value.cast("string"))
    )
    line = F.concat(_sanitize_key(name), blob, F.lit(" "), val_s)
    if timestamp_ms is not None:
        line = F.when(
            timestamp_ms.isNotNull(),
            F.concat(line, F.lit(" "), timestamp_ms.cast("string")),
        ).otherwise(line)
    return line


def _java_double_str(x: float) -> str:
    """Java Double.toString rendering (what Spark's cast(double as
    string) emits): shortest round-trip digits, plain decimal for
    1e-3 <= |x| < 1e7, else one-digit-mantissa scientific with a bare
    exponent (1.2345678E7). Python's repr uses different thresholds
    (1e16 / 1e-4) and e+07-style exponents, so a direct str() would
    break byte-parity with the executor-side encoder."""
    import math
    from decimal import Decimal

    if math.isnan(x) or math.isinf(x):
        raise ValueError("specials are spelled by the caller")
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    sign = "-" if x < 0 else ""
    t = Decimal(repr(abs(x))).as_tuple()
    digits = "".join(map(str, t.digits)).rstrip("0") or "0"
    pointpos = len(t.digits) + t.exponent  # abs(x) = 0.<digits> * 10^pointpos
    if -2 <= pointpos <= 7:  # 1e-3 <= |x| < 1e7
        if pointpos <= 0:
            return f"{sign}0.{'0' * -pointpos}{digits}"
        intp = digits[:pointpos].ljust(pointpos, "0")
        return f"{sign}{intp}.{digits[pointpos:] or '0'}"
    mant = digits[0] + "." + (digits[1:] or "0")
    return f"{sign}{mant}E{pointpos - 1}"


def encode_prometheus_py(
    name: str,
    value: float,
    labels: dict[str, str] | None = None,
    timestamp_ms: int | None = None,
) -> str:
    """Driver-side mirror of encode_prometheus for control-plane
    emitters (plans/top.py snapshots): byte-identical lines with no
    Spark job — a telemetry tick must not schedule work on the data
    plane. Parity is pinned by
    test_metrics_codec.test_prometheus_python_mirror_parity."""
    import math
    import re

    def sanitize(k: str) -> str:
        s = re.sub(r"\s+", "_", k.replace("/", "-"))
        return re.sub(r"[^a-zA-Z_\-0-9.]", "", s)

    def escape(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

    blob = ""
    if labels:
        blob = (
            "{"
            + ",".join(f'{sanitize(k)}="{escape(v)}"' for k, v in sorted(labels.items()))
            + "}"
        )
    v = float(value)
    if math.isnan(v):
        vs = "NaN"
    elif v == float("inf"):
        vs = "+Inf"
    elif v == float("-inf"):
        vs = "-Inf"
    else:
        vs = _java_double_str(v)
    line = f"{sanitize(name)}{blob} {vs}"
    if timestamp_ms is not None:
        line += f" {int(timestamp_ms)}"
    return line
