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

Both are pure Column-expression parsers (no UDFs): the statsd grammar is
delimiter-based (split/substring), the prometheus one is three regex
captures plus a label `regexp_extract_all` pair. Comment / blank / HELP /
TYPE lines yield `error = 'not_a_metric_line'` so callers can route them
to the error lane (FallibleTransform convention, operators/base.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_BIG = 1 << 30  # "rest of string" length for substring()

# -- statsd -----------------------------------------------------------


def _sanitize_key(key: Column) -> Column:
    """parser.rs:167-172 sanitize_key: '/'->'-', \\s+ -> '_', then strip
    anything outside [a-zA-Z_\\-0-9.] (same order as the reference)."""
    s = F.regexp_replace(key, "/", "-")
    s = F.regexp_replace(s, r"\s+", "_")
    return F.regexp_replace(s, r"[^a-zA-Z_\-0-9.]", "")


def _tags_map(tags_part: Column) -> Column:
    """'#k:v,k2,k3:x' -> map<string,string>; valueless keys get 'true'
    (parser.rs:131-152)."""
    chunks = F.split(F.substring(tags_part, 2, _BIG), ",")
    keys = F.transform(chunks, lambda c: F.substring_index(c, ":", 1))
    vals = F.transform(
        chunks,
        lambda c: F.when(
            F.instr(c, ":") > 0, F.regexp_extract(c, "^[^:]*:(.*)$", 1)
        ).otherwise(F.lit("true")),
    )
    return F.map_from_arrays(keys, vals)


def parse_statsd(col: Column) -> dict[str, Column]:
    """Parse one statsd/dogstatsd datagram into flat metric columns.

    Returns: name, mtype (c|g|ms|h|d|s), kind (incremental|absolute),
    value (double; counters pre-scaled by 1/rate, ms converted to
    seconds), sample_rate (the 1/@rate multiplier, 1.0 when absent),
    statistic (histogram|summary for timing/distribution types),
    set_value (the raw member for 's'), tags (map), error.
    """
    kv = F.split(col, ":", 2)
    key, body = F.get(kv, 0), F.get(kv, 1)
    parts = F.split(body, r"\|")
    value_str, mtype = F.get(parts, 0), F.get(parts, 1)
    p2, p3 = F.get(parts, 2), F.get(parts, 3)

    sampling = F.when(p2.startswith("@"), p2)
    raw_rate = F.substring(sampling, 2, _BIG).try_cast("double")
    # sanitize_sampling: 0.0 behaves as 1.0 (parser.rs:174-180)
    rate_mult = F.when(sampling.isNull(), F.lit(1.0)).otherwise(
        1.0 / F.when(raw_rate == 0.0, F.lit(1.0)).otherwise(raw_rate)
    )

    tags_cand = F.when(sampling.isNotNull(), p3).otherwise(p2)
    tags_part = F.when(tags_cand.startswith("#"), tags_cand)

    v = value_str.try_cast("double")
    first = F.substring(value_str, 1, 1)
    g_signed = first.isin("+", "-")
    g_digit = first.rlike("^[0-9]$")

    error = (
        F.when(F.instr(col, ":") == 0, F.lit("missing ':' separator"))
        .when(F.size(parts) < 2, F.lit("body needs value|type"))
        .when(~mtype.isin("c", "g", "ms", "h", "d", "s"), F.lit("unknown metric type"))
        .when(sampling.isNotNull() & (raw_rate < 0), F.lit("negative sample rate"))
        .when(mtype.isin("c", "ms", "h", "d") & v.isNull(), F.lit("bad value"))
        .when((mtype == "g") & ~(g_signed | g_digit), F.lit("invalid gauge value prefix"))
        .when(
            (mtype == "g") & F.substring(value_str, 2, _BIG).try_cast("double").isNull() & g_signed,
            F.lit("bad value"),
        )
        .when((mtype == "g") & g_digit & v.isNull(), F.lit("bad value"))
    )

    kind = F.when((mtype == "g") & g_digit, F.lit("absolute")).otherwise(
        F.lit("incremental")
    )
    value = (
        F.when(mtype == "c", v * rate_mult)
        .when(mtype == "ms", v / 1000.0)
        .when(mtype.isin("h", "d"), v)
        # '+5'/'-5' parse fine as doubles; the branch split mirrors
        # parser.rs:80-101 but the arithmetic is identical
        .when(mtype == "g", v)
    )
    statistic = F.when(mtype.isin("ms", "h"), F.lit("histogram")).when(
        mtype == "d", F.lit("summary")
    )

    null_if_err = lambda c: F.when(error.isNull(), c)  # noqa: E731
    return {
        "name": null_if_err(_sanitize_key(key)),
        "mtype": null_if_err(mtype),
        "kind": null_if_err(kind),
        "value": null_if_err(value),
        "sample_rate": null_if_err(rate_mult),
        "statistic": null_if_err(statistic),
        "set_value": null_if_err(F.when(mtype == "s", value_str)),
        "tags": null_if_err(F.when(tags_part.isNotNull(), _tags_map(tags_part))),
        "error": error,
    }


# -- prometheus text format -------------------------------------------

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

    Returns: name, labels (map<string,string>, unescaped), value
    (double; NaN/+Inf/-Inf honored), timestamp_ms (nullable long),
    error ('not_a_metric_line' for comments/blank/HELP/TYPE lines).
    """
    line = F.trim(col)
    matched = line.rlike(PROM_LINE_RX) & ~line.startswith("#") & (line != "")
    name = F.regexp_extract(line, PROM_LINE_RX, 1)
    blob = F.regexp_extract(line, PROM_LINE_RX, 2)
    value_str = F.regexp_extract(line, PROM_LINE_RX, 3)
    ts_str = F.regexp_extract(line, PROM_LINE_RX, 4)

    keys = F.regexp_extract_all(blob, F.lit(PROM_LABEL_RX), 1)
    vals = F.transform(
        F.regexp_extract_all(blob, F.lit(PROM_LABEL_RX), 2), _unescape_label
    )
    value = (
        F.when(value_str == "NaN", F.lit(float("nan")))
        .when(value_str.isin("+Inf", "Inf"), F.lit(float("inf")))
        .when(value_str == "-Inf", F.lit(float("-inf")))
        .otherwise(value_str.try_cast("double"))
    )
    error = F.when(~matched, F.lit("not_a_metric_line")).when(
        value.isNull(), F.lit("bad value")
    )
    null_if_err = lambda c: F.when(error.isNull(), c)  # noqa: E731
    return {
        "name": null_if_err(name),
        "labels": null_if_err(F.map_from_arrays(keys, vals)),
        "value": null_if_err(value),
        "timestamp_ms": null_if_err(ts_str.try_cast("long")),
        "error": error,
    }


def serialize_tags(tags: Column) -> Column:
    """Deterministic 'k:v,k2:v2' form (sorted by key) for hashing/
    comparison — BTreeMap iteration order in the reference."""
    return F.concat_ws(
        ",",
        F.array_sort(
            F.transform(
                F.map_entries(tags), lambda e: F.concat_ws(":", e["key"], e["value"])
            )
        ),
    )
