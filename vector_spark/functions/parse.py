"""VRL codec/parse functions → Spark Column expressions.

One function per VRL stdlib parser we rebuild (registry:
/root/reference/lib/vrl/stdlib/src/lib.rs:490+). Each is a *plan-time*
Column builder: the returned expression runs JVM-side under whole-stage
codegen — Vector's per-event interpreted parse becomes a vectorized
columnar kernel for free.

Fallibility: VRL forces callers to handle errors (`f!()`, `??`). Our
mapping is null-propagation — a parse failure yields NULL (try_cast /
'' → NULL normalization), and operators that need Vector's
`drop_on_error` routing filter on the null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions import grok as _grok

# ---------------------------------------------------------------- json


def parse_json(col: Column, schema: str) -> Column:
    """VRL parse_json (lib/vrl/stdlib/src/parse_json.rs:7) with a known
    schema → from_json struct; invalid JSON → NULL struct."""
    return F.from_json(col, schema)


def parse_json_map(col: Column) -> Column:
    """Schema-free variant: top-level object as map<string,string>.
    Mirrors json_parser's merge-keys-at-root behavior
    (src/transforms/json_parser.rs:73-120) for flat objects."""
    return F.from_json(col, "map<string,string>")


def get_json_field(col: Column, path: str) -> Column:
    """Point lookup without full parse (Catalyst JsonTuple/GetJsonObject)."""
    return F.get_json_object(col, f"$.{path}")


# ---------------------------------------------------------------- regex / grok


def parse_regex(col: Column, pattern: str, groups: dict[str, int]) -> dict[str, Column]:
    """VRL parse_regex (parse_regex.rs:10): named captures → columns.
    ``groups`` maps capture name → 1-based group index in ``pattern``.
    No match → NULL (Vector: error value)."""
    out = {}
    for name, idx in groups.items():
        c = F.regexp_extract(col, pattern, idx)
        out[name] = F.when(c == "", F.lit(None)).otherwise(c)
    return out


def parse_regex_all(col: Column, pattern: str, group: int = 0) -> Column:
    """VRL parse_regex_all → array of all matches of one group.
    Rust/Python `(?P<n>...)` named groups are rewritten to Java's
    `(?<n>...)` — Spark's regexp_* run java.util.regex."""
    return F.regexp_extract_all(col, F.lit(pattern.replace("(?P<", "(?<")),
                                F.lit(group))


def parse_grok(col: Column, pattern: str, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """VRL parse_grok (parse_grok.rs:49-66): grok expanded to regex at
    plan time, captures extracted positionally (see functions/grok.py)."""
    return _grok.grok_extract(col, pattern, patterns)


# ---------------------------------------------------------------- kv / logfmt / csv / tokens


def parse_key_value(
    col: Column, key_value_delimiter: str = "=", field_delimiter: str = " "
) -> Column:
    """VRL parse_key_value (parse_key_value.rs:19) → map<string,string>.

    Quoted values: we first protect delimiters inside double quotes is not
    expressible with str_to_map alone, so values keep surrounding quotes
    stripped via a post-transform. Good for well-formed logfmt lines;
    pathological quoting falls back to parse_key_value_udf (operators.remap).
    """
    m = F.str_to_map(col, F.lit(field_delimiter), F.lit(key_value_delimiter))
    return F.transform_values(m, lambda _, v: F.regexp_replace(v, r'^"|"$', ""))


def parse_logfmt(col: Column) -> Column:
    """VRL parse_logfmt — logfmt is KV with space/equals delimiters.
    Quoted values containing spaces are protected by swapping their
    spaces to \\x00 first, then restored after the map split."""
    protected = F.regexp_replace(
        col, r'"([^"]*)"', r'$1'
    )  # simple case: strip quotes (no embedded spaces)
    return parse_key_value(protected)


def parse_csv(col: Column, schema: str, sep: str = ",") -> Column:
    """VRL parse_csv (parse_csv.rs:8) → from_csv struct."""
    return F.from_csv(col, F.lit(schema), {"sep": sep})


def parse_tokens(col: Column) -> Column:
    """VRL parse_tokens / the tokenizer transform's quote-aware splitter
    (lib/shared/src/tokenize.rs): tokens are quoted strings, bracketed
    groups, or runs of non-space; the QUOTES/BRACKETS are stripped from
    the token (tokenize.rs `delimited(tag(..), inner, tag(..))`).
    '-' means null downstream."""
    toks = F.regexp_extract_all(col, F.lit(r'"[^"]*"|\[[^\]]*\]|\S+'), F.lit(0))
    return F.transform(
        toks, lambda t: F.regexp_replace(t, r'^"(.*)"$|^\[(.*)\]$', r"$1$2"))


# ---------------------------------------------------------------- timestamps / numbers / urls


def parse_timestamp(col: Column, fmt: str | None = None) -> Column:
    """VRL parse_timestamp (parse_timestamp.rs:8) → try_to_timestamp."""
    if fmt is None:
        return F.try_to_timestamp(col)
    return F.try_to_timestamp(col, F.lit(fmt))


def parse_int(col: Column, base: int = 10) -> Column:
    """VRL parse_int: base 10 → try_cast; other bases → conv()."""
    if base == 10:
        return col.try_cast("long")
    return F.conv(col, base, 10).try_cast("long")


def parse_duration(col: Column, unit: str = "s") -> Column:
    """VRL parse_duration: '300ms' / '2s' / '5m' / '1h' → number in
    ``unit`` seconds-family. Pure expression: split magnitude/suffix."""
    mag = F.regexp_extract(col, r"^([0-9.]+)", 1).try_cast("double")
    suffix = F.regexp_extract(col, r"([a-zµ]+)$", 1)
    to_secs = (
        F.when(suffix == "ns", mag / 1e9)
        .when(suffix.isin("us", "µs"), mag / 1e6)
        .when(suffix == "ms", mag / 1e3)
        .when(suffix == "s", mag)
        .when(suffix == "m", mag * 60)
        .when(suffix == "h", mag * 3600)
        .when(suffix == "d", mag * 86400)
    )
    scale = {
        "ns": 1e9, "us": 1e6, "ms": 1e3, "s": 1.0,
        "m": 1 / 60, "h": 1 / 3600, "d": 1 / 86400,
    }[unit]
    return to_secs * F.lit(scale)


def parse_url(col: Column) -> Column:
    """VRL parse_url (parse_url.rs:9) → struct(scheme, host, port, path, query, fragment)."""
    return F.struct(
        F.parse_url(col, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(col, F.lit("HOST")).alias("host"),
        # Spark's parse_url has no PORT part key — split it off AUTHORITY
        F.regexp_extract(F.parse_url(col, F.lit("AUTHORITY")), r":(\d+)$", 1)
        .try_cast("int")
        .alias("port"),
        F.parse_url(col, F.lit("PATH")).alias("path"),
        F.parse_url(col, F.lit("QUERY")).alias("query"),
        F.parse_url(col, F.lit("REF")).alias("fragment"),
    )


def parse_query_string(col: Column) -> Column:
    """VRL parse_query_string → map<string,string> of k=v pairs."""
    stripped = F.regexp_replace(col, r"^\?", "")
    return F.str_to_map(stripped, F.lit("&"), F.lit("="))


# ---------------------------------------------------------------- vendor log formats

APACHE_COMMON_GROK = (
    "%{IPORHOST:host} %{USER:identity} %{USER:user} \\[%{HTTPDATE:timestamp}\\] "
    "\"%{WORD:method} %{URIPATHPARAM:path} HTTP/%{NUMBER:protocol}\" "
    "%{INT:status:int} %{INT:size:int}"
)

SYSLOG_3164_GROK = (
    "(?:<%{NONNEGINT:priority}>)?%{SYSLOGTIMESTAMP:timestamp} %{IPORHOST:hostname} "
    # appname/pid split like the reference's 3164 parser; the colon may
    # be followed by no space (`root[8539]:msg` — VRL corpus
    # successful_parse_syslog_type)
    "%{PROG:appname}(?:\\[%{POSINT:procid}\\])?:\\s?%{GREEDYDATA:message}"
)

SYSLOG_5424_GROK = (
    "<%{NONNEGINT:priority}>%{NONNEGINT:version} %{TIMESTAMP_ISO8601:timestamp} "
    "%{NOTSPACE:hostname} %{NOTSPACE:appname} %{NOTSPACE:procid} %{NOTSPACE:msgid} "
    "(?:-|\\[.*\\]) ?%{GREEDYDATA:message}"
)


def parse_apache_log(col: Column) -> dict[str, Column]:
    """VRL parse_apache_log / parse_common_log
    (lib/vrl/stdlib/src/parse_apache_log.rs:9) via grok expansion."""
    out = _grok.grok_extract(col, APACHE_COMMON_GROK)
    # HTTPDATE captures the timezone offset too ("17/Aug/2026:10:00:00 +0000")
    out["timestamp"] = F.try_to_timestamp(out["timestamp"], F.lit("dd/MMM/yyyy:HH:mm:ss Z"))
    return out


# 5424-first fallback as ONE alternation (suffixed capture names keep
# groups unique); halves the per-row regex work vs two separate
# grok_extract passes and keeps the generated projection method under
# the 8 KB JIT ceiling (two inlined patterns measured 10.5 KB →
# interpreted; see functions/metrics_codec.py docstring)
SYSLOG_COMBINED_GROK = (
    "(?:" + SYSLOG_5424_GROK.replace(":priority", ":priority5")
    .replace(":timestamp", ":timestamp5")
    .replace(":hostname", ":hostname5")
    .replace(":appname", ":appname5")
    .replace(":message", ":message5")
    + ")|(?:" + SYSLOG_3164_GROK.replace(":priority", ":priority3")
    .replace(":timestamp", ":timestamp3")
    .replace(":hostname", ":hostname3")
    .replace(":appname", ":appname3")
    .replace(":procid", ":procid3")
    .replace(":message", ":message3")
    + ")"
)


def parse_syslog(col: Column) -> dict[str, Column]:
    """VRL parse_syslog (parse_syslog.rs:11): RFC5424 first, 3164
    fallback — one regex pass; the alternation tries 5424 first at each
    position, matching the sequential-fallback semantics for lines
    anchored at the start (the only shape the formats produce)."""
    g = _grok.grok_extract(col, SYSLOG_COMBINED_GROK)
    out = {
        k: F.coalesce(g[k + "5"], g[k + "3"])
        for k in ("priority", "timestamp", "hostname", "appname", "message")
    }
    for k in ("version", "msgid"):
        out[k] = g[k]
    out["procid"] = F.coalesce(g["procid"], g["procid3"])
    return out


_SD_REGION_RX = r"^<\d+>\d+ \S+ \S+ \S+ \S+ \S+ ((?:\[[^\]]*\])+)"
_SD_PARAM_RX = r'([\w@.\-]+)\s*=\s*"([^"]*)"'


def parse_syslog_structured_data(col: Column) -> dict[str, Column]:
    """RFC 5424 structured-data elements flattened to '<id>.<param>'
    keys, the shape VRL parse_syslog emits (parse_syslog.rs:136-145,
    examples :26-31 — note the reference corpus includes `eventSource=
    "Application"` with a space around '=', which the param regex
    tolerates). Returns the map plus a sorted 'k=v,...' serialization.
    Escaped quotes inside param values (\\") are out of scope for the
    regex form (the VRL parser handles them; our log corpus does not
    produce them)."""
    region = F.regexp_extract(col, _SD_REGION_RX, 1)
    elements = F.regexp_extract_all(region, F.lit(r"\[([^\]]*)\]"), 1)
    entries = F.flatten(
        F.transform(
            elements,
            lambda el: F.zip_with(
                F.regexp_extract_all(el, F.lit(_SD_PARAM_RX), 1),
                F.regexp_extract_all(el, F.lit(_SD_PARAM_RX), 2),
                lambda k, v: F.struct(
                    F.concat(F.regexp_extract(el, r"^([^ ]+)", 1), F.lit("."), k).alias("key"),
                    v.alias("value"),
                ),
            ),
        )
    )
    sd_map = F.map_from_entries(entries)
    sd_s = F.concat_ws(
        ",",
        F.array_sort(
            F.transform(entries, lambda e: F.concat_ws("=", e["key"], e["value"]))
        ),
    )
    has_sd = F.size(entries) > 0
    return {
        "sd": F.when(has_sd, sd_map),
        "sd_s": F.when(has_sd, sd_s),
        "n_elements": F.size(elements),
    }


def parse_logplex(col: Column) -> dict[str, Column]:
    """Heroku logplex drain line (src/sources/heroku_logs.rs:200-251):
    `len <pri>ver timestamp hostname app_name proc_id msgid message`
    via splitn(8, ' '); a line with fewer than 8 parts is forwarded raw
    (message = whole line, other fields null) — warn-and-forward, not
    an error, per the reference."""
    parts = F.split(col, " ", 8)
    ok = F.size(parts) == 8
    ts = F.try_to_timestamp(F.get(parts, 2), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"))
    return {
        "timestamp": F.when(ok, ts),
        "host": F.when(ok, F.get(parts, 3)),
        "app_name": F.when(ok, F.get(parts, 4)),
        "proc_id": F.when(ok, F.get(parts, 5)),
        "message": F.when(ok, F.get(parts, 7)).otherwise(col),
    }


def parse_journald_record(col: Column) -> dict[str, Column]:
    """journald JSON-export record (src/sources/journald.rs:436-460):
    MESSAGE -> message, _HOSTNAME -> host, timestamp from
    _SOURCE_REALTIME_TIMESTAMP (string micros) falling back to
    __REALTIME_TIMESTAMP, source_type = 'journald'. The full record
    rides along as `fields` (map) — journald field names are dynamic.
    (Binary MESSAGE arrays — journald.rs:663 — are outside the
    map<string,string> variant; a schema with binary needs from_json
    with an explicit struct.)"""
    m = F.from_json(col, "map<string,string>")
    ts_us = F.coalesce(
        F.element_at(m, "_SOURCE_REALTIME_TIMESTAMP"),
        F.element_at(m, "__REALTIME_TIMESTAMP"),
    ).try_cast("long")
    return {
        "message": F.element_at(m, "MESSAGE"),
        "host": F.element_at(m, "_HOSTNAME"),
        "timestamp": F.timestamp_micros(ts_us),
        "priority": F.element_at(m, "PRIORITY").try_cast("int"),
        "unit": F.element_at(m, "_SYSTEMD_UNIT"),
        "source_type": F.lit("journald"),
        "fields": m,
    }


DATADOG_AGENT_SCHEMA = (
    "array<struct<message:string, status:string, timestamp:long, "
    "hostname:string, service:string, ddsource:string, ddtags:string>>"
)


def parse_datadog_agent_logs(col: Column) -> Column:
    """Datadog agent log payload (src/sources/datadog/agent.rs:349-357
    LogMsg): a JSON array of log messages; callers `explode()` for the
    one-event-per-entry emission (agent.rs:264-275). `ddtags` stays a
    'k:v,k2:v2' string per the reference; split it with
    `str_to_map(ddtags, ',', ':')` when map access is needed."""
    return F.from_json(col, DATADOG_AGENT_SCHEMA)


# Utc.ymd(10_000,1,1) in seconds / millis — splunk_hec.rs:535-556
_SPLUNK_SEC_CUTOFF = 253402300800
_SPLUNK_MS_CUTOFF = 253402300800000


def parse_splunk_hec(col: Column) -> dict[str, Column]:
    """Splunk HEC event envelope (src/sources/splunk_hec.rs): `event`
    (string or object — returned as its raw JSON text), `time` with the
    reference's magnitude heuristic (seconds < year-10000 < millis <
    nanos, splunk_hec.rs:535-556; negative -> null), `host`, and the
    index/source/sourcetype fields under their splunk_-prefixed names
    (splunk_hec.rs:31-33)."""
    t = F.get_json_object(col, "$.time").try_cast("long")
    ts_us = (
        F.when(t < 0, F.lit(None))
        .when(t < _SPLUNK_SEC_CUTOFF, t * 1_000_000)
        .when(t < _SPLUNK_MS_CUTOFF, t * 1_000)
        .otherwise(F.floor(t / 1_000).cast("long"))
    )
    return {
        "event": F.get_json_object(col, "$.event"),
        "timestamp": F.timestamp_micros(ts_us),
        "host": F.get_json_object(col, "$.host"),
        "splunk_index": F.get_json_object(col, "$.index"),
        "splunk_source": F.get_json_object(col, "$.source"),
        "splunk_sourcetype": F.get_json_object(col, "$.sourcetype"),
        "source_type": F.lit("splunk_hec"),
    }


CLOUDWATCH_SUBSCRIPTION_SCHEMA = (
    "messageType string, owner string, logGroup string, logStream string, "
    "subscriptionFilters array<string>, "
    "logEvents array<struct<id:long, timestamp:long, message:string>>"
)


def parse_cloudwatch_subscription(col: Column) -> Column:
    """The aws_cloudwatch_logs_subscription_parser transform
    (/root/reference/src/transforms/aws_cloudwatch_logs_subscription_parser.rs:1-241):
    one subscription envelope fans out to one event per logEvents entry.
    Returns the parsed struct; callers `explode(parsed.logEvents)` for
    the multi-event emission (the same explode() shape that backs VRL
    remap's set-`.`-to-an-array multi-emit)."""
    return F.from_json(col, CLOUDWATCH_SUBSCRIPTION_SCHEMA)


GLOG_RX = r"^([IWEF])(\d{2})(\d{2}) (\d{2}:\d{2}:\d{2})\.(\d+)\s+(\d+) ([^:]+):(\d+)\] (.*)$"
_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def parse_glog(col: Column) -> dict[str, Column]:
    """VRL parse_glog (lib/vrl/stdlib/src/parse_glog.rs): google log
    lines 'I0817 10:00:00.123456  1234 file.cc:42] msg'."""
    level_map = F.create_map(*[F.lit(x) for kv in _GLOG_LEVELS.items() for x in kv])
    return {
        "level": F.element_at(level_map, F.regexp_extract(col, GLOG_RX, 1)),
        "month": F.regexp_extract(col, GLOG_RX, 2).try_cast("int"),
        "day": F.regexp_extract(col, GLOG_RX, 3).try_cast("int"),
        "time": F.regexp_extract(col, GLOG_RX, 4),
        "pid": F.regexp_extract(col, GLOG_RX, 6).try_cast("long"),
        "file": F.regexp_extract(col, GLOG_RX, 7),
        "line": F.regexp_extract(col, GLOG_RX, 8).try_cast("long"),
        "message": F.regexp_extract(col, GLOG_RX, 9),
    }


NGINX_ERROR_RX = r"^(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) \[(\w+)\] (\d+)#(\d+): (?:\*(\d+) )?(.*)$"


def parse_nginx_error_log(col: Column) -> dict[str, Column]:
    """VRL parse_nginx_log (error format): '2026/08/17 10:00:00 [error]
    1234#0: *5 message'."""
    return {
        "timestamp": F.try_to_timestamp(F.regexp_extract(col, NGINX_ERROR_RX, 1), F.lit("yyyy/MM/dd HH:mm:ss")),
        "severity": F.regexp_extract(col, NGINX_ERROR_RX, 2),
        "pid": F.regexp_extract(col, NGINX_ERROR_RX, 3).try_cast("long"),
        "tid": F.regexp_extract(col, NGINX_ERROR_RX, 4).try_cast("long"),
        "cid": F.regexp_extract(col, NGINX_ERROR_RX, 5).try_cast("long"),
        "message": F.regexp_extract(col, NGINX_ERROR_RX, 6),
    }


_VPC_FLOW_FIELDS = [
    ("version", "int"), ("account_id", "string"), ("interface_id", "string"),
    ("srcaddr", "string"), ("dstaddr", "string"), ("srcport", "int"),
    ("dstport", "int"), ("protocol", "int"), ("packets", "long"),
    ("bytes", "long"), ("start", "long"), ("end", "long"),
    ("action", "string"), ("log_status", "string"),
]


def parse_aws_vpc_flow_log(col: Column) -> dict[str, Column]:
    """VRL parse_aws_vpc_flow_log: 14 space-separated fields, '-' = null."""
    parts = F.split(col, " ")
    out = {}
    for i, (name, typ) in enumerate(_VPC_FLOW_FIELDS):
        c = F.get(parts, i)
        c = F.when(c == "-", F.lit(None)).otherwise(c)
        out[name] = c.try_cast(typ) if typ != "string" else c
    return out


KLOG_RX = r"^\s*(\w)((\d{2})\d{2} \d{2}:\d{2}:\d{2}\.\d{6})\s+(\d+) (.+):(\d+)\]\s(.*?)\s*$"
_KLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def parse_klog(col: Column, year: int = 2026) -> dict[str, Column]:
    """VRL parse_klog (lib/vrl/stdlib/src/parse_klog.rs:8-21, 72-130):
    'I0505 17:59:40.692994  28133 klog.go:70] msg' → level (mapped
    I/W/E/F → info/warning/error/fatal), timestamp (MMDD + time, year
    resolved externally — the reference guesses from the current date;
    we take it as an argument for determinism), id, file, line, message.
    Single regex pass via regex_extract_named."""
    from vector_spark.functions.grok import regex_extract_named

    raw = regex_extract_named(
        col,
        KLOG_RX,
        [("level_c", None), ("mmdd_time", None), ("month", None),
         ("id", "long"), ("file", None), ("line", "long"), ("message", None)],
    )
    level_map = F.create_map(*[F.lit(x) for kv in _KLOG_LEVELS.items() for x in kv])
    ts = F.try_to_timestamp(
        F.concat(F.lit(str(year)), raw["mmdd_time"]), F.lit("yyyyMMdd HH:mm:ss.SSSSSS")
    )
    return {
        "level": F.element_at(level_map, raw["level_c"]),
        "timestamp": ts,
        "id": raw["id"],
        "file": raw["file"],
        "line": raw["line"],
        "message": F.coalesce(raw["message"], F.when(col.rlike(KLOG_RX), F.lit(""))),
    }


LINUX_AUTH_RX = (
    r"^([A-Z][a-z]{2}) +(\d{1,2}) (\d{2}:\d{2}:\d{2}) (\S+) ([^:\[\s]+)(?:\[(\d+)\])?: (.*)$"
)


def parse_linux_authorization(col: Column, year: int = 2026) -> dict[str, Column]:
    """VRL parse_linux_authorization (parse_linux_authorization.rs:20-31)
    = parse_syslog over RFC3164 auth lines: 'Mar 23 01:49:58 host
    sshd[1111]: message' → timestamp, hostname, appname, procid,
    message. Year is not in the line; taken as an argument."""
    from vector_spark.functions.grok import regex_extract_named

    raw = regex_extract_named(
        col,
        LINUX_AUTH_RX,
        [("mon", None), ("day", None), ("time", None), ("hostname", None),
         ("appname", None), ("procid", "long"), ("message", None)],
    )
    ts = F.try_to_timestamp(
        F.concat_ws(" ", F.lit(str(year)), raw["mon"], F.lpad(raw["day"], 2, "0"), raw["time"]),
        F.lit("yyyy MMM dd HH:mm:ss"),
    )
    return {
        "timestamp": ts,
        "hostname": raw["hostname"],
        "appname": raw["appname"],
        "procid": raw["procid"],
        "message": raw["message"],
    }


_ALB_FIELDS = [
    ("type", None), ("timestamp", None), ("elb", None),
    ("client_host", None), ("target_host", None),
    ("request_processing_time", "double"), ("target_processing_time", "double"),
    ("response_processing_time", "double"),
    ("elb_status_code", None), ("target_status_code", None),
    ("received_bytes", "long"), ("sent_bytes", "long"),
    ("request_method", None), ("request_url", None), ("request_protocol", None),
    ("user_agent", None), ("ssl_cipher", None), ("ssl_protocol", None),
    ("target_group_arn", None), ("trace_id", None),
]

ALB_RX = (
    r"^([a-z0-9]+) (\S+) (\S+) (\S+) (\S+) ([0-9.-]+) ([0-9.-]+) ([0-9.-]+) "
    r"([0-9-]+) ([0-9-]+) ([0-9-]+) ([0-9-]+) \"(\S+) (\S+) (\S+)\" "
    r"\"([^\"]*)\" (\S+) (\S+) (\S+) \"([^\"]*)\""
)


def parse_aws_alb_log(col: Column) -> dict[str, Column]:
    """VRL parse_aws_alb_log (parse_aws_alb_log.rs:118-214): the 20
    leading fields of an ALB access log (through trace_id; the tail
    Classic-ALB extension fields are absent from the synthetic corpus).
    '-' fields → NULL, mirroring the reference's '-' handling; request
    is split into method/url/protocol as the reference does. One regex
    pass."""
    from vector_spark.functions.grok import regex_extract_named

    out = regex_extract_named(col, ALB_RX, _ALB_FIELDS)
    for k in ("client_host", "target_host", "elb_status_code", "target_status_code",
              "ssl_cipher", "ssl_protocol", "target_group_arn"):
        out[k] = F.when(out[k] == "-", F.lit(None)).otherwise(out[k])
    out["timestamp"] = F.try_to_timestamp(out["timestamp"])
    return out


# Fast-mode UA heuristics (family-ordered: first match wins, as in
# woothee's classifier chain). Each entry: family, detect regex,
# version-capture regex.
_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/", r"Edg(?:e|A|iOS)?/([0-9.]+)"),
    ("Opera", r"(?:Opera|OPR)[/ ]", r"(?:Opera|OPR)[/ ]([0-9.]+)"),
    ("Firefox", r"Firefox/", r"Firefox/([0-9.]+)"),
    ("Chrome", r"Chrom(?:e|ium)/", r"Chrom(?:e|ium)/([0-9.]+)"),
    ("Safari", r"Version/[0-9.]+.*Safari/", r"Version/([0-9.]+)"),
    ("Internet Explorer", r"MSIE |Trident/", r"(?:MSIE |rv:)([0-9.]+)"),
    ("curl", r"^curl/", r"^curl/([0-9.]+)"),
    ("bot", r"[Bb]ot|[Cc]rawler|[Ss]pider", r"/([0-9.]+)"),
]

_UA_OS = [
    ("Android", r"Android", r"Android ([0-9.]+)"),
    ("iOS", r"iPhone|iPad|iPod", r"OS ([0-9_]+)"),
    ("Windows", r"Windows", r"Windows NT ([0-9.]+)"),
    ("Mac OS X", r"Mac OS X", r"Mac OS X ([0-9_.]+)"),
    ("Linux", r"Linux|X11", None),
]


def parse_user_agent(col: Column) -> dict[str, Column]:
    """VRL parse_user_agent fast mode (parse_user_agent.rs:56-61,
    205-214): {browser{family, version}, device{category}, os{family,
    version}}. The reference wraps the woothee/uap classifier chains;
    this is the same first-match-wins family chain over the dominant
    UA families as pure Column expressions (no per-row Python). Version
    strings keep the reference's raw form ('4_2_1' for iOS stays
    underscore-separated in fast mode's source string)."""
    browser_family, browser_version = F.lit(None).cast("string"), F.lit(None).cast("string")
    for fam, detect, ver in reversed(_UA_BROWSERS):
        hit = col.rlike(detect)
        v = F.regexp_extract(col, ver, 1)
        browser_family = F.when(hit, F.lit(fam)).otherwise(browser_family)
        browser_version = F.when(hit, F.when(v == "", None).otherwise(v)).otherwise(browser_version)
    os_family, os_version = F.lit(None).cast("string"), F.lit(None).cast("string")
    for fam, detect, ver in reversed(_UA_OS):
        hit = col.rlike(detect)
        v = F.regexp_extract(col, ver, 1) if ver else F.lit("")
        os_family = F.when(hit, F.lit(fam)).otherwise(os_family)
        os_version = F.when(hit, F.when(v == "", None).otherwise(v)).otherwise(os_version)
    category = (
        F.when(col.rlike(r"[Bb]ot|[Cc]rawler|[Ss]pider"), "crawler")
        .when(col.rlike(r"iPad|Tablet"), "tablet")
        .when(col.rlike(r"Mobile|iPhone|Android"), "smartphone")
        .when(col.rlike(r"Windows|Macintosh|X11|Linux"), "pc")
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "browser_family": browser_family,
        "browser_version": browser_version,
        "device_category": category,
        "os_family": os_family,
        "os_version": os_version,
    }


def parse_ruby_hash(col: Column, schema: str) -> Column:
    """VRL parse_ruby_hash (parse_ruby_hash.rs): ruby hash literal
    '{ "k" => "v", "n" => 1, "ok" => nil }' → struct. Ruby hash syntax
    is JSON with '=>' arrows and nil — a regex rewrite + from_json
    covers the string-keyed form the reference documents (symbol keys
    are out of scope, as in the reference's examples)."""
    json = F.regexp_replace(col, r"(\"(?:[^\"\\]|\\.)*\")\s*=>", r"$1:")
    json = F.regexp_replace(json, r"\bnil\b", "null")
    return F.from_json(json, schema)


def parse_xml(col: Column, schema: str) -> Column:
    """VRL parse_xml (parse_xml.rs): XML document → nested map. Spark
    4 has a native columnar XML reader — from_xml — so the rebuild is
    the builtin, not a UDF. Attribute fields surface with the reader's
    `_` attributePrefix (VRL uses '@'; rename downstream if needed)."""
    return F.from_xml(col, schema)


NGINX_COMBINED_RX = (
    r'^\s*(\S+) (\S+) - \[([^\]]+)\] "(\w+) (\S+) (\S+)" (\d+) (\d+) '
    r'"([^"]*)" "([^"]*)"(?: "([^"]*)")?\s*$'
)


def parse_nginx_combined_log(col: Column) -> dict[str, Column]:
    """VRL parse_nginx_log format="combined"
    (parse_nginx_log.rs:60-96, log_util.rs REGEX_NGINX_COMBINED_LOG):
    client, user, timestamp, method/path/protocol, status, size,
    referer, agent, optional compression. '-' fields → NULL. One regex
    pass (regex_extract_named)."""
    from vector_spark.functions.grok import regex_extract_named

    out = regex_extract_named(
        col,
        NGINX_COMBINED_RX,
        [("client", None), ("user", None), ("timestamp_raw", None),
         ("method", None), ("path", None), ("protocol", None),
         ("status", "long"), ("size", "long"),
         ("referer", None), ("agent", None), ("compression", None)],
    )
    for k in ("client", "user", "referer", "agent", "compression"):
        out[k] = F.when(out[k] == "-", F.lit(None)).otherwise(out[k])
    out["timestamp"] = F.try_to_timestamp(
        out.pop("timestamp_raw"), F.lit("dd/MMM/yyyy:HH:mm:ss Z")
    )
    return out
