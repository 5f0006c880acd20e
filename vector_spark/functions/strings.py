"""VRL string/number/type/crypto functions → Spark Column expressions.

Grouped mapping from SURVEY.md §2.4 (registry
/root/reference/lib/vrl/stdlib/src/lib.rs:490+). Everything here is a
built-in-function composition — JVM-side, codegen'd.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under postponed annotations
from pyspark.sql import Column
from pyspark.sql import functions as F

ANSI_ESCAPE_RX = r"\x1b\[[0-9;]*[A-Za-z]|\x1b\].*?(?:\x07|\x1b\\)|\x1b[@-Z\\-_]"

# ---- string ----------------------------------------------------------


def downcase(col: Column) -> Column:
    return F.lower(col)


def upcase(col: Column) -> Column:
    return F.upper(col)


def truncate(col: Column, limit: int, ellipsis: bool = False) -> Column:
    """VRL truncate(value, limit, ellipsis): cut to limit chars."""
    cut = F.substring(col, 1, limit)
    if not ellipsis:
        return cut
    return F.when(F.length(col) > limit, F.concat(cut, F.lit("..."))).otherwise(col)


def slice_(col: Column, start: int, end: int | None = None) -> Column:
    """VRL slice(value, start, end) — 0-based, end exclusive (vs SQL's
    1-based substring)."""
    length = (end - start) if end is not None else (1 << 30)
    return F.substring(col, start + 1, length)


def replace(col: Column, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(col, pattern, replacement)


def strip_whitespace(col: Column) -> Column:
    return F.trim(col)


def strip_ansi_escape_codes(col: Column) -> Column:
    """VRL strip_ansi_escape_codes / the ansi_stripper transform
    (/root/reference/src/transforms/ansi_stripper.rs:12-56). The
    reference delegates to the vte-based strip_ansi_escapes crate, whose
    terminal emulation also swallows C0 control bytes (everything
    reaching `execute` except linefeed) — so \\r, \\t etc. are stripped
    too, which the ansi_stripper behavior test depends on."""
    return F.regexp_replace(
        F.regexp_replace(col, ANSI_ESCAPE_RX, ""),
        r"[\x00-\x09\x0b-\x1f\x7f]", "")


def redact(col: Column, patterns: list[str], text: str = "[REDACTED]") -> Column:
    """VRL redact: replace every match of every pattern."""
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, text)
    return out


def match_(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


def find(col: Column, substr: str) -> Column:
    """VRL find → 0-based index or -1."""
    return F.locate(substr, col) - 1


def join_(col: Column, sep: str) -> Column:
    return F.array_join(col, sep)


def split_(col: Column, pattern: str, limit: int = -1) -> Column:
    return F.split(col, pattern, limit)


# ---- number / math ----------------------------------------------------


def ceil_(col: Column, precision: int = 0) -> Column:
    return F.ceil(col * (10**precision)) / (10**precision) if precision else F.ceil(col)


def floor_(col: Column, precision: int = 0) -> Column:
    return F.floor(col * (10**precision)) / (10**precision) if precision else F.floor(col)


def round_(col: Column, precision: int = 0) -> Column:
    return F.round(col, precision)


def format_number(col: Column, scale: int = 0) -> Column:
    return F.format_number(col, scale)


def format_timestamp(col: Column, fmt: str) -> Column:
    """VRL format_timestamp (strftime) — callers pass Java patterns."""
    return F.date_format(col, fmt)


def log_(col: Column, base: float | None = None) -> Column:
    return F.log(base, col) if base else F.log(col)


# ---- type conversions (VRL to_* are fallible → try_cast/null) ----------


def to_bool(col: Column) -> Column:
    """VRL to_bool: "true"/"t"/"yes"/"y"/"1" → true (conversion.rs:22-30)."""
    lowered = F.lower(col.cast("string"))
    return (
        F.when(lowered.isin("true", "t", "yes", "y", "1"), F.lit(True))
        .when(lowered.isin("false", "f", "no", "n", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def to_int(col: Column) -> Column:
    return col.try_cast("long")


def to_float(col: Column) -> Column:
    return col.try_cast("double")


def to_string(col: Column) -> Column:
    return col.cast("string")


def to_timestamp(col: Column) -> Column:
    return F.try_to_timestamp(col.cast("string"))


def to_unix_timestamp(col: Column) -> Column:
    return F.unix_timestamp(col)


def is_nullish(col: Column) -> Column:
    """VRL is_nullish: null, empty string, '-', or whitespace-only."""
    s = col.cast("string")
    return col.isNull() | (F.trim(s) == "") | (s == "-")


# ---- crypto / id ------------------------------------------------------


def md5_(col: Column) -> Column:
    return F.md5(col.cast("string"))


def sha1_(col: Column) -> Column:
    return F.sha1(col.cast("string"))


def sha2_(col: Column, bits: int = 256) -> Column:
    return F.sha2(col.cast("string"), bits)


def uuid_v4() -> Column:
    """Non-deterministic by definition — do not use in oracle-checked paths."""
    return F.expr("uuid()")


# ---- array ------------------------------------------------------------


def append(col: Column, items: Column) -> Column:
    return F.concat(col, items)


def push(col: Column, item) -> Column:
    return F.concat(col, F.array(F.lit(item)))


def includes(col: Column, item) -> Column:
    return F.array_contains(col, item)


def unique(col: Column) -> Column:
    return F.array_distinct(col)


def tally(col: Column) -> Column:
    """VRL tally: array → map<value, count>. Pure expression via
    aggregate over the distinct values."""
    return F.map_from_arrays(
        F.array_distinct(col),
        F.transform(F.array_distinct(col), lambda v: F.size(F.filter(col, lambda x: x == v))),
    )


def compact(col: Column) -> Column:
    """VRL compact on arrays: drop nulls/empties."""
    return F.filter(col, lambda x: x.isNotNull() & (x.cast("string") != ""))


def flatten_(col: Column) -> Column:
    return F.flatten(col)


# ---------------------------------------------------------------- encode group


def encode_base64(col: Column) -> Column:
    """VRL encode_base64 — RFC 4648, no wrapping. Spark's base64 can
    emit MIME \r\n chunking (legacy.chunkBase64String); strip it so
    output is canonical regardless of session config."""
    return F.regexp_replace(F.base64(col.cast("binary")), "\r\n", "")


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_json_obj(cols: dict[str, Column]) -> Column:
    """VRL encode_json over a flat object."""
    return F.to_json(F.struct(*[c.alias(k) for k, c in cols.items()]))


def encode_logfmt(cols: dict[str, Column]) -> Column:
    """VRL encode_logfmt: 'k=v k2=v2' in given key order."""
    parts = [F.concat(F.lit(f"{k}="), c.cast("string")) for k, c in cols.items()]
    return F.concat_ws(" ", *parts)


def sha3_(col: Column, bits: int = 256):
    """VRL sha3 — no Spark builtin, so this is the documented UDF slow
    path: an Arrow-batched pandas UDF over hashlib (still columnar
    transfer, never row-at-a-time Python)."""
    import hashlib

    import pandas as pd

    fn = {224: hashlib.sha3_224, 256: hashlib.sha3_256, 384: hashlib.sha3_384, 512: hashlib.sha3_512}[bits]

    @F.pandas_udf("string")
    def _sha3(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None else fn(x.encode()).hexdigest())

    return _sha3(col)


# Percent-encode sets (lib/vrl/stdlib/src/encode_percent.rs:4-44, the
# WHATWG URL-spec sets). Each regex matches one ASCII char that the set
# REQUIRES encoding; non-ASCII is always encoded (utf8_percent_encode
# operates per UTF-8 byte).
_PERCENT_SETS = {
    "NON_ALPHANUMERIC": r"[^A-Za-z0-9]",
    "CONTROLS": r"[\x00-\x1f\x7f]",
    "FRAGMENT": "[\\x00-\\x1f\\x7f \"<>`]",
    "QUERY": "[\\x00-\\x1f\\x7f \"#<>]",
    "SPECIAL": "[\\x00-\\x1f\\x7f \"#<>']",
    "PATH": "[\\x00-\\x1f\\x7f \"#<>?`{}]",
    "USERINFO": "[\\x00-\\x1f\\x7f \"#<>?`{}/:;=@\\[\\\\\\]^|]",
    "COMPONENT": "[\\x00-\\x1f\\x7f \"#<>?`{}/:;=@\\[\\\\\\]^|$%&+,]",
    "WWW_FORM_URLENCODED": "[\\x00-\\x1f\\x7f \"#<>?`{}/:;=@\\[\\\\\\]^|$%&+,!'()~]",
}


def encode_percent(col: Column, ascii_set: str = "NON_ALPHANUMERIC") -> Column:
    """VRL encode_percent (encode_percent.rs): percent-encode chars in
    the chosen WHATWG set (uppercase hex, UTF-8 bytes for non-ASCII).
    Pure expressions: explode to chars (split on ''), per-char hex via
    hex(encode(c)), '%' inserted every byte pair — no Python UDF."""
    set_rx = _PERCENT_SETS[ascii_set]
    chars = F.split(col, "")
    def enc(c: Column) -> Column:
        needs = c.rlike(set_rx) | ~c.rlike("^[\\x00-\\x7f]$")
        return F.when(
            needs, F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", r"%$1")
        ).otherwise(c)
    return F.when(col.isNotNull(), F.concat_ws("", F.transform(chars, enc)))


def decode_percent(col: Column) -> Column:
    """VRL decode_percent: %XX → bytes. Spark's url_decode also maps
    '+' → space (form decoding), which VRL does NOT — protect '+' as
    %2B first so it round-trips verbatim."""
    return F.url_decode(F.regexp_replace(col, r"\+", "%2B"))


def format_int(col: Column, base: int = 10) -> Column:
    """VRL format_int: integer → string in `base` (format_int.rs).
    conv() uppercases digits >9; VRL emits lowercase — normalize."""
    if base == 10:
        return col.cast("string")
    return F.lower(F.conv(col.cast("string"), 10, base))


# Syslog numeric code maps (to_syslog_facility.rs:57-84,
# to_syslog_level.rs:57-67, to_syslog_severity.rs reverse direction).
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]
_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]


def to_syslog_facility(col: Column) -> Column:
    """facility code int → keyword; invalid → NULL (VRL errors)."""
    m = F.create_map(*[F.lit(x) for i, n in enumerate(_SYSLOG_FACILITIES) for x in (i, n)])
    return F.element_at(m, col.cast("int"))


def to_syslog_level(col: Column) -> Column:
    """severity code int → level keyword; invalid → NULL."""
    m = F.create_map(*[F.lit(x) for i, n in enumerate(_SYSLOG_LEVELS) for x in (i, n)])
    return F.element_at(m, col.cast("int"))


def to_syslog_severity(col: Column) -> Column:
    """level keyword → severity code int; unknown → NULL (reverse map)."""
    m = F.create_map(*[F.lit(x) for i, n in enumerate(_SYSLOG_LEVELS) for x in (n, i)])
    return F.element_at(m, F.lower(col))


def match_any(col: Column, patterns: list[str]) -> Column:
    """VRL match_any: true if ANY pattern matches (match_any.rs)."""
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def match_array(col: Column, pattern: str, all_: bool = False) -> Column:
    """VRL match_array: does any (or every) element match (match_array.rs)."""
    if all_:
        return F.forall(col, lambda x: x.rlike(pattern))
    return F.exists(col, lambda x: x.rlike(pattern))


def assert_(cond: Column, message: str) -> Column:
    """VRL assert!: raise on false (assert.rs) — Spark raise_error."""
    return F.when(cond, F.lit(True)).otherwise(F.raise_error(F.lit(message)))


def get_env_var(name: str) -> Column:
    """VRL get_env_var — resolved DRIVER-side at plan time (the job's
    env, matching the reference's process env; executors may differ)."""
    import os

    return F.lit(os.environ.get(name))


def get_hostname() -> Column:
    """VRL get_hostname — driver hostname at plan time."""
    import socket

    return F.lit(socket.gethostname())


def now_() -> Column:
    """VRL now() → current_timestamp (query-constant, as in VRL where
    now() is fixed per event resolution)."""
    return F.current_timestamp()


def encode_key_value(
    cols: dict[str, Column], field_delimiter: str = " ", key_value_delimiter: str = "="
) -> Column:
    """VRL encode_key_value (encode_key_value.rs) — encode_logfmt with
    configurable delimiters."""
    parts = [
        F.concat(F.lit(k), F.lit(key_value_delimiter), c.cast("string"))
        for k, c in cols.items()
    ]
    return F.concat_ws(field_delimiter, *parts)
