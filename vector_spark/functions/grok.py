"""Grok → regex expansion (the `grok_parser` transform's macro layer).

Vector's grok_parser (/root/reference/src/transforms/grok_parser.rs:25-32,
107-148) and the VRL `parse_grok` function
(/root/reference/lib/vrl/stdlib/src/parse_grok.rs:49-66) match a grok
pattern against a field and insert the named captures as typed fields.
Grok itself is only a macro layer over regex, so the Spark-first design
expands the pattern ONCE at plan-build time into a plain Java regex and
then extracts every capture with codegen'd ``regexp_extract`` — no
per-row Python, no grok library at runtime.

Every base pattern below uses only NON-capturing groups ``(?:...)`` so
that after expansion the k-th ``%{X:name}`` is exactly the k-th capturing
group — regexp_extract(col, rx, k) then addresses it positionally.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Core grok pattern library (the subset of logstash-patterns/grok-patterns
# that Vector's docs exercise). Non-capturing groups only.
BASE_PATTERNS: dict[str, str] = {
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "QS": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f:.]{2,45})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"(?:[a-zA-Z0-9_.+-=:]+@[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+)",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|"
        r"[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
        r"[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH": (
        r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|"
        r"[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|"
        r"[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b"
    ),
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{ISO8601_TIMEZONE}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG}(?:\[%{POSINT}\])?",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    # Composite: apache common log (fields bound when used bare via COMMONAPACHELOG below)
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")

GROK_TYPES = {"int": "long", "long": "long", "float": "double", "double": "double", "bool": "boolean"}


def expand(pattern: str, patterns: dict[str, str] | None = None) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand a grok pattern into (java_regex, [(capture_name, type), ...]).

    Named references ``%{SYNTAX:name[:type]}`` become capturing groups in
    order of appearance; bare ``%{SYNTAX}`` expands inline without
    capturing. Expansion is recursive with a depth guard.
    """
    lib = dict(BASE_PATTERNS)
    if patterns:
        lib.update(patterns)
    captures: list[tuple[str, str | None]] = []

    def _expand(p: str, depth: int) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep")

        def sub(m: re.Match) -> str:
            syntax, name, typ = m.group(1), m.group(2), m.group(3)
            if syntax not in lib:
                raise KeyError(f"unknown grok pattern %{{{syntax}}}")
            # The outer capture's group opens BEFORE any groups inside its
            # body, so it must be appended before recursing — Java numbers
            # groups by position of the opening paren. (Appending after
            # recursion misaligns every capture when a user library nests
            # named refs, e.g. {"PAIR": "%{WORD:k}=%{WORD:v}"} as %{PAIR:p}.)
            if name:
                captures.append((name, typ))
                body = _expand(lib[syntax], depth + 1)
                return f"({body})"
            body = _expand(lib[syntax], depth + 1)
            return f"(?:{body})"

        return _GROK_REF.sub(sub, p)

    return _expand(pattern, 0), captures


# Field separator for single-pass multi-capture extraction. ASCII unit
# separator — never present in sane log lines; a capture containing it
# would shift subsequent fields (documented contract, same caveat as any
# delimiter-encoded interchange).
_SEP = "\x1f"
# ASCII STX: marks "the anchored replace fired" (see regex_extract_named)
_SENTINEL = "\x02"


def regex_extract_named(
    col: Column, rx: str, fields: list[tuple[str, str | None]]
) -> dict[str, Column]:
    """Single-pass multi-group extraction: run `rx` ONCE per row
    (anchored regexp_replace into a ␟-joined capture string + one
    split) and return {name: Column} for each capturing group in
    order. `fields` = [(name, spark_type|None), ...], one per group.
    Non-matching rows and non-participating/empty groups → NULL.
    Assumes single-line input (see grok_extract docstring)."""
    n = len(fields)
    repl = _SEP.join(f"${i}" for i in range(1, n + 1))
    # Match detection WITHOUT a per-column rlike: the replacement is
    # prefixed with a sentinel (ASCII STX), so a row where the anchored
    # replace fired starts with it and a non-matching row (left
    # unchanged) does not. Crucially the whole guard lives INSIDE the
    # one shared `parts` subtree — wrapping each output column in
    # when(col.rlike(rx), ...) instead puts the extraction in a
    # conditional branch, which Spark's subexpression elimination
    # refuses to share, re-running the full regex once PER CAPTURE
    # (measured 6× slower on the 9-capture apache pattern).
    marked = F.regexp_replace(col, f"^(?:.*?)(?:{rx})(?:.*)$", _SENTINEL + repl)
    arr = F.split(marked, _SEP, -1)
    first = F.try_element_at(arr, F.lit(1))
    # Both validity conjuncts reference `arr` from a PREDICATE position
    # (always evaluated), so subexpression elimination shares the one
    # regexp_replace+split across every output column; the when()
    # branches below only carry per-column try_element_at/substring.
    # A pathological non-matching line that starts with the sentinel
    # byte also has to contain exactly n-1 ␟ bytes to slip through.
    matched = (F.size(arr) == n) & first.startswith(_SENTINEL)
    out: dict[str, Column] = {}
    for idx, (name, typ) in enumerate(fields, start=1):
        v = (
            F.substring(first, 2, (1 << 30))
            if idx == 1
            else F.try_element_at(arr, F.lit(idx))
        )
        c = F.when(matched & (v != ""), v)
        if typ:
            c = c.try_cast(typ)
        out[name] = c
    return out


def grok_extract(col: Column, pattern: str, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Compile a grok pattern and return {capture_name: Column} extractors.

    Single-pass plan: the expanded regex runs ONCE per row via
    ``regexp_replace(col, '^.*?(?:rx).*$', '$1␟$2␟…')`` and the captures
    come out of one ``split`` — versus one full regex execution per
    capture with per-group ``regexp_extract`` (a 9-capture apache
    pattern would otherwise run the regex 10× per row). A non-matching
    row leaves the anchored replace a no-op; the ``rlike`` guard nulls
    every capture there, mirroring Vector's "no match → field absent"
    semantics (grok_parser.rs:117-141). A non-participating optional
    group substitutes '' which we normalize to NULL. Typed captures are
    try_cast so a bad value nulls out instead of failing the task.

    The wrapper anchors assume single-line events (no DOTALL): a match
    that only exists past an embedded newline nulls out rather than
    extracting — Vector's log events are single-line by the time they
    reach grok (multi-line assembly happens in the `merge` transform).
    """
    rx, captures = expand(pattern, patterns)
    fields = [(name, GROK_TYPES.get(typ)) for name, typ in captures]
    return regex_extract_named(col, rx, fields)


def grok_matches(col: Column, pattern: str, patterns: dict[str, str] | None = None) -> Column:
    """Boolean Column: does the grok pattern match anywhere in col."""
    rx, _ = expand(pattern, patterns)
    return col.rlike(rx)
