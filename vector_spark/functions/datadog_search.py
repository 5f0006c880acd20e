"""Datadog search syntax → Spark Column predicate.

Rebuilds the `datadog_search` condition
(/root/reference/src/conditions/datadog_search.rs, AST:
/root/reference/lib/datadog/search-syntax/src/node.rs:136-174) as a
compile-to-Column front-end: the query string is parsed ONCE at plan
time and becomes an ordinary boolean expression — codegen'd, pushdown-
eligible, zero per-row interpretation.

Supported grammar (the QueryNode variants):
    *                     match all          -q / NOT q      negation
    a AND b / a OR b      boolean            (...)           grouping
    attr:value            term equality      attr:"a phrase" quoted term
    attr:pre*             wildcard (any *)   bare-word       default-field contains
    attr:>n >=n <n <=n    comparison         attr:[a TO b]   inclusive range
    attr:{a TO b}         exclusive range    _exists_:attr   non-null
    _missing_:attr        null
Facet names keep Datadog's `@` stripped (`@http.status` → column
`http.status`); adjacency without an operator is AND, as in Datadog.

Out of scope (documented): Datadog tag-vs-facet distinction (we have
one flat column namespace) and the `match_datadog_query` VRL wrapper's
per-event type coercions beyond string/number comparison.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_FIELD = "message"

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
        (?P<neg>-) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<lbrack>[\[{]) | (?P<rbrack>[\]}]) |
        (?P<to>TO\b) |
        (?P<colon>:) |
        (?P<term>[^\s():\[\]{}"]+)
    )""",
    re.X,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(q: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if not m or m.end() == pos:
            raise ValueError(f"datadog query: cannot tokenize at {q[pos:]!r}")
        pos = m.end()
        for kind, text in m.groupdict().items():
            if text is not None:
                out.append(_Tok(kind, text))
                break
    return out


class _Parser:
    def __init__(self, toks: list[_Tok], resolve=None):
        self.toks, self.i = toks, 0
        # field-name → Column hook; defaults to the event's real columns.
        # match_datadog_query() passes one bound to the VRL environment so
        # the query reads the event's CURRENT state, not the input columns.
        self.resolve = resolve if resolve is not None else F.col

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    # expr := andexpr (OR andexpr)*
    def expr(self) -> Column:
        left = self.andexpr()
        while (t := self.peek()) and t.kind == "or":
            self.next()
            left = left | self.andexpr()
        return left

    # andexpr := unary ((AND)? unary)*   — adjacency is AND
    def andexpr(self) -> Column:
        left = self.unary()
        while (t := self.peek()) and t.kind not in ("or", "rparen"):
            if t.kind == "and":
                self.next()
            left = left & self.unary()
        return left

    def unary(self) -> Column:
        t = self.peek()
        if t and t.kind in ("neg", "not"):
            self.next()
            return ~self.unary()
        if t and t.kind == "lparen":
            self.next()
            inner = self.expr()
            if not (self.peek() and self.peek().kind == "rparen"):
                raise ValueError("datadog query: unbalanced parens")
            self.next()
            return inner
        return self.primary()

    def primary(self) -> Column:
        t = self.next()
        if t.kind == "quoted":
            return _contains(self.resolve(DEFAULT_FIELD), _unquote(t.text))
        if t.kind != "term":
            raise ValueError(f"datadog query: unexpected token {t.text!r}")
        word = t.text
        nxt = self.peek()
        if not (nxt and nxt.kind == "colon"):
            if word == "*":
                return F.lit(True)
            return _contains(self.resolve(DEFAULT_FIELD), word)
        self.next()  # consume ':'
        attr = word.lstrip("@")
        if word == "_exists_":
            return self.resolve(self.next().text.lstrip("@")).isNotNull()
        if word == "_missing_":
            return self.resolve(self.next().text.lstrip("@")).isNull()
        return self.value_clause(self.resolve(attr))

    def value_clause(self, col: Column) -> Column:
        t = self.next()
        if t.kind == "quoted":
            return col == _unquote(t.text)
        if t.kind == "lbrack":  # range: [a TO b] or {a TO b}
            lo_inc = t.text == "["
            lo = self.next().text
            to = self.next()
            if to.kind != "to":
                raise ValueError("datadog query: range needs TO")
            hi = self.next().text
            close = self.next()
            hi_inc = close.text == "]"
            out = F.lit(True)
            if lo != "*":
                out = out & (col >= _coerce(lo) if lo_inc else col > _coerce(lo))
            if hi != "*":
                out = out & (col <= _coerce(hi) if hi_inc else col < _coerce(hi))
            return out
        if t.kind != "term":
            raise ValueError(f"datadog query: bad value {t.text!r}")
        v = t.text
        for op, fn in ((">=", "__ge__"), ("<=", "__le__"), (">", "__gt__"), ("<", "__lt__")):
            if v.startswith(op):
                return getattr(col, fn)(_coerce(v[len(op):]))
        if v == "*":
            return col.isNotNull()
        if "*" in v:
            # wildcard → LIKE (escape %/_ first)
            like = v.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_").replace("*", "%")
            return col.like(like)
        return col.cast("string") == v


def _unquote(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s[1:-1])


def _coerce(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _contains(col: Column, needle: str) -> Column:
    return F.coalesce(col.contains(needle), F.lit(False))


def datadog_search(query: str, resolve=None) -> Column:
    """Compile a Datadog search query to a boolean Column. `resolve`
    maps a field name to a Column (default: the DataFrame column of
    that name)."""
    toks = _tokenize(query)
    if not toks:
        return F.lit(True)
    p = _Parser(toks, resolve)
    out = p.expr()
    if p.peek() is not None:
        raise ValueError(f"datadog query: trailing input at {p.peek().text!r}")
    return out
