"""VRL parser: tokens → AST.

Statement/expression grammar follows the reference
(/root/reference/lib/vrl/parser/src/parser.lalrpop via ast.rs:651-667
for the operator set): programs are newline/;-separated statements;
assignments take one target or an `ok, err` pair; `if`/`else if`/`else`
blocks; `abort`; everything else is an expression. `??` (error
coalescing) binds loosest, then `||`, `&&`, equality, comparison,
additive, multiplicative/merge, unary, postfix path/call.

A VRL *condition* is just a program whose value is its final
expression (src/conditions/vrl.rs) — which is why a two-line condition
in the reference behavior TOMLs only effectively checks its last line.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from vector_spark.vrl.lexer import Token, VrlSyntaxError, tokenize

# identifiers reserved for future language use (lex.rs:430-436);
# rejected as VARIABLE names, still valid as path segments
RESERVED = frozenset(
    "array bool boolean break continue do emit float for forall foreach all "
    "each any try undefined int integer iter object regex return string "
    "traverse timestamp duration unless walk while loop".split())


# --------------------------------------------------------------- AST
@dataclass(frozen=True)
class Lit:
    value: object
    kind: str  # int float string bool null regex timestamp


@dataclass(frozen=True)
class Arr:
    items: tuple


@dataclass(frozen=True)
class Obj:
    pairs: tuple  # ((key, expr), ...)


@dataclass(frozen=True)
class Alt:
    """A coalesced path segment `.(foo | bar)` — the first side that
    resolves wins (parser.lalrpop PathSegment::Coalesce)."""

    options: tuple  # str alternatives


@dataclass(frozen=True)
class Block:
    """A block/group in expression position: statements run in order,
    the value is the last statement's value (ast.rs Block)."""

    stmts: tuple


@dataclass(frozen=True)
class Path:
    segments: tuple  # str | int | Alt; () == the event root "."


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Call:
    name: str
    args: tuple  # ((name|None, expr), ...)
    bang: bool
    start: int = 0
    end: int = 0


@dataclass(frozen=True)
class Member:
    base: object
    segments: tuple  # path query applied to a non-root expression


@dataclass(frozen=True)
class Bin:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class Un:
    op: str
    expr: object


@dataclass(frozen=True)
class Assign:
    target: object  # Path | Var | Member(Var, segs)
    err_target: object | None  # Path | Var | None
    expr: object
    merge: bool = False  # came from `|=` (E652 diagnostics)


@dataclass(frozen=True)
class If:
    clauses: tuple  # ((cond, block), ...)
    otherwise: tuple | None  # block


@dataclass(frozen=True)
class IfExpr:
    """`if` in EXPRESSION position (ast.rs: IfStatement is an expression;
    e.g. `x = if .a { .b } else { .c }`). Same surface grammar as If;
    split at parse time because the compiler gives blocks VALUE semantics
    here (block value = its final expression) instead of running them as
    conditional side effects."""

    clauses: tuple  # ((cond, block), ...)
    otherwise: tuple | None  # block


@dataclass(frozen=True)
class Abort:
    pass


@dataclass
class Program:
    stmts: list = field(default_factory=list)


# ------------------------------------------------------------ parser
class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in ops

    def expect_op(self, op: str) -> Token:
        t = self.peek()
        if not (t.kind == "OP" and t.value == op):
            raise VrlSyntaxError(f"expected {op!r}, got {t.value!r}", t.pos, self.src)
        return self.next()

    def skip_nl(self):
        while self.peek().kind == "NEWLINE":
            self.next()

    # -- program / statements
    def parse_program(self) -> Program:
        prog = Program()
        self.skip_nl()
        while self.peek().kind != "EOF":
            prog.stmts.append(self.parse_stmt())
            self._end_stmt()
        return prog

    def _end_stmt(self):
        t = self.peek()
        if t.kind == "NEWLINE" or (t.kind == "OP" and t.value == ";"):
            self.next()
            self.skip_nl()
        elif t.kind not in ("EOF",) and not self.at_op("}"):
            raise VrlSyntaxError(f"expected end of statement, got {t.value!r}", t.pos, self.src)

    def parse_block(self) -> list:
        self.expect_op("{")
        self.skip_nl()
        stmts = []
        while not self.at_op("}"):
            if self.peek().kind == "EOF":
                raise VrlSyntaxError("unterminated block", self.peek().pos, self.src)
            stmts.append(self.parse_stmt())
            self.skip_nl()
            if self.at_op(";"):
                self.next()
                self.skip_nl()
        self.expect_op("}")
        return stmts

    def parse_stmt(self):
        t = self.peek()
        if t.kind == "IDENT" and t.value == "if":
            return self.parse_if()
        if t.kind == "IDENT" and t.value == "abort":
            self.next()
            return Abort()
        # try assignment (backtracking: targets are a strict subset of exprs)
        save = self.i
        asn = self._try_assignment()
        if asn is not None:
            return asn
        self.i = save
        return self.parse_expr()

    def _try_assignment(self):
        try:
            tgt = self._parse_target()
            err_tgt = None
            if self.at_op(","):
                self.next()
                self.skip_nl()
                err_tgt = self._parse_target()
            if not (self.at_op("=") or self.at_op("|=")):
                return None
            op = self.next().value
            self.skip_nl()
            expr = self.parse_expr()
            if op == "|=":
                # `tgt |= expr` desugars to `tgt = tgt | expr`
                # (parser.lalrpop AssignmentOp::Merge)
                return Assign(tgt, err_tgt,
                              Bin("|", self._target_as_expr(tgt), expr),
                              merge=True)
            return Assign(tgt, err_tgt, expr)
        except VrlSyntaxError as e:
            if e.code is not None:  # coded diagnostics are fatal, not backtracking
                raise
            return None

    @staticmethod
    def _target_as_expr(tgt):
        if isinstance(tgt, Member):
            return tgt
        return tgt  # Path and Var are already valid expressions

    def _parse_target(self):
        t = self.peek()
        if t.kind == "DOT":
            return self._parse_path()
        if t.kind == "IDENT" and t.value not in ("if", "else", "true", "false", "null", "abort"):
            nxt = self.peek(1)
            if nxt.kind == "OP" and nxt.value in (",", "=", "|="):
                if t.value in RESERVED:
                    raise VrlSyntaxError(
                        f"reserved keyword {t.value!r} can't name a variable",
                        t.pos, self.src, code="E205")
                if t.value.startswith("@"):
                    # @-fields are path segments, never variables
                    # (lex.rs PathField; diagnostics/syntax_error_ampersat)
                    raise VrlSyntaxError(
                        f"unexpected syntax token: \"PathField\" {t.value!r}",
                        t.pos, self.src, code="E203")
                self.next()
                return Var(t.value)
            # variable target with a path: `foo.bar = 5`, `lines[0] = ""`
            if (nxt.kind == "DOT") or (nxt.kind == "OP" and nxt.value == "["):
                self.next()
                segs = self._path_segments(allow_leading=False)
                if segs and (self.at_op("=") or self.at_op("|=") or self.at_op(",")):
                    return Member(Var(t.value), tuple(segs))
        raise VrlSyntaxError("not a target", t.pos, self.src)

    def parse_if(self) -> If:
        clauses = []
        otherwise = None
        while True:
            self.next()  # 'if'
            cond = self.parse_expr()
            self.skip_nl()
            block = self.parse_block()
            clauses.append((cond, tuple(block)))
            # allow `else` on the same or next line
            save = self.i
            self.skip_nl()
            t = self.peek()
            if t.kind == "IDENT" and t.value == "else":
                self.next()
                self.skip_nl()
                t2 = self.peek()
                if t2.kind == "IDENT" and t2.value == "if":
                    continue
                otherwise = tuple(self.parse_block())
                break
            self.i = save
            break
        return If(tuple(clauses), otherwise)

    # -- expressions (precedence climbing)
    def parse_expr(self):
        return self._coalesce()

    def _bin_level(self, sub, ops: tuple[str, ...]):
        left = sub()
        while self.at_op(*ops):
            op = self.next().value
            self.skip_nl()
            left = Bin(op, left, sub())
        return left

    def _coalesce(self):
        return self._bin_level(self._or, ("??",))

    def _or(self):
        return self._bin_level(self._and, ("||",))

    def _and(self):
        return self._bin_level(self._eq, ("&&",))

    def _eq(self):
        return self._bin_level(self._cmp, ("==", "!="))

    def _cmp(self):
        left = self._merge()
        if self.at_op("<", ">", "<=", ">="):
            t = self.next()
            self.skip_nl()
            left = Bin(t.value, left, self._merge())
            if self.at_op("<", ">", "<=", ">="):
                raise VrlSyntaxError(
                    "comparison operators can't be chained together",
                    self.peek().pos, self.src, code="E650")
        return left

    def _merge(self):
        # `|` (object merge) sits between comparison and additive in the
        # reference grammar (parser.lalrpop:309-317: Compare → Merge → Add)
        return self._bin_level(self._add, ("|",))

    def _add(self):
        return self._bin_level(self._mul, ("+", "-"))

    def _mul(self):
        return self._bin_level(self._unary, ("*", "/", "%"))

    def _unary(self):
        if self.at_op("!"):
            self.next()
            return Un("!", self._unary())
        if self.at_op("-"):
            self.next()
            return Un("-", self._unary())
        return self._postfix()

    def _postfix(self):
        e = self._primary()
        # path query on an arbitrary expression result: f(x).foo[0]
        start = self.i
        if isinstance(e, Path):
            return e
        segs = self._path_segments(allow_leading=False, index_ok=True)
        if segs:
            if isinstance(e, Lit):
                # querying a scalar literal is a parse error in the
                # reference grammar (query/scalar.vrl: 16 syntax errors)
                raise VrlSyntaxError(
                    "syntax error: can't query a scalar literal",
                    self.toks[start].pos, self.src)
            return Member(e, tuple(segs))
        return e

    def _field_segment(self) -> str:
        """One field-name segment after a DOT. Handles quoted segments
        and names the lexer split (digit-led like `0tar`, adjacent
        INT+IDENT tokens rejoin via source offsets)."""
        t = self.peek()
        if t.kind == "STRING":
            return self.next().value
        if t.kind in ("IDENT", "INT", "FLOAT"):
            start = self.next()
            end = start.end
            # greedily absorb tokens glued to this one (no whitespace)
            while self.peek().kind in ("IDENT", "INT") and self.peek().pos == end:
                end = self.next().end
            return self.src[start.pos:end]
        raise VrlSyntaxError("expected path segment", t.pos, self.src)

    def _bracket_index(self) -> int:
        """`[n]` / `[-n]` array index (negatives count from the end,
        issues/5546)."""
        self.expect_op("[")
        neg = False
        if self.at_op("-"):
            self.next()
            neg = True
        t = self.peek()
        if t.kind != "INT":
            raise VrlSyntaxError("expected integer index", t.pos, self.src)
        self.next()
        self.expect_op("]")
        return -int(t.value) if neg else int(t.value)

    def _path_segments(self, allow_leading: bool, index_ok: bool = True) -> list:
        """Read `.seg`, `[idx]`, and `.(a | b)` coalesce segments.
        With allow_leading, the first segment may start without a DOT
        (variable paths: `foo.bar`, `lines[0]`)."""
        segs: list = []
        first = allow_leading
        while True:
            if self.peek().kind == "DOT":
                nxt = self.peek(1)
                if nxt.kind in ("IDENT", "STRING", "INT", "FLOAT"):
                    self.next()
                    segs.append(self._field_segment())
                    continue
                if nxt.kind == "OP" and nxt.value == "(":
                    self.next()
                    segs.append(self._coalesce_group())
                    continue
                # `.foo.` — a dangling separator ends the query
                # (diagnostics/syntax_error_path_segment, E203)
                raise VrlSyntaxError(
                    "unexpected end of query path",
                    nxt.pos, self.src, code="E203")
            if first and self.peek().kind in ("IDENT", "STRING"):
                segs.append(self._field_segment())
                first = False
                continue
            if index_ok and self.at_op("[") and (
                self.peek(1).kind == "INT"
                or (self.peek(1).kind == "OP" and self.peek(1).value == "-"
                    and self.peek(2).kind == "INT")
            ):
                segs.append(self._bracket_index())
                continue
            break
        return segs

    def _coalesce_group(self) -> Alt:
        self.expect_op("(")
        opts = [self._field_segment()]
        while self.at_op("|"):
            self.next()
            self.skip_nl()
            opts.append(self._field_segment())
        self.expect_op(")")
        return Alt(tuple(opts))

    def _parse_path(self) -> Path:
        self.next()  # consume leading DOT
        t = self.peek()
        if t.kind not in ("IDENT", "STRING", "INT", "FLOAT") and not (
            t.kind == "OP" and t.value == "("
        ):
            return Path(())  # bare `.` — the event root
        segs: list = []
        if t.kind == "OP":  # leading coalesce: .(a | b)
            segs.append(self._coalesce_group())
        else:
            segs.append(self._field_segment())
        segs.extend(self._path_segments(allow_leading=False))
        return Path(tuple(segs))

    def _primary(self):
        t = self.peek()
        if t.kind == "DOT":
            return self._parse_path()
        if t.kind == "INT":
            self.next()
            return Lit(t.value, "int")
        if t.kind == "FLOAT":
            self.next()
            return Lit(t.value, "float")
        if t.kind == "STRING":
            self.next()
            return Lit(t.value, "string")
        if t.kind == "REGEX":
            self.next()
            return Lit(t.value, "regex")
        if t.kind == "TIMESTAMP":
            self.next()
            return Lit(t.value, "timestamp")
        if t.kind == "IDENT":
            word = t.value
            if word == "if":
                f = self.parse_if()
                return IfExpr(f.clauses, f.otherwise)
            if word == "true":
                self.next()
                return Lit(True, "bool")
            if word == "false":
                self.next()
                return Lit(False, "bool")
            if word == "null":
                self.next()
                return Lit(None, "null")
            nxt = self.peek(1)
            if nxt.kind == "OP" and nxt.value in ("(", "!"):
                return self._parse_call()
            self.next()
            return Var(word)
        if self.at_op("("):
            # a group may hold a whole statement sequence whose value is
            # the last statement: `(ok, err = f(.x); err == null)`
            self.next()
            self.skip_nl()
            stmts = [self.parse_stmt()]
            multi = False
            while True:
                sep = False
                while self.at_op(";") or self.peek().kind == "NEWLINE":
                    sep = True
                    self.next()
                if self.at_op(")"):
                    break
                if not sep:
                    break
                # `;`/newline separate statements inside a group
                # (corpus if_statement/multiline_predicates)
                multi = True
                stmts.append(self.parse_stmt())
            self.expect_op(")")
            if not multi and not isinstance(stmts[0], (Assign, If, Abort)):
                return stmts[0]
            return Block(tuple(stmts))
        if self.at_op("["):
            return self._parse_array()
        if self.at_op("{"):
            if self._looks_like_object():
                return self._parse_object()
            return Block(tuple(self.parse_block()))
        raise VrlSyntaxError(f"unexpected token {t.value!r}", t.pos, self.src)

    def _looks_like_object(self) -> bool:
        """`{` opens an object literal iff the first token pair is
        `key:` (or the braces are empty); otherwise it's a block
        (ast.rs Container::{Object,Block})."""
        k = 1
        while self.peek(k).kind == "NEWLINE":
            k += 1
        t = self.peek(k)
        if t.kind == "OP" and t.value == "}":
            return True
        if t.kind in ("STRING", "IDENT"):
            nxt = self.peek(k + 1)
            return nxt.kind == "OP" and nxt.value == ":"
        return False

    def _parse_call(self) -> Call:
        name_tok = self.next()
        bang = False
        if self.at_op("!"):
            self.next()
            bang = True
        self.expect_op("(")
        self.skip_nl()
        args: list = []
        while not self.at_op(")"):
            arg_name = None
            if (
                self.peek().kind == "IDENT"
                and self.peek(1).kind == "OP"
                and self.peek(1).value == ":"
            ):
                arg_name = self.next().value
                self.next()  # ':'
                self.skip_nl()
            args.append((arg_name, self.parse_expr()))
            self.skip_nl()
            if self.at_op(","):
                self.next()
                self.skip_nl()
        close = self.expect_op(")")
        return Call(name_tok.value, tuple(args), bang, name_tok.pos, close.end)

    def _parse_array(self) -> Arr:
        self.expect_op("[")
        self.skip_nl()
        items = []
        while not self.at_op("]"):
            items.append(self.parse_expr())
            self.skip_nl()
            if self.at_op(","):
                self.next()
                self.skip_nl()
        self.expect_op("]")
        return Arr(tuple(items))

    def _parse_object(self) -> Obj:
        self.expect_op("{")
        self.skip_nl()
        pairs = []
        while not self.at_op("}"):
            kt = self.peek()
            if kt.kind not in ("STRING", "IDENT"):
                raise VrlSyntaxError("object key must be a string", kt.pos, self.src)
            self.next()
            self.expect_op(":")
            self.skip_nl()
            pairs.append((kt.value, self.parse_expr()))
            self.skip_nl()
            if self.at_op(","):
                self.next()
                self.skip_nl()
        self.expect_op("}")
        return Obj(tuple(pairs))


def parse(src: str) -> Program:
    return _Parser(src).parse_program()


def parse_expr(src: str):
    """Parse a single expression (used by tests)."""
    p = _Parser(src)
    p.skip_nl()
    e = p.parse_expr()
    p.skip_nl()
    if p.peek().kind != "EOF":
        raise VrlSyntaxError("trailing input after expression", p.peek().pos, src)
    return e
