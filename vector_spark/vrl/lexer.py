"""VRL lexer.

Token inventory follows the reference grammar
(/root/reference/lib/vrl/parser/src/lex.rs): identifiers, path roots,
string/raw-string/regex/timestamp literals, ints/floats, the operator
set from ast.rs:651-667 (Mul/Div/Add/Sub/Rem, Or/And, Err `??`,
Ne/Eq/Ge/Gt/Le/Lt, Merge `|`), `!` bangs, assignment forms, and
`#` comments. Newlines are significant only as statement separators,
so the lexer emits them as tokens and the parser folds runs.
"""

from __future__ import annotations

from dataclasses import dataclass


class VrlSyntaxError(ValueError):
    def __init__(self, msg: str, pos: int, src: str = "", code: str | None = None):
        line = src.count("\n", 0, pos) + 1 if src else "?"
        prefix = f"error[{code}]: syntax error — " if code else ""
        super().__init__(
            f"{prefix}VRL syntax error at offset {pos} (line {line}): {msg}")
        self.pos = pos
        self.code = code


@dataclass(frozen=True)
class Token:
    kind: str  # NEWLINE IDENT INT FLOAT STRING REGEX TIMESTAMP OP DOT EOF
    value: object
    pos: int  # byte offset of token start in the ORIGINAL source
    end: int = -1  # byte offset one past the token end


# longest-match-first operator table
_OPS = [
    "??", "==", "!=", "<=", ">=", "&&", "||", "|=",
    "=", "<", ">", "+", "-", "*", "/", "%",
    "(", ")", "[", "]", "{", "}", ",", ":", ";", "!", "|",
]

def _read_string(src: str, i: int) -> tuple[str, int]:
    """Read a double-quoted string with escapes, returning (value, next_i).
    `i` points at the opening quote."""
    out = []
    j = i + 1
    n = len(src)
    while j < n:
        ch = src[j]
        if ch == "\\":
            if j + 1 >= n:
                raise VrlSyntaxError("unterminated escape", j, src, code="E202")
            nxt = src[j + 1]
            mapped = {
                "n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                '"': '"', "'": "'", "0": "\0", "{": "{", "}": "}",
            }.get(nxt)
            if mapped is None:
                raise VrlSyntaxError(f"unknown escape \\{nxt}", j, src, code="E202")
            out.append(mapped)
            j += 2
            continue
        if ch == '"':
            return "".join(out), j + 1
        out.append(ch)
        j += 1
    raise VrlSyntaxError("unterminated string literal", i, src, code="E202")


def _read_quoted_raw(src: str, i: int, quote: str = "'") -> tuple[str, int]:
    """Raw single-quoted body (s'..' / r'..' / t'..'): only \\' and \\\\
    are escapes, everything else is literal (lex.rs raw strings)."""
    out = []
    j = i + 1
    n = len(src)
    while j < n:
        ch = src[j]
        if ch == "\\" and j + 1 < n and src[j + 1] in ("\\", quote):
            out.append(src[j + 1])
            j += 2
            continue
        if ch == quote:
            return "".join(out), j + 1
        out.append(ch)
        j += 1
    raise VrlSyntaxError("unterminated raw literal", i, src, code="E202")


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i = 0
    n = len(src)
    while i < n:
        ch = src[i]
        if ch in " \t\r":
            i += 1
            continue
        if ch == "\n":
            toks.append(Token("NEWLINE", "\n", i, i + 1))
            i += 1
            continue
        if ch == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if ch == '"':
            start = i
            val, i = _read_string(src, i)
            toks.append(Token("STRING", val, start, i))
            continue
        # s'..' raw string, r'..' regex, t'..' timestamp
        if ch in "srt" and i + 1 < n and src[i + 1] == "'":
            start = i
            val, i = _read_quoted_raw(src, i + 1)
            kind = {"s": "STRING", "r": "REGEX", "t": "TIMESTAMP"}[ch]
            toks.append(Token(kind, val, start, i))
            continue
        if ch.isdigit():
            start = i
            j = i
            while j < n and (src[j].isdigit() or src[j] == "_"):
                j += 1
            is_float = False
            if j < n and src[j] == "." and j + 1 < n and src[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and (src[j].isdigit() or src[j] == "_"):
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and (src[j].isdigit() or src[j] == "_"):
                        j += 1
            text = src[start:j].replace("_", "")
            toks.append(
                Token("FLOAT" if is_float else "INT",
                      float(text) if is_float else int(text), start, j)
            )
            i = j
            continue
        if ch.isalpha() or ch == "_" or ch == "@":
            start = i
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_@"):
                j += 1
            word = src[start:j]
            toks.append(Token("IDENT", word, start, j))
            i = j
            continue
        if ch == ".":
            toks.append(Token("DOT", ".", i, i + 1))
            i += 1
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Token("OP", op, i, i + len(op)))
                i += len(op)
                break
        else:
            raise VrlSyntaxError(f"unexpected character {ch!r}", i, src)
    toks.append(Token("EOF", None, n, n))
    return toks
