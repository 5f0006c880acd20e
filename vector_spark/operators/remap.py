"""`remap` — the VRL program stage, plus the dedicated parser transforms
(grok_parser / regex_parser / json_parser / logfmt / key_value /
tokenizer / split) which are all special cases of "compute new fields
from one source field, with error routing".

References:
  remap        /root/reference/src/transforms/remap.rs:21-29 (cfg),
               :123-176 (kernel: drop_on_error / drop_on_abort; on a
               non-drop failure the ORIGINAL event passes unchanged)
  grok_parser  /root/reference/src/transforms/grok_parser.rs:25-32, 107-148
  regex_parser /root/reference/src/transforms/regex_parser.rs:22-38, 109-139
  json_parser  /root/reference/src/transforms/json_parser.rs:13-20, 73-120
  logfmt       /root/reference/src/transforms/logfmt_parser.rs:15-20, 66
  key_value    /root/reference/src/transforms/key_value_parser.rs:16-28, 132
  tokenizer    /root/reference/src/transforms/tokenizer.rs:16-22, 99-110
  split        /root/reference/src/transforms/split.rs:16-23, 102

Design: a Remap stage is a list of (output_column, Column expression)
pairs plus an optional success predicate. The expressions are computed
into temp columns first; when the stage "fails" for a row (success
predicate false / all captures null), semantics follow Vector:
  drop=False  → original row passes through unchanged (outputs null)
  drop=True   → row filtered out (drop_on_error)
This is the compute-then-conditionally-apply shape from SURVEY.md §7 —
never in-place overwrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.functions import grok as grok_mod
from vector_spark.functions import parse as parse_fns
from vector_spark.operators.base import FallibleTransform


def _struct_from_tree(tree: dict, base: tuple[Column, T.StructType] | None = None) -> Column:
    """{name: Column | subtree} → struct Column; `base` merges the fields
    of an existing top-level struct column (new names overwrite)."""
    fields: dict[str, Column] = {}
    if base is not None:
        col, dt = base
        for f in dt.fields:
            fields[f.name] = col.getField(f.name)
    for k, v in tree.items():
        fields[k] = _struct_from_tree(v) if isinstance(v, dict) else v
    return F.struct(*[c.alias(n) for n, c in fields.items()])


def nest_outputs(df: DataFrame, outputs: dict[str, Column]) -> dict[str, Column]:
    """Dotted output names insert by PATH, as the reference transforms do
    (regex_parser.rs:131 / tokenizer.rs:99 insert captures via
    `log.insert(name, value)` where names are lookup paths): "a.b"
    becomes a struct field `b` of top-level column `a`, merged with an
    existing struct `a`'s other fields. Only top-level struct merge is
    supported — a deeper collision replaces the subtree."""
    tree: dict[str, object] = {}
    for name, expr in outputs.items():
        segs = name.split(".")
        node: dict = tree
        for s in segs[:-1]:
            nxt = node.get(s)
            if not isinstance(nxt, dict):
                nxt = node[s] = {}
            node = nxt
        node[segs[-1]] = expr
    out: dict[str, Column] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            base = None
            if k in df.columns and isinstance(df.schema[k].dataType, T.StructType):
                base = (df[k], df.schema[k].dataType)
            out[k] = _struct_from_tree(v, base)
        else:
            out[k] = v
    return out


class Remap(FallibleTransform):
    def __init__(
        self,
        outputs: dict[str, Column],
        success: Column | None = None,
        drop_on_error: bool = False,
        keep_original_on_error: bool = True,
    ):
        self.outputs = outputs
        self.success = success
        self.drop_on_error = drop_on_error
        self.keep_original_on_error = keep_original_on_error

    def _success(self) -> Column:
        if self.success is not None:
            return self.success
        ok = F.lit(False)
        for c in self.outputs.values():
            ok = ok | c.isNotNull()
        return ok

    def apply(self, df: DataFrame) -> DataFrame:
        ok = self._success()
        outputs = nest_outputs(df, self.outputs)
        cols = []
        for c in df.columns:
            if c in outputs:
                # output name collides with an existing field: the
                # reference OVERWRITES in place (log.insert replaces);
                # on failure the original value survives
                cols.append(F.when(ok, outputs.pop(c)).otherwise(df[c]).alias(c))
            else:
                cols.append(df[c])
        for name, expr in outputs.items():
            # on failure: null outputs, original row intact (remap.rs:134-173)
            cols.append(F.when(ok, expr).alias(name))
        out = df.select(*cols)
        if self.drop_on_error:
            out = out.filter(ok)
        return out

    def apply_with_errors(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """FallibleFunctionTransform: (ok branch with outputs, err branch
        with original rows)."""
        ok = self._success()
        good = df.filter(ok)
        outputs = nest_outputs(df, self.outputs)
        cols = [
            outputs.pop(c).alias(c) if c in outputs else good[c] for c in df.columns
        ]
        good = good.select(*cols, *[e.alias(n) for n, e in outputs.items()])
        return good, df.filter(~F.coalesce(ok, F.lit(False)))


class GrokParser(Remap):
    """grok_parser: named captures inserted as typed fields; no match →
    event passes unchanged (grok_parser.rs:107-148)."""

    def __init__(self, pattern: str, field: str = "message", drop_failed: bool = False,
                 patterns: dict[str, str] | None = None, types: dict[str, str] | None = None):
        captures = grok_mod.grok_extract(F.col(field), pattern, patterns)
        for name, typ in (types or {}).items():
            if name in captures:
                captures[name] = captures[name].try_cast(typ)
        super().__init__(
            outputs=captures,
            success=grok_mod.grok_matches(F.col(field), pattern, patterns),
            drop_on_error=drop_failed,
        )


class RegexParser(Remap):
    """regex_parser: first-matching pattern's named captures become fields
    (regex_parser.rs:109-139). ``patterns`` is a list of (regex,
    {name: group_idx}); first match wins via coalesce."""

    def __init__(self, patterns: list[tuple[str, dict[str, int]]], field: str = "message",
                 drop_failed: bool = False, types: dict[str, str] | None = None,
                 target_field: str | None = None):
        col = F.col(field)
        names = {n for _, groups in patterns for n in groups}
        outputs: dict[str, Column] = {}
        any_match = F.lit(False)
        for rx, _ in patterns:
            any_match = any_match | col.rlike(rx)
        for name in sorted(names):
            branches = []
            for rx, groups in patterns:
                if name in groups:
                    c = F.regexp_extract(col, rx, groups[name])
                    branches.append(F.when(col.rlike(rx) & (c != ""), c))
            outputs[name] = F.coalesce(*branches) if len(branches) > 1 else branches[0]
            if types and name in types:
                outputs[name] = outputs[name].try_cast(types[name])
        if target_field:  # captures nest under target_field (regex_parser.rs:131)
            outputs = {f"{target_field}.{n}": c for n, c in outputs.items()}
        super().__init__(outputs=outputs, success=any_match, drop_on_error=drop_failed)


class JsonParser(Remap):
    """json_parser with a known value schema → from_json struct fields
    merged at root or under target_field (json_parser.rs:73-120)."""

    def __init__(self, schema: str, field: str = "message", drop_invalid: bool = False,
                 target_field: str | None = None):
        parsed = parse_fns.parse_json(F.col(field), schema)
        if target_field:
            outputs = {target_field: parsed}
        else:
            field_names = [f.strip().split(" ")[0].split(":")[0] for f in schema.split(",")]
            outputs = {n: parsed[n] for n in field_names}
        super().__init__(outputs=outputs, success=parsed.isNotNull(), drop_on_error=drop_invalid)


class KeyValueParser(Remap):
    """key_value_parser / logfmt_parser → map column (+ promoted keys).

    trim_key / trim_value (key_value_parser.rs:16-28): keys and values
    are whitespace-trimmed, then stripped of the given characters at
    both ends. When neither is set, the legacy quote-stripping
    parse_key_value behavior is kept (documented divergence: the
    reference default keeps quotes)."""

    def __init__(self, field: str = "message", separator: str = " ", field_split: str = "=",
                 target_field: str = "attrs", promote: list[str] | None = None,
                 drop_failed: bool = False, trim_key: str | None = None,
                 trim_value: str | None = None):
        if trim_key is not None or trim_value is not None:
            import re as _re

            def _trim(expr, chars):
                expr = F.trim(expr)
                if chars:
                    esc = _re.escape(chars)
                    expr = F.regexp_replace(expr, f"^[{esc}]+|[{esc}]+$", "")
                return expr

            m = F.str_to_map(F.col(field), F.lit(separator), F.lit(field_split))
            m = F.map_from_arrays(
                F.transform(F.map_keys(m), lambda k: _trim(k, trim_key)),
                F.transform(F.map_values(m), lambda v: _trim(v, trim_value)),
            )
        else:
            m = parse_fns.parse_key_value(F.col(field), field_split, separator)
        outputs = {target_field: m}
        for key in promote or []:
            outputs[key] = F.element_at(m, key)
        super().__init__(outputs=outputs, success=F.size(m) > 0, drop_on_error=drop_failed)


class Tokenizer(Remap):
    """tokenizer: quote-aware whitespace split zipped with field_names;
    '-' → null (tokenizer.rs:99-110)."""

    def __init__(self, field_names: list[str], field: str = "message",
                 types: dict[str, str] | None = None, drop_field: bool = False):
        toks = parse_fns.parse_tokens(F.col(field))
        outputs: dict[str, Column] = {}
        for i, name in enumerate(field_names):
            c = F.get(toks, i)
            c = F.when(c == "-", F.lit(None)).otherwise(F.regexp_replace(c, r'^"|"$', ""))
            if types and name in types:
                c = c.try_cast(types[name])
            outputs[name] = c
        super().__init__(outputs=outputs, success=F.size(toks) > 0)
        self._drop_field = drop_field
        self._field = field

    def apply(self, df: DataFrame) -> DataFrame:
        out = super().apply(df)
        return out.drop(self._field) if self._drop_field else out


class Split(Remap):
    """split: plain separator split assigned positionally (split.rs:102)."""

    def __init__(self, field_names: list[str], field: str = "message", separator: str = r"\s+",
                 types: dict[str, str] | None = None):
        parts = F.split(F.col(field), separator)
        outputs = {}
        for i, name in enumerate(field_names):
            c = F.get(parts, i)
            if types and name in types:
                c = c.try_cast(types[name])
            outputs[name] = c
        super().__init__(outputs=outputs, success=F.size(parts) > 0)
