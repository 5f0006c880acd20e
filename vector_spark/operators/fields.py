"""Field-shaping transforms: add_fields / remove_fields / rename_fields /
coercer / concat / ansi_stripper / add_tags / remove_tags.

References:
  add_fields      /root/reference/src/transforms/add_fields.rs:18-28, 104
  remove_fields   /root/reference/src/transforms/remove_fields.rs:11-14, 63
  rename_fields   /root/reference/src/transforms/rename_fields.rs:13-16, 67
  coercer         /root/reference/src/transforms/coercer.rs:15-19, 58
  concat          /root/reference/src/transforms/concat.rs:15-19, 136
  ansi_stripper   /root/reference/src/transforms/ansi_stripper.rs:12-14, 56
  add_tags        /root/reference/src/transforms/add_tags.rs
  remove_tags     /root/reference/src/transforms/remove_tags.rs

All are pure projections (narrow, zero-shuffle, codegen'd).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.operators.base import Transform
from vector_spark.functions.strings import strip_ansi_escape_codes


# ---- nested-path projection machinery ---------------------------------
# The reference's field transforms address fields by lookup PATH
# ("a.b" nests — event/lookup.rs); Spark's analogue is rebuilding the
# enclosing struct column. All four path transforms below compile to ONE
# select over a mutable name→Column tree, so chains stay narrow
# zero-shuffle projections.


def _tree_from_df(df: DataFrame) -> dict:
    def expand(col: Column, dt: T.DataType):
        if isinstance(dt, T.StructType):
            return {f.name: expand(col.getField(f.name), f.dataType) for f in dt.fields}
        return col

    return {f.name: expand(df[f.name], f.dataType) for f in df.schema.fields}


def flatten_paths(fields: dict) -> dict[str, object]:
    """TOML nested tables → dotted paths ({"x": {"y": 1}} → {"x.y": 1});
    already-dotted keys pass through."""
    out: dict[str, object] = {}
    for k, v in fields.items():
        if isinstance(v, dict):
            for sub, val in flatten_paths(v).items():
                out[f"{k}.{sub}"] = val
        else:
            out[k] = v
    return out


def _tree_get(tree: dict, segs: list[str]):
    node = tree
    for s in segs:
        if not (isinstance(node, dict) and s in node):
            return None
        node = node[s]
    return node


def _tree_set(tree: dict, segs: list[str], value):
    node = tree
    for s in segs[:-1]:
        nxt = node.get(s)
        if not isinstance(nxt, dict):  # scalar-then-nested: replace
            nxt = node[s] = {}
        node = nxt
    node[segs[-1]] = value


def _tree_remove(tree: dict, segs: list[str]) -> bool:
    node = tree
    for s in segs[:-1]:
        node = node.get(s) if isinstance(node, dict) else None
        if not isinstance(node, dict):
            return False
    if isinstance(node, dict) and segs[-1] in node:
        del node[segs[-1]]
        return True
    return False


def _prune_empty(tree: dict):
    for k in list(tree):
        v = tree[k]
        if isinstance(v, dict):
            _prune_empty(v)
            if not v:
                del tree[k]


def _tree_select(df: DataFrame, tree: dict) -> DataFrame:
    from vector_spark.operators.remap import _struct_from_tree

    # an emptied struct is unrepresentable as a Spark column (struct<>),
    # so it is always pruned — with drop_empty this is exactly the
    # reference semantics; without it the reference would keep `{}`
    # (documented divergence, no behavior case exercises it)
    _prune_empty(tree)
    return df.select(*[
        (_struct_from_tree(v) if isinstance(v, dict) else v).alias(k)
        for k, v in tree.items()
    ])


_IDX_KEY = re.compile(r"^(.+)\[(\d+)\]$")


def _array_from_items(items: dict[int, object]) -> Column:
    """`"a[0]" = v` index-path assignments → ONE array column. A
    homogeneous set stays typed; mixed types use the VRL variant
    convention (canonical-JSON scalar strings — the SAME encoding the
    VRL compiler's `==` uses on both sides, so conditions like
    `.a == [0, "1", 2.0]` agree; add_fields.toml add_fields_array)."""
    import json as _json

    hi = max(items)
    kinds = {type(v) for v in items.values() if v is not None}
    if len(kinds) <= 1:
        return F.array(*[F.lit(items.get(i)) for i in range(hi + 1)])

    def enc(v):
        if v is None:
            return F.lit(None).cast("string")
        if isinstance(v, bool):
            return F.lit("true" if v else "false")
        if isinstance(v, str):
            return F.lit(_json.dumps(v))
        return F.lit(v).cast("string")

    return F.array(*[enc(items.get(i)) for i in range(hi + 1)])


class AddFields(Transform):
    """Literal or `{{field}}`-templated values; overwrite flag mirrors
    add_fields' insert-vs-keep semantics. Dotted / TOML-nested names
    insert by path (add_fields.rs:104); array-index paths ("a[0]")
    build array columns (heterogeneous ones in the VRL variant
    encoding)."""

    def __init__(self, fields: dict[str, object], overwrite: bool = True):
        self.fields, self.overwrite = fields, overwrite

    def apply(self, df: DataFrame) -> DataFrame:
        tree = _tree_from_df(df)
        arrays: dict[str, dict[int, object]] = {}
        for name, value in flatten_paths(self.fields).items():
            m = _IDX_KEY.match(name)
            if m:
                arrays.setdefault(m.group(1), {})[int(m.group(2))] = value
                continue
            col = render_template(value) if isinstance(value, str) else F.lit(value)
            segs = name.split(".")
            if not self.overwrite and _tree_get(tree, segs) is not None:
                continue
            _tree_set(tree, segs, col)
        for name, items in arrays.items():
            segs = name.split(".")
            if not self.overwrite and _tree_get(tree, segs) is not None:
                continue
            _tree_set(tree, segs, _array_from_items(items))
        return _tree_select(df, tree)


def render_template(value: str) -> Column:
    """Vector `{{field}}` templates (src/template.rs) → concat of
    literals and column refs, e.g. "app-{{source}}-{{severity}}"."""
    parts = re.split(r"(\{\{\s*[\w.]+\s*\}\})", value)
    cols = []
    for p in parts:
        if not p:
            continue
        m = re.fullmatch(r"\{\{\s*([\w.]+)\s*\}\}", p)
        cols.append(F.col(m.group(1)).cast("string") if m else F.lit(p))
    if len(cols) == 1:
        return cols[0]
    return F.concat(*cols)


class RemoveFields(Transform):
    """Drop fields by path (remove_fields.rs:63); drop_empty also removes
    containers emptied by the removal."""

    def __init__(self, fields: list[str], drop_empty: bool = False):
        self.fields, self.drop_empty = fields, drop_empty

    def apply(self, df: DataFrame) -> DataFrame:
        if all("." not in f for f in self.fields):
            return df.drop(*self.fields)
        tree = _tree_from_df(df)
        for f in self.fields:
            _tree_remove(tree, f.split("."))
        return _tree_select(df, tree)


class RenameFields(Transform):
    """Move fields old-path → new-path (rename_fields.rs:67 —
    remove(old) then insert(new), overwriting a conflicting target);
    drop_empty prunes containers emptied by the move."""

    def __init__(self, mapping: dict[str, str], drop_empty: bool = False):
        self.mapping, self.drop_empty = flatten_paths(mapping), drop_empty

    def apply(self, df: DataFrame) -> DataFrame:
        tree = _tree_from_df(df)
        for old, new in self.mapping.items():
            val = _tree_get(tree, old.split("."))
            if val is None:
                # rename_fields.rs only touches the target when
                # remove(old) yields a value: a missing source leaves
                # the target untouched
                continue
            _tree_remove(tree, old.split("."))
            _tree_set(tree, new.split("."), val)
        return _tree_select(df, tree)


class Coercer(Transform):
    """Cast listed fields per a types map; drop_unspecified projects away
    everything else (coercer.rs:15-19). Types use Vector's Conversion
    vocabulary: bytes|string, int, float, bool, timestamp[|strptime-fmt].
    Dotted field names coerce struct subfields in place."""

    TYPE_MAP = {"bytes": "string", "string": "string", "int": "long", "integer": "long",
                "float": "double", "bool": "boolean", "boolean": "boolean"}

    def _coerce(self, col: Column, typ: str) -> Column:
        if typ.startswith("timestamp"):
            _, _, fmt = typ.partition("|")
            if fmt:
                from vector_spark.vrl.compiler import _strptime_to_spark

                return F.try_to_timestamp(col, F.lit(_strptime_to_spark(fmt)))
            # bare `timestamp`: the reference tries a battery of common
            # formats (lib/vector-common Conversion); ISO8601 covers the
            # test surface, with second-level fallback for no-fraction
            return F.coalesce(
                F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][XXX]")),
                F.try_to_timestamp(col),
            )
        return col.try_cast(self.TYPE_MAP[typ])

    def __init__(self, types: dict[str, str], drop_unspecified: bool = False):
        self.types, self.drop_unspecified = flatten_paths(types), drop_unspecified

    def apply(self, df: DataFrame) -> DataFrame:
        tree = _tree_from_df(df)
        for field, typ in self.types.items():
            segs = field.split(".")
            cur = _tree_get(tree, segs)
            if cur is None or isinstance(cur, dict):
                continue
            _tree_set(tree, segs, self._coerce(cur, typ))
        out = _tree_select(df, tree)
        if self.drop_unspecified:
            out = out.select(*self.types.keys())
        return out


class Concat(Transform):
    """Build `target` from substrings `field[start..end]` joined by
    `joiner` (concat.rs:15-19): items are (field, start, end) with
    0-based, end-exclusive slices; (field, None, None) = whole value."""

    def __init__(self, target: str, items: list[tuple[str, int | None, int | None]], joiner: str = " "):
        self.target, self.items, self.joiner = target, items, joiner

    def apply(self, df: DataFrame) -> DataFrame:
        parts = []
        for field, start, end in self.items:
            c = F.col(field).cast("string")
            if start is not None or end is not None:
                # python-like slice semantics incl. negative / open
                # bounds ("second[-2..]", "e.f[..3]", concat.rs:15-19)
                ln = F.length(c)
                if start is None:
                    s = F.lit(0)
                elif start >= 0:
                    s = F.lit(start)
                else:
                    s = F.greatest(ln + start, F.lit(0))
                if end is None:
                    e = ln
                elif end >= 0:
                    e = F.least(F.lit(end), ln)
                else:
                    e = ln + end
                c = c.substr(s + 1, F.greatest(e - s, F.lit(0)))
            parts.append(c)
        joined = F.concat_ws(self.joiner, *parts)
        if "." in self.target:  # nested target inserts by path
            from vector_spark.operators.remap import nest_outputs

            (top, col), = nest_outputs(df, {self.target: joined}).items()
            return df.withColumn(top, col)
        return df.withColumn(self.target, joined)


class AnsiStripper(Transform):
    def __init__(self, field: str = "message"):
        self.field = field

    def apply(self, df: DataFrame) -> DataFrame:
        stripped = strip_ansi_escape_codes(F.col(self.field))
        if "." in self.field:  # nested field: rebuild the struct column
            from vector_spark.operators.remap import nest_outputs

            (top, col), = nest_outputs(df, {self.field: stripped}).items()
            return df.withColumn(top, col)
        return df.withColumn(self.field, stripped)


class AddTags(Transform):
    """Metric-tag insert: map_concat respecting overwrite (add_tags.rs)."""

    def __init__(self, tags: dict[str, str], overwrite: bool = True, tags_col: str = "tags"):
        self.tags, self.overwrite, self.tags_col = tags, overwrite, tags_col

    def apply(self, df: DataFrame) -> DataFrame:
        new = F.create_map(*[x for k, v in self.tags.items() for x in (F.lit(k), F.lit(v))])
        if self.tags_col not in df.columns:
            # a metric without tags has an empty tag map (metric.rs
            # with_tags(None)) — inserting creates the map
            return df.withColumn(self.tags_col, new)
        keys = F.array(*[F.lit(k) for k in self.tags])
        old = F.col(self.tags_col)
        # drop colliding keys from the losing side before map_concat so
        # the result never has duplicates (independent of the session's
        # spark.sql.mapKeyDedupPolicy)
        if self.overwrite:
            merged = F.map_concat(F.map_filter(old, lambda k, _: ~F.array_contains(keys, k)), new)
        else:
            merged = F.map_concat(old, F.map_filter(new, lambda k, _: ~F.map_contains_key(old, k)))
        return df.withColumn(self.tags_col, merged)


class RemoveTags(Transform):
    def __init__(self, keys: list[str], tags_col: str = "tags"):
        self.keys, self.tags_col = keys, tags_col

    def apply(self, df: DataFrame) -> DataFrame:
        drop = F.array(*[F.lit(k) for k in self.keys])
        return df.withColumn(
            self.tags_col,
            F.map_filter(F.col(self.tags_col), lambda k, _: ~F.array_contains(drop, k)),
        )
