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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.operators.base import Transform
from vector_spark.functions.strings import strip_ansi_escape_codes


class AddFields(Transform):
    """Literal or `{{field}}`-templated values; overwrite flag mirrors
    add_fields' insert-vs-keep semantics."""

    def __init__(self, fields: dict[str, object], overwrite: bool = True):
        self.fields, self.overwrite = fields, overwrite

    def apply(self, df: DataFrame) -> DataFrame:
        for name, value in self.fields.items():
            col = render_template(value) if isinstance(value, str) else F.lit(value)
            if not self.overwrite and name in df.columns:
                continue
            df = df.withColumn(name, col)
        return df


def render_template(value: str) -> Column:
    """Vector `{{field}}` templates (src/template.rs) → concat of
    literals and column refs, e.g. "app-{{source}}-{{severity}}"."""
    import re

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
    def __init__(self, fields: list[str]):
        self.fields = fields

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.fields)


class RenameFields(Transform):
    def __init__(self, mapping: dict[str, str]):
        self.mapping = mapping

    def apply(self, df: DataFrame) -> DataFrame:
        for old, new in self.mapping.items():
            if old not in df.columns:
                # rename_fields.rs only touches the target when
                # remove(old) yields a value: a missing source leaves
                # the target untouched
                continue
            if new in df.columns and new != old:
                # rename replaces an existing target field
                # (rename_fields.rs: insert overwrites on conflict)
                df = df.drop(new)
            df = df.withColumnRenamed(old, new)
        return df


class Coercer(Transform):
    """Cast listed fields per a types map; drop_unspecified projects away
    everything else (coercer.rs:15-19). Types use Vector's Conversion
    vocabulary: bytes|string, int, float, bool, timestamp[|fmt]."""

    TYPE_MAP = {"bytes": "string", "string": "string", "int": "long", "integer": "long",
                "float": "double", "bool": "boolean", "boolean": "boolean"}

    def __init__(self, types: dict[str, str], drop_unspecified: bool = False):
        self.types, self.drop_unspecified = types, drop_unspecified

    def apply(self, df: DataFrame) -> DataFrame:
        for field, typ in self.types.items():
            if typ.startswith("timestamp"):
                _, _, fmt = typ.partition("|")
                col = (
                    F.try_to_timestamp(F.col(field), F.lit(fmt))
                    if fmt
                    else F.try_to_timestamp(F.col(field))
                )
            else:
                col = F.col(field).try_cast(self.TYPE_MAP[typ])
            df = df.withColumn(field, col)
        if self.drop_unspecified:
            df = df.select(*self.types.keys())
        return df


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
        return df.withColumn(self.target, F.concat_ws(self.joiner, *parts))


class AnsiStripper(Transform):
    def __init__(self, field: str = "message"):
        self.field = field

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.field, strip_ansi_escape_codes(F.col(self.field)))


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
