"""VRL type-reflection functions over dynamic (JSON-variant) values.

Vector's Value is a dynamic union (lib/vector-core/src/event/value.rs:
14-24); a Spark column has exactly one static type, so the type-
reflection functions (`type_def`-driven `is_string`/`is_integer`/... ,
lib/vrl/stdlib/src/is_*.rs) only make sense here over our *variant*
representation: a JSON-encoded string column (the same representation
the remap layer uses for schemaless residue). `typeof_value` sniffs the
JSON text exactly as VRL's runtime discriminates Value variants:
object/array/string/boolean/null structurally, integer vs float by
numeric shape (Value::Integer is i64, Value::Float is f64 —
value.rs:15-16).

`tag_types_externally` (lib/vrl/stdlib/src/tag_types_externally.rs:
93-119) wraps every scalar in a {"<type>": value} object, recursing
through objects and arrays, nulls passing through untouched. Recursion
over arbitrary-depth dynamic values is procedural, so it is an
Arrow-batched pandas UDF (the documented escape hatch — never
row-at-a-time Python); output is canonical JSON (sorted keys, compact
separators) so it is hash-comparable across engines.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — needed to resolve pandas_udf type hints
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_INT_RX = r"^-?\d+$"


def typeof_value(col: Column) -> Column:
    """VRL typeof() over a JSON-variant string column: one of
    'null' | 'object' | 'array' | 'string' | 'boolean' | 'integer' |
    'float' | 'invalid' (unparseable text)."""
    t = F.trim(col)
    first = F.substring(t, 1, 1)
    return (
        F.when(col.isNull() | (t == "null"), F.lit("null"))
        .when(first == "{", F.lit("object"))
        .when(first == "[", F.lit("array"))
        .when(first == '"', F.lit("string"))
        .when(t.isin("true", "false"), F.lit("boolean"))
        .when(t.rlike(_INT_RX), F.lit("integer"))
        .when(t.try_cast("double").isNotNull(), F.lit("float"))
        .otherwise(F.lit("invalid"))
    )


def is_string(col: Column) -> Column:
    return typeof_value(col) == "string"


def is_integer(col: Column) -> Column:
    return typeof_value(col) == "integer"


def is_float(col: Column) -> Column:
    return typeof_value(col) == "float"


def is_boolean(col: Column) -> Column:
    return typeof_value(col) == "boolean"


def is_array(col: Column) -> Column:
    return typeof_value(col) == "array"


def is_object(col: Column) -> Column:
    return typeof_value(col) == "object"


def is_null(col: Column) -> Column:
    return typeof_value(col) == "null"


def is_timestamp_type(df: DataFrame, name: str) -> bool:
    """VRL is_timestamp: Value::Timestamp is a runtime kind; in the
    typed-column world a column either IS TimestampType or is not, so
    the check collapses to a plan-time schema test (lib/vrl/stdlib/src/
    is_timestamp.rs). The JSON variant has no timestamp kind (JSON has
    no timestamp literal), so there is no row-wise form."""
    f = {fld.name: fld.dataType.simpleString() for fld in df.schema.fields}.get(name)
    return f in ("timestamp", "timestamp_ntz")


def _tag_value(v):
    # tag_types_externally.rs:93-119: scalars -> {"<type>": v}; objects
    # recurse per entry; arrays recurse per element; null stays null.
    if v is None:
        return None
    if isinstance(v, bool):
        return {"boolean": v}
    if isinstance(v, int):
        return {"integer": v}
    if isinstance(v, float):
        return {"float": v}
    if isinstance(v, str):
        return {"string": v}
    if isinstance(v, dict):
        return {k: _tag_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_tag_value(x) for x in v]
    return {"string": str(v)}


def tag_types_externally(col: Column) -> Column:
    """JSON-variant string -> type-tagged JSON-variant string
    (canonical form: sorted keys, compact separators)."""
    import json

    @F.pandas_udf("string")
    def _tag(s: "pd.Series") -> "pd.Series":
        def one(txt):
            if txt is None:
                return None
            try:
                v = json.loads(txt)
            except (ValueError, TypeError):
                return None
            tagged = _tag_value(v)
            return json.dumps(tagged, sort_keys=True, separators=(",", ":"))

        return s.map(one)

    return _tag(col)


# --- regex value kind (to_regex.rs, is_regex.rs) ---------------------
#
# VRL has a first-class Regex value kind (lib/vrl/compiler Value::Regex);
# Spark has no regex column type, so we adopt a tagged-struct convention
# consistent with tag_types_externally's {"<type>": value} envelope: a
# regex VALUE is `struct<regex: string>` (typed-column world) or the
# one-key JSON object {"regex": "<pattern>"} (JSON-variant world).
# `to_regex` validates the pattern (VRL's to_regex errors on an invalid
# pattern; per this build's convention runtime errors become NULL).
# Caveat (recorded in COVERAGE.md): the tag rides in the schema/shape,
# not in a runtime kind — a user-made struct<regex: string> is
# indistinguishable from a to_regex product, exactly as a user-made
# {"string": ...} object is indistinguishable from a tagged string.

REGEX_STRUCT_DDL = "struct<regex: string>"


def to_regex(col: Column) -> Column:
    """VRL to_regex (lib/vrl/stdlib/src/to_regex.rs): string → regex
    value. Pattern validity needs a real regex compiler, so this is an
    Arrow-batched pandas UDF (`re.compile` per DISTINCT pattern per
    batch, memoized); invalid patterns → NULL struct (VRL raises)."""
    import re

    @F.pandas_udf(REGEX_STRUCT_DDL)
    def _to_rx(s: "pd.Series") -> "pd.DataFrame":
        ok: dict = {}

        def one(p):
            if p is None:
                return None
            if p not in ok:
                try:
                    re.compile(p)
                    ok[p] = p
                except re.error:
                    ok[p] = None
            return ok[p]

        return pd.DataFrame({"regex": s.map(one)})

    return _to_rx(col)


def is_regex_type(df: DataFrame, name: str) -> bool:
    """VRL is_regex over the typed-column world: like is_timestamp, the
    kind collapses to a plan-time schema test — True iff the column is
    the regex tagged struct (struct with exactly one string field
    named 'regex')."""
    for fld in df.schema.fields:
        if fld.name == name:
            s = fld.dataType.simpleString().replace(" ", "")
            return s == "struct<regex:string>"
    return False


def is_regex(col: Column) -> Column:
    """VRL is_regex over the JSON-variant: true iff the value is the
    tagged one-key object {"regex": <string>}. Pure expression."""
    keys = F.json_object_keys(col)
    return (
        keys.isNotNull()
        & (F.size(keys) == 1)
        & (F.element_at(keys, 1) == "regex")
        & F.get_json_object(col, "$.regex").isNotNull()
    )


def regex_match(col: Column, rx: Column) -> Column:
    """Apply a regex VALUE (to_regex product) to a string — VRL's
    `match(s, r)` where r is a runtime regex. Spark's regexp_like
    accepts a non-foldable pattern (compiled per row — the documented
    cost of dynamic patterns; literal patterns should use rlike so the
    pattern folds and codegen caches the compiled regex). NULL regex
    (invalid pattern) → NULL, matching the error-propagation rule."""
    return F.when(rx["regex"].isNotNull(), F.regexp_like(col, rx["regex"]))


def assert_eq(df: DataFrame, left: Column, right: Column, message: str = "") -> None:
    """VRL assert_eq (lib/vrl/stdlib/src/assert_eq.rs) as an eager
    batch check: raise if any row has left != right (null-safe)."""
    bad = df.filter(~left.eqNullSafe(right))
    n = bad.limit(1).count()
    if n:
        sample = bad.limit(3).collect()
        raise AssertionError(f"assert_eq failed{': ' + message if message else ''}: {sample}")
