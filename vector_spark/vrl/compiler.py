"""VRL → Column compiler.

One VRL program run per event compiles into ONE declarative select:

- event paths / variables live in a compile-time environment mapping
  path → typed Column expression (class `V`); assignments rebind,
  nothing is executed per-row in Python;
- `if` guards become `F.when` wrappers on the assignments inside;
- runtime errors carry through expressions as a message Column
  (null = ok), exactly the reference's `Result<Value>` threading
  (/root/reference/lib/vrl/core/src lib); `ok, err =` captures it,
  `??` coalesces it, an unhandled/`!` error raises the program-level
  error flag;
- a failed or aborted program restores the ORIGINAL event
  (remap.rs:130-148), compiled as a per-field
  when(rollback, original).otherwise(new) wrapper, with
  drop_on_error / drop_on_abort as row filters.

Typing: VRL is dynamically typed per event; a DataFrame column has one
static type, so the compiler runs VRL's type lattice at compile time
(int/float/string/bool/timestamp/null/array/object/any). Two mapped
divergences, both documented in COVERAGE.md:

- presence: a DataFrame column cannot be absent per-row, so
  `exists(.f)` compiles to IS NOT NULL (nulls-as-absent, SURVEY §1.3);
- heterogeneous arrays (`[0, "1", 2.0]`): Spark arrays are homogeneous,
  so mixed-type arrays materialize as array<string> of canonical JSON
  scalars ("variant encoding"); literals on the other side of == use
  the same encoder, so comparisons agree.

On error-capture assignment (`ok, err = expr`) the ok target takes the
*type default* of the expression (int 0, float 0.0, string "", bool
false, else null) — the reference's zero-value semantics, pinned by
behavior case remap_arithmetic_error (.a == 0.0 after 10/0).
"""

from __future__ import annotations

import json
import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.vrl import parser as P


class VrlCompileError(ValueError):
    pass


def _qcol(name: str) -> Column:
    if _re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", name):
        return F.col(name)
    return F.col("`" + name.replace("`", "``") + "`")


def _spark_to_vtype(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dt, T.NullType):
        return "null"
    return "any"


def _unify(a: str, b: str) -> str:
    if a == b:
        return a
    if a == "null":
        return b
    if b == "null":
        return a
    if {a, b} == {"int", "float"}:
        return "float"
    return "any"


_NUMERIC = ("int", "float", "any")

# reference type names as they appear in runtime error messages
# (lib/vrl/compiler/src/value/kind.rs)
_VRL_TYPE = {
    "int": "integer", "float": "float", "string": "string", "bool": "boolean",
    "null": "null", "array": "array", "object": "object", "regex": "regex",
    "timestamp": "timestamp", "any": "any",
}


class V:
    """A compiled VRL value: Column + VRL type + error channel, with
    optional compile-time structure (object field map / array items)
    and an optional Python constant."""

    __slots__ = ("col", "vtype", "err", "fields", "items", "const", "has_const",
                 "checked", "err_always", "err_never")

    def __init__(self, col=None, vtype="any", err=None, fields=None, items=None,
                 const=None, has_const=False, checked=False, err_always=False,
                 err_never=False):
        self.col = col
        self.vtype = vtype
        self.err = err  # Column[string] (null = ok) | None = infallible
        self.fields = fields  # dict[str, V] for concrete objects
        self.items = items  # dict[int, V] for concrete arrays
        self.const = const
        self.has_const = has_const
        # checked=True: the error channel is ALLOWED to reach runtime —
        # a `fn!()` bang call (abort-on-error, ast.rs FunctionCall.abort);
        # strict mode treats it as handled (E100 doesn't fire)
        self.checked = checked
        # err_always=True: the error fires unconditionally (known at
        # compile time, e.g. a constant-folded `1 / 0`)
        self.err_always = err_always
        # err_never=True: the channel exists for type-level fallibility
        # but is known never to fire (constant-folded parse_json etc.)
        self.err_never = err_never

    def infallible(self) -> bool:
        return self.err is None


def _null(vtype: str = "null") -> V:
    return V(F.lit(None), vtype)


def _zero(vtype: str) -> Column:
    return {
        "int": F.lit(0),
        "float": F.lit(0.0),
        "string": F.lit(""),
        "bool": F.lit(False),
    }.get(vtype, F.lit(None))


def _combine_err(*errs) -> Column | None:
    cols = [e for e in errs if e is not None]
    if not cols:
        return None
    return cols[0] if len(cols) == 1 else F.coalesce(*cols)


def _from_python(value) -> V:
    """A compile-time Python value (folded parse_json, literals) → V."""
    if value is None:
        return _null()
    if isinstance(value, bool):
        return V(F.lit(value), "bool", const=value, has_const=True)
    if isinstance(value, int):
        return V(F.lit(value), "int", const=value, has_const=True)
    if isinstance(value, float):
        return V(F.lit(value), "float", const=value, has_const=True)
    if isinstance(value, str):
        return V(F.lit(value), "string", const=value, has_const=True)
    if isinstance(value, list):
        return V(None, "array", items={i: _from_python(x) for i, x in enumerate(value)})
    if isinstance(value, dict):
        return V(None, "object", fields={k: _from_python(v) for k, v in value.items()})
    raise VrlCompileError(f"unsupported constant {value!r}")


def _vjson(v: V) -> Column:
    """Canonical JSON scalar encoding used for heterogeneous ('variant')
    arrays; both sides of == use this, so comparisons agree."""
    col, t = _mat(v), v.vtype
    if t == "string":
        return F.when(col.isNotNull(), F.concat(F.lit('"'), col, F.lit('"')))
    if t == "bool":
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if t in ("int", "float"):
        return col.cast("string")
    if t == "timestamp":
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    if t in ("array", "object"):
        return F.to_json(col)
    return col.cast("string")


def _arr_homogeneous(items: dict[int, V]) -> str | None:
    """The single element vtype if the concrete array is homogeneous."""
    kinds = {it.vtype for it in items.values() if it.vtype != "null"}
    if len(kinds) == 1 and kinds != {"any"}:
        return kinds.pop()
    if not kinds:
        return "null"
    return None


def _mat(v: V, sort_keys: bool = False) -> Column:
    """Materialize a V to a single Column (structs for objects, arrays
    — native when homogeneous, variant-encoded otherwise)."""
    if v.fields is not None:
        names = sorted(v.fields) if sort_keys else list(v.fields)
        if not names:
            return F.lit(None).cast("struct<>")
        return F.struct(*[_mat(v.fields[n], sort_keys).alias(n) for n in names])
    if v.items is not None:
        if not v.items:
            return F.array().cast("array<string>")
        hi = max(v.items)
        elems = []
        homo = _arr_homogeneous(v.items)
        for i in range(hi + 1):
            it = v.items.get(i)
            if it is None:
                elems.append(F.lit(None).cast("string") if homo is None else F.lit(None))
            else:
                elems.append(_mat(it, sort_keys) if homo is not None else _vjson(it))
        return F.array(*elems)
    if v.col is None:
        return F.lit(None)
    return v.col


# ---------------------------------------------------------- stdlib
# Each entry: (param_names, builder). Builders take the compiler, the
# arg dict (param name → V, missing params absent) and the Call node,
# and return a V. Fallible builders set .err (a message Column).
# Implementations delegate to the existing Column builders in
# vector_spark.functions.* — this table is the VRL-name front door.

def _need_const(args: dict, name: str, call: P.Call):
    v = args.get(name)
    if v is None:
        return None
    if not v.has_const:
        raise VrlCompileError(
            f'argument "{name}" of {call.name}() must be a literal in the '
            f"compile-to-Column model"
        )
    return v.const


def _call_err(call: P.Call, detail: Column | str) -> Column:
    prefix = f'function call error for "{call.name}" at ({call.start}:{call.end}): '
    if isinstance(detail, str):
        return F.lit(prefix + detail)
    return F.concat(F.lit(prefix), detail)


def _coerce_err(call: P.Call, args: dict, result: Column, into: str,
                null_ok: bool = False) -> Column:
    src = args["value"].col if args["value"].col is not None else F.lit(None)
    bad = result.isNull() if not null_ok else (result.isNull() & src.isNotNull())
    return F.when(bad, _call_err(call, f"unable to coerce into {into}"))


def _fn_to_string(c, args, call):
    v = args["value"]
    t = v.vtype
    if t in ("object", "array") and (v.fields is not None or v.items is not None or t == "object"):
        # VRL: to_string on collections errors (message format pinned by
        # diagnostics/program_aborted_invalid_argument_type)
        return V(F.lit(""), "string", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, f'unable to coerce "{_VRL_TYPE[t]}" into "string"')))
    col = _mat(v)
    if t == "bool":
        out = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif t == "timestamp":
        out = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    elif t == "null":
        out = F.lit("")
    else:
        out = col.cast("string")
    # reference zero-value: to_string of a missing/null value is ""
    return V(F.coalesce(out, F.lit("")), "string", err=_combine_err(v.err))


def _fn_to_int(c, args, call):
    v = args["value"]
    col = _mat(v)
    if v.vtype == "bool":
        out = F.when(col, F.lit(1)).otherwise(F.lit(0))
    elif v.vtype == "timestamp":
        out = col.cast("long")
    else:
        out = col.cast("string").try_cast("double").cast("long") if v.vtype in ("string", "any") \
            else col.cast("long")
    if v.vtype in ("int", "float", "bool", "timestamp"):
        # infallible conversions (to_int.rs type_def)
        return V(out, "int", err=v.err)
    if v.vtype == "null":
        return V(F.lit(None).cast("long"), "int", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, 'unable to coerce "null" into "integer"')))
    err = _combine_err(v.err, _coerce_err(call, args, out, "int"))
    return V(out, "int", err=err)


def _fn_to_float(c, args, call):
    v = args["value"]
    col = _mat(v)
    out = col.try_cast("double") if v.vtype in ("string", "any") else col.cast("double")
    if v.vtype in ("int", "float", "bool", "timestamp"):
        # infallible conversions (to_float.rs type_def)
        return V(out, "float", err=v.err)
    if v.vtype == "null":
        return V(F.lit(None).cast("double"), "float", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, 'unable to coerce "null" into "float"')))
    return V(out, "float", err=_combine_err(v.err, _coerce_err(call, args, out, "float")))


def _fn_to_bool(c, args, call):
    from vector_spark.functions.strings import to_bool as _to_bool

    v = args["value"]
    col = _mat(v)
    if v.vtype == "bool":
        out = col
    elif v.vtype in ("int", "float"):
        out = col != F.lit(0)
    else:
        out = _to_bool(col.cast("string"))
    return V(out, "bool", err=_combine_err(v.err, _coerce_err(call, args, out, "bool")))


def _fn_to_timestamp(c, args, call):
    v = args["value"]
    col = _mat(v)
    if v.vtype in ("int", "float"):
        out = F.timestamp_seconds(col)
    elif v.vtype == "timestamp":
        out = col
    else:
        # the reference's Conversion::Timestamp tries a format battery;
        # cover ISO-8601 and (bracketed) CLF — try_to_timestamp so an
        # unparseable value errs through the VRL channel, never ANSI
        s = col.cast("string")
        stripped = F.regexp_replace(s, r"^\[|\]$", "")
        out = F.coalesce(
            F.try_to_timestamp(s),
            F.try_to_timestamp(stripped, F.lit("dd/MMM/yyyy:HH:mm:ss Z")),
            F.try_to_timestamp(stripped, F.lit("dd/MMM/yyyy:HH:mm:ss XXX")),
        )
    return V(out, "timestamp",
             err=_combine_err(v.err, _coerce_err(call, args, out, "timestamp")))


def _assert_type(expected: str):
    def build(c, args, call):
        v = args["value"]
        if v.vtype == expected:
            err = F.when(_mat(v).isNull(), _call_err(call, f"expected {expected}, got null"))
            return V(v.col, v.vtype, err=_combine_err(v.err, err),
                     fields=v.fields, items=v.items, const=v.const, has_const=v.has_const)
        if v.vtype == "any":
            # dynamic pass-through, retyped as the asserted kind so
            # downstream builders (merge/append) see the right shape
            return V(v.col, expected, err=v.err, fields=v.fields,
                     items=v.items, const=v.const, has_const=v.has_const)
        if expected == "float" and v.vtype == "int":
            return V(_mat(v).cast("double"), "float", err=v.err)
        if expected == "object" and v.fields is not None:
            return v
        if expected == "array" and v.items is not None:
            return v
        return V(_zero(expected), expected,
                 err=_call_err(call, f"expected {expected}, got {v.vtype}"))

    return build


# Python json error phrasing → serde_json phrasing (the reference's
# parser), for byte-matched diagnostics
_SERDE_MSG = {
    "Expecting property name enclosed in double quotes": "key must be a string",
    "Expecting value": "expected value",
    "Expecting ',' delimiter": "expected `,` or `}`",
}


def _fn_parse_json(c, args, call):
    v = args["value"]
    if v.has_const:  # compile-time fold (literal program text)
        try:
            folded = _from_python(json.loads(v.const))
            # the call stays fallible at the type level (the reference
            # only sees `parse_json(<string>)`) — err never fires
            return V(folded.col, folded.vtype, err=F.lit(None).cast("string"),
                     fields=folded.fields, items=folded.items,
                     const=folded.const, has_const=folded.has_const,
                     err_never=True)
        except json.JSONDecodeError as e:
            msg = _SERDE_MSG.get(e.msg, e.msg)
            detail = f"unable to parse json: {msg} at line {e.lineno} column {e.colno}"
            return V(F.lit(None), "any", err=_call_err(call, detail),
                     err_always=True)
    schema = _need_const(args, "schema", call)
    col = _mat(v)
    if schema:
        from vector_spark.functions.parse import parse_json as _pj

        out = _pj(col, schema)
        vt = "object"
    else:
        from vector_spark.functions.parse import parse_json_map as _pjm

        out = _pjm(col)
        vt = "object"
    err = F.when(out.isNull(), _call_err(call, "unable to parse json"))
    return V(out, vt, err=_combine_err(v.err, err))


def _sha_fn(fn, default_bits: int):
    """Map the reference's string variants (sha2.rs/sha3.rs: \"SHA-224\",
    \"SHA3-512\", ...) onto the bit-width builders; sha3 defaults to
    SHA3-512, sha2 to 256-bit."""

    def build(col, variant=None):
        bits = default_bits
        if isinstance(variant, int):
            bits = variant
        elif isinstance(variant, str):
            tail = variant.rsplit("-", 1)[-1]
            if not tail.isdigit():
                raise VrlCompileError(f"unknown hash variant {variant!r}")
            bits = int(tail)
        return fn(col, bits)

    return build


def _java_rx(pattern: str) -> str:
    """Rust/Python named groups `(?P<n>...)` → Java `(?<n>...)` (Spark's
    regexp_* run java.util.regex)."""
    return pattern.replace("(?P<", "(?<")


def _fn_parse_regex(c, args, call):
    pattern = _need_const(args, "pattern", call)
    col = _mat(args["value"])
    try:
        rx = _re.compile(pattern)
    except _re.error as e:
        raise VrlCompileError(f"bad regex in {call.name}(): {e}") from None
    jrx = _java_rx(pattern)
    names = {n: i for n, i in rx.groupindex.items()}
    numeric = args.get("numeric_groups")
    if numeric is not None and numeric.has_const and numeric.const:
        # numeric_groups: true adds "0" (full match), "1"... alongside
        # the named captures (parse_regex.rs:27-45)
        for i in range(rx.groups + 1):
            names[str(i)] = i
    if not names:
        raise VrlCompileError("parse_regex needs named capture groups")
    fields = {
        n: V(F.when(col.rlike(jrx), F.regexp_extract(col, jrx, idx)), "string")
        for n, idx in names.items()
    }
    err = F.when(~F.coalesce(col.rlike(jrx), F.lit(False)),
                 _call_err(call, "regex did not match"))
    return V(None, "object", fields=fields, err=_combine_err(args["value"].err, err))


def _fn_parse_grok(c, args, call):
    from vector_spark.functions import grok as grok_mod

    pattern = _need_const(args, "pattern", call)
    col = _mat(args["value"])
    caps = grok_mod.grok_extract(col, pattern)
    fields = {n: V(cc, "string") for n, cc in caps.items()}
    err = F.when(~F.coalesce(grok_mod.grok_matches(col, pattern), F.lit(False)),
                 _call_err(call, "grok pattern did not match"))
    return V(None, "object", fields=fields, err=_combine_err(args["value"].err, err))


def _fn_parse_key_value(c, args, call):
    from vector_spark.functions.parse import parse_key_value

    v = args["value"]
    kv = _need_const(args, "key_value_delimiter", call) or "="
    fd = _need_const(args, "field_delimiter", call) or " "
    if v.has_const and isinstance(v.const, str):
        # constant input folds to a concrete object so the result keeps
        # per-key fields (merge/|= need them)
        out: dict = {}
        for part in v.const.split(fd):
            if kv in part:
                k, _, val = part.partition(kv)
                k = k.strip().strip('"')
                if k:
                    out[k] = val.strip().strip('"')
        if out:
            return V(None, "object",
                     fields={k: _from_python(x) for k, x in out.items()},
                     err=F.lit(None).cast("string"), err_never=True)
        return V(None, "object", fields={}, err_always=True,
                 err=_call_err(call, "could not parse key/value pairs"))
    col = _mat(v)
    out = parse_key_value(col, kv, fd)
    err = F.when(out.isNull() | (F.size(out) == 0),
                 _call_err(call, "could not parse key/value pairs"))
    return V(out, "object", err=_combine_err(args["value"].err, err))


def _fn_parse_timestamp(c, args, call):
    from vector_spark.functions.parse import parse_timestamp

    fmt = _need_const(args, "format", call)
    out = parse_timestamp(_mat(args["value"]), _strptime_to_spark(fmt) if fmt else None)
    return V(out, "timestamp",
             err=_combine_err(args["value"].err, _coerce_err(call, args, out, "timestamp")))


def _strptime_to_spark(fmt: str) -> str:
    """VRL uses chrono strftime formats; translate the common ones."""
    table = {
        "%+": "yyyy-MM-dd'T'HH:mm:ssxxx",  # chrono RFC 3339 (+00:00 form)
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%z": "XX", "%:z": "XXX", "%f": "SSSSSS", "%3f": "SSS",
        "%b": "MMM", "%a": "EEE", "%e": "d", "%T": "HH:mm:ss", "%F": "yyyy-MM-dd",
    }
    out = fmt
    for k, sv in table.items():
        out = out.replace(k, sv)
    return out


def _simple(fn, vtype: str, *params: str, fallible: bool = False,
            detail: str = "call failed", value_type: str | None = None):
    """Wrap an existing Column builder: params map positionally; consts
    required for non-leading params (patterns, separators, sizes).
    value_type: statically reject (as a runtime error value) a
    mis-typed first argument instead of crashing Spark analysis."""

    def build(c, args, call):
        first = args[params[0]]
        if value_type is not None and first.vtype not in (value_type, "any") \
                and (first.fields is None and first.items is None
                     or value_type not in ("object", "array")):
            return V(_zero(vtype), vtype, err_always=first.err is None,
                     err=_combine_err(first.err, _call_err(
                         call, f'expected "{value_type}", got '
                               f'"{_VRL_TYPE[first.vtype]}"')))
        pos_args = [_mat(first)]
        for p in params[1:]:
            if p in args:
                a = args[p]
                pos_args.append(a.const if a.has_const else _mat(a))
        out = fn(*pos_args)
        err = _combine_err(first.err)
        if value_type is not None and first.vtype == "any" and c.strict:
            # strict (reference) typing: a dynamically-typed argument
            # keeps the call fallible (null/mistyped at runtime)
            err = _combine_err(err, F.when(_mat(first).isNull(), _call_err(
                call, f'expected "{value_type}", got "null"')))
        if fallible:
            err = _combine_err(err, F.when(out.isNull() & _mat(first).isNotNull(),
                                           _call_err(call, detail)))
        return V(out, vtype, err=err)

    return build


def _fn_length(c, args, call):
    v = args["value"]
    if v.fields is not None:
        return V(F.lit(len(v.fields)), "int")
    if v.items is not None:
        return V(F.lit(max(v.items) + 1 if v.items else 0), "int")
    col = _mat(v)
    if v.vtype == "string":
        return V(F.length(col), "int", err=v.err)
    if v.vtype == "array":
        return V(F.size(col), "int", err=v.err)
    if v.vtype == "object":
        return V(F.size(col), "int", err=v.err)  # map or struct: size works for maps
    return V(F.length(col.cast("string")), "int", err=v.err)


def _fn_merge(c, args, call):
    a, b = args["to"], args["from"]
    if a.fields is not None and b.fields is not None:
        out = dict(a.fields)
        out.update(b.fields)
        return V(None, "object", fields=out, err=_combine_err(a.err, b.err))
    if a.vtype == "object" and b.vtype == "object" and a.fields is None and b.fields is None:
        return V(F.map_concat(_mat(a), _mat(b)), "object", err=_combine_err(a.err, b.err))
    raise VrlCompileError("merge() needs two objects")


def _fn_match(c, args, call):
    v = args["value"]
    p = args["pattern"]
    if v.vtype not in ("string", "any"):
        # match() on a non-string is a runtime error (the corpus
        # fallible_op fixtures hinge on this being fallible)
        return V(F.lit(None), "bool", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, f'expected "string", got "{_VRL_TYPE[v.vtype]}"')))
    verr = v.err
    if v.vtype == "any" and c.strict:
        verr = _combine_err(verr, F.when(_mat(v).isNull(), _call_err(
            call, 'expected "string", got "null"')))
    if p.has_const:
        return V(_mat(v).rlike(p.const), "bool", err=_combine_err(verr, p.err))
    if p.vtype == "regex":  # runtime regex VALUE (a to_regex product)
        from vector_spark.functions.types import regex_match

        return V(regex_match(_mat(v), _mat(p)), "bool",
                 err=_combine_err(v.err, p.err))
    raise VrlCompileError(
        'argument "pattern" of match() must be a regex literal or a '
        "to_regex() value")


def _fn_replace(c, args, call):
    pattern = _need_const(args, "pattern", call)
    with_ = args["with"]
    v = args["value"]
    wcol = with_.const if with_.has_const else None
    if wcol is None:
        raise VrlCompileError('replace() "with" must be a literal')
    return V(F.regexp_replace(_mat(v), pattern, wcol), "string", err=v.err)


def _fn_slice(c, args, call):
    from vector_spark.functions.strings import slice_

    v = args["value"]
    if v.vtype not in ("string", "array", "any") and v.items is None:
        return V(F.lit(None), "any", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, f'expected "string" or "array", got '
                           f'"{_VRL_TYPE[v.vtype]}"')))
    start = _need_const(args, "start", call) or 0
    end = _need_const(args, "end", call)
    if v.vtype == "array" or v.items is not None:
        # array slice (0-based, end exclusive) — F.slice is 1-based
        length = (end - start) if end is not None else (1 << 30)
        return V(F.slice(_mat(v), start + 1, length), "array", err=v.err)
    return V(slice_(_mat(v), start, end), "string", err=v.err)


def _fn_includes(c, args, call):
    v, item = args["value"], args["item"]
    return V(F.array_contains(_mat(v), _mat(item)), "bool", err=_combine_err(v.err, item.err))


def _fn_push(c, args, call):
    v, item = args["value"], args["item"]
    if v.vtype not in ("array", "any") and v.items is None:
        return V(F.lit(None), "array", err_always=v.err is None,
                 err=_combine_err(v.err, _call_err(
                     call, f'expected "array", got "{_VRL_TYPE[v.vtype]}"')))
    if v.items is not None:
        items = dict(v.items)
        items[(max(items) + 1) if items else 0] = item
        return V(None, "array", items=items, err=_combine_err(v.err, item.err))
    return V(F.concat(_mat(v), F.array(_mat(item))), "array", err=_combine_err(v.err, item.err))


def _fn_append(c, args, call):
    v, it = args["value"], args["items"]
    for side in (v, it):
        if side.vtype not in ("array", "any") and side.items is None:
            return V(F.lit(None), "array", err_always=side.err is None,
                     err=_combine_err(side.err, _call_err(
                         call, f'expected "array", got "{_VRL_TYPE[side.vtype]}"')))
    if v.items is not None and it.items is not None:
        # concrete arrays concatenate item-wise, preserving per-item
        # types (heterogeneous results stay typed — array_type_def.vrl)
        items = {i: x for i, x in enumerate(
            [v.items.get(i, _null()) for i in range(max(v.items) + 1 if v.items else 0)]
            + [it.items.get(i, _null()) for i in range(max(it.items) + 1 if it.items else 0)])}
        return V(None, "array", items=items, err=_combine_err(v.err, it.err))
    return V(F.concat(_mat(v), _mat(it)), "array", err=_combine_err(v.err, it.err))


def _fn_assert(c, args, call):
    cond = args["condition"]
    msg = args.get("message")
    detail = msg.const if (msg is not None and msg.has_const) else "assertion failed"
    err = F.when(~F.coalesce(_mat(cond), F.lit(False)), _call_err(call, str(detail)))
    return V(F.lit(True), "bool", err=_combine_err(cond.err, err))


def _fn_compact(c, args, call):
    """compact works on arrays AND objects (compact.rs): null (and, for
    objects with known fields, statically-null) entries are dropped.
    Per-row-dynamic null fields can't leave a fixed schema — documented
    divergence of the single-schema model."""
    v = args["value"]
    if v.fields is not None:
        kept = {k: f for k, f in v.fields.items()
                if not (f.vtype == "null" or (f.has_const and f.const is None))}
        return V(None, "object", fields=kept, err=v.err)
    if v.vtype == "object" and v.col is not None:
        return V(F.map_filter(v.col, lambda _, x: x.isNotNull()), "object", err=v.err)
    from vector_spark.functions import strings as S

    return V(S.compact(_mat(v)), "array", err=v.err)


def _fn_encode_json(c, args, call):
    v = args["value"]
    return V(F.to_json(_mat(v)), "string", err=v.err)


def _fn_format_timestamp(c, args, call):
    fmt = _need_const(args, "format", call)
    v = args["value"]
    return V(F.date_format(_mat(v), _strptime_to_spark(fmt)), "string", err=v.err)


def _fn_split(c, args, call):
    from vector_spark.functions.strings import split_

    pattern = _need_const(args, "pattern", call)
    limit = _need_const(args, "limit", call) or -1
    v = args["value"]
    return V(split_(_mat(v), pattern, limit), "array", err=v.err)


def _fn_ip_cidr_contains(c, args, call):
    from vector_spark.functions.ip import ip_cidr_contains

    cidr = _need_const(args, "cidr", call)
    v = args["value"]
    # signature is (address_column, cidr_literal) — ip.py:39
    out = ip_cidr_contains(_mat(v), cidr)
    err = v.err
    if v.vtype not in ("string", "any"):
        return V(F.lit(None), "bool", err_always=err is None,
                 err=_combine_err(err, _call_err(
                     call, f'expected "string", got "{_VRL_TYPE[v.vtype]}"')))
    return V(out, "bool", err=err)


def _str_pred(method: str):
    """contains/starts_with/ends_with with the case_sensitive arg."""

    def build(c, args, call):
        v, sub = args["value"], args["substring"]
        if c.strict and v.vtype not in ("string", "any"):
            # the reference rejects non-string values at compile time
            # (merge/type_defs_wrong.vrl: "invalid argument type")
            raise VrlCompileError(
                f"invalid argument type: {call.name}() value must be a "
                f"string, got {_VRL_TYPE[v.vtype]}")
        cs = args.get("case_sensitive")
        case_sensitive = cs.const if (cs is not None and cs.has_const) else True
        col, s = _mat(v), _mat(sub)
        if not case_sensitive:
            col, s = F.lower(col), F.lower(s)
        out = getattr(col, method)(s)
        return V(out, "bool", err=_combine_err(v.err, sub.err))

    return build


def _fn_tag_types_externally(c, args, call):
    """tag_types_externally (lib/vrl/stdlib): wrap each scalar in a
    one-key object named after its type; containers tag recursively;
    null stays null. Types are static here, so tagging happens entirely
    at compile time."""
    names = {"int": "integer", "float": "float", "string": "string",
             "bool": "boolean", "timestamp": "timestamp", "regex": "regex"}

    def tag(v: V) -> V:
        if v.vtype == "null":
            return _null()
        if v.fields is not None:
            return V(None, "object", fields={k: tag(x) for k, x in v.fields.items()},
                     err=v.err)
        if v.items is not None:
            return V(None, "array", items={i: tag(x) for i, x in v.items.items()},
                     err=v.err)
        name = names.get(v.vtype)
        if name is None:
            raise VrlCompileError(
                "tag_types_externally needs a statically typed value "
                f"(got {v.vtype})")
        return V(None, "object", fields={name: v}, err=v.err)

    return tag(args["value"])


def _fn_reverse_dns(c, args, call):
    from vector_spark.functions.ip import reverse_dns

    v = args["value"]
    out = reverse_dns()(_mat(v))
    err = F.when(out.isNull(), _call_err(call, "unable to resolve PTR record"))
    return V(out, "string", err=_combine_err(v.err, err))


def _pyval_vtype(x) -> str:
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, int):
        return "int"
    if isinstance(x, float):
        return "float"
    return "string"


def _enrichment_map(c, tname: str, cond: V, call: P.Call, grouped: bool):
    """Shared lookup-plan builder for get/find_enrichment_table_records:
    the (small, broadcast-class) table becomes a map LITERAL keyed by
    the single condition column — a broadcast hash lookup expressed as
    one Column, no join or shuffle. Big enrichment joins belong to the
    `enrich` transform (broadcast hash join); this is the VRL-expression
    path for genuinely small tables (src/enrichment_tables/file.rs)."""
    rows = (c.enrichment or {}).get(tname)
    if rows is None:
        raise VrlCompileError(f"unknown enrichment table {tname!r}")
    if not rows:
        raise VrlCompileError(f"enrichment table {tname!r} is empty")
    if cond.fields is None or len(cond.fields) != 1:
        raise VrlCompileError(
            f"{call.name} supports a single-column equality condition")
    key, keyv = next(iter(cond.fields.items()))
    if key not in rows[0]:
        raise VrlCompileError(f"condition column {key!r} not in table {tname!r}")
    columns = list(rows[0].keys())

    def row_struct(r):
        return F.struct(*[F.lit(r[col]).alias(col) for col in columns])

    groups: dict = {}
    for r in rows:
        groups.setdefault(r[key], []).append(r)
    pairs = []
    for k, grp in groups.items():
        if not grouped and len(grp) > 1:
            raise VrlCompileError(
                f"{call.name}: condition column {key!r} is not unique in "
                f"{tname!r}; use find_enrichment_table_records")
        val = F.array(*[row_struct(r) for r in grp]) if grouped else row_struct(grp[0])
        pairs += [F.lit(k), val]
    looked = F.element_at(F.create_map(*pairs), _mat(keyv))
    return looked, columns, groups


def _fn_get_enrichment_record(c, args, call):
    tname = _need_const(args, "table", call)
    cond = args["condition"]
    looked, columns, groups = _enrichment_map(c, tname, cond, call, grouped=False)
    sample = next(iter(groups.values()))[0]
    fields = {col: V(looked[col], _pyval_vtype(sample[col])) for col in columns}
    err = F.when(looked.isNull(), _call_err(call, "no record found"))
    return V(looked, "object", fields=fields, err=_combine_err(cond.err, err))


def _fn_find_enrichment_records(c, args, call):
    tname = _need_const(args, "table", call)
    cond = args["condition"]
    looked, _, _ = _enrichment_map(c, tname, cond, call, grouped=True)
    err = F.when(looked.isNull(), _call_err(call, "no records found"))
    return V(looked, "array", err=_combine_err(cond.err, err))


def _dict_parser(fn, *extra_params: str, detail: str = "parser did not match",
                 types: dict | None = None):
    """Wrap a functions/parse.py builder returning dict[str, Column] as a
    concrete-object VRL function (parse_syslog, parse_apache_log, ...):
    the captures become compile-time object fields, fallible when every
    capture is null while the input isn't. `types` pins per-field VRL
    types (the reference's parsers return TYPED objects — their typedefs
    make e.g. sha3(parse_syslog!(x).message) infallible)."""

    def build(c, args, call):
        v = args["value"]
        col = _mat(v)
        pos = [col]
        for p in extra_params:
            if p in args:
                a = args[p]
                pos.append(a.const if a.has_const else _mat(a))
        caps = fn(*pos)
        fields = {
            name: V(cc, (types or {}).get(name, "any")
                    if isinstance(cc, Column) else "string")
            for name, cc in caps.items()
        }
        any_hit = F.lit(False)
        for cc in caps.values():
            any_hit = any_hit | cc.isNotNull()
        err = F.when(~any_hit & col.isNotNull(), _call_err(call, detail))
        return V(None, "object", fields=fields, err=_combine_err(v.err, err))

    return build


def _fn_redact(c, args, call):
    from vector_spark.functions.strings import redact

    v = args["value"]
    pats = args.get("patterns")
    if pats is None or pats.items is None:
        raise VrlCompileError("redact() needs a literal patterns array")
    patterns = []
    pat_ast = getattr(c, "arg_ast", {}).get("patterns")
    item_asts = list(pat_ast.items) if isinstance(pat_ast, P.Arr) else []
    for i, it in enumerate(pats.items.values()):
        ast_i = item_asts[i] if i < len(item_asts) else None
        if ast_i is not None and not isinstance(ast_i, (P.Lit, P.Obj, P.Arr)):
            # a variable/call isn't a static expression, however constant
            # (function_static_expression_needed → E402)
            raise VrlCompileError(
                "error[E610]: function compilation error: error[E402] "
                "this argument must be a static expression — redact() "
                "patterns can't vary per row")
        if not it.has_const:
            raise VrlCompileError(
                "error[E610]: function compilation error: error[E402] "
                "this argument must be a static expression — redact() "
                "patterns can't vary per row")
        if isinstance(it.const, (dict, list, int, float, bool)):
            raise VrlCompileError(
                "error[E610]: function compilation error: error[E403] "
                "invalid argument — redact() patterns must be regexes, "
                "strings, or known filter names")
        patterns.append(it.const)
    text = args.get("text")
    return V(
        redact(_mat(v), patterns,
               text.const if (text is not None and text.has_const) else "[REDACTED]"),
        "string", err=v.err,
    )


def _fn_log(c, args, call):
    # VRL log(): observability side effect; in a declarative plan the
    # honest mapping is a no-op returning null (documented)
    return _null()


# ---- round-5 tail: the remaining stdlib identifiers, so the VRL text
# front-end covers all 119 functions of /root/reference/lib/vrl/stdlib.

_KIND_FOR_VTYPE = {"string": "string", "int": "integer", "float": "float",
                   "bool": "boolean", "array": "array", "object": "object",
                   "timestamp": "timestamp", "regex": "regex", "null": "null"}


def _is_type_pred(kind: str):
    """is_string/is_integer/... — VRL runtime kind checks. Typed columns
    resolve at compile time; opaque 'any' values (variant-encoded JSON
    scalars) fall back to functions.types.typeof_value."""

    def build(c, args, call):
        from vector_spark.functions import types as TY

        v = args["value"]
        if v.vtype == "any":
            col = _mat(v)
            if kind == "regex":
                return V(TY.is_regex(col), "bool", err=v.err)
            if kind == "timestamp":  # the variant encoding has no timestamp kind
                return V(F.lit(False), "bool", err=v.err)
            if kind == "string":
                # schema-free parse_json members ride the stringly
                # map<string,string> encoding where string values lose
                # their quotes — bare text ('invalid' to typeof_value)
                # IS a string there. Documented knife-edge: a JSON
                # string that LOOKS numeric ('"7"') reads as integer.
                return V(TY.typeof_value(col).isin("string", "invalid"),
                         "bool", err=v.err)
            return V(TY.typeof_value(col) == kind, "bool", err=v.err)
        if kind == "null":
            if v.fields is not None or v.items is not None:
                return V(F.lit(False), "bool", err=v.err)
            return V(_mat(v).isNull(), "bool", err=v.err)
        if _KIND_FOR_VTYPE.get(v.vtype) == kind:
            if v.fields is not None or v.items is not None:
                return V(F.lit(True), "bool", err=v.err)
            return V(_mat(v).isNotNull(), "bool", err=v.err)
        return V(F.lit(False), "bool", err=v.err)

    return build


def _fn_to_regex(c, args, call):
    from vector_spark.functions import types as TY

    v = args["value"]
    if v.has_const and isinstance(v.const, str):  # fold literal patterns
        try:
            _re.compile(v.const)
        except _re.error:
            return V(F.lit(None).cast(TY.REGEX_STRUCT_DDL), "regex",
                     err=_call_err(call, "invalid regex"))
        return V(F.struct(F.lit(v.const).alias("regex")), "regex",
                 const=v.const, has_const=True)
    col = TY.to_regex(_mat(v))
    err = F.when(col["regex"].isNull() & _mat(v).isNotNull(),
                 _call_err(call, "invalid regex"))
    return V(col, "regex", err=_combine_err(v.err, err))


def _fn_assert_eq(c, args, call):
    left, right = args["left"], args["right"]
    msg = args.get("message")
    detail = str(msg.const) if (msg is not None and msg.has_const) else "assertion failed"
    err = F.when(~_mat(left).eqNullSafe(_mat(right)), _call_err(call, detail))
    return V(F.lit(True), "bool", err=_combine_err(left.err, right.err, err))


def _const_path(args: dict, call: P.Call, name: str = "path") -> tuple:
    p = args.get(name)
    if p is None or p.items is None:
        raise VrlCompileError(f"{call.name}() needs a literal path array")
    segs = []
    for i in sorted(p.items):
        it = p.items[i]
        if not it.has_const:
            raise VrlCompileError(
                f"{call.name}() path segments must be literals in the "
                f"compile-to-Column model")
        segs.append(it.const)
    return tuple(segs)


def _index_item(node: V, s: int) -> V:
    """Array element lookup with negative-from-the-end semantics
    (issues/5546_negative_indexing_arrays). An out-of-range index of a
    homogeneous concrete array keeps the ELEMENT type (the reference
    types it T|null — issues/8068: `.onk[1] + "nork"` stays fallible
    after del(.onk[0]))."""
    if node.items is not None:
        if s < 0:
            s = (max(node.items) + 1 if node.items else 0) + s
        if s >= 0 and s not in node.items:
            et = _arr_homogeneous(node.items)
            if et not in (None, "null", "any"):
                return V(F.lit(None), et, err=F.lit(
                    f'expected "{_VRL_TYPE[et]}", got null'))
        return node.items.get(s) if s >= 0 else None
    if node.vtype in ("array", "any") and node.col is not None:
        if s < 0:
            return V(F.element_at(node.col, s), "any")
        return V(F.get(node.col, s), "any")
    return None


def _alt_field(node: V, alt) -> V:
    """`.(a | b)` coalesced segment: first alternative that resolves
    (parser.lalrpop PathSegment::Coalesce)."""
    if node.fields is not None:
        hits = [node.fields[o] for o in alt.options if o in node.fields]
        if not hits:
            return _null()
        if len(hits) == 1:
            return hits[0]
        vt = "null"
        for h in hits:
            vt = _unify(vt, h.vtype)
        return V(F.coalesce(*[_mat(h) for h in hits]), vt)
    if node.vtype in ("object", "any") and node.col is not None:
        return V(F.coalesce(*[node.col.getItem(o) for o in alt.options]), "any")
    return _null()


def _walk_v(v: V, segs: tuple) -> V:
    """Descend a compiled value by path segments — the value-space twin
    of _Compiler._get_path (get.rs / the dynamic-path family)."""
    node = v
    for s in segs:
        if isinstance(s, P.Alt):
            node = _alt_field(node, s)
            continue
        if isinstance(s, int):
            node = _index_item(node, s) or _null()
            continue
        if node.fields is not None:
            node = node.fields.get(s) or _null()
        elif node.vtype in ("object", "any") and node.col is not None:
            node = V(node.col.getItem(s), "any")
        else:
            return _null()
    return node


def _fn_get(c, args, call):
    v = args["value"]
    out = _walk_v(v, _const_path(args, call))
    return V(out.col, out.vtype, err=_combine_err(v.err, out.err),
             fields=out.fields, items=out.items,
             const=out.const, has_const=out.has_const)


def _fresh_container(seg) -> V:
    kind = "array" if isinstance(seg, int) else "object"
    return V(None, kind, fields={} if kind == "object" else None,
             items={} if kind == "array" else None)


def _set_in(v: V, segs: tuple, value: V, call: P.Call) -> V:
    s = segs[0]
    if isinstance(s, P.Alt):
        # insert through a coalesced segment: first statically-present
        # alternative, else the LAST (pinned by the corpus
        # single_{variable,external}_complex fixtures where
        # `.(qux | "quux qux")` creates "quux qux")
        s = s.options[-1]
        if v.fields is not None:
            for o in segs[0].options:
                if o in v.fields:
                    s = o
                    break
        segs = (s,) + segs[1:]
    if isinstance(s, int):
        if v.items is None and v.col is not None and v.vtype in ("array", "any"):
            raise VrlCompileError(
                "set() into an opaque array needs known elements in the "
                "compile-to-Column model")
        # a non-array value is REPLACED by a fresh array
        # (insert.rs / corpus assignment/indexing.vrl: `v1 = 0; v1[1] = 1`)
        items = dict(v.items or {})
        length = (max(items) + 1) if items else 0
        if s < 0:
            idx = length + s
            if idx < 0:
                # prepend-resize: old elements shift right, implicit
                # nulls pad the gap ([] with [-2] → [x, null])
                shift = -idx
                items = {i + shift: it for i, it in items.items()}
                anchor = length + shift - 1
                if anchor >= 0 and anchor not in items:
                    items[anchor] = _null()
                s = 0
            else:
                s = idx
        if len(segs) == 1:
            items[s] = value
        else:
            child = items.get(s)
            if child is None or (child.fields is None and child.items is None):
                child = _fresh_container(segs[1])
            items[s] = _set_in(child, segs[1:], value, call)
        return V(None, "array", items=items, err=v.err)
    if v.fields is None and v.col is not None and v.vtype == "object":
        raise VrlCompileError(
            "set() into an opaque object needs known fields in the "
            "compile-to-Column model (parse with a schema first)")
    fields = dict(v.fields or {})
    if len(segs) == 1:
        fields[s] = value
    else:
        child = fields.get(s)
        if child is None or (child.fields is None and child.items is None):
            child = _fresh_container(segs[1])
        fields[s] = _set_in(child, segs[1:], value, call)
    return V(None, "object", fields=fields, err=v.err)


def _fn_set(c, args, call):
    return _set_in(args["value"], _const_path(args, call),
                   args["data"], call)


def _fn_remove(c, args, call):
    v = args["value"]
    segs = _const_path(args, call)
    *parent_segs, last = segs
    if not parent_segs and v.fields is None and v.col is not None \
            and v.vtype in ("object", "any") and isinstance(last, str):
        # opaque map: drop the key as an expression
        out = F.map_filter(v.col, lambda k, _: k != F.lit(last))
        return V(out, "object", err=v.err)
    parent = _walk_v(v, tuple(parent_segs)) if parent_segs else v
    if isinstance(last, str):
        if parent.fields is None:
            raise VrlCompileError(
                "remove() needs an object with known fields at the path")
        fields = {k: f for k, f in parent.fields.items() if k != last}
        pruned = V(None, "object", fields=fields, err=v.err)
    else:
        if parent.items is None:
            raise VrlCompileError(
                "remove() needs an array with known items at the path")
        items = {i: it for i, it in parent.items.items() if i != last}
        pruned = V(None, "array", items=items, err=v.err)
    if not parent_segs:
        return pruned
    return _set_in(v, tuple(parent_segs), pruned, call)


def _fn_only_fields(c, args, call):
    """only_fields (only_fields.rs): keep only the named top-level event
    fields — a side effect on the program's root environment."""
    keep = set()
    p = args.get("paths")
    if p is None or p.items is None:
        raise VrlCompileError("only_fields() needs a literal array of field names")
    for i in sorted(p.items):
        it = p.items[i]
        if not it.has_const or not isinstance(it.const, str):
            raise VrlCompileError("only_fields() field names must be string literals")
        keep.add(it.const)
    for name in list(c.root):
        if name not in keep:
            c.root.pop(name)
            c.deleted.add(name)
    return V(F.lit(True), "bool")


def _fn_match_any(c, args, call):
    v = args["value"]
    pats = args.get("patterns")
    if pats is None or pats.items is None:
        raise VrlCompileError("match_any() needs a literal patterns array")
    col = _mat(v)
    out = F.lit(False)
    for i in sorted(pats.items):
        it = pats.items[i]
        if not it.has_const:
            raise VrlCompileError("match_any() patterns must be regex literals")
        out = out | col.rlike(it.const)
    return V(out, "bool", err=v.err)


def _fn_match_array(c, args, call):
    v = args["value"]
    pattern = _need_const(args, "pattern", call)
    want_all = args.get("all")
    all_const = bool(want_all.const) if (want_all is not None and want_all.has_const) else False
    col = _mat(v)
    if all_const:
        out = F.forall(col, lambda x: x.cast("string").rlike(pattern))
    else:
        out = F.exists(col, lambda x: x.cast("string").rlike(pattern))
    return V(out, "bool", err=v.err)


def _fn_match_datadog_query(c, args, call):
    from vector_spark.functions.datadog_search import datadog_search

    v = args["value"]
    query = _need_const(args, "query", call)
    if v.fields is None:
        raise VrlCompileError(
            "match_datadog_query() needs an object value (pass the event: `.`)")

    def resolve(name: str) -> Column:
        return _mat(_walk_v(v, tuple(name.split("."))))

    return V(datadog_search(query, resolve), "bool", err=v.err)


def _fn_encode_kv(delimited: bool):
    def build(c, args, call):
        from vector_spark.functions import strings as S

        v = args["value"]
        if v.fields is None:
            raise VrlCompileError(
                f"{call.name}() needs an object with known fields in the "
                f"compile-to-Column model")
        cols = {k: _mat(f) for k, f in v.fields.items()}
        if delimited:
            fd = _need_const(args, "field_delimiter", call) or " "
            kvd = _need_const(args, "key_value_delimiter", call) or "="
            return V(S.encode_key_value(cols, fd, kvd), "string", err=v.err)
        return V(S.encode_logfmt(cols), "string", err=v.err)

    return build


_CLF_RX = (r'^(?<host>\S+) (?<identity>\S+) (?<user>\S+) '
           r'\[(?<timestamp>[^\]]+)\] "(?<message>(?<method>\S+) (?<path>\S+) '
           r'(?<protocol>[^"]+))" (?<status>\d+) (?<size>\d+)')


def _fn_parse_common_log(c, args, call):
    """parse_common_log (parse_common_log.rs): typed captures with the
    reference's field set — `message` is the raw request line, protocol
    keeps its HTTP/ prefix, and a `-` identity/user parses as absent."""
    v = args["value"]
    col = _mat(v)
    hit = col.rlike(_CLF_RX)

    def cap(name):
        return F.when(hit, F.regexp_extract(col, _CLF_RX, _CLF_GROUPS[name]))

    def dash_null(name):
        c_ = cap(name)
        return F.when(c_ != "-", c_)

    ts = F.to_timestamp(cap("timestamp"), "dd/MMM/yyyy:HH:mm:ss Z")
    fields = {
        "host": V(dash_null("host"), "string"),
        "identity": V(dash_null("identity"), "string"),
        "user": V(dash_null("user"), "string"),
        "timestamp": V(ts, "timestamp"),
        "message": V(cap("message"), "string"),
        "method": V(cap("method"), "string"),
        "path": V(cap("path"), "string"),
        "protocol": V(cap("protocol"), "string"),
        "status": V(cap("status").cast("long"), "int"),
        "size": V(cap("size").cast("long"), "int"),
    }
    err = F.when(~F.coalesce(hit, F.lit(False)),
                 _call_err(call, "failed parsing common log line"))
    return V(None, "object", fields=fields, err=_combine_err(v.err, err))


_CLF_GROUPS = {"host": 1, "identity": 2, "user": 3, "timestamp": 4,
               "message": 5, "method": 6, "path": 7, "protocol": 8,
               "status": 9, "size": 10}


def _fn_parse_nginx_log(c, args, call):
    from vector_spark.functions import parse as PF

    fmt = _need_const(args, "format", call) or "combined"
    fn = {"combined": PF.parse_nginx_combined_log,
          "error": PF.parse_nginx_error_log}.get(fmt)
    if fn is None:
        raise VrlCompileError(f'parse_nginx_log() format must be "combined" or "error", got {fmt!r}')
    return _dict_parser(fn)(c, args, call)


def _fn_tally(c, args, call):
    from vector_spark.functions.strings import tally

    v = args["value"]
    return V(tally(_mat(v)), "object", err=v.err)


def _registry():
    from vector_spark.functions import ip as IP
    from vector_spark.functions import parse as PF
    from vector_spark.functions import strings as S

    def parse_apache(col, fmt="common"):
        # reference parse_apache_log takes format common|combined|error;
        # the shared builder handles common/combined field supersets
        return PF.parse_apache_log(col)

    r: dict[str, tuple[tuple[str, ...], object]] = {
        # type conversion / assertion
        "to_string": (("value",), _fn_to_string),
        "to_int": (("value",), _fn_to_int),
        "to_float": (("value",), _fn_to_float),
        "to_bool": (("value",), _fn_to_bool),
        "to_timestamp": (("value",), _fn_to_timestamp),
        "string": (("value",), _assert_type("string")),
        "int": (("value",), _assert_type("int")),
        "float": (("value",), _assert_type("float")),
        "bool": (("value",), _assert_type("bool")),
        "object": (("value",), _assert_type("object")),
        "array": (("value",), _assert_type("array")),
        "timestamp": (("value",), _assert_type("timestamp")),
        # strings
        "upcase": (("value",), _simple(S.upcase, "string", "value",
                                       value_type="string")),
        "downcase": (("value",), _simple(S.downcase, "string", "value",
                                         value_type="string")),
        "strip_whitespace": (("value",), _simple(S.strip_whitespace, "string", "value")),
        "strip_ansi_escape_codes": (("value",), _simple(S.strip_ansi_escape_codes, "string", "value")),
        "truncate": (("value", "limit", "ellipsis"), _simple(S.truncate, "string", "value", "limit", "ellipsis")),
        "replace": (("value", "pattern", "with"), _fn_replace),
        "slice": (("value", "start", "end"), _fn_slice),
        "split": (("value", "pattern", "limit"), _fn_split),
        "join": (("value", "separator"), _simple(S.join_, "string", "value", "separator")),
        "contains": (("value", "substring", "case_sensitive"), _str_pred("contains")),
        "starts_with": (("value", "substring", "case_sensitive"), _str_pred("startswith")),
        "ends_with": (("value", "substring", "case_sensitive"), _str_pred("endswith")),
        "match": (("value", "pattern"), _fn_match),
        "find": (("value", "substring"), _simple(S.find, "int", "value", "substring")),
        "length": (("value",), _fn_length),
        "strlen": (("value",), _simple(F.length, "int", "value")),
        "is_nullish": (("value",), _simple(S.is_nullish, "bool", "value")),
        # numbers
        "ceil": (("value", "precision"), _simple(S.ceil_, "float", "value", "precision")),
        "floor": (("value", "precision"), _simple(S.floor_, "float", "value", "precision")),
        "round": (("value", "precision"), _simple(S.round_, "float", "value", "precision")),
        "abs": (("value",), _simple(F.abs, "float", "value")),
        "format_number": (("value", "scale"), _simple(S.format_number, "string", "value", "scale")),
        "format_int": (("value", "base"), _simple(S.format_int, "string", "value", "base")),
        # crypto / ids
        "md5": (("value",), _simple(S.md5_, "string", "value",
                                    value_type="string")),
        "sha1": (("value",), _simple(S.sha1_, "string", "value",
                                     value_type="string")),
        "sha2": (("value", "variant"), _simple(_sha_fn(S.sha2_, 256), "string",
                                               "value", "variant",
                                               value_type="string")),
        "sha3": (("value", "variant"), _simple(_sha_fn(S.sha3_, 512), "string",
                                               "value", "variant",
                                               value_type="string")),
        "uuid_v4": ((), lambda c, a, call: V(S.uuid_v4(), "string")),
        "now": ((), lambda c, a, call: V(F.current_timestamp(), "timestamp")),
        "get_hostname": ((), lambda c, a, call: V(S.get_hostname(), "string")),
        "get_env_var": (("name",), lambda c, a, call: V(
            S.get_env_var(_need_const(a, "name", call)), "string")),
        # codecs
        "encode_base64": (("value",), _simple(S.encode_base64, "string", "value")),
        "decode_base64": (("value",), _simple(S.decode_base64, "string", "value",
                                              fallible=True, detail="unable to decode base64")),
        "encode_json": (("value",), _fn_encode_json),
        # parsers
        "parse_json": (("value", "schema"), _fn_parse_json),
        "parse_regex": (("value", "pattern", "numeric_groups"), _fn_parse_regex),
        "parse_grok": (("value", "pattern"), _fn_parse_grok),
        "parse_key_value": (("value", "key_value_delimiter", "field_delimiter"), _fn_parse_key_value),
        "parse_timestamp": (("value", "format"), _fn_parse_timestamp),
        "format_timestamp": (("value", "format"), _fn_format_timestamp),
        "to_unix_timestamp": (("value",), _simple(S.to_unix_timestamp, "int", "value")),
        "to_syslog_level": (("value",), _simple(S.to_syslog_level, "string", "value")),
        "to_syslog_facility": (("value",), _simple(S.to_syslog_facility, "string", "value")),
        "to_syslog_severity": (("value",), _simple(S.to_syslog_severity, "int", "value")),
        # arrays / objects
        "includes": (("value", "item"), _fn_includes),
        "push": (("value", "item"), _fn_push),
        "append": (("value", "items"), _fn_append),
        "compact": (("value",), _fn_compact),
        "unique": (("value",), _simple(S.unique, "array", "value")),
        "flatten": (("value",), _simple(S.flatten_, "array", "value")),
        "merge": (("to", "from"), _fn_merge),
        # wider parser family — dict-returning builders → object values
        "parse_syslog": (("value",), _dict_parser(
            PF.parse_syslog,
            detail="unable to parse input as valid syslog message",
            types={"message": "string", "appname": "string",
                   "hostname": "string", "msgid": "string"})),
        "parse_apache_log": (("value", "format"), _dict_parser(parse_apache)),
        "parse_common_log": (("value",), _fn_parse_common_log),
        "parse_glog": (("value",), _dict_parser(PF.parse_glog)),
        "parse_aws_alb_log": (("value",), _dict_parser(PF.parse_aws_alb_log)),
        "parse_aws_vpc_flow_log": (("value",), _dict_parser(PF.parse_aws_vpc_flow_log)),
        "parse_user_agent": (("value",), _dict_parser(PF.parse_user_agent)),
        "parse_linux_authorization": (("value",), _dict_parser(PF.parse_linux_authorization)),
        "parse_url": (("value",), _simple(PF.parse_url, "object", "value",
                                          fallible=True, detail="unable to parse url")),
        "parse_query_string": (("value",), _simple(PF.parse_query_string, "object", "value")),
        "parse_logfmt": (("value",), _simple(PF.parse_logfmt, "object", "value")),
        "parse_tokens": (("value",), _simple(PF.parse_tokens, "array", "value")),
        "parse_int": (("value", "base"), _simple(PF.parse_int, "int", "value", "base",
                                                 fallible=True, detail="unable to parse int")),
        "parse_duration": (("value", "unit"), _simple(
            PF.parse_duration, "float", "value", "unit",
            fallible=True, detail="unable to parse duration")),
        "parse_csv": (("value", "schema", "delimiter"), _simple(
            PF.parse_csv, "object", "value", "schema", "delimiter")),
        "redact": (("value", "patterns", "text"), _fn_redact),
        "log": (("value", "level"), _fn_log),
        # ip family
        "ip_aton": (("value",), _simple(IP.ip_aton, "int", "value",
                                        fallible=True, detail="unable to parse IP address")),
        "ip_ntoa": (("value",), _simple(IP.ip_ntoa, "string", "value")),
        "ip_subnet": (("value", "subnet"), _simple(IP.ip_subnet, "string", "value", "subnet")),
        "ip_to_ipv6": (("value",), _simple(IP.ip_to_ipv6, "string", "value")),
        "ipv6_to_ipv4": (("value",), _simple(IP.ipv6_to_ipv4, "string", "value",
                                             fallible=True, detail="not a mapped ipv4")),
        # misc
        "assert": (("condition", "message"), _fn_assert),
        "ip_cidr_contains": (("cidr", "value"), _fn_ip_cidr_contains),
        "tag_types_externally": (("value",), _fn_tag_types_externally),
        "reverse_dns": (("value",), _fn_reverse_dns),
        "get_enrichment_table_record": (
            ("table", "condition", "select", "case_sensitive"), _fn_get_enrichment_record),
        "find_enrichment_table_records": (
            ("table", "condition", "select", "case_sensitive"), _fn_find_enrichment_records),
        # round-5 tail — the remaining stdlib identifiers
        "assert_eq": (("left", "right", "message"), _fn_assert_eq),
        "is_string": (("value",), _is_type_pred("string")),
        "is_integer": (("value",), _is_type_pred("integer")),
        "is_float": (("value",), _is_type_pred("float")),
        "is_boolean": (("value",), _is_type_pred("boolean")),
        "is_array": (("value",), _is_type_pred("array")),
        "is_object": (("value",), _is_type_pred("object")),
        "is_null": (("value",), _is_type_pred("null")),
        "is_timestamp": (("value",), _is_type_pred("timestamp")),
        "is_regex": (("value",), _is_type_pred("regex")),
        "to_regex": (("value",), _fn_to_regex),
        "get": (("value", "path"), _fn_get),
        "set": (("value", "path", "data"), _fn_set),
        "remove": (("value", "path", "compact"), _fn_remove),
        "only_fields": (("paths",), _fn_only_fields),
        "match_any": (("value", "patterns"), _fn_match_any),
        "match_array": (("value", "pattern", "all"), _fn_match_array),
        "match_datadog_query": (("value", "query"), _fn_match_datadog_query),
        "encode_logfmt": (("value",), _fn_encode_kv(False)),
        "encode_key_value": (
            ("value", "field_delimiter", "key_value_delimiter"), _fn_encode_kv(True)),
        "encode_percent": (("value", "ascii_set"), _simple(
            S.encode_percent, "string", "value", "ascii_set")),
        "decode_percent": (("value",), _simple(S.decode_percent, "string", "value")),
        "tally": (("value",), _fn_tally),
        "parse_klog": (("value",), _dict_parser(PF.parse_klog)),
        "parse_nginx_log": (("value", "format"), _fn_parse_nginx_log),
        "parse_regex_all": (("value", "pattern", "group"), _simple(
            PF.parse_regex_all, "array", "value", "pattern", "group")),
        "parse_ruby_hash": (("value", "schema"), _simple(
            PF.parse_ruby_hash, "object", "value", "schema",
            fallible=True, detail="unable to parse ruby hash")),
        "parse_xml": (("value", "schema"), _simple(
            PF.parse_xml, "object", "value", "schema",
            fallible=True, detail="unable to parse xml")),
        "parse_aws_cloudwatch_log_subscription_message": (("value",), _simple(
            PF.parse_cloudwatch_subscription, "object", "value",
            fallible=True, detail="unable to parse cloudwatch message")),
    }
    return r


_REGISTRY = None


def registry():
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _registry()
    return _REGISTRY


# --------------------------------------------------------- compiler
class _Compiler:
    def __init__(self, schema: T.StructType, enrichment: dict | None = None,
                 strict: bool = False):
        self.schema = schema
        self.enrichment = enrichment or {}
        self.strict = strict
        self.root: dict[str, V] = {}
        for f in schema.fields:
            self.root[f.name] = self._leaf(_qcol(f.name), f.dataType)
        self.vars: dict[str, V] = {}
        self.err_flag: Column = F.lit(False)
        self.err_msg: Column = F.lit(None).cast("string")
        self.abort_flag: Column = F.lit(False)
        self.can_fail = False
        self.can_abort = False
        self.emit_array: V | None = None
        self.unnest_field: str | None = None
        self.deleted: set[str] = set()
        self._cur_cond: Column | None = None  # gate of the enclosing stmt
        self.aborted_const = False  # an unconditional abort has run

    def _leaf(self, col: Column, dt: T.DataType) -> V:
        if isinstance(dt, T.StructType):
            return V(col, "object",
                     fields={f.name: self._leaf(col.getField(f.name), f.dataType)
                             for f in dt.fields})
        return V(col, _spark_to_vtype(dt))

    # ---- environment paths
    def _get_path(self, segs: tuple) -> V:
        node: V | dict = self.root
        for s in segs:
            if isinstance(node, dict):  # the root field map
                if isinstance(s, P.Alt):
                    node = V(None, "object", fields=dict(node))
                    node = _alt_field(node, s)
                    continue
                if not isinstance(s, str) or s not in node:
                    return _null()
                node = node[s]
                continue
            if isinstance(s, P.Alt):
                node = _alt_field(node, s)
                continue
            if isinstance(s, int):
                got = _index_item(node, s)
                if got is None:
                    return _null()
                node = got
                continue
            # string segment; getItem resolves struct fields AND map keys
            if node.fields is not None:
                if s not in node.fields:
                    return _null()
                node = node.fields[s]
            elif node.vtype in ("object", "any") and node.col is not None:
                node = V(node.col.getItem(s), "any")
            else:
                return _null()
        if isinstance(node, dict):  # bare "." — whole event
            return V(None, "object", fields=dict(node))
        return node

    def _set_path(self, segs: tuple, value: V, cond: Column | None):
        if not segs:
            raise VrlCompileError("root assignment handled by caller")
        if cond is not None:
            old = self._get_path(segs)
            newcol = F.when(cond, _mat(value)).otherwise(_mat(old))
            value = V(newcol, _unify(value.vtype, old.vtype))
        first = segs[0]
        if isinstance(first, P.Alt):
            chosen = first.options[-1]
            for o in first.options:
                if o in self.root:
                    chosen = o
                    break
            first = chosen
        if isinstance(first, int):
            raise VrlCompileError("cannot index the event root")
        if len(segs) == 1:
            self.root[first] = value
            self.deleted.discard(first)
            return
        cur = self.root.get(first)
        if cur is None or (cur.fields is None and cur.items is None
                           and cur.col is None):
            cur = _fresh_container(segs[1])
        elif cur.fields is None and cur.items is None and cur.col is not None \
                and cur.vtype == "object":
            # opaque struct w/o schema expansion: replace
            cur = V(None, "object", fields={})
        self.root[first] = _set_in(cur, segs[1:], value,
                                   P.Call("set", (), False, 0, 0))
        self.deleted.discard(first)

    # ---- expressions
    def expr(self, e) -> V:
        if isinstance(e, P.Lit):
            if e.kind == "null":
                return _null()
            if e.kind == "regex":
                try:
                    _re.compile(e.value)
                except _re.error as rex:
                    raise VrlCompileError(
                        f"error[E101]: invalid regular expression — "
                        f"regex parse error: {rex}") from None
                return V(F.lit(e.value), "regex", const=e.value, has_const=True)
            if e.kind == "timestamp":
                from datetime import datetime

                try:
                    datetime.fromisoformat(str(e.value).replace("Z", "+00:00"))
                except ValueError:
                    raise VrlCompileError(
                        "error[E601]: invalid timestamp — input contains "
                        "invalid characters") from None
                return V(F.to_timestamp(F.lit(e.value)), "timestamp",
                         const=e.value, has_const=True)
            return _from_python(e.value)
        if isinstance(e, P.Arr):
            items = {i: self.expr(x) for i, x in enumerate(e.items)}
            const_ok = all(it.has_const for it in items.values())
            return V(None, "array", items=items, has_const=const_ok,
                     const=[items[i].const for i in sorted(items)] if const_ok else None)
        if isinstance(e, P.Obj):
            fields = {k: self.expr(x) for k, x in e.pairs}
            const_ok = all(f.has_const for f in fields.values())
            return V(None, "object", fields=fields, has_const=const_ok,
                     const={k: f.const for k, f in fields.items()} if const_ok else None)
        if isinstance(e, P.Path):
            return self._get_path(e.segments)
        if isinstance(e, P.Var):
            if e.name not in self.vars:
                if self.strict:
                    raise VrlCompileError(
                        f"error[E701]: call to undefined variable — "
                        f"{e.name!r} is not bound")
                return _null()
            return self.vars[e.name]
        if isinstance(e, P.Member):
            base = self.expr(e.base)
            return self._walk(base, e.segments)
        if isinstance(e, P.Un):
            return self._unary(e)
        if isinstance(e, P.Bin):
            return self._binary(e)
        if isinstance(e, P.Call):
            return self._call(e)
        if isinstance(e, P.IfExpr):
            return self._if_expr(e)
        if isinstance(e, P.Block):
            # block/group value: run the statements, value = the last
            # (ast.rs Block; corpus expressions/block/*)
            v = _null()
            for st in e.stmts:
                v = self.stmt_value(st, self._cur_cond)
            return v
        raise VrlCompileError(f"unsupported expression node {type(e).__name__}")

    def _if_expr(self, e: P.IfExpr) -> V:
        """`if` in expression position (ast.rs: IfStatement IS an
        expression — `x = if .a { .b } else { .c }`): each block's value
        is its final expression; the whole thing compiles to ONE when()
        chain, so it stays a codegen-friendly Column. Leading block
        statements may bind VARIABLES (gated on the branch condition via
        the normal stmt() machinery) but not event paths — conditional
        event mutation belongs to statement-position `if`, which already
        handles it."""
        branches: list[tuple[Column, V]] = []
        not_prior: Column | None = None
        for c_expr, block in e.clauses:
            cv = self.expr(c_expr)
            if cv.err is not None:
                self._raise_err(cv.err, not_prior)
            ccol = F.coalesce(_mat(cv), F.lit(False))
            gate = ccol if not_prior is None else (not_prior & ccol)
            branches.append((gate, self._gated_block_value(block, gate)))
            not_prior = (~ccol) if not_prior is None else (not_prior & ~ccol)
        other = (
            self._gated_block_value(e.otherwise, not_prior)
            if e.otherwise is not None
            else _null()
        )
        vt = other.vtype
        for _, bv in branches:
            vt = _unify(vt, bv.vtype)
        result = _mat(other)
        for gate, bv in reversed(branches):
            result = F.when(gate, _mat(bv)).otherwise(result)
        err = None
        if other.err is not None or any(bv.err is not None for _, bv in branches):
            err = other.err if other.err is not None else F.lit(None).cast("string")
            for gate, bv in reversed(branches):
                berr = bv.err if bv.err is not None else F.lit(None).cast("string")
                err = F.when(gate, berr).otherwise(err)
        return V(result, vt, err=err)

    def _gated_block_value(self, block: tuple, gate: Column | None) -> V:
        """_block_value with the branch gate ALSO pushed onto _cur_cond,
        so a bang-call error raised inside an untaken branch stays gated
        (the filter.toml behavior fixture's `if exists(.tags) {
        string!(.tags.message) }` hinges on this)."""
        prev = self._cur_cond
        if gate is not None:
            self._cur_cond = gate if prev is None else (prev & gate)
        try:
            return self._block_value(block, gate)
        finally:
            self._cur_cond = prev

    def _block_value(self, block: tuple, gate: Column | None) -> V:
        """A block in VALUE position: leading statements run gated on the
        branch condition (variable binds / fallible bare expressions);
        the final statement must be an expression — its value is the
        block's value."""
        if not block:
            return _null()
        *init, last = block
        for st in init:
            if isinstance(st, P.Assign) and not (
                isinstance(st.target, P.Var)
                and (st.err_target is None or isinstance(st.err_target, P.Var))
            ):
                raise VrlCompileError(
                    "event-path assignment inside an expression-position if "
                    "block is not supported (use a statement-position if)")
            if isinstance(st, (P.If, P.Abort)):
                raise VrlCompileError(
                    "only variable binds and expressions may precede the "
                    "value expression in an expression-position if block")
            self.stmt(st, gate)
        if isinstance(last, (P.Assign, P.If, P.Abort)):
            raise VrlCompileError(
                "an expression-position if block must end with an expression")
        return self.expr(last)

    def _walk(self, base: V, segs: tuple) -> V:
        node = base
        for s in segs:
            if isinstance(s, P.Alt):
                got = _alt_field(node, s)
                node = V(got.col, got.vtype, err=node.err,
                         fields=got.fields, items=got.items)
            elif isinstance(s, int):
                if node.items is not None or node.vtype in ("array", "any"):
                    got = _index_item(node, s) or _null()
                    node = V(got.col, got.vtype, err=node.err,
                             fields=got.fields, items=got.items)
                else:
                    node = V(F.get(_mat(node), s), "any", err=node.err)
            else:
                if node.fields is not None:
                    node = node.fields.get(s, _null())
                elif node.vtype == "object" and node.col is not None:
                    # getItem resolves struct fields AND map keys
                    node = V(node.col.getItem(s), "any", err=node.err)
                else:
                    node = V(F.lit(None), "any", err=node.err)
        return node

    def _truthy(self, v: V) -> Column:
        """VRL truthiness: only null and false are falsy (op.rs)."""
        if v.vtype == "bool":
            return F.coalesce(_mat(v), F.lit(False))
        if v.vtype == "null" and v.col is None:
            return F.lit(False)
        if v.vtype in ("any",):
            c = _mat(v)
            return c.isNotNull() & F.coalesce(c.try_cast("boolean"), F.lit(True))
        return _mat(v).isNotNull()

    def _unary(self, e: P.Un) -> V:
        v = self.expr(e.expr)
        if e.op == "!":
            if self.strict and v.vtype not in ("bool", "null", "any"):
                raise VrlCompileError(
                    f"error[E660]: non-boolean negation — this expression "
                    f"resolves to \"{_VRL_TYPE[v.vtype]}\"")
            return V(~F.coalesce(_mat(v).try_cast("boolean"), F.lit(False)),
                     "bool", err=v.err)
        if e.op == "-":
            if v.has_const and isinstance(v.const, (int, float)):
                return _from_python(-v.const)
            return V(-_mat(v), v.vtype if v.vtype in ("int", "float") else "float", err=v.err)
        raise VrlCompileError(f"unknown unary op {e.op}")

    def _eq(self, a: V, b: V) -> Column:
        # null literal comparison: VRL `x == null` is an IS NULL check
        if a.vtype == "null" and a.col is None:
            a = _null()
        if b.vtype == "null":
            return _mat(a).isNull()
        if a.vtype == "null":
            return _mat(b).isNull()
        complex_side = (a.vtype in ("array", "object")) or (b.vtype in ("array", "object"))
        if complex_side:
            # joint encoding decision for concrete arrays
            if a.items is not None or b.items is not None:
                all_items = []
                for s in (a, b):
                    if s.items is not None:
                        all_items.extend(s.items.values())
                kinds = {it.vtype for it in all_items if it.vtype != "null"}
                hetero = len(kinds) > 1
                ma = self._arr_side(a, hetero)
                mb = self._arr_side(b, hetero)
                return F.to_json(ma).eqNullSafe(F.to_json(mb))
            return F.to_json(_mat(a, sort_keys=True)).eqNullSafe(
                F.to_json(_mat(b, sort_keys=True)))
        ta, tb = a.vtype, b.vtype
        known = {"int", "float", "string", "bool", "timestamp"}
        if ta in known and tb in known and _unify(ta, tb) == "any":
            return F.lit(False)  # VRL: differing types are not equal
        return _mat(a).eqNullSafe(_mat(b))

    def _arr_side(self, v: V, hetero: bool) -> Column:
        if v.items is None:
            return _mat(v)  # opaque array column (materialized encoding as stored)
        if not hetero:
            return _mat(v)
        hi = max(v.items) if v.items else -1
        elems = [
            _vjson(v.items[i]) if i in v.items else F.lit(None).cast("string")
            for i in range(hi + 1)
        ]
        return F.array(*elems) if elems else F.array().cast("array<string>")

    def _gated_expr(self, node, gate: Column) -> V:
        """Evaluate a short-circuited rhs: side effects inside it
        (event/variable assignments in a block) only apply on rows where
        the gate holds (internal/short_circuit.vrl)."""
        prev = self._cur_cond
        self._cur_cond = gate if prev is None else (prev & gate)
        try:
            return self.expr(node)
        finally:
            self._cur_cond = prev

    def _binary(self, e: P.Bin) -> V:
        op = e.op
        if op == "??":
            left = self.expr(e.left)
            if left.err is None:
                if self.strict and isinstance(e.left, (P.Lit, P.Arr, P.Obj)):
                    raise VrlCompileError(
                        "error[E651]: unnecessary error coalescing operation "
                        "— this expression can't fail")
                # rhs side effects can never fire; still compile it for
                # syntax checking, gated to never apply
                self._gated_expr(e.right, F.lit(False))
                return left
            if left.err_always:
                # `failing ?? fallback` IS the fallback — avoids mixing
                # incompatible branch types in one when() column
                return self._gated_expr(e.right, F.lit(True))
            if left.err_never:
                self._gated_expr(e.right, F.lit(False))
                return V(left.col, left.vtype, fields=left.fields,
                         items=left.items, const=left.const,
                         has_const=left.has_const)
            right = self._gated_expr(e.right, left.err.isNotNull())
            lcol = _mat(left)
            rcol = _mat(right)
            vt = _unify(left.vtype, right.vtype)
            if vt == "any" and left.vtype != right.vtype:
                # incompatible branch types can't share one column:
                # string-encode both (documented single-Column divergence)
                lcol = lcol.cast("string")
                rcol = rcol.cast("string")
            col = F.when(left.err.isNull(), lcol).otherwise(rcol)
            return V(col, vt, err=right.err)
        a = self.expr(e.left)
        if op == "||":
            b = self._gated_expr(e.right, ~self._truthy(a))
        elif op == "&&":
            b = self._gated_expr(e.right, self._truthy(a))
        else:
            b = self.expr(e.right)
        err = _combine_err(a.err, b.err)
        ea = a.err_always or b.err_always  # an always-erring side errs the op
        if op in ("==", "!="):
            eq = self._eq(a, b)
            return V(eq if op == "==" else ~eq, "bool", err=err, err_always=ea)
        if op == "||":
            # Or returns the lhs VALUE when truthy, else the rhs value
            # (op.rs Or; corpus logical/or.vrl: `null || "foo"` → "foo")
            if a.has_const and a.err is None:
                return a if (a.const is not None and a.const is not False) else b
            if a.vtype == "null" and a.col is None and a.err is None:
                return b
            vt = _unify(a.vtype, b.vtype)
            if vt != "any" or "any" in (a.vtype, b.vtype):
                return V(F.when(self._truthy(a), _mat(a)).otherwise(_mat(b)),
                         vt, err=err)
            # mixed-type or: boolean coalescing (single-Column divergence)
            ca = F.coalesce(_mat(a).cast("boolean"), F.lit(False))
            return V(F.when(ca, _mat(a).cast("string"))
                     .otherwise(_mat(b).cast("string")), "any", err=err)
        if op == "&&":
            # And: lhs null/false → false without touching rhs; rhs must
            # be boolean or the expression errs (logical/and.vrl:
            # `true && "foo" ?? "nope"` → "nope")
            if a.has_const and a.err is None and (
                    a.const is None or a.const is False):
                return V(F.lit(False), "bool")
            and_err = None
            if b.vtype not in ("bool", "null", "any"):
                and_err = F.when(self._truthy(a),
                                 F.lit(f'expected "boolean", got '
                                       f'"{_VRL_TYPE[b.vtype]}"'))
            cb = F.coalesce(_mat(b).try_cast("boolean"), F.lit(False))
            return V(self._truthy(a) & cb, "bool",
                     err=_combine_err(err, and_err))
        if op in ("<", ">", "<=", ">="):
            # numbers compare with numbers, strings with strings
            # (lexicographic); any other pairing is a runtime error
            # (op.rs Gt/Ge/Lt/Le; corpus comparison/*.vrl)
            comparable = (
                (a.vtype in ("int", "float") and b.vtype in ("int", "float"))
                or (a.vtype == "string" and b.vtype == "string")
                or "any" in (a.vtype, b.vtype)
            )
            if not comparable:
                return V(F.lit(None), "bool", err_always=err is None,
                         err=_combine_err(err, F.lit(
                             f'can\'t compare {_VRL_TYPE[a.vtype]} with '
                             f'{_VRL_TYPE[b.vtype]}')))
            ca, cb = _mat(a), _mat(b)
            col = {"<": ca < cb, ">": ca > cb, "<=": ca <= cb, ">=": ca >= cb}[op]
            return V(col, "bool", err=err, err_always=ea)
        if op == "+":
            ta, tb = a.vtype, b.vtype
            # op.rs Add: Bytes+Bytes concat; Bytes absorbs a null side
            # (corpus addition/{null_string,string_null}); numeric adds;
            # every other pairing is the typed runtime error below
            if ta == "string" and tb == "string":
                return V(F.concat(_mat(a), _mat(b)), "string", err=err, err_always=ea)
            if ta == "string" and tb == "null":
                return V(_mat(a), "string", err=err)
            if ta == "null" and tb == "string":
                return V(_mat(b), "string", err=err)
            if "any" in (ta, tb) and "string" in (ta, tb):
                return V(F.concat(_mat(a).cast("string"), _mat(b).cast("string")),
                         "string", err=err)
            return self._num_op(
                a, b, lambda x, y: x + y, err,
                f'can\'t add type "{_VRL_TYPE[tb]}" to "{_VRL_TYPE[ta]}"', ea=ea)
        if op == "-":
            return self._num_op(
                a, b, lambda x, y: x - y, err,
                f'can\'t subtract type "{_VRL_TYPE[b.vtype]}" from '
                f'"{_VRL_TYPE[a.vtype]}"', ea=ea)
        if op == "*":
            # int * string repeats the string (op.rs Mul on Bytes;
            # corpus multiplication/{integer_string,string_integer})
            if {"string", "int"} == {a.vtype, b.vtype}:
                s, n = (a, b) if a.vtype == "string" else (b, a)
                return V(F.repeat(_mat(s), _mat(n).cast("int")), "string", err=err)
            return self._num_op(
                a, b, lambda x, y: x * y, err,
                f'can\'t multiply type "{_VRL_TYPE[a.vtype]}" by '
                f'"{_VRL_TYPE[b.vtype]}"', ea=ea)
        if op == "%":
            return self._num_op(
                a, b, lambda x, y: x % y, err,
                f'can\'t calculate remainder of type "{_VRL_TYPE[a.vtype]}" '
                f'and "{_VRL_TYPE[b.vtype]}"', ea=ea)
        if op == "/":
            # VRL division always yields a float and stays FALLIBLE even
            # with constant operands (corpus division/integer.vrl runs
            # `5 / 2 ?? 0`); message pinned by infallible_err_return_value
            if a.vtype not in _NUMERIC or b.vtype not in _NUMERIC:
                msg = (f'can\'t divide type "{_VRL_TYPE[a.vtype]}" by '
                       f'"{_VRL_TYPE[b.vtype]}"')
                return V(F.lit(None), "any", err_always=err is None,
                         err=_combine_err(err, F.lit(msg)))
            if (err is None and a.has_const and b.has_const
                    and isinstance(a.const, (int, float))
                    and isinstance(b.const, (int, float))):
                if float(b.const) == 0.0:
                    return V(F.lit(None).cast("double"), "float",
                             err=F.lit("can't divide by zero"), err_always=True)
                return V(F.lit(float(a.const) / float(b.const)), "float",
                         const=float(a.const) / float(b.const), has_const=True,
                         err=F.lit(None).cast("string"), err_never=True)
            ca = _mat(a).cast("double")
            cb = _mat(b).cast("double")
            div_err = F.when(F.coalesce(cb, F.lit(0.0)) == 0.0,
                             F.lit("can't divide by zero"))
            return V(
                F.when(cb != 0.0, ca / cb), "float",
                err=_combine_err(err, div_err),
            )
        if op == "|":  # object merge operator
            for side in (a, b):
                if side.vtype not in ("object", "any") and side.fields is None:
                    raise VrlCompileError("only objects can be merged")
            return _fn_merge(self, {"to": a, "from": b},
                             P.Call("merge", (), False, 0, 0))
        raise VrlCompileError(f"unknown operator {op}")

    def _num_op(self, a: V, b: V, fn, err, msg: str, ea: bool = False) -> V:
        if a.vtype not in _NUMERIC or b.vtype not in _NUMERIC:
            return V(F.lit(None), "any", err_always=err is None,
                     err=_combine_err(err, F.lit(msg)))
        if (err is None and a.has_const and b.has_const
                and isinstance(a.const, (int, float))
                and not isinstance(a.const, bool)
                and isinstance(b.const, (int, float))
                and not isinstance(b.const, bool)):
            try:
                return _from_python(fn(a.const, b.const))
            except ZeroDivisionError:
                return V(F.lit(None), "float",
                         err=F.lit("can't divide by zero"), err_always=True)
        vt = _unify(a.vtype, b.vtype)
        if vt not in ("int", "float"):
            vt = "float" if "any" not in (a.vtype, b.vtype) else "any"
        return V(fn(_mat(a), _mat(b)), vt, err=err, err_always=ea)

    # ---- calls
    def _call(self, call: P.Call) -> V:
        name = call.name
        if name == "exists":
            return self._exists(call)
        if name == "del":
            return self._del(call)
        if name == "unnest":
            return self._unnest(call)
        reg = registry()
        if name not in reg:
            raise VrlCompileError(
                f"error[E105]: call to undefined function — {name!r} is not in "
                f"the compile-to-Column registry (vector_spark/vrl/compiler.py)")
        params, builder = reg[name]
        args: dict[str, V] = {}
        pos = 0
        for arg_name, arg_expr in call.args:
            if arg_name is None:
                if pos >= len(params):
                    raise VrlCompileError(
                        f"error[E106]: wrong number of function arguments "
                        f"for {name}()")
                arg_name = params[pos]
                pos += 1
            elif arg_name not in params:
                raise VrlCompileError(
                    f"error[E108]: unknown function argument keyword "
                    f"{arg_name!r} for {name}()")
            a = self.expr(arg_expr)
            if self.strict and a.err is not None:
                raise VrlCompileError(
                    f"error[E630]: fallible argument — the {arg_name!r} "
                    f"argument of {name}() can fail; handle the error first")
            args[arg_name] = a
        self.arg_ast = {n: x for n, x in
                        ((params[i] if nm is None else nm, xx)
                         for i, (nm, xx) in enumerate(call.args))}
        try:
            out = builder(self, args, call)
        except KeyError as missing:
            raise VrlCompileError(
                f"error[E107]: missing function argument — required "
                f"argument missing for {name}(): {missing}") from None
        if call.bang:
            if out.err is None:
                # only flag functions that are infallible in the
                # REFERENCE signature too — our model often proves a
                # call infallible (const folding) where the reference
                # keeps it fallible
                if self.strict and name in ("now", "uuid_v4", "get_hostname"):
                    raise VrlCompileError(
                        f"error[E620]: can't abort infallible function — "
                        f"{name}() can't fail, remove the `!`")
            else:
                # fn!(): abort-on-error — the error RAISES to the
                # program level at runtime (Terminate::Error), so the
                # call's VALUE is infallible downstream; this keeps
                # compositions like `append(array!(.foo), ...)` from
                # re-flagging an already-handled error
                self._raise_err(out.err, self._cur_cond)
                out = V(out.col, out.vtype, fields=out.fields,
                        items=out.items, const=out.const,
                        has_const=out.has_const)
        return out

    def _exists(self, call: P.Call) -> V:
        if len(call.args) != 1 or not isinstance(call.args[0][1], P.Path):
            raise VrlCompileError("exists() takes a single path query")
        segs = call.args[0][1].segments
        v = self._get_path(segs)
        if v.vtype == "null" and v.col is not None and v.fields is None and v.items is None:
            # statically absent — but may still have been assigned null
            return V(_mat(v).isNotNull(), "bool")
        if v.fields is not None or v.items is not None:
            return V(F.lit(True), "bool")
        return V(_mat(v).isNotNull(), "bool")

    def _unnest(self, call: P.Call) -> V:
        """unnest (unnest.rs): `. = unnest(.events)` — one output event
        per array element, the path replaced by the element. The root
        form compiles to ONE explode() on the output frame (the
        aws_cloudwatch fan-out shape). When the target array's elements
        are known at compile time (concrete items), unnest is also an
        ordinary EXPRESSION returning the array of expanded events
        (diagnostics/unnest_typedefs uses `.a = unnest(.noog.nork)`),
        over event paths or variable paths alike."""
        node = call.args[0][1] if len(call.args) == 1 else None
        segs = base = None
        if isinstance(node, P.Path):
            segs = node.segments
            base = self._get_path(())  # whole event
        elif isinstance(node, P.Member) and isinstance(node.base, P.Var):
            segs = node.segments
            base = self.vars.get(node.base.name)
        elif isinstance(node, P.Var):
            segs = ()
            base = self.vars.get(node.name)
        if segs is None:
            raise VrlCompileError("unnest() takes a single path query")
        v = _walk_v(base, segs) if base is not None else _null()
        if v.vtype not in ("array", "any") and v.items is None:
            raise VrlCompileError("unnest() target must be an array")
        if v.items is not None and base is not None and segs:
            # concrete expansion: one copy of the CONTAINING value per
            # element, with the path replaced by that element
            out = {
                i: _set_in(base, tuple(segs), item,
                           P.Call("set", (), False, 0, 0))
                for i, item in v.items.items()
            }
            return V(None, "array", items=out)
        if len(segs) == 1 and isinstance(segs[0], str) and isinstance(node, P.Path):
            return V(None, "unnest!", const=segs[0], has_const=True)
        raise VrlCompileError(
            "unnest() on an opaque nested array needs known elements in "
            "the compile-to-Column model (top-level fields explode)")

    def _del(self, call: P.Call) -> V:
        if len(call.args) != 1 or not isinstance(call.args[0][1], P.Path):
            raise VrlCompileError("del() takes a single path query")
        segs = call.args[0][1].segments
        old = self._get_path(segs)
        if len(segs) == 1 and isinstance(segs[0], str):
            self.root.pop(segs[0], None)
            self.deleted.add(segs[0])
        elif isinstance(segs[-1], int):
            # deleting an array element REMOVES it, shifting the tail
            # down (del.rs; pinned by issues/8068_del_type_def)
            parent = self._get_path(segs[:-1])
            if parent.items is None:
                raise VrlCompileError(
                    "del() on an array index needs known elements in the "
                    "compile-to-Column model")
            idx = segs[-1]
            if idx < 0:
                idx = (max(parent.items) + 1 if parent.items else 0) + idx
            shifted = {(i if i < idx else i - 1): it
                       for i, it in parent.items.items() if i != idx}
            self._set_path(tuple(segs[:-1]),
                           V(None, "array", items=shifted), None)
        else:
            self._set_path(segs, _null(), None)
        return old

    # ---- statements
    def stmt(self, s, cond: Column | None):
        self.stmt_value(s, cond)

    def stmt_value(self, s, cond: Column | None) -> V:
        """Run a statement and return its VALUE — in VRL every statement
        is an expression (parser.lalrlop RootExpr): an assignment
        resolves to the assigned value (assignment.rs resolve), an `if`
        to the taken branch's final statement value, `abort` to null."""
        prev_cond = self._cur_cond
        self._cur_cond = cond
        try:
            return self._stmt_value_inner(s, cond)
        finally:
            self._cur_cond = prev_cond

    def _stmt_value_inner(self, s, cond: Column | None) -> V:
        if self.aborted_const:
            # statements after an unconditional abort are dead code
            # (expression/abort.rs terminates resolution)
            return _null()
        if isinstance(s, P.Abort):
            self.can_abort = True
            if cond is None:
                self.aborted_const = True
            self.abort_flag = self.abort_flag | (cond if cond is not None else F.lit(True))
            return _null()
        if isinstance(s, P.If):
            return self._if_stmt_value(s, cond)
        if isinstance(s, P.Assign):
            return self._assign(s, cond)
        # bare expression statement: evaluate for errors (e.g. assert(), abort-able calls)
        v = self.expr(s)
        if v.err is not None and not v.checked:
            if self.strict:
                raise VrlCompileError(
                    "error[E100]: unhandled error — expression can result "
                    "in runtime error; handle the error case")
            self._raise_err(v.err, cond)
        elif v.err is not None:
            self._raise_err(v.err, cond)
        return v

    def _if_stmt_value(self, s: P.If, cond: Column | None) -> V:
        not_prior = None
        branch_vals: list[tuple[Column, V]] = []
        for c_expr, block in s.clauses:
            cv = self.expr(c_expr)
            self._check_condition(cv, cond)
            ccol = F.coalesce(_mat(cv), F.lit(False))
            branch = ccol if not_prior is None else (not_prior & ccol)
            full = branch if cond is None else (cond & branch)
            bv = _null()
            for st in block:
                bv = self.stmt_value(st, full)
            branch_vals.append((branch, bv))
            not_prior = (~ccol) if not_prior is None else (not_prior & ~ccol)
        if s.otherwise is not None:
            full = not_prior if cond is None else (cond & not_prior)
            bv = _null()
            for st in s.otherwise:
                bv = self.stmt_value(st, full)
            branch_vals.append((not_prior, bv))
        vt = "null"
        for _, bv in branch_vals:
            vt = _unify(vt, bv.vtype)
        result = F.lit(None)
        for gate, bv in reversed(branch_vals):
            result = F.when(gate, _mat(bv)).otherwise(result)
        return V(result, vt)

    def _check_condition(self, cv: V, cond: Column | None):
        if cv.err is not None and not cv.checked:
            if self.strict:
                raise VrlCompileError(
                    "error[E100]: unhandled error — if-condition can "
                    "result in runtime error")
            self._raise_err(cv.err, cond)
        elif cv.err is not None:
            self._raise_err(cv.err, cond)
        if self.strict and cv.vtype not in ("bool",):
            raise VrlCompileError(
                "error[E102]: non-boolean predicate — this predicate must "
                f"resolve to a boolean, got {cv.vtype}")

    def _raise_err(self, err: Column, cond: Column | None):
        self.can_fail = True
        raised = err.isNotNull()
        if cond is not None:
            raised = cond & raised
        raised = F.coalesce(raised, F.lit(False))
        self.err_flag = self.err_flag | raised
        # first-raised message wins (resolve() terminates on first error)
        self.err_msg = F.coalesce(self.err_msg, F.when(raised, err))

    def _assign(self, s: P.Assign, cond: Column | None) -> V:
        try:
            value = self.expr(s.expr)
        except VrlCompileError as err:
            if s.merge and "only objects can be merged" in str(err):
                raise VrlCompileError(
                    "only objects can be merged (error[E652]: both sides "
                    "of |= must resolve to objects)") from None
            raise
        if s.err_target is not None:
            if (self.strict and value.err is None
                    and isinstance(s.expr, (P.Lit, P.Arr, P.Obj))):
                raise VrlCompileError(
                    "error[E104]: unnecessary error assignment — "
                    "right-hand side is infallible")
            errcol = value.err if value.err is not None else F.lit(None).cast("string")
            if value.err is not None and value.fields is not None:
                # keep per-field assignability: gate each field on the
                # error channel instead of collapsing to one column
                ok = V(None, "object", fields={
                    k: V(F.when(errcol.isNull(), _mat(f)), f.vtype)
                    for k, f in value.fields.items()})
            elif value.err is not None:
                okcol = F.when(value.err.isNull(), _mat(value)).otherwise(_zero(value.vtype))
                ok = V(okcol, value.vtype)
            else:
                ok = V(_mat(value), value.vtype) if (value.fields or value.items) is None else value
            self._assign_target(s.target, ok, cond)
            self._assign_target(s.err_target, V(errcol, "string"), cond)
            # the assignment expression resolves to the ok value, or to
            # the error string when it fired (assignment.rs
            # Variant::Infallible resolve — pinned by the corpus
            # infallible_{ok,err}_return_value fixtures)
            if value.err is None or value.err_never:
                return ok
            if value.err_always:
                return V(errcol, "string")
            if ok.vtype == "string":
                return V(F.when(errcol.isNull(), _mat(ok)).otherwise(errcol), "string")
            # heterogeneous ok/err value: string-encode (documented
            # divergence of the single-Column model)
            return V(F.when(errcol.isNull(), _mat(ok).cast("string")).otherwise(errcol),
                     "any")
        if value.err is not None and not value.checked and self.strict:
            raise VrlCompileError(
                "error[E103]: unhandled fallible assignment — handle the "
                "error case (ok/err capture, ??, or !)")
        if value.err is not None:
            self._raise_err(value.err, cond)
            value = V(_mat(value), value.vtype) if value.fields is None and value.items is None \
                else value
        self._assign_target(s.target, value, cond)
        return value

    def _assign_target(self, target, value: V, cond: Column | None):
        if isinstance(target, P.Var):
            if cond is not None:
                old = self.vars.get(target.name, _null())
                value = V(F.when(cond, _mat(value)).otherwise(_mat(old)),
                          _unify(value.vtype, old.vtype))
            self.vars[target.name] = value
            return
        if isinstance(target, P.Path):
            if not target.segments:  # `. = expr` — root replacement
                self._assign_root(value, cond)
                return
            self._set_path(target.segments, value, cond)
            return
        if isinstance(target, P.Member) and isinstance(target.base, P.Var):
            # `foo.bar = 5` / `lines[0] = ""` — a path INTO a variable
            # (issues/6319; query/mixed_case)
            name = target.base.name
            cur = self.vars.get(name)
            if cur is None:
                kind = "array" if isinstance(target.segments[0], int) else "object"
                cur = V(None, kind, fields={} if kind == "object" else None,
                        items={} if kind == "array" else None)
            if cond is not None:
                old = _walk_v(cur, target.segments)
                value = V(F.when(cond, _mat(value)).otherwise(_mat(old)),
                          _unify(value.vtype, old.vtype))
            self.vars[name] = _set_in(cur, target.segments,
                                      value, P.Call("set", (), False, 0, 0))
            return
        raise VrlCompileError(f"bad assignment target {target!r}")

    def _assign_root(self, value: V, cond: Column | None):
        if cond is not None:
            raise VrlCompileError("conditional root assignment is not supported")
        if value.vtype == "unnest!":  # `. = unnest(.field)` — explode
            self.unnest_field = value.const
            return
        if value.items is not None:  # `. = [ev, ev, ...]` — multi-emit
            self.emit_array = value
            return
        if value.fields is not None:
            self.root = dict(value.fields)
            self.deleted = set()
            return
        if value.vtype == "object" and value.col is not None:
            raise VrlCompileError(
                "root assignment from a dynamic object needs a schema: use "
                "parse_json(value, schema: \"...\") or assign fields explicitly")
        # scalar root → the event becomes {message: value} (VrlTarget
        # semantics for non-collection roots)
        self.root = {"message": value}
        self.deleted = set()

    def _live(self) -> Column | None:
        """Gate for the next statement: rows that already aborted stop
        executing (abort terminates the program — expression/abort.rs)."""
        if not self.can_abort:
            return None
        return ~F.coalesce(self.abort_flag, F.lit(False))

    def run(self, prog: P.Program):
        for s in prog.stmts:
            self.stmt(s, self._live())

    def last_value(self, prog: P.Program) -> V:
        """Run the program; value = the final statement's value (the
        runtime's resolve() return — conditions read it the same way,
        src/conditions/vrl.rs)."""
        if not prog.stmts:
            raise VrlCompileError("empty VRL condition")
        v = _null()
        for s in prog.stmts:
            v = self.stmt_value(s, self._live())
        return v


# ------------------------------------------------------- public API
class CompiledProgram:
    def __init__(self, source: str, drop_on_error: bool = False, drop_on_abort: bool = True,
                 enrichment: dict | None = None, strict: bool = False):
        self.source = source
        self.ast = P.parse(source)
        self.drop_on_error = drop_on_error
        self.drop_on_abort = drop_on_abort
        self.enrichment = enrichment
        # strict: the reference's compile-time fallibility/type checks
        # (error[E###] diagnostics) — used by `run_config --validate`
        self.strict = strict

    def apply(self, df: DataFrame) -> DataFrame:
        c = _Compiler(df.schema, self.enrichment, strict=self.strict)
        c.run(self.ast)

        if c.emit_array is not None:
            # `. = [...]`: one row per element; element objects unify to
            # the union of their field names
            items = c.emit_array.items
            names: list[str] = []
            for it in items.values():
                if it.fields is None:
                    raise VrlCompileError("multi-emit root array elements must be objects")
                for n in it.fields:
                    if n not in names:
                        names.append(n)
            structs = [
                F.struct(*[
                    _mat(it.fields[n]).alias(n) if n in it.fields else F.lit(None).alias(n)
                    for n in names
                ])
                for _, it in sorted(items.items())
            ]
            if c.can_fail or c.can_abort:
                raise VrlCompileError("multi-emit cannot be combined with fallible programs")
            out = df.select(F.explode(F.array(*structs)).alias("_ev"))
            return out.select(*[out["_ev"][n].alias(n) for n in names])

        fallible = c.can_fail or c.can_abort
        rollback = None
        if fallible:
            rollback = F.coalesce(c.err_flag, F.lit(False)) | F.coalesce(
                c.abort_flag, F.lit(False))

        orig_names = [f.name for f in df.schema.fields]
        ordered = [n for n in orig_names if n in c.root or n in c.deleted]
        ordered += [n for n in c.root if n not in ordered]

        cols = []
        for name in ordered:
            v = c.root.get(name)
            if v is None:  # deleted field: drop it (restore on rollback)
                if rollback is None:
                    continue
                cols.append(F.when(rollback, _qcol(name)).alias(name))
                continue
            new = _mat(v)
            if rollback is not None:
                if name in orig_names:
                    orig = _qcol(name)
                    # align types so the when() branches agree
                    field = df.schema[name]
                    if _spark_to_vtype(field.dataType) != v.vtype \
                            and v.vtype in ("string", "int", "float", "bool"):
                        tgt = {"string": "string", "int": "long",
                               "float": "double", "bool": "boolean"}[v.vtype]
                        orig = orig.cast(tgt)
                    new = F.when(rollback, orig).otherwise(new)
                else:
                    new = F.when(~rollback, new)
            cols.append(new.alias(name))

        out = df.select(*cols)
        if c.unnest_field is not None:
            # a failed event would roll back to the un-exploded array
            # shape — type-impossible in one column — so fallible
            # programs may unnest only when their failed rows are dropped
            if (c.can_fail and not self.drop_on_error) or (
                    c.can_abort and not self.drop_on_abort):
                raise VrlCompileError(
                    "unnest in a fallible program requires "
                    "drop_on_error/drop_on_abort")
            if fallible:
                keep = F.lit(True)
                if self.drop_on_error:
                    keep = keep & ~F.coalesce(c.err_flag, F.lit(False))
                if self.drop_on_abort:
                    keep = keep & ~F.coalesce(c.abort_flag, F.lit(False))
                out = df.select(*cols, keep.alias("__vrl_keep")).filter(
                    F.col("__vrl_keep")).drop("__vrl_keep")
            return out.withColumn(c.unnest_field, F.explode(_qcol(c.unnest_field)))
        if fallible:
            keep = F.lit(True)
            if self.drop_on_error:
                keep = keep & ~F.coalesce(c.err_flag, F.lit(False))
            if self.drop_on_abort:
                keep = keep & ~F.coalesce(c.abort_flag, F.lit(False))
            # the filter must see the PRE-select flags; recompute over df
            out = df.select(*cols, keep.alias("__vrl_keep")).filter(
                F.col("__vrl_keep")).drop("__vrl_keep")
        return out


def compile_program(source: str, drop_on_error: bool = False,
                    drop_on_abort: bool = True,
                    enrichment: dict | None = None,
                    strict: bool = False) -> CompiledProgram:
    return CompiledProgram(source, drop_on_error, drop_on_abort, enrichment,
                           strict=strict)


def compile_condition(source: str, schema: T.StructType,
                      enrichment: dict | None = None) -> Column:
    """A VRL condition (type = "vrl") → boolean Column over `schema`."""
    c = _Compiler(schema, enrichment)
    v = c.last_value(P.parse(source))
    col = F.coalesce(_mat(v), F.lit(False))
    if v.err is not None:
        col = F.when(v.err.isNull(), col).otherwise(F.lit(False))
    # a program that aborted or errored fails the condition
    if c.can_fail or c.can_abort:
        col = col & ~F.coalesce(c.err_flag, F.lit(False)) & ~F.coalesce(
            c.abort_flag, F.lit(False))
    return col
