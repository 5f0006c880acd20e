"""Run the reference's VRL language test corpus through the Column compiler.

The reference ships a 185-fixture language test suite at
/root/reference/lib/vrl/tests/tests/**/*.vrl (runner:
lib/vrl/tests/src/main.rs, fixture format: lib/vrl/tests/src/test.rs).
Each fixture is a VRL program with an optional `# object:` input event
and a `# result:` expectation — either a JSON-ish value (the resolved
value of the program's final expression) or rendered diagnostic text
for programs that must fail.

This harness runs each fixture VERBATIM through vector_spark.vrl and
classifies the outcome:

- value_match        — program resolved; value equals the expectation
                       byte-for-byte at the JSON level (int/float
                       distinction preserved, timestamps RFC3339-Z,
                       regexes as their pattern — main.rs:152-176).
- abort_match        — program aborted; the (partially mutated) event
                       equals the expectation (main.rs Terminate::Abort
                       branch compares the object).
- error_code_match   — the fixture expects a failure and our front-end
                       fails with the same error[E###] code
                       (main.rs:304 compare_partial_diagnostic).
- error_match        — expected runtime-error text equals ours exactly.
- error_detected     — the fixture expects a failure and our front-end
                       fails, but the diagnostic text differs (our
                       diagnostics are plain Python exceptions, not
                       codespan-rendered tables — documented divergence).
- mismatch / unexpected_* — real failures.
- skip               — out-of-model features, each with a reason.

Usage: python tools/vrl_corpus.py [--json OUT] [--only SUBSTR] [-v]
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys
from dataclasses import dataclass
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path("/root/reference/lib/vrl/tests/tests")


# ------------------------------------------------------------ fixtures
@dataclass
class Fixture:
    name: str
    category: str
    path: str
    source: str
    object: dict
    result: str
    approx: bool
    skip: bool
    parse_error: str | None = None


def load_fixture(path: Path) -> Fixture:
    """Port of the comment-capture format in test.rs:24-101."""
    content = path.read_text()
    source_lines: list[str] = []
    object_buf: list[str] = []
    result_buf: list[str] = []
    approx = False
    skip = content.startswith("# SKIP")

    mode = None  # None | "object" | "result" | "done"
    for line in content.splitlines():
        if line.startswith("#") and mode != "done":
            line = line[1:]
            if line.startswith(" "):
                line = line[1:]
            if line.startswith("object:"):
                mode = "object"
                line = line[len("object:"):].lstrip()
            elif line.startswith("result: ~"):
                mode = "result"
                approx = True
                line = line[len("result: ~"):].lstrip()
            elif line.startswith("result:"):
                mode = "result"
                line = line[len("result:"):].lstrip()
            if mode == "result":
                result_buf.append(line)
            elif mode == "object":
                object_buf.append(line)
            continue
        mode = "done"
        source_lines.append(line)

    parse_error = None
    obj: dict = {}
    if object_buf:
        try:
            obj = json.loads("".join(object_buf))
        except ValueError as e:  # the runner records this as a test error
            parse_error = f"unable to parse object as JSON: {e}"

    rel = str(path.relative_to(CORPUS))
    return Fixture(
        name=path.stem,
        category=str(Path(rel).parent) if "/" in rel else "",
        path=rel,
        source="\n".join(source_lines) + "\n",
        object=obj,
        result="\n".join(result_buf).rstrip(),
        approx=approx,
        skip=skip,
    )


def parse_want(result: str):
    """The expectation → ("value", py) | ("text", raw).  Mirrors
    main.rs:152-176: r'/t'/s' wrapped forms, else serde_json, else the
    raw text (diagnostic/runtime-error expectations land here)."""
    r = result.strip()
    if r.startswith("r'") and r.endswith("'"):
        return ("value", r[2:-1].replace("\\'", "'"))
    if r.startswith("t'") and r.endswith("'"):
        return ("value", _canon_ts(r[2:-1]))
    if r.startswith("s'") and r.endswith("'"):
        return ("value", r[2:-1])
    try:
        return ("value", json.loads(r))
    except ValueError:
        return ("text", result)


def _canon_ts(s: str) -> str:
    """RFC3339 with AutoSi seconds + Z (to_rfc3339_opts in main.rs)."""
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return s
    dt = dt.astimezone(timezone.utc)
    if dt.microsecond == 0:
        return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    frac = f"{dt.microsecond:06d}"
    frac = frac[:3] if frac.endswith("000") else frac
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{frac}Z"


_ECODE = re.compile(r"error\[E\d+\]")
_ECODE_LINE = re.compile(r"^\s*error\[E\d+\]", re.MULTILINE)


def error_codes(text: str) -> set[str]:
    """All error[E###] codes anywhere in the text (used for the
    non-approx error-code tier)."""
    return set(_ECODE.findall(text))


def anchored_codes(text: str) -> list[str]:
    """compare_partial_diagnostic (main.rs:302-306): only lines that
    START with error[E count for `result: ~` comparisons."""
    return [m.strip() for m in _ECODE_LINE.findall(text)]


# ------------------------------------------------------------- running
def _schema_for(value):
    from pyspark.sql import types as T

    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if value is None:
        return T.NullType()
    if isinstance(value, list):
        kinds = {type(x) for x in value}
        if not value:
            return T.ArrayType(T.StringType())
        if len({_schema_for(x).simpleString() for x in value}) == 1:
            return T.ArrayType(_schema_for(value[0]))
        raise UnsupportedFixture("heterogeneous input array needs a variant column")
    if isinstance(value, dict):
        return T.StructType([T.StructField(k, _schema_for(v)) for k, v in value.items()])
    raise UnsupportedFixture(f"unsupported input value {value!r}")


class UnsupportedFixture(Exception):
    pass


def _pyify(x):
    """Spark-collected value → plain JSON-able Python."""
    import datetime
    import decimal

    from pyspark.sql import Row

    if isinstance(x, Row):
        return {k: _pyify(v) for k, v in x.asDict().items()}
    if isinstance(x, dict):
        return {k: _pyify(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_pyify(v) for v in x]
    if isinstance(x, decimal.Decimal):
        return float(x)
    if isinstance(x, datetime.datetime):
        return _canon_ts(x.isoformat() + ("" if x.tzinfo else "+00:00"))
    if isinstance(x, bytes):
        return x.decode("utf-8", "replace")
    return x


def _v_tree(v):
    """V → (shape, leaves): a nested template with leaf indices so the
    collected row rebuilds the value with int/float/timestamp fidelity
    (concrete objects/arrays materialize leaf-per-leaf, never through
    the heterogeneous JSON encoding)."""
    from vector_spark.vrl import compiler as C

    leaves: list = []

    def walk(node):
        if node.fields is not None:
            return {"o": {k: walk(f) for k, f in node.fields.items()}}
        if node.items is not None:
            hi = max(node.items) if node.items else -1
            return {"a": [walk(node.items[i]) if i in node.items else {"l": _leaf(None, "null")}
                          for i in range(hi + 1)]}
        return {"l": _leaf(C._mat(node), node.vtype)}

    def _leaf(col, vtype):
        leaves.append((col, vtype))
        return len(leaves) - 1

    return walk(v), leaves


def _rebuild(shape, values):
    if "o" in shape:
        return {k: _rebuild(s, values) for k, s in shape["o"].items()}
    if "a" in shape:
        return [_rebuild(s, values) for s in shape["a"]]
    return values[shape["l"]]


def _leaf_py(x, vtype):
    out = _pyify(x)
    if out is None:
        return None
    if vtype == "int" and isinstance(out, (int, float)) and not isinstance(out, bool):
        return int(out)
    if vtype == "float" and isinstance(out, (int, float)) and not isinstance(out, bool):
        return float(out)
    return out


def run_fixture(spark, fx: Fixture, strict: bool = True) -> dict:
    """Execute one fixture; returns {status, got, want, detail}."""
    from pyspark.sql import functions as F

    from vector_spark.vrl import compiler as C
    from vector_spark.vrl import parser as P
    from vector_spark.vrl.lexer import VrlSyntaxError

    want_kind, want = parse_want(fx.result)

    def classify_failure(exc: Exception) -> dict:
        got = str(exc)
        if want_kind == "text":
            if fx.approx:
                # mirror compare_partial_diagnostic: line-anchored codes
                if anchored_codes(got) == anchored_codes(want):
                    return {"status": "error_code_match", "got": got}
                return {"status": "error_code_mismatch", "got": got, "want": want}
            if got.strip() == want.strip():
                return {"status": "error_match", "got": got}
            wcodes = error_codes(want)
            if wcodes and error_codes(got) == wcodes:
                return {"status": "error_code_match", "got": got}
            return {"status": "error_detected", "got": got, "want": want}
        return {"status": "unexpected_error", "got": got, "want": want}

    scalar_event = bool(fx.object) and not isinstance(fx.object, dict)
    obj = fx.object if (fx.object and not scalar_event) else {}
    try:
        schema = _schema_for(obj)
        if not obj:
            from pyspark.sql import types as T

            schema = T.StructType([])
        df = spark.createDataFrame([tuple(obj.values())] if obj else [()], schema)
    except UnsupportedFixture as e:
        return {"status": "skip", "detail": str(e)}

    try:
        ast = P.parse(fx.source)
        comp = C._Compiler(df.schema, strict=strict)
        v = comp.last_value(ast)
    except (VrlSyntaxError, C.VrlCompileError) as e:
        return classify_failure(e)
    except Exception as e:  # noqa: BLE001 — harness must keep going
        return {"status": "crash", "got": f"{type(e).__name__}: {e}", "want": want}

    if scalar_event:
        # the program compiled, but a scalar-rooted event can't be run
        # in the object-rooted DataFrame model (SURVEY §1.3)
        return {"status": "skip",
                "detail": "scalar input event (the DataFrame model is "
                          "object-rooted, SURVEY §1.3)"}

    try:
        shape, leaves = _v_tree(v)
        sels = [col.alias(f"_l{i}") if col is not None else F.lit(None).alias(f"_l{i}")
                for i, (col, _) in enumerate(leaves)]
        root_shape, root_leaves = _v_tree(
            C.V(None, "object", fields=dict(comp.root)))
        base = len(sels)
        sels += [col.alias(f"_r{i}") if col is not None else F.lit(None).alias(f"_r{i}")
                 for i, (col, _) in enumerate(root_leaves)]
        err_col = v.err if v.err is not None else F.lit(None).cast("string")
        sels += [
            err_col.alias("_verr"),
            comp.err_msg.alias("_perr"),
            F.coalesce(comp.err_flag, F.lit(False)).alias("_pfail"),
            F.coalesce(comp.abort_flag, F.lit(False)).alias("_pabort"),
        ]
        row = df.select(*sels).collect()[0]
    except Exception as e:  # noqa: BLE001
        return {"status": "crash", "got": f"{type(e).__name__}: {e}", "want": want}

    prog_err = row["_perr"] if row["_pfail"] else None
    last_err = row["_verr"]
    if prog_err is None and last_err is not None:
        prog_err = last_err
    if row["_pabort"]:
        # Terminate::Abort — the runner compares the (partially
        # mutated) event object (main.rs:215-235)
        got = _rebuild(root_shape,
                       [_leaf_py(row[f"_r{i}"], root_leaves[i][1])
                        for i in range(len(root_leaves))])
        if want_kind == "value" and _values_equal(got, want):
            return {"status": "abort_match", "got": got}
        return {"status": "mismatch", "got": got, "want": want,
                "detail": "abort object differs"}
    if prog_err is not None:
        return classify_failure(_RuntimeErr(prog_err))

    got = _rebuild(shape, [_leaf_py(row[f"_l{i}"], leaves[i][1])
                           for i in range(len(leaves))])
    if want_kind == "value" and _values_equal(got, want):
        return {"status": "value_match", "got": got}
    if want_kind == "text":
        # an unquoted, non-JSON expectation is still a STRING VALUE when
        # the program resolves (test.rs falls back to Value::String)
        if isinstance(got, str) and got.strip() == want.strip():
            return {"status": "value_match", "got": got}
        return {"status": "error_expected_but_value", "got": got, "want": want}
    return {"status": "mismatch", "got": got, "want": want}


class _RuntimeErr(Exception):
    pass


def _values_equal(got, want) -> bool:
    """serde_json::Value equality: i64(5) != f64(5.0), objects keyed,
    arrays ordered; floats compare exactly (the corpus avoids epsilon
    cases except `~` results, which are diagnostics)."""
    if isinstance(want, bool) or isinstance(got, bool):
        return got is want if isinstance(want, bool) else False
    if isinstance(want, int) and not isinstance(want, bool):
        return isinstance(got, int) and got == want
    if isinstance(want, float):
        return isinstance(got, float) and (
            got == want or (math.isnan(got) and math.isnan(want)))
    if isinstance(want, dict):
        if not isinstance(got, dict):
            return False
        # nulls-as-absent: a fixed-schema column can't vanish per row
        # (SURVEY §1.3 documented divergence), so a null-valued key on
        # our side matches an absent key in the expectation
        extra = {k for k in got if k not in want}
        if any(got[k] is not None for k in extra):
            return False
        return all(k in got and _values_equal(got[k], want[k]) for k in want)
    if isinstance(want, list):
        return (isinstance(got, list) and len(got) == len(want)
                and all(_values_equal(g, w) for g, w in zip(got, want)))
    return got == want


# ----------------------------------------------------------------- cli
def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", help="write per-fixture ledger JSON here")
    ap.add_argument("--only", help="substring filter on fixture path")
    ap.add_argument("--lenient", action="store_true",
                    help="disable strict compile-time fallibility checks")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # tiny 1-row frames: a 2-thread local session with no shuffle
    # parallelism runs the 185 fixtures ~5x faster than local[32]
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("vrl-corpus")
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    import time

    fixtures = sorted(CORPUS.rglob("*.vrl"))
    results = {}
    counts: dict[str, int] = {}
    for path in fixtures:
        fx = load_fixture(path)
        if args.only and args.only not in fx.path:
            continue
        t0 = time.monotonic()
        if fx.skip:
            res = {"status": "skip", "detail": "marked # SKIP upstream"}
        elif fx.parse_error:
            res = {"status": "skip", "detail": fx.parse_error}
        else:
            res = run_fixture(spark, fx, strict=not args.lenient)
        res["secs"] = round(time.monotonic() - t0, 2)
        results[fx.path] = res
        counts[res["status"]] = counts.get(res["status"], 0) + 1
        if args.json:  # incremental flush: a timeout still leaves a ledger
            Path(args.json).write_text(json.dumps(
                {"counts": counts, "results": results}, indent=1, default=str))
        ok = res["status"] in ("value_match", "abort_match", "error_match",
                               "error_code_match", "skip")
        if args.verbose or not ok:
            print(f"{res['status']:26s} {fx.path}")
            if not ok and "got" in res:
                print(f"    got:  {json.dumps(res.get('got'), default=str)[:300]}")
                print(f"    want: {json.dumps(res.get('want'), default=str)[:300]}")

    total = sum(counts.values())
    print("\n== VRL corpus summary ==")
    for k in sorted(counts, key=lambda k: -counts[k]):
        print(f"  {counts[k]:4d}  {k}")
    green = sum(counts.get(k, 0) for k in
                ("value_match", "abort_match", "error_match", "error_code_match"))
    print(f"  {green}/{total} green ({counts.get('skip', 0)} skipped)")

    if args.json:
        Path(args.json).write_text(json.dumps(
            {"total": total, "green": green, "counts": counts,
             "results": results}, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
