"""`vector test` behavior-test harness over the config compiler.

Mirrors the reference unit-test runner
(/root/reference/src/config/unit_test.rs:15-180 — UnitTest{inputs,
checks, no_outputs_from}, UnitTestCheck{extract_from, conditions}) and
the behavior-test TOML shape
(/root/reference/tests/behavior/transforms/*.toml):

    [transforms.x]
      inputs = []
      type = "add_fields"
      ...
    [[tests]]
      name = "case"
      [tests.input]            # or [[tests.inputs]] for several
        insert_at = "x"
        type = "raw"           # raw → {message}, log → log_fields map
        value = "..."
      [[tests.outputs]]
        extract_from = "x"
        [[tests.outputs.conditions]]
          type = "vrl"                    # real VRL source (compiled by
          source = '.a == 1 && .b == "x"' # vector_spark.vrl), or "sql",
                                          # or "check_fields"/is_log/...
      no_outputs_from = ["y"]  # optional: these components emit nothing

    Test inputs: type = "raw" (value → {message}), "log" (log_fields,
    dotted keys nest), "metric" (metric.name/kind/tags/counter... → a
    row in the log_to_metric frame shape), or the "rows" extension.

Execution: each test compiles the shared transform topology with the
test's input events spliced in as an inline source at every
`insert_at` point (the reference builds the interpolated config the
same way), resolves each `extract_from` output, and evaluates every
condition as a SQL predicate over the extracted rows. A check passes
when, for EACH condition, at least ONE output row satisfies it
(unit_test.rs:234-258 — conditions are satisfied independently, not
universally: a green test does NOT guarantee every row matched);
`no_outputs_from` passes when the component yields zero rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.plans.config import (
    TRANSFORMS,
    ConfigError,
    attach_enrichment,
    expand_macros,
    interpolate_env,
)


@dataclass
class CheckResult:
    extract_from: str
    n_rows: int
    failures: list[str]  # failed condition sources (or harness errors)

    @property
    def ok(self) -> bool:
        return not self.failures


@dataclass
class UnitTestResult:
    name: str
    checks: list[CheckResult] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors and all(c.ok for c in self.checks)


def _split_path_key(key: str) -> list[str]:
    """log_fields keys are PATHS in the reference harness: dots nest,
    `\\.` is a literal dot in a segment (event/lookup.rs) — e.g.
    `"a.b\\.c" = x` inserts {a: {"b.c": x}}."""
    segs, cur, i = [], [], 0
    while i < len(key):
        ch = key[i]
        if ch == "\\" and i + 1 < len(key) and key[i + 1] == ".":
            cur.append(".")
            i += 2
            continue
        if ch == ".":
            segs.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    segs.append("".join(cur))
    return segs


def _nest_log_fields(fields: dict) -> object:
    """Path-keyed flat map → one nested Row (structs for nesting)."""
    from pyspark.sql import Row

    tree: dict = {}
    for key, value in fields.items():
        segs = _split_path_key(key)
        node = tree
        for s in segs[:-1]:
            node = node.setdefault(s, {})
        node[segs[-1]] = value

    def to_row(d):
        return Row(**{k: to_row(v) if isinstance(v, dict) else v for k, v in d.items()})

    return to_row(tree)


def _input_rows(inp: dict) -> tuple[list, str | None]:
    """One test-input block → (rows, schema)."""
    kind = inp.get("type", "raw")
    if kind == "raw":
        return [{"message": inp.get("value", "")}], "message string"
    if kind == "log":
        return [_nest_log_fields(inp.get("log_fields", {}))], None
    if kind == "rows":  # extension: multiple typed rows
        return inp["rows"], inp.get("schema")
    if kind == "metric":
        # reference shape (unit_test.rs metric inputs): metric.name/kind/
        # tags.* plus one value table (counter/gauge/set/...). Lands as a
        # row in the repo's metric frame model (log_to_metric's schema);
        # ts is pinned for determinism — no behavior case checks it.
        import datetime

        m = inp.get("metric", {})
        value_type, value, set_values = "counter", None, None
        for t in ("counter", "gauge", "histogram", "summary", "set"):
            if t in m:
                value_type = t
                if t == "set":
                    set_values = [str(x) for x in m[t].get("values", [])]
                else:
                    v = m[t].get("value")
                    value = float(v) if v is not None else None
                break
        row = {
            "name": m.get("name", ""),
            "namespace": m.get("namespace", "vector"),
            "tags": {k: str(v) for k, v in m.get("tags", {}).items()},
            "ts": datetime.datetime(2020, 1, 1),
            "kind": m.get("kind", "absolute"),
            "value_type": value_type,
            "value": value,
            "set_values": set_values,
        }
        return [row], (
            "name string, namespace string, tags map<string,string>, "
            "ts timestamp, kind string, value_type string, value double, "
            "set_values array<string>"
        )
    raise ConfigError(f"unknown test input type {kind!r}")


def _merge_struct_types(a, b):
    """Recursive by-name union of two StructTypes (a's field order first);
    struct-vs-struct recurses, identical types pass, anything else raises."""
    from pyspark.sql import types as T

    fields = []
    b_names = {f.name: f for f in b.fields}
    for fa in a.fields:
        fb = b_names.pop(fa.name, None)
        if fb is None or fa.dataType == fb.dataType:
            fields.append(fa)
        elif isinstance(fa.dataType, T.StructType) and isinstance(fb.dataType, T.StructType):
            fields.append(T.StructField(fa.name, _merge_struct_types(fa.dataType, fb.dataType)))
        else:
            raise ConfigError(
                f"test inputs disagree on field {fa.name!r}: "
                f"{fa.dataType.simpleString()} vs {fb.dataType.simpleString()}")
    fields.extend(b_names.values())
    return T.StructType(fields)


def _conform_col(col, src_dt, tgt_dt):
    from pyspark.sql import types as T

    if isinstance(tgt_dt, T.StructType):
        parts = []
        src_names = {f.name: f for f in src_dt.fields} if isinstance(src_dt, T.StructType) else {}
        for f in tgt_dt.fields:
            if f.name in src_names:
                parts.append(
                    _conform_col(col.getField(f.name), src_names[f.name].dataType, f.dataType).alias(f.name))
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.struct(*parts)
    return col


def _union_events(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union test-input frames whose nested shapes may differ: missing
    top-level columns fill with null (unionByName), and struct columns
    align by a recursive field merge — the reference's events are
    free-form maps, so its harness unions trivially; the static-schema
    analogue widens both sides to the merged schema first."""
    if a.schema == b.schema:
        return a.unionByName(b)
    target = _merge_struct_types(a.schema, b.schema)

    def conform(df):
        cols = []
        names = {f.name: f for f in df.schema.fields}
        for f in target.fields:
            if f.name in names:
                cols.append(_conform_col(df[f.name], names[f.name].dataType, f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    return conform(a).unionByName(conform(b))


def run_unit_tests(
    spark: SparkSession, config: dict | str, env: dict[str, str] | None = None
) -> list[UnitTestResult]:
    """Run every [[tests]] block; returns one result per test."""
    import tomllib

    if isinstance(config, str):
        config = tomllib.loads(interpolate_env(config, env))

    raw_transforms = config.get("transforms", {})
    transforms = expand_macros(raw_transforms)
    transforms = attach_enrichment(transforms, config.get("enrichment_tables"))

    def _injection_targets(at: str) -> list[str]:
        """insert_at on a macro transform means "feed the macro's
        input": a route fans the event to every lane; a compound feeds
        its first step (unit_test.rs splices inputs the same way)."""
        cfg = raw_transforms.get(at, {})
        if cfg.get("type") == "route":
            return [f"{at}.{lane}" for lane in cfg["route"]] + [f"{at}._unmatched"]
        if cfg.get("type") == "compound":
            first = cfg["steps"][0]
            return [f"{at}.{first['id']}" if "id" in first else f"{at}.0"]
        return [at]

    tests = config.get("tests", [])
    results: list[UnitTestResult] = []

    for t in tests:
        res = UnitTestResult(name=t.get("name", "<unnamed>"))
        inputs = t.get("inputs") or ([t["input"]] if "input" in t else [])
        if not inputs:
            res.errors.append("test has no inputs")
            results.append(res)
            continue

        # insert_at → input DataFrame (several inputs to one point union);
        # multi-input tests also get an `__arrival` sequence column — the
        # batch analogue of the reference harness feeding events in TOML
        # order (order-sensitive transforms like `merge` fall back to it)
        injected: dict[str, DataFrame] = {}
        try:
            for seq, inp in enumerate(inputs):
                rows, schema = _input_rows(inp)
                df = spark.createDataFrame(rows, schema)
                if len(inputs) > 1:
                    df = df.withColumn("__arrival", F.lit(seq))
                for at in _injection_targets(inp["insert_at"]):
                    injected[at] = (
                        _union_events(injected[at], df) if at in injected else df
                    )
        except ConfigError as e:
            res.errors.append(str(e))
            results.append(res)
            continue

        built: dict[str, DataFrame] = {}
        building: set[str] = set()

        def resolve(name: str, injected=injected, built=built, building=building) -> DataFrame:
            if name in built:
                return built[name]
            if name in building:
                raise ConfigError(f"cycle through {name!r}")
            if name not in transforms:
                raise ConfigError(f"unknown component {name!r}")
            cfg = transforms[name]
            building.add(name)
            try:
                if name in injected:
                    df = injected[name]
                else:
                    ups = [resolve(i) for i in cfg.get("inputs", [])]
                    if not ups:
                        raise ConfigError(
                            f"{name!r} has no inputs and no test input inserted"
                        )
                    df = ups[0]
                    for o in ups[1:]:
                        df = df.unionByName(o, allowMissingColumns=True)
            finally:
                building.discard(name)
            try:
                builder = TRANSFORMS[cfg["type"]]
            except KeyError:
                raise ConfigError(f"unknown transform type {cfg.get('type')!r}") from None
            out = builder(df, cfg)
            built[name] = out
            return out

        for check in t.get("outputs", []):
            src = check["extract_from"]
            try:
                rows = resolve(src).collect()
            except Exception as e:  # compile errors fail the check, not the suite
                res.checks.append(CheckResult(src, 0, [f"resolve error: {e}"]))
                continue
            failures: list[str] = []
            if not rows:
                failures.append("no events extracted")
            else:
                out_df = spark.createDataFrame(rows, resolve(src).schema)
                for cond in check.get("conditions", []):
                    kind = cond.get("type", "sql")
                    pred = cond.get("source", cond)
                    # reference semantics (unit_test.rs:234-258): a
                    # condition passes when AT LEAST ONE output event
                    # satisfies it
                    if kind == "vrl":
                        from vector_spark.vrl import compile_condition as vrl_cond

                        try:
                            col = vrl_cond(pred, out_df.schema)
                        except Exception as e:
                            failures.append(f"vrl condition error: {e}: {pred}")
                            continue
                    elif kind == "sql":
                        col = F.expr(pred)
                    else:
                        # check_fields / datadog_search / is_log / ... —
                        # the shared condition compiler handles them
                        from vector_spark.plans.config import compile_condition

                        try:
                            col = compile_condition(cond, out_df)
                        except Exception as e:
                            failures.append(f"condition error: {e}: {cond}")
                            continue
                    n_ok = out_df.filter(F.coalesce(col, F.lit(False))).count()
                    if n_ok == 0:
                        failures.append(pred)
            res.checks.append(CheckResult(src, len(rows), failures))

        for src in t.get("no_outputs_from", []):
            try:
                n = len(resolve(src).take(1))
            except Exception as e:
                res.checks.append(CheckResult(src, 0, [f"resolve error: {e}"]))
                continue
            res.checks.append(
                CheckResult(src, n, [] if n == 0 else [f"expected no outputs from {src!r}"])
            )
        results.append(res)

    return results


def assert_unit_tests(spark: SparkSession, config: dict | str) -> None:
    """pytest helper: raise AssertionError with a readable report."""
    results = run_unit_tests(spark, config)
    bad = [r for r in results if not r.ok]
    if bad:
        lines = []
        for r in bad:
            lines.append(f"test {r.name!r} FAILED")
            lines.extend(f"  error: {e}" for e in r.errors)
            for c in r.checks:
                if not c.ok:
                    lines.append(f"  extract_from {c.extract_from} ({c.n_rows} rows):")
                    lines.extend(f"    condition failed: {f}" for f in c.failures)
        raise AssertionError("\n".join(lines))
    assert results, "no [[tests]] blocks found"
