"""Config → topology compiler: Vector's `vector.toml` front-end.

Mirrors the reference compile pipeline
(/root/reference/src/config/compiler.rs:7-101):
  1. name validation (compiler.rs:13-21)
  2. macro expansion — `route` expands into one output port per lane
     (ExpandType::Parallel, compiler.rs:105-151 + route.rs:101-120);
     `compound` expands into a serial chain (compound.rs:58)
  3. input resolution — a component with several `inputs` receives the
     UNION of its upstreams (config/graph.rs via compiler.rs:62-77);
     an output consumed by several components is FANNED OUT by reusing
     one DataFrame (fanout.rs:32-36), persisted when it feeds 2+ sinks
  4. graph checks — unknown inputs and cycles are compile errors
     (Graph::typecheck, compiler.rs:50-60); schema compatibility is
     delegated to Catalyst's analyzer at build time

The config shape is Vector's: `[sources.X] / [transforms.Y] /
[sinks.Z]` tables with `type` and `inputs`. Conditions are the
reference's own forms — `vrl` (real VRL source, compiled by
vector_spark.vrl), `check_fields`, `datadog_search`, `is_log` /
`is_metric` — plus a `sql` escape hatch. Parse with ``tomllib.loads``
or pass a plain dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConfigError(ValueError):
    pass


# ---------------------------------------------------------------- builders


def _src_parquet(spark, cfg):
    return spark.read.parquet(cfg["path"])


def _src_generator(spark, cfg):
    from vector_spark.corpus import sequences

    return sequences(spark, int(cfg.get("count", 1000)), seed=int(cfg.get("seed", 42)))


def _src_stream_parquet(spark, cfg):
    """Streaming file source (the `file`/`kafka` plan position:
    readStream over a growing directory; file streams require a
    declared schema). Downstream transforms work unchanged — stateful
    ones (aggregate/dedupe) compile to their watermarked streaming
    forms; sinks run as checkpointed availableNow micro-batches
    (streaming/sink.py). `max_files_per_trigger` splits a backlog into
    several micro-batches (the watermark advances between batches, so
    earlier windows finalize as later files arrive — same effect as a
    live stream)."""
    reader = spark.readStream.schema(cfg["schema"])
    if "max_files_per_trigger" in cfg:
        reader = reader.option("maxFilesPerTrigger", int(cfg["max_files_per_trigger"]))
    return reader.parquet(cfg["path"])


def _src_internal_metrics(spark, cfg):
    """Vector's internal_metrics source (src/sources/internal_metrics.rs):
    the pipeline's own instrumentation re-enters the topology as metric
    events. Batch shape: read the Prometheus exposition snapshots a
    TopMonitor run wrote (plans/top.py, `run_config.py --top`) — one
    event per metric line: (snapshot file, name, labels map, value,
    timestamp_ms). Composes with every transform/sink like any other
    source (e.g. internal_metrics → filter → metric_to_log → parquet).
    `drop_invalid` (default true) drops comment/HELP/TYPE lines."""
    from vector_spark.functions.metrics_codec import parse_prometheus

    lines = spark.read.text(cfg["path"])
    g = parse_prometheus(F.col("value"))
    df = lines.select(
        F.input_file_name().alias("snapshot"),
        g["name"].alias("name"),
        g["labels"].alias("labels"),
        g["value"].alias("value"),
        g["timestamp_ms"].alias("timestamp_ms"),
        g["error"].alias("error"),
    )
    if cfg.get("drop_invalid", True):
        df = df.where(F.col("error").isNull()).drop("error")
    return df


def _src_kafka(spark, cfg):
    """Compile-wired kafka source (src/sources/kafka.rs); raises
    EnvironmentBlocked in jar-less environments — run_config --validate
    reports that state honestly instead of failing the config."""
    from vector_spark.streaming.kafka import kafka_source

    return kafka_source(spark, cfg)


SOURCES = {
    "parquet": _src_parquet,
    "generator": _src_generator,
    "stream_parquet": _src_stream_parquet,
    "internal_metrics": _src_internal_metrics,
    "kafka": _src_kafka,
}


def compile_condition(cond, df=None) -> "F.Column":
    """A condition is a SQL string, or a dict {type, source} where type
    is "sql" (SQL expression), "vrl" (real VRL source text, compiled by
    vector_spark.vrl against the input schema — src/conditions/vrl.rs),
    or "datadog_search" (conditions/datadog_search.rs)."""
    if isinstance(cond, dict):
        kind = cond.get("type", "sql")
        if kind in ("is_log", "is_metric") and "source" not in cond:
            # event-type checks (src/conditions/is_log.rs / is_metric.rs):
            # logs and metrics are separate DataFrames in our model
            # (SURVEY §1.3), so the check is a compile-time shape test on
            # the frame — metric frames carry the log_to_metric columns.
            if df is None:
                raise ConfigError(f"{kind} conditions need the input frame")
            metric_shaped = {"name", "kind", "value_type", "value"} <= set(df.columns)
            return F.lit(metric_shaped if kind == "is_metric" else not metric_shaped)
        if kind == "check_fields":
            # {"field.predicate": value, ...} — check_fields.rs
            from vector_spark.functions.conditions import check_fields

            return check_fields({k: v for k, v in cond.items() if k != "type"})
        src = cond["source"]
        if kind == "datadog_search":
            from vector_spark.functions.datadog_search import datadog_search

            return datadog_search(src)
        if kind == "vrl":
            if df is None:
                raise ConfigError("vrl conditions need the input schema")
            from vector_spark.vrl import compile_condition as vrl_condition

            return vrl_condition(src, df.schema)
        if kind in ("sql", "is_log"):
            return F.expr(src)
        raise ConfigError(f"unknown condition type {kind!r}")
    return F.expr(cond)


def _t_filter(df, cfg):
    """condition: SQL string, {type, source} dict, or the legacy
    `condition_type` sibling key."""
    from vector_spark.operators.filter import Filter

    cond = cfg["condition"]
    if isinstance(cond, str) and cfg.get("condition_type") == "datadog_search":
        cond = {"type": "datadog_search", "source": cond}
    return Filter(compile_condition(cond, df)).apply(df)


def _t_filter_not_any(df, cfg):
    """Route's `_unmatched` lane when lane conditions are typed objects:
    rows matching NO lane condition."""
    out = F.lit(False)
    for cond in cfg["conditions"]:
        out = out | F.coalesce(compile_condition(cond, df), F.lit(False))
    return df.filter(~out)


def _t_field_filter(df, cfg):
    return df.filter(F.col(cfg["field"]) == F.lit(cfg["value"]))


def _t_sample(df, cfg):
    from vector_spark.operators.sample import Sample

    return Sample(
        rate=int(cfg["rate"]),
        key_field=cfg.get("key_field"),
        modulo=bool(cfg.get("modulo", False)),
        exclude=F.expr(cfg["exclude"]) if "exclude" in cfg else None,
    ).apply(df)


def _t_dedupe(df, cfg):
    fields = cfg.get("fields", {})
    match = fields.get("match", ["timestamp", "host", "message"])
    if df.isStreaming:
        # streaming form: Vector's dedupe LRU (dedupe.rs:33-58) becomes
        # dropDuplicatesWithinWatermark — a time-bounded instead of
        # count-bounded seen-set, state evicted past the horizon
        from vector_spark.streaming.pipeline import streaming_dedupe

        return streaming_dedupe(
            df,
            tuple(match),
            watermark=cfg.get("watermark", "30 seconds"),
            ts_col=cfg.get("ts_col", "ts"),
        )
    from vector_spark.operators.dedupe import Dedupe

    return Dedupe(
        match=match,
        order_by=cfg.get("order_by", "ts"),
        tiebreak=cfg.get("tiebreak"),
    ).apply(df)


def _t_add_fields(df, cfg):
    from vector_spark.operators.fields import AddFields

    return AddFields(cfg["fields"], overwrite=bool(cfg.get("overwrite", True))).apply(df)


def _t_remove_fields(df, cfg):
    from vector_spark.operators.fields import RemoveFields

    return RemoveFields(cfg["fields"], drop_empty=bool(cfg.get("drop_empty"))).apply(df)


def _t_rename_fields(df, cfg):
    from vector_spark.operators.fields import RenameFields

    return RenameFields(cfg["fields"], drop_empty=bool(cfg.get("drop_empty"))).apply(df)


def _t_coercer(df, cfg):
    from vector_spark.operators.fields import Coercer

    return Coercer(cfg["types"], drop_unspecified=bool(cfg.get("drop_unspecified"))).apply(df)


def _merge_json_shape(a, b):
    """Union two sampled JSON values into one shape (dicts merge
    recursively, conflicting scalar types widen to string)."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge_json_shape(out.get(k), v) if k in out else v
        return out
    if a is None:
        return b
    if b is None or type(a) is type(b):
        return a
    return ""  # mixed scalar types → string


def _schema_of_py(value):
    from pyspark.sql import types as T

    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(k, _schema_of_py(v)) for k, v in value.items()])
    if isinstance(value, list):
        inner = None
        for v in value:
            inner = _merge_json_shape(inner, v)
        return T.ArrayType(_schema_of_py(inner))
    if value is None:
        return T.NullType()
    return T.StringType()


def _t_json_parser(df, cfg):
    import json as _json

    fld = cfg.get("field", "message")
    target = cfg.get("target_field")
    keys = cfg.get("keys")
    if keys:
        # explicit key list: promote from the parsed map (the scale
        # path — no inference pass)
        from vector_spark.functions.parse import parse_json_map

        parsed = parse_json_map(F.col(fld))
        out = df
        for k in keys:
            out = out.withColumn(k, F.element_at(parsed, k))
        return out
    # no keys: infer the struct the way spark.read.json does — ONE
    # tiny driver-side sample pass decides the schema (json_parser.rs
    # merges parsed keys into the event; a columnar engine needs the
    # shape up front). Production inputs should pass `keys` or
    # `target_field` with a known shape; the sample is capped.
    shape = None
    for row in df.select(fld).limit(100).collect():
        if not row[0]:
            continue
        try:
            v = _json.loads(row[0])
        except ValueError:
            continue
        if isinstance(v, dict):
            shape = _merge_json_shape(shape, v)
    if shape is None:
        raise ConfigError(
            f"json_parser could not infer a schema from {fld!r} "
            f"(no parseable JSON objects in the sample); pass `keys` "
            f"or `target_field`")
    parsed = F.from_json(F.col(fld), _schema_of_py(shape))
    if target:
        return df.withColumn(target, parsed)
    out = df
    for name in shape:
        out = out.withColumn(name, parsed[name])
    if cfg.get("drop_field", True) and fld not in shape:
        out = out.drop(fld)  # json_parser.rs drop_field default
    return out


def _t_regex_parser(df, cfg):
    import re as _re

    from vector_spark.operators.remap import RegexParser

    patterns = []
    for entry in cfg["patterns"]:
        if isinstance(entry, str):
            # reference shape: Rust-style named captures in the pattern.
            # Java regex rejects (?P<...> and underscores in group
            # names, so strip the names to plain groups and address
            # them positionally via Python's groupindex.
            groups = dict(_re.compile(entry).groupindex)
            java_rx = _re.sub(r"\(\?P<\w+>", "(", entry)
            patterns.append((java_rx, groups))
        else:
            p, g = entry
            patterns.append((p, {k: int(v) for k, v in g.items()}))
    return RegexParser(
        patterns,
        field=cfg.get("field", "message"),
        types=cfg.get("types", {}),
        target_field=cfg.get("target_field"),
    ).apply(df)


def _t_grok_parser(df, cfg):
    from vector_spark.functions.grok import grok_extract
    from vector_spark.operators.remap import nest_outputs

    caps = grok_extract(F.col(cfg.get("field", "message")), cfg["pattern"])
    out = df
    for name, col in nest_outputs(df, caps).items():
        out = out.withColumn(name, col)
    return out


def _t_ansi_stripper(df, cfg):
    from vector_spark.operators.fields import AnsiStripper

    return AnsiStripper(cfg.get("field", "message")).apply(df)


def _t_aggregate(df, cfg):
    group = cfg.get("group_by", [])
    aggs = []
    for out_name, spec in cfg["aggregates"].items():
        fn, _, col = spec.partition(":")
        fns = {
            "count": lambda c: F.count(F.lit(1)),
            "sum": F.sum,
            "min": F.min,
            "max": F.max,
            "avg": F.avg,
            "count_distinct": F.countDistinct,
        }
        aggs.append(fns[fn](col).alias(out_name))
    if df.isStreaming:
        # streaming form: Vector aggregate's interval_ms flush
        # (aggregate.rs:18-26,110-143) becomes a watermarked tumbling
        # window — a window finalizes (and emits exactly once in append
        # mode) when the watermark passes its end; windows still open
        # when an availableNow backlog drains stay in the checkpointed
        # state store and flush on the next run, the micro-batch
        # analogue of Vector's drain-on-shutdown flush.
        interval_ms = int(cfg.get("interval_ms", 10_000))
        watermark = cfg.get("watermark", f"{2 * interval_ms} milliseconds")
        ts_col = cfg.get("ts_col", "ts")
        out = (
            df.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, f"{interval_ms} milliseconds").alias("__w"), *group)
            .agg(*aggs)
        )
        keep = [c for c in out.columns if c != "__w"]
        return out.select(F.col("__w.start").alias("window_start"), *keep)
    return df.groupBy(*group).agg(*aggs)


def _t_remap(df, cfg):
    """The `remap` transform (remap.rs:21-29). Two front-ends:

    - `source = "<VRL program>"` or `file = "program.vrl"` — REAL VRL
      source text, compiled to Column expressions by vector_spark.vrl
      (lexer → AST → typed Column compiler). drop_on_error /
      drop_on_abort follow remap.rs:123-176: a failed or aborted
      program restores the original event unless dropped.
    - `exprs = {target = "sql expr"}` — the SQL-expression dialect kept
      from earlier rounds (useful when the logic is already SQL).
    """
    if "source" in cfg or "file" in cfg:
        from vector_spark.vrl import compile_program

        if "source" in cfg:
            src = cfg["source"]
        else:
            src = _read_vrl_file(cfg["file"])
        enrichment = None
        if cfg.get("_enrichment_tables"):
            enrichment = {
                name: load_enrichment_rows(tbl)
                for name, tbl in cfg["_enrichment_tables"].items()
            }
        prog = compile_program(
            src,
            drop_on_error=bool(cfg.get("drop_on_error", False)),
            drop_on_abort=bool(cfg.get("drop_on_abort", True)),
            enrichment=enrichment,
            strict=bool(cfg.get("_strict_vrl", False)),
        )
        return prog.apply(df)

    from vector_spark.operators.remap import Remap

    outputs = {name: F.expr(sql) for name, sql in cfg["exprs"].items()}
    success = F.expr(cfg["success"]) if "success" in cfg else None
    return Remap(
        outputs, success=success, drop_on_error=bool(cfg.get("drop_on_error", False))
    ).apply(df)


def load_enrichment_rows(cfg: dict) -> list[dict]:
    """One [enrichment_tables.X] block (reference shape:
    src/enrichment_tables/file.rs — type="file", file.path CSV,
    schema = per-column Conversion names) → driver-side rows for the
    VRL lookup functions. Enrichment tables are broadcast-class by
    contract; big lookups belong to the `enrich` transform's broadcast
    join, not here."""
    import csv as _csv
    import pathlib

    if cfg.get("type", "file") != "file":
        raise ConfigError(f"unsupported enrichment table type {cfg.get('type')!r}")
    path = cfg["file"]["path"] if isinstance(cfg.get("file"), dict) else cfg["file"]
    p = pathlib.Path(path)
    if not p.is_file():
        alt = pathlib.Path(__file__).resolve().parents[2] / path
        if alt.is_file():
            p = alt
        else:
            raise ConfigError(f"enrichment table file not found: {path}")
    with p.open() as fh:
        rows = list(_csv.DictReader(fh))
    schema = cfg.get("schema", {})
    conv = {
        "integer": int, "int": int, "float": float,
        "string": str, "bytes": str,
        "bool": lambda s: s.strip().lower() in ("true", "t", "yes", "1"),
        "boolean": lambda s: s.strip().lower() in ("true", "t", "yes", "1"),
    }
    for col, spec in schema.items():
        kind = str(spec).partition("|")[0].strip()
        fn = conv.get(kind)
        if fn is None:
            raise ConfigError(f"unsupported enrichment schema type {spec!r} for VRL lookups")
        for r in rows:
            r[col] = fn(r[col])
    return rows


def attach_enrichment(transforms: dict, enrichment_cfg: dict | None) -> dict:
    """Thread the global [enrichment_tables.*] section into every remap
    transform cfg (the VRL lookup functions resolve tables by name)."""
    if not enrichment_cfg:
        return transforms
    out = {}
    for name, cfg in transforms.items():
        if cfg.get("type") == "remap":
            cfg = {**cfg, "_enrichment_tables": enrichment_cfg}
        out[name] = cfg
    return out


def _read_vrl_file(path: str) -> str:
    """`file =` resolves as given, then relative to the repo root (the
    reference resolves relative to the Vector working dir)."""
    import pathlib

    p = pathlib.Path(path)
    if not p.is_file():
        repo_root = pathlib.Path(__file__).resolve().parents[2]
        alt = repo_root / path
        if alt.is_file():
            p = alt
        else:
            raise ConfigError(f"remap file not found: {path}")
    return p.read_text()


def _parse_concat_item(item: str):
    """'field', 'field[a..b]', 'field[-2..]', 'field[..3]' — the
    concat.rs substring-item grammar with open/negative bounds."""
    import re as _re

    m = _re.match(r"^([\w.]+?)(?:\[(-?\d*)\.\.(-?\d*)\])?$", item)
    if not m:
        raise ConfigError(f"bad concat item {item!r}")
    name, a, b = m.groups()
    return (name, int(a) if a else None, int(b) if b else None)


def _t_concat(df, cfg):
    from vector_spark.operators.fields import Concat

    items = [_parse_concat_item(i) for i in cfg["items"]]
    return Concat(cfg["target"], items, joiner=cfg.get("joiner", " ")).apply(df)


def _t_key_value_parser(df, cfg):
    from vector_spark.operators.remap import KeyValueParser

    if "promote" not in cfg and "target_field" not in cfg \
            and "trim_key" not in cfg and "trim_value" not in cfg:
        # reference default (key_value_parser.rs): ALL parsed keys
        # insert at the event root, values kept RAW (quotes included).
        # Key set via the same sampled inference as json_parser — one
        # tiny driver pass; production configs list `promote` instead.
        fld = cfg.get("field", "message")
        sep = cfg.get("separator", " ")
        fs = cfg.get("field_split", "=")
        keys: list[str] = []
        for row in df.select(fld).limit(100).collect():
            for tok in (row[0] or "").split(sep):
                if fs in tok:
                    k = tok.partition(fs)[0].strip()
                    if k and k not in keys:
                        keys.append(k)
        if not keys:
            raise ConfigError(
                f"key_value_parser could not infer keys from {fld!r}; "
                f"pass `promote` or `target_field`")
        m = F.str_to_map(F.col(fld), F.lit(sep), F.lit(fs))
        m = F.map_from_arrays(
            F.transform(F.map_keys(m), F.trim),
            F.map_values(m),
        )
        out = df
        for k in keys:
            out = out.withColumn(k, F.element_at(m, k))
        return out
    return KeyValueParser(
        field=cfg.get("field", "message"),
        separator=cfg.get("separator", " "),
        field_split=cfg.get("field_split", "="),
        target_field=cfg.get("target_field", "attrs"),
        promote=cfg.get("promote"),
        drop_failed=bool(cfg.get("drop_failed", False)),
        trim_key=cfg.get("trim_key"),
        trim_value=cfg.get("trim_value"),
    ).apply(df)


def _t_logfmt_parser(df, cfg):
    from vector_spark.functions.parse import parse_logfmt
    from vector_spark.functions.strings import to_bool
    from vector_spark.operators.remap import nest_outputs

    m = parse_logfmt(F.col(cfg.get("field", "message")))
    types = cfg.get("types", {})
    out = df.withColumn(cfg.get("target_field", "attrs"), m)
    promoted = {}
    for k in [*cfg.get("promote", []), *types]:
        c = F.element_at(m, k)
        t = types.get(k)
        if t in ("bool", "boolean"):
            c = to_bool(c)
        elif t and t != "string":
            c = c.try_cast({"int": "long", "float": "double"}.get(t, t))
        promoted[k] = c
    # dotted keys ("nested.code") insert by path, as the reference's
    # root-level log.insert does (logfmt_parser.rs:66)
    for name, col in nest_outputs(out, promoted).items():
        out = out.withColumn(name, col)
    return out


def _t_split(df, cfg):
    from vector_spark.operators.remap import Split

    return Split(
        cfg["field_names"],
        field=cfg.get("field", "message"),
        separator=cfg.get("separator", r"\s+"),
        types=cfg.get("types"),
    ).apply(df)


def _t_tokenizer(df, cfg):
    from vector_spark.operators.remap import Tokenizer

    return Tokenizer(
        cfg["field_names"],
        field=cfg.get("field", "message"),
        types=cfg.get("types"),
        drop_field=bool(cfg.get("drop_field", False)),
    ).apply(df)


def _t_merge(df, cfg):
    from vector_spark.operators.merge import MergePartials

    return MergePartials(
        cfg.get("fields", cfg.get("merge_fields", ["message"])),
        stream_discriminant=cfg.get(
            "stream_discriminant_fields", cfg.get("stream_discriminant", ["host"])
        ),
        partial_marker=cfg.get("partial_event_marker_field", "_partial"),
        order_by=cfg.get("order_by", "ts"),
    ).apply(df)


def _t_reduce(df, cfg):
    from vector_spark.operators.reduce import BoundedReduce, Reduce

    if cfg.get("starts_when") or cfg.get("ends_when"):
        return BoundedReduce(
            cfg["group_by"],
            cfg.get("merge_strategies", {}),
            order_by=cfg.get("order_by", "ts"),
            starts_when=cfg.get("starts_when"),
            ends_when=cfg.get("ends_when"),
        ).apply(df)
    return Reduce(
        cfg["group_by"],
        cfg.get("merge_strategies", {}),
        order_by=cfg.get("order_by", "ts"),
    ).apply(df)


def _t_log_to_metric(df, cfg):
    from vector_spark.operators.log_to_metric import LogToMetric, MetricSpec

    specs = [
        MetricSpec(
            type=m["type"],
            field=m["field"],
            name=m.get("name"),
            namespace=m.get("namespace", "vector"),
            increment_by_value=bool(m.get("increment_by_value", False)),
            tags=m.get("tags"),
        )
        for m in cfg["metrics"]
    ]
    return LogToMetric(specs).apply(df)


def _t_tag_cardinality_limit(df, cfg):
    from vector_spark.operators.tag_cardinality_limit import (
        MapTagCardinalityLimit,
        TagCardinalityLimit,
    )

    if "keys" in cfg:
        return MapTagCardinalityLimit(
            cfg["keys"],
            value_limit=int(cfg.get("value_limit", 500)),
            action=cfg.get("limit_exceeded_action", "drop_tag"),
            tags_col=cfg.get("tags_col", "tags"),
            ts_col=cfg.get("ts_col", "ts"),
        ).apply(df)
    return TagCardinalityLimit(
        cfg["tag"],
        value_limit=int(cfg.get("value_limit", 500)),
        action=cfg.get("limit_exceeded_action", "drop_tag"),
        ts_col=cfg.get("ts_col", "ts"),
    ).apply(df)


# chrono strftime directives → Spark datetime-pattern fragments, for the
# reference's "date|%m/%d/%Y" / "timestamp|fmt" schema values
# (src/enrichment_tables/file.rs:63-93 splits on '|' and hands the tail
# to chrono). Only directives with an exact Spark equivalent translate;
# anything else is a named ConfigError, not silent garbage.
_CHRONO_TO_SPARK = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%M": "mm", "%S": "ss", "%f": "SSSSSSSSS", "%3f": "SSS",
    "%6f": "SSSSSS", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%j": "DDD", "%z": "xx", "%:z": "xxx", "%%": "%",
}


def _chrono_to_spark_fmt(fmt: str) -> str:
    import re as _re

    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            m = _re.match(r"%(?::z|3f|6f|%|[A-Za-z])", fmt[i:])
            if not m or m.group(0) not in _CHRONO_TO_SPARK:
                raise ConfigError(
                    f"unsupported chrono directive {fmt[i:i+3]!r} in enrichment "
                    f"schema format {fmt!r} (supported: {sorted(_CHRONO_TO_SPARK)})"
                )
            out.append(_CHRONO_TO_SPARK[m.group(0)])
            i += len(m.group(0))
        elif fmt[i].isalpha():
            # letters are pattern chars in Spark — quote them
            j = i
            while j < len(fmt) and fmt[j].isalpha():
                j += 1
            out.append("'" + fmt[i:j] + "'")
            i = j
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _apply_enrich_schema_map(df, schema: dict):
    """Column-wise conversion for the reference's per-column schema map
    (src/enrichment_tables/file.rs parse_column:52-106): values are
    Conversion names — string/bytes, int/integer, float, bool/boolean,
    timestamp[|fmt] — plus the date[|fmt] special case. Unknown columns
    pass through untouched (the reference only converts mapped columns).
    """
    for col, spec in schema.items():
        if col not in df.columns:
            raise ConfigError(
                f"enrichment schema names column {col!r} not present in the "
                f"CSV header ({df.columns})"
            )
        kind, _, fmt = (s.strip() for s in str(spec).partition("|"))
        c = F.col(col)
        if kind in ("string", "bytes"):
            conv = c.cast("string")
        elif kind in ("int", "integer"):
            conv = c.cast("long")
        elif kind == "float":
            conv = c.cast("double")
        elif kind in ("bool", "boolean"):
            conv = c.cast("boolean")
        elif kind == "date":
            # reference: midnight-UTC timestamp from a date-only parse
            pat = _chrono_to_spark_fmt(fmt) if fmt else "yyyy-MM-dd"
            conv = F.to_timestamp(F.to_date(c, pat))
        elif kind == "timestamp":
            if fmt in ("", "%+"):  # %+ = RFC 3339 — Spark's default parse
                conv = F.to_timestamp(c)
            else:
                conv = F.to_timestamp(c, _chrono_to_spark_fmt(fmt))
        else:
            raise ConfigError(
                f"unknown enrichment schema type {spec!r} for column {col!r} "
                "(expected string/bytes/int/integer/float/bool/boolean/"
                "date[|fmt]/timestamp[|fmt])"
            )
        df = df.withColumn(col, conv)
    return df


def _t_enrich(df, cfg):
    """Enrichment-table broadcast join from inline rows or a parquet
    path (SURVEY §2.6; src/enrichment_tables/file.rs)."""
    from vector_spark.enrich import EnrichmentTable

    spark = df.sparkSession
    tbl = cfg["table"]
    if "path" in tbl:
        path = tbl["path"]
        if path.endswith(".csv"):
            # the reference's native format: headers + delimiter + an
            # optional per-column schema (file.rs:14-44)
            reader = spark.read.option("header", True).option(
                "sep", tbl.get("delimiter", ",")
            )
            schema = tbl.get("schema")
            if isinstance(schema, dict):
                # reference shape (file.rs FileConfig.schema /
                # parse_column:52-106): a per-column map like
                # {col = "integer", d = "date|%m/%d/%Y"} — read raw
                # strings, then convert column-wise below.
                dim = reader.csv(path)
                dim = _apply_enrich_schema_map(dim, schema)
            elif schema is not None:
                # Spark-native: DDL string or StructType
                try:
                    dim = reader.schema(schema).csv(path)
                except Exception as exc:  # surface a named error, not Spark's opaque one
                    raise ConfigError(
                        "enrichment table `schema` must be a per-column map "
                        '({col = "integer", d = "date|%m/%d/%Y"}) or a Spark DDL '
                        f"string/StructType; got {schema!r}: {exc}"
                    ) from exc
            else:
                dim = reader.csv(path)
        else:
            dim = spark.read.parquet(path)
    else:
        dim = spark.createDataFrame(tbl["rows"], tbl["schema"])
    return EnrichmentTable(
        dim, keys=cfg["keys"], case_insensitive=bool(cfg.get("case_insensitive", False))
    ).enrich(df)


def _t_passthrough(df, cfg):
    """Identity — used by compound expansion to alias the chain's tail
    to the compound's own name."""
    return df


def _t_lua(df, cfg):
    """Embedded per-event scripting escape hatch — the plan position of
    the reference's lua v1/v2 runtime transform (src/transforms/lua/
    v2/mod.rs:45-50, lib/vector-core/src/transform/runtime_transform.rs):
    arbitrary per-event mutation with 0..N emissions. The hook dialect
    here is PYTHON (this build has no Lua runtime; the contract — an
    `event` record the hook mutates, an `emit` callback for explicit /
    multiple emissions — is the same).

    Two forms, mirroring v1 and v2:
    - `source` alone: statements run per event with `event` (dict) and
      `emit` in scope; if `emit` is never called the (mutated) event is
      emitted once; `event = None` drops it.
    - `source` + `hooks.process = "fn_name"`: `source` executes ONCE at
      module scope (v2's setup/source block), then the named function
      is called per event as fn(event, emit).

    `schema` (DDL string) declares the output columns — the static
    schema Spark requires where Lua events are dynamically typed.
    Deliberately row-at-a-time inside Arrow batches: per-event
    scripting IS the semantic; hot paths belong in remap/SQL, exactly
    as the reference docs steer users from lua to VRL.

    The full embedded-runtime contract — `hooks.init` / `hooks.shutdown`
    and `timers = [{interval_seconds, handler}]` with state persisting
    across every hook — dispatches to _lua_runtime (single ordered
    replay group, event-time timers); stateless process-only configs
    stay on the parallel mapInPandas path below."""
    import textwrap

    import pandas as pd
    from pyspark.sql.types import StructType

    schema_ddl = cfg["schema"]
    names = [f.name for f in StructType.fromDDL(schema_ddl).fields]
    hooks_cfg = cfg.get("hooks") or {}
    if cfg.get("timers") or hooks_cfg.get("init") or hooks_cfg.get("shutdown"):
        return _lua_runtime(df, cfg, names, schema_ddl)
    hook_name = hooks_cfg.get("process")
    src = textwrap.dedent(cfg["source"]) if "source" in cfg else None

    def run(batches):
        module_env: dict = {}
        process = None
        if hook_name is not None:
            exec(compile(src or "", "<lua-source>", "exec"), module_env)
            process = module_env[hook_name]
        else:
            code = compile(src, "<lua-hook>", "exec")
        for pdf in batches:
            out_rows = []
            for rec in pdf.to_dict("records"):
                emitted: list = []
                if process is not None:
                    process(rec, emitted.append)
                else:
                    env = {**module_env, "event": rec, "emit": emitted.append}
                    exec(code, env)
                    if not emitted and env.get("event") is not None:
                        emitted = [env["event"]]
                out_rows.extend(emitted)
            if out_rows:
                yield pd.DataFrame(out_rows).reindex(columns=names)

    return df.mapInPandas(run, schema_ddl)


def _lua_runtime(df, cfg, names, schema_ddl):
    """Embedded-runtime contract: init/process/shutdown hooks + interval
    timers with state shared across all of them (src/transforms/lua/v2/
    mod.rs:118-132 Lua{hook_init, hook_process, hook_shutdown, timers},
    lib/vector-core/src/transform/runtime_transform.rs RuntimeTransform —
    init at start, process per event, each timer's handler every
    interval, shutdown at end, one VM throughout).

    The reference runs lua as ONE serial TaskTransform — a single Lua VM
    consuming the whole event stream in order with VM-global state. The
    faithful batch mapping is therefore a SINGLE ordered applyInPandas
    group: all events sorted by `timestamp_field` (default "ts"),
    replayed through init → (timer fires ∥ process) → shutdown in one
    shared Python module namespace. Serial-by-design is the same scale
    ceiling as the reference's own lua transform.

    Documented divergence: batch data has no wall clock, so "every N
    seconds" reads as EVENT-TIME boundaries — timer k next fires at
    t_first + i*interval and fires (in next-fire order, ties by timer
    index) before the first event at/past that boundary; boundaries
    past the last event never fire (shutdown covers the tail, as in the
    reference's drain). Wall-clock timers for live streams remain the
    applyInPandasWithState path (streaming/pipeline.py)."""
    import textwrap

    import pandas as pd

    timers = cfg.get("timers") or []
    hooks_cfg = cfg.get("hooks") or {}
    ts_field = cfg.get("timestamp_field", "ts")
    if timers and ts_field not in df.columns:
        raise ConfigError(
            f"lua timers replay on event time: column {ts_field!r} not in input "
            f"(set timestamp_field to the event-time column)"
        )
    src = textwrap.dedent(cfg.get("source", ""))

    def fn(pdf):
        module_env: dict = {}
        exec(compile(src, "<lua-source>", "exec"), module_env)

        def hook(name):
            h = hooks_cfg.get(name)
            return module_env[h] if h else None

        h_init, h_process, h_shutdown = hook("init"), hook("process"), hook("shutdown")
        emitted: list = []
        emit = emitted.append
        if ts_field in pdf.columns and len(pdf):
            pdf = pdf.sort_values(ts_field, kind="stable")
        if h_init:
            h_init(emit)
        fires: list[tuple[float, int]] = []
        handlers = []
        tsec = None
        if timers and len(pdf):
            tcol = pdf[ts_field]
            tsec = (
                tcol.astype("int64") / 1e9
                if str(tcol.dtype).startswith("datetime")
                else tcol.astype(float)
            )
            t0 = float(tsec.iloc[0])
            fires = [(t0 + float(t["interval_seconds"]), i) for i, t in enumerate(timers)]
            handlers = [module_env[t["handler"]] for t in timers]
        for idx, rec in enumerate(pdf.to_dict("records")):
            if fires:
                ts_e = float(tsec.iloc[idx])
                while True:
                    due, ti = min(fires)
                    if due > ts_e:
                        break
                    handlers[ti](emit)
                    fires[fires.index((due, ti))] = (
                        due + float(timers[ti]["interval_seconds"]),
                        ti,
                    )
            if h_process:
                h_process(rec, emit)
        if h_shutdown:
            h_shutdown(emit)
        if not emitted:
            return pd.DataFrame(columns=names)
        return pd.DataFrame(emitted).reindex(columns=names)

    return df.groupBy(F.lit(1).alias("__lua_g")).applyInPandas(fn, schema_ddl)


def _t_add_tags(df, cfg):
    """Metric-tag insert (add_tags.rs): `tags = {k = "v"}`, `overwrite`."""
    from vector_spark.operators.fields import AddTags

    return AddTags(
        dict(cfg["tags"]),
        overwrite=bool(cfg.get("overwrite", True)),
        tags_col=cfg.get("tags_col", "tags"),
    ).apply(df)


def _t_remove_tags(df, cfg):
    """Metric-tag delete (remove_tags.rs): `tags = ["k", ...]`."""
    from vector_spark.operators.fields import RemoveTags

    return RemoveTags(list(cfg["tags"]), tags_col=cfg.get("tags_col", "tags")).apply(df)


def _t_metric_to_log(df, cfg):
    """Metric → structured log serialization (metric_to_log.rs)."""
    from vector_spark.operators.metric_to_log import MetricToLog

    return MetricToLog(
        host_tag=cfg.get("host_tag", "host"),
        timestamp_col=cfg.get("timestamp_col", "ts"),
    ).apply(df)


def _t_csv_parser(df, cfg):
    """VRL parse_csv over `field` with a declared `schema`; columns are
    flattened to the root (or nested under `target_field`)."""
    from vector_spark.functions.parse import parse_csv

    field = cfg.get("field", "message")
    parsed = parse_csv(F.col(field), cfg["schema"], sep=cfg.get("separator", ","))
    if "target_field" in cfg:
        out = df.withColumn(cfg["target_field"], parsed)
    else:
        out = df.withColumn("__csv", parsed).select("*", "__csv.*").drop("__csv")
    return out.drop(field) if cfg.get("drop_field", False) else out


def _t_geoip(df, cfg):
    """geoip broadcast range join; the CIDR table comes from a parquet
    `path` (e.g. functions/mmdb.py output) or inline `rows`/`schema`."""
    from vector_spark.enrich import geoip_enrich

    spark = df.sparkSession
    tbl = cfg["table"]
    if "path" in tbl:
        cidr = spark.read.parquet(tbl["path"])
    else:
        cidr = spark.createDataFrame(tbl["rows"], tbl["schema"])
    return geoip_enrich(
        df, cfg.get("source", "ip"), cidr, target_prefix=cfg.get("target", "geoip") + "_"
    )


def _t_statsd_parser(df, cfg):
    """statsd/dogstatsd datagram codec over `field` (source codec
    surfaced as a transform for TOML topologies)."""
    from vector_spark.functions.metrics_codec import parse_statsd

    p = parse_statsd(F.col(cfg.get("field", "message")))
    out = df
    for k in cfg.get("outputs", ["name", "mtype", "kind", "value", "sample_rate", "tags_s", "error"]):
        out = out.withColumn(k, p[k])
    return out


def _t_prometheus_parser(df, cfg):
    """Prometheus exposition-line codec over `field`."""
    from vector_spark.functions.metrics_codec import parse_prometheus

    p = parse_prometheus(F.col(cfg.get("field", "message")))
    out = df
    for k in cfg.get("outputs", ["name", "labels_s", "value", "timestamp_ms", "error"]):
        out = out.withColumn(k, p[k])
    return out


def _t_aws_ec2_metadata(df, cfg):
    """Inline `metadata` map plays the IMDS fetch in configs (the real
    fetcher is injectable on the Ec2Metadata class)."""
    from vector_spark.enrich import Ec2Metadata

    return Ec2Metadata(
        fetcher=lambda: dict(cfg["metadata"]),
        fields=cfg.get("fields"),
        prefix=cfg.get("prefix", ""),
    ).apply(df)


TRANSFORMS = {
    "passthrough": _t_passthrough,
    "lua": _t_lua,
    "filter_not_any": _t_filter_not_any,
    "aws_ec2_metadata": _t_aws_ec2_metadata,
    "filter": _t_filter,
    "field_filter": _t_field_filter,
    "sample": _t_sample,
    "dedupe": _t_dedupe,
    "add_fields": _t_add_fields,
    "remove_fields": _t_remove_fields,
    "rename_fields": _t_rename_fields,
    "coercer": _t_coercer,
    "json_parser": _t_json_parser,
    "regex_parser": _t_regex_parser,
    "grok_parser": _t_grok_parser,
    "ansi_stripper": _t_ansi_stripper,
    "aggregate": _t_aggregate,
    "remap": _t_remap,
    "concat": _t_concat,
    "key_value_parser": _t_key_value_parser,
    "logfmt_parser": _t_logfmt_parser,
    "split": _t_split,
    "tokenizer": _t_tokenizer,
    "merge": _t_merge,
    "reduce": _t_reduce,
    "log_to_metric": _t_log_to_metric,
    "tag_cardinality_limit": _t_tag_cardinality_limit,
    "enrich": _t_enrich,
    "add_tags": _t_add_tags,
    "remove_tags": _t_remove_tags,
    "metric_to_log": _t_metric_to_log,
    "csv_parser": _t_csv_parser,
    "geoip": _t_geoip,
    "statsd_parser": _t_statsd_parser,
    "prometheus_parser": _t_prometheus_parser,
}


# ---------------------------------------------------------------- compiler


@dataclass
class CompiledTopology:
    """Sink name → DataFrame, ready to run. Mirrors Config{sources,
    transforms, sinks} (compiler.rs:80-93) post-expansion."""

    sinks: dict[str, DataFrame]
    sink_configs: dict[str, dict]
    outputs: dict[str, DataFrame] = field(default_factory=dict)
    persisted: list[DataFrame] = field(default_factory=list)

    def run(self, top=None) -> dict[str, object]:
        """Execute every sink; returns per-sink results (row count for
        writes, collected rows for `memory`). Fan-out caches are
        released when the run completes (no leaked blocks across
        repeated runs in one session). `top` (plans/top.py TopMonitor)
        records per-sink cumulative row counts — batch writes count via
        an Observation riding the same job (no second scan), streaming
        sinks via query progress — and snapshots after every sink, so a
        run yields a monotone internal-metrics series (`vector top`)."""
        from pyspark.sql import Observation

        results = {}
        for name, df in self.sinks.items():
            cfg = self.sink_configs[name]
            kind = cfg["type"]
            if df.isStreaming:
                results[name] = self._run_streaming_sink(name, df, cfg, top=top)
                if top is not None:
                    top.snapshot()
                continue
            obs = None
            if top is not None and kind in ("parquet", "noop", "blackhole"):
                obs = Observation(f"__top_{name}")
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            if kind == "parquet":
                writer = df.write.mode(cfg.get("mode", "overwrite"))
                if cfg.get("partition_by"):
                    writer = writer.partitionBy(*cfg["partition_by"])
                writer.parquet(cfg["path"])
                results[name] = "written"
            elif kind == "memory":
                results[name] = df.collect()
            elif kind in ("noop", "blackhole"):
                df.write.format("noop").mode("overwrite").save()
                results[name] = "consumed"
            elif kind == "console":
                df.show(int(cfg.get("limit", 20)))
                results[name] = "shown"
            elif kind == "kafka":
                from vector_spark.streaming.kafka import kafka_sink

                results[name] = kafka_sink(df, cfg)
            else:
                raise ConfigError(f"unknown sink type {kind!r}")
            if top is not None:
                if obs is not None:
                    top.record(name, obs.get["rows"])
                elif kind == "memory":
                    top.record(name, len(results[name]))
                top.snapshot()
        for df in self.persisted:
            df.unpersist()
        return results

    def _run_streaming_sink(self, name: str, df: DataFrame, cfg: dict, top=None):
        """A sink fed by a streaming source runs as an availableNow
        micro-batch query: `parquet` sinks go through the TableSink
        foreachBatch bridge (idempotent partition-replacing batches,
        streaming/sink.py) with `checkpoint` giving exactly-once batch
        ids; `memory` sinks collect via an in-memory result table.
        Blocking (awaitTermination) — the topology run returns when the
        backlog is drained, Vector's drain-on-shutdown analogue."""
        kind = cfg["type"]
        if kind == "parquet":
            from vector_spark.sinks.writer import ParquetSink
            from vector_spark.streaming.sink import stream_to_table

            # Default is append for ALL streaming parquet sinks: the
            # streaming checkpoint's batch ids already give exactly-once
            # on replay, and the reference's sinks are at-least-once
            # append that never discard prior events. stream_mode =
            # "overwrite_partitions" is an explicit opt-in for the
            # partition-complete-batch pattern ONLY — with a recurring
            # partition key (e.g. 'source') each micro-batch's dynamic
            # partition overwrite DELETES rows earlier batches wrote to
            # the same partition (availableNow splits the backlog on
            # maxFilesPerTrigger, so this silently drops data).
            mode = cfg.get("stream_mode", "append")
            if mode == "overwrite_partitions" and not cfg.get("partition_by"):
                raise ConfigError(
                    f"sink {name!r}: stream_mode='overwrite_partitions' "
                    "requires partition_by (it replaces whole partitions "
                    "per batch and would clobber the table)"
                )
            q = stream_to_table(
                df,
                ParquetSink(),
                cfg["path"],
                partition_by=cfg.get("partition_by"),
                checkpoint=cfg.get("checkpoint"),
                mode=mode,
                query_name=name,
                output_mode=cfg.get("output_mode", "append"),
            )
            q.awaitTermination()
            if top is not None:
                top.record(
                    name, sum(int(p["numInputRows"]) for p in q.recentProgress)
                )
            return "written"
        if kind == "memory":
            q = (
                df.writeStream.format("memory")
                .outputMode(cfg.get("output_mode", "append"))
                .queryName(f"__cfg_{name}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            if top is not None:
                top.record(
                    name, sum(int(p["numInputRows"]) for p in q.recentProgress)
                )
            return df.sparkSession.table(f"__cfg_{name}").collect()
        if kind == "kafka":
            from vector_spark.streaming.kafka import kafka_sink

            return kafka_sink(df, cfg)
        raise ConfigError(f"sink type {kind!r} does not support streaming inputs")


def expand_macros(transforms: dict) -> dict:
    """Macro expansion (compiler.rs:105-151): `route` → one filter per
    lane + `name._unmatched`; `compound` → serial step chain ending at
    the compound's own name."""
    expanded: dict[str, dict] = {}
    for name, cfg in transforms.items():
        kind = cfg.get("type")
        if kind in ("route", "swimlanes"):  # swimlanes = pre-0.17 alias
            for lane, cond in cfg["route"].items():
                expanded[f"{name}.{lane}"] = {
                    "type": "filter",
                    "inputs": cfg.get("inputs", []),
                    "condition": cond,
                }
            conds = list(cfg["route"].values())
            if all(isinstance(c, str) for c in conds):
                lane_conds = " OR ".join(f"({c})" for c in conds)
                expanded[f"{name}._unmatched"] = {
                    "type": "filter",
                    "inputs": cfg.get("inputs", []),
                    "condition": f"NOT coalesce({lane_conds}, false)",
                }
            else:  # typed conditions (e.g. datadog_search lanes)
                expanded[f"{name}._unmatched"] = {
                    "type": "filter_not_any",
                    "inputs": cfg.get("inputs", []),
                    "conditions": conds,
                }
        elif kind == "compound":
            prev_inputs = cfg.get("inputs", [])
            steps = cfg["steps"]
            for i, step in enumerate(steps):
                step_name = f"{name}.{step['id']}" if "id" in step else f"{name}.{i}"
                expanded[step_name] = {
                    **{k: v for k, v in step.items() if k != "id"},
                    "inputs": prev_inputs,
                }
                prev_inputs = [step_name]
            # the compound's own name aliases the chain tail (compound.rs:58)
            expanded[name] = {"type": "passthrough", "inputs": prev_inputs}
        else:
            expanded[name] = cfg
    return expanded


def interpolate_env(text: str, env: dict[str, str] | None = None) -> str:
    """Env-var interpolation, mirroring src/config/vars.rs: `$VAR`,
    `${VAR}` and `${VAR:-default}`; unknown vars → empty string (the
    reference warns and substitutes "")."""
    import os
    import re as _re

    env = env if env is not None else dict(os.environ)
    rx = _re.compile(r"\$\$|\$(\w+)|\$\{(\w+)(?::-([^}]*))?\}")

    def sub(m: _re.Match) -> str:
        if m.group(0) == "$$":
            return "$"
        name = m.group(1) or m.group(2)
        default = m.group(3) or ""
        return env.get(name, default)

    return rx.sub(sub, text)


def _expand_input_globs(inputs: list[str], names: list[str]) -> list[str]:
    """Glob expansion of `inputs` entries against component names
    (src/config/compiler.rs:154-178): 'parse_*' matches every component
    whose name fits; non-glob entries pass through verbatim (unknown
    names surface as compile errors downstream, as in the reference)."""
    import fnmatch

    out: list[str] = []
    for pat in inputs:
        if any(ch in pat for ch in "*?["):
            matches = [n for n in names if fnmatch.fnmatchcase(n, pat)]
            if not matches:
                raise ConfigError(f"input glob {pat!r} matched no components")
            out.extend(matches)
        else:
            out.append(pat)
    return out


def compile_config(
    spark: SparkSession, config: dict | str, env: dict[str, str] | None = None,
    strict_vrl: bool = False,
) -> CompiledTopology:
    """strict_vrl: compile remap VRL programs with the reference's
    compile-time fallibility/type diagnostics (error[E###]) — the
    `vector validate` behavior; execution keeps the lenient runtime
    error channel."""
    if isinstance(config, str):
        import tomllib

        config = tomllib.loads(interpolate_env(config, env))

    sources = config.get("sources", {})
    transforms = config.get("transforms", {})
    if strict_vrl:
        for cfg in transforms.values():
            if isinstance(cfg, dict):
                cfg["_strict_vrl"] = True
    sinks = config.get("sinks", {})

    # 1. name validation
    seen: set[str] = set()
    for name in [*sources, *transforms, *sinks]:
        if name in seen:
            raise ConfigError(f"duplicate component name {name!r}")
        seen.add(name)

    # 2. macro expansion: route → one virtual output per lane;
    #    compound → serial chain of steps
    expanded = expand_macros(transforms)
    expanded = attach_enrichment(expanded, config.get("enrichment_tables"))
    if strict_vrl:  # macro expansion copies cfgs — re-mark the results
        for cfg in expanded.values():
            if isinstance(cfg, dict):
                cfg["_strict_vrl"] = True

    # input glob expansion against post-macro component names
    all_names = [*sources, *expanded]
    expanded = {
        name: {**cfg, "inputs": _expand_input_globs(cfg.get("inputs", []), all_names)}
        for name, cfg in expanded.items()
    }
    sinks = {
        name: {**cfg, "inputs": _expand_input_globs(cfg.get("inputs", []), all_names)}
        for name, cfg in sinks.items()
    }

    # 3+4. resolve the DAG with cycle/unknown-input checks (DFS)
    built: dict[str, DataFrame] = {}
    building: set[str] = set()

    def resolve(name: str) -> DataFrame:
        if name in built:
            return built[name]
        if name in building:
            raise ConfigError(f"cycle through {name!r}")
        if name in sources:
            cfg = sources[name]
            try:
                builder = SOURCES[cfg["type"]]
            except KeyError:
                raise ConfigError(f"unknown source type {cfg.get('type')!r}") from None
            df = builder(spark, cfg)
        elif name in expanded:
            cfg = expanded[name]
            inputs = cfg.get("inputs", [])
            if not inputs:
                raise ConfigError(f"transform {name!r} has no inputs")
            building.add(name)
            try:
                upstream = [resolve(i) for i in inputs]
            finally:
                building.discard(name)
            df = upstream[0]
            for other in upstream[1:]:  # fan-in = union (graph.rs)
                df = df.unionByName(other, allowMissingColumns=True)
            try:
                builder = TRANSFORMS[cfg["type"]]
            except KeyError:
                raise ConfigError(f"unknown transform type {cfg.get('type')!r}") from None
            df = builder(df, cfg)
        else:
            raise ConfigError(f"unknown input {name!r}")
        built[name] = df
        return df

    # fan-out accounting: persist any output consumed by 2+ components
    consumers: dict[str, int] = {}
    for cfg in [*expanded.values(), *sinks.values()]:
        for i in cfg.get("inputs", []):
            consumers[i] = consumers.get(i, 0) + 1

    sink_dfs: dict[str, DataFrame] = {}
    persisted: list[DataFrame] = []
    for name, cfg in sinks.items():
        inputs = cfg.get("inputs", [])
        if not inputs:
            raise ConfigError(f"sink {name!r} has no inputs")
        ups = []
        for i in inputs:
            df = resolve(i)
            # streaming frames can't persist — each sink's query re-reads
            # from its own checkpointed offsets instead (the micro-batch
            # analogue of Fanout's clone-on-send)
            if consumers.get(i, 0) > 1 and i not in sources and not df.isStreaming:
                df = df.persist()
                built[i] = df
                persisted.append(df)
            ups.append(df)
        df = ups[0]
        for other in ups[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        sink_dfs[name] = df

    return CompiledTopology(
        sinks=sink_dfs, sink_configs=dict(sinks), outputs=built, persisted=persisted
    )


# ------------------------------------------------------------- reload/diff


@dataclass
class Difference:
    """One section of a config diff (src/config/diff.rs Difference):
    names to remove, to change, to add — relative to the old config."""

    to_remove: set[str] = field(default_factory=set)
    to_change: set[str] = field(default_factory=set)
    to_add: set[str] = field(default_factory=set)

    @staticmethod
    def between(old: dict, new: dict) -> "Difference":
        return Difference(
            to_remove={n for n in old if n not in new},
            to_change={n for n in new if n in old and new[n] != old[n]},
            to_add={n for n in new if n not in old},
        )

    def any_changes(self) -> bool:
        return bool(self.to_remove or self.to_change or self.to_add)


@dataclass
class ConfigDiff:
    """src/config/diff.rs ConfigDiff{sources, transforms, sinks}.
    Transforms are compared POST macro expansion, so editing one step
    of a compound (or one lane of a route) marks only that expanded
    component changed — the same granularity the reference's topology
    reload rebuilds at (src/topology/running.rs)."""

    sources: Difference
    transforms: Difference
    sinks: Difference

    def as_dict(self) -> dict:
        return {
            sec: {
                "to_remove": sorted(d.to_remove),
                "to_change": sorted(d.to_change),
                "to_add": sorted(d.to_add),
            }
            for sec, d in (
                ("sources", self.sources),
                ("transforms", self.transforms),
                ("sinks", self.sinks),
            )
        }


def _parse(config, env=None) -> dict:
    if isinstance(config, str):
        import tomllib

        return tomllib.loads(interpolate_env(config, env))
    return config


def diff_config(old, new, env: dict[str, str] | None = None) -> ConfigDiff:
    """Compare two configs component-by-component (diff.rs)."""
    o, n = _parse(old, env), _parse(new, env)
    return ConfigDiff(
        sources=Difference.between(o.get("sources", {}), n.get("sources", {})),
        transforms=Difference.between(
            expand_macros(o.get("transforms", {})), expand_macros(n.get("transforms", {}))
        ),
        sinks=Difference.between(o.get("sinks", {}), n.get("sinks", {})),
    )


# streaming-stateful transform types: their compiled form carries
# operator state inside the sink's checkpoint (watermarked aggregation /
# dedupe state store, applyInPandasWithState), which Spark will refuse
# to restore under a changed plan.
_STATEFUL_TYPES = {"aggregate", "dedupe", "reduce"}


def recompile(
    spark: SparkSession,
    old_config,
    new_config,
    env: dict[str, str] | None = None,
    purge_removed: bool = False,
) -> tuple["CompiledTopology", ConfigDiff]:
    """Config reload (src/topology/running.rs:1-751 + diff.rs): compile
    `new_config` so that a following run continues where the old one
    stopped for every component the diff left untouched, and tears down
    what was removed.

    What "reuse" means in the availableNow world: a sink's streaming
    checkpoint holds its source offsets (+ any stateful-operator state).
    - sink untouched, upstream chain untouched → checkpoint kept: the
      next run processes only data that arrived since the old run (the
      reference keeps the task running; this is the batch equivalent).
    - upstream chain changed but every changed piece is STATELESS
      (filter/remap/parsers/...) → checkpoint kept: offsets are
      preserved and the new logic applies from the next file on — the
      reference's live-swap semantic (in-flight state is per-component
      and stateless components have none).
    - upstream chain changed and the chain contains a stateful
      streaming transform (aggregate/dedupe/reduce) → the checkpoint is
      ROTATED to a deterministic sibling dir (`<ck>-gen<digest>` of the
      new chain's canonical config), because Spark fuses offsets and
      operator state in one checkpoint and refuses incompatible state
      restores. Divergence from the reference (which keeps offsets and
      drops only the component's in-memory state) — documented; the
      digest makes re-runs of the SAME new config resume normally.
    - removed sinks simply don't compile; `purge_removed=True` also
      deletes their checkpoint dirs (the reference drops the task's
      resources on removal).
    """
    import hashlib
    import json as _json

    o, n = _parse(old_config, env), _parse(new_config, env)
    diff = diff_config(o, n, env)

    n = {**n}  # shallow-copy: we may rewrite sink checkpoint paths
    sinks = {name: dict(cfg) for name, cfg in n.get("sinks", {}).items()}
    expanded = expand_macros(n.get("transforms", {}))
    sources = n.get("sources", {})

    def upstream_closure(cfg) -> set[str]:
        seen: set[str] = set()
        stack = list(cfg.get("inputs", []))
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            if u in expanded:
                stack.extend(expanded[u].get("inputs", []))
        return seen

    changed = diff.transforms.to_change | diff.transforms.to_add
    changed_sources = diff.sources.to_change | diff.sources.to_add
    for name, cfg in sinks.items():
        ck = cfg.get("checkpoint")
        if not ck:
            continue
        chain = upstream_closure(cfg)
        dirty = (
            name in diff.sinks.to_change
            or bool(chain & changed)
            or bool(chain & changed_sources)
        )
        stateful = any(
            expanded[u].get("type") in _STATEFUL_TYPES for u in chain if u in expanded
        )
        if dirty and stateful:
            material = [cfg] + [
                expanded[u] for u in sorted(chain) if u in expanded
            ] + [sources[u] for u in sorted(chain) if u in sources]
            digest = hashlib.md5(
                _json.dumps(material, sort_keys=True, default=str).encode()
            ).hexdigest()[:8]
            cfg["checkpoint"] = f"{ck}-gen{digest}"
    n["sinks"] = sinks

    if purge_removed:
        import shutil

        old_sinks = _parse(old_config, env).get("sinks", {})
        for name in diff.sinks.to_remove:
            ck = old_sinks.get(name, {}).get("checkpoint")
            if ck:
                shutil.rmtree(ck, ignore_errors=True)

    return compile_config(spark, n, env), diff


def topology_dot(config) -> str:
    """`vector graph` analogue (src/graph.rs:82-118): render the
    component topology as Graphviz DOT — sources as trapeziums,
    transforms as diamonds, sinks as inverted trapeziums, exactly the
    reference's shapes. Renders the config as written (pre macro
    expansion), like the reference renders loaded components."""
    if isinstance(config, str):
        import tomllib

        config = tomllib.loads(interpolate_env(config))
    out = ["digraph {"]
    for sid in config.get("sources", {}):
        out.append(f'  "{sid}" [shape=trapezium]')
    for tid, t in config.get("transforms", {}).items():
        out.append(f'  "{tid}" [shape=diamond]')
        for i in t.get("inputs", []):
            out.append(f'  "{i}" -> "{tid}"')
    for sid, sk in config.get("sinks", {}).items():
        out.append(f'  "{sid}" [shape=invtrapezium]')
        for i in sk.get("inputs", []):
            out.append(f'  "{i}" -> "{sid}"')
    out.append("}")
    return "\n".join(out) + "\n"
