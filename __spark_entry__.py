"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline slice on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2) plus the
                training-data ops, each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (same column names,
                same values; floats rounded on both sides).

Implementation notes:
- portable hash: conv(substr(md5(x),1,15),16,10) == DuckDB
  ('0x'||substr(md5(x),1,15))::BIGINT — used for dedupe/minhash/simhash
  so Spark and the oracle agree bit-for-bit.
- timestamps are exported as unix micros (unix_micros / epoch_us) to
  dodge timezone/precision formatting drift.
- all float outputs are rounded to fixed decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _md5_long(col):
    """Portable 60-bit hash from md5 hex (matches the DuckDB oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_MD5_LONG_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


# =====================================================================
# entry — flagship slice
# =====================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse (json props) → route (errors lane) → aggregate,
    on the driver's sf0.001 events table."""
    ev = _t(spark, "/root/testdata/sf0.001", "events")
    parsed = ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    errors = parsed.filter((F.col("event_type") == "error") | (F.col("value") >= 95.0))
    return errors.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum("k").alias("sum_k"),
    )


# =====================================================================
# queries + oracles (kept adjacent per operator for reviewability)
# =====================================================================

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}
_SCALE_CLASS: dict[str, str] = {}

# scale_class vocabulary (machine-readable; surfaced via scale_class()
# and pinned by tests/test_plan_hygiene.py):
#   linear    — shuffle/compute volume grows ~linearly with the input;
#               the measured decade profiles (SCALE_PROFILE_r4*.md) are
#               the evidence
#   baseline  — quadratic-by-design verification twin of a linear path;
#               exists to oracle the banded/bucketed form, never the
#               100 TB route. Each tagged query names its linear twin
#               in _BASELINE_TWIN.
_BASELINE_TWIN: dict[str, str] = {
    "ngram_jaccard": "lsh_candidates",  # MinHash-LSH banding
    "shingle_suite": "lsh_candidates",  # contains the same pair join
    "embedding_neardup": "embedding_neardup_lsh (band_planes=0 auto form)",
    "embedding_neardup_lsh": "lsh_near_pairs auto form (registry pins p for the oracle)",
    "semantic_dedup": "semantic_dedup n_cells=0 auto form (registry pins 16 cells)",
    "ann_topk": "ivf_topk",  # brute-force cosine top-k recall oracle
}


def _q(name: str, oracle: str | None = None, scale_class: str = "linear"):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        _SCALE_CLASS[name] = scale_class
        return fn

    return deco


# ---- transform #2 filter (src/transforms/filter.rs:65-71) -----------


@_q(
    "filter",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events WHERE event_type = 'error' AND value > 10.0
    """,
)
def q_filter(spark, sf):
    from vector_spark.operators.filter import Filter

    ev = _t(spark, sf, "events")
    out = Filter((F.col("event_type") == "error") & (F.col("value") > 10.0)).apply(ev)
    return out.select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))


# ---- transform #3 route (src/transforms/route.rs:101-120) ------------
# parallel independent lanes; each lane is its own query so the oracle
# checks the exact routed-row set per lane (multi-match semantics).

_LANES_SQL = {
    "errors": "event_type = 'error' OR value >= 95.0",
    "bigvalue": "value >= 50.0",
    "clicky": "event_type IN ('click', 'view')",
}


def _route_lanes():
    return {
        "errors": (F.col("event_type") == "error") | (F.col("value") >= 95.0),
        "bigvalue": F.col("value") >= 50.0,
        "clicky": F.col("event_type").isin("click", "view"),
    }


def _mk_route(lane: str):
    @_q(
        f"route_{lane}",
        f"SELECT event_id, event_type, round(value,2) AS value FROM events WHERE {_LANES_SQL[lane]}",
    )
    def q(spark, sf, lane=lane):
        from vector_spark.operators.route import Route

        ev = _t(spark, sf, "events")
        lanes = Route(_route_lanes()).apply(ev)
        return lanes[lane].select("event_id", "event_type", F.round("value", 2).alias("value"))

    return q


for _lane in _LANES_SQL:
    _mk_route(_lane)

_ORACLES["route_unmatched"] = (
    "SELECT event_id, event_type FROM events WHERE NOT ("
    + " OR ".join(f"({c})" for c in _LANES_SQL.values())
    + ")"
)


@_q("route_unmatched")
def q_route_unmatched(spark, sf):
    from vector_spark.operators.route import Route

    ev = _t(spark, sf, "events")
    lanes = Route(_route_lanes(), with_unmatched=True).apply(ev)
    return lanes["_unmatched"].select("event_id", "event_type")


# ---- transform #4 sample (src/transforms/sample.rs:107-138) ----------
# keyed deterministic sampling; modulo variant is the SQL-portable form
# (xxhash64 keyed variant exercised in pytest).


@_q(
    "sample_keyed",
    """
    SELECT event_id, user_id, 10 AS sample_rate
    FROM events WHERE user_id % 10 = 0
    """,
)
def q_sample(spark, sf):
    from vector_spark.operators.sample import Sample

    ev = _t(spark, sf, "events")
    out = Sample(rate=10, key_field="user_id", modulo=True).apply(ev)
    return out.select("event_id", "user_id", "sample_rate")


# ---- #4b sample with exclude bypass (sample.rs:107-138) --------------


@_q(
    "sample_exclude",
    """
    SELECT event_id, user_id, event_type, 10 AS sample_rate
    FROM events WHERE user_id % 10 = 0 OR event_type = 'error'
    """,
)
def q_sample_exclude(spark, sf):
    from vector_spark.operators.sample import Sample

    ev = _t(spark, sf, "events")
    out = Sample(
        rate=10, key_field="user_id", modulo=True, exclude=F.col("event_type") == "error"
    ).apply(ev)
    return out.select("event_id", "user_id", "event_type", "sample_rate")


# ---- transform #22 concat (concat.rs:15-136) -------------------------


@_q(
    "concat_op",
    """
    SELECT event_id,
           substr(event_type, 1, 3) || '~' || CAST(user_id AS VARCHAR)
             || '~' || substr(props, 2, 4) AS combined
    FROM events
    """,
)
def q_concat_op(spark, sf):
    from vector_spark.operators.fields import Concat

    ev = _t(spark, sf, "events")
    out = Concat(
        "combined",
        [("event_type", 0, 3), ("user_id", None, None), ("props", 1, 5)],
        joiner="~",
    ).apply(ev)
    return out.select("event_id", "combined")


# ---- transform #31 field_filter (field_filter.rs:9-16) ---------------


@_q(
    "field_filter",
    "SELECT event_id, event_type FROM events WHERE event_type = 'purchase'",
)
def q_field_filter(spark, sf):
    from vector_spark.functions.conditions import equals

    ev = _t(spark, sf, "events")
    return ev.filter(equals(F.col("event_type"), "purchase")).select("event_id", "event_type")


# ---- transform #5 dedupe (src/transforms/dedupe.rs:155-163) ----------


@_q(
    "dedupe",
    """
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def q_dedupe(spark, sf):
    from vector_spark.operators.dedupe import Dedupe

    ev = _t(spark, sf, "events")
    out = Dedupe(match=["user_id", "event_type"], order_by="ts", tiebreak="event_id").apply(ev)
    return out.select("user_id", "event_type", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))


# ---- transform #6 reduce (merge_strategy.rs:9-21) --------------------


@_q(
    "reduce_merge",
    """
    SELECT user_id,
           round(sum(value), 2) AS sum_value,
           round(max(value), 2) AS max_value,
           round(min(value), 2) AS min_value,
           min_by(event_type, event_id) AS first_type,
           max_by(event_type, event_id) AS last_type,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q_reduce(spark, sf):
    ev = _t(spark, sf, "events")
    # strategies: Sum, Max, Min, Discard(first), Retain(last) over
    # arrival order (event_id is the arrival sequence in this corpus)
    return ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.min_by("event_type", "event_id").alias("first_type"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---- transform #7 aggregate (aggregate.rs:72-107): tumbling window ---


@_q(
    "aggregate_window",
    """
    SELECT date_trunc('hour', ts) AS window_start_ts, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_aggregate_window(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))


# ---- transform #8 log_to_metric (log_to_metric.rs:206+) --------------


@_q(
    "log_to_metric",
    """
    SELECT event_type AS name, count(*) AS counter_value,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS set_cardinality
    FROM events GROUP BY event_type
    """,
)
def q_log_to_metric(spark, sf):
    ev = _t(spark, sf, "events")
    # counter(+1) / counter(increment_by_value) / set per event_type,
    # pre-aggregated (the fused log_to_metric → aggregate stage)
    return ev.groupBy(F.col("event_type").alias("name")).agg(
        F.count(F.lit(1)).alias("counter_value"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("set_cardinality"),
    )


# ---- transform #11 json_parser (json_parser.rs:73-120) ---------------


@_q(
    "json_parser",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def q_json_parser(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select("event_id", F.get_json_object("props", "$.k").cast("int").alias("k"))


# ---- transform #10 regex_parser (regex_parser.rs:109-139) ------------


@_q(
    "regex_parser",
    r"""
    SELECT event_id,
           CASE WHEN regexp_extract(props, '"k": (\d+)', 1) = ''
                THEN NULL
                ELSE CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)
           END AS k
    FROM events
    """,
)
def q_regex_parser(spark, sf):
    from vector_spark.operators.remap import RegexParser

    ev = _t(spark, sf, "events")
    out = RegexParser([(r'"k": (\d+)', {"k": 1})], field="props", types={"k": "int"}).apply(ev)
    return out.select("event_id", "k")


# ---- transform #9 grok_parser (grok_parser.rs:107-148) ---------------
# round-trip: render a log line from columns, grok it back, compare the
# recovered typed fields.


@_q(
    "grok_parser",
    r"""
    WITH lines AS (
      SELECT event_id,
             event_type || ' uid=' || user_id || ' v=' || round(value,2) AS line
      FROM events)
    SELECT event_id,
           regexp_extract(line, '^(\w+) uid=([+-]?[0-9]+) v=([+-]?[0-9]+(?:\.[0-9]+)?)$', 1) AS etype,
           CAST(regexp_extract(line, '^(\w+) uid=([+-]?[0-9]+) v=([+-]?[0-9]+(?:\.[0-9]+)?)$', 2) AS BIGINT) AS uid,
           round(CAST(regexp_extract(line, '^(\w+) uid=([+-]?[0-9]+) v=([+-]?[0-9]+(?:\.[0-9]+)?)$', 3) AS DOUBLE), 2) AS val
    FROM lines
    """,
)
def q_grok_parser(spark, sf):
    from vector_spark.functions.grok import grok_extract

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.col("event_type"), F.lit(" uid="), F.col("user_id"), F.lit(" v="), F.round("value", 2)
    )
    caps = grok_extract(line, "^%{WORD:etype} uid=%{INT:uid:int} v=%{NUMBER:val:float}$")
    return ev.select(
        "event_id",
        caps["etype"].alias("etype"),
        caps["uid"].alias("uid"),
        F.round(caps["val"], 2).alias("val"),
    )


# ---- transforms #12/#13 logfmt / key_value parser --------------------


@_q(
    "kv_parser",
    r"""
    WITH lines AS (
      SELECT event_id, 'type=' || event_type || ' uid=' || user_id AS line FROM events)
    SELECT event_id,
           regexp_extract(line, 'type=(\S+)', 1) AS type,
           CAST(regexp_extract(line, 'uid=(\S+)', 1) AS BIGINT) AS uid
    FROM lines
    """,
)
def q_kv_parser(spark, sf):
    from vector_spark.functions.parse import parse_key_value

    ev = _t(spark, sf, "events")
    line = F.concat(F.lit("type="), F.col("event_type"), F.lit(" uid="), F.col("user_id"))
    m = parse_key_value(line)
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type"),
        F.element_at(m, "uid").cast("long").alias("uid"),
    )


# ---- transforms #14/#15 tokenizer / split ----------------------------


@_q(
    "tokenizer",
    """
    SELECT doc_id, string_split(text, ' ')[1] AS first_tok,
           len(string_split(text, ' ')) AS n_toks
    FROM documents
    """,
)
def q_tokenizer(spark, sf):
    from vector_spark.functions.parse import parse_tokens

    docs = _t(spark, sf, "documents")
    toks = parse_tokens(F.col("text"))
    return docs.select(
        "doc_id", F.get(toks, 0).alias("first_tok"), F.size(toks).alias("n_toks")
    )


# ---- transform #17 coercer (coercer.rs:58) ---------------------------


@_q(
    "coercer",
    """
    SELECT event_id, CAST(floor(value) AS BIGINT) AS value_int,
           CAST(user_id AS VARCHAR) AS user_str, epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q_coercer(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.floor("value").cast("long").alias("value_int"),
        F.col("user_id").cast("string").alias("user_str"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


# ---- transforms #18/#19/#20 add/remove/rename + #22 concat -----------


@_q(
    "field_shaping",
    """
    SELECT event_id AS id, upper(event_type) AS tag,
           'vector-' || event_type || '-' || user_id AS routing_key,
           substr(event_type, 1, 3) || '/' || CAST(user_id AS VARCHAR) AS shard
    FROM events
    """,
)
def q_field_shaping(spark, sf):
    from vector_spark.operators.fields import AddFields, RemoveFields, RenameFields

    ev = _t(spark, sf, "events")
    out = AddFields(
        {"tag": "{{event_type}}", "routing_key": "vector-{{event_type}}-{{user_id}}"}
    ).apply(ev)
    out = out.withColumn("tag", F.upper("tag"))
    out = out.withColumn(
        "shard", F.concat_ws("/", F.substring("event_type", 1, 3), F.col("user_id").cast("string"))
    )
    out = RenameFields({"event_id": "id"}).apply(out)
    return RemoveFields(["ts", "value", "props", "user_id", "event_type"]).apply(out)


# ---- transform #23 ansi_stripper (ansi_stripper.rs:56) ---------------


@_q(
    "ansi_stripper",
    r"""
    WITH colored AS (
      SELECT doc_id, chr(27) || '[31m' || lang || chr(27) || '[0m' AS line
      FROM documents)
    SELECT doc_id,
           regexp_replace(line, '\x1b\[[0-9;]*[A-Za-z]|[\x00-\x09\x0b-\x1f\x7f]', '', 'g') AS clean
    FROM colored
    """,
)
def q_ansi_stripper(spark, sf):
    from vector_spark.functions.strings import strip_ansi_escape_codes

    docs = _t(spark, sf, "documents")
    line = F.concat(F.lit("\x1b[31m"), F.col("lang"), F.lit("\x1b[0m"))
    return docs.select("doc_id", strip_ansi_escape_codes(line).alias("clean"))


# ---- §2.6 enrichment tables → broadcast hash join --------------------


@_q(
    "enrich_broadcast",
    """
    SELECT r.r_name AS region, count(*) AS n_customers,
           round(avg(c.c_acctbal), 2) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_enrich_broadcast(spark, sf):
    from vector_spark.enrich import EnrichmentTable

    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    region = _t(spark, sf, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    et_nation = EnrichmentTable(nation, keys=["c_nationkey"])
    et_region = EnrichmentTable(region, keys=["n_regionkey"])
    enriched = et_region.enrich(et_nation.enrich(cust, how="inner"), how="inner")
    return enriched.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
    )


# ---- enrichment BetweenDates → broadcast range join ------------------


@_q(
    "enrich_range",
    """
    WITH brackets(bracket, lo, hi) AS (
      VALUES ('small', 0.0, 10.0), ('mid', 10.0, 25.0), ('big', 25.0, 51.0))
    SELECT b.bracket AS bracket, count(*) AS n,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN brackets b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bracket
    """,
)
def q_enrich_range(spark, sf):
    # repartition: the theta-join's stream side is a single-row-group
    # file; without this the whole broadcast-nested-loop runs one task
    li = _t(spark, sf, "lineitem").repartition("l_orderkey")
    brackets = spark.createDataFrame(
        [("small", 0.0, 10.0), ("mid", 10.0, 25.0), ("big", 25.0, 51.0)],
        "bracket string, lo double, hi double",
    )
    joined = li.join(
        F.broadcast(brackets),
        on=(li.l_quantity >= brackets.lo) & (li.l_quantity < brackets.hi),
        how="inner",
    )
    return joined.groupBy("bracket").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )


# ---- transform #28 tag_cardinality_limit (first-seen, limit 3) -------


@_q(
    "tag_cardinality_limit",
    """
    WITH first_seen AS (
      SELECT event_type, min(ts) AS fts FROM events GROUP BY event_type),
    accepted AS (
      SELECT event_type FROM (
        SELECT event_type, row_number() OVER (ORDER BY fts, event_type) AS rk
        FROM first_seen) WHERE rk <= 3)
    SELECT e.event_id, e.event_type FROM events e
    JOIN accepted a ON e.event_type = a.event_type
    """,
)
def q_tag_cardinality(spark, sf):
    from vector_spark.operators.tag_cardinality_limit import TagCardinalityLimit

    ev = _t(spark, sf, "events")
    out = TagCardinalityLimit("event_type", value_limit=3, action="drop_event").apply(ev)
    return out.select("event_id", "event_type")


# ---- transform #27 metric_to_log — canonical JSON serialization
# (fixed field order, sorted tags, unix-micro ts, %.4f doubles) so the
# oracle reproduces the message byte-for-byte --------------------------


@_q(
    "metric_to_log",
    """
    SELECT '{"name":"event_value","namespace":"vector","tags":{"host":"h1","type":"'
             || event_type || '"},"ts":' || CAST(epoch_us(ts) AS VARCHAR)
             || ',"kind":"incremental","value_type":"counter","value":'
             || printf('%.4f', value) || '}' AS message,
           'h1' AS host,
           epoch_us(ts) AS ts_us,
           'metric_to_log' AS source_type
    FROM events WHERE value IS NOT NULL
    """,
)
def q_metric_to_log(spark, sf):
    from vector_spark.operators.log_to_metric import LogToMetric, MetricSpec
    from vector_spark.operators.metric_to_log import MetricToLog

    ev = _t(spark, sf, "events")
    metrics = LogToMetric(
        [MetricSpec(type="counter", field="value", name="event_value", increment_by_value=True,
                    tags={"type": "{{event_type}}", "host": "h1"})]
    ).apply(ev)
    return MetricToLog().apply(metrics)


# =====================================================================
# Training-data pipeline ops (documents / embeddings)
# =====================================================================


# ---- exact dedup: hash-groupBy --------------------------------------


@_q(
    "dedup_exact",
    f"""
    SELECT {_MD5_LONG_SQL.format(x="text")} AS text_hash,
           min(doc_id) AS keeper, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.groupBy(_md5_long(F.col("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )


# ---- document fingerprint --------------------------------------------


@_q(
    "fingerprint",
    """
    SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark, sf):
    docs = _t(spark, sf, "documents")
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(normalized).alias("fp"))


# ---- token counting ---------------------------------------------------


@_q(
    "token_count",
    """
    SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_ish
    FROM documents
    """,
)
def q_token_count(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0))
        ).alias("n_bpe_ish"),
    )


# ---- text quality scoring ---------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_SW_SQL = "('" + "','".join(_STOPWORDS) + "')"


@_q(
    "quality_score",
    f"""
    WITH toks AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           len(ws) AS n_words,
           round(n_chars / len(ws), 4) AS avg_word_len,
           round(len(list_filter(ws, x -> x IN {_SW_SQL})) / len(ws), 4) AS stopword_ratio
    FROM toks
    """,
)
def q_quality_score(spark, sf):
    docs = _t(spark, sf, "documents")
    ws = F.split("text", " ")
    n_words = F.size(ws)
    sw = F.size(F.filter(ws, lambda x: x.isin(*_STOPWORDS)))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.col("n_chars") / n_words, 4).alias("avg_word_len"),
        F.round(sw / n_words, 4).alias("stopword_ratio"),
    )


# ---- language ID (stopword-hit heuristic) ------------------------------


@_q(
    "langid",
    f"""
    SELECT doc_id,
           CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL})) >= 1
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def q_langid(spark, sf):
    docs = _t(spark, sf, "documents")
    hits = F.size(F.filter(F.split("text", " "), lambda x: x.isin(*_STOPWORDS)))
    return docs.select(
        "doc_id", F.when(hits >= 1, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred")
    )


# ---- embedding near-dup (cosine) ---------------------------------------


@_q(
    "embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    """,
    scale_class="baseline",
)
def q_embedding_neardup(spark, sf):
    from vector_spark.training.baselines import all_pairs_neardup  # TEST-ONLY oracle baseline

    emb = _t(spark, sf, "embeddings")
    pairs = all_pairs_neardup(emb, threshold=0.35)
    return pairs.select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))


# ---- ANN: brute-force cosine top-k -------------------------------------


@_q(
    "ann_topk",
    """
    WITH queries AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    cands AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM queries q CROSS JOIN cands c)
    SELECT qid, cid, round(cos, 4) AS cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      FROM scored) WHERE rk <= 3
    """,
    scale_class="baseline",
)
def q_ann_topk(spark, sf):
    from vector_spark.training.baselines import brute_force_topk  # TEST-ONLY oracle baseline

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter("vec_id < 5").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    cands = emb.filter("vec_id >= 5").select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    out = brute_force_topk(queries, cands, k=3)
    return out.select("qid", "cid", F.round("cos_raw", 4).alias("cos"))


# ---- n-gram Jaccard near-dup -------------------------------------------


@_q(
    "ngram_jaccard",
    """
    WITH shingled AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 1, 1)),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2]))) AS shingle
      FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM shingled a JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i / (sa.n + sb.n - i), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.n + sb.n - i) >= 0.5
    """,
    scale_class="baseline",
)
def q_ngram_jaccard(spark, sf):
    from vector_spark.training.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.5)


# ---- MinHash signatures (portable affine permutations) -----------------
# One md5 base hash per shingle, k affine permutations over it
# (h_i = (a_i * (base % P) + b_i) % P, P = 2^31-1): one digest instead
# of k — the salted-md5 form spent ~75% of its time in the extra
# digests (training/dedup.py minhash_signatures). Exact int64
# arithmetic, replayed verbatim by DuckDB (no overflow wrap anywhere).

_MINHASH_PERMS = ((1_664_525, 1_013_904_223), (22_695_477, 1), (69_069, 12_345), (1_103_515_245, 12_345))
_MINHASH_BASE_SQL = "(" + _MD5_LONG_SQL.format(x="shingle") + " % 2147483647)"
_MINHASH_H_SQL = ", ".join(
    f"min(({a} * {_MINHASH_BASE_SQL} + {b}) % 2147483647) AS h{i}"
    for i, (a, b) in enumerate(_MINHASH_PERMS)
)


@_q(
    "minhash_signature",
    "WITH shingled AS (\n"
    "  SELECT doc_id, unnest(list_distinct(list_transform(\n"
    "           range(1, greatest(len(string_split(text,' ')) - 1, 1)),\n"
    "           i -> string_split(text,' ')[i] || ' ' ||\n"
    "                string_split(text,' ')[i+1] || ' ' ||\n"
    "                string_split(text,' ')[i+2]))) AS shingle\n"
    "  FROM documents)\n"
    "SELECT doc_id, " + _MINHASH_H_SQL + " FROM shingled GROUP BY doc_id",
)
def q_minhash_signature(spark, sf):
    from vector_spark.training.dedup import minhash_signatures

    docs = _t(spark, sf, "documents")
    return minhash_signatures(docs, n=3)


# ---- SimHash (48-bit, portable; 16-bit saturates at ~10^5 docs) ---------


@_q(
    "simhash",
    "WITH toks AS (\n"
    "  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok\n"
    "  FROM documents),\n"
    "hashed AS (SELECT doc_id, "
    + _MD5_LONG_SQL.format(x="tok")
    + " AS h FROM toks)\n"
    "SELECT doc_id, "
    + " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(48)
    )
    + " AS simhash FROM hashed GROUP BY doc_id",
)
def q_simhash(spark, sf):
    from vector_spark.training.dedup import simhash

    docs = _t(spark, sf, "documents")
    return simhash(docs, bits=48)


# ---- transform #12 logfmt_parser (logfmt_parser.rs:15-66) ------------


@_q(
    "logfmt_parser",
    r"""
    WITH lines AS (
      SELECT event_id,
             'level=' || lower(event_type) || ' latency_ms=' || user_id || ' msg="okdone"' AS line
      FROM events)
    SELECT event_id,
           regexp_extract(line, 'level=(\S+)', 1) AS level,
           CAST(regexp_extract(line, 'latency_ms=(\S+)', 1) AS BIGINT) AS latency_ms,
           'okdone' AS msg
    FROM lines
    """,
)
def q_logfmt_parser(spark, sf):
    from vector_spark.functions.parse import parse_logfmt

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("level="), F.lower("event_type"),
        F.lit(" latency_ms="), F.col("user_id"),
        F.lit(' msg="okdone"'),
    )
    m = parse_logfmt(line)
    return ev.select(
        "event_id",
        F.element_at(m, "level").alias("level"),
        F.element_at(m, "latency_ms").cast("long").alias("latency_ms"),
        F.element_at(m, "msg").alias("msg"),
    )


# ---- transform #15 split (split.rs:16-102) ---------------------------


@_q(
    "split_parser",
    """
    SELECT doc_id,
           string_split(text, ' ')[1] AS f0,
           string_split(text, ' ')[2] AS f1,
           string_split(text, ' ')[3] AS f2
    FROM documents
    """,
)
def q_split_parser(spark, sf):
    docs = _t(spark, sf, "documents")
    parts = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.get(parts, 0).alias("f0"),
        F.get(parts, 1).alias("f1"),
        F.get(parts, 2).alias("f2"),
    )


# ---- transform #16 csv parser (parse_csv.rs:8) -----------------------


@_q(
    "csv_parser",
    """
    WITH lines AS (
      SELECT event_id, event_type || ',' || user_id || ',' || round(value,2) AS line
      FROM events)
    SELECT event_id,
           string_split(line, ',')[1] AS etype,
           CAST(string_split(line, ',')[2] AS BIGINT) AS uid,
           round(CAST(string_split(line, ',')[3] AS DOUBLE), 2) AS val
    FROM lines
    """,
)
def q_csv_parser(spark, sf):
    from vector_spark.functions.parse import parse_csv

    ev = _t(spark, sf, "events")
    line = F.concat_ws(",", F.col("event_type"), F.col("user_id"), F.round("value", 2))
    parsed = parse_csv(line, "etype string, uid bigint, val double")
    return ev.select(
        "event_id",
        parsed["etype"].alias("etype"),
        parsed["uid"].alias("uid"),
        F.round(parsed["val"], 2).alias("val"),
    )


# ---- transform #25-adjacent: IP functions & CIDR conditions ----------
# (geoip's lookup side is enrich_broadcast/enrich_range; the IP math —
# VRL ip_aton/ip_ntoa/ip_cidr_contains, check_fields ip_cidr_contains —
# is pure integer-mask expressions, no UDF)


@_q(
    "ip_functions",
    """
    WITH ips AS (
      SELECT event_id,
             '10.' || (user_id % 256) || '.' || (event_id % 256) || '.7' AS ip,
             user_id % 256 AS o2, event_id % 256 AS o3
      FROM events)
    SELECT event_id, ip,
           10 * 16777216 + o2 * 65536 + o3 * 256 + 7 AS ip_int,
           ip AS roundtrip,
           (o2 >= 128) AS in_cidr
    FROM ips
    """,
)
def q_ip_functions(spark, sf):
    from vector_spark.functions.ip import ip_aton, ip_cidr_contains, ip_ntoa

    ev = _t(spark, sf, "events")
    ip = F.concat(
        F.lit("10."), F.pmod("user_id", F.lit(256)), F.lit("."), F.pmod("event_id", F.lit(256)), F.lit(".7")
    )
    with_ip = ev.select("event_id", ip.alias("ip"))
    return with_ip.select(
        "event_id",
        "ip",
        ip_aton(F.col("ip")).alias("ip_int"),
        ip_ntoa(ip_aton(F.col("ip"))).alias("roundtrip"),
        ip_cidr_contains(F.col("ip"), "10.128.0.0/9").alias("in_cidr"),
    )


# ---- §2.4 VRL string/crypto function pack ----------------------------


@_q(
    "vrl_strings",
    r"""
    SELECT doc_id,
           substr(text, 1, 20) AS truncated,
           substr(text, 6, 10) AS sliced,
           md5(upper(text)) AS digest,
           sha256(text) AS digest2,
           regexp_replace(text, '[0-9]+', '[REDACTED]', 'g') AS redacted
    FROM documents
    """,
)
def q_vrl_strings(spark, sf):
    from vector_spark.functions.strings import redact, sha2_, slice_, truncate, upcase

    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        truncate(F.col("text"), 20).alias("truncated"),
        slice_(F.col("text"), 5, 15).alias("sliced"),
        F.md5(upcase(F.col("text"))).alias("digest"),
        sha2_(F.col("text"), 256).alias("digest2"),
        redact(F.col("text"), [r"[0-9]+"]).alias("redacted"),
    )


# ---- §2.4 parse_url / parse_query_string -----------------------------


@_q(
    "url_parser",
    """
    WITH urls AS (
      SELECT event_id,
             'https://h' || (user_id % 5) || '.example.com:8443/api/v1/' || event_type
               || '?q=' || user_id || '&x=1#frag' AS url,
             user_id, event_type
      FROM events)
    SELECT event_id,
           'https' AS scheme,
           'h' || (user_id % 5) || '.example.com' AS host,
           8443 AS port,
           '/api/v1/' || event_type AS path,
           'q=' || user_id || '&x=1' AS query,
           'frag' AS fragment,
           CAST(user_id AS VARCHAR) AS q_param
    FROM urls
    """,
)
def q_url_parser(spark, sf):
    from vector_spark.functions.parse import parse_query_string, parse_url

    ev = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://h"), F.pmod("user_id", F.lit(5)), F.lit(".example.com:8443/api/v1/"),
        F.col("event_type"), F.lit("?q="), F.col("user_id"), F.lit("&x=1#frag"),
    )
    u = parse_url(url)
    qs = parse_query_string(u["query"])
    return ev.select(
        "event_id",
        u["scheme"].alias("scheme"),
        u["host"].alias("host"),
        u["port"].alias("port"),
        u["path"].alias("path"),
        u["query"].alias("query"),
        u["fragment"].alias("fragment"),
        F.element_at(qs, "q").alias("q_param"),
    )


# ---- transform #24 merge (partial-event reassembly, merge.rs:18-148) -


@_q(
    "merge_partials",
    """
    WITH marked AS (
      SELECT 'h' || (user_id % 20) AS stream, event_id, event_type,
             (event_id % 3 != 0) AS _partial
      FROM events),
    segged AS (
      SELECT *, sum(CASE WHEN NOT _partial THEN 1 ELSE 0 END)
                  OVER (PARTITION BY stream ORDER BY event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS seg
      FROM marked)
    SELECT stream, string_agg(event_type, '' ORDER BY event_id) AS event_type,
           max(event_id) AS event_id, count(*) AS n_parts
    FROM segged WHERE seg > 0
    GROUP BY stream, seg
    HAVING max(CASE WHEN NOT _partial THEN 1 ELSE 0 END) = 1
    """,
)
def q_merge_partials(spark, sf):
    from vector_spark.operators.merge import MergePartials

    ev = _t(spark, sf, "events")
    marked = ev.select(
        F.concat(F.lit("h"), F.pmod("user_id", F.lit(20))).alias("stream"),
        "event_id",
        "event_type",
        (F.pmod("event_id", F.lit(3)) != 0).alias("_partial"),
    )
    merged = MergePartials(
        merge_fields=["event_type"], stream_discriminant=["stream"], order_by="event_id"
    ).apply(marked)
    return merged.select("stream", "event_type", "event_id", "n_parts")


# ---- transform #21 add_tags / remove_tags (metric tag maps) ----------


@_q(
    "tags_shaping",
    """
    SELECT event_id, 'prod' AS env, 'eu' AS region, CAST(NULL AS VARCHAR) AS type
    FROM events
    """,
)
def q_tags_shaping(spark, sf):
    from vector_spark.operators.fields import AddTags, RemoveTags

    ev = _t(spark, sf, "events")
    tagged = ev.withColumn(
        "tags",
        F.create_map(F.lit("type"), F.col("event_type"), F.lit("region"), F.lit("us")),
    )
    tagged = AddTags({"env": "prod", "region": "eu"}, overwrite=True).apply(tagged)
    tagged = RemoveTags(["type"]).apply(tagged)
    return tagged.select(
        "event_id",
        F.element_at("tags", F.lit("env")).alias("env"),
        F.element_at("tags", F.lit("region")).alias("region"),
        F.element_at("tags", F.lit("type")).alias("type"),
    )


# ---- reduce merge strategies: Array / Concat / FlatUnique ------------


@_q(
    "reduce_collect",
    """
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY event_id) AS types_concat,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_uniq,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def q_reduce_collect(spark, sf):
    ev = _t(spark, sf, "events")
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("event_id").alias("o"), F.col("event_type").alias("v")))
    )
    vals = F.transform(ordered, lambda p: p["v"])
    return ev.groupBy("user_id").agg(
        F.array_join(vals, " ").alias("types_concat"),
        F.array_join(F.array_sort(F.array_distinct(vals)), ",").alias("types_uniq"),
        F.count(F.lit(1)).alias("n"),
    )


# ---- MinHash LSH banding: candidate pairs ----------------------------

_SIGS_CTE = (
    "WITH shingled AS (\n"
    "  SELECT doc_id, unnest(list_distinct(list_transform(\n"
    "           range(1, greatest(len(string_split(text,' ')) - 1, 1)),\n"
    "           i -> string_split(text,' ')[i] || ' ' ||\n"
    "                string_split(text,' ')[i+1] || ' ' ||\n"
    "                string_split(text,' ')[i+2]))) AS shingle\n"
    "  FROM documents),\n"
    "sigs AS (SELECT doc_id, "
    + _MINHASH_H_SQL
    + " FROM shingled GROUP BY doc_id)"
)


@_q(
    "lsh_candidates",
    _SIGS_CTE
    + """
    SELECT DISTINCT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a
      JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id FROM sigs a
      JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)
    """,
)
def q_lsh_candidates(spark, sf):
    from vector_spark.training.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf, "documents")
    sigs = minhash_signatures(docs, n=3)
    return lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])


# ---- SimHash Hamming near-dup pairs ----------------------------------

_SIMHASH_CTE = (
    "WITH toks AS (\n"
    "  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok\n"
    "  FROM documents),\n"
    "hashed AS (SELECT doc_id, "
    + _MD5_LONG_SQL.format(x="tok")
    + " AS h FROM toks),\n"
    "sims AS (SELECT doc_id, "
    + " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(48)
    )
    + " AS simhash FROM hashed GROUP BY doc_id)"
)


@_q(
    "hamming_neardup",
    _SIMHASH_CTE
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 3
    """,
)
def q_hamming_neardup(spark, sf):
    # 48-bit fingerprints + n_seg=6 combination banding (20 combos on
    # 24-bit keys): the n_seg=d+1 default on 16 bits went quadratic at
    # 500k docs (fingerprint space saturated; 202 s at sf1.0 → ~3 s).
    from vector_spark.training.dedup import hamming_near_pairs, simhash

    docs = _t(spark, sf, "documents")
    return hamming_near_pairs(
        simhash(docs, bits=48), max_dist=3, bits=48, n_seg=6, id_col="doc_id"
    )


# ---- §2.4 parse_apache_log (vendor format, grok-expanded) ------------


@_q(
    "apache_log_parser",
    """
    WITH lines AS (
      SELECT event_id,
             '10.0.' || (user_id % 256) || '.9 - user' || user_id
               || ' [' || strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] "GET /api/v1/'
               || event_type || ' HTTP/1.1" ' || (200 + (user_id % 5) * 100)
               || ' ' || (event_id % 10000) AS line,
             user_id, event_type, event_id AS eid, ts
      FROM events)
    SELECT event_id,
           '10.0.' || (user_id % 256) || '.9' AS client,
           'user' || user_id AS username,
           epoch_us(date_trunc('second', ts)) AS ts_us,
           'GET' AS method,
           '/api/v1/' || event_type AS path,
           200 + (user_id % 5) * 100 AS status,
           eid % 10000 AS size
    FROM lines
    """,
)
def q_apache_log_parser(spark, sf):
    from vector_spark.functions.parse import parse_apache_log

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("10.0."), F.pmod("user_id", F.lit(256)), F.lit(".9 - user"), F.col("user_id"),
        F.lit(" ["), F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(' +0000] "GET /api/v1/'),
        F.col("event_type"), F.lit(' HTTP/1.1" '),
        (F.lit(200) + F.pmod("user_id", F.lit(5)) * 100),
        F.lit(" "), F.pmod("event_id", F.lit(10000)),
    )
    p = parse_apache_log(line)
    return ev.select(
        "event_id",
        p["host"].alias("client"),
        p["user"].alias("username"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["method"].alias("method"),
        p["path"].alias("path"),
        p["status"].alias("status"),
        p["size"].alias("size"),
    )


# ---- §2.4 parse_syslog (RFC 5424) ------------------------------------


@_q(
    "syslog_parser",
    """
    WITH lines AS (
      SELECT event_id,
             '<165>1 2026-08-17T10:00:00Z h' || (user_id % 97) || ' ' || event_type
               || ' ' || user_id || ' ID47 - done job' AS line,
             user_id, event_type
      FROM events)
    SELECT event_id,
           165 AS priority,
           'h' || (user_id % 97) AS hostname,
           event_type AS appname,
           CAST(user_id AS VARCHAR) AS procid,
           'done job' AS body
    FROM lines
    """,
)
def q_syslog_parser(spark, sf):
    from vector_spark.functions.parse import parse_syslog

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("<165>1 2026-08-17T10:00:00Z h"), F.pmod("user_id", F.lit(97)), F.lit(" "),
        F.col("event_type"), F.lit(" "), F.col("user_id"), F.lit(" ID47 - done job"),
    )
    p = parse_syslog(line)
    return ev.select(
        "event_id",
        p["priority"].cast("int").alias("priority"),
        p["hostname"].alias("hostname"),
        p["appname"].alias("appname"),
        p["procid"].alias("procid"),
        p["message"].alias("body"),
    )


# ---- log_to_metric histogram/summary shapes: exact percentiles -------


@_q(
    "metric_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def q_metric_quantiles(spark, sf):
    ev = _t(spark, sf, "events")
    # exact interpolated percentiles (matches quantile_cont); the
    # at-scale variant is percentile_approx (t-digest sketch) with a
    # documented error bound — same plan shape, mergeable partials
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


# ---- IVF ANN (exact when nprobe == n_cells → brute-force oracle) -----


@_q(
    "ivf_topk",
    """
    WITH queries AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    cands AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM queries q CROSS JOIN cands c)
    SELECT qid, cid, round(cos, 4) AS cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      FROM scored) WHERE rk <= 3
    """,
)
def q_ivf_topk(spark, sf):
    from vector_spark.training.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter("vec_id < 5").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    cands = emb.filter("vec_id >= 5").select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    # nprobe == n_cells probes every cell → exact, same result as brute
    # force; pytest covers the approximate (nprobe < n_cells) recall
    out = ivf_topk(queries, cands, k=3, n_cells=8, nprobe=8)
    return out.select("qid", "cid", F.round("cos_raw", 4).alias("cos"))


# ---- aws_cloudwatch_logs_subscription_parser (multi-event emission) --


@_q(
    "cloudwatch_parser",
    """
    SELECT e.event_id, 'lg-' || (e.user_id % 10) AS log_group,
           e.event_id * 2 + j.j AS le_id,
           'm' || j.j || '-' || e.event_id AS le_message
    FROM events e CROSS JOIN (VALUES (0), (1)) AS j(j)
    """,
)
def q_cloudwatch_parser(spark, sf):
    from vector_spark.functions.parse import parse_cloudwatch_subscription

    ev = _t(spark, sf, "events")
    envelope = F.format_string(
        '{"messageType":"DATA_MESSAGE","owner":"123","logGroup":"lg-%d","logStream":"ls",'
        '"subscriptionFilters":["f1"],"logEvents":['
        '{"id":%d,"timestamp":1700000000,"message":"m0-%d"},'
        '{"id":%d,"timestamp":1700000001,"message":"m1-%d"}]}',
        F.pmod("user_id", F.lit(10)),
        F.col("event_id") * 2, F.col("event_id"),
        F.col("event_id") * 2 + 1, F.col("event_id"),
    )
    parsed = parse_cloudwatch_subscription(envelope)
    le = F.explode(parsed["logEvents"]).alias("le")
    return ev.select("event_id", parsed["logGroup"].alias("log_group"), le).select(
        "event_id", "log_group", F.col("le.id").alias("le_id"), F.col("le.message").alias("le_message")
    )


# ---- VRL encode group: base64 round-trip -----------------------------


@_q(
    "base64_codec",
    """
    SELECT doc_id, base64(encode(text)) AS b64,
           (decode(from_base64(base64(encode(text)))) = text) AS roundtrip_ok
    FROM documents
    """,
)
def q_base64_codec(spark, sf):
    from vector_spark.functions.strings import decode_base64, encode_base64

    docs = _t(spark, sf, "documents")
    b64 = encode_base64(F.col("text"))
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        (decode_base64(b64) == F.col("text")).alias("roundtrip_ok"),
    )


# ---- §2.4 parse_glog / parse_nginx_log / parse_aws_vpc_flow_log ------


@_q(
    "glog_parser",
    r"""
    WITH lines AS (
      SELECT event_id,
             'I0817 10:00:01.' || lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0')
               || '  ' || user_id || ' worker.cc:' || (event_id % 500) || '] handled '
               || event_type AS line,
             user_id, event_type, event_id AS eid
      FROM events)
    SELECT event_id, 'info' AS level, 8 AS month, 17 AS day,
           user_id AS pid, 'worker.cc' AS file, eid % 500 AS line_no,
           'handled ' || event_type AS body
    FROM lines
    """,
)
def q_glog_parser(spark, sf):
    from vector_spark.functions.parse import parse_glog

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("I0817 10:00:01."),
        F.lpad(F.pmod("event_id", F.lit(1000000)).cast("string"), 6, "0"),
        F.lit("  "), F.col("user_id"), F.lit(" worker.cc:"),
        F.pmod("event_id", F.lit(500)), F.lit("] handled "), F.col("event_type"),
    )
    p = parse_glog(line)
    return ev.select(
        "event_id",
        p["level"].alias("level"),
        p["month"].alias("month"),
        p["day"].alias("day"),
        p["pid"].alias("pid"),
        p["file"].alias("file"),
        p["line"].alias("line_no"),
        p["message"].alias("body"),
    )


@_q(
    "nginx_error_parser",
    """
    WITH lines AS (
      SELECT event_id,
             '2026/08/17 10:00:00 [error] ' || user_id || '#0: *' || event_id
               || ' upstream timed out for ' || event_type AS line,
             user_id, event_type, event_id AS eid
      FROM events)
    SELECT event_id, epoch_us(TIMESTAMP '2026-08-17 10:00:00') AS ts_us,
           'error' AS severity, user_id AS pid, 0 AS tid, eid AS cid,
           'upstream timed out for ' || event_type AS body
    FROM lines
    """,
)
def q_nginx_error_parser(spark, sf):
    from vector_spark.functions.parse import parse_nginx_error_log

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("2026/08/17 10:00:00 [error] "), F.col("user_id"), F.lit("#0: *"),
        F.col("event_id"), F.lit(" upstream timed out for "), F.col("event_type"),
    )
    p = parse_nginx_error_log(line)
    return ev.select(
        "event_id",
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["severity"].alias("severity"),
        p["pid"].alias("pid"),
        p["tid"].alias("tid"),
        p["cid"].alias("cid"),
        p["message"].alias("body"),
    )


@_q(
    "vpc_flow_parser",
    """
    WITH lines AS (
      SELECT event_id,
             '2 12345 eni-' || user_id || ' 10.0.0.1 10.0.0.2 ' || (event_id % 65536)
               || ' 443 6 10 840 1600000000 1600000060 ACCEPT OK' AS line,
             user_id, event_id AS eid
      FROM events)
    SELECT event_id, 2 AS version, 'eni-' || user_id AS interface_id,
           '10.0.0.1' AS srcaddr, eid % 65536 AS srcport, 443 AS dstport,
           6 AS protocol, 840 AS n_bytes, 'ACCEPT' AS action
    FROM lines
    """,
)
def q_vpc_flow_parser(spark, sf):
    from vector_spark.functions.parse import parse_aws_vpc_flow_log

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("2 12345 eni-"), F.col("user_id"), F.lit(" 10.0.0.1 10.0.0.2 "),
        F.pmod("event_id", F.lit(65536)), F.lit(" 443 6 10 840 1600000000 1600000060 ACCEPT OK"),
    )
    p = parse_aws_vpc_flow_log(line)
    return ev.select(
        "event_id",
        p["version"].alias("version"),
        p["interface_id"].alias("interface_id"),
        p["srcaddr"].alias("srcaddr"),
        p["srcport"].alias("srcport"),
        p["dstport"].alias("dstport"),
        p["protocol"].alias("protocol"),
        p["bytes"].alias("n_bytes"),
        p["action"].alias("action"),
    )


# ---- AggregatedHistogram bucket-wise merge (metric.rs:680+) ----------


@_q(
    "histogram_merge",
    """
    SELECT event_type,
           sum(CASE WHEN least(CAST(floor(value / 20) AS INT), 4) = 0 THEN 1 ELSE 0 END) AS b0,
           sum(CASE WHEN least(CAST(floor(value / 20) AS INT), 4) = 1 THEN 1 ELSE 0 END) AS b1,
           sum(CASE WHEN least(CAST(floor(value / 20) AS INT), 4) = 2 THEN 1 ELSE 0 END) AS b2,
           sum(CASE WHEN least(CAST(floor(value / 20) AS INT), 4) = 3 THEN 1 ELSE 0 END) AS b3,
           sum(CASE WHEN least(CAST(floor(value / 20) AS INT), 4) = 4 THEN 1 ELSE 0 END) AS b4,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def q_histogram_merge(spark, sf):
    ev = _t(spark, sf, "events")
    # each event becomes a one-hot AggregatedHistogram {buckets, count,
    # sum}; the merge is bucket-wise array addition via zip_with folding
    # — exactly MetricData::add for histograms
    idx = F.least(F.floor(F.col("value") / 20).cast("int"), F.lit(4))
    one_hot = F.array(*[F.when(idx == i, 1).otherwise(0).cast("long") for i in range(5)])
    merged = ev.withColumn("h", one_hot).groupBy("event_type").agg(
        F.aggregate(
            F.collect_list("h"),
            F.array(*[F.lit(0).cast("long") for _ in range(5)]),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("buckets"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    return merged.select(
        "event_type",
        *[F.get("buckets", i).alias(f"b{i}") for i in range(5)],
        "n",
        "total",
    )


# =====================================================================
# Relational sanity (classic OLAP shapes through the same engine)
# =====================================================================


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM gaps)
    SELECT user_id, sess_id, count(*) AS n_events
    FROM sess GROUP BY user_id, sess_id
    """,
)
def q_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_id").agg(F.count(F.lit(1)).alias("n_events"))


# =====================================================================
# VRL parser tail (round 2): klog, linux auth, ALB, user agent,
# percent codec, ruby hash, xml
# =====================================================================


@_q(
    "klog_parser",
    """
    WITH syn AS (
      SELECT event_id, user_id, event_type,
             user_id % 4 AS lv, event_id % 60 AS sec, event_id % 1000000 AS us
      FROM events)
    SELECT event_id,
           CASE lv WHEN 0 THEN 'info' WHEN 1 THEN 'warning'
                   WHEN 2 THEN 'error' ELSE 'fatal' END AS level,
           epoch_us(TIMESTAMP '2026-08-17 10:00:00') + sec * 1000000 + us AS ts_us,
           user_id AS klog_id,
           event_type || '.go' AS file,
           event_id % 500 AS line_no,
           'done ' || event_type AS body
    FROM syn
    """,
)
def q_klog_parser(spark, sf):
    from vector_spark.functions.parse import parse_klog

    ev = _t(spark, sf, "events")
    m = F.pmod("user_id", F.lit(4))
    lvl = F.when(m == 0, "I").when(m == 1, "W").when(m == 2, "E").otherwise("F")
    sec = F.lpad(F.pmod("event_id", F.lit(60)).cast("string"), 2, "0")
    us = F.lpad(F.pmod("event_id", F.lit(1000000)).cast("string"), 6, "0")
    line = F.concat(
        lvl, F.lit("0817 10:00:"), sec, F.lit("."), us, F.lit("   "),
        F.col("user_id"), F.lit(" "), F.col("event_type"), F.lit(".go:"),
        F.pmod("event_id", F.lit(500)), F.lit("] done "), F.col("event_type"),
    )
    p = parse_klog(line, year=2026)
    return ev.select(
        "event_id",
        p["level"].alias("level"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["id"].alias("klog_id"),
        p["file"].alias("file"),
        p["line"].alias("line_no"),
        p["message"].alias("body"),
    )


@_q(
    "linux_auth_parser",
    """
    SELECT event_id,
           epoch_us(TIMESTAMP '2026-03-23 01:49:58') AS ts_us,
           'h' || (user_id % 50) AS hostname,
           'sshd' AS appname,
           user_id AS procid,
           'Accepted publickey for u' || user_id || ' from 10.1.1.1 port 8888 ssh2' AS body
    FROM events
    """,
)
def q_linux_auth_parser(spark, sf):
    from vector_spark.functions.parse import parse_linux_authorization

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("Mar 23 01:49:58 h"), F.pmod("user_id", F.lit(50)),
        F.lit(" sshd["), F.col("user_id"), F.lit("]: Accepted publickey for u"),
        F.col("user_id"), F.lit(" from 10.1.1.1 port 8888 ssh2"),
    )
    p = parse_linux_authorization(line, year=2026)
    return ev.select(
        "event_id",
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["hostname"].alias("hostname"),
        p["appname"].alias("appname"),
        p["procid"].alias("procid"),
        p["message"].alias("body"),
    )


@_q(
    "alb_log_parser",
    """
    SELECT event_id,
           'http' AS req_type,
           epoch_us(TIMESTAMP '2026-08-17 10:00:00') AS ts_us,
           'my-elb' AS elb,
           '10.0.' || (user_id % 256) || '.1:543' AS client_host,
           CAST(200 + (user_id % 5) * 100 AS VARCHAR) AS elb_status_code,
           event_id % 4096 AS received_bytes,
           512 AS sent_bytes,
           'GET' AS method,
           'https://ex.com/' || event_type AS url,
           'HTTP/1.1' AS protocol,
           'curl/7.68.0' AS user_agent,
           'Root=' || event_id AS trace_id
    FROM events
    """,
)
def q_alb_log_parser(spark, sf):
    from vector_spark.functions.parse import parse_aws_alb_log

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit("http 2026-08-17T10:00:00.000000Z my-elb 10.0."),
        F.pmod("user_id", F.lit(256)), F.lit(".1:543 10.0.1.1:80 0.001 0.005 0.0 "),
        (F.lit(200) + F.pmod("user_id", F.lit(5)) * 100), F.lit(" 200 "),
        F.pmod("event_id", F.lit(4096)), F.lit(' 512 "GET https://ex.com/'),
        F.col("event_type"), F.lit(' HTTP/1.1" "curl/7.68.0" - - arn:tg "Root='),
        F.col("event_id"), F.lit('"'),
    )
    p = parse_aws_alb_log(line)
    return ev.select(
        "event_id",
        p["type"].alias("req_type"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["elb"].alias("elb"),
        p["client_host"].alias("client_host"),
        p["elb_status_code"].alias("elb_status_code"),
        p["received_bytes"].alias("received_bytes"),
        p["sent_bytes"].alias("sent_bytes"),
        p["request_method"].alias("method"),
        p["request_url"].alias("url"),
        p["request_protocol"].alias("protocol"),
        p["user_agent"].alias("user_agent"),
        p["trace_id"].alias("trace_id"),
    )


_UA_FIXTURES = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "curl/7.68.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 4_2_1 like Mac OS X) AppleWebKit/605 Version/14.0 Mobile/15E Safari/604.1",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",
]


@_q(
    "user_agent_parser",
    """
    WITH m AS (SELECT event_id, user_id % 4 AS v FROM events)
    SELECT event_id,
           CASE v WHEN 0 THEN 'Chrome' WHEN 1 THEN 'curl'
                  WHEN 2 THEN 'Safari' ELSE 'Firefox' END AS browser_family,
           CASE v WHEN 0 THEN '120.0.0.0' WHEN 1 THEN '7.68.0'
                  WHEN 2 THEN '14.0' ELSE '115.0' END AS browser_version,
           CASE v WHEN 0 THEN 'pc' WHEN 1 THEN NULL
                  WHEN 2 THEN 'smartphone' ELSE 'pc' END AS device_category,
           CASE v WHEN 0 THEN 'Windows' WHEN 1 THEN NULL
                  WHEN 2 THEN 'iOS' ELSE 'Linux' END AS os_family,
           CASE v WHEN 0 THEN '10.0' WHEN 1 THEN NULL
                  WHEN 2 THEN '4_2_1' ELSE NULL END AS os_version
    FROM m
    """,
)
def q_user_agent_parser(spark, sf):
    from vector_spark.functions.parse import parse_user_agent

    ev = _t(spark, sf, "events")
    m = F.pmod("user_id", F.lit(4))
    ua = (
        F.when(m == 0, _UA_FIXTURES[0])
        .when(m == 1, _UA_FIXTURES[1])
        .when(m == 2, _UA_FIXTURES[2])
        .otherwise(_UA_FIXTURES[3])
    )
    p = parse_user_agent(ua)
    return ev.select(
        "event_id",
        p["browser_family"].alias("browser_family"),
        p["browser_version"].alias("browser_version"),
        p["device_category"].alias("device_category"),
        p["os_family"].alias("os_family"),
        p["os_version"].alias("os_version"),
    )


@_q(
    "percent_codec",
    """
    WITH raw AS (
      SELECT event_id,
             event_type || ' q?' || user_id || '&x=1' AS s,
             event_id % 100000 AS n
      FROM events)
    SELECT event_id,
           replace(replace(replace(replace(s, '&', '%26'), '=', '%3D'),
                   ' ', '%20'), '?', '%3F') AS enc,
           true AS roundtrip_ok,
           lower(to_hex(n)) AS hex_id
    FROM raw
    """,
)
def q_percent_codec(spark, sf):
    from vector_spark.functions.strings import decode_percent, encode_percent, format_int

    ev = _t(spark, sf, "events")
    raw = F.concat(F.col("event_type"), F.lit(" q?"), F.col("user_id"), F.lit("&x=1"))
    enc = encode_percent(raw)
    return ev.select(
        "event_id",
        enc.alias("enc"),
        (decode_percent(enc) == raw).alias("roundtrip_ok"),
        format_int(F.pmod("event_id", F.lit(100000)), 16).alias("hex_id"),
    )


@_q(
    "ruby_hash_parser",
    """
    SELECT event_id, 'v' || user_id AS k, event_id AS n, NULL AS x
    FROM events
    """,
)
def q_ruby_hash_parser(spark, sf):
    from vector_spark.functions.parse import parse_ruby_hash

    ev = _t(spark, sf, "events")
    line = F.concat(
        F.lit('{ "k" => "v'), F.col("user_id"), F.lit('", "n" => '),
        F.col("event_id"), F.lit(', "x" => nil }'),
    )
    h = parse_ruby_hash(line, "k string, n long, x string")
    return ev.select("event_id", h["k"].alias("k"), h["n"].alias("n"), h["x"].alias("x"))


@_q(
    "xml_parser",
    """
    SELECT event_id,
           event_type AS level,
           'done ' || user_id AS msg,
           event_id % 97 AS code
    FROM events
    """,
)
def q_xml_parser(spark, sf):
    from vector_spark.functions.parse import parse_xml

    ev = _t(spark, sf, "events")
    xml = F.concat(
        F.lit('<log level="'), F.col("event_type"), F.lit('"><msg>done '),
        F.col("user_id"), F.lit("</msg><code>"), F.pmod("event_id", F.lit(97)),
        F.lit("</code></log>"),
    )
    x = parse_xml(xml, "_level string, msg string, code long")
    return ev.select(
        "event_id", x["_level"].alias("level"), x["msg"].alias("msg"), x["code"].alias("code")
    )


# ---- embedding near-dup, LSH scale path ------------------------------
# The oracle reproduces the hyperplane-sign buckets bit-for-bit: plane
# components are ±1, so each dot is (sum over +1 indices) − (sum over
# −1 indices) in float64 — sign decisions agree with Spark's HOF fold
# to ~1e-12, far beyond any realistic flip margin.


def _lsh_bucket_sql(band: int, dim: int = 64, band_planes: int = 8) -> str:
    from vector_spark.training.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, band_planes, seed=1000 + band)
    terms = []
    for i, plane in enumerate(planes):
        pos = [d + 1 for d, c in enumerate(plane) if c > 0]
        neg = [d + 1 for d, c in enumerate(plane) if c < 0]
        dot = (
            f"(list_sum(list_transform({pos}, i -> CAST(embedding[i] AS DOUBLE)))"
            f" - list_sum(list_transform({neg}, i -> CAST(embedding[i] AS DOUBLE))))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


@_q(
    "embedding_neardup_lsh",
    f"""
    WITH b AS (
      SELECT vec_id,
             {_lsh_bucket_sql(0)} AS bucket0,
             {_lsh_bucket_sql(1)} AS bucket1
      FROM embeddings),
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM b x JOIN b y
        ON x.vec_id < y.vec_id
       AND (x.bucket0 = y.bucket0 OR x.bucket1 = y.bucket1))
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) AS cos
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= 0.35
    """,
    scale_class="baseline",
)
def q_embedding_neardup_lsh(spark, sf):
    from vector_spark.training.similarity import lsh_near_pairs

    emb = _t(spark, sf, "embeddings")
    pairs = lsh_near_pairs(emb, threshold=0.35, dim=64, n_bands=2, band_planes=8)
    return pairs.select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))


# ---- IPv6 function family (ip6_aton/ntoa, mapped-v4, v6 CIDR) --------


@_q(
    "ipv6_functions",
    """
    SELECT event_id,
           2306139568115548160 AS hi,
           user_id % 65536 AS lo,
           '2001:db8:0:0:0:0:0:' || lower(to_hex(user_id % 65536)) AS full,
           '10.0.' || (user_id % 256) || '.7' AS v4,
           true AS in_db8
    FROM events
    """,
)
def q_ipv6_functions(spark, sf):
    from vector_spark.functions.ip import (
        ip6_aton,
        ip6_cidr_contains,
        ip6_ntoa,
        ipv6_to_ipv4,
    )

    ev = _t(spark, sf, "events")
    v6 = F.concat(
        F.lit("2001:db8::"),
        F.lower(F.conv(F.pmod("user_id", F.lit(65536)).cast("string"), 10, 16)),
    )
    mapped = F.concat(F.lit("::ffff:10.0."), F.pmod("user_id", F.lit(256)), F.lit(".7"))
    staged = ev.select("event_id", v6.alias("__v6"), mapped.alias("__m"))
    p = ip6_aton(F.col("__v6"))
    return staged.select(
        "event_id",
        p["hi"].alias("hi"),
        p["lo"].alias("lo"),
        ip6_ntoa(p).alias("full"),
        ipv6_to_ipv4(F.col("__m")).alias("v4"),
        ip6_cidr_contains(F.col("__v6"), "2001:db8::/32").alias("in_db8"),
    )


# ---- nginx access (combined) log ------------------------------------


@_q(
    "nginx_access_parser",
    """
    SELECT event_id,
           '10.0.' || (user_id % 256) || '.1' AS client,
           'u' || user_id AS req_user,
           epoch_us(TIMESTAMP '2026-08-17 10:00:00') AS ts_us,
           'GET' AS method,
           '/api/' || event_type AS path,
           CAST(200 + (user_id % 5) * 100 AS BIGINT) AS status,
           event_id % 4096 AS size,
           CASE WHEN user_id % 2 = 0 THEN 'https://ref.example/' || event_type END AS referer,
           'curl/7.75.0' AS agent
    FROM events
    """,
)
def q_nginx_access_parser(spark, sf):
    from vector_spark.functions.parse import parse_nginx_combined_log

    ev = _t(spark, sf, "events")
    referer = F.when(
        F.pmod("user_id", F.lit(2)) == 0,
        F.concat(F.lit("https://ref.example/"), F.col("event_type")),
    ).otherwise(F.lit("-"))
    line = F.concat(
        F.lit("10.0."), F.pmod("user_id", F.lit(256)), F.lit(".1 u"), F.col("user_id"),
        F.lit(' - [17/Aug/2026:10:00:00 +0000] "GET /api/'), F.col("event_type"),
        F.lit(' HTTP/1.1" '), (F.lit(200) + F.pmod("user_id", F.lit(5)) * 100),
        F.lit(" "), F.pmod("event_id", F.lit(4096)),
        F.lit(' "'), referer, F.lit('" "curl/7.75.0"'),
    )
    p = parse_nginx_combined_log(line)
    return ev.select(
        "event_id",
        p["client"].alias("client"),
        p["user"].alias("req_user"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["method"].alias("method"),
        p["path"].alias("path"),
        p["status"].alias("status"),
        p["size"].alias("size"),
        p["referer"].alias("referer"),
        p["agent"].alias("agent"),
    )


# ---- syslog code maps + match_any -----------------------------------


@_q(
    "syslog_maps",
    """
    SELECT event_id,
           CASE user_id % 8 WHEN 0 THEN 'emerg' WHEN 1 THEN 'alert'
                WHEN 2 THEN 'crit' WHEN 3 THEN 'err' WHEN 4 THEN 'warning'
                WHEN 5 THEN 'notice' WHEN 6 THEN 'info' ELSE 'debug' END AS level,
           CASE user_id % 26 WHEN 24 THEN NULL WHEN 25 THEN NULL
                ELSE (CASE user_id % 26
                      WHEN 0 THEN 'kern' WHEN 1 THEN 'user' WHEN 2 THEN 'mail'
                      WHEN 3 THEN 'daemon' WHEN 4 THEN 'auth' WHEN 5 THEN 'syslog'
                      WHEN 6 THEN 'lpr' WHEN 7 THEN 'news' WHEN 8 THEN 'uucp'
                      WHEN 9 THEN 'cron' WHEN 10 THEN 'authpriv' WHEN 11 THEN 'ftp'
                      WHEN 12 THEN 'ntp' WHEN 13 THEN 'security' WHEN 14 THEN 'console'
                      WHEN 15 THEN 'solaris-cron' WHEN 16 THEN 'local0'
                      WHEN 17 THEN 'local1' WHEN 18 THEN 'local2' WHEN 19 THEN 'local3'
                      WHEN 20 THEN 'local4' WHEN 21 THEN 'local5' WHEN 22 THEN 'local6'
                      ELSE 'local7' END) END AS facility,
           CAST(user_id % 8 AS INT) AS severity_back,
           (event_type = 'error' OR event_type = 'purchase') AS matched
    FROM events
    """,
)
def q_syslog_maps(spark, sf):
    from vector_spark.functions.strings import (
        match_any,
        to_syslog_facility,
        to_syslog_level,
        to_syslog_severity,
    )

    ev = _t(spark, sf, "events")
    level = to_syslog_level(F.pmod("user_id", F.lit(8)))
    return ev.select(
        "event_id",
        level.alias("level"),
        to_syslog_facility(F.pmod("user_id", F.lit(26))).alias("facility"),
        to_syslog_severity(level).alias("severity_back"),
        match_any(F.col("event_type"), ["^error$", "^purchase$"]).alias("matched"),
    )


# ---- object/path ops over the attributes map ------------------------


@_q(
    "object_ops",
    """
    WITH m AS (
      SELECT event_id,
             event_type AS t_val,
             CAST(user_id AS VARCHAR) AS u_val
      FROM events)
    SELECT event_id,
           t_val AS got_type,
           'overridden' AS set_val,
           u_val AS kept_user,
           2 AS n_after_del,
           1 AS n_only
    FROM m
    """,
)
def q_object_ops(spark, sf):
    from vector_spark.functions.objects import (
        del_path,
        get_path,
        merge_maps,
        only_fields,
        set_path,
    )

    ev = _t(spark, sf, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user"), F.lit("junk")),
        F.array(F.col("event_type"), F.col("user_id").cast("string"), F.lit("")),
    )
    staged = ev.select("event_id", m.alias("m"))
    mm = F.col("m")
    after_set = set_path(mm, "type", F.lit("overridden"))
    merged = merge_maps(mm, F.create_map(F.lit("type"), F.lit("overridden")))
    after_del = del_path(mm, ["junk"])
    return staged.select(
        "event_id",
        get_path(mm, "type").alias("got_type"),
        get_path(after_set, "type").alias("set_val"),
        get_path(merged, "user").alias("kept_user"),
        F.size(after_del).alias("n_after_del"),
        F.size(only_fields(mm, ["user"])).alias("n_only"),
    )


# ---- datadog_search condition (transform #33) -----------------------


@_q(
    "datadog_search",
    """
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type = 'error'
       OR (value > 90 AND event_type LIKE 'c%')
       OR (value >= 10 AND value <= 20 AND event_type = 'view')
    """,
)
def q_datadog_search(spark, sf):
    from vector_spark.functions.datadog_search import datadog_search

    ev = _t(spark, sf, "events")
    cond = datadog_search(
        "event_type:error OR (value:>90 event_type:c*) OR (value:[10 TO 20] event_type:view)"
    )
    return ev.filter(cond).select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )


# ---- reduce with ends_when boundaries (reduce/mod.rs:221-257) -------
# `event_id` is the order column (unique — `ts` alone could tie and
# make segment boundaries engine-dependent).


@_q(
    "reduce_bounded",
    """
    WITH seg AS (
      SELECT user_id, value,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS segment
      FROM events)
    SELECT user_id, segment, round(sum(value), 4) AS total, count(*) AS n_events
    FROM seg GROUP BY user_id, segment
    """,
)
def q_reduce_bounded(spark, sf):
    from vector_spark.operators.reduce import BoundedReduce

    ev = _t(spark, sf, "events")
    out = BoundedReduce(
        ["user_id"], {"value": "sum"}, order_by="event_id",
        ends_when="event_type = 'purchase'",
    ).apply(ev)
    return out.select(
        "user_id", "segment", F.round("value", 4).alias("total"), "n_events"
    )


# ---- stratified sampling (training-mix rates per stratum) -----------


@_q(
    "sample_stratified",
    """
    SELECT event_id, user_id, event_type,
           CASE event_type WHEN 'error' THEN 1 WHEN 'click' THEN 10
                ELSE 4 END AS sample_rate
    FROM events
    WHERE user_id % (CASE event_type WHEN 'error' THEN 1
                     WHEN 'click' THEN 10 ELSE 4 END) = 0
    """,
)
def q_sample_stratified(spark, sf):
    from vector_spark.operators.sample import StratifiedSample

    ev = _t(spark, sf, "events")
    out = StratifiedSample(
        {"error": 1, "click": 10}, key_field="user_id",
        strata_field="event_type", default_rate=4,
    ).apply(ev)
    return out.select("event_id", "user_id", "event_type", "sample_rate")


# ---- benchmark decontamination (n-gram overlap) ---------------------
# "Benchmark" = docs 0-4's shingles; any doc sharing >= 2 distinct
# 3-gram shingles with them is flagged (incl. the benchmark docs
# themselves — self-overlap is the degenerate proof the join works).


@_q(
    "decontaminate",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 1, 1)),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2]))) AS shingle
      FROM documents),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5),
    hits AS (
      SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
      FROM sh s JOIN bench b ON s.shingle = b.shingle
      GROUP BY s.doc_id)
    SELECT doc_id, n_hits FROM hits WHERE n_hits >= 2
    """,
)
def q_decontaminate(spark, sf):
    from vector_spark.training.dedup import contamination_flags

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") < 5)
    return contamination_flags(docs, bench, n=3, min_hits=2)


# ---- shared shingle table: minhash + jaccard + decontaminate --------
# The three shingle consumers in one job over ONE persisted (id,
# shingle) table (training/dedup.py shared_shingles) — one corpus
# scan + one shingle explode instead of three. Output is one summary
# row per op (count + portable checksum) so the whole fused plan is
# hash-checked; the full per-op outputs are hash-checked by their own
# queries above.


@_q(
    "shingle_suite",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 1, 1)),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2]))) AS shingle
      FROM documents),
    mh AS (
      SELECT doc_id,
             min((1664525 * ((('0x' || substr(md5(shingle), 1, 15))::BIGINT) % 2147483647)
                  + 1013904223) % 2147483647) AS h0
      FROM sh GROUP BY doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (
      SELECT round(i / (sa.n + sb.n - i), 4) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE i / (sa.n + sb.n - i) >= 0.5),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 5),
    cont AS (
      SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
      FROM sh s JOIN bench b ON s.shingle = b.shingle
      GROUP BY s.doc_id HAVING count(DISTINCT s.shingle) >= 2)
    SELECT 'minhash' AS op, count(*) AS n, bit_xor(h0) AS chk FROM mh
    UNION ALL
    SELECT 'jaccard' AS op, count(*) AS n,
           CAST(coalesce(sum(round(jaccard * 10000)), 0) AS BIGINT) AS chk FROM jac
    UNION ALL
    SELECT 'decontaminate' AS op, count(*) AS n,
           CAST(coalesce(sum(n_hits), 0) AS BIGINT) AS chk FROM cont
    """,
    scale_class="baseline",
)
def q_shingle_suite(spark, sf):
    from vector_spark.training.dedup import (
        _release_after_compute,
        contamination_flags,
        minhash_signatures,
        ngram_jaccard_pairs,
        shared_shingles,
    )

    docs = _t(spark, sf, "documents")
    sh = shared_shingles(docs, n=3)
    sigs = minhash_signatures(docs, shingle_df=sh)
    jac = ngram_jaccard_pairs(docs, threshold=0.5, shingle_df=sh)
    cont = contamination_flags(
        docs,
        None,
        min_hits=2,
        corpus_shingles=sh,
        benchmark_shingles=sh.filter(F.col("doc_id") < 5),
    )
    mh_row = sigs.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor("h0").alias("chk")
    ).select(F.lit("minhash").alias("op"), "n", "chk")
    jac_row = jac.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.round(F.col("jaccard") * 10000)), F.lit(0)).cast("long").alias("chk"),
    ).select(F.lit("jaccard").alias("op"), "n", "chk")
    cont_row = cont.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long").alias("chk"),
    ).select(F.lit("decontaminate").alias("op"), "n", "chk")
    out = mh_row.unionByName(jac_row).unionByName(cont_row)
    return _release_after_compute(out, sh)


# ---- sequence packing (training-tier, tokens axis) ------------------
# Deterministic sharded next-fit; the oracle replays the identical
# in-shard sequential sweep with a recursive CTE.


@_q(
    "sequence_packing",
    """
    WITH RECURSIVE hashed AS (
      SELECT doc_id, n_chars AS n,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 4 AS grp
      FROM documents),
    seq AS (
      SELECT doc_id, grp, n,
             row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
      FROM hashed),
    fit(grp, rn, doc_id, n, bin, fill) AS (
      SELECT grp, rn, doc_id, n, 0, n FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.grp, s.rn, s.doc_id, s.n,
             CASE WHEN f.fill + s.n > 1000 THEN f.bin + 1 ELSE f.bin END,
             CASE WHEN f.fill + s.n > 1000 THEN s.n ELSE f.fill + s.n END
      FROM fit f JOIN seq s ON s.grp = f.grp AND s.rn = f.rn + 1)
    SELECT doc_id, grp * 1000000 + bin AS pack_id FROM fit
    """,
)
def q_sequence_packing(spark, sf):
    from vector_spark.training.packing import pack_sequences, portable_shard

    docs = _t(spark, sf, "documents").select("doc_id", F.col("n_chars").alias("n_tok"))
    return pack_sequences(
        docs, max_len=1000, shards=4, shard_key=portable_shard("doc_id", 4)
    ).select("doc_id", "pack_id")


# ---- packing strategy comparison: next-fit vs first-fit-decreasing --
# Rows-only (no oracle): FFD's first-open-bin scan over a mutable fill
# list is not expressible in SQL (the next-fit half IS replayed by
# sequence_packing's recursive-CTE oracle above). The row pins the
# fill-efficiency tradeoff: FFD packs the same corpus into fewer,
# fuller bins at a higher in-shard sweep cost.


@_q("pack_fill_compare")
def q_pack_fill_compare(spark, sf):
    from vector_spark.training.packing import pack_sequences, pack_stats

    docs = _t(spark, sf, "documents").select("doc_id", F.col("n_chars").alias("n_tok"))
    rows = []
    for strat in ("next_fit", "ffd"):
        st = pack_stats(pack_sequences(docs, max_len=2048, shards=4, strategy=strat), 2048)
        rows.append(
            st.agg(
                F.count(F.lit(1)).alias("n_packs"),
                F.sum("total_tok").alias("total_tok"),
                F.round(F.avg("fill"), 4).alias("avg_fill"),
            ).select(F.lit(strat).alias("strategy"), "n_packs", "total_tok", "avg_fill")
        )
    return rows[0].unionByName(rows[1])


# ---- RFC 5424 structured-data extraction ----------------------------


@_q(
    "syslog_sd_parser",
    """
    SELECT event_id,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'meta@123.seq=' || CAST(event_id AS VARCHAR)
                     || ',meta@123.type=' || event_type
                     || ',origin.host=h' || CAST(user_id % 4 AS VARCHAR)
           END AS sd_s,
           CASE WHEN event_id % 5 = 0 THEN 0 ELSE 2 END AS n_elements
    FROM events
    """,
)
def q_syslog_sd_parser(spark, sf):
    from vector_spark.functions.parse import parse_syslog_structured_data

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    with_sd = F.concat(
        F.lit("<13>1 2026-08-17T00:00:00Z host app 1 ID1 "),
        F.lit('[meta@123 seq="'), eid.cast("string"),
        F.lit('" type="'), F.col("event_type"),
        F.lit('"][origin host="h'), (uid % 4).cast("string"),
        F.lit('"] the message body'),
    )
    without = F.lit("<13>1 2026-08-17T00:00:00Z host app 1 ID1 - plain message")
    line = F.element_at(F.array(with_sd, without), ((eid % 5 == 0).cast("int") + 1))
    p = parse_syslog_structured_data(line)
    return ev.select(
        eid.alias("event_id"),
        p["sd_s"].alias("sd_s"),
        p["n_elements"].alias("n_elements"),
    )


# ---- octet-counting framing (src/codecs/framers/octet_counting.rs) --
# A chunk carrying 2-3 length-prefixed frames explodes to one row per
# frame; the oracle emits the ground-truth frames directly.


@_q(
    "octet_framing",
    """
    SELECT event_id, 0 AS frame_idx, event_type AS frame FROM events
    UNION ALL
    SELECT event_id, 1, 'uid=' || CAST(user_id AS VARCHAR) FROM events
    UNION ALL
    SELECT event_id, 2, 'extra frame' FROM events WHERE event_id % 3 = 0
    """,
)
def q_octet_framing(spark, sf):
    from vector_spark.functions.framing import octet_counting_frames

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    f1 = F.col("event_type")
    f2 = F.concat(F.lit("uid="), uid.cast("string"))
    frame = lambda p: F.concat(F.length(p).cast("string"), F.lit(" "), p)  # noqa: E731
    base = F.concat(frame(f1), frame(f2))
    chunk = F.element_at(
        F.array(base, F.concat(base, frame(F.lit("extra frame")))),
        ((eid % 3 == 0).cast("int") + 1),
    )
    frames = ev.select(
        eid.alias("event_id"),
        F.posexplode(octet_counting_frames(chunk)).alias("frame_idx", "frame"),
    )
    return frames


# ---- heroku logplex drain lines (src/sources/heroku_logs.rs) --------


@_q(
    "logplex_parser",
    """
    SELECT event_id,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE epoch_us(ts) END AS ts_us,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'host' || CAST(user_id % 4 AS VARCHAR) END AS host,
           CASE WHEN event_id % 9 = 0 THEN NULL ELSE 'app' END AS app_name,
           CASE WHEN event_id % 9 = 0 THEN NULL
                ELSE 'web.' || CAST(user_id AS VARCHAR) END AS proc_id,
           CASE WHEN event_id % 9 = 0 THEN 'not logplex'
                ELSE 'at=info type=' || event_type END AS message
    FROM events
    """,
)
def q_logplex_parser(spark, sf):
    from vector_spark.functions.parse import parse_logplex

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'")
    good = F.concat(
        F.lit("267 <158>1 "), iso,
        F.lit(" host"), (uid % 4).cast("string"),
        F.lit(" app web."), uid.cast("string"),
        F.lit(" - at=info type="), F.col("event_type"),
    )
    line = F.element_at(
        F.array(good, F.lit("not logplex")), ((eid % 9 == 0).cast("int") + 1)
    )
    p = parse_logplex(line)
    return ev.select(
        eid.alias("event_id"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["host"].alias("host"),
        p["app_name"].alias("app_name"),
        p["proc_id"].alias("proc_id"),
        p["message"].alias("message"),
    )


# ---- journald JSON-export records (src/sources/journald.rs) ---------


@_q(
    "journald_parser",
    """
    SELECT event_id,
           event_type || ' happened' AS message,
           'h' || CAST(user_id % 4 AS VARCHAR) AS host,
           epoch_us(ts) AS ts_us,
           6 AS priority,
           'app.service' AS unit
    FROM events
    """,
)
def q_journald_parser(spark, sf):
    from vector_spark.functions.parse import parse_journald_record

    ev = _t(spark, sf, "events")
    uid = F.col("user_id")
    rec = F.concat(
        F.lit('{"MESSAGE":"'), F.col("event_type"), F.lit(' happened",'),
        F.lit('"_HOSTNAME":"h'), (uid % 4).cast("string"), F.lit('",'),
        F.lit('"_SOURCE_REALTIME_TIMESTAMP":"'),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
        F.lit('","PRIORITY":"6","_SYSTEMD_UNIT":"app.service"}'),
    )
    p = parse_journald_record(rec)
    return ev.select(
        "event_id",
        p["message"].alias("message"),
        p["host"].alias("host"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["priority"].alias("priority"),
        p["unit"].alias("unit"),
    )


# ---- datadog agent log payload (multi-event emission) ---------------
# eid % 4 == 0 envelopes carry TWO LogMsgs — the explode fans out to
# one event per entry (agent.rs:264-275), so rows_out > rows_in; the
# oracle reproduces the second entries with a UNION ALL.


@_q(
    "datadog_agent_parser",
    """
    SELECT event_id, event_type || ' event' AS message, 'info' AS status,
           epoch_ms(ts) AS ts_ms, 'h' || CAST(user_id % 4 AS VARCHAR) AS hostname,
           'svc' AS service, 'env:prod,team:core' AS ddtags, 'prod' AS env_tag
    FROM events
    UNION ALL
    SELECT event_id, 'second event', 'error', epoch_ms(ts),
           'h' || CAST(user_id % 4 AS VARCHAR), 'svc', 'env:prod,team:core', 'prod'
    FROM events WHERE event_id % 4 = 0
    """,
)
def q_datadog_agent_parser(spark, sf):
    from vector_spark.functions.parse import parse_datadog_agent_logs

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    entry = lambda msg, status: F.concat(  # noqa: E731
        F.lit('{"message":"'), msg, F.lit('","status":"'), F.lit(status),
        F.lit('","timestamp":'), (F.unix_micros(F.col("ts").cast("timestamp")) / 1000).cast("long").cast("string"),
        F.lit(',"hostname":"h'), (uid % 4).cast("string"),
        F.lit('","service":"svc","ddsource":"agent","ddtags":"env:prod,team:core"}'),
    )
    one = F.concat(F.lit("["), entry(F.concat(F.col("event_type"), F.lit(" event")), "info"), F.lit("]"))
    two = F.concat(
        F.lit("["), entry(F.concat(F.col("event_type"), F.lit(" event")), "info"),
        F.lit(","), entry(F.lit("second event"), "error"), F.lit("]"),
    )
    payload = F.element_at(F.array(one, two), ((eid % 4 == 0).cast("int") + 1))
    parsed = ev.select(eid.alias("event_id"), F.explode(parse_datadog_agent_logs(payload)).alias("m"))
    return parsed.select(
        "event_id",
        F.col("m.message").alias("message"),
        F.col("m.status").alias("status"),
        F.col("m.timestamp").alias("ts_ms"),
        F.col("m.hostname").alias("hostname"),
        F.col("m.service").alias("service"),
        F.col("m.ddtags").alias("ddtags"),
        F.element_at(F.str_to_map(F.col("m.ddtags"), F.lit(","), F.lit(":")), "env").alias("env_tag"),
    )


# ---- splunk HEC envelope with the time-magnitude heuristic ----------


@_q(
    "splunk_hec_parser",
    """
    SELECT event_id,
           event_type || ' log line' AS event,
           CAST(floor(epoch(ts)) AS BIGINT) * 1000000 AS ts_us,
           'h' || CAST(user_id % 4 AS VARCHAR) AS host,
           'main' AS splunk_index,
           'udp:514' AS splunk_source
    FROM events
    """,
)
def q_splunk_hec_parser(spark, sf):
    from vector_spark.functions.parse import parse_splunk_hec

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    sec = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    # same instant in three magnitudes — the heuristic must land on the
    # identical microsecond timestamp for all of them
    t = F.element_at(
        F.array(
            sec.cast("string"),
            (sec * 1000).cast("string"),
            (sec * 1_000_000_000).cast("string"),
        ),
        (eid % 3 + 1).cast("int"),
    )
    envelope = F.concat(
        F.lit('{"time":'), t,
        F.lit(',"event":"'), F.col("event_type"), F.lit(' log line"'),
        F.lit(',"host":"h'), (uid % 4).cast("string"),
        F.lit('","index":"main","source":"udp:514","sourcetype":"syslog"}'),
    )
    p = parse_splunk_hec(envelope)
    return ev.select(
        "event_id",
        p["event"].alias("event"),
        F.unix_micros(p["timestamp"]).alias("ts_us"),
        p["host"].alias("host"),
        p["splunk_index"].alias("splunk_index"),
        p["splunk_source"].alias("splunk_source"),
    )


# ---- dedup clustering: LSH pairs → connected components -------------
# Oracle: the same LSH candidate pairs (sigs CTE shared with
# lsh_candidates) closed transitively with a recursive CTE, component =
# min reachable id. The Spark side runs the large-star/small-star
# rounds (training/components.py).


@_q(
    "dedup_clusters",
    _SIGS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a
        JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id, b.doc_id FROM sigs a
        JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)),
    bi AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM bi
      UNION
      SELECT r.u, e.v FROM reach r JOIN bi e ON r.v = e.u)
    SELECT u AS id, least(u, min(v)) AS component
    FROM reach GROUP BY u
    """,
)
def q_dedup_clusters(spark, sf):
    from vector_spark.training.components import connected_components
    from vector_spark.training.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf, "documents")
    sigs = minhash_signatures(docs, n=3)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    return connected_components(pairs, "id_a", "id_b")


# ---- dedup decision: keep one representative per cluster ------------


@_q(
    "dedup_keep",
    _SIGS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a
        JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id, b.doc_id FROM sigs a
        JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)),
    bi AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
      SELECT u, v FROM bi
      UNION
      SELECT r.u, e.v FROM reach r JOIN bi e ON r.v = e.u),
    comp AS (SELECT u AS id, least(u, min(v)) AS component
             FROM reach GROUP BY u)
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    LEFT JOIN comp ON comp.id = d.doc_id
    WHERE comp.id IS NULL OR comp.id = comp.component
    """,
)
def q_dedup_keep(spark, sf):
    from vector_spark.training.components import (
        connected_components,
        keep_representatives,
    )
    from vector_spark.training.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _t(spark, sf, "documents")
    sigs = minhash_signatures(docs, n=3)
    pairs = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    comp = connected_components(pairs, "id_a", "id_b")
    return keep_representatives(docs, comp).select("doc_id", "source", "n_chars")


# ---- statsd datagram codec (src/sources/statsd/parser.rs:16-185) ----
# The oracle recomputes the expected metric from the GROUND-TRUTH source
# columns (not by re-parsing), so it independently checks the parser.


@_q(
    "statsd_parser",
    """
    SELECT event_id,
           'app-' || event_type || '_latency' AS name,
           CASE user_id % 4 WHEN 0 THEN 'c' WHEN 1 THEN 'g'
                            WHEN 2 THEN 'ms' ELSE 's' END AS mtype,
           CASE WHEN user_id % 4 = 1 AND event_id % 2 = 1
                THEN 'absolute' ELSE 'incremental' END AS kind,
           round(CAST(CASE user_id % 4
             WHEN 0 THEN (user_id + 0.25)
                         * (CASE WHEN event_id % 3 = 0 THEN 2.0 ELSE 1.0 END)
             WHEN 1 THEN user_id + 0.25
             WHEN 2 THEN (user_id + 0.25) / 1000.0
             ELSE NULL END AS DOUBLE), 6) AS value,
           round(CAST(CASE WHEN event_id % 3 = 0 THEN 2.0 ELSE 1.0 END
                      AS DOUBLE), 6) AS sample_rate,
           CASE WHEN user_id % 4 = 2 THEN 'histogram' END AS statistic,
           CASE WHEN user_id % 4 = 3
                THEN CAST(user_id AS VARCHAR) || '.25' END AS set_value,
           CASE WHEN event_id % 2 = 0
                THEN 'host:h' || CAST(user_id % 4 AS VARCHAR) || ',env:prod,flag:true'
           END AS tags_s
    FROM events
    """,
)
def q_statsd_parser(spark, sf):
    from vector_spark.functions.metrics_codec import parse_statsd

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    # fixture is built WITHOUT when() branches (element_at over
    # precomputed branch strings): the parser references this expression
    # many times and Spark's subexpression elimination only shares
    # condition-free trees (see NOTES_r2.md / functions/grok.py)
    pick = lambda c, a, b: F.element_at(F.array(b, a), c.cast("int") + 1)  # noqa: E731
    val_txt = F.concat(uid.cast("string"), F.lit(".25"))
    mtype = F.element_at(
        F.array(F.lit("c"), F.lit("g"), F.lit("ms"), F.lit("s")),
        (uid % 4 + 1).cast("int"),
    )
    sign = pick((uid % 4 == 1) & (eid % 2 == 0), F.lit("+"), F.lit(""))
    sampling = pick(eid % 3 == 0, F.lit("|@0.5"), F.lit(""))
    tags = pick(
        eid % 2 == 0,
        F.concat(F.lit("|#host:h"), (uid % 4).cast("string"), F.lit(",env:prod,flag")),
        F.lit(""),
    )
    line = F.concat(
        F.lit("app/"), F.col("event_type"), F.lit(" latency:"),
        sign, val_txt, F.lit("|"), mtype, sampling, tags,
    )
    p = parse_statsd(line)
    return ev.select(
        eid.alias("event_id"),
        p["name"].alias("name"),
        p["mtype"].alias("mtype"),
        p["kind"].alias("kind"),
        F.round(p["value"], 6).alias("value"),
        F.round(p["sample_rate"], 6).alias("sample_rate"),
        p["statistic"].alias("statistic"),
        p["set_value"].alias("set_value"),
        p["tags_s"].alias("tags_s"),
    )


# ---- prometheus text exposition codec (lib/prometheus-parser) -------


@_q(
    "prometheus_parser",
    """
    SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 5 = 0 THEN 'up'
                ELSE 'http_requests_total' END AS name,
           CASE WHEN event_id % 7 = 0 THEN NULL
                WHEN event_id % 5 = 0 THEN ''
                ELSE 'env:prod,host:h' || CAST(user_id % 4 AS VARCHAR)
           END AS labels_s,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE round(CAST(user_id + 0.25 AS DOUBLE), 6) END AS value,
           CASE WHEN event_id % 7 = 0 OR event_id % 5 = 0 OR event_id % 2 = 1
                THEN NULL ELSE 1700000000000 + event_id END AS timestamp_ms,
           CASE WHEN event_id % 7 = 0 THEN 'not_a_metric_line' END AS error
    FROM events
    """,
)
def q_prometheus_parser(spark, sf):
    from vector_spark.functions.metrics_codec import parse_prometheus

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    # condition-free fixture (see statsd_parser comment): all three
    # line shapes are built unconditionally, one element_at picks
    val_txt = F.concat(uid.cast("string"), F.lit(".25"))
    ts_part = F.element_at(
        F.array(
            F.concat(F.lit(" "), (F.lit(1700000000000) + eid).cast("string")),
            F.lit(""),
        ),
        (eid % 2 + 1).cast("int"),
    )
    labeled = F.concat(
        F.lit('http_requests_total{env="prod",host="h'),
        (uid % 4).cast("string"),
        F.lit('"} '),
        val_txt,
        ts_part,
    )
    bare = F.concat(F.lit("up "), val_txt)
    shape = (  # 1 = comment, 2 = bare, 3 = labeled (comment wins ties)
        F.lit(3)
        - (eid % 5 == 0).cast("int")
        - F.lit(2) * (eid % 7 == 0).cast("int")
        + (eid % 35 == 0).cast("int")
    )
    line = F.element_at(
        F.array(F.lit("# TYPE http_requests_total counter"), bare, labeled),
        shape.cast("int"),
    )
    p = parse_prometheus(line)
    return ev.select(
        eid.alias("event_id"),
        p["name"].alias("name"),
        p["labels_s"].alias("labels_s"),
        F.round(p["value"], 6).alias("value"),
        p["timestamp_ms"].alias("timestamp_ms"),
        p["error"].alias("error"),
    )


# ---- VRL type reflection (is_*, typeof) over the JSON variant -------
# Oracle derives expectations from event_id % 6 (ground truth), not by
# re-sniffing the JSON.


@_q(
    "type_functions",
    """
    SELECT event_id,
           CASE event_id % 6 WHEN 0 THEN 'object' WHEN 1 THEN 'string'
                WHEN 2 THEN 'integer' WHEN 3 THEN 'float'
                WHEN 4 THEN 'array' ELSE 'boolean' END AS type_of,
           event_id % 6 = 0 AS is_obj,
           event_id % 6 = 1 AS is_str,
           event_id % 6 = 2 AS is_int,
           event_id % 6 = 3 AS is_flt
    FROM events
    """,
)
def q_type_functions(spark, sf):
    from vector_spark.functions import types as T

    ev = _t(spark, sf, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    vj = (
        F.when(eid % 6 == 0, F.col("props"))
        .when(eid % 6 == 1, F.concat(F.lit('"'), F.col("event_type"), F.lit('"')))
        .when(eid % 6 == 2, uid.cast("string"))
        .when(eid % 6 == 3, F.concat(uid.cast("string"), F.lit(".5")))
        .when(eid % 6 == 4, F.lit("[1,2,3]"))
        .otherwise(F.lit("true"))
    )
    return ev.select(
        eid.alias("event_id"),
        T.typeof_value(vj).alias("type_of"),
        T.is_object(vj).alias("is_obj"),
        T.is_string(vj).alias("is_str"),
        T.is_integer(vj).alias("is_int"),
        T.is_float(vj).alias("is_flt"),
    )


# ---- tag_types_externally (tag_types_externally.rs:93-119) ----------


@_q(
    "tag_types_json",
    """
    SELECT event_id,
           '{"k":{"integer":' || json_extract_string(props, '$.k') || '}}'
             AS tagged
    FROM events
    """,
)
def q_tag_types_json(spark, sf):
    from vector_spark.functions.types import tag_types_externally

    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id", tag_types_externally(F.col("props")).alias("tagged")
    )


# ---- regex value kind (to_regex.rs, is_regex.rs) --------------------
# Tagged-struct convention (functions/types.py): a regex VALUE is
# struct<regex: string> / the JSON object {"regex": p}. Oracle derives
# validity from event_id % 3 ground truth (only %3=1 builds an invalid
# pattern — unbalanced paren), not by re-compiling.


@_q(
    "regex_values",
    """
    SELECT event_id,
           CASE WHEN event_id % 3 = 1 THEN NULL
                WHEN event_id % 3 = 0 THEN '^' || event_type
                ELSE event_type || '$' END AS rx_pattern,
           CASE WHEN event_id % 3 = 1 THEN NULL ELSE true END AS matched,
           event_id % 2 = 0 AS is_rx
    FROM events
    """,
)
def q_regex_values(spark, sf):
    from vector_spark.functions import types as T

    ev = _t(spark, sf, "events")
    eid = F.col("event_id")
    pat = (
        F.when(eid % 3 == 0, F.concat(F.lit("^"), F.col("event_type")))
        .when(eid % 3 == 1, F.concat(F.lit("("), F.col("event_type")))
        .otherwise(F.concat(F.col("event_type"), F.lit("$")))
    )
    rx = T.to_regex(pat)
    vj = (
        F.when(eid % 2 == 0, F.concat(F.lit('{"regex":"'), F.col("event_type"), F.lit('"}')))
        .otherwise(F.lit('"plain"'))
    )
    return ev.select(
        eid.alias("event_id"),
        rx["regex"].alias("rx_pattern"),
        T.regex_match(F.col("event_type"), rx).alias("matched"),
        T.is_regex(vj).alias("is_rx"),
    )


# ---- multimodal plumbing: binary payloads + mapInPandas features ----
# Payloads are the document text bytes (the stand-in for real blobs);
# the stub "decode" is sha256 -> 8-dim feature (training/multimodal.py),
# which DuckDB reproduces with its sha256(), so the mapInPandas batch
# path itself is hash-checked. Feature components are exported as the
# exact byte values (f*255) to dodge float32-vs-float64 rounding.


@_q(
    "multimodal_features",
    """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           ('0x' || substr(sha256(text), 1, 2))::INT AS f0,
           ('0x' || substr(sha256(text), 3, 2))::INT AS f1,
           ('0x' || substr(sha256(text), 5, 2))::INT AS f2,
           ('0x' || substr(sha256(text), 7, 2))::INT AS f3
    FROM documents
    """,
)
def q_multimodal_features(spark, sf):
    from vector_spark.training.multimodal import extract_features

    docs = _t(spark, sf, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
    )
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(media)
    byte_at = lambda i: F.round(F.get("feature", i) * 255).cast("int")  # noqa: E731
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "kind",
        "n_bytes",
        byte_at(0).alias("f0"),
        byte_at(1).alias("f1"),
        byte_at(2).alias("f2"),
        byte_at(3).alias("f3"),
    )


# ---- video frame-sampling plumbing ----------------------------------


@_q(
    "frame_sample",
    """
    SELECT doc_id,
           unnest(range(0, (n_chars % 300) + 1, 30)) AS frame_idx
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def q_frame_sample(spark, sf):
    from vector_spark.training.multimodal import frame_sample

    docs = _t(spark, sf, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.when(F.pmod("doc_id", F.lit(3)) == 2, F.lit("video"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.struct(
            ((F.col("n_chars") % 300) + 1).cast("int").alias("n_frames")
        ).alias("meta"),
    )
    return frame_sample(media, every_n=30).select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
    )


# ---- aws_ec2_metadata stamping (injectable IMDS fetcher) ------------


@_q(
    "ec2_metadata",
    """
    SELECT event_id, event_type,
           'i-0123456789abcdef0' AS instance_id,
           'us-east-1' AS region,
           'us-east-1a' AS availability_zone
    FROM events
    """,
)
def q_ec2_metadata(spark, sf):
    from vector_spark.enrich import Ec2Metadata

    ev = _t(spark, sf, "events")
    op = Ec2Metadata(
        fetcher=lambda: {
            "instance-id": "i-0123456789abcdef0",
            "region": "us-east-1",
            "availability-zone": "us-east-1a",
        },
        fields=["instance-id", "region", "availability-zone"],
    )
    return op.apply(ev.select("event_id", "event_type"))


# ---- token-array analytics (training-tier, tokens axis) -------------
# Portable text->token derivation shared by the token queries: word ->
# md5-based 60-bit hash mod 50257 (GPT-2 vocab size), replayed verbatim
# by the DuckDB list_transform below.

_TOK_SQL = (
    "list_transform(string_split(text,' '), "
    "t -> (('0x'||substr(md5(t),1,15))::BIGINT % 50257))"
)


def _tok_corpus(spark, sf):
    from vector_spark.training.tokens import derive_tokens

    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", derive_tokens(F.col("text")).alias("tokens"))


@_q(
    "token_freq",
    f"""
    WITH toks AS (SELECT unnest({_TOK_SQL}) AS token FROM documents),
    tot AS (SELECT count(*)::DOUBLE AS total FROM toks),
    c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
    SELECT token, n, round(n / (SELECT total FROM tot), 6) AS share
    FROM c ORDER BY n DESC, token ASC LIMIT 50
    """,
)
def q_token_freq(spark, sf):
    from vector_spark.training.tokens import token_frequencies

    return token_frequencies(_tok_corpus(spark, sf), k=50)


# ---- doc-boundary sliding-window chunking (narrow, no shuffle) -------


@_q(
    "chunk_docs",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents),
    st AS (SELECT doc_id, tk,
           unnest(range(0, CAST(ceil(greatest(len(tk) - 8, 1) / 24.0) AS BIGINT))) AS ci
           FROM toks)
    SELECT doc_id, ci AS chunk_idx, (ci*24) AS tok_start,
           tk[ci*24+1 : ci*24+32] AS tokens,
           len(tk[ci*24+1 : ci*24+32]) AS n_tok
    FROM st
    """,
)
def q_chunk_docs(spark, sf):
    from vector_spark.training.packing import chunk_documents

    return chunk_documents(_tok_corpus(spark, sf), ctx_len=32, overlap=8)


# ---- GPT-style concat-and-chunk stream packing -----------------------
# The oracle replays the per-shard stream with a window cumsum + zipped
# unnest (token, ordinal) — every chunk's token list must match
# element-for-element (token-array equality is the repo invariant).


@_q(
    "concat_chunk",
    f"""
    WITH toks AS (SELECT doc_id,
           (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 4) AS shard,
           {_TOK_SQL} AS tk FROM documents),
    off AS (SELECT doc_id, shard, tk,
            sum(len(tk)) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - len(tk) AS o
            FROM toks),
    flat AS (SELECT shard, doc_id, o + i - 1 AS gpos, t
             FROM (SELECT shard, doc_id, o, unnest(tk) AS t,
                          unnest(range(1, len(tk)+1)) AS i FROM off))
    SELECT shard*1000000 + gpos // 128 AS chunk_id,
           list(t ORDER BY gpos) AS tokens,
           count(*) AS n_tok, count(DISTINCT doc_id) AS n_docs
    FROM flat GROUP BY 1
    """,
)
def q_concat_chunk(spark, sf):
    from vector_spark.training.packing import concat_and_chunk, portable_shard

    return concat_and_chunk(
        _tok_corpus(spark, sf),
        ctx_len=128,
        shards=4,
        shard_key=portable_shard("doc_id", 4),
    )


# ---- Gopher repetition filters (Rae et al. 2021, table A1) -----------


@_q(
    "repetition_scores",
    """
    WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
                      string_split(text, chr(10)) AS ls, len(text) AS n_chars
               FROM documents),
    lc AS (SELECT doc_id, l, count(*) AS c, len(l) AS ln
           FROM (SELECT doc_id, unnest(ls) AS l FROM w) GROUP BY doc_id, l),
    linestats AS (SELECT doc_id,
        sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS dup_line_frac,
        CASE WHEN sum(ln*c) = 0 THEN 0.0
             ELSE sum(CASE WHEN c > 1 THEN ln*c ELSE 0 END)::DOUBLE / sum(ln*c)
        END AS dup_line_char_frac
        FROM lc GROUP BY doc_id),
    g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w
                 WHERE len(ws) >= 2)),
    g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
    top2 AS (SELECT doc_id, c * len(g) AS chars,
                    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
             FROM g2c),
    g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM w
                 WHERE len(ws) >= 3)),
    g3c AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g),
    top3 AS (SELECT doc_id, c * len(g) AS chars,
                    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
             FROM g3c),
    g5 AS (SELECT doc_id,
                  ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                        || ' ' || ws[i+4] AS g
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-3)) AS i FROM w
                 WHERE len(ws) >= 5)),
    g5c AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
    d5 AS (SELECT doc_id,
           CASE WHEN sum(c*len(g)) = 0 THEN 0.0
                ELSE sum(CASE WHEN c > 1 THEN c*len(g) ELSE 0 END)::DOUBLE / sum(c*len(g))
           END AS dup5 FROM g5c GROUP BY doc_id)
    SELECT w.doc_id,
           round(ls.dup_line_frac, 6) AS dup_line_frac,
           round(ls.dup_line_char_frac, 6) AS dup_line_char_frac,
           round(coalesce(t2.chars::DOUBLE / w.n_chars, 0.0), 6) AS top2gram_char_frac,
           round(coalesce(t3.chars::DOUBLE / w.n_chars, 0.0), 6) AS top3gram_char_frac,
           round(coalesce(d5.dup5, 0.0), 6) AS dup5gram_frac
    FROM w
    JOIN linestats ls ON ls.doc_id = w.doc_id
    LEFT JOIN (SELECT * FROM top2 WHERE rn = 1) t2 ON t2.doc_id = w.doc_id
    LEFT JOIN (SELECT * FROM top3 WHERE rn = 1) t3 ON t3.doc_id = w.doc_id
    LEFT JOIN d5 ON d5.doc_id = w.doc_id
    """,
)
def q_repetition_scores(spark, sf):
    from vector_spark.training.text import repetition_scores

    return repetition_scores(_t(spark, sf, "documents"))


# ---- exact substring duplication (Lee et al. 2021 ExactSubstr) -------
# 20-token windows at sf0.01 (the API default is the paper's 50; the
# fixture docs average ~54 tokens, so 20 exercises the span merge).

_DUPSPAN_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents),
    grams AS (SELECT doc_id, i - 1 AS pos,
              (('0x'||substr(md5(array_to_string(tk[i:i+19],',')),1,15))::BIGINT) AS h
              FROM (SELECT doc_id, tk, unnest(range(1, len(tk)-20+2)) AS i
                    FROM toks WHERE len(tk) >= 20)),
    dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
    hits AS (SELECT doc_id, pos FROM grams SEMI JOIN dup USING (h)),
    m AS (SELECT doc_id, pos,
          max(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
          FROM hits),
    g AS (SELECT doc_id, pos,
          sum(CASE WHEN pe IS NULL OR pos > pe THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m),
    spans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 20 AS span_end,
              max(pos) + 20 - min(pos) AS n_dup_tok
              FROM g GROUP BY doc_id, grp)
"""


@_q(
    "dup_spans",
    _DUPSPAN_SQL
    + """
    SELECT doc_id, span_start::INT AS span_start, span_end::INT AS span_end,
           n_dup_tok::INT AS n_dup_tok
    FROM spans
    """,
)
def q_dup_spans(spark, sf):
    from vector_spark.training.tokens import duplicated_spans

    return duplicated_spans(_tok_corpus(spark, sf), window=20)


@_q(
    "dup_span_stats",
    _DUPSPAN_SQL
    + f"""
    SELECT t.doc_id, len(t.tk)::INT AS n_tok,
           coalesce(s.dup, 0)::INT AS dup_tok,
           round(coalesce(s.dup, 0) / len(t.tk), 6) AS dup_tok_frac
    FROM toks t
    LEFT JOIN (SELECT doc_id, sum(n_dup_tok) AS dup FROM spans GROUP BY doc_id) s
      ON s.doc_id = t.doc_id
    """,
)
def q_dup_span_stats(spark, sf):
    from vector_spark.training.tokens import dup_span_stats

    return dup_span_stats(_tok_corpus(spark, sf), window=20)


@_q(
    "dup_span_removal",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents),
    grams AS (SELECT doc_id, i - 1 AS pos,
              (('0x'||substr(md5(array_to_string(tk[i:i+19],',')),1,15))::BIGINT) AS h
              FROM (SELECT doc_id, tk, unnest(range(1, len(tk)-20+2)) AS i
                    FROM toks WHERE len(tk) >= 20)),
    canon AS (SELECT h, min(struct_pack(d := doc_id, p := pos)) AS c
              FROM grams GROUP BY h HAVING count(*) > 1),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN canon ON canon.h = g.h
             WHERE NOT (g.doc_id = canon.c.d AND g.pos = canon.c.p)),
    m AS (SELECT doc_id, pos,
          max(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
          FROM hits),
    grp AS (SELECT doc_id, pos,
            sum(CASE WHEN pe IS NULL OR pos > pe THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM m),
    spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 20 AS e
              FROM grp GROUP BY doc_id, g),
    posn AS (SELECT doc_id, unnest(tk) AS tok,
                    unnest(range(len(tk))) AS pos FROM toks),
    kept AS (SELECT p.doc_id, p.tok, p.pos
             FROM posn p LEFT JOIN spans sp
               ON sp.doc_id = p.doc_id AND p.pos >= sp.s AND p.pos < sp.e
             WHERE sp.doc_id IS NULL),
    outt AS (SELECT doc_id, list(tok ORDER BY pos) AS tokens
             FROM kept GROUP BY doc_id)
    SELECT t.doc_id, coalesce(o.tokens, []) AS tokens,
           coalesce(len(o.tokens), 0)::INT AS n_tok,
           (len(t.tk) - coalesce(len(o.tokens), 0))::INT AS n_removed
    FROM toks t LEFT JOIN outt o USING (doc_id)
    """,
)
def q_dup_span_removal(spark, sf):
    from vector_spark.training.tokens import remove_duplicated_spans

    return remove_duplicated_spans(_tok_corpus(spark, sf), window=20)


# ---- unigram-LM quality score (CCNet / Wenzek et al. 2020 shape) -----


@_q(
    "unigram_nll",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOK_SQL}) AS token FROM documents),
    freq AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    tot AS (SELECT sum(n)::DOUBLE AS total FROM freq),
    lp AS (SELECT token, ln(n / (SELECT total FROM tot)) AS logp FROM freq)
    SELECT t.doc_id, count(*)::INT AS n_tok,
           round(-avg(lp.logp), 6) AS avg_nll,
           round(exp(-avg(lp.logp)), 6) AS ppl
    FROM toks t JOIN lp ON lp.token = t.token
    GROUP BY t.doc_id
    """,
)
def q_unigram_nll(spark, sf):
    from vector_spark.training.tokens import unigram_logprob

    return unigram_logprob(_tok_corpus(spark, sf))


# ---- deterministic train/val/test split -------------------------------


@_q(
    "split_corpus",
    """
    SELECT doc_id, text, lang, source, n_chars,
           CASE WHEN ('0x'||substr(md5('0:'||doc_id::VARCHAR),1,15))::BIGINT
                     % 1000000 < 900000 THEN 'train'
                WHEN ('0x'||substr(md5('0:'||doc_id::VARCHAR),1,15))::BIGINT
                     % 1000000 < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_split_corpus(spark, sf):
    from vector_spark.training.mix import split_corpus

    return split_corpus(
        _t(spark, sf, "documents"), {"train": 0.9, "val": 0.05, "test": 0.05}, seed=0
    )


# ---- per-source length distribution ------------------------------------


@_q(
    "length_stats",
    f"""
    WITH n AS (SELECT source, len({_TOK_SQL})::DOUBLE AS nt FROM documents)
    SELECT source, count(*) AS n_docs, round(avg(nt), 6) AS mean_tok,
           round(quantile_cont(nt, 0.5), 6) AS p50,
           round(quantile_cont(nt, 0.9), 6) AS p90,
           round(quantile_cont(nt, 0.99), 6) AS p99
    FROM n GROUP BY source
    """,
)
def q_length_stats(spark, sf):
    from vector_spark.training.tokens import derive_tokens, length_stats

    docs = _t(spark, sf, "documents")
    corpus = docs.select("source", derive_tokens(F.col("text")).alias("tokens"))
    return length_stats(corpus)


# ---- per-source KL divergence from the corpus mix ----------------------


@_q(
    "source_kl",
    f"""
    WITH toks AS (SELECT source, unnest({_TOK_SQL}) AS token FROM documents),
    st AS (SELECT source, token, count(*) AS sn FROM toks GROUP BY 1, 2),
    ct AS (SELECT token, sum(sn) AS cn FROM st GROUP BY token),
    tt AS (SELECT source, sum(sn) AS st_tot FROM st GROUP BY source),
    g AS (SELECT sum(cn)::DOUBLE AS ct_tot, count(*)::DOUBLE AS v FROM ct),
    grid AS (SELECT t.source, t.st_tot, c.token, c.cn, coalesce(s.sn, 0) AS sn
             FROM tt t CROSS JOIN ct c
             LEFT JOIN st s ON s.source = t.source AND s.token = c.token)
    SELECT source, max(st_tot)::BIGINT AS n_tok,
           round(sum(((sn + 1.0) / (st_tot + (SELECT v FROM g)))
                     * ln(((sn + 1.0) / (st_tot + (SELECT v FROM g)))
                          / ((cn + 1.0) / ((SELECT ct_tot FROM g)
                                           + (SELECT v FROM g))))), 6) AS kl
    FROM grid GROUP BY source
    """,
)
def q_source_kl(spark, sf):
    from vector_spark.training.tokens import derive_tokens, source_kl_divergence

    docs = _t(spark, sf, "documents")
    corpus = docs.select("source", derive_tokens(F.col("text")).alias("tokens"))
    return source_kl_divergence(corpus)


# ---- deterministic epoch shuffle (loader-side) ------------------------


@_q(
    "epoch_shuffle",
    """
    SELECT doc_id,
           ('0x'||substr(md5('7:' || doc_id::VARCHAR),1,15))::BIGINT AS shuffle_key
    FROM documents
    """,
)
def q_epoch_shuffle(spark, sf):
    from vector_spark.training.packing import epoch_shuffle

    docs = _t(spark, sf, "documents").select("doc_id")
    return epoch_shuffle(docs, seed=7, id_col="doc_id", partitions=8)


# ---- PMI collocations (Church & Hanks 1990) ---------------------------


@_q(
    "pmi_bigrams",
    f"""
    WITH toks AS (SELECT {_TOK_SQL} AS tk FROM documents),
    pairs AS (SELECT tk[i] AS tok_a, tk[i+1] AS tok_b
              FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                    FROM toks WHERE len(tk) >= 2)),
    pn AS (SELECT tok_a, tok_b, count(*) AS n_pair FROM pairs GROUP BY 1, 2),
    uc AS (SELECT token, count(*) AS n
           FROM (SELECT unnest(tk) AS token FROM toks) GROUP BY token),
    pt AS (SELECT sum(n_pair)::DOUBLE AS t FROM pn),
    ut AS (SELECT sum(n)::DOUBLE AS t FROM uc)
    SELECT p.tok_a, p.tok_b, p.n_pair,
           round(ln((p.n_pair / (SELECT t FROM pt))
                    / ((a.n / (SELECT t FROM ut))
                       * (b.n / (SELECT t FROM ut)))), 6) AS pmi
    FROM pn p JOIN uc a ON a.token = p.tok_a JOIN uc b ON b.token = p.tok_b
    WHERE p.n_pair >= 5
    ORDER BY pmi DESC, tok_a, tok_b LIMIT 100
    """,
)
def q_pmi_bigrams(spark, sf):
    from vector_spark.training.tokens import pmi_bigrams

    return pmi_bigrams(_tok_corpus(spark, sf), k=100, min_count=5)


# ---- per-source vocabulary profile -----------------------------------


@_q(
    "vocab_stats",
    f"""
    WITH toks AS (SELECT source, unnest({_TOK_SQL}) AS token FROM documents),
    v AS (SELECT source, count(DISTINCT token) AS n_vocab, count(*) AS n_tok
          FROM toks GROUP BY source),
    d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT d.source, d.n_docs, v.n_tok, v.n_vocab,
           round(v.n_vocab / v.n_tok, 6) AS ttr
    FROM d JOIN v USING (source)
    """,
)
def q_vocab_stats(spark, sf):
    from vector_spark.training.tokens import derive_tokens, vocab_stats

    docs = _t(spark, sf, "documents")
    corpus = docs.select("source", derive_tokens(F.col("text")).alias("tokens"))
    return vocab_stats(corpus)


# ---- interpolated bigram-LM quality score (CCNet perplexity shape) ---


@_q(
    "bigram_nll",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents),
    pairs AS (SELECT doc_id, tk[i] AS prev, tk[i+1] AS cur
              FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                    FROM toks WHERE len(tk) >= 2)),
    uni AS (SELECT unnest(tk) AS token FROM toks),
    un AS (SELECT token, count(*) AS n FROM uni GROUP BY token),
    tot AS (SELECT sum(n)::DOUBLE AS t FROM un),
    big AS (SELECT prev, cur, count(*) AS bn FROM pairs GROUP BY prev, cur)
    SELECT p.doc_id, count(*)::INT AS n_big,
           round(-avg(ln(0.75 * b.bn / up.n
                         + 0.25 * (uc.n / (SELECT t FROM tot)))), 6) AS avg_nll,
           round(exp(-avg(ln(0.75 * b.bn / up.n
                             + 0.25 * (uc.n / (SELECT t FROM tot))))), 6) AS ppl
    FROM pairs p
    JOIN big b ON b.prev = p.prev AND b.cur = p.cur
    JOIN un up ON up.token = p.prev
    JOIN un uc ON uc.token = p.cur
    GROUP BY p.doc_id
    """,
)
def q_bigram_nll(spark, sf):
    from vector_spark.training.tokens import bigram_logprob

    return bigram_logprob(_tok_corpus(spark, sf), lam=0.75)


# ---- domain-mix temperature resampling (multilingual-LM mixing) ------

_MIX_RATES_SQL = """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT sum(n)::DOUBLE AS tot FROM c),
    w AS (SELECT lang, n, n / (SELECT tot FROM t) AS share,
                 pow(n / (SELECT tot FROM t), 0.5) AS w FROM c),
    s AS (SELECT sum(w) AS sw, min(n / w) AS k FROM w),
    r AS (SELECT lang, n, round(share, 6) AS share,
                 round(w / (SELECT sw FROM s), 6) AS target_share,
                 round(least(1.0, (SELECT k FROM s) * w / n), 6) AS keep_rate
          FROM w)
"""


@_q("domain_mix_rates", _MIX_RATES_SQL + "SELECT * FROM r")
def q_domain_mix_rates(spark, sf):
    from vector_spark.training.mix import domain_mix_rates

    return domain_mix_rates(_t(spark, sf, "documents"), alpha=0.5, source_col="lang")


@_q(
    "domain_mix_sample",
    _MIX_RATES_SQL
    + """
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, r.keep_rate
    FROM documents d JOIN r USING (lang)
    WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 1000000
          < round(keep_rate * 1000000)
    """,
)
def q_domain_mix_sample(spark, sf):
    from vector_spark.training.mix import domain_mix_resample

    return domain_mix_resample(_t(spark, sf, "documents"), alpha=0.5, source_col="lang")


# ---- SemDeDup semantic dedup (Abbas et al. 2023) ---------------------
# k=16 md5-seeded cells over the 64-dim embeddings; within-cell pairs
# only; dup = some smaller-id neighbor with cosine >= 0.35.


@_q(
    "semantic_dedup",
    """
    WITH cents AS (
      SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cvec,
             row_number() OVER (
               ORDER BY ('0x'||substr(md5(vec_id::VARCHAR),1,15))::BIGINT,
                        vec_id) AS rk
      FROM embeddings QUALIFY rk <= 16),
    assigned AS (
      SELECT e.vec_id, e.embedding, c.cell_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 4)
                          DESC,
                        c.cell_id) AS ark
      FROM embeddings e CROSS JOIN cents c QUALIFY ark = 1),
    stats AS (
      SELECT a.vec_id,
             max(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])) AS mc,
             max(CASE WHEN b.vec_id < a.vec_id
                       AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                           >= 0.35 THEN 1 ELSE 0 END) AS dup
      FROM assigned a JOIN assigned b
        ON a.cell_id = b.cell_id AND a.vec_id != b.vec_id
      GROUP BY a.vec_id)
    SELECT a.vec_id, a.cell_id, round(s.mc, 4) AS max_cos,
           coalesce(s.dup = 1, false) AS is_dup
    FROM assigned a LEFT JOIN stats s USING (vec_id)
    """,
    scale_class="baseline",
)
def q_semantic_dedup(spark, sf):
    from vector_spark.training.similarity import semantic_dedup

    return semantic_dedup(_t(spark, sf, "embeddings"), n_cells=16, threshold=0.35)


# ---- DSIR importance resampling (Xie et al. 2023) --------------------
# Hashed-bigram bag log importance weights: target = the lang='en'
# slice, raw = the whole corpus; 10k buckets, add-one smoothing.

_DSIR_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOK_SQL} AS tk FROM documents),
    rawf AS (SELECT doc_id,
             (('0x'||substr(md5(array_to_string(tk[i:i+1],',')),1,15))::BIGINT
              % 10000) AS bucket
             FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                   FROM toks WHERE len(tk) >= 2)),
    tgtf AS (SELECT bucket FROM rawf JOIN documents USING (doc_id)
             WHERE lang = 'en'),
    q AS (SELECT bucket, count(*) AS qn FROM rawf GROUP BY bucket),
    p AS (SELECT bucket, count(*) AS pn FROM tgtf GROUP BY bucket),
    qt AS (SELECT sum(qn)::DOUBLE AS t FROM q),
    pt AS (SELECT coalesce(sum(pn), 0)::DOUBLE AS t FROM p),
    r AS (SELECT q.bucket,
            ln((coalesce(p.pn, 0) + 1.0) / ((SELECT t FROM pt) + 10000.0))
          - ln((q.qn + 1.0) / ((SELECT t FROM qt) + 10000.0)) AS log_ratio
          FROM q LEFT JOIN p USING (bucket)),
    w AS (SELECT f.doc_id, count(*)::INT AS n_feat,
                 round(sum(r.log_ratio), 6) AS logw
          FROM rawf f JOIN r USING (bucket) GROUP BY f.doc_id),
    wfull AS (SELECT d.doc_id, coalesce(w.n_feat, 0)::INT AS n_feat,
                     coalesce(w.logw, 0.0) AS logw
              FROM documents d LEFT JOIN w USING (doc_id))
"""


@_q("dsir_weights", _DSIR_SQL + "SELECT * FROM wfull")
def q_dsir_weights(spark, sf):
    from vector_spark.training.dsir import dsir_log_weights

    docs = _t(spark, sf, "documents")
    from vector_spark.training.tokens import derive_tokens

    raw = docs.select("doc_id", derive_tokens(F.col("text")).alias("tokens"))
    target = docs.where(F.col("lang") == "en").select(
        "doc_id", derive_tokens(F.col("text")).alias("tokens")
    )
    return dsir_log_weights(raw, target)


@_q(
    "dsir_select",
    _DSIR_SQL
    + """
    SELECT doc_id, logw,
           round(logw + -ln(-ln(
             ((('0x'||substr(md5('gumbel:' || doc_id::VARCHAR),1,15))::BIGINT
               % 1000000) + 0.5) / 1000000.0)), 6) AS key
    FROM wfull ORDER BY key DESC, doc_id LIMIT 200
    """,
)
def q_dsir_select(spark, sf):
    from vector_spark.training.dsir import dsir_select
    from vector_spark.training.tokens import derive_tokens

    docs = _t(spark, sf, "documents")
    raw = docs.select("doc_id", derive_tokens(F.col("text")).alias("tokens"))
    target = docs.where(F.col("lang") == "en").select(
        "doc_id", derive_tokens(F.col("text")).alias("tokens")
    )
    return dsir_select(raw, target, n_keep=200)


# ---- VRL source-text compiler (remap.rs:21-29 `source`; round 5) -----
# A real multi-statement VRL program — paths, arithmetic with ok/err
# capture, a dynamic parse_json + member access, if/else-if lanes,
# string building, del — compiled by vector_spark.vrl into ONE
# declarative select (no per-row Python; see test_vrl.py codegen pin).

_VRL_PROGRAM = """
.value_cents = .value * 100
.q, .qerr = .value / .value
.k = to_int!(parse_json!(.props).k)
if .event_type == "error" { .lane = "alert" }
else if .value >= 50.0 { .lane = "review" }
else { .lane = "ok" }
.tag = upcase(.event_type) + "-" + to_string(.user_id)
del(.props)
"""


@_q(
    "vrl_compile",
    """
    SELECT event_id,
           round(value * 100, 4) AS value_cents,
           CASE WHEN coalesce(value, 0) = 0 THEN 0.0 ELSE round(value / value, 4) END AS q,
           CASE WHEN coalesce(value, 0) = 0 THEN 'can''t divide by zero' END AS qerr,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN event_type = 'error' THEN 'alert'
                WHEN value >= 50.0 THEN 'review'
                ELSE 'ok' END AS lane,
           upper(event_type) || '-' || CAST(user_id AS VARCHAR) AS tag
    FROM events
    """,
)
def q_vrl_compile(spark, sf):
    from vector_spark.vrl import compile_program

    ev = _t(spark, sf, "events")
    out = compile_program(_VRL_PROGRAM).apply(ev)
    return out.select(
        "event_id",
        F.round("value_cents", 4).alias("value_cents"),
        F.round("q", 4).alias("q"),
        "qerr", "k", "lane", "tag",
    )


# The round-5 stdlib tail as VRL source: kind predicates, match_any,
# folded to_regex + dynamic match(), object encoders, percent codec,
# get() path walk, match_datadog_query, only_fields — one program, one
# declarative select, DuckDB-oracled.
_VRL_TAIL_PROGRAM = """
.is_click = is_string(.event_type) && match_any(.event_type, [r'^click', r'^purchase'])
.uid_odd = is_integer(.user_id) && .user_id % 2 == 1
obj = {"et": .event_type, "uid": .user_id}
.lf = encode_logfmt(obj)
.kv = encode_key_value(obj, field_delimiter: "|", key_value_delimiter: ":")
.enc = encode_percent(.event_type + " x")
rx = to_regex!("^s")
.srx = match(.event_type, rx)
.dd = match_datadog_query(., "event_type:click* AND @value:>50")
.leaf = get!({"a": {"b": .event_type}}, ["a", "b"])
only_fields(["event_id", "is_click", "uid_odd", "lf", "kv", "enc", "srx", "dd", "leaf"])
"""


@_q(
    "vrl_stdlib_tail",
    """
    SELECT event_id,
           coalesce(regexp_matches(event_type, '^click')
                    OR regexp_matches(event_type, '^purchase'), false) AS is_click,
           coalesce(user_id IS NOT NULL AND (user_id % 2) = 1, false) AS uid_odd,
           'et=' || event_type || ' uid=' || CAST(user_id AS VARCHAR) AS lf,
           'et:' || event_type || '|uid:' || CAST(user_id AS VARCHAR) AS kv,
           replace(event_type || ' x', ' ', '%20') AS enc,
           regexp_matches(event_type, '^s') AS srx,
           coalesce(event_type LIKE 'click%' AND value > 50.0, false) AS dd,
           event_type AS leaf
    FROM events
    """,
)
def q_vrl_stdlib_tail(spark, sf):
    from vector_spark.vrl import compile_program

    ev = _t(spark, sf, "events")
    return compile_program(_VRL_TAIL_PROGRAM).apply(ev)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def scale_class() -> dict[str, dict]:
    """Per-query scale metadata: {"class": "linear"|"baseline",
    "linear_twin": ...} — baseline = quadratic-by-design verification
    twin, with the production-scale path it oracles named."""
    out = {}
    for name, cls in _SCALE_CLASS.items():
        meta = {"class": cls}
        if cls == "baseline":
            meta["linear_twin"] = _BASELINE_TWIN[name]
        out[name] = meta
    return out
