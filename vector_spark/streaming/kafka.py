"""Kafka source/sink wiring (compile-level).

Mirrors the reference's kafka components:
  source /root/reference/src/sources/kafka.rs (bootstrap_servers,
         topics, group_id, auto_offset_reset, key_field + topic/
         partition/offset metadata keys)
  sink   /root/reference/src/sinks/kafka/config.rs (bootstrap_servers,
         topic, key_field, encoding)

Spark ships a first-class Kafka connector (Structured Streaming's
`format("kafka")`), so unlike the 45 vendor HTTP sinks there is nothing
to re-implement — only config translation. This sandbox has NO Kafka
connector jars and no broker, so the runtime path is
environment-blocked: building the plan raises EnvironmentBlocked with
an honest message, `run_config.py --validate` reports the config as
valid-but-blocked, and the option-translation layer (the part with real
logic) is pure and unit-tested without a broker.

On a real cluster (`--packages org.apache.spark:spark-sql-kafka-0-10_*`)
the same builders produce the standard scale-correct plan: source
parallelism follows Kafka partitions 1:1, offsets live in the streaming
checkpoint (exactly-once with idempotent sinks), and `maxOffsetsPerTrigger`
is the backpressure dial — Vector's buffer/ack machinery maps onto
Spark's own offset tracking rather than being re-built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EnvironmentBlocked(RuntimeError):
    """The config is valid and fully wired, but this environment lacks
    the runtime dependency (connector jars / broker)."""


def kafka_reader_options(cfg: dict) -> dict[str, str]:
    """Reference kafka-source config → Spark reader options
    (kafka.rs:KafkaSourceConfig fields)."""
    opts = {
        "kafka.bootstrap.servers": cfg["bootstrap_servers"],
        "subscribe": ",".join(cfg["topics"]) if isinstance(cfg.get("topics"), list)
        else cfg["topics"],
        "startingOffsets": {
            "beginning": "earliest", "earliest": "earliest",
            "end": "latest", "latest": "latest",
        }.get(str(cfg.get("auto_offset_reset", "beginning")).lower(), "earliest"),
        # in-flight bound → backpressure dial (buffering is Spark-side)
        "maxOffsetsPerTrigger": str(cfg.get("max_offsets_per_trigger", 100000)),
    }
    if cfg.get("group_id"):
        opts["kafka.group.id"] = cfg["group_id"]
    for k, v in (cfg.get("librdkafka_options") or {}).items():
        opts[f"kafka.{k}"] = str(v)
    return opts


def kafka_writer_options(cfg: dict) -> dict[str, str]:
    """Reference kafka-sink config → Spark writer options."""
    opts = {
        "kafka.bootstrap.servers": cfg["bootstrap_servers"],
        "topic": cfg["topic"],
    }
    if cfg.get("checkpoint"):
        opts["checkpointLocation"] = cfg["checkpoint"]
    for k, v in (cfg.get("librdkafka_options") or {}).items():
        opts[f"kafka.{k}"] = str(v)
    return opts


def decode_kafka_records(raw: DataFrame, cfg: dict) -> DataFrame:
    """Kafka wire records → events: value bytes become `message`, the
    key lands under key_field, and topic/partition/offset/timestamp ride
    along as the reference's metadata keys (kafka.rs:add_metadata)."""
    key_field = cfg.get("key_field", "message_key")
    return raw.select(
        F.col("value").cast("string").alias("message"),
        F.col("key").cast("string").alias(key_field),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_timestamp"),
    )


def encode_kafka_records(df: DataFrame, cfg: dict) -> DataFrame:
    """Events → Kafka wire records: encoding.codec json (default) or
    text (a named field), key from key_field when present."""
    enc = cfg.get("encoding", {})
    codec = enc.get("codec", "json") if isinstance(enc, dict) else str(enc)
    if codec == "json":
        value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    elif codec in ("text", "raw_message"):
        field = enc.get("field", "message") if isinstance(enc, dict) else "message"
        value = F.col(field).cast("string")
    else:
        raise ValueError(f"unsupported kafka encoding codec {codec!r}")
    cols = [value.alias("value")]
    key_field = cfg.get("key_field")
    if key_field:
        cols.insert(0, F.col(key_field).cast("string").alias("key"))
    return df.select(*cols)


def _provider_missing(exc: Exception) -> bool:
    s = str(exc)
    return "Failed to find data source" in s or "DATA_SOURCE_NOT_FOUND" in s


def kafka_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """readStream.format("kafka") with the translated options; raises
    EnvironmentBlocked when the connector jars are absent (this
    sandbox), so --validate can report the honest state."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(cfg).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:
        if _provider_missing(e):
            raise EnvironmentBlocked(
                "kafka source is wired but environment-blocked: the Spark "
                "Kafka connector jars (spark-sql-kafka-0-10) are not in this "
                "image and no broker is reachable; on a real cluster pass "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
            ) from e
        raise
    return decode_kafka_records(raw, cfg)


def kafka_sink(df: DataFrame, cfg: dict):
    """writeStream/write .format("kafka") with the translated options;
    same EnvironmentBlocked contract."""
    encoded = encode_kafka_records(df, cfg)
    try:
        if encoded.isStreaming:
            writer = encoded.writeStream.format("kafka")
            for k, v in kafka_writer_options(cfg).items():
                writer = writer.option(k, v)
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return "written"
        writer = encoded.write.format("kafka")
        for k, v in kafka_writer_options(cfg).items():
            writer = writer.option(k, v)
        writer.save()
        return "written"
    except Exception as e:
        if _provider_missing(e):
            raise EnvironmentBlocked(
                "kafka sink is wired but environment-blocked: connector jars "
                "absent (see streaming/kafka.py docstring)"
            ) from e
        raise
