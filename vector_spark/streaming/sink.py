"""Streaming → table sink bridge: micro-batches through TableSink.

Vector's sinks consume an event stream with at-least-once delivery and
acks (lib/vector-core buffers/finalizers); the Spark analogue is
Structured Streaming's checkpointed micro-batch loop feeding the same
`TableSink` abstraction the batch pipeline writes through
(vector_spark.sinks.writer):

    q = stream_to_table(df, ParquetSink(), out_dir,
                        partition_by=["source"], checkpoint=ckpt_dir)

Semantics: the streaming checkpoint gives exactly-once *batch ids*, so
the default `mode="append"` never re-commits a completed batch and —
like the reference's at-least-once sinks — never discards rows earlier
batches wrote. `mode="overwrite_partitions"` is an explicit opt-in for
the partition-complete-batch pattern (Iceberg `overwritePartitions` /
dynamic partition overwrite, the batch-checkpoint contract in
sinks/checkpoint.py): a replayed batch is fully idempotent, BUT each
batch DELETES whatever earlier batches wrote to the partitions it
touches. With a recurring partition key (e.g. 'source') and a backlog
split across micro-batches (availableNow + maxFilesPerTrigger) that
silently drops data — only opt in when every partition is complete
within one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_spark.sinks.writer import TableSink


def stream_to_table(
    stream_df: DataFrame,
    sink: TableSink,
    dest: str,
    partition_by: list[str] | None = None,
    checkpoint: str | None = None,
    mode: str = "append",
    trigger_available_now: bool = True,
    query_name: str = "vector_sink",
    output_mode: str = "append",
):
    """Start a streaming query writing each micro-batch via `sink`.

    `output_mode` is the streaming semantics (what rows reach each
    micro-batch): "append" emits each finalized row exactly once (the
    default — for stateful upstream stages like a watermarked aggregate
    this means a window row arrives only after the watermark closes it);
    "update" re-emits a changed aggregate row per batch and is only
    sound against an upsert-capable `sink` (re-appending updates would
    duplicate keys in a plain parquet sink)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if mode == "append":
            w = batch_df.write.mode("append")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(dest)
        else:
            sink.write(batch_df, dest, partition_by)

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .queryName(query_name)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_to_socket(
    stream_df: DataFrame,
    host: str,
    port: int,
    checkpoint: str,
    value_col: str = "value",
    trigger_available_now: bool = True,
):
    """Vector `socket` sink (/root/reference/src/sinks/socket.rs):
    events leave as newline-framed lines over TCP.

    Distributed shape: foreachBatch → foreachPartition — every
    partition opens its own executor-side connection (the analogue of
    the reference sink's connection handling), so no row ever collects
    to the driver. Delivery is at-least-once (raw TCP carries no acks;
    a retried batch re-sends), exactly the reference socket sink's
    contract. Encode the event into `value_col` upstream with the
    shared codec layer.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        def send(rows) -> None:
            import socket as pysocket

            conn = None
            try:
                for row in rows:
                    if conn is None:  # connect lazily: empty partitions stay silent
                        conn = pysocket.create_connection((host, port), timeout=30)
                    conn.sendall((row[0] + "\n").encode())
            finally:
                if conn is not None:
                    conn.close()

        df.select(value_col).foreachPartition(send)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
