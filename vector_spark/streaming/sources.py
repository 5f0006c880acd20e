"""Push-style streaming sources.

Vector's `socket` source (/root/reference/src/sources/socket.rs) accepts
newline-framed byte streams over TCP and emits one event per line, with
decoding handled by the shared framing/codec layer. Spark ships the same
data path natively: the `socket` streaming source delivers one row per
newline-framed line, and this repo's framing/codec surface
(functions/framing.py, functions/parse.py) applies downstream exactly as
it does for file sources.

Direction note (documented divergence): Vector LISTENS for producers;
Spark's socket source CONNECTS to one. The data path — framed TCP bytes
→ events → transforms — is identical, but a fan-in listener needs a
broker in front on Spark (which is precisely Vector's own guidance for
its `vector`/`kafka` sources at scale). The socket source also has no
replay/offsets, so it is a dev/debug tap here, as upstream documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def socket_text_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """One streaming row per newline-framed line from host:port, column
    `value: string` — feed it to the same parse → route → aggregate
    stages as any file stream."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
