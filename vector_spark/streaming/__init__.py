from vector_spark.streaming.pipeline import (
    streaming_aggregate,
    streaming_dedupe,
    streaming_parse_aggregate,
    streaming_token_frequencies,
)
from vector_spark.streaming.sink import stream_to_socket, stream_to_table
from vector_spark.streaming.http_spool import HttpSpoolServer, http_spool_stream
from vector_spark.streaming.sources import socket_text_source
from vector_spark.streaming.tag_cardinality import streaming_tag_cardinality_limit

__all__ = [
    "streaming_aggregate",
    "streaming_dedupe",
    "streaming_parse_aggregate",
    "streaming_token_frequencies",
    "streaming_tag_cardinality_limit",
    "stream_to_table",
    "stream_to_socket",
    "socket_text_source",
    "HttpSpoolServer",
    "http_spool_stream",
]
