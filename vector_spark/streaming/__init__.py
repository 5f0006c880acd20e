from vector_spark.streaming.pipeline import (
    streaming_aggregate,
    streaming_dedupe,
    streaming_parse_aggregate,
)

__all__ = ["streaming_aggregate", "streaming_dedupe", "streaming_parse_aggregate"]
