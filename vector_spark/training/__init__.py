"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

from vector_spark.training import dedup, multimodal, similarity, text  # noqa: F401
