from vector_spark.sinks.checkpoint import CheckpointManager, run_with_checkpoint

__all__ = ["CheckpointManager", "run_with_checkpoint"]
