from pgs_spark.streaming.checkpoint import CheckpointManager  # noqa: F401
