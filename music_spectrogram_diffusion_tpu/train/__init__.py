"""Training: optimizer, sharded train step, checkpointing, metrics."""
