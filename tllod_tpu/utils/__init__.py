"""Training utilities: optimizer, checkpointing, logging, profiling."""
