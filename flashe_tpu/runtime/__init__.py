"""Runtime: job configs, role runner, tracking/profiling, checkpointing."""
