"""Multi-chip execution: device meshes and sharded encrypted aggregation."""
