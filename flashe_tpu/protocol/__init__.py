"""Secure-aggregation protocol: role syncs, cipher session blocks, the
aggregation engine."""
