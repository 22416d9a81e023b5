"""Per-scheme cipher session setup blocks (reference jzf_*_block.py)."""
