"""Quantization: ACIQ clipping and the role-split quantizer."""
