"""Cipher sessions: FLASHE, Paillier/BFV/CKKS baselines, DH, AES host ops."""
