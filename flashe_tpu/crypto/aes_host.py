"""Host-side AES for key wrapping and PRP oracles.

Mirrors the reference AESCipher (federatedml/secureprotol/jzf_aes.py):
AES-256 in ECB (PRP evaluation) or CTR with a zero initial counter (seed
wrapping in transit), with the same key-derivation rule for int/bytes
secrets.  Backed by the `cryptography` library (the reference uses
PyCryptodome; both are NIST AES).
"""

from __future__ import annotations

import os

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

__all__ = ["AESCipher", "derive_key_bytes"]


def derive_key_bytes(secret, key_len_bytes: int) -> bytes:
    """Mask an int or bytes secret to the key length (jzf_aes.py:21-28)."""
    if isinstance(secret, bytes):
        secret = int.from_bytes(secret, "big")
    return (int(secret) & (256 ** key_len_bytes - 1)).to_bytes(
        key_len_bytes, "big"
    )


class AESCipher:
    """AES with ECB or CTR(initial_value=0) modes (jzf_aes.py:14-48)."""

    def __init__(self):
        self.key = None
        self._mode = None
        self._enc = None
        self._dec = None

    def generate_key(self, key_length: int = 256, assigned_key=None,
                     mode: str = "CTR"):
        nbytes = key_length // 8
        if assigned_key is None:
            key = os.urandom(nbytes)
        else:
            key = derive_key_bytes(assigned_key, nbytes)
        self.key = key
        self._mode = mode
        if mode == "CTR":
            nonce = (0).to_bytes(16, "big")
            self._enc = Cipher(algorithms.AES(key), modes.CTR(nonce)).encryptor()
            self._dec = Cipher(algorithms.AES(key), modes.CTR(nonce)).decryptor()
        elif mode == "ECB":
            self._enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
            self._dec = Cipher(algorithms.AES(key), modes.ECB()).decryptor()
        else:
            raise ValueError(f"unsupported AES mode {mode}")

    def encrypt(self, plaintext: bytes) -> bytes:
        return self._enc.update(plaintext)

    def decrypt(self, ciphertext: bytes) -> bytes:
        return self._dec.update(ciphertext)

    def get_key(self) -> bytes:
        return self.key
