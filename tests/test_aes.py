"""AES-256 bit-exactness tests against the `cryptography` library oracle.

The oracle plays the role of PyCryptodome in the reference
(federatedml/secureprotol/jzf_aes.py:31-34 — AES-256-ECB).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from flashe_tpu.ops import aes


def _oracle_ecb(key: bytes, blocks: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(blocks) + enc.finalize()


def test_sbox_circuit_matches_table():
    x = jnp.arange(256, dtype=jnp.int32)
    circuit = np.asarray(aes.sbox_circuit(x))
    np.testing.assert_array_equal(circuit, aes.SBOX.astype(np.int32))


def test_sbox_table_is_standard():
    # spot-check canonical values of the AES S-box
    assert aes.SBOX[0x00] == 0x63
    assert aes.SBOX[0x01] == 0x7C
    assert aes.SBOX[0x53] == 0xED
    assert aes.SBOX[0xFF] == 0x16


@pytest.mark.parametrize("use_circuit", [True, False])
def test_aes256_ecb_matches_oracle(use_circuit):
    rng = np.random.RandomState(0)
    key = bytes(rng.randint(0, 256, 32, dtype=np.uint8))
    n = 37
    pt = rng.randint(0, 256, (n, 16), dtype=np.uint8)

    expected = np.frombuffer(
        _oracle_ecb(key, pt.tobytes()), dtype=np.uint8
    ).reshape(n, 16)

    rk = aes.key_schedule(key)
    got = jax.jit(
        lambda b: aes.aes_encrypt_blocks(b, rk.astype(np.int32), use_circuit)
    )(jnp.asarray(pt.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint8), expected)


def test_aes256_fips_vector():
    # FIPS-197 appendix C.3 test vector
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    expected = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rk = aes.key_schedule(key)
    got = aes.aes_encrypt_blocks(
        jnp.asarray(np.frombuffer(pt, np.uint8).astype(np.int32))[None, :],
        rk.astype(np.int32),
    )
    assert bytes(np.asarray(got, dtype=np.uint8)[0].tobytes()) == expected
