"""Native C++ packing vs the numpy reference layout."""

import numpy as np
import pytest

from flashe_tpu import native
from flashe_tpu.ops import pack
from flashe_tpu.ops.lanes import ints_to_lanes, lanes_to_ints


@pytest.mark.parametrize("int_bits", [16, 20, 27, 32, 120])
def test_native_matches_numpy(int_bits):
    if not native.available():
        pytest.skip("native helper unavailable (no g++)")
    rng = np.random.RandomState(0)
    n = 101
    vals = [rng.randint(0, 1 << min(int_bits, 62)) for _ in range(n)]
    lanes = ints_to_lanes(np.array(vals, dtype=object), int_bits)

    fast = native.pack_lanes(lanes, int_bits)
    # numpy reference layout
    bits = pack._lane_bits_msb_first(lanes, int_bits)
    padlen = (-bits.size) % 8
    ref_bits = np.concatenate([np.zeros(padlen, np.uint8), bits.reshape(-1)])
    ref = np.packbits(ref_bits).tobytes()
    assert fast == ref

    back = native.unpack_lanes(fast, n, int_bits,
                               lanes.shape[-1] if lanes.ndim > 1 else 1)
    np.testing.assert_array_equal(
        lanes_to_ints(back, int_bits).reshape(-1),
        np.array(vals, dtype=object))


def test_pack_module_uses_native_transparently():
    rng = np.random.RandomState(1)
    lanes = rng.randint(0, 1 << 20, 333).astype(np.uint32)
    data = pack.pack_lanes(lanes, 20)
    back = pack.unpack_lanes(data, 333, 20)
    np.testing.assert_array_equal(back, lanes)
    assert int.from_bytes(data, "big") == pack.pack_ints_reference(lanes, 20)
