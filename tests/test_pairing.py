"""Szudzik pairing tests (ports reference tests/test_pairing.py + adds
vectorized round-trips)."""

import numpy as np

from attpc_engine_tpu.ops.pairing import pair, unpair, pair_arrays, unpair_arrays


def test_pairing_low():
    x, y = 56, 937
    key = y**2 + x
    assert pair(x, y) == key
    assert unpair(key) == (x, y)


def test_pairing_hi():
    x, y = 937, 56
    key = x**2 + x + y
    assert pair(x, y) == key
    assert unpair(key) == (x, y)


def test_pairing_negative():
    assert pair(-1, 5) == -1
    assert unpair(-1) == (-1, -1)


def test_pairing_roundtrip_arrays():
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 512, 10000)
    pad = rng.integers(0, 10240, 10000)
    keys = pair_arrays(tb, pad)
    tb2, pad2 = unpair_arrays(keys)
    np.testing.assert_array_equal(tb, tb2)
    np.testing.assert_array_equal(pad, pad2)
    # matches the scalar implementation
    for i in range(0, 10000, 997):
        assert keys[i] == pair(int(tb[i]), int(pad[i]))
