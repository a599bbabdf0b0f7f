"""Bit-exactness of the Pallas in-VMEM row sort vs the lax.sort i64 pack.

The kernel must be a drop-in for `_merge_runs`'s
``lax.sort(key<<32 | f32_bits, dimension=1)`` — same multiset AND same
total order (ascending lexicographic on nonnegative (hi, lo) i32
planes), including sentinel lanes and non-power-of-two widths. Runs in
interpret mode on the CPU backend (same pattern as
tests/test_deposit_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attpc_engine_tpu.detector.sort_pallas import sort_pairs_pallas

KEY_SENTINEL = np.int32(2**31 - 1)


def _lax_reference(hi, lo):
    g = (hi.astype(jnp.int64) << 32) | lo.astype(jnp.uint32).astype(jnp.int64)
    g = jax.lax.sort(g, dimension=1, is_stable=False)
    return (
        np.asarray((g >> 32).astype(jnp.int32)),
        np.asarray((g & 0xFFFFFFFF).astype(jnp.int32)),
    )


def _check(hi, lo):
    rh, rl = _lax_reference(jnp.asarray(hi), jnp.asarray(lo))
    for lane_mode in ("roll", "transpose"):
        ph, plo = sort_pairs_pallas(
            jnp.asarray(hi), jnp.asarray(lo), lane_mode=lane_mode
        )
        np.testing.assert_array_equal(np.asarray(ph), rh, err_msg=lane_mode)
        np.testing.assert_array_equal(np.asarray(plo), rl, err_msg=lane_mode)


@pytest.mark.parametrize("w", [256, 300, 1000, 1024])
def test_random_rows_match_lax(w):
    rng = np.random.default_rng(w)
    e = 5
    hi = rng.integers(0, 2**30, (e, w)).astype(np.int32)
    lo = rng.integers(0, 2**31 - 1, (e, w)).astype(np.int32)
    _check(hi, lo)


def test_duplicates_and_sentinels():
    rng = np.random.default_rng(3)
    e, w = 4, 640
    # few distinct keys -> long equal runs; sentinel lanes carry lo=0
    hi = rng.integers(0, 7, (e, w)).astype(np.int32) * 1000
    lo = np.float32(rng.random((e, w)) * 100).view(np.int32)
    sent = rng.random((e, w)) < 0.3
    hi[sent] = KEY_SENTINEL
    lo[sent] = 0
    assert (lo >= 0).all()
    _check(hi, lo)


def test_charge_bits_order_like_floats():
    """The lo plane is f32 charge bits: sorting the bits as i32 must order
    the charges ascending within an equal-key run (nonneg floats only)."""
    q = np.float32([0.0, 1.5e-30, 3.25, 7.0, 1e20, 0.5])
    hi = np.zeros((1, 6), np.int32)
    lo = q.view(np.int32)[None, :]
    ph, plo = sort_pairs_pallas(jnp.asarray(hi), jnp.asarray(lo))
    out_q = np.asarray(plo)[0].view(np.float32)
    np.testing.assert_array_equal(out_q, np.sort(q))
    assert (np.asarray(ph) == 0).all()


def test_presorted_and_reversed():
    w = 384
    asc = np.arange(w, dtype=np.int32)[None, :]
    desc = asc[:, ::-1].copy()
    lo = np.zeros((1, w), np.int32)
    for hi in (asc, desc):
        ph, _ = sort_pairs_pallas(jnp.asarray(hi), jnp.asarray(lo))
        np.testing.assert_array_equal(np.asarray(ph)[0], np.arange(w))


def test_bench_width_smoke():
    """One row at the real bench width (57,600 -> padded 65,536)."""
    rng = np.random.default_rng(9)
    w = 57600
    hi = rng.integers(0, 2**28, (1, w)).astype(np.int32)
    lo = rng.integers(0, 2**31 - 1, (1, w)).astype(np.int32)
    ph, plo = sort_pairs_pallas(jnp.asarray(hi), jnp.asarray(lo))
    order = np.lexsort((lo[0], hi[0]))
    np.testing.assert_array_equal(np.asarray(ph)[0], hi[0][order])
    # equal (hi, lo) pairs are interchangeable; compare pairs, not perms
    ref = sorted(zip(hi[0].tolist(), lo[0].tolist()))
    got = list(zip(np.asarray(ph)[0].tolist(), np.asarray(plo)[0].tolist()))
    assert got == ref


def test_sort_i64_matches_lax():
    """sort_i64_pallas vs lax.sort on the convert-stage key distribution:
    bit 63 = keep flag (negative i64 sorts first), low word = f32 charge
    bits of nonneg charges, dropped rows pinned to i64 max."""
    from attpc_engine_tpu.detector.sort_pallas import sort_i64_pallas

    rng = np.random.default_rng(17)
    e, w = 3, 700
    keep = rng.random((e, w)) < 0.6
    tb = rng.integers(0, 512, (e, w)).astype(np.int64)
    pad = rng.integers(0, 10240, (e, w)).astype(np.int64)
    lab = rng.integers(0, 5, (e, w)).astype(np.int64)
    q = np.abs(rng.normal(50, 20, (e, w))).astype(np.float32)
    key = (
        (keep.astype(np.int64) << 63)
        | ((511 - tb) << 54)
        | (pad << 40)
        | (lab << 32)
        | q.view(np.int32).astype(np.uint32).astype(np.int64)
    )
    key = np.where(keep, key, np.int64(0x7FFFFFFFFFFFFFFF))
    ref = np.asarray(
        jax.lax.sort(jnp.asarray(key), dimension=1, is_stable=False)
    )
    got = np.asarray(sort_i64_pallas(jnp.asarray(key)))
    np.testing.assert_array_equal(got, ref)
