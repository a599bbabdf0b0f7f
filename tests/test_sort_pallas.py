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
    for lane_mode in ("roll", "transpose", "loop"):
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
    got_loop = np.asarray(sort_i64_pallas(jnp.asarray(key), lane_mode="loop"))
    np.testing.assert_array_equal(got_loop, ref)


def test_merge_runs_fused_matches_lax_path():
    """merge_runs_fused_pallas vs deposition._merge_runs: integer outputs
    (keys, validity, n_uniq) BIT-exact; the charge prefix to f32 ulps
    (the in-VMEM Hillis-Steele prefix associates differently than XLA's
    tree cumsum)."""
    from attpc_engine_tpu.detector.deposition import _merge_runs
    from attpc_engine_tpu.detector.sort_pallas import merge_runs_fused_pallas

    rng = np.random.default_rng(41)
    e, w, cap, rank_bits = 3, 700, 256, 2
    # realistic key structure: runs of equal space keys, rank in low bits
    space = np.sort(rng.integers(0, 150, (e, w)), axis=1).astype(np.int32)
    rank = rng.integers(0, 4, (e, w)).astype(np.int32)
    packed = (space << rank_bits) | rank
    qv = np.abs(rng.normal(100.0, 30.0, (e, w))).astype(np.float32)
    dead = rng.random((e, w)) < 0.2
    packed[dead] = KEY_SENTINEL
    qv[dead] = 0.0

    k_ref, sums_ref, valid_ref, n_ref = _merge_runs(
        jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits
    )
    k2, c2, n2 = merge_runs_fused_pallas(
        jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(n_ref))
    # fori-loop stage variant: identical compare-exchange sequence,
    # identical outputs (incl. the f32 prefix bit-for-bit)
    k2l, c2l, n2l = merge_runs_fused_pallas(
        jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits,
        lane_mode="loop",
    )
    np.testing.assert_array_equal(np.asarray(k2l), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(n2l), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(c2l), np.asarray(c2))
    valid2 = np.asarray(k2) != KEY_SENTINEL
    np.testing.assert_array_equal(valid2, np.asarray(valid_ref))
    prev = np.concatenate(
        [np.zeros((e, 1), np.float32), np.asarray(c2)[:, :-1]], axis=1
    )
    sums2 = np.where(valid2, np.maximum(np.asarray(c2) - prev, 0.0), 0.0)
    np.testing.assert_allclose(
        sums2, np.asarray(sums_ref), rtol=1e-5, atol=1e-2
    )
    # totals conserved exactly-ish: same charges, different association
    np.testing.assert_allclose(
        sums2.sum(axis=1), np.asarray(sums_ref).sum(axis=1), rtol=1e-6
    )


def test_deposit_and_merge_fused_integer_identity():
    """Full deposit path with pallas_sort='fused': all integer outputs
    identical to the lax path; charges allclose."""
    import jax as _jax

    from attpc_engine_tpu.detector.deposition import (
        deposit_and_merge,
        event_keys,
    )
    from tests.test_deposit_pallas import _config

    config = _config()
    dev = config.device_arrays()
    rng = np.random.default_rng(43)
    e, k, t = 2, 2, 30
    b = e * k
    positions = np.zeros((t, b, 3), np.float32)
    positions[:, :, 0] = np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 1] = 0.08 + np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 2] = rng.uniform(0.1, 0.99, (t, b))
    electrons = rng.integers(0, 2000, (t, b)).astype(np.int32)
    valid = rng.random((t, b)) < 0.9
    labels = np.tile(np.arange(k, dtype=np.int32) + 2, e)
    kw = dict(
        key_grid_mm=dev["key_grid_mm"], grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"], diffusion=config.det_params.diffusion,
        efield=config.det_params.efield,
        drift_velocity=config.drift_velocity, micromegas_edge=10.0,
        length=1.0, mpgd_gain=175000.0, n_events=e, tracks_per_event=k,
        point_budget=128, uniq_budget=4096,
    )
    key = event_keys(_jax.random.PRNGKey(47), e)
    args = (key, jnp.asarray(positions), jnp.asarray(electrons),
            jnp.asarray(valid), jnp.asarray(labels))
    out_lax = deposit_and_merge(*args, **kw)
    out_f = deposit_and_merge(*args, pallas_sort="fused", **kw)
    for name in ("pads", "tbs_i", "labels", "events", "cloud_valid",
                 "counts", "n_points", "uniq_overflow", "pool_overflow"):
        np.testing.assert_array_equal(
            np.asarray(out_lax[name]), np.asarray(out_f[name]), err_msg=name
        )
    # charges carry the documented ulp-level prefix wobble AMPLIFIED by
    # the MPGD gain (175,000x here): compare in electron units with a
    # one-electron absolute floor (the reference itself truncates pixels
    # to whole electrons) — observed wobble is ~0.01 electrons
    gain = 175000.0
    np.testing.assert_allclose(
        np.asarray(out_f["charges"]) / gain,
        np.asarray(out_lax["charges"]) / gain,
        rtol=1e-5, atol=1.0,
    )


def test_merge_runs_fused_bench_width():
    """One event row at the real bench shapes (W = 57,600 lanes padded to
    2^16, cap = 12,288): integer outputs bit-exact vs the lax path."""
    from attpc_engine_tpu.detector.deposition import _merge_runs
    from attpc_engine_tpu.detector.sort_pallas import merge_runs_fused_pallas

    rng = np.random.default_rng(53)
    e, w, cap, rank_bits = 1, 57600, 12288, 2
    space = rng.integers(0, 40_000, (e, w)).astype(np.int32)
    rank = rng.integers(0, 4, (e, w)).astype(np.int32)
    packed = (space << rank_bits) | rank
    qv = np.abs(rng.normal(100.0, 30.0, (e, w))).astype(np.float32)
    dead = rng.random((e, w)) < 0.3
    packed[dead] = KEY_SENTINEL
    qv[dead] = 0.0

    k_ref, sums_ref, valid_ref, n_ref = _merge_runs(
        jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits
    )
    k2, c2, n2 = merge_runs_fused_pallas(
        jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(n_ref))
    prev = np.concatenate(
        [np.zeros((e, 1), np.float32), np.asarray(c2)[:, :-1]], axis=1
    )
    valid2 = np.asarray(k2) != KEY_SENTINEL
    sums2 = np.where(valid2, np.maximum(np.asarray(c2) - prev, 0.0), 0.0)
    np.testing.assert_allclose(
        sums2, np.asarray(sums_ref), rtol=1e-4, atol=0.5
    )


def test_vmem_budget_guard_falls_back_to_lax(monkeypatch):
    """A row that would pad past MAX_INVMEM_TOTAL (2^18 lanes) must never
    reach the Pallas kernels — _merge_runs silently keeps the lax path
    (huge point_budget configs would otherwise blow the ~10 MB scoped
    VMEM; sort_pallas.MAX_INVMEM_TOTAL)."""
    from attpc_engine_tpu.detector import sort_pallas
    from attpc_engine_tpu.detector.deposition import _merge_runs

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("Pallas sort called past the VMEM budget")

    monkeypatch.setattr(sort_pallas, "sort_pairs_pallas", _boom)
    monkeypatch.setattr(sort_pallas, "merge_runs_fused_pallas", _boom)

    rng = np.random.default_rng(59)
    e, w, cap, rank_bits = 1, 2**18 + 1, 64, 2
    space = rng.integers(0, 1000, (e, w)).astype(np.int32)
    packed = (space << rank_bits) | rng.integers(0, 4, (e, w)).astype(np.int32)
    qv = np.abs(rng.normal(10.0, 3.0, (e, w))).astype(np.float32)

    ref = _merge_runs(jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits)
    for flag in (True, "fused"):
        got = _merge_runs(
            jnp.asarray(packed), jnp.asarray(qv), cap, rank_bits,
            pallas_sort=flag,
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
