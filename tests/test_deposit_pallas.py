"""Pallas pad-lookup kernel vs the elementwise gather path.

The kernel must be EXACT (one-hot bf16-plane matmuls reproduce integer
table values bit-for-bit — deposit_pallas.py docstring), so the full
deposit_and_merge output with pallas_lookup=True (interpret mode on CPU)
must equal the gather path's output exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from attpc_engine_tpu.detector.deposit_pallas import (
    PAD_ID_SENTINEL,
    build_plane_tables,
    pad_lookup_pallas,
)
from attpc_engine_tpu.detector.deposition import deposit_and_merge, event_keys
from attpc_engine_tpu.detector.parameters import Config, PadParams
from attpc_engine_tpu import nuclear_map


def _config():
    from attpc_engine_tpu.nuclear import GasTarget
    from attpc_engine_tpu.detector import DetectorParams, ElectronicsParams

    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    return Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )


def test_kernel_exact_vs_direct_lookup():
    rng = np.random.default_rng(0)
    n_mm = 559
    grid = rng.integers(-1, 10240, size=(n_mm, n_mm)).astype(np.int64)
    beam = np.zeros(10240, bool)
    beam[rng.integers(0, 10240, 122)] = True
    hi, lo = build_plane_tables(grid, beam)
    p = 300
    ix = rng.integers(-5, n_mm + 5, size=(p, 10)).astype(np.int32)
    iy = rng.integers(-5, n_mm + 5, size=(p, 10)).astype(np.int32)
    out = np.asarray(pad_lookup_pallas(ix, iy, hi, lo))

    vet = (grid < 0) | beam[np.clip(grid, 0, None)]
    ids = np.where(vet, int(PAD_ID_SENTINEL), grid)
    ixc, iyc = np.clip(ix, 0, n_mm - 1), np.clip(iy, 0, n_mm - 1)
    ref = ids[ixc[:, :, None], iyc[:, None, :]]
    # out-of-plane pixels are the caller's mask; compare in-plane only
    inb = ((ix >= 0) & (ix < n_mm))[:, :, None] & (
        (iy >= 0) & (iy < n_mm)
    )[:, None, :]
    np.testing.assert_array_equal(out[inb], ref[inb])


def test_deposit_and_merge_pallas_equals_gather():
    config = _config()
    dev = config.device_arrays()
    rng = np.random.default_rng(7)
    e, k, t = 3, 2, 40
    b = e * k
    positions = np.zeros((t, b, 3), np.float32)
    # tracks wandering across the plane at varying z (varying sigma)
    positions[:, :, 0] = np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 1] = 0.08 + np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 2] = rng.uniform(0.1, 0.99, (t, b))
    electrons = rng.integers(0, 2000, (t, b)).astype(np.int32)
    valid = rng.random((t, b)) < 0.9
    labels = np.tile(np.arange(k, dtype=np.int32) + 2, e)

    kw = dict(
        key_grid_mm=dev["key_grid_mm"],
        grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"],
        diffusion=config.det_params.diffusion,
        efield=config.det_params.efield,
        drift_velocity=config.drift_velocity,
        micromegas_edge=10.0,
        length=1.0,
        mpgd_gain=175000.0,
        n_events=e,
        tracks_per_event=k,
        point_budget=128,
        uniq_budget=4096,
    )
    key = event_keys(jax.random.PRNGKey(5), e)
    out_g = deposit_and_merge(
        key, jnp.asarray(positions), jnp.asarray(electrons),
        jnp.asarray(valid), jnp.asarray(labels), **kw,
    )
    out_p = deposit_and_merge(
        key, jnp.asarray(positions), jnp.asarray(electrons),
        jnp.asarray(valid), jnp.asarray(labels),
        pallas_lookup=True,
        plane_hi=dev["plane_hi"], plane_lo=dev["plane_lo"],
        **kw,
    )
    assert int(np.asarray(out_g["counts"]).sum()) > 50
    for name in ("pads", "tbs", "charges", "labels", "events",
                 "cloud_valid", "counts", "n_points"):
        np.testing.assert_array_equal(
            np.asarray(out_g[name]), np.asarray(out_p[name]), err_msg=name
        )


def test_deposit_and_merge_pallas_sort_equals_lax():
    """pallas_sort=True (in-VMEM bitonic kernel, interpret mode on CPU)
    must be BIT-exact vs the lax.sort merge path — same lexicographic
    order on the same planes (sort_pallas.py docstring)."""
    config = _config()
    dev = config.device_arrays()
    rng = np.random.default_rng(11)
    e, k, t = 3, 2, 40
    b = e * k
    positions = np.zeros((t, b, 3), np.float32)
    positions[:, :, 0] = np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 1] = 0.08 + np.cumsum(rng.normal(0, 0.004, (t, b)), 0)
    positions[:, :, 2] = rng.uniform(0.1, 0.99, (t, b))
    electrons = rng.integers(0, 2000, (t, b)).astype(np.int32)
    valid = rng.random((t, b)) < 0.9
    labels = np.tile(np.arange(k, dtype=np.int32) + 2, e)

    kw = dict(
        key_grid_mm=dev["key_grid_mm"],
        grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"],
        diffusion=config.det_params.diffusion,
        efield=config.det_params.efield,
        drift_velocity=config.drift_velocity,
        micromegas_edge=10.0,
        length=1.0,
        mpgd_gain=175000.0,
        n_events=e,
        tracks_per_event=k,
        point_budget=128,
        uniq_budget=4096,
    )
    key = event_keys(jax.random.PRNGKey(5), e)
    args = (key, jnp.asarray(positions), jnp.asarray(electrons),
            jnp.asarray(valid), jnp.asarray(labels))
    out_lax = deposit_and_merge(*args, **kw)
    out_ps = deposit_and_merge(*args, pallas_sort=True, **kw)
    assert int(np.asarray(out_lax["counts"]).sum()) > 50
    for name in ("pads", "tbs", "tbs_i", "charges", "labels", "events",
                 "cloud_valid", "counts", "n_points", "uniq_overflow",
                 "pool_overflow"):
        np.testing.assert_array_equal(
            np.asarray(out_lax[name]), np.asarray(out_ps[name]), err_msg=name
        )


def test_two_stage_lookup_equals_one_stage():
    """packed_key_lookup_2s_pallas (MXU select) must be BIT-exact vs the
    one-stage kernel AND the gather path, across in/out-of-plane pixels,
    vetoed cells and block-pad points (P not a multiple of 60)."""
    from attpc_engine_tpu.detector.deposit_pallas import (
        _NX,
        _NY,
        packed_key_lookup_2s_pallas,
        packed_key_lookup_pallas,
    )

    config = _config()
    dev = config.device_arrays()
    rng = np.random.default_rng(23)
    p = 131  # not a multiple of either block size
    n_mm = int(dev["grid_n_mm"])
    # mostly in-plane mesh cells, some aliased to the sentinel row/col
    ix = rng.integers(0, n_mm, (p, 10)).astype(np.int32)
    iy = rng.integers(0, n_mm, (p, 10)).astype(np.int32)
    ix[rng.random((p, 10)) < 0.05] = _NX - 1
    iy[rng.random((p, 10)) < 0.05] = _NY - 1
    tbr = ((rng.integers(0, 512, p) << 2) | rng.integers(0, 4, p)).astype(
        np.int32
    )
    kw = dict(rank_bits=2, sentinel=2**31 - 1)
    one = packed_key_lookup_pallas(
        jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(tbr),
        dev["plane_hi"], dev["plane_lo"], **kw,
    )
    two = packed_key_lookup_2s_pallas(
        jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(tbr),
        dev["plane_hi"], dev["plane_lo"], **kw,
    )
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


def test_deposit_and_merge_two_stage_identity():
    """Full deposit path with lookup_two_stage=True == one-stage output."""
    config = _config()
    dev = config.device_arrays()
    rng = np.random.default_rng(29)
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
        key_grid_mm=dev["key_grid_mm"],
        grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"],
        diffusion=config.det_params.diffusion,
        efield=config.det_params.efield,
        drift_velocity=config.drift_velocity,
        micromegas_edge=10.0,
        length=1.0,
        mpgd_gain=175000.0,
        n_events=e,
        tracks_per_event=k,
        point_budget=128,
        uniq_budget=4096,
        pallas_lookup=True,
        plane_hi=dev["plane_hi"],
        plane_lo=dev["plane_lo"],
    )
    key = event_keys(jax.random.PRNGKey(31), e)
    args = (key, jnp.asarray(positions), jnp.asarray(electrons),
            jnp.asarray(valid), jnp.asarray(labels))
    out_1 = deposit_and_merge(*args, **kw)
    out_2 = deposit_and_merge(*args, lookup_two_stage=True, **kw)
    assert int(np.asarray(out_1["counts"]).sum()) > 20
    for name in ("pads", "tbs_i", "charges", "labels", "events",
                 "cloud_valid", "counts", "n_points"):
        np.testing.assert_array_equal(
            np.asarray(out_1[name]), np.asarray(out_2[name]), err_msg=name
        )
