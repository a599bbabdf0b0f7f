"""Pallas RK4 transport kernel vs the lax.scan implementation.

Runs the kernel in Pallas interpret mode (CPU-executable); the same kernel
was validated on real TPU hardware (bit-close: alive identical, positions
within 3e-7 m, dke within 3e-5 MeV at batch 384 x 500 steps)."""

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_setup
from attpc_engine_tpu.detector.transport import integrate_tracks
from attpc_engine_tpu.detector.transport_pallas import integrate_tracks_pallas


def test_pallas_matches_scan_interpret():
    pipeline, sim = _tiny_setup(events_per_batch=8, n_time_steps=200)
    cfg = sim.config
    vertices, momenta = pipeline.run_batch(8, key=jax.random.PRNGKey(0))
    p3 = momenta[:, sim.sim_indices, :3]
    gvs = jnp.asarray(
        (p3 / sim.track_masses[None, :, None]).astype(np.float32)
    ).reshape(-1, 3)
    pos0 = jnp.repeat(
        jnp.asarray(vertices, dtype=jnp.float32), sim.k_tracks, axis=0
    )
    s_idx = jnp.tile(jnp.arange(sim.k_tracks, dtype=jnp.int32), 8)
    kw = dict(
        density=cfg.det_params.gas_target.density,
        bfield=cfg.det_params.bfield,
        efield=cfg.det_params.efield,
        n_steps=200,
    )
    p1, d1, a1 = integrate_tracks(
        pos0, gvs, s_idx, sim.species, chunk_steps=200, **kw
    )
    p2, d2, a2 = integrate_tracks_pallas(
        pos0, gvs, s_idx, sim.species, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() < 1e-6  # meters
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() < 1e-4  # MeV


def test_run_simulation_with_pallas_transport(tmp_path):
    """The pallas_transport engine flag produces working output through the
    full driver (interpret mode on CPU, Mosaic on TPU)."""
    from attpc_engine_tpu.detector import EngineParams, SpyralWriter, run_simulation
    from attpc_engine_tpu.kinematics import run_kinematics_pipeline

    pipeline, sim = _tiny_setup(events_per_batch=4)
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 4, kine, batch_size=4, seed=8,
                            show_progress=False)
    engine = EngineParams(
        n_time_steps=250, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=4, pallas_transport=True,
    )
    d = tmp_path / "clouds"
    d.mkdir()
    run_simulation(sim.config, kine, SpyralWriter(d, sim.config),
                   engine=engine, seed=2, show_progress=False)
    import h5py

    with h5py.File(d / "run_0000.h5") as f:
        names = [k for k in f["cloud"].keys() if k.startswith("cloud_")]
        assert len(names) >= 3


def test_pallas_chunked_matches_scan_interpret():
    """The chunked wrapper (multi-chunk window + early exit) matches the
    scan integrator over a window several chunks long."""
    from attpc_engine_tpu.detector.transport_pallas import (
        integrate_tracks_pallas_chunked,
    )

    pipeline, sim = _tiny_setup(events_per_batch=4, n_time_steps=300)
    cfg = sim.config
    vertices, momenta = pipeline.run_batch(4, key=jax.random.PRNGKey(3))
    p3 = momenta[:, sim.sim_indices, :3]
    gvs = jnp.asarray(
        (p3 / sim.track_masses[None, :, None]).astype(np.float32)
    ).reshape(-1, 3)
    pos0 = jnp.repeat(
        jnp.asarray(vertices, dtype=jnp.float32), sim.k_tracks, axis=0
    )
    s_idx = jnp.tile(jnp.arange(sim.k_tracks, dtype=jnp.int32), 4)
    kw = dict(
        density=cfg.det_params.gas_target.density,
        bfield=cfg.det_params.bfield,
        efield=cfg.det_params.efield,
        n_steps=300,
    )
    p1, d1, a1 = integrate_tracks(
        pos0, gvs, s_idx, sim.species, chunk_steps=100, **kw
    )
    p2, d2, a2 = integrate_tracks_pallas_chunked(
        pos0, gvs, s_idx, sim.species, chunk_steps=100, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # compare only live deposit points: the scan freezes dead lanes at the
    # stopping position while outputs past death are never consumed
    live = np.asarray(a1)
    dp = np.abs(np.asarray(p1) - np.asarray(p2))[live]
    assert dp.max() < 1e-6 if dp.size else True
    dd = np.abs(np.asarray(d1) - np.asarray(d2))[live]
    assert dd.max() < 1e-4 if dd.size else True
