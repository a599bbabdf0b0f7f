"""Measure redundancy structure of the deposit to guide the merge design.

Runs the real transport + electron generation on a realistic config, then
computes (host-side, numpy):
  - valid deposit points / event
  - valid mesh pixels and unique (event, pad, tb) keys
  - slot-major time-run count (size of a run-merged pre-sort pool)
  - per-point per-axis unique mm-floor counts (separable dedup potential)

Usage: python tools/analyze_deposit.py  [EVENTS=16 STEPS=10000 env knobs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

EVENTS = int(os.environ.get("EVENTS", "16"))
STEPS = int(os.environ.get("STEPS", "10000"))


def main():
    import jax.numpy as jnp

    from attpc_engine_tpu.detector.deposition import (
        MESH_STEPS,
        NUM_TB,
        event_keys,
        generate_electrons,
    )
    from attpc_engine_tpu.detector.transport import integrate_tracks
    from __graft_entry__ import _tiny_setup

    pipeline, sim = _tiny_setup(events_per_batch=EVENTS, n_time_steps=STEPS)
    cfg = sim.config
    e = EVENTS
    k = sim.k_tracks
    vertices, momenta = pipeline.run_batch(e, key=jax.random.PRNGKey(0))
    p3 = momenta[:, sim.sim_indices, :3]
    gvs = (p3 / sim.track_masses[None, :, None]).astype(np.float32)

    pos0 = jnp.repeat(jnp.asarray(vertices, jnp.float32), k, axis=0)
    gv0 = jnp.asarray(gvs).reshape(e * k, 3)
    s_idx = jnp.tile(jnp.arange(k, dtype=jnp.int32), e)
    positions, dke, alive = integrate_tracks(
        pos0, gv0, s_idx, sim.species,
        density=cfg.det_params.gas_target.density,
        bfield=cfg.det_params.bfield, efield=cfg.det_params.efield,
        n_steps=STEPS, chunk_steps=250,
    )
    electrons = generate_electrons(
        event_keys(jax.random.PRNGKey(1), e), dke, cfg.det_params.w_value,
        cfg.det_params.fano_factor, chunk_steps=250,
    )
    positions = np.asarray(positions)  # [T, B, 3]
    electrons = np.asarray(electrons)
    alive = np.asarray(alive)

    valid = alive & (electrons >= 1)
    tb_f = (
        cfg.det_params.length - positions[:, :, 2]
    ) / cfg.drift_velocity + cfg.elec_params.micromegas_edge
    tb_i = tb_f.astype(np.int32)
    valid &= (tb_f > -1.0) & (tb_i < NUM_TB)

    t, b = electrons.shape
    print(f"tracks B={b} (K={k}), steps T={t}")
    vpts = valid.sum()
    print(f"valid deposit points: {vpts} total, {vpts/e:.0f}/event")
    per_track = valid.sum(axis=0)
    print(f"  per-track points: min {per_track.min()} max {per_track.max()}")

    # pooled point arrays in (event, track, time) order
    vm = valid.transpose(1, 0).reshape(-1)
    flat = lambda a: a.transpose(1, 0).reshape(-1)[vm]
    px, py = flat(positions[:, :, 0]), flat(positions[:, :, 1])
    ptbf, ptbi = flat(tb_f), flat(tb_i)
    pne = flat(electrons).astype(np.float32)
    pevent = (np.nonzero(vm)[0] // (k * t)).astype(np.int64)

    dev = cfg.device_arrays()
    key_grid = np.asarray(dev["key_grid_mm"]).reshape(-1)
    lo, nmm = dev["grid_lo_mm"], dev["grid_n_mm"]
    SENT = 2**31 - 1

    sigma = np.sqrt(
        2.0 * cfg.det_params.diffusion * cfg.drift_velocity * ptbf
        / cfg.det_params.efield
    ).astype(np.float32)
    print(f"sigma mm: min {sigma.min()*1e3:.3f} med {np.median(sigma)*1e3:.3f} "
          f"max {sigma.max()*1e3:.3f}")

    mesh = np.linspace(-3.0, 3.0, MESH_STEPS, dtype=np.float32)
    pix_x = px[:, None, None] + sigma[:, None, None] * mesh[:, None]
    pix_y = py[:, None, None] + sigma[:, None, None] * mesh[None, :]

    ix = np.floor(pix_x * 1000.0 - lo).astype(np.int64)
    iy = np.floor(pix_y * 1000.0 - lo).astype(np.int64)
    inb = (ix >= 0) & (ix < nmm) & (iy >= 0) & (iy < nmm)
    pk = np.where(inb, key_grid[np.clip(ix, 0, nmm-1) * nmm + np.clip(iy, 0, nmm-1)], SENT)
    gkey = np.where(
        pk != SENT,
        pevent[:, None, None] * (10240 * NUM_TB) + pk + ptbi[:, None, None],
        SENT,
    )
    n_pix_valid = (gkey != SENT).sum()
    uniq = np.unique(gkey[gkey != SENT])
    print(f"valid pixels: {n_pix_valid} ({n_pix_valid/e:.0f}/event)")
    print(f"unique (ev,pad,tb) keys: {len(uniq)} ({len(uniq)/e:.0f}/event) "
          f"dup x{n_pix_valid/len(uniq):.1f}")

    # slot-major run counts: [P,10,10] -> [100, P] rows along pooled time
    g2 = gkey.reshape(-1, 100).T  # [100, P]
    runs = (g2[:, 1:] != g2[:, :-1]).sum() + 100
    real_runs = runs  # incl. sentinel runs; refine: runs among non-sentinel
    nz = g2 != SENT
    # runs of real keys only
    change = (g2[:, 1:] != g2[:, :-1]) & nz[:, 1:]
    start = nz[:, :1].sum() + change.sum() + (nz[:, 1:] & ~nz[:, :-1] & (g2[:, 1:] == g2[:, :-1])).sum()
    print(f"slot-major runs (real): ~{change.sum() + nz[:, :1].sum()} "
          f"({(change.sum() + nz[:, :1].sum())/e:.0f}/event) "
          f"reduction x{n_pix_valid/max(1, change.sum() + nz[:, :1].sum()):.1f}")

    # unique (pad, tb) keys per point (exact, all points)
    per_pt_uniq = np.array(
        [len(np.unique(r[r != SENT])) for r in gkey.reshape(len(px), -1)]
    )
    print(f"unique keys per point: mean {per_pt_uniq.mean():.1f} "
          f"p90 {np.percentile(per_pt_uniq,90):.0f} "
          f"p99 {np.percentile(per_pt_uniq,99):.0f} max {per_pt_uniq.max()}")

    # max alive step index (how far the step window must reach)
    any_alive = valid.any(axis=1)
    print(f"last step with any valid deposit: {np.nonzero(any_alive)[0].max()}")
    # unique keys per event (cloud_cap sizing)
    for ev in range(min(4, e)):
        m = (pevent == ev)
        u = np.unique(gkey.reshape(len(px), -1)[m])
        print(f"  event {ev}: points {m.sum()}, unique keys {len(u[u != SENT])}")


if __name__ == "__main__":
    main()
