"""Golden-semantics test for deposit_and_merge.

Re-implements the reference's transport/merge semantics directly in numpy
(dict accumulation keyed by (pad, tb), last-writer labels — mirroring
/root/reference/src/attpc_engine/detector/transporter.py:124-318 and
simulator.py:93-113) and checks the engine's batched merge reproduces it
on randomized inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attpc_engine_tpu.detector.deposition import (
    MESH_STEPS,
    deposit_and_merge,
    event_keys,
)
from attpc_engine_tpu.detector.parameters import Config, PadParams
from attpc_engine_tpu import nuclear_map


@pytest.fixture(scope="module")
def geometry():
    from attpc_engine_tpu.nuclear import GasTarget
    from attpc_engine_tpu.detector import DetectorParams, ElectronicsParams

    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    return config


def numpy_reference_merge(
    positions, electrons, valid, track_labels, config,
    diffusion, efield, dv, mm_edge, length, gain, n_events, k_tracks,
):
    """Straight re-implementation of the reference merge semantics."""
    grid = config.pad_grid
    low, high, binsize = config.pad_grid_edges
    beam_mask = config.beam_mask
    t_steps, b = electrons.shape
    results = []
    for e in range(n_events):
        points = {}  # key -> [charge, label]
        for k in range(k_tracks):
            tr = e * k_tracks + k
            label = track_labels[tr]
            for t in range(t_steps):
                if not valid[t, tr] or electrons[t, tr] < 1:
                    continue
                x, y, z = positions[t, tr]
                tb_f = (length - z) / dv + mm_edge
                tb_i = int(np.float32(tb_f))  # trunc toward zero
                if not (tb_f > -1.0 and tb_i < 512):
                    continue
                ne = float(electrons[t, tr]) * gain
                sigma = np.sqrt(2.0 * diffusion * dv * np.float32(tb_f) / efield)
                if sigma > 0:
                    mesh = np.linspace(-3.0, 3.0, MESH_STEPS, dtype=np.float32)
                    step = 6.0 / (MESH_STEPS - 1)
                    for ox in mesh:
                        for oy in mesh:
                            pxx = np.float32(x + sigma * ox)
                            pyy = np.float32(y + sigma * oy)
                            q = (
                                ne
                                * step * step / (2 * np.pi)
                                * np.exp(-0.5 * (ox**2 + oy**2))
                            )
                            _deposit(points, grid, low, high, binsize,
                                     beam_mask, pxx, pyy, tb_i, q, label)
                else:
                    _deposit(points, grid, low, high, binsize, beam_mask,
                             np.float32(x), np.float32(y), tb_i, ne, label)
        results.append(points)
    return results


def _deposit(points, grid, low, high, binsize, beam_mask, x, y, tb, q, label):
    x_mm = np.floor(x * 1000.0)
    y_mm = np.floor(y * 1000.0)
    if not (low <= x_mm < high and low <= y_mm < high):
        return
    ix = int(round((x_mm - low) / binsize))
    iy = int(round((y_mm - low) / binsize))
    pad = int(grid[ix, iy])
    if pad < 0 or beam_mask[pad]:
        return
    key = pad * 512 + tb
    if key in points:
        points[key][0] += q
        points[key][1] = label
    else:
        points[key] = [q, label]


def test_merge_matches_reference_semantics(geometry):
    config = geometry
    rng = np.random.default_rng(11)
    n_events, k_tracks, t_steps = 3, 2, 40
    b = n_events * k_tracks

    positions = np.zeros((t_steps, b, 3), dtype=np.float32)
    # short random walks near the plane center, inside the chamber
    positions[0, :, 0] = rng.uniform(-0.1, 0.1, b)
    positions[0, :, 1] = rng.uniform(-0.1, 0.1, b)
    positions[0, :, 2] = rng.uniform(0.3, 0.7, b)
    steps = rng.normal(0, 2e-3, (t_steps, b, 3)).astype(np.float32)
    positions = positions[0][None] + np.cumsum(steps, axis=0)

    electrons = rng.integers(0, 2000, (t_steps, b)).astype(np.int32)
    valid = rng.uniform(size=(t_steps, b)) < 0.8
    track_labels = np.tile(np.array([2, 3], dtype=np.int32), n_events)

    dv = config.drift_velocity
    args = dict(
        diffusion=0.277, efield=45000.0, drift_velocity=dv,
        micromegas_edge=10.0, length=1.0, mpgd_gain=1000.0,
    )

    dev = config.device_arrays()
    out = deposit_and_merge(
        event_keys(jax.random.PRNGKey(0), n_events),
        jnp.asarray(positions), jnp.asarray(electrons), jnp.asarray(valid),
        jnp.asarray(track_labels),
        dev["key_grid_mm"],
        grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"],
        n_events=n_events, tracks_per_event=k_tracks,
        point_budget=256,
        **args,
    )

    expected = numpy_reference_merge(
        positions, electrons, valid, track_labels, config,
        args["diffusion"], args["efield"], dv, 10.0, 1.0, 1000.0,
        n_events, k_tracks,
    )

    got = _extract_clouds(out, n_events)
    assert int(np.asarray(out["pool_overflow"])) == 0
    for e in range(n_events):
        exp = expected[e]
        assert len(got[e]) == len(exp), f"event {e}: point count mismatch"
        for key, (q, label) in exp.items():
            gq, glabel = got[e][key]
            assert glabel == label, f"event {e} key {key}: label"
            # rel tolerance for f32 summation-order differences, abs floor of
            # half a (gain-scaled) electron for sub-electron tail segments
            assert gq == pytest.approx(q, rel=2e-3, abs=0.5 * 1000.0), (
                f"event {e} key {key}: q"
            )


def test_no_event_count_ceiling(geometry):
    """Round-1 packed int32 keys capped batches at 409 events; the windowed
    merge keys are per-event (pad * 512 + tb) so any batch size works."""
    config = geometry
    rng = np.random.default_rng(5)
    n_events, k_tracks, t_steps = 512, 1, 4
    b = n_events * k_tracks

    positions = np.zeros((t_steps, b, 3), dtype=np.float32)
    positions[:, :, 0] = rng.uniform(-0.1, 0.1, (t_steps, b))
    positions[:, :, 1] = rng.uniform(-0.1, 0.1, (t_steps, b))
    positions[:, :, 2] = rng.uniform(0.3, 0.7, (t_steps, b))
    electrons = rng.integers(100, 2000, (t_steps, b)).astype(np.int32)
    valid = np.ones((t_steps, b), dtype=bool)
    track_labels = np.full(b, 2, dtype=np.int32)

    dev = config.device_arrays()
    out = deposit_and_merge(
        event_keys(jax.random.PRNGKey(0), n_events),
        jnp.asarray(positions), jnp.asarray(electrons), jnp.asarray(valid),
        jnp.asarray(track_labels),
        dev["key_grid_mm"],
        grid_lo_mm=dev["grid_lo_mm"],
        grid_n_mm=dev["grid_n_mm"],
        diffusion=0.277, efield=45000.0,
        drift_velocity=config.drift_velocity,
        micromegas_edge=10.0, length=1.0, mpgd_gain=1000.0,
        n_events=n_events, tracks_per_event=k_tracks,
        point_budget=8,
    )
    counts = np.asarray(out["counts"])
    assert counts.shape == (512,)
    assert int(np.asarray(out["pool_overflow"])) == 0
    assert (counts > 0).sum() > 500  # nearly every event lands pads
    # events array addresses the full range
    events = np.asarray(out["events"])[np.asarray(out["cloud_valid"])]
    assert events.min() == 0 and events.max() == 511


def test_uniq_budget_overflow_counted(geometry):
    """A too-small uniq_budget must not silently drop charge: the overflow
    counter reports it so the driver can double and retry."""
    config = geometry
    rng = np.random.default_rng(7)
    t_steps, b = 8, 2
    positions = np.zeros((t_steps, b, 3), dtype=np.float32)
    positions[:, :, 2] = 0.3  # large drift -> large sigma -> many pads
    positions[:, :, 0] = rng.uniform(-0.05, 0.05, (t_steps, b))
    positions[:, :, 1] = rng.uniform(-0.05, 0.05, (t_steps, b))
    electrons = np.full((t_steps, b), 5000, dtype=np.int32)
    valid = np.ones((t_steps, b), dtype=bool)
    labels = np.array([2, 3], dtype=np.int32)
    dev = config.device_arrays()

    def run(uniq_budget):
        return deposit_and_merge(
            event_keys(jax.random.PRNGKey(0), 1),
            jnp.asarray(positions), jnp.asarray(electrons),
            jnp.asarray(valid), jnp.asarray(labels),
            dev["key_grid_mm"],
            grid_lo_mm=dev["grid_lo_mm"], grid_n_mm=dev["grid_n_mm"],
            diffusion=0.277, efield=45000.0,
            drift_velocity=config.drift_velocity,
            micromegas_edge=10.0, length=1.0, mpgd_gain=1000.0,
            n_events=1, tracks_per_event=2, point_budget=16,
            uniq_budget=uniq_budget,
        )

    small = run(8)
    assert int(np.asarray(small["uniq_overflow"])) > 0
    big = run(4096)
    assert int(np.asarray(big["uniq_overflow"])) == 0
    assert int(np.asarray(big["uniq_max"])) > 8
    # the overflow-free run keeps strictly more charge
    assert float(np.asarray(big["charges"]).sum()) > float(
        np.asarray(small["charges"]).sum()
    )
    # compacted layout: valid slots come first and match counts
    counts = np.asarray(big["counts"])
    valid_rows = np.asarray(big["cloud_valid"]).reshape(1, -1)
    assert valid_rows[0, : counts[0]].all()
    assert not valid_rows[0, counts[0] :].any()


def _extract_clouds(out, n_events):
    """out dict -> list of {key: (charge, label)} per event, robust to the
    per-event [E, C] or pooled layout."""
    pads = np.asarray(out["pads"])
    tbs = np.asarray(out["tbs"])
    charges = np.asarray(out["charges"])
    labels = np.asarray(out["labels"])
    valid = np.asarray(out["cloud_valid"])
    clouds = [dict() for _ in range(n_events)]
    if pads.ndim == 2:  # per-event layout [E, C]
        for e in range(n_events):
            for c in np.nonzero(valid[e])[0]:
                key = int(pads[e, c]) * 512 + int(tbs[e, c])
                clouds[e][key] = (charges[e, c], int(labels[e, c]))
    else:  # pooled layout with event ids
        events = np.asarray(out["events"])
        for i in np.nonzero(valid)[0]:
            key = int(pads[i]) * 512 + int(tbs[i])
            clouds[int(events[i])][key] = (charges[i], int(labels[i]))
    return clouds

