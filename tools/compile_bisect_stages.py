"""Stage-wise compile bisect of deposit_and_merge on the TPU backend.

Reimplements the deposit pipeline inline with a STAGE cutoff so we can
find which stage composition makes TPU compilation explode.
STAGE=1 compaction, 2 +mesh, 3 +local dedup, 4 +event merge, 5 full.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from attpc_engine_tpu.detector.deposition import (
    KEY_SENTINEL,
    MESH_STEPS,
    NUM_TB,
    _key_lookup,
    _run_edges,
    _seg_scan,
)


@partial(jax.jit, static_argnames=("n_events", "tracks_per_event", "point_budget", "local_cap", "stage"))
def staged(
    key, positions, electrons, valid, track_labels, key_grid_mm,
    n_events, tracks_per_event, point_budget, local_cap, stage,
):
    grid_lo_mm, grid_n_mm = -280.0, 560
    diffusion, efield, drift_velocity = 0.277, 45000.0, 0.001
    micromegas_edge, length, mpgd_gain = 10.0, 1.0, 175000.0
    t_steps, b = electrons.shape
    k_tracks = tracks_per_event
    e = n_events
    pb = point_budget
    c_cap = min(local_cap, MESH_STEPS * MESH_STEPS)
    f32 = jnp.float32
    key_grid_flat = key_grid_mm.reshape(-1)
    p = e * pb

    valid = valid & (electrons >= 1)
    tb_f = (length - positions[:, :, 2]) / drift_velocity + micromegas_edge
    tb_i = tb_f.astype(jnp.int32)
    valid = valid & (tb_f > -1.0) & (tb_i < NUM_TB)

    kt = k_tracks * t_steps

    def ev_flat(a):
        return a.transpose(1, 0).reshape(e * kt)

    valid_r = ev_flat(valid).reshape(e, kt)
    n_points = valid_r.sum(axis=1, dtype=jnp.int32)
    pool_overflow = jnp.maximum(n_points - pb, 0).sum()

    slot = jnp.cumsum(valid_r.astype(jnp.int32), axis=1) - 1
    row = jnp.arange(e, dtype=jnp.int32)[:, None]
    dest = jnp.where(valid_r & (slot < pb), row * pb + slot, p)
    src = (
        jnp.full(p, -1, jnp.int32)
        .at[dest.reshape(-1)]
        .set(jnp.arange(e * kt, dtype=jnp.int32), mode="drop")
    )
    taken = src >= 0
    gsrc = jnp.maximum(src, 0)

    px = ev_flat(positions[:, :, 0])[gsrc]
    py = ev_flat(positions[:, :, 1])[gsrc]
    ptbf = ev_flat(tb_f)[gsrc]
    ptbi = ev_flat(tb_i)[gsrc]
    pne = ev_flat(electrons)[gsrc].astype(f32)
    plabel = track_labels[gsrc // t_steps]
    if stage == 1:
        return px + py + ptbf, pne, plabel, pool_overflow

    sigma = jnp.sqrt(2.0 * diffusion * drift_velocity * ptbf / efield).astype(f32)
    has_diff = sigma > 0.0
    sigma_safe = jnp.where(has_diff, sigma, 1.0)
    mesh_1d = jnp.linspace(-3.0, 3.0, MESH_STEPS, dtype=f32)
    off_x = mesh_1d[:, None]
    off_y = mesh_1d[None, :]
    step = 6.0 / (MESH_STEPS - 1)
    pix_x = px[:, None, None] + sigma_safe[:, None, None] * off_x
    pix_y = py[:, None, None] + sigma_safe[:, None, None] * off_y
    pdf_area = (step * step / (2.0 * jnp.pi)) * jnp.exp(-0.5 * (off_x**2 + off_y**2))
    q_pix = pne[:, None, None] * pdf_area
    q_point = jnp.zeros((MESH_STEPS, MESH_STEPS), dtype=f32).at[0, 0].set(1.0)
    q_pix = jnp.where(has_diff[:, None, None], q_pix, pne[:, None, None] * q_point)
    pix_x = jnp.where(has_diff[:, None, None], pix_x, px[:, None, None])
    pix_y = jnp.where(has_diff[:, None, None], pix_y, py[:, None, None])
    pkey = _key_lookup(key_grid_flat, grid_lo_mm, grid_n_mm, pix_x, pix_y)
    pix_valid = (pkey != KEY_SENTINEL) & taken[:, None, None]
    n_px = MESH_STEPS * MESH_STEPS
    lkey = jnp.where(pix_valid, pkey + ptbi[:, None, None], KEY_SENTINEL)
    lkey = lkey.reshape(p, n_px)
    lq = jnp.where(pix_valid, q_pix, 0.0).reshape(p, n_px)
    if stage == 2:
        return lkey, lq

    pad_n = 128 - n_px
    lkey = jnp.concatenate([lkey, jnp.full((p, pad_n), KEY_SENTINEL, jnp.int32)], axis=1)
    lq = jnp.concatenate([lq, jnp.zeros((p, pad_n), f32)], axis=1)
    k1, q1 = jax.lax.sort((lkey, lq), dimension=1, num_keys=1)
    first, last = _run_edges(k1)
    sums = _seg_scan(first, q1, axis=1)
    real_last = last & (k1 != KEY_SENTINEL)
    n_uniq = real_last.sum(axis=1, dtype=jnp.int32)
    local_max = n_uniq.max()
    seg_overflow = jnp.maximum(n_uniq - c_cap, 0).sum()
    ukey = jnp.where(real_last, k1, KEY_SENTINEL)
    usum = jnp.where(real_last, sums, 0.0)
    k2, q2 = jax.lax.sort((ukey, usum), dimension=1, num_keys=1)
    ekey = k2[:, :c_cap]
    eq = q2[:, :c_cap]
    if stage == 3:
        return ekey, eq, local_max, seg_overflow

    w = pb * c_cap
    kk = ekey.reshape(e, w)
    qq = eq.reshape(e, w)
    ll = jnp.broadcast_to(plabel[:, None], (p, c_cap)).reshape(e, w)
    kk, qq, ll = jax.lax.sort((kk, qq, ll), dimension=1, is_stable=True, num_keys=1)
    first, last = _run_edges(kk)
    qsum = _seg_scan(first, qq, axis=1)
    uniq = last & (kk != KEY_SENTINEL)
    counts = uniq.sum(axis=1, dtype=jnp.int32)
    if stage == 4:
        return kk, qsum, ll, counts

    events_out = jnp.where(uniq, row, e).reshape(-1)
    pads_out = jnp.where(uniq, kk // NUM_TB, -1).reshape(-1)
    tbs_int = jnp.where(uniq, kk % NUM_TB, 0).reshape(-1)
    charges = jnp.where(uniq, qsum * f32(mpgd_gain), 0.0).reshape(-1)
    labels = jnp.where(uniq, ll, -1).reshape(-1)
    wiggle = jax.random.uniform(key, tbs_int.shape, dtype=f32)
    tbs_out = tbs_int.astype(f32) + wiggle
    return pads_out, tbs_out, charges, labels, events_out, counts


def main():
    e, pb, lc = (int(x) for x in os.environ.get("CFG", "64,256,32").split(","))
    t_steps, k = 100, 2
    b = e * k
    positions = jnp.zeros((t_steps, b, 3), jnp.float32)
    electrons = jnp.ones((t_steps, b), jnp.int32)
    valid = jnp.ones((t_steps, b), bool)
    labels = jnp.zeros((b,), jnp.int32)
    grid = jnp.zeros((560, 560), jnp.int32)
    stages = [int(s) for s in os.environ.get("STAGES", "1,2,3,4,5").split(",")]
    for stage in stages:
        t0 = time.perf_counter()
        lowered = staged.lower(
            jax.random.PRNGKey(0), positions, electrons, valid, labels, grid,
            n_events=e, tracks_per_event=k, point_budget=pb, local_cap=lc,
            stage=stage,
        )
        t_low = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        print(
            f"stage {stage} (e={e} pb={pb} lc={lc}): lower {t_low:.1f}s "
            f"compile {time.perf_counter() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
