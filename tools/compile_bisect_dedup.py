"""Isolate the slow-compile interaction: local dedup from raw inputs vs
fused with the mesh-expansion producer, vs separated by an
optimization_barrier. AOT compile timing only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from attpc_engine_tpu.detector.deposition import (
    KEY_SENTINEL,
    _run_edges,
    _seg_scan,
)


def tcompile(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_low = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    print(
        f"{label}: lower {t_low:.1f}s compile {time.perf_counter() - t0:.1f}s",
        flush=True,
    )


def dedup(lkey, lq, c_cap=32):
    p, n_px = lkey.shape
    pad_n = 128 - n_px
    lkey = jnp.concatenate(
        [lkey, jnp.full((p, pad_n), KEY_SENTINEL, jnp.int32)], axis=1
    )
    lq = jnp.concatenate([lq, jnp.zeros((p, pad_n), jnp.float32)], axis=1)
    k1, q1 = jax.lax.sort((lkey, lq), dimension=1, num_keys=1)
    first, last = _run_edges(k1)
    sums = _seg_scan(first, q1, axis=1)
    real_last = last & (k1 != KEY_SENTINEL)
    n_uniq = real_last.sum(axis=1, dtype=jnp.int32)
    ukey = jnp.where(real_last, k1, KEY_SENTINEL)
    usum = jnp.where(real_last, sums, 0.0)
    k2, q2 = jax.lax.sort((ukey, usum), dimension=1, num_keys=1)
    return k2[:, :c_cap], q2[:, :c_cap], n_uniq.max()


def expand(px, py, pne, ptbi, grid_flat, taken):
    p = px.shape[0]
    sigma = jnp.sqrt(jnp.abs(px) * 1e-3 + 1e-5)
    mesh_1d = jnp.linspace(-3.0, 3.0, 10, dtype=jnp.float32)
    off_x = mesh_1d[:, None]
    off_y = mesh_1d[None, :]
    pix_x = px[:, None, None] + sigma[:, None, None] * off_x
    pix_y = py[:, None, None] + sigma[:, None, None] * off_y
    pdf = jnp.exp(-0.5 * (off_x**2 + off_y**2)) / (2 * jnp.pi)
    q_pix = pne[:, None, None] * pdf
    ix = jnp.floor(pix_x * 1000.0 + 280.0).astype(jnp.int32)
    iy = jnp.floor(pix_y * 1000.0 + 280.0).astype(jnp.int32)
    inb = (ix >= 0) & (ix < 560) & (iy >= 0) & (iy < 560)
    flat = jnp.clip(ix, 0, 559) * 560 + jnp.clip(iy, 0, 559)
    pkey = jnp.where(inb, grid_flat[flat], KEY_SENTINEL)
    pix_valid = (pkey != KEY_SENTINEL) & taken[:, None, None]
    lkey = jnp.where(pix_valid, pkey + ptbi[:, None, None], KEY_SENTINEL)
    lq = jnp.where(pix_valid, q_pix, 0.0)
    return lkey.reshape(p, 100), lq.reshape(p, 100)


def main():
    p = int(os.environ.get("P", 16384))
    which = os.environ.get("WHICH", "raw,fused,barrier")
    lkey = jnp.zeros((p, 100), jnp.int32)
    lq = jnp.zeros((p, 100), jnp.float32)
    if "raw" in which:
        tcompile(f"dedup raw [p={p},100]", dedup, lkey, lq)

    px = jnp.zeros((p,), jnp.float32)
    py = jnp.zeros((p,), jnp.float32)
    pne = jnp.zeros((p,), jnp.float32)
    ptbi = jnp.zeros((p,), jnp.int32)
    taken = jnp.ones((p,), bool)
    grid_flat = jnp.zeros((560 * 560,), jnp.int32)

    if "fused" in which:
        def fused(px, py, pne, ptbi, grid_flat, taken):
            lkey, lq = expand(px, py, pne, ptbi, grid_flat, taken)
            return dedup(lkey, lq)

        tcompile(f"expand+dedup fused [p={p}]", fused, px, py, pne, ptbi,
                 grid_flat, taken)

    if "barrier" in which:
        def barrier(px, py, pne, ptbi, grid_flat, taken):
            lkey, lq = expand(px, py, pne, ptbi, grid_flat, taken)
            lkey, lq = jax.lax.optimization_barrier((lkey, lq))
            return dedup(lkey, lq)

        tcompile(f"expand+dedup barrier [p={p}]", barrier, px, py, pne, ptbi,
                 grid_flat, taken)


if __name__ == "__main__":
    main()
