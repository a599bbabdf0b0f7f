"""Micro-bisect of the local-dedup internals' TPU compile cost.
All functions take pre-padded [p, 128] inputs."""

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


def main():
    p = int(os.environ.get("P", 16384))
    which = os.environ.get("WHICH", "edges,scan,sortedges,sortscan,nosort2,full")
    k = jnp.zeros((p, 128), jnp.int32)
    q = jnp.zeros((p, 128), jnp.float32)

    if "edges" in which.split(","):
        tcompile(f"run_edges [p={p},128]", lambda k: _run_edges(k), k)
    if "scan" in which.split(","):
        f = jnp.zeros((p, 128), bool)
        tcompile(f"seg_scan [p={p},128]", lambda f, q: _seg_scan(f, q, 1), f, q)
    if "sortedges" in which.split(","):
        def se(k, q):
            k1, q1 = jax.lax.sort((k, q), dimension=1, num_keys=1)
            first, last = _run_edges(k1)
            return first.sum(), last.sum(), q1
        tcompile(f"sort+edges [p={p},128]", se, k, q)
    if "sortscan" in which.split(","):
        def ss(k, q):
            k1, q1 = jax.lax.sort((k, q), dimension=1, num_keys=1)
            first, last = _run_edges(k1)
            sums = _seg_scan(first, q1, axis=1)
            return sums, last
        tcompile(f"sort+edges+scan [p={p},128]", ss, k, q)
    if "nosort2" in which.split(","):
        def ns(k, q):
            k1, q1 = jax.lax.sort((k, q), dimension=1, num_keys=1)
            first, last = _run_edges(k1)
            sums = _seg_scan(first, q1, axis=1)
            real_last = last & (k1 != KEY_SENTINEL)
            n_uniq = real_last.sum(axis=1, dtype=jnp.int32)
            ukey = jnp.where(real_last, k1, KEY_SENTINEL)
            usum = jnp.where(real_last, sums, 0.0)
            return ukey, usum, n_uniq.max()
        tcompile(f"dedup-no-sort2 [p={p},128]", ns, k, q)
    if "full" in which.split(","):
        def full(k, q):
            k1, q1 = jax.lax.sort((k, q), dimension=1, num_keys=1)
            first, last = _run_edges(k1)
            sums = _seg_scan(first, q1, axis=1)
            real_last = last & (k1 != KEY_SENTINEL)
            n_uniq = real_last.sum(axis=1, dtype=jnp.int32)
            ukey = jnp.where(real_last, k1, KEY_SENTINEL)
            usum = jnp.where(real_last, sums, 0.0)
            k2, q2 = jax.lax.sort((ukey, usum), dimension=1, num_keys=1)
            return k2[:, :32], q2[:, :32], n_uniq.max()
        tcompile(f"dedup-full [p={p},128]", full, k, q)


if __name__ == "__main__":
    main()
