"""A/B microbench: multi-operand window sorts vs single-i64 packed sorts,
and 2x i32 flat gathers vs 1x i64 flat gather, at the fused-step shapes.

Hypothesis: XLA TPU sort cost tracks bytes-per-lane moved through the
sorting network, so packing (key i32, payload f32) into one i64 lane
(8 B vs 12 B) and dropping the second operand should cut sort time ~1/3;
same for the 3-operand convert sort. Flat gathers are issue-rate bound
(~8.6 ns/lookup, element-width invariant), so one i64 gather should cost
half of two i32 gathers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_enable_x64", True)  # package default (i64 lanes)

E = int(os.environ.get("MB_EVENTS", 384))
W = int(os.environ.get("MB_WINDOW", 57600))
W2 = int(os.environ.get("MB_WINDOW2", 12288))
POOL = int(os.environ.get("MB_POOL", E * 4096))


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**28, (E, W)), dtype=jnp.int32)
    q = jnp.asarray(rng.random((E, W)), dtype=jnp.float32)
    k2 = jnp.asarray(rng.integers(0, 2**28, (E, W2)), dtype=jnp.int32)
    q2 = jnp.asarray(rng.random((E, W2)), dtype=jnp.float32)
    m2 = jnp.asarray(rng.integers(0, 2**31 - 1, (E, W2)), dtype=jnp.int32)

    @jax.jit
    def sort2(keys, q):
        a, b = jax.lax.sort((keys, q), dimension=1, num_keys=1)
        return a[:, :1], b[:, :1]

    @jax.jit
    def sort1_i64(keys, q):
        qb = jax.lax.bitcast_convert_type(q, jnp.int32).astype(jnp.uint32)
        kk = (keys.astype(jnp.int64) << 32) | qb.astype(jnp.int64)
        kk = jax.lax.sort(kk, dimension=1)
        ks = (kk >> 32).astype(jnp.int32)
        qs = jax.lax.bitcast_convert_type(
            (kk & 0xFFFFFFFF).astype(jnp.uint32), jnp.float32
        )
        return ks[:, :1], qs[:, :1]

    @jax.jit
    def sort3(k, q, m):
        a, b, c = jax.lax.sort((k, q, m), dimension=1, num_keys=1)
        return a[:, :1], b[:, :1], c[:, :1]

    @jax.jit
    def sort1_i64_w2(k, q, m):
        qb = jax.lax.bitcast_convert_type(q, jnp.int32).astype(jnp.uint32)
        kk = (
            (k.astype(jnp.int64) << 32)
            | qb.astype(jnp.int64)
        )
        kk = jax.lax.sort(kk, dimension=1)
        return kk[:, :1]

    print(f"[shapes] window sort [{E}, {W}], convert sort [{E}, {W2}]",
          file=sys.stderr)
    t = timeit(sort2, keys, q)
    print(f"sort 2-op (i32,f32) [{E},{W}]: {t*1e3:.1f} ms")
    t = timeit(sort1_i64, keys, q)
    print(f"sort 1-op i64       [{E},{W}]: {t*1e3:.1f} ms")
    t = timeit(sort3, k2, q2, m2)
    print(f"sort 3-op           [{E},{W2}]: {t*1e3:.1f} ms")
    t = timeit(sort1_i64_w2, k2, q2, m2)
    print(f"sort 1-op i64       [{E},{W2}]: {t*1e3:.1f} ms")

    # gathers
    pool_i32a = jnp.asarray(rng.integers(0, 2**31 - 1, E * W2), jnp.int32)
    pool_i32b = jnp.asarray(rng.integers(0, 2**31 - 1, E * W2), jnp.int32)
    pool_i64 = (pool_i32a.astype(jnp.int64) << 32) | pool_i32b.astype(
        jnp.uint32
    ).astype(jnp.int64)
    idx = jnp.asarray(rng.integers(0, E * W2, POOL), jnp.int32)

    @jax.jit
    def gather2(a, b, idx):
        return a[idx][:1], b[idx][:1]

    @jax.jit
    def gather1(p, idx):
        g = p[idx]
        return (g >> 32).astype(jnp.int32)[:1], (
            g & 0xFFFFFFFF
        ).astype(jnp.uint32)[:1]

    t = timeit(gather2, pool_i32a, pool_i32b, idx)
    print(f"2x i32 flat gather [{POOL}] from [{E*W2}]: {t*1e3:.1f} ms")
    t = timeit(gather1, pool_i64, idx)
    print(f"1x i64 flat gather [{POOL}] from [{E*W2}]: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
