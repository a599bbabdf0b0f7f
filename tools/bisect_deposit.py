"""Bisect the deposit_and_merge cost on the TPU: time each pipeline piece
with realistic shapes/data (forced sync via scalar pulls)."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timeit(label, fn, n=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    print(f"{label}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


def main():
    e, budget = 256, 768
    pool = e * budget  # 196608
    m = pool * 100  # 19.66M
    t_steps, b = 10000, 512
    flat = b * t_steps  # 5.12M

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # realistic-ish localized positions
    px = jax.random.uniform(k1, (pool,), jnp.float32, -0.25, 0.25)
    py = jax.random.uniform(k2, (pool,), jnp.float32, -0.25, 0.25)
    sigma = jax.random.uniform(k3, (pool,), jnp.float32, 1e-4, 3.4e-3)
    grid = jax.random.randint(key, (5600 * 5600,), -1, 10240, jnp.int16)
    valid_flat = jax.random.uniform(key, (flat,), jnp.float32) < 0.04

    mesh_1d = jnp.linspace(-3.0, 3.0, 10, dtype=jnp.float32)

    # 1. batch compaction: nonzero over [5.1M] + 6 gathers
    def compaction(v):
        (idx,) = jnp.nonzero(v, size=pool, fill_value=0)
        outs = [jax.random.uniform(key, (flat,), jnp.float32)[idx] for _ in range(6)]
        return sum(o.sum() for o in outs)

    timeit("compaction (nonzero 5.1M + 6 gathers)",
           lambda: float(jax.jit(compaction)(valid_flat)))

    # 2. mesh expansion + pad gather
    def mesh_and_gather(px, py, sigma):
        pix_x = px[:, None, None] + sigma[:, None, None] * mesh_1d[:, None]
        pix_y = py[:, None, None] + sigma[:, None, None] * mesh_1d[None, :]
        x_mm = jnp.floor(pix_x * 1000.0)
        y_mm = jnp.floor(pix_y * 1000.0)
        ix = jnp.clip(jnp.round((x_mm + 280.0) / 0.1), 0, 5599).astype(jnp.int32)
        iy = jnp.clip(jnp.round((y_mm + 280.0) / 0.1), 0, 5599).astype(jnp.int32)
        pad = grid[ix * 5600 + iy].astype(jnp.int32)
        return pad.sum()

    timeit("mesh expand + pad gather 19.6M",
           lambda: float(jax.jit(mesh_and_gather)(px, py, sigma)))

    # data for the merge stages
    gkeys = jax.random.randint(key, (m,), 0, e * 10240 * 512, jnp.int32)
    qv = jax.random.uniform(key, (m,), jnp.float32)
    idx32 = jnp.arange(m, dtype=jnp.int32)

    # 3. sort
    timeit("sort 19.6M 2-op", lambda: float(
        jax.jit(lambda k, i: jax.lax.sort((k, i), dimension=0, num_keys=1)[0][::1000000].sum())(gkeys, idx32)))

    # 4. post-sort payload gather
    perm = jax.lax.sort((gkeys, idx32), dimension=0, num_keys=1)[1]
    timeit("payload gather 19.6M", lambda: float(
        jax.jit(lambda q, p: q[p].sum())(qv, perm)))

    # 5. boundary + cumsum-based seg ids
    keys_s = jax.lax.sort((gkeys,), dimension=0, num_keys=1)[0]

    def segids(ks):
        boundary = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        return jnp.cumsum(boundary)[-1]

    timeit("boundary+cumsum 19.6M", lambda: float(jax.jit(segids)(keys_s)))

    # 6. slot scatters (current implementation: 3 scatters into 3.3M)
    n_slots = e * 12289
    slot = jnp.clip(jnp.cumsum(jnp.ones(m, jnp.int32)) // 6, 0, n_slots - 1)

    def scatters(q, s, i):
        a = jnp.zeros(n_slots, jnp.float32).at[s].add(q, indices_are_sorted=True)
        b = jnp.full(n_slots, 2**31 - 1, jnp.int32).at[s].min(i, indices_are_sorted=True)
        c = jnp.zeros(n_slots, jnp.int32).at[s].max(i, indices_are_sorted=True)
        return a[::100000].sum() + b[::100000].sum() + c[::100000].sum()

    timeit("3 slot scatters 19.6M (sorted idx)",
           lambda: float(jax.jit(scatters)(qv, slot, idx32)))

    # 7. alternative: nonzero boundary + segment gathers + f64 cumsum
    def gather_merge(ks, q):
        boundary = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        (starts,) = jnp.nonzero(boundary, size=n_slots, fill_value=m - 1)
        prefix = jnp.cumsum(q.astype(jnp.float64))
        ends = jnp.concatenate([starts[1:], jnp.array([m - 1])])
        qseg = prefix[ends] - prefix[starts]
        kseg = ks[starts]
        return qseg[::100000].sum() + kseg[::100000].sum()

    timeit("gather-merge (nonzero+f64 cumsum+gathers)",
           lambda: float(jax.jit(gather_merge)(keys_s, qv)))


if __name__ == "__main__":
    main()
