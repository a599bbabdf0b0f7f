"""Compile-time bisect of the deposit primitives on the TPU backend.

Times AOT compilation (no execution) of each candidate primitive at a
ladder of widths to find the one with superlinear compile cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def tcompile(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_low = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_c = time.perf_counter() - t0
    print(f"{label}: lower {t_low:.1f}s compile {t_c:.1f}s", flush=True)


def seg_scan(first, values, axis):
    def op(a, b):
        af, av = a
        bf, bv = b
        return af | bf, bv + jnp.where(bf, 0.0, av)

    _, sums = jax.lax.associative_scan(op, (first, values), axis=axis)
    return sums


def main():
    e = 64
    which = os.environ.get("PRIM", "sort1,scan,rowsort,sortstable")
    for w in (4096, 8192, 16384):
        k = jnp.zeros((e, w), jnp.int32)
        q = jnp.zeros((e, w), jnp.float32)
        l = jnp.zeros((e, w), jnp.int32)
        f = jnp.zeros((e, w), bool)
        if "sort1" in which:
            tcompile(
                f"sort [e,{w}] 3op unstable",
                lambda k, q, l: jax.lax.sort((k, q, l), dimension=1, num_keys=1),
                k, q, l,
            )
        if "sortstable" in which:
            tcompile(
                f"sort [e,{w}] 3op stable",
                lambda k, q, l: jax.lax.sort(
                    (k, q, l), dimension=1, is_stable=True, num_keys=1
                ),
                k, q, l,
            )
        if "scan" in which:
            tcompile(
                f"assoc_scan [e,{w}]",
                lambda f, q: seg_scan(f, q, 1),
                f, q,
            )
    if "rowsort" in which:
        for p in (2048, 16384, 65536):
            kk = jnp.zeros((p, 128), jnp.int32)
            qq = jnp.zeros((p, 128), jnp.float32)
            tcompile(
                f"rowsort [{p},128] 2op",
                lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=1),
                kk, qq,
            )


if __name__ == "__main__":
    main()
