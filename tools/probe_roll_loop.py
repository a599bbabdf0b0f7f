"""Feasibility probe: dynamic-shift pltpu.roll inside lax.fori_loop.

The fori-loop bitonic restructure (BASELINE.md r5 "parked" note) needs a
sublane rotation whose amount is a TRACED value (1 << i inside the
stage loop). This probes exactly that op pattern standalone — a [S,128]
i32 tile rolled along axis 0 by 2^i for i = 0..6 inside a fori_loop —
on CPU interpret mode first, then on the real backend, before any
rewrite of sort_pallas. Also probes the same roll on a transposed
[128,S] tile (the transposed lane-stage layout).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, s: int, trans: bool):
    x = x_ref[0]
    if trans:
        x = x.T

    def body(i, acc):
        k = jnp.int32(1) << i
        r = pltpu.roll(acc, k, 0)
        sub = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
        bit = (sub >> i) & jnp.int32(1)
        return jnp.where(bit == 0, r, acc + r)

    x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(7), body, x)
    if trans:
        x = x.T
    o_ref[0] = x


def run(interpret: bool, trans: bool, s: int = 64):
    x = np.arange(s * 128, dtype=np.int32).reshape(1, s, 128)
    zero = np.int32(0)
    spec = pl.BlockSpec((1, s, 128), lambda b: (b, zero, zero))
    fn = pl.pallas_call(
        partial(_kernel, s=s, trans=trans),
        grid=(1,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, s, 128), jnp.int32),
        interpret=interpret,
    )
    t0 = time.perf_counter()
    out = np.asarray(fn(jnp.asarray(x)))
    dt = time.perf_counter() - t0
    return out, dt


def ref(x, trans):
    x = x[0]
    if trans:
        x = x.T
    for i in range(7):
        k = 1 << i
        r = np.roll(x, k, axis=0)
        sub = (np.arange(x.shape[0]) >> i)[:, None] & 1
        x = np.where(sub == 0, r, x + r)
    if trans:
        x = x.T
    return x


def main():
    x = np.arange(64 * 128, dtype=np.int32).reshape(1, 64, 128)
    for trans in (False, True):
        want = ref(x, trans)
        try:
            got, dt = run(interpret=jax.default_backend() != "tpu",
                          trans=trans)
            ok = bool((got[0] == want).all())
            print(f"trans={trans}: ok={ok} t={dt:.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"trans={trans}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
