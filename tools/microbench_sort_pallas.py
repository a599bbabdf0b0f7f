"""A/B the in-VMEM Pallas bitonic sort vs lax.sort at bench shapes.

Serialize with other TPU scripts (CLAUDE.md). Env: SORT_E (default 384),
SORT_W (default 57600), SORT_REPS (default 5). Prints per-variant medians
and the speedup. Correctness is asserted (pair multisets per row).

The roofline prediction (docs/roofline.md): lax.sort is HBM-bound at
~136 network passes (~30 ms/sort for the i64 single-operand form inside
the 61 ms _merge_runs pair); the kernel pays HBM twice and should land
at the VPU compare-exchange cost, ~7-15 ms per sort per 384 rows.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import attpc_engine_tpu  # noqa: F401, E402  (x64 + cache config)
from attpc_engine_tpu.detector.sort_pallas import sort_pairs_pallas  # noqa: E402


def _sync(x):
    # block_until_ready is unreliable over the axon tunnel (CLAUDE.md);
    # force a scalar host pull instead
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    e = int(os.environ.get("SORT_E", 384))
    w = int(os.environ.get("SORT_W", 57600))
    reps = int(os.environ.get("SORT_REPS", 5))
    rng = np.random.default_rng(0)
    # key distribution like the merge's: ~37k unique of 57.6k lanes,
    # packed (space_key << 2) | rank
    hi = (rng.integers(0, 40_000, (e, w)).astype(np.int32) << 2) | (
        rng.integers(0, 4, (e, w)).astype(np.int32)
    )
    lo = np.abs(rng.normal(100.0, 30.0, (e, w)).astype(np.float32)).view(
        np.int32
    )
    hi_d, lo_d = jnp.asarray(hi), jnp.asarray(lo)

    @jax.jit
    def lax_sort(h, l):  # noqa: E741
        g = (h.astype(jnp.int64) << 32) | l.astype(jnp.uint32).astype(
            jnp.int64
        )
        g = jax.lax.sort(g, dimension=1, is_stable=False)
        return (g >> 32).astype(jnp.int32), (g & 0xFFFFFFFF).astype(
            jnp.int32
        )

    variants = {
        "lax.sort i64": lambda: lax_sort(hi_d, lo_d),
        "pallas roll": lambda: sort_pairs_pallas(hi_d, lo_d,
                                                 lane_mode="roll"),
        "pallas transpose": lambda: sort_pairs_pallas(
            hi_d, lo_d, lane_mode="transpose"),
    }
    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        outs[name] = fn()
        _sync(outs[name])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s",
              flush=True)

    meds = {}
    for name, fn in variants.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(fn())
            ts.append(time.perf_counter() - t0)
        meds[name] = float(np.median(ts)) * 1000
        print(f"{name}: median {meds[name]:.1f} ms over {reps}", flush=True)

    a = np.stack([np.asarray(x) for x in outs["lax.sort i64"]], -1)
    for name in ("pallas roll", "pallas transpose"):
        b = np.stack([np.asarray(x) for x in outs[name]], -1)
        np.testing.assert_array_equal(a, b, err_msg=name)
    best = min(("pallas roll", "pallas transpose"), key=meds.get)
    print(f"bit-exact OK; best {best}: "
          f"{meds['lax.sort i64'] / meds[best]:.2f}x vs lax.sort")


if __name__ == "__main__":
    main()
