"""Bisect which deposit_and_merge shape blows up the TPU compiler.

Compiles (AOT, no execute) deposit_and_merge at a ladder of
(events, point_budget, local_cap) sizes and prints compile wall time for
each. Run on the real TPU. Env: BISECT_CONFIGS="e,pb,lc;e,pb,lc;..."
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

from attpc_engine_tpu.detector.deposition import deposit_and_merge, event_keys

CONFIGS = os.environ.get(
    "BISECT_CONFIGS", "16,128,32;64,256,32;64,1024,64;384,1024,16;384,1024,64"
)


def main():
    t_steps = 100  # the [T, B] input shape barely matters for the merge
    k = 2
    for spec in CONFIGS.split(";"):
        e, pb, lc = (int(x) for x in spec.split(","))
        b = e * k
        positions = jnp.zeros((t_steps, b, 3), jnp.float32)
        electrons = jnp.ones((t_steps, b), jnp.int32)
        valid = jnp.ones((t_steps, b), bool)
        labels = jnp.zeros((b,), jnp.int32)
        grid = jnp.zeros((560, 560), jnp.int32)
        t0 = time.perf_counter()
        lowered = deposit_and_merge.lower(
            event_keys(jax.random.PRNGKey(0), e),
            positions,
            electrons,
            valid,
            labels,
            grid,
            grid_lo_mm=-280.0,
            grid_n_mm=560,
            diffusion=0.277,
            efield=45000.0,
            drift_velocity=0.001,
            micromegas_edge=10.0,
            length=1.0,
            mpgd_gain=175000.0,
            n_events=e,
            tracks_per_event=k,
            point_budget=pb,
            local_cap=lc,
        )
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_comp = time.perf_counter() - t0
        print(
            f"e={e} pb={pb} lc={lc} w={pb * min(lc, 100)}: "
            f"lower {t_lower:.1f}s compile {t_comp:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
