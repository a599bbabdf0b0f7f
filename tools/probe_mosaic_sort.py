"""Find the exact op that crashes the TPU backend compiler in sort_pallas.

r5 bisect (tools/bisect_sort_compile.py, /tmp/r5_sortbisect.log): every
shape from w=4096 to w=57600, both lane modes, fails the Mosaic remote
compile in 1.4-3.1 s — far too fast for a 78-136-stage resource blowup.
Some single construct is fatal at any size. This probe compiles a ladder
of minimal kernels on the SAME block layout ([1, S, 128] blocks over an
(E,) grid) and prints one JSON verdict per rung with the FULL error text,
so the culprit is the first rung that flips to failed.

Run serialized with other TPU work. Env: PROBE_S (default 16 sublanes).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import numpy as np  # noqa: E402

import attpc_engine_tpu  # noqa: F401, E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from attpc_engine_tpu.detector import sort_pallas as sp  # noqa: E402

S = int(os.environ.get("PROBE_S", 16))
E = 8
LANES = 128


def k_copy(a_ref, o_ref):
    o_ref[0] = a_ref[0]


def k_roll_lane(a_ref, o_ref):
    o_ref[0] = jnp.roll(a_ref[0], 1, axis=1)


def k_roll_sub(a_ref, o_ref):
    o_ref[0] = jnp.roll(a_ref[0], 1, axis=0)


def k_iota_mask(a_ref, o_ref):
    x = a_ref[0]
    io = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    o_ref[0] = jnp.where((io & np.int32(1)) == 0, x, -x)


def k_transpose(a_ref, o_ref):
    o_ref[0] = a_ref[0].T.T


def k_stage_lane(a_ref, o_ref):
    h, l = sp._stage(a_ref[0], a_ref[0], 1, 2, False)  # noqa: E741
    o_ref[0] = h + l


def k_stage_sub(a_ref, o_ref):
    h, l = sp._stage(a_ref[0], a_ref[0], LANES, 2 * LANES, False)  # noqa: E741
    o_ref[0] = h + l


def k_phase2(a_ref, o_ref):
    h, l = sp._bitonic(a_ref[0], a_ref[0], 2, "roll")  # noqa: E741
    o_ref[0] = h + l


def k_bitonic_lane_only(a_ref, o_ref):
    # phases up to 128: lane-dim stages only
    h, l = sp._bitonic(a_ref[0], a_ref[0], LANES, "roll")  # noqa: E741
    o_ref[0] = h + l


def k_bitonic_full(a_ref, o_ref, *, total):
    h, l = sp._bitonic(a_ref[0], a_ref[0], total, "roll")  # noqa: E741
    o_ref[0] = h + l


RUNGS = [
    ("copy", k_copy),
    ("roll_lane", k_roll_lane),
    ("roll_sublane", k_roll_sub),
    ("iota_mask_where", k_iota_mask),
    ("transpose_roundtrip", k_transpose),
    ("one_stage_lane_d1", k_stage_lane),
    ("one_stage_sublane_d128", k_stage_sub),
    ("bitonic_phase_sz2", k_phase2),
    ("bitonic_lane_phases", k_bitonic_lane_only),
    ("bitonic_full", None),  # bound below with total
]


def main() -> None:
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 20, (E, S, LANES)).astype(np.int32)
    ad = jnp.asarray(a)
    zero = np.int32(0)
    spec = pl.BlockSpec((1, S, LANES), lambda b: (b, zero, zero))
    total = S * LANES
    for name, kern in RUNGS:
        if kern is None:
            kern = partial(k_bitonic_full, total=total)
        t0 = time.perf_counter()
        out = {"rung": name, "s": S}
        try:
            f = pl.pallas_call(
                kern,
                grid=(E,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((E, S, LANES), jnp.int32),
            )
            r = jax.jit(f)(ad)
            float(np.asarray(r.ravel()[0]))
            out["ok_s"] = round(time.perf_counter() - t0, 1)
        except Exception as exc:  # noqa: BLE001
            out["failed"] = f"{type(exc).__name__}: {exc}"
            out["t_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
