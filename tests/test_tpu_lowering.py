"""Cross-platform TPU (Mosaic) lowering of every Pallas kernel.

`jax.export.export(..., platforms=["tpu"])` runs the full Mosaic
lowering pipeline HOST-SIDE on the CPU backend — no device needed. This
is the regression guard for the round-4 TPU A/B failure mode: all three
new kernels were bit-exact under the Pallas interpreter yet UNLOWERABLE
for real TPU, because weak-typed Python scalars under global x64 leak
64-bit ops into the kernel jaxpr (a bare ``// 10`` mints an in-kernel
i64->i32 convert that infinitely recurses Mosaic's ``_convert_helper``;
a bare ``0.0`` mints unsupported f64 casts; a scalar-output ``jnp.sum``
takes Mosaic's proxy path, which re-traces WITHOUT the explicit dtype
and creates an i64 accumulator). Interpret-mode tests cannot catch any
of that; this file would have caught those PYTHON-SIDE leaks.

KNOWN LIMIT (round-4 measured, round-5 resolved but still true of the
method): host-side lowering stops at serialized MLIR — it does NOT run
the backend TPU compiler. In round 4 every kernel lowered clean here
yet the in-VMEM sorts failed on silicon; round 5 root-caused those to
two backend-only bool-legalization hazards (bool==bool and
select-of-bools, each an i8->i1 ``arith.trunci`` the backend rejects —
fixed in ``sort_pallas._stage``) plus a genuine resource death of the
fully unrolled fused-merge network at W=57600 (lifted by the
``lane_mode="loop"`` restructure, BASELINE.md r5). A green run of this
file therefore means "no Python-side lowering bugs", not "compiles on
silicon".

Reference behavioral basis for the kernels themselves:
/root/reference/src/attpc_engine/detector/solver.py (transport),
transporter.py:124-249 (diffusion mesh + pad lookup + merge).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attpc_engine_tpu.detector import deposit_pallas as dp
from attpc_engine_tpu.detector import sort_pallas as sp
from attpc_engine_tpu.detector.transport import TrackSpecies
from attpc_engine_tpu.detector.transport_pallas import integrate_tracks_pallas


def _lower_for_tpu(fn, *args):
    """Export fn for the tpu platform; returns serialized MLIR bytes."""
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
    return exp


def test_transport_kernel_lowers_for_tpu():
    b = 8
    species = TrackSpecies(
        mass=jnp.array([938.0], dtype=jnp.float32),
        charge=jnp.array([1.0], dtype=jnp.float32),
        log_ke_lo=-3.0,
        dlog_ke=0.05,
        dedx=jnp.ones((1, 64), dtype=jnp.float32),
    )

    def f(pos, gv, sidx):
        return integrate_tracks_pallas(
            pos, gv, sidx, species,
            density=1e-4, bfield=2.85, efield=45000.0,
            n_steps=32, interpret=False,
        )

    _lower_for_tpu(
        f,
        jnp.zeros((b, 3), jnp.float32),
        jnp.full((b, 3), 0.1, jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )


@pytest.mark.parametrize("two_stage", [False, True])
def test_lookup_kernels_lower_for_tpu(two_stage):
    p = 576
    ix = jnp.zeros((p, 10), np.int32)
    iy = jnp.zeros((p, 10), np.int32)
    tbr = jnp.zeros((p,), np.int32)
    hi = jnp.zeros((dp._NX, dp._NY), np.float32)
    lo = jnp.zeros((dp._NX, dp._NY), np.float32)
    fn = (
        dp.packed_key_lookup_2s_pallas if two_stage
        else dp.packed_key_lookup_pallas
    )

    def f(ix, iy, tbr, hi, lo):
        return fn(ix, iy, tbr, hi, lo, rank_bits=7, sentinel=2**30,
                  interpret=False)

    _lower_for_tpu(f, ix, iy, tbr, hi, lo)


@pytest.mark.parametrize("lane_mode", ["roll", "transpose"])
def test_sort_pairs_lowers_for_tpu(lane_mode):
    e, w = 2, 4096  # small rows: the network is the same code at any 2^k
    a = jnp.zeros((e, w), np.int32)
    b = jnp.zeros((e, w), np.int32)

    def f(a, b):
        return sp.sort_pairs_pallas(a, b, interpret=False,
                                    lane_mode=lane_mode)

    _lower_for_tpu(f, a, b)


@pytest.mark.parametrize("lane_mode", ["roll", "transpose"])
def test_fused_merge_lowers_for_tpu(lane_mode):
    e, w = 2, 4096
    packed = jnp.zeros((e, w), np.int32)
    qv = jnp.zeros((e, w), np.float32)

    def f(packed, qv):
        return sp.merge_runs_fused_pallas(
            packed, qv, 1024, 7, interpret=False, lane_mode=lane_mode
        )

    _lower_for_tpu(f, packed, qv)
