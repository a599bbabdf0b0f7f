"""Pallas pad-lookup kernel: the deposit gather end-run.

The deposit step's hottest op is the pad-table lookup: 100 mesh pixels per
deposit point -> 22M random gathers per batch, and XLA's elementwise
gather is issue-rate bound at ~8.6 ns/lookup (invariant to table size and
element width — BASELINE.md), ~185 ms at bench shapes. An XLA multi-pixel
patch gather (lax.gather with multi-element slice_sizes) is not viable
either: compile time explodes (>10 min for one [221k, 24, 32] slice
gather, measured).

This kernel exploits the mesh's OUTER-PRODUCT structure instead: the
10x10 pixel block of one point is {x_i} x {y_j} with only 10 distinct
x cells and 10 distinct y cells, so

  pad[p, i, j] = T[ix[p, i], iy[p, j]]

factors into (1) fetching the 10 table ROWS T[ix[p, i], :] per point —
done for a whole block of points as ONE one-hot MXU matmul — and (2)
selecting 10 columns from each fetched row — done as 10 vectorized
VPU compare-multiply-reduce passes. No per-element gather anywhere.

Exactness: the table is split into two <= 8-bit planes (v >> 7, v & 127),
both exactly representable in bfloat16, and the one-hot operand is 0/1
(exact in any precision), so two default-precision bf16 matmuls with f32
accumulation reproduce the integer table values EXACTLY (each product is
an exact bf16 multiply, and every row sums one nonzero term). The planes
are recombined in f32 before column selection (values <= 10240 << 2^24).

Table layout: [560 (x, sublanes), 640 (y, lanes)] — x rows are contracted
by the one-hot matmul, y columns selected by the VPU pass. Entries hold
the PAD ID (0..10239) with holes/beam pads/padding folded to the sentinel
10240 (PAD_ID_SENTINEL); the (pad * 512 + tb) merge key is formed by the
caller in XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "pad_lookup_pallas",
    "packed_key_lookup_pallas",
    "packed_key_lookup_2s_pallas",
    "PAD_ID_SENTINEL",
    "build_plane_tables",
]

PAD_ID_SENTINEL = np.int32(10240)
_PB = 64  # points per grid block (PB=128 hits the 16 MB scoped-VMEM limit: 20.3 MB measured)
_NX = 560  # table rows (x cells, >= n_mm = 559)
_NY = 640  # table cols (y cells, lane-padded)


def build_plane_tables(grid_mm: np.ndarray, beam_mask: np.ndarray):
    """[n_mm, n_mm] pad-id grid (-1 holes) -> two [560, 640] f32 planes.

    grid_mm is indexed [x_cell, y_cell] (1-mm floor quirk resolution, see
    Config.device_arrays). Vetoed cells (holes, beam pads) and padding get
    PAD_ID_SENTINEL. Returns (hi, lo) with value = hi * 128 + lo.
    """
    n_mm = grid_mm.shape[0]
    if n_mm >= _NX:
        # the deposit path aliases invalid pixels onto row _NX-1 / col
        # _NY-1 and relies on them being sentinel-filled padding, so the
        # grid must leave at least one padding row and column
        raise ValueError(
            f"pad grid too large for the lookup kernel: {n_mm} >= {_NX}"
        )
    vetoed = (grid_mm < 0) | beam_mask[np.clip(grid_mm, 0, None)]
    ids = np.where(vetoed, int(PAD_ID_SENTINEL), grid_mm).astype(np.int32)
    full = np.full((_NX, _NY), int(PAD_ID_SENTINEL), dtype=np.int32)
    full[:n_mm, :n_mm] = ids
    hi = (full >> 7).astype(np.float32)
    lo = (full & 127).astype(np.float32)
    return hi, lo


def _select_padvals(ixf_ref, ymat_ref, thi_ref, tlo_ref):
    """Shared kernel core: [R, 10] f32 pad ids at (ix of row, iy of col)."""
    f32 = jnp.float32
    r = ixf_ref.shape[0]
    ixf = ixf_ref[:]  # [R, 1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, _NX), 1)
    ohx = (rows == ixf).astype(jnp.bfloat16)  # [R, _NX], exact 0/1

    dims = (((1,), (0,)), ((), ()))
    r_hi = jax.lax.dot_general(
        ohx, thi_ref[:], dims, preferred_element_type=f32
    )
    r_lo = jax.lax.dot_general(
        ohx, tlo_ref[:], dims, preferred_element_type=f32
    )
    rowvals = r_hi * f32(128.0) + r_lo  # [R, _NY] f32, exact integers

    cols = jax.lax.broadcasted_iota(jnp.int32, (r, _NY), 1)
    ymat = ymat_ref[:]  # [R, 10]
    outs = []
    for j in range(10):
        # select-then-reduce (not convert+multiply): one fewer VPU pass
        # over the [R, _NY] tile per output column
        hit = jnp.where(cols == ymat[:, j][:, None], rowvals, f32(0.0))
        outs.append(jnp.sum(hit, axis=1))
    return jnp.stack(outs, axis=1)


def _lookup_kernel(ixf_ref, ymat_ref, thi_ref, tlo_ref, out_ref):
    """One block of _PB points.

    ixf_ref: [_PB*10, 1] i32 — x cell of pixel column i, row r = p*10 + i,
        clipped to [0, _NX).
    ymat_ref: [_PB*10, 10] i32 — y cells replicated per row: ymat[r, j] =
        iy[p, j], clipped to [0, _NY).
    thi/tlo_ref: [_NX, _NY] bf16 planes.
    out_ref: [_PB*10, 10] f32 — out[p*10 + i, j] = pad id at (ix_i, iy_j).
    """
    out_ref[:] = _select_padvals(ixf_ref, ymat_ref, thi_ref, tlo_ref)


def _packed_kernel(
    ixf_ref, ymat_ref, tbr_ref, thi_ref, tlo_ref, out_ref, *,
    rank_bits: int, sentinel: int,
):
    """Fused variant: emits the MERGE KEY directly.

    tbr_ref: [_PB*10, 1] i32 — per point (tb << rank_bits) | rank,
        replicated over the point's 10 rows. Invalid pixels must have been
        aliased by the caller onto sentinel table cells (padding row/cols),
        so validity is just pad < PAD_ID_SENTINEL here.
    out_ref: [_PB*10, 10] i32 — ((pad*512 + tb) << rank_bits) | rank, or
        ``sentinel`` where the pad cell is vetoed/out of plane.
    """
    vals = _select_padvals(ixf_ref, ymat_ref, thi_ref, tlo_ref)
    vi = vals.astype(jnp.int32)
    pk = vi * np.int32(512 << rank_bits) + tbr_ref[:]
    out_ref[:] = jnp.where(
        vi < np.int32(int(PAD_ID_SENTINEL)), pk, np.int32(sentinel)
    )


@partial(jax.jit, static_argnames=("interpret",))
def pad_lookup_pallas(
    ix: jax.Array,
    iy: jax.Array,
    plane_hi: jax.Array,
    plane_lo: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched mesh pad lookup.

    ix, iy: [P, 10] int32 mm-cell indices (will be clipped; out-of-plane
        pixels must be masked by the CALLER — clipping aliases them onto
        edge cells).
    plane_hi, plane_lo: [560, 640] f32 planes from build_plane_tables
        (converted to bf16 here; pass numpy constants so they embed).

    Returns [P, 10, 10] int32: pad id at (ix[p, i], iy[p, j]), with
    PAD_ID_SENTINEL for vetoed/hole cells.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = ix.shape[0]
    nb = -(-p // _PB)
    p_pad = nb * _PB
    ixc = jnp.clip(ix, 0, _NX - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, _NY - 1).astype(jnp.int32)
    if p_pad != p:
        ixc = jnp.pad(ixc, ((0, p_pad - p), (0, 0)))
        iyc = jnp.pad(iyc, ((0, p_pad - p), (0, 0)))

    # row r = p*10 + i carries x cell i; y cells replicate over i
    ixf = ixc.reshape(p_pad * 10, 1)
    ymat = jnp.broadcast_to(
        iyc[:, None, :], (p_pad, 10, 10)
    ).reshape(p_pad * 10, 10)

    thi = plane_hi.astype(jnp.bfloat16)
    tlo = plane_lo.astype(jnp.bfloat16)

    # NOTE: index-map constants must be pinned to int32 — x64 is enabled
    # globally, a bare Python 0 becomes i64 and Mosaic fails to legalize
    # the index map's func.return (measured on real TPU).
    zero = np.int32(0)
    out = pl.pallas_call(
        _lookup_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_PB * 10, 1), lambda b: (b, zero)),
            pl.BlockSpec((_PB * 10, 10), lambda b: (b, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
        ],
        out_specs=pl.BlockSpec((_PB * 10, 10), lambda b: (b, zero)),
        out_shape=jax.ShapeDtypeStruct((p_pad * 10, 10), jnp.float32),
        interpret=interpret,
    )(ixf, ymat, thi, tlo)
    return out.reshape(p_pad, 10, 10).astype(jnp.int32)[:p]


_PB2 = 60  # points per block for the two-stage variant (5 groups of 12)
_GP = 12  # points per MXU select group: 120 rows/cols, 128-lane aligned
_NG = _PB2 // _GP
_GL = 128  # lanes per select group


def _packed_kernel_2s(
    ixf_ref, ylane_ref, tbr_ref, thi_ref, tlo_ref, out_ref, *,
    rank_bits: int, sentinel: int,
):
    """Two-stage variant: the column select is a SECOND one-hot MXU
    matmul over 12-point groups + a narrow 128-lane VPU select, instead
    of 10 compare-select-reduce passes over the full 640-lane width
    (~5x less VPU work; the matmuls are noise on the MXU).

    Exactness: the second matmul runs per PLANE (hi/lo <= 8 bits, exact
    in bf16 — the combined pad id 0..10240 would NOT be) with one-hot
    columns, so every output is a single exact product; planes recombine
    in f32 afterwards. No lane-split reshapes anywhere (the Mosaic
    hazard that killed the all-pairs formulation, CLAUDE.md): the group
    one-hot B[c, k] = (c == y_lane[k]) is built from a sublane iota
    against a lane-indexed target vector prepared by the CALLER in XLA
    (ylane_ref[g, lp*10 + j] = iy[point g*12+lp, j], -1 padding), and
    the select targets are pure iota arithmetic (c == (r//10)*10 + j).

    ixf_ref: [600, 1] i32; ylane_ref: [_NG, 128] i32; tbr_ref: [600, 1].
    out_ref: [600, 10] i32 packed merge keys (same contract as
    _packed_kernel).
    """
    f32 = jnp.float32
    r = ixf_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, _NX), 1)
    ohx = (rows == ixf_ref[:]).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    r_hi = jax.lax.dot_general(
        ohx, thi_ref[:], dims, preferred_element_type=f32
    )
    r_lo = jax.lax.dot_general(
        ohx, tlo_ref[:], dims, preferred_element_type=f32
    )

    gr = _GP * 10  # 120 rows per group
    csub = jax.lax.broadcasted_iota(jnp.int32, (_NY, _GL), 0)
    rsub = jax.lax.broadcasted_iota(jnp.int32, (gr, _GL), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (gr, _GL), 1)
    for g in range(_NG):
        y = ylane_ref[0, g][None, :]  # [1, _GL]
        bmat = (csub == y).astype(jnp.bfloat16)  # [640, 128] one-hot cols
        a_hi = r_hi[g * gr:(g + 1) * gr].astype(jnp.bfloat16)
        a_lo = r_lo[g * gr:(g + 1) * gr].astype(jnp.bfloat16)
        z = (
            jax.lax.dot_general(a_hi, bmat, dims, preferred_element_type=f32)
            * f32(128.0)
            + jax.lax.dot_general(a_lo, bmat, dims, preferred_element_type=f32)
        )  # [120, 128] exact pad ids at (row r, y_lane col)
        # np.int32 literals: a bare Python int is weak-i64 under global
        # x64, and the resulting in-kernel i64->i32 convert sends Mosaic's
        # _convert_helper into infinite recursion (RecursionError at
        # lowering — the r4 TPU A/B failure mode for every +2s combo)
        base = (rsub // np.int32(10)) * np.int32(10)  # local point * 10
        outs = []
        for j in range(10):
            hit = jnp.where(lane == base + np.int32(j), z, f32(0.0))
            outs.append(jnp.sum(hit, axis=1))
        vi = jnp.stack(outs, axis=1).astype(jnp.int32)  # [120, 10]
        pk = vi * np.int32(512 << rank_bits) + tbr_ref[g * gr:(g + 1) * gr]
        out_ref[g * gr:(g + 1) * gr] = jnp.where(
            vi < np.int32(int(PAD_ID_SENTINEL)), pk, np.int32(sentinel)
        )


@partial(jax.jit, static_argnames=("rank_bits", "sentinel", "interpret"))
def packed_key_lookup_2s_pallas(
    ix: jax.Array,
    iy: jax.Array,
    tbr: jax.Array,
    plane_hi: jax.Array,
    plane_lo: jax.Array,
    rank_bits: int,
    sentinel: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Two-stage (MXU select) variant of ``packed_key_lookup_pallas`` —
    identical contract and bit-exact output (tests/test_deposit_pallas.py),
    different machine mapping (see ``_packed_kernel_2s``)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = ix.shape[0]
    nb = -(-p // _PB2)
    p_pad = nb * _PB2
    ixc = jnp.clip(ix, 0, _NX - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, _NY - 1).astype(jnp.int32)
    tbr = tbr.astype(jnp.int32)
    if p_pad != p:
        pad_n = p_pad - p
        ixc = jnp.pad(ixc, ((0, pad_n), (0, 0)), constant_values=_NX - 1)
        iyc = jnp.pad(iyc, ((0, pad_n), (0, 0)), constant_values=_NY - 1)
        tbr = jnp.pad(tbr, (0, pad_n))

    ixf = ixc.reshape(p_pad * 10, 1)
    tbrf = jnp.broadcast_to(tbr[:, None], (p_pad, 10)).reshape(p_pad * 10, 1)
    # lane-indexed select targets, prepared where layout changes are free:
    # ylane[b, g, lp*10 + j] = iy of point (b*60 + g*12 + lp), pixel col j
    ylane = jnp.pad(
        iyc.reshape(nb, _NG, _GP * 10),
        ((0, 0), (0, 0), (0, _GL - _GP * 10)),
        constant_values=-1,
    )

    thi = plane_hi.astype(jnp.bfloat16)
    tlo = plane_lo.astype(jnp.bfloat16)

    zero = np.int32(0)
    kern = partial(_packed_kernel_2s, rank_bits=rank_bits, sentinel=sentinel)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_PB2 * 10, 1), lambda b: (b, zero)),
            pl.BlockSpec((1, _NG, _GL), lambda b: (b, zero, zero)),
            pl.BlockSpec((_PB2 * 10, 1), lambda b: (b, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
        ],
        out_specs=pl.BlockSpec((_PB2 * 10, 10), lambda b: (b, zero)),
        out_shape=jax.ShapeDtypeStruct((p_pad * 10, 10), jnp.int32),
        interpret=interpret,
    )(ixf, ylane, tbrf, thi, tlo)
    return out.reshape(p_pad, 10, 10)[:p]


@partial(jax.jit, static_argnames=("rank_bits", "sentinel", "interpret"))
def packed_key_lookup_pallas(
    ix: jax.Array,
    iy: jax.Array,
    tbr: jax.Array,
    plane_hi: jax.Array,
    plane_lo: jax.Array,
    rank_bits: int,
    sentinel: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused mesh lookup + merge-key packing.

    ix, iy: [P, 10] int32 mm-cell indices. The CALLER must alias invalid
        pixels (out of plane, dead point) onto sentinel table cells:
        ix -> _NX - 1 (the padding row), iy -> _NY - 1 (a padding column).
    tbr: [P] int32 — (tb_i << rank_bits) | deposition_rank per point.

    Returns [P, 10, 10] int32 merge keys
    ((pad * 512 + tb) << rank_bits) | rank, with ``sentinel`` for
    vetoed/hole/out-of-plane pixels.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = ix.shape[0]
    nb = -(-p // _PB)
    p_pad = nb * _PB
    ixc = jnp.clip(ix, 0, _NX - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, _NY - 1).astype(jnp.int32)
    tbr = tbr.astype(jnp.int32)
    if p_pad != p:
        pad_n = p_pad - p
        # padded points alias the sentinel row -> sentinel keys
        ixc = jnp.pad(ixc, ((0, pad_n), (0, 0)), constant_values=_NX - 1)
        iyc = jnp.pad(iyc, ((0, pad_n), (0, 0)), constant_values=_NY - 1)
        tbr = jnp.pad(tbr, (0, pad_n))

    ixf = ixc.reshape(p_pad * 10, 1)
    ymat = jnp.broadcast_to(
        iyc[:, None, :], (p_pad, 10, 10)
    ).reshape(p_pad * 10, 10)
    tbrf = jnp.broadcast_to(tbr[:, None], (p_pad, 10)).reshape(p_pad * 10, 1)

    thi = plane_hi.astype(jnp.bfloat16)
    tlo = plane_lo.astype(jnp.bfloat16)

    zero = np.int32(0)
    kern = partial(_packed_kernel, rank_bits=rank_bits, sentinel=sentinel)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_PB * 10, 1), lambda b: (b, zero)),
            pl.BlockSpec((_PB * 10, 10), lambda b: (b, zero)),
            pl.BlockSpec((_PB * 10, 1), lambda b: (b, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
            pl.BlockSpec((_NX, _NY), lambda b: (zero, zero)),
        ],
        out_specs=pl.BlockSpec((_PB * 10, 10), lambda b: (b, zero)),
        out_shape=jax.ShapeDtypeStruct((p_pad * 10, 10), jnp.int32),
        interpret=interpret,
    )(ixf, ymat, tbrf, thi, tlo)
    return out.reshape(p_pad, 10, 10)[:p]
