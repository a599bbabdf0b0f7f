"""Pallas TPU kernel for the RK4 track transport.

``integrate_tracks`` (transport.py) runs the RK4 loop as a ``lax.scan``
whose per-step cost on TPU is launch-latency bound (~0.1-0.3 ms/step
nearly independent of batch width — CLAUDE.md). This kernel runs the whole
window as ONE Pallas program: the state lives in registers/VMEM, the loop
is a ``fori_loop`` inside the kernel, and the per-lane stopping-power
lookup becomes a one-hot contraction against the small [S, N] dE/dx table
(MXU/VPU-friendly; a few hundred entries), so there is no per-step
dispatch at all. Physics is identical to transport.integrate_tracks (same
RK4, same EoM as reference solver.py:19-76 with negated fields, same stop
masks).

TPU layout notes (learned the hard way):
- x64 is enabled globally, so every scalar constant must be pinned to f32
  (Mosaic has no f64 and fails to legalize ``tpu.truncf``),
- the alive mask is carried as int32 (8-bit minor-dim broadcasts are
  unsupported),
- everything is AXIS-FIRST ([3, B] positions, [T, 3, B] outputs): a minor
  dimension of 3 would be lane-padded 3 -> 128, inflating the output
  window 42x past VMEM.

``integrate_tracks_pallas`` runs one single-chunk window;
``integrate_tracks_pallas_chunked`` wraps the same kernel in an outer
while-over-chunks loop with the scan implementation's early exit, so it is
a full drop-in for any (n_steps, chunk_steps) window. Validated bit-close
against the scan implementation (tests/test_transport_pallas.py runs both
in interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import C, E_CHARGE, MEV_2_JOULE, MEV_2_KG
from .transport import _Z_FORWARD_BOUND, _RHO_BOUND, DT, KE_LIMIT, TrackSpecies

__all__ = ["integrate_tracks_pallas", "integrate_tracks_pallas_chunked"]


def _kernel(
    pos_ref,  # [3, B]
    gv_ref,  # [3, B]
    alive_ref,  # [B] int32 — lanes alive at window start
    onehot_ref,  # [B, S*N]: 1.0 at each lane's table-block start
    dedx_flat_ref,  # [S*N]
    mass_ref,  # [B]
    qm_ref,  # [B]
    out_pos_ref,  # [T, 3, B]
    out_dke_ref,  # [T, B]
    out_alive_ref,  # [T, B] int32
    fin_pos_ref,  # [3, B] — state at window end (chunk carry)
    fin_gv_ref,  # [3, B]
    fin_alive_ref,  # [B] int32
    *,
    n_steps: int,
    dt: float,
    log_ke_lo: float,
    dlog_ke: float,
    n_tab: int,
    density: float,
    bfield: float,
    efield: float,
):
    f32 = jnp.float32
    log_lo_c = f32(log_ke_lo)
    dlog_c = f32(dlog_ke)
    dt_c = f32(dt)
    dt6_c = f32(dt / 6.0)
    half_dt_c = f32(0.5 * dt)
    dens_c = f32(MEV_2_JOULE * density * 100.0)
    c_c = f32(C)
    clip_hi_c = f32(n_tab - 1.001)
    ke_lim_c = f32(KE_LIMIT)
    zb_c = f32(_Z_FORWARD_BOUND)
    rho2_c = f32(_RHO_BOUND * _RHO_BOUND)
    tiny_c = f32(1e-30)

    pos = pos_ref[:]
    gv = gv_ref[:]
    mass = mass_ref[:]
    q_m = qm_ref[:]
    onehot = onehot_ref[:]
    table = dedx_flat_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, onehot.shape, 1)
    base = jnp.sum(onehot * col.astype(f32), axis=1)  # [B] block starts

    def interp_dedx(ke):
        posf = (jnp.log(jnp.maximum(ke, tiny_c)) - log_lo_c) / dlog_c
        posf = jnp.clip(posf, f32(0.0), clip_hi_c)
        i0 = jnp.floor(posf)
        frac = posf - i0
        idx0 = (base + i0)[:, None].astype(jnp.int32)
        sel0 = (col == idx0).astype(f32)
        sel1 = (col == idx0 + 1).astype(f32)
        v0 = jnp.sum(sel0 * table[None, :], axis=1)
        v1 = jnp.sum(sel1 * table[None, :], axis=1)
        return v0 * (f32(1.0) - frac) + v1 * frac

    mass_kg = mass * f32(MEV_2_KG)
    b_neg = f32(-bfield)
    e_neg = f32(-efield)

    def rhs(pos, gv):
        gv2 = jnp.sum(gv * gv, axis=0)
        gv_mag = jnp.sqrt(jnp.maximum(gv2, tiny_c))
        gamma = jnp.sqrt(f32(1.0) + gv2)
        beta = gv_mag / gamma
        ke = mass * gv2 / (f32(1.0) + gamma)
        u = gv / gv_mag[None, :]
        velo = u * (beta * c_c)[None, :]
        dedx = interp_dedx(ke)
        decel = dedx * dens_c / mass_kg
        dgv = jnp.stack(
            [
                (q_m * velo[1] * b_neg - decel * u[0]) / c_c,
                (-q_m * velo[0] * b_neg - decel * u[1]) / c_c,
                (q_m * e_neg - decel * u[2]) / c_c,
            ],
            axis=0,
        )
        return velo, dgv

    def kinetic(gv):
        gv2 = jnp.sum(gv * gv, axis=0)
        return mass * gv2 / (f32(1.0) + jnp.sqrt(f32(1.0) + gv2))

    # alive at window start comes from the caller (chunk carry; the first
    # chunk's inclusive-bounds mask is computed host-side in JAX), so dead
    # lanes never resurrect across chunk boundaries
    ke0 = kinetic(gv)
    alive0 = alive_ref[:]

    def body(step, carry):
        pos, gv, ke_prev, alive = carry
        k1p, k1g = rhs(pos, gv)
        k2p, k2g = rhs(pos + half_dt_c * k1p, gv + half_dt_c * k1g)
        k3p, k3g = rhs(pos + half_dt_c * k2p, gv + half_dt_c * k2g)
        k4p, k4g = rhs(pos + dt_c * k3p, gv + dt_c * k3g)
        two = f32(2.0)
        pos_n = pos + dt6_c * (k1p + two * k2p + two * k3p + k4p)
        gv_n = gv + dt6_c * (k1g + two * k2g + two * k3g + k4g)
        live = (alive != 0)[None, :]
        pos_n = jnp.where(live, pos_n, pos)
        gv_n = jnp.where(live, gv_n, gv)
        ke_n = kinetic(gv_n)
        rho2 = pos_n[0] ** 2 + pos_n[1] ** 2
        alive_n = alive * (
            (ke_n > ke_lim_c)
            & (pos_n[2] > f32(0.0))
            & (pos_n[2] < zb_c)
            & (rho2 < rho2_c)
        ).astype(jnp.int32)
        dke = jnp.where(alive_n != 0, jnp.abs(ke_prev - ke_n), f32(0.0))
        out_pos_ref[step] = pos_n
        out_dke_ref[step] = dke
        out_alive_ref[step] = alive_n
        return pos_n, gv_n, ke_n, alive_n

    pos_f, gv_f, _, alive_f = jax.lax.fori_loop(
        0, n_steps, body, (pos, gv, ke0, alive0)
    )
    fin_pos_ref[:] = pos_f
    fin_gv_ref[:] = gv_f
    fin_alive_ref[:] = alive_f


@partial(
    jax.jit,
    static_argnames=(
        "n_steps",
        "interpret",
        "density",
        "bfield",
        "efield",
        "dt",
    ),
)
def integrate_tracks_pallas(
    init_pos: jax.Array,
    init_gv: jax.Array,
    s_idx: jax.Array,
    species: TrackSpecies,
    density: float,
    bfield: float,
    efield: float,
    dt: float = DT,
    n_steps: int = 500,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in for transport.integrate_tracks (same returns), one kernel.

    ``interpret``: None (default) compiles the Mosaic kernel on TPU and
    falls back to the Pallas interpreter elsewhere (CPU tests run the
    exact same kernel code); True forces the interpreter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = init_pos.shape[0]
    f32 = jnp.float32
    s, n_tab = species.dedx.shape

    mass = species.mass[s_idx].astype(f32)
    q_m = (species.charge[s_idx] * E_CHARGE / (mass * MEV_2_KG)).astype(f32)
    onehot = (
        s_idx[:, None] * n_tab == jnp.arange(s * n_tab, dtype=jnp.int32)[None, :]
    ).astype(f32)
    dedx_flat = species.dedx.reshape(-1).astype(f32)

    kern = partial(
        _kernel,
        n_steps=n_steps,
        dt=float(dt),
        log_ke_lo=float(species.log_ke_lo),
        dlog_ke=float(species.dlog_ke),
        n_tab=n_tab,
        density=float(density),
        bfield=float(bfield),
        efield=float(efield),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, 3, b), f32),
        jax.ShapeDtypeStruct((n_steps, b), f32),
        jax.ShapeDtypeStruct((n_steps, b), jnp.int32),
        jax.ShapeDtypeStruct((3, b), f32),
        jax.ShapeDtypeStruct((3, b), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )

    pos0 = init_pos.astype(f32).T
    gv0 = init_gv.astype(f32).T
    alive0 = _initial_alive(pos0, gv0, mass)

    positions_axf, dke, alive_i, *_ = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        interpret=interpret,
    )(pos0, gv0, alive0, onehot, dedx_flat, mass, q_m)
    return positions_axf.transpose(0, 2, 1), dke, alive_i != 0


def _initial_alive(pos0, gv0, mass):
    """Inclusive-at-t0 bounds mask (transport.py: scipy terminal events
    only fire on sign changes after the start)."""
    f32 = jnp.float32
    gv2 = jnp.sum(gv0 * gv0, axis=0)
    ke0 = mass * gv2 / (f32(1.0) + jnp.sqrt(f32(1.0) + gv2))
    rho0 = jnp.sqrt(pos0[0] ** 2 + pos0[1] ** 2)
    return (
        (ke0 > f32(KE_LIMIT))
        & (pos0[2] >= f32(0.0))
        & (pos0[2] <= f32(_Z_FORWARD_BOUND))
        & (rho0 < f32(_RHO_BOUND))
    ).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "n_steps",
        "chunk_steps",
        "interpret",
        "density",
        "bfield",
        "efield",
        "dt",
    ),
)
def integrate_tracks_pallas_chunked(
    init_pos: jax.Array,
    init_gv: jax.Array,
    s_idx: jax.Array,
    species: TrackSpecies,
    density: float,
    bfield: float,
    efield: float,
    dt: float = DT,
    n_steps: int = 10000,
    chunk_steps: int = 500,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Chunked drop-in for transport.integrate_tracks over arbitrary
    windows: an outer ``lax.while_loop`` re-enters the SAME compiled
    Pallas kernel per ``chunk_steps`` window, carrying (pos, gv, alive)
    across chunks, and exits early once every lane is dead — exactly the
    early-exit semantics of the scan implementation, with the kernel's
    zero per-step dispatch cost inside each chunk.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n_steps % chunk_steps != 0:
        raise ValueError("n_steps must be divisible by chunk_steps")
    n_chunks = n_steps // chunk_steps
    b = init_pos.shape[0]
    f32 = jnp.float32
    s, n_tab = species.dedx.shape

    mass = species.mass[s_idx].astype(f32)
    q_m = (species.charge[s_idx] * E_CHARGE / (mass * MEV_2_KG)).astype(f32)
    onehot = (
        s_idx[:, None] * n_tab == jnp.arange(s * n_tab, dtype=jnp.int32)[None, :]
    ).astype(f32)
    dedx_flat = species.dedx.reshape(-1).astype(f32)

    kern = partial(
        _kernel,
        n_steps=chunk_steps,
        dt=float(dt),
        log_ke_lo=float(species.log_ke_lo),
        dlog_ke=float(species.dlog_ke),
        n_tab=n_tab,
        density=float(density),
        bfield=float(bfield),
        efield=float(efield),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((chunk_steps, 3, b), f32),
        jax.ShapeDtypeStruct((chunk_steps, b), f32),
        jax.ShapeDtypeStruct((chunk_steps, b), jnp.int32),
        jax.ShapeDtypeStruct((3, b), f32),
        jax.ShapeDtypeStruct((3, b), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    call = pl.pallas_call(kern, out_shape=out_shapes, interpret=interpret)

    pos0 = init_pos.astype(f32).T
    gv0 = init_gv.astype(f32).T
    alive0 = _initial_alive(pos0, gv0, mass)

    positions = jnp.zeros((n_steps, b, 3), dtype=f32)
    dkes = jnp.zeros((n_steps, b), dtype=f32)
    alives = jnp.zeros((n_steps, b), dtype=jnp.int32)

    def chunk_body(state):
        chunk_i, pos, gv, alive, positions, dkes, alives = state
        p_c, d_c, a_c, pos_n, gv_n, alive_n = call(
            pos, gv, alive, onehot, dedx_flat, mass, q_m
        )
        offset = chunk_i * chunk_steps
        zero = jnp.asarray(0, dtype=offset.dtype)
        positions = jax.lax.dynamic_update_slice(
            positions, p_c.transpose(0, 2, 1), (offset, zero, zero)
        )
        dkes = jax.lax.dynamic_update_slice(dkes, d_c, (offset, zero))
        alives = jax.lax.dynamic_update_slice(alives, a_c, (offset, zero))
        return chunk_i + 1, pos_n, gv_n, alive_n, positions, dkes, alives

    def chunk_cond(state):
        chunk_i, _pos, _gv, alive, *_ = state
        return (chunk_i < n_chunks) & jnp.any(alive != 0)

    init_state = (
        jnp.asarray(0, dtype=jnp.int32),
        pos0,
        gv0,
        alive0,
        positions,
        dkes,
        alives,
    )
    _, _, _, _, positions, dkes, alives = jax.lax.while_loop(
        chunk_cond, chunk_body, init_state
    )
    return positions, dkes, alives != 0
