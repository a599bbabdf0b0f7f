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

Opt-in/experimental: validated bit-close against the scan implementation
(tests/test_transport_pallas.py runs it in interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..constants import C, E_CHARGE, MEV_2_JOULE, MEV_2_KG
from .transport import _Z_FORWARD_BOUND, _RHO_BOUND, DT, KE_LIMIT, TrackSpecies

__all__ = ["integrate_tracks_pallas"]


def _kernel(
    pos_ref,  # [3, B]
    gv_ref,  # [3, B]
    onehot_ref,  # [B, S*N]: 1.0 at each lane's table-block start
    dedx_flat_ref,  # [S*N]
    mass_ref,  # [B]
    qm_ref,  # [B]
    out_pos_ref,  # [T, 3, B]
    out_dke_ref,  # [T, B]
    out_alive_ref,  # [T, B] int32
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
    rho_c = f32(_RHO_BOUND)
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

    ke0 = kinetic(gv)
    rho0 = jnp.sqrt(pos[0] ** 2 + pos[1] ** 2)
    alive0 = (
        (ke0 > ke_lim_c)
        & (pos[2] >= f32(0.0))
        & (pos[2] <= zb_c)
        & (rho0 < rho_c)
    ).astype(jnp.int32)

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

    jax.lax.fori_loop(0, n_steps, body, (pos, gv, ke0, alive0))


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
    )
    positions_axf, dke, alive_i = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        init_pos.astype(f32).T,
        init_gv.astype(f32).T,
        onehot,
        dedx_flat,
        mass,
        q_m,
    )
    return positions_axf.transpose(0, 2, 1), dke, alive_i != 0
