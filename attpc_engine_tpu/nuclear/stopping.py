"""Charged-particle stopping power in matter.

Replaces the role of the pycatima (CATIMA C++) dependency of the reference
engine: the reference calls ``GasTarget.get_dedx`` inside its ODE right-hand
side on every integrator step
(/root/reference/src/attpc_engine/detector/solver.py:65) and
``get_energy_loss`` per sampled event
(/root/reference/src/attpc_engine/kinematics/pipeline.py:256-263).

TPU-first architecture: stopping power is *never* evaluated pointwise in the
hot path. This module generates dense log-spaced dE/dx and range tables per
(projectile, material) once on the host; the device integrator does a
single ``jnp.interp`` gather per step.

Physics model (self-contained, no external data libraries):

- Bethe-Bloch mass electronic stopping power with Barkas-style effective
  projectile charge z_eff = z (1 - exp(-125 beta z^(-2/3))),
- mean excitation energies I from an embedded ICRU-37-style element table,
- below the Bragg peak of the Bethe curve the stopping is continued with a
  velocity-proportional (Lindhard-Scharff-like) law S ~ sqrt(E), matched
  continuously at the peak,
- Bragg additivity over compound constituents.

Accuracy vs CATIMA is typically a few percent above ~1 MeV/u and tens of
percent near/below the Bragg peak; custom tables can be loaded for exact
parity (see ``GasTarget.set_custom_dedx`` in target.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["mass_stopping_power", "build_dedx_table", "build_range_table"]

# Constants
_K = 0.307075  # MeV cm^2 / mol  (4 pi N_A r_e^2 m_e c^2)
_ME_C2 = 0.51099895  # MeV
_MP_U = 931.49410242  # MeV per u

# Mean excitation energies I (eV), ICRU-37-style, Z = 1..54 embedded;
# beyond the table the Bloch estimate I = 10 Z eV is used.
_I_EV = {
    1: 19.2, 2: 41.8, 3: 40.0, 4: 63.7, 5: 76.0, 6: 78.0, 7: 82.0, 8: 95.0,
    9: 115.0, 10: 137.0, 11: 149.0, 12: 156.0, 13: 166.0, 14: 173.0,
    15: 173.0, 16: 180.0, 17: 174.0, 18: 188.0, 19: 190.0, 20: 191.0,
    21: 216.0, 22: 233.0, 23: 245.0, 24: 257.0, 25: 272.0, 26: 286.0,
    27: 297.0, 28: 311.0, 29: 322.0, 30: 330.0, 31: 334.0, 32: 350.0,
    33: 347.0, 34: 348.0, 35: 343.0, 36: 352.0, 37: 363.0, 38: 366.0,
    39: 379.0, 40: 393.0, 41: 417.0, 42: 424.0, 43: 428.0, 44: 441.0,
    45: 449.0, 46: 470.0, 47: 470.0, 48: 469.0, 49: 488.0, 50: 488.0,
    51: 487.0, 52: 485.0, 53: 491.0, 54: 482.0,
}


def _mean_excitation_ev(z: int) -> float:
    return _I_EV.get(z, 10.0 * z)


def _bethe_mass_stopping(
    z_proj: int,
    mass_mev: float,
    ke_mev: np.ndarray,
    z_t: np.ndarray,
    a_t: np.ndarray,
    w_t: np.ndarray,
) -> np.ndarray:
    """Bethe-Bloch electronic mass stopping power, MeV cm^2/g.

    Parameters
    ----------
    z_proj, mass_mev: projectile charge and rest mass.
    ke_mev: [n] kinetic energies.
    z_t, a_t, w_t: target constituent Z, A, and mass fractions.

    Negative/invalid log arguments are clipped to zero (handled by the
    low-energy continuation in :func:`build_dedx_table`).
    """
    ke = np.asarray(ke_mev, dtype=np.float64)
    gamma = 1.0 + ke / mass_mev
    beta2 = 1.0 - 1.0 / gamma**2
    beta2 = np.clip(beta2, 1e-30, None)
    beta = np.sqrt(beta2)

    # Barkas effective charge
    z_eff = z_proj * (1.0 - np.exp(-125.0 * beta * z_proj ** (-2.0 / 3.0)))

    s = np.zeros_like(ke)
    for z, a, w in zip(z_t, a_t, w_t):
        i_mev = _mean_excitation_ev(int(z)) * 1e-6
        arg = 2.0 * _ME_C2 * beta2 * gamma**2 / i_mev
        log_term = np.log(np.clip(arg, 1.0, None)) - beta2
        s += w * _K * (z / a) * (z_eff**2 / beta2) * np.clip(log_term, 0.0, None)
    return s


def mass_stopping_power(
    z_proj: int,
    mass_mev: float,
    ke_mev: np.ndarray,
    constituents: list[tuple[int, int, float]],
) -> np.ndarray:
    """Mass stopping power (MeV cm^2/g) with low-energy continuation.

    Uses the native C++ generator (attpc_engine_tpu.native) when available —
    the slot pycatima fills in the reference's stack — falling back to the
    pure-numpy implementation below (identical physics model).

    Parameters
    ----------
    z_proj: int
        Projectile charge number.
    mass_mev: float
        Projectile rest mass in MeV.
    ke_mev: np.ndarray
        Kinetic energies in MeV (any shape).
    constituents: list[(Z, A, mass_fraction)]
        Target composition by mass fraction.
    """
    from ..native import native_mass_stopping_power

    native = native_mass_stopping_power(z_proj, mass_mev, ke_mev, constituents)
    if native is not None:
        return native

    ke = np.atleast_1d(np.asarray(ke_mev, dtype=np.float64))
    z_t = np.array([c[0] for c in constituents], dtype=np.float64)
    a_t = np.array([c[1] for c in constituents], dtype=np.float64)
    w_t = np.array([c[2] for c in constituents], dtype=np.float64)

    # Locate the Bethe-curve Bragg peak on a dense scan (per projectile),
    # then continue ~ sqrt(E) below it.
    a_proj = max(mass_mev / _MP_U, 0.5)
    e_scan = np.geomspace(1e-4 * a_proj, 1e4 * a_proj, 1024)
    s_scan = _bethe_mass_stopping(z_proj, mass_mev, e_scan, z_t, a_t, w_t)
    i_peak = int(np.argmax(s_scan))
    e_peak = e_scan[i_peak]
    s_peak = s_scan[i_peak]

    s = _bethe_mass_stopping(z_proj, mass_mev, ke, z_t, a_t, w_t)
    low = ke < e_peak
    with np.errstate(invalid="ignore"):
        s_low = s_peak * np.sqrt(np.clip(ke, 0.0, None) / e_peak)
    s = np.where(low, s_low, s)
    return s.reshape(np.shape(ke_mev))


def build_dedx_table(
    z_proj: int,
    mass_mev: float,
    constituents: list[tuple[int, int, float]],
    ke_min: float = 1e-6,
    ke_max: float = 20000.0,
    n_points: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Log-spaced dE/dx table for device-side interpolation.

    Returns
    -------
    (log_ke, dedx)
        ``log_ke``: [n] natural log of KE (MeV), uniformly spaced.
        ``dedx``: [n] mass stopping power (MeV cm^2/g).
    """
    ke = np.geomspace(ke_min, ke_max, n_points)
    dedx = mass_stopping_power(z_proj, mass_mev, ke, constituents)
    return np.log(ke), dedx


def build_range_table(
    log_ke: np.ndarray, dedx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """CSDA range table R(E) = int dE/S(E) from a dE/dx table.

    Returns (log_ke, range_gcm2) on the same grid; range in g/cm^2.
    Integration by trapezoid in linear E with the table's resolution.
    """
    ke = np.exp(log_ke)
    inv_s = 1.0 / np.clip(dedx, 1e-12, None)
    r = np.zeros_like(ke)
    r[1:] = np.cumsum(0.5 * (inv_s[1:] + inv_s[:-1]) * np.diff(ke))
    return log_ke, r
