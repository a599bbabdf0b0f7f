// Native stopping-power table generator.
//
// Fills the role of the pycatima C++ library in the reference engine
// (/root/reference/src/attpc_engine/detector/solver.py:65 calls it per ODE
// step; here tables are generated once). Implements the same physics model
// as attpc_engine_tpu/nuclear/stopping.py — Bethe-Bloch electronic stopping
// with effective projectile charge (weaker proton form, calibrated against
// PSTAR water anchors), an Andersen-Ziegler-shaped E^0.45 continuation
// below the Bethe peak with a Lindhard-Scharff floor, ZBL universal
// nuclear stopping, Bragg additivity over constituents — in C++ for fast
// bulk table generation (many species x many materials at engine startup
// or in table-precomputation sweeps).
//
// Build: g++ -O3 -shared -fPIC -o libstopping.so stopping.cpp
// ABI: plain C functions over double arrays (ctypes-friendly).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double K_BETHE = 0.307075;     // MeV cm^2 / mol
constexpr double ME_C2 = 0.51099895;     // MeV
constexpr double MP_U = 931.49410242;    // MeV per u
constexpr double NA_SCALE = 1e-21 * 6.02214076e23;  // eV/(1e15 at/cm^2) -> MeV cm^2/mol

// ICRU-37-style mean excitation energies (eV), Z = 1..54; 10*Z beyond.
constexpr double I_EV[55] = {
    0.0,   19.2,  41.8,  40.0,  63.7,  76.0,  78.0,  82.0,  95.0,  115.0,
    137.0, 149.0, 156.0, 166.0, 173.0, 173.0, 180.0, 174.0, 188.0, 190.0,
    191.0, 216.0, 233.0, 245.0, 257.0, 272.0, 286.0, 297.0, 311.0, 322.0,
    330.0, 334.0, 350.0, 347.0, 348.0, 343.0, 352.0, 363.0, 366.0, 379.0,
    393.0, 417.0, 424.0, 428.0, 441.0, 449.0, 470.0, 470.0, 469.0, 488.0,
    488.0, 487.0, 485.0, 491.0, 482.0};

double mean_excitation_ev(int z) {
    if (z >= 1 && z <= 54) return I_EV[z];
    return 10.0 * z;
}

// Ziegler-Chu helium effective-charge fraction squared (ICRU-49 helium
// parameterization), E in keV/u. Mirrors stopping.py::_he_gamma2 exactly
// (Horner form) for bit parity with the numpy implementation.
double he_gamma2(double e_kev_u) {
    double e = e_kev_u < 1.0 ? 1.0 : e_kev_u;
    double x = std::log(e);
    double s = 0.2865 +
               x * (0.1266 +
                    x * (-0.001429 +
                         x * (0.02402 + x * (-0.01135 + x * 0.001475))));
    if (s < 0.0) s = 0.0;
    if (s > 50.0) s = 50.0;
    return 1.0 - std::exp(-s);
}

// Barkas-Berger analytic shell correction C(eta, I), I in eV; clamped at
// the eta^2 = 0.02 validity edge with an eta^2/(eta^2 + 3e-4) fade toward
// low velocity. Mirrors stopping.py::_shell_correction exactly.
double shell_correction(double eta2, double i_ev) {
    double e2 = eta2 > 0.02 ? eta2 : 0.02;
    double c_i2 = (0.422377 / e2 + 0.0304043 / (e2 * e2) -
                   0.00038106 / (e2 * e2 * e2)) *
                  1e-6 * (i_ev * i_ev);
    double c_i3 = (3.850190 / e2 - 0.1667989 / (e2 * e2) +
                   0.00157955 / (e2 * e2 * e2)) *
                  1e-9 * (i_ev * i_ev * i_ev);
    double fade = eta2 < 0.02 ? eta2 / (eta2 + 3e-4) : 1.0;
    return (c_i2 + c_i3) * fade;
}

// Bethe-Bloch electronic mass stopping power, MeV cm^2/g, for one energy.
// i_override > 0: compound mean excitation energy (eV) replacing the
// per-constituent Bragg-additivity I-values (e.g. liquid water I = 75).
double bethe(double z_proj, double mass_mev, double ke,
             const double* z_t, const double* a_t, const double* w_t,
             int n_const, double i_override) {
    double gamma = 1.0 + ke / mass_mev;
    double beta2 = 1.0 - 1.0 / (gamma * gamma);
    if (beta2 < 1e-30) beta2 = 1e-30;
    double beta = std::sqrt(beta2);
    double eta2 = beta2 * (gamma * gamma);
    double z_eff2;
    if (z_proj == 1.0) {
        double z_eff = 1.0 - std::exp(-300.0 * beta);
        z_eff2 = z_eff * z_eff;
    } else if (z_proj == 2.0) {
        double a_u = mass_mev / MP_U;
        z_eff2 = 4.0 * he_gamma2(ke * 1e3 / a_u);
    } else {
        double z_eff =
            z_proj *
            (1.0 - std::exp(-130.0 * beta * std::pow(z_proj, -2.0 / 3.0)));
        z_eff2 = z_eff * z_eff;
    }
    double s = 0.0;
    for (int i = 0; i < n_const; ++i) {
        double i_ev =
            i_override > 0.0 ? i_override : mean_excitation_ev((int)z_t[i]);
        double i_mev = i_ev * 1e-6;
        double arg = 2.0 * ME_C2 * beta2 * gamma * gamma / i_mev;
        if (arg < 1.0) arg = 1.0;
        // shell correction uses the element's OWN I even under a compound
        // override (see stopping.py)
        double c_shell = shell_correction(eta2, mean_excitation_ev((int)z_t[i]));
        double log_term = std::log(arg) - beta2 - c_shell / z_t[i];
        if (log_term < 0.0) log_term = 0.0;
        s += w_t[i] * K_BETHE * (z_t[i] / a_t[i]) * (z_eff2 / beta2) *
             log_term;
    }
    return s;
}

// Lindhard-Scharff velocity-proportional electronic stopping, MeV cm^2/g.
double lindhard_scharff(double z_proj, double a_proj, double ke,
                        const double* z_t, const double* a_t,
                        const double* w_t, int n_const) {
    double e_kev = ke > 0.0 ? ke * 1e3 : 0.0;
    double s = 0.0;
    for (int i = 0; i < n_const; ++i) {
        double z = z_t[i];
        double s_units =
            1.212 * std::pow(z_proj, 7.0 / 6.0) * z /
            std::pow(std::pow(z_proj, 2.0 / 3.0) + std::pow(z, 2.0 / 3.0),
                     1.5) *
            std::sqrt(e_kev / a_proj);
        s += w_t[i] * s_units * NA_SCALE / a_t[i];
    }
    return s;
}

// ZBL universal nuclear mass stopping power, MeV cm^2/g.
double zbl_nuclear(double z_proj, double a_proj, double ke, const double* z_t,
                   const double* a_t, const double* w_t, int n_const) {
    double e_kev = ke > 0.0 ? ke * 1e3 : 0.0;
    double s = 0.0;
    for (int i = 0; i < n_const; ++i) {
        double z = z_t[i], a = a_t[i];
        double dz = std::pow(z_proj, 0.23) + std::pow(z, 0.23);
        double eps = 32.53 * a * e_kev / (z_proj * z * (a_proj + a) * dz);
        if (eps < 1e-12) eps = 1e-12;
        double sn_red;
        if (eps <= 30.0) {
            sn_red = std::log1p(1.1383 * eps) /
                     (2.0 * (eps + 0.01321 * std::pow(eps, 0.21226) +
                             0.19593 * std::sqrt(eps)));
        } else {
            sn_red = std::log(eps) / (2.0 * eps);
        }
        double s_units = 8.462 * z_proj * z * a_proj / ((a_proj + a) * dz) *
                         sn_red;
        s += w_t[i] * s_units * NA_SCALE / a;
    }
    return s;
}

}  // namespace

extern "C" {

// Mass stopping power matching the Python implementation in structure
// (same peak scan, same E^0.45 tail + LS floor + ZBL nuclear).
//   z_proj, mass_mev: projectile
//   ke[n]: kinetic energies (MeV) -> out[n] (MeV cm^2/g)
//   z_t/a_t/w_t[n_const]: constituent Z, A, mass fraction
void mass_stopping_power(int z_proj, double mass_mev, const double* ke,
                         int n, const double* z_t, const double* a_t,
                         const double* w_t, int n_const, double i_override,
                         double* out) {
    // locate the Bethe peak on the same 1024-point geomspace scan as Python
    double a_proj = mass_mev / MP_U;
    if (a_proj < 0.5) a_proj = 0.5;
    const int n_scan = 1024;
    double lo = 1e-4 * a_proj, hi = 1e4 * a_proj;
    double log_lo = std::log(lo), dlog = (std::log(hi) - log_lo) / (n_scan - 1);
    double e_peak = lo, s_peak = 0.0;
    for (int i = 0; i < n_scan; ++i) {
        double e = std::exp(log_lo + i * dlog);
        double s = bethe(z_proj, mass_mev, e, z_t, a_t, w_t, n_const,
                         i_override);
        if (s > s_peak) {
            s_peak = s;
            e_peak = e;
        }
    }
    double peak_scale = s_peak / std::pow(e_peak, 0.45);
    for (int i = 0; i < n; ++i) {
        double e = ke[i];
        double s;
        if (e < e_peak) {
            s = e > 0.0 ? peak_scale * std::pow(e, 0.45) : 0.0;
            double s_ls =
                lindhard_scharff(z_proj, a_proj, e, z_t, a_t, w_t, n_const);
            if (s_ls > s) s = s_ls;
        } else {
            s = bethe(z_proj, mass_mev, e, z_t, a_t, w_t, n_const, i_override);
        }
        out[i] = s + zbl_nuclear(z_proj, a_proj, e, z_t, a_t, w_t, n_const);
    }
}

// CSDA range table by trapezoid integration (matches Python
// build_range_table): in: log_ke[n] (natural log, ascending), dedx[n];
// out: range_gcm2[n].
void csda_range(const double* log_ke, const double* dedx, int n,
                double* out) {
    out[0] = 0.0;
    for (int i = 1; i < n; ++i) {
        double e0 = std::exp(log_ke[i - 1]);
        double e1 = std::exp(log_ke[i]);
        double inv0 = 1.0 / (dedx[i - 1] > 1e-12 ? dedx[i - 1] : 1e-12);
        double inv1 = 1.0 / (dedx[i] > 1e-12 ? dedx[i] : 1e-12);
        out[i] = out[i - 1] + 0.5 * (inv0 + inv1) * (e1 - e0);
    }
}

}  // extern "C"
