// Native stopping-power table generator.
//
// Fills the role of the pycatima C++ library in the reference engine
// (/root/reference/src/attpc_engine/detector/solver.py:65 calls it per ODE
// step; here tables are generated once). Implements the same physics model
// as attpc_engine_tpu/nuclear/stopping.py — Bethe-Bloch electronic stopping
// with Barkas effective charge and a velocity-proportional continuation
// below the Bragg peak, Bragg additivity over constituents — in C++ for
// fast bulk table generation (many species x many materials at engine
// startup or in table-precomputation sweeps).
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

// Bethe-Bloch electronic mass stopping power, MeV cm^2/g, for one energy.
double bethe(double z_proj, double mass_mev, double ke,
             const double* z_t, const double* a_t, const double* w_t,
             int n_const) {
    double gamma = 1.0 + ke / mass_mev;
    double beta2 = 1.0 - 1.0 / (gamma * gamma);
    if (beta2 < 1e-30) beta2 = 1e-30;
    double beta = std::sqrt(beta2);
    double z_eff =
        z_proj * (1.0 - std::exp(-125.0 * beta * std::pow(z_proj, -2.0 / 3.0)));
    double s = 0.0;
    for (int i = 0; i < n_const; ++i) {
        double i_mev = mean_excitation_ev((int)z_t[i]) * 1e-6;
        double arg = 2.0 * ME_C2 * beta2 * gamma * gamma / i_mev;
        if (arg < 1.0) arg = 1.0;
        double log_term = std::log(arg) - beta2;
        if (log_term < 0.0) log_term = 0.0;
        s += w_t[i] * K_BETHE * (z_t[i] / a_t[i]) * (z_eff * z_eff / beta2) *
             log_term;
    }
    return s;
}

}  // namespace

extern "C" {

// Mass stopping power with low-energy continuation, matching the Python
// implementation bit-for-bit in structure (same peak scan and sqrt law).
//   z_proj, mass_mev: projectile
//   ke[n]: kinetic energies (MeV) -> out[n] (MeV cm^2/g)
//   z_t/a_t/w_t[n_const]: constituent Z, A, mass fraction
void mass_stopping_power(int z_proj, double mass_mev, const double* ke,
                         int n, const double* z_t, const double* a_t,
                         const double* w_t, int n_const, double* out) {
    // locate the Bragg peak on the same 1024-point geomspace scan as Python
    double a_proj = mass_mev / MP_U;
    if (a_proj < 0.5) a_proj = 0.5;
    const int n_scan = 1024;
    double lo = 1e-4 * a_proj, hi = 1e4 * a_proj;
    double log_lo = std::log(lo), dlog = (std::log(hi) - log_lo) / (n_scan - 1);
    double e_peak = lo, s_peak = 0.0;
    for (int i = 0; i < n_scan; ++i) {
        double e = std::exp(log_lo + i * dlog);
        double s = bethe(z_proj, mass_mev, e, z_t, a_t, w_t, n_const);
        if (s > s_peak) {
            s_peak = s;
            e_peak = e;
        }
    }
    for (int i = 0; i < n; ++i) {
        double e = ke[i];
        if (e < e_peak) {
            double ratio = e > 0.0 ? e / e_peak : 0.0;
            out[i] = s_peak * std::sqrt(ratio);
        } else {
            out[i] = bethe(z_proj, mass_mev, e, z_t, a_t, w_t, n_const);
        }
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
