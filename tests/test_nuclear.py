"""Nuclear data and stopping-power tests."""

import numpy as np
import pytest

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.nuclear import GasTarget, load_target


def test_masses_golden():
    """Known masses / Q-values from the AME table."""
    c12 = nuclear_map.get_data(6, 12)
    assert abs(c12.mass - (12 * 931.49410242 - 6 * 0.51099895)) < 1e-6
    assert c12.isotopic_symbol == "12C"
    # Q-value of 12C(d,p)13C = 2.7217 MeV
    d = nuclear_map.get_data(1, 2)
    p = nuclear_map.get_data(1, 1)
    c13 = nuclear_map.get_data(6, 13)
    q = c12.mass + d.mass - p.mass - c13.mass
    assert abs(q - 2.7217) < 0.001


def test_mass_fallback_estimated():
    """Unknown nuclides fall back to the semi-empirical estimate."""
    exotic = nuclear_map.get_data(50, 132)  # 132Sn not in embedded table
    assert exotic.is_estimated
    # binding should be ~8.3 MeV/nucleon for 132Sn
    be_per_a = (
        50 * nuclear_map.get_data(1, 1).mass
        + 82 * nuclear_map.get_data(0, 1).mass
        - exotic.mass
    ) / 132
    assert 7.5 < be_per_a < 9.0


def test_get_data_rejects_invalid_nuclides():
    """Z < 0, A < 1 and Z > A must raise before any arithmetic
    (round-1 short-circuit bug let them reach the SEMF fallback)."""
    with pytest.raises(ValueError):
        nuclear_map.get_data(-1, 4)
    with pytest.raises(ValueError):
        nuclear_map.get_data(3, 0)
    with pytest.raises(ValueError):
        nuclear_map.get_data(3, -2)
    with pytest.raises(ValueError):
        nuclear_map.get_data(5, 3)
    # boundary cases stay valid
    assert nuclear_map.get_data(1, 1).Z == 1  # bare proton
    assert nuclear_map.get_data(0, 1).isotopic_symbol == "n"  # neutron


def test_polar_arbitrary_requires_normalized_probs():
    """The reference's rng.choice(p=...) needs sum(p) == 1; sums below 1
    must not be silently renormalized."""
    from attpc_engine_tpu.kinematics import PolarArbitrary

    angles = np.linspace(0.0, 1.0, 5)
    with pytest.raises(ValueError):
        PolarArbitrary(angles, np.full(5, 0.1), 0.25)  # sums to 0.5
    with pytest.raises(ValueError):
        PolarArbitrary(angles, np.full(5, 0.3), 0.25)  # sums to 1.5
    PolarArbitrary(angles, np.full(5, 0.2), 0.25)  # exactly 1 is fine


def test_gas_target_density():
    """D2 at 300 Torr: ideal-gas density."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    # rho = P M / (R T) = 300*4/(62.36367*293.15) g/L
    expected = 300.0 * 4.0 / (62.36367 * 293.15) / 1000.0
    assert abs(gas.density - expected) < 1e-12
    assert gas.density == pytest.approx(6.56e-5, rel=0.01)  # g/cm^3


def test_proton_dedx_sanity():
    """Proton stopping in D2: Bethe regime values within tens of % of
    published (PSTAR-like) numbers, monotonic fall above the peak."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    proton = nuclear_map.get_data(1, 1)
    # PSTAR, hydrogen gas: ~10 MeV proton -> ~ 40.7 MeV cm2/g
    s10 = gas.get_dedx(proton, 10.0)
    assert 25.0 < s10 < 60.0
    # 1 MeV -> ~270 MeV cm2/g in H2
    s1 = gas.get_dedx(proton, 1.0)
    assert 150.0 < s1 < 400.0
    # monotonic decreasing between 1 and 100 MeV
    kes = np.linspace(1.0, 100.0, 50)
    vals = gas.get_dedx(proton, kes)
    assert np.all(np.diff(vals) < 0)


def test_energy_loss_consistency():
    """get_energy_loss integrates get_dedx: small-step loss ~ S * rho * dx."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    proton = nuclear_map.get_data(1, 1)
    e0 = 10.0
    dx = np.array([0.01])  # 1 cm
    loss = gas.get_energy_loss(proton, e0, dx)[0]
    expected = gas.get_dedx(proton, e0) * gas.density * 1.0  # MeV over 1 cm
    assert loss == pytest.approx(expected, rel=0.02)
    # long distance: loses everything it can, loss <= e0
    loss_far = gas.get_energy_loss(proton, e0, np.array([1000.0]))[0]
    assert loss_far == pytest.approx(e0, rel=1e-6)


def test_stopping_golden_pstar_water():
    """Electronic+nuclear stopping of protons in liquid water against PSTAR
    golden values (liquid water compound I = 75 eV via i_override_ev)."""
    from attpc_engine_tpu.nuclear.stopping import (
        build_range_table,
        mass_stopping_power,
    )

    water = [(1, 1.008, 0.1119), (8, 15.999, 0.8881)]
    anchors = {0.1: 818.0, 0.3: 550.0, 1.0: 260.8, 10.0: 45.67, 100.0: 7.289}
    kes = np.array(sorted(anchors))
    got = mass_stopping_power(1, 938.272, kes, water, i_override_ev=75.0)
    for e, g in zip(sorted(anchors), got):
        # round-3 model (shell correction + Ziegler-Chu): worst +3.4% at
        # 0.3 MeV, 0.1% at 10/100 MeV
        assert g == pytest.approx(anchors[e], rel=0.04), f"{e} MeV"
    assert got[3] == pytest.approx(anchors[10.0], rel=0.005)
    assert got[4] == pytest.approx(anchors[100.0], rel=0.005)

    # CSDA ranges (PSTAR): 10 MeV -> 0.1230 g/cm^2, 100 MeV -> 7.718 g/cm^2
    log_ke = np.log(np.geomspace(1e-6, 200.0, 4096))
    dedx = mass_stopping_power(1, 938.272, np.exp(log_ke), water, i_override_ev=75.0)
    _, rng = build_range_table(log_ke, dedx)
    r10 = np.interp(np.log(10.0), log_ke, rng)
    r100 = np.interp(np.log(100.0), log_ke, rng)
    assert r10 == pytest.approx(0.1230, rel=0.02)
    assert r100 == pytest.approx(7.718, rel=0.01)


def test_stopping_golden_astar_alpha_air():
    """Alpha CSDA range in air at 5.49 MeV (Am-241) vs the ASTAR value
    (~4.0 cm at NTP, ~4.85 mg/cm^2). With the Ziegler-Chu helium effective
    charge + Barkas-Berger shell correction the model lands +3.8% of ASTAR
    (was +13% in round 2 without them); the band bounds regressions."""
    from attpc_engine_tpu.nuclear.stopping import (
        build_range_table,
        mass_stopping_power,
    )

    air = [(7, 14.007, 0.755), (8, 15.999, 0.232), (18, 39.948, 0.013)]
    log_ke = np.log(np.geomspace(1e-6, 10.0, 4096))
    dedx = mass_stopping_power(2, 3727.379, np.exp(log_ke), air)
    _, rng = build_range_table(log_ke, dedx)
    r = np.interp(np.log(5.49), log_ke, rng)
    assert 4.85e-3 * 0.95 < r < 4.85e-3 * 1.05


def test_stopping_carbon_flagship_regime():
    """Anchors for the flagship bench species: 12C in D2 gas.

    There is no NIST table for carbon ions, so the anchors are the physics
    limits the model must obey where they are exact:

    1. at 10 MeV/u (the 12C(d,p) bench beam energy) carbon is fully
       stripped and shell/Barkas terms are sub-percent in hydrogen, so the
       table must match an INDEPENDENTLY-written textbook Bethe evaluation
       to ~2% (the residual is the modeled 0.7% effective-charge deficit),
    2. same at 5 MeV/u to ~5% (effective charge ~0.98),
    3. at equal velocity and high energy, carbon/helium stopping must scale
       as the effective-charge-squared ratio (-> 36/4 stripped); this pins
       the z-scaling machinery that has no external table to lean on.
    """
    from attpc_engine_tpu.nuclear.stopping import mass_stopping_power

    d2 = [(1, 2, 1.0)]
    m12c = 11174.86  # MeV
    for e_u, tol in ((10.0, 0.02), (5.0, 0.05)):
        ke = e_u * 12.0
        gamma = 1.0 + ke / m12c
        beta2 = 1.0 - 1.0 / gamma**2
        # textbook Bethe, fully stripped z = 6, I(H) = 19.2 eV
        log_term = np.log(2.0 * 0.51099895e6 * beta2 * gamma**2 / 19.2) - beta2
        s_bethe = 0.307075 * (1.0 / 2.0) * (36.0 / beta2) * log_term
        s_model = mass_stopping_power(6, m12c, np.array([ke]), d2)[0]
        assert s_model == pytest.approx(s_bethe, rel=tol), f"{e_u} MeV/u"
        assert s_model < s_bethe  # partial stripping + shells only REDUCE

    # z-scaling: C vs He at the same velocity (10 MeV/u), same target
    s_c = mass_stopping_power(6, m12c, np.array([120.0]), d2)[0]
    s_he = mass_stopping_power(2, 3727.379, np.array([40.0]), d2)[0]
    ratio = s_c / s_he
    assert 8.6 < ratio < 9.05  # stripped limit 9, slight C deficit at 10 MeV/u


def test_stopping_isotope_velocity_scaling():
    """Electronic stopping depends on (z, beta) only, so hydrogen isotopes
    at the SAME velocity must have the same mass stopping power. This pins
    the projectile-mass handling (beta from KE/m, not KE/A) that no
    external table exercises; the tiny residual is the mass-dependent ZBL
    nuclear term (~3e-5 of electronic at these energies)."""
    from attpc_engine_tpu.nuclear.stopping import mass_stopping_power

    d2 = [(1, 2, 1.0)]
    m_p, m_d, m_t = 938.272, 1875.613, 2808.921
    for ke_p in (2.0, 10.0, 30.0):
        g = 1.0 + ke_p / m_p
        s_p = mass_stopping_power(1, m_p, np.array([ke_p]), d2)[0]
        for m in (m_d, m_t):
            ke_x = (g - 1.0) * m  # same gamma -> same beta
            s_x = mass_stopping_power(1, m, np.array([ke_x]), d2)[0]
            assert s_x == pytest.approx(s_p, rel=5e-4), (ke_p, m)


def test_stopping_low_energy_positive_and_continuous():
    """The low-energy construction (E^0.45 tail + LS floor + ZBL nuclear)
    must be positive and free of large jumps down to 1 keV/u."""
    from attpc_engine_tpu.nuclear.stopping import mass_stopping_power

    d2 = [(1, 2, 1.0)]
    ke = np.geomspace(1e-3, 100.0, 2000)
    for zp, m in ((1, 938.272), (2, 3727.379), (6, 11174.86)):
        s = mass_stopping_power(zp, m, ke, d2)
        assert np.all(s > 0)
        ratio = s[1:] / s[:-1]
        assert ratio.max() < 1.2 and ratio.min() > 0.8  # no discontinuities


def test_range_alpha():
    """Alpha range in D2 gas at 300 Torr: sane order of magnitude (meters)."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    alpha = nuclear_map.get_data(2, 4)
    r = gas.get_range(alpha, 10.0)
    # ~10 MeV alpha in ~6.6e-5 g/cm3 gas: tens of cm to meters
    assert 0.1 < r < 20.0


def test_load_dedx_npz_roundtrip(tmp_path):
    """External tables (CATIMA-export format) override the analytic model."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    proton = nuclear_map.get_data(1, 1)
    ke = np.geomspace(1e-5, 1000.0, 512)
    fake = 123.0 * np.ones_like(ke)  # unmistakably not the model
    np.savez(tmp_path / "tables.npz", ke_mev=ke, dedx_1_1=fake)
    n = gas.load_dedx_npz(tmp_path / "tables.npz")
    assert n == 1
    assert gas.get_dedx(proton, 1.0) == pytest.approx(123.0, rel=1e-6)
    # other species still come from the analytic model
    alpha = nuclear_map.get_data(2, 4)
    assert gas.get_dedx(alpha, 1.0) != pytest.approx(123.0, rel=0.5)


def test_load_target_json(tmp_path):
    import json

    path = tmp_path / "target.json"
    with path.open("w") as f:
        json.dump({"compound": [[1, 2, 2]], "pressure(Torr)": 300.0}, f)
    gas = load_target(path, nuclear_map)
    assert isinstance(gas, GasTarget)
    assert gas.pressure == 300.0
    assert gas.components == [(1, 2, 2)]


def test_stopping_velocity_scaling_z1():
    """Deuteron stopping must equal proton stopping at equal VELOCITY.

    Electronic stopping depends on (z, beta) only — for z = 1 there is no
    effective-charge difference — so dE/dx_d(KE * m_d/m_p) = dE/dx_p(KE)
    in the velocity regime where nuclear stopping is negligible. This is
    an exact internal invariant (no external table exists for deuterons in
    most gases) that pins the model's velocity machinery for the deuteron
    tracks of the flagship 12C(d,p) chain."""
    from attpc_engine_tpu.nuclear.stopping import mass_stopping_power

    d2 = [(1, 2, 1.0)]
    m_p, m_d = 938.272, 1875.613
    kes_p = np.array([0.5, 1.0, 2.0, 5.0, 10.0, 50.0])
    kes_d = kes_p * (m_d / m_p)  # same gamma -> same beta
    s_p = mass_stopping_power(1, m_p, kes_p, d2)
    s_d = mass_stopping_power(1, m_d, kes_d, d2)
    np.testing.assert_allclose(s_d, s_p, rtol=1e-3)
