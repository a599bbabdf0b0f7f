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


def test_range_alpha():
    """Alpha range in D2 gas at 300 Torr: sane order of magnitude (meters)."""
    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    alpha = nuclear_map.get_data(2, 4)
    r = gas.get_range(alpha, 10.0)
    # ~10 MeV alpha in ~6.6e-5 g/cm3 gas: tens of cm to meters
    assert 0.1 < r < 20.0


def test_load_target_json(tmp_path):
    import json

    path = tmp_path / "target.json"
    with path.open("w") as f:
        json.dump({"compound": [[1, 2, 2]], "pressure(Torr)": 300.0}, f)
    gas = load_target(path, nuclear_map)
    assert isinstance(gas, GasTarget)
    assert gas.pressure == 300.0
    assert gas.components == [(1, 2, 2)]
