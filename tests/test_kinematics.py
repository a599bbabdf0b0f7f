"""Kinematics tests.

Ports the semantics of the reference suite
(/root/reference/tests/test_kinematics.py) — the LISE++ golden value and the
chain-validation error cases — and adds batched-sampler checks the reference
doesn't have.
"""

import numpy as np
import pytest

import jax

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.kinematics import (
    KinematicsPipeline,
    ExcitationGaussian,
    PolarUniform,
    Reaction,
    Decay,
)
from attpc_engine_tpu.kinematics.pipeline import PipelineError


def test_reaction():
    """12C(d,p)13C ejectile KE at 16 MeV beam, 20 deg CM vs LISE++ (1 keV)."""
    target = nuclear_map.get_data(6, 12)
    projectile = nuclear_map.get_data(1, 2)
    ejectile = nuclear_map.get_data(1, 1)

    rxn = Reaction(target, projectile, ejectile)

    proj_energy = 16.0  # MeV
    eject_polar = np.deg2rad(20.0)
    eject_azim = 0.0
    resid_ex = 0.0

    lise_val = 18.391

    result = rxn.calculate(
        proj_energy, eject_polar, eject_azim, residual_excitation=resid_ex
    )
    eject_ke = result[2].E - result[2].M
    assert np.round(eject_ke, decimals=3) == lise_val


def _good_pipeline():
    return KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(5, 10),
                projectile=nuclear_map.get_data(2, 3),
                ejectile=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(5, 9),
                residual_1=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(3, 5),
                residual_1=nuclear_map.get_data(2, 4),
            ),
        ],
        [
            ExcitationGaussian(16.8, 0.2),
            ExcitationGaussian(0.0, 1.25),
            ExcitationGaussian(0.0, 0.0),
        ],
        [
            PolarUniform(0.0, np.pi),
            PolarUniform(0.0, np.pi),
            PolarUniform(0.0, np.pi),
        ],
        24.0,
    )


def test_pipeline():
    pipeline = _good_pipeline()
    vertex, result = pipeline.run()
    assert np.all(pipeline.get_proton_numbers() == np.array([5, 2, 2, 5, 2, 3, 2, 1]))
    assert np.all(pipeline.get_mass_numbers() == np.array([10, 3, 4, 9, 4, 5, 4, 1]))
    assert len(result) == 8
    assert np.all(vertex == 0.0)


def test_pipeline_batch_conservation():
    """Batched events conserve 4-momentum through the whole chain."""
    pipeline = _good_pipeline()
    key = jax.random.PRNGKey(7)
    vertices, momenta = pipeline.run_batch(256, key=key)
    assert momenta.shape == (256, 8, 4)
    # initial = target + projectile; final = ejectile + last decay chain
    initial = momenta[:, 0] + momenta[:, 1]
    final = momenta[:, 2] + momenta[:, 4] + momenta[:, 6] + momenta[:, 7]
    np.testing.assert_allclose(initial, final, rtol=0, atol=1e-8)
    # every outgoing particle is on-shell or above (E >= m within excitation)
    e = momenta[:, :, 3]
    p2 = (momenta[:, :, :3] ** 2).sum(axis=-1)
    assert np.all(e**2 - p2 > 0)


def test_pipeline_ex_length():
    with pytest.raises(PipelineError):
        KinematicsPipeline(
            [
                Reaction(
                    target=nuclear_map.get_data(5, 10),
                    projectile=nuclear_map.get_data(2, 3),
                    ejectile=nuclear_map.get_data(2, 4),
                ),
                Decay(
                    parent=nuclear_map.get_data(5, 9),
                    residual_1=nuclear_map.get_data(2, 4),
                ),
            ],
            [ExcitationGaussian(16.8, 0.2)],
            [PolarUniform(0.0, np.pi), PolarUniform(0.0, np.pi)],
            24.0,
        )


def test_pipeline_pl_length():
    with pytest.raises(PipelineError):
        KinematicsPipeline(
            [
                Reaction(
                    target=nuclear_map.get_data(5, 10),
                    projectile=nuclear_map.get_data(2, 3),
                    ejectile=nuclear_map.get_data(2, 4),
                ),
                Decay(
                    parent=nuclear_map.get_data(5, 9),
                    residual_1=nuclear_map.get_data(2, 4),
                ),
            ],
            [ExcitationGaussian(16.8, 0.2), ExcitationGaussian(0.0, 0.0)],
            [PolarUniform(0.0, np.pi)],
            24.0,
        )


def test_pipeline_chain():
    with pytest.raises(PipelineError):
        KinematicsPipeline(
            [
                Reaction(
                    target=nuclear_map.get_data(5, 10),
                    projectile=nuclear_map.get_data(2, 3),
                    ejectile=nuclear_map.get_data(2, 4),
                ),
                Decay(
                    parent=nuclear_map.get_data(4, 8),
                    residual_1=nuclear_map.get_data(2, 4),
                ),
            ],
            [ExcitationGaussian(16.8, 0.2), ExcitationGaussian(0.0, 0.0)],
            [PolarUniform(0.0, np.pi), PolarUniform(0.0, np.pi)],
            24.0,
        )


def test_pipeline_order():
    with pytest.raises(PipelineError):
        KinematicsPipeline(
            [
                Decay(
                    parent=nuclear_map.get_data(5, 9),
                    residual_1=nuclear_map.get_data(2, 4),
                ),
                Reaction(
                    target=nuclear_map.get_data(5, 10),
                    projectile=nuclear_map.get_data(2, 3),
                    ejectile=nuclear_map.get_data(2, 4),
                ),
            ],
            [ExcitationGaussian(16.8, 0.2), ExcitationGaussian(0.0, 0.0)],
            [PolarUniform(0.0, np.pi), PolarUniform(0.0, np.pi)],
            24.0,
        )


def test_pipeline_sample_limit():
    """An energetically banned excitation must hit the sample limit."""
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(5, 10),
                projectile=nuclear_map.get_data(2, 3),
                ejectile=nuclear_map.get_data(2, 4),
            ),
        ],
        [ExcitationGaussian(16.8, 0.2)],
        [PolarUniform(0.0, np.pi)],
        2.0,
        event_sample_limit=50,
    )
    with pytest.raises(PipelineError):
        pipeline.run()


def test_excitation_statistics():
    """Sampled excitation distribution matches the requested pdf."""
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(6, 12),
                projectile=nuclear_map.get_data(1, 2),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(3.089, 0.2)],
        [PolarUniform(0.0, np.pi)],
        16.0,
    )
    _, momenta = pipeline.run_batch(4096, key=jax.random.PRNGKey(3))
    # reconstruct Ex from the residual invariant mass
    resid = momenta[:, 3]
    m_inv = np.sqrt(resid[:, 3] ** 2 - (resid[:, :3] ** 2).sum(axis=-1))
    ex = m_inv - nuclear_map.get_data(6, 13).mass
    assert abs(ex.mean() - 3.089) < 0.02
    assert abs(ex.std() - 0.2 / 2.355) < 0.01


def test_polar_uniform_statistics():
    """cos(theta_cm) of the ejectile is uniform for PolarUniform(0, pi)."""
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(6, 12),
                projectile=nuclear_map.get_data(1, 2),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        16.0,
    )
    _, momenta = pipeline.run_batch(8192, key=jax.random.PRNGKey(5))
    # boost ejectile to CM of target+projectile and check cos(theta) uniform
    parent = momenta[:, 0] + momenta[:, 1]
    beta = parent[:, 2] / parent[:, 3]
    gamma = 1.0 / np.sqrt(1.0 - beta**2)
    ej = momenta[:, 2]
    pz_cm = gamma * (ej[:, 2] - beta * ej[:, 3])
    p_cm = np.sqrt(ej[:, 0] ** 2 + ej[:, 1] ** 2 + pz_cm**2)
    cos_th = pz_cm / p_cm
    # Kolmogorov-Smirnov-ish check: mean ~ 0, uniform moments
    assert abs(cos_th.mean()) < 0.02
    assert abs((cos_th**2).mean() - 1.0 / 3.0) < 0.01


def test_vertex_and_beam_energy_loss_statistics():
    """Vertex sampling semantics (reference pipeline.py:246-264): rho is
    |N(0, rho_sigma)|, theta uniform in [0, 2pi), z uniform in z_range, and
    the projectile's kinetic energy at the vertex is the beam energy minus
    the gas energy loss over z — checked statistically on a 16k batch and
    against GasTarget.get_energy_loss directly."""
    from attpc_engine_tpu.kinematics import KinematicsTargetMaterial
    from attpc_engine_tpu.nuclear import GasTarget

    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    beam_energy = 120.0
    z_lo, z_hi, rho_sigma = 0.2, 0.8, 0.007
    pipe = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        beam_energy,
        target_material=KinematicsTargetMaterial(
            material=gas, z_range=(z_lo, z_hi), rho_sigma=rho_sigma
        ),
    )
    n = 16384
    vertices, momenta = pipe.run_batch(n, key=jax.random.PRNGKey(11))
    vertices = np.asarray(vertices)
    momenta = np.asarray(momenta)

    z = vertices[:, 2]
    assert z.min() >= z_lo and z.max() <= z_hi
    assert np.mean(z) == pytest.approx((z_lo + z_hi) / 2, abs=0.005)
    assert np.var(z) == pytest.approx((z_hi - z_lo) ** 2 / 12, rel=0.05)

    rho = np.hypot(vertices[:, 0], vertices[:, 1])
    # |N(0, s)|: mean = s*sqrt(2/pi), E[rho^2] = s^2
    assert np.mean(rho) == pytest.approx(rho_sigma * np.sqrt(2 / np.pi), rel=0.03)
    assert np.mean(rho**2) == pytest.approx(rho_sigma**2, rel=0.05)
    # theta uniform: x and y symmetric around 0
    assert abs(np.mean(vertices[:, 0])) < 3 * rho_sigma / np.sqrt(n)
    assert abs(np.mean(vertices[:, 1])) < 3 * rho_sigma / np.sqrt(n)

    # projectile (row 1) KE at the vertex = beam - get_energy_loss(z)
    m_c12 = nuclear_map.get_data(6, 12).mass
    ke = momenta[:, 1, 3] - m_c12
    c12 = nuclear_map.get_data(6, 12)
    expected = beam_energy - gas.get_energy_loss(c12, beam_energy, z)
    np.testing.assert_allclose(ke, expected, rtol=1e-6)
    # losses are physical: positive and increasing with depth
    order = np.argsort(z)
    assert np.all(ke < beam_energy)
    binned = np.array_split(ke[order], 16)
    means = [b.mean() for b in binned]
    assert all(a > b for a, b in zip(means, means[1:]))
