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
