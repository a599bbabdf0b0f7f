"""Kinematics stage: batched reaction/decay phase-space sampling.

Public API mirrors the reference's ``attpc_engine.kinematics``
(/root/reference/src/attpc_engine/kinematics/__init__.py:1-33) so user
scripts port directly.
"""

from .reaction import Reaction, Decay, FourVector, reaction_batch, decay_batch
from .excitation import (
    ExcitationDistribution,
    ExcitationGaussian,
    ExcitationUniform,
    ExcitationBreitWigner,
)
from .angle import PolarDistribution, PolarUniform, PolarArbitrary
from .pipeline import (
    KinematicsPipeline,
    KinematicsTargetMaterial,
    PipelineError,
    run_kinematics_pipeline,
    Sample,
)

__all__ = [
    "Reaction",
    "Decay",
    "FourVector",
    "reaction_batch",
    "decay_batch",
    "ExcitationDistribution",
    "ExcitationGaussian",
    "ExcitationUniform",
    "ExcitationBreitWigner",
    "PolarDistribution",
    "PolarUniform",
    "PolarArbitrary",
    "KinematicsPipeline",
    "KinematicsTargetMaterial",
    "PipelineError",
    "run_kinematics_pipeline",
    "Sample",
]
