"""Alias of :mod:`attpc_engine_tpu.kinematics` under the upstream name.

Mirrors the reference export list (``src/attpc_engine/kinematics/__init__.py``)
plus the engine's public extensions, and registers the upstream submodule
paths (``attpc_engine.kinematics.pipeline`` etc.) so ``from
attpc_engine.kinematics.pipeline import PipelineError``-style imports work.
"""

import sys as _sys

from attpc_engine_tpu.io import convert_kinematics as _convert_kinematics
from attpc_engine_tpu.kinematics import (
    Decay,
    ExcitationBreitWigner,
    ExcitationDistribution,
    ExcitationGaussian,
    ExcitationUniform,
    KinematicsPipeline,
    KinematicsTargetMaterial,
    PipelineError,
    PolarArbitrary,
    PolarDistribution,
    PolarUniform,
    Reaction,
    run_kinematics_pipeline,
)
from attpc_engine_tpu.kinematics import angle as _angle
from attpc_engine_tpu.kinematics import excitation as _excitation
from attpc_engine_tpu.kinematics import pipeline as _pipeline
from attpc_engine_tpu.kinematics import reaction as _reaction

_sys.modules[__name__ + ".pipeline"] = _pipeline
_sys.modules[__name__ + ".excitation"] = _excitation
_sys.modules[__name__ + ".angle"] = _angle
_sys.modules[__name__ + ".reaction"] = _reaction
# upstream hosts the converter inside kinematics/ (reference
# kinematics/convert_kinematics.py); this engine hosts it in io/
_sys.modules[__name__ + ".convert_kinematics"] = _convert_kinematics

__all__ = [
    "KinematicsPipeline",
    "run_kinematics_pipeline",
    "KinematicsTargetMaterial",
    "ExcitationDistribution",
    "ExcitationGaussian",
    "ExcitationUniform",
    "ExcitationBreitWigner",
    "PolarDistribution",
    "PolarArbitrary",
    "PolarUniform",
    "Reaction",
    "Decay",
    "PipelineError",
]
