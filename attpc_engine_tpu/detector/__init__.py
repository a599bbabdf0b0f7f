"""Detector stage: transport, diffusion, pad response, point-cloud output.

Public API mirrors the reference's ``attpc_engine.detector``
(/root/reference/src/attpc_engine/detector/__init__.py:1-21).
"""

from .parameters import Config, DetectorParams, ElectronicsParams, PadParams
from .simulator import DetectorSimulator, EngineParams, run_simulation, simulate
from .writer import (
    SimulationWriter,
    SpyralWriter,
    SpyralWriterProc,
    convert_to_spyral,
)
from .response import get_response, apply_response

__all__ = [
    "Config",
    "DetectorParams",
    "ElectronicsParams",
    "PadParams",
    "DetectorSimulator",
    "EngineParams",
    "run_simulation",
    "simulate",
    "SimulationWriter",
    "SpyralWriter",
    "SpyralWriterProc",
    "convert_to_spyral",
    "get_response",
    "apply_response",
]
