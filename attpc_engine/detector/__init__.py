"""Alias of :mod:`attpc_engine_tpu.detector` under the upstream name.

Mirrors the reference export list (``src/attpc_engine/detector/__init__.py``)
plus the engine's public extensions, and registers the upstream submodule
paths whose surfaces this engine reproduces one-to-one (``parameters``,
``writer``, ``simulator``, ``response``, ``beam_pads``, ``constants``,
``pairing``). The upstream internals with no same-shaped counterpart are
deliberately NOT aliased: ``solver``/``transporter`` (numba per-track
kernels — here batched JAX/Pallas programs in
``attpc_engine_tpu.detector.transport``/``deposition``) and ``typed_dict``
(a numba type-hint shim; no numba in this stack).
"""

import sys as _sys

from attpc_engine_tpu import constants as _constants
from attpc_engine_tpu.detector import (
    Config,
    DetectorParams,
    DetectorSimulator,
    ElectronicsParams,
    EngineParams,
    PadParams,
    SimulationWriter,
    SpyralWriter,
    SpyralWriterProc,
    run_simulation,
    simulate,
)
from attpc_engine_tpu.detector import beam_pads as _beam_pads
from attpc_engine_tpu.detector import parameters as _parameters
from attpc_engine_tpu.detector import response as _response
from attpc_engine_tpu.detector import simulator as _simulator
from attpc_engine_tpu.detector import writer as _writer
from attpc_engine_tpu.ops import pairing as _pairing

_sys.modules[__name__ + ".parameters"] = _parameters
_sys.modules[__name__ + ".writer"] = _writer
_sys.modules[__name__ + ".simulator"] = _simulator
_sys.modules[__name__ + ".response"] = _response
_sys.modules[__name__ + ".beam_pads"] = _beam_pads
_sys.modules[__name__ + ".constants"] = _constants
_sys.modules[__name__ + ".pairing"] = _pairing

__all__ = [
    "run_simulation",
    "DetectorParams",
    "ElectronicsParams",
    "PadParams",
    "Config",
    "SpyralWriter",
    "SimulationWriter",
    "simulate",
    "DetectorSimulator",
    "EngineParams",
    "SpyralWriterProc",
]
