"""Beam-region pad ids.

The reference hardcodes the beam-pad id list in source
(/root/reference/src/attpc_engine/detector/beam_pads.py:11-137); here the
ids live in the packaged geometry bundle (they are detector hardware data)
and this module exposes them under the same names for API parity. The veto
applied in the transport kernels uses the O(1) boolean LUT ``BEAM_MASK``
rather than a per-pixel linear membership scan.
"""

from importlib import resources

import numpy as np

_handle = resources.files("attpc_engine_tpu.detector.data").joinpath("pad_assets.npz")
with resources.as_file(_handle) as _path:
    _bundle = np.load(_path)
    BEAM_PADS_ARRAY: np.ndarray = _bundle["beam_pads"]
    BEAM_MASK: np.ndarray = _bundle["beam_mask"]

BEAM_PADS: list[int] = BEAM_PADS_ARRAY.tolist()

__all__ = ["BEAM_PADS", "BEAM_PADS_ARRAY", "BEAM_MASK"]
