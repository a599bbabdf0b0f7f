"""Native (C++) acceleration components.

``libstopping.so`` is the stopping-power/range table generator (the slot
pycatima occupies in the reference's stack). It is loaded lazily via ctypes;
if the shared object is missing it is built from ``native/stopping.cpp``
with g++ when available, and the pure-Python implementation in
:mod:`attpc_engine_tpu.nuclear.stopping` is the fallback either way.
Set ``ATTPC_TPU_NO_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _build_if_possible(so_path: Path) -> bool:
    src = Path(__file__).resolve().parents[2] / "native" / "stopping.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(so_path), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so_path.exists()
    except (OSError, subprocess.SubprocessError):
        return False


def get_stopping_lib():
    """The ctypes handle to libstopping, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ATTPC_TPU_NO_NATIVE"):
        return None
    so_path = Path(__file__).parent / "libstopping.so"
    if not so_path.exists() and not _build_if_possible(so_path):
        return None
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None
    d = ctypes.POINTER(ctypes.c_double)
    lib.mass_stopping_power.argtypes = [
        ctypes.c_int, ctypes.c_double, d, ctypes.c_int,
        d, d, d, ctypes.c_int, ctypes.c_double, d,
    ]
    lib.mass_stopping_power.restype = None
    lib.csda_range.argtypes = [d, d, ctypes.c_int, d]
    lib.csda_range.restype = None
    _LIB = lib
    return _LIB


def native_mass_stopping_power(
    z_proj: int,
    mass_mev: float,
    ke_mev: np.ndarray,
    constituents: list[tuple[int, int, float]],
    i_override_ev: float | None = None,
) -> np.ndarray | None:
    """C++ stopping power; returns None if the native lib is unavailable."""
    lib = get_stopping_lib()
    if lib is None:
        return None
    ke = np.ascontiguousarray(np.atleast_1d(ke_mev), dtype=np.float64)
    z_t = np.ascontiguousarray([c[0] for c in constituents], dtype=np.float64)
    a_t = np.ascontiguousarray([c[1] for c in constituents], dtype=np.float64)
    w_t = np.ascontiguousarray([c[2] for c in constituents], dtype=np.float64)
    out = np.empty_like(ke)
    d = ctypes.POINTER(ctypes.c_double)
    lib.mass_stopping_power(
        int(z_proj), float(mass_mev),
        ke.ctypes.data_as(d), len(ke),
        z_t.ctypes.data_as(d), a_t.ctypes.data_as(d), w_t.ctypes.data_as(d),
        len(constituents),
        float(i_override_ev or 0.0),
        out.ctypes.data_as(d),
    )
    return out.reshape(np.shape(ke_mev))
