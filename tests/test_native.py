"""Native C++ stopping library tests: availability and parity with the
pure-Python implementation."""

import os

import numpy as np
import pytest

from attpc_engine_tpu.native import get_stopping_lib, native_mass_stopping_power


def test_native_lib_builds():
    lib = get_stopping_lib()
    if lib is None:
        pytest.skip("no g++ / native lib unavailable")
    assert lib is not None


def test_native_matches_python():
    lib = get_stopping_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    constituents = [(1, 2, 1.0)]
    ke = np.geomspace(1e-4, 1000.0, 500)
    native = native_mass_stopping_power(1, 938.272, ke, constituents)

    os.environ["ATTPC_TPU_NO_NATIVE"] = "1"
    try:
        # bypass the cached lib by calling the numpy body directly
        from attpc_engine_tpu.nuclear import stopping as stopping_mod
        import attpc_engine_tpu.native as native_mod

        saved_lib, saved_tried = native_mod._LIB, native_mod._TRIED
        native_mod._LIB, native_mod._TRIED = None, True
        try:
            python = stopping_mod.mass_stopping_power(
                1, 938.272, ke, constituents
            )
        finally:
            native_mod._LIB, native_mod._TRIED = saved_lib, saved_tried
    finally:
        del os.environ["ATTPC_TPU_NO_NATIVE"]

    np.testing.assert_allclose(native, python, rtol=1e-12)
