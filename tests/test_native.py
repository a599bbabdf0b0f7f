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


# --------------------------------------------------------------------------
# libspyral_io: native writer-child pipeline (wiggle / assemble / HDF5)
# --------------------------------------------------------------------------


def _sio():
    from attpc_engine_tpu.native import get_spyral_io_lib

    lib = get_spyral_io_lib()
    if lib is None:
        pytest.skip("libspyral_io unavailable")
    return lib


def test_spyral_io_wiggle_bit_exact():
    """C Philox wiggle must reproduce numpy's Generator(Philox).random."""
    import ctypes

    lib = _sio()
    d = ctypes.POINTER(ctypes.c_double)
    cases = [(0, 0, 1), (6, 3, 7), (123456789, 42, 1000),
             (2**63 + 5, 99991, 13), (7, 2**40, 4097), (2**64 - 1, 0, 5)]
    for seed, ev, n in cases:
        s = seed & 0xFFFFFFFFFFFFFFFF
        out = np.empty(n)
        lib.sio_wiggle(s, ev, n, out.ctypes.data_as(d))
        key = np.array([s, ev], dtype=np.uint64)
        ref = np.random.Generator(np.random.Philox(key=key)).random(n)
        np.testing.assert_array_equal(out, ref)


def _fake_batch(rng, nev=7, zero_at=2):
    counts = rng.integers(0, 400, nev)
    counts[zero_at] = 0
    rows = int(counts.sum())
    q = (rng.random(rows, dtype=np.float32) * 50 + 1).astype(np.float32)
    tb = rng.integers(0, 512, rows).astype(np.int32)
    off = np.concatenate([[0], np.cumsum(counts)])
    for i in range(nev):  # device pre-sorts descending integer tb
        lo, hi = off[i], off[i + 1]
        tb[lo:hi] = np.sort(tb[lo:hi])[::-1]
    pad = rng.integers(0, 10240, rows).astype(np.int32)
    lab = rng.integers(0, 3, rows).astype(np.int32)
    packed = np.stack(
        [q.view(np.int32), (tb << 22) | (pad << 8) | lab], axis=1
    ).astype(np.int32)
    return counts.astype(np.int64), packed


def test_spyral_io_assemble_bit_exact():
    """C assemble_batch == the numpy wiggle+sort+assemble child pipeline."""
    import sys
    from pathlib import Path

    from attpc_engine_tpu.native import native_assemble_batch

    _sio()
    child_dir = str(
        Path(__file__).resolve().parents[1] / "attpc_engine_tpu" / "io"
    )
    sys.path.insert(0, child_dir)
    try:
        from spyral_child import assemble, split_packed, wiggle_for_events
    finally:
        sys.path.remove(child_dir)

    rng = np.random.default_rng(11)
    counts, packed = _fake_batch(rng)
    nev, start, seed = len(counts), 1000, 987654321
    NTB = 512
    tables = {
        "pad_centers": rng.random((10240, 2)) * 280 - 140,
        "pad_sizes": rng.random(10240),
        "resp_asc": np.sort(rng.random(NTB) * 0.3),
        "windows_edge": np.float64(560.0),
        "micromegas_edge": np.float64(10.0),
        "length": np.float64(1.0),
    }
    tables["resp_prefix"] = np.concatenate(
        [[0.0], np.cumsum(tables["resp_asc"])]
    )
    tables["resp_max"] = np.float64(tables["resp_asc"].max())

    # numpy reference: exactly the child's fallback path
    q, tbi, pad, lab = split_packed(packed.copy())
    wig = wiggle_for_events(counts, np.arange(start, start + nev), seed)
    tbf = tbi + wig
    off = np.concatenate([[0], np.cumsum(counts)])
    for i in range(nev):
        lo, hi = int(off[i]), int(off[i + 1])
        if hi - lo > 1:
            order = np.argsort(-tbf[lo:hi], kind="stable")
            q[lo:hi] = q[lo:hi][order]
            tbf[lo:hi] = tbf[lo:hi][order]
            pad[lo:hi] = pad[lo:hi][order]
            lab[lo:hi] = lab[lo:hi][order]
    ref_sp, ref_lab = assemble(q, tbf, pad, lab, dict(tables))

    nat_tables = {
        "pad_cx": np.ascontiguousarray(tables["pad_centers"][:, 0]),
        "pad_cy": np.ascontiguousarray(tables["pad_centers"][:, 1]),
        "pad_sizes": tables["pad_sizes"],
        "resp_asc": tables["resp_asc"],
        "resp_prefix": tables["resp_prefix"],
        "resp_max": tables["resp_max"],
        "windows_edge": 560.0,
        "micromegas_edge": 10.0,
        "length": 1.0,
    }
    out = native_assemble_batch(packed, counts, start, seed, nat_tables)
    assert out is not None
    np.testing.assert_array_equal(out[0], ref_sp)
    np.testing.assert_array_equal(out[1], ref_lab)


def test_spyral_io_assemble_sort_branches():
    """The run-aware z-sort's three branches are all bit-exact vs numpy:
    equal-tb runs > 32 rows (per-run std::stable_sort), short runs
    (allocation-free insertion sort), and NON-descending integer tbs
    (precondition violated -> full-sort fallback)."""
    import sys
    from pathlib import Path

    from attpc_engine_tpu.native import native_assemble_batch

    _sio()
    child_dir = str(
        Path(__file__).resolve().parents[1] / "attpc_engine_tpu" / "io"
    )
    sys.path.insert(0, child_dir)
    try:
        from spyral_child import assemble, split_packed, wiggle_for_events
    finally:
        sys.path.remove(child_dir)

    rng = np.random.default_rng(23)
    # event 0: one giant equal-tb run (400 rows, > the insertion cutoff 32)
    # event 1: a handful of runs straddling the cutoff (lengths 40/32/33/1)
    # event 2: short descending runs (the production shape)
    # event 3: tbs NOT descending -> the C side must detect and fall back
    tbs = [
        np.full(400, 77, np.int32),
        np.repeat(np.int32([500, 300, 299, 7]), [40, 32, 33, 1]),
        np.sort(rng.integers(0, 512, 200).astype(np.int32))[::-1],
        rng.permutation(np.arange(120, dtype=np.int32)),
    ]
    counts = np.array([len(t) for t in tbs], dtype=np.int64)
    tb = np.concatenate(tbs)
    rows = int(counts.sum())
    q = (rng.random(rows, dtype=np.float32) * 50 + 1).astype(np.float32)
    pad = rng.integers(0, 10240, rows).astype(np.int32)
    lab = rng.integers(0, 3, rows).astype(np.int32)
    packed = np.stack(
        [q.view(np.int32), (tb << 22) | (pad << 8) | lab], axis=1
    ).astype(np.int32)
    nev, start, seed = len(counts), 40, 13579
    NTB = 512
    tables = {
        "pad_centers": rng.random((10240, 2)) * 280 - 140,
        "pad_sizes": rng.random(10240),
        "resp_asc": np.sort(rng.random(NTB) * 0.3),
        "windows_edge": np.float64(560.0),
        "micromegas_edge": np.float64(10.0),
        "length": np.float64(1.0),
    }
    tables["resp_prefix"] = np.concatenate(
        [[0.0], np.cumsum(tables["resp_asc"])]
    )
    tables["resp_max"] = np.float64(tables["resp_asc"].max())

    qq, tbi, pp, ll = split_packed(packed.copy())
    wig = wiggle_for_events(counts, np.arange(start, start + nev), seed)
    tbf = tbi + wig
    off = np.concatenate([[0], np.cumsum(counts)])
    for i in range(nev):
        lo, hi = int(off[i]), int(off[i + 1])
        order = np.argsort(-tbf[lo:hi], kind="stable")
        qq[lo:hi] = qq[lo:hi][order]
        tbf[lo:hi] = tbf[lo:hi][order]
        pp[lo:hi] = pp[lo:hi][order]
        ll[lo:hi] = ll[lo:hi][order]
    ref_sp, ref_lab = assemble(qq, tbf, pp, ll, dict(tables))

    nat_tables = {
        "pad_cx": np.ascontiguousarray(tables["pad_centers"][:, 0]),
        "pad_cy": np.ascontiguousarray(tables["pad_centers"][:, 1]),
        "pad_sizes": tables["pad_sizes"],
        "resp_asc": tables["resp_asc"],
        "resp_prefix": tables["resp_prefix"],
        "resp_max": tables["resp_max"],
        "windows_edge": 560.0,
        "micromegas_edge": 10.0,
        "length": 1.0,
    }
    out = native_assemble_batch(packed, counts, start, seed, nat_tables)
    assert out is not None
    np.testing.assert_array_equal(out[0], ref_sp)
    np.testing.assert_array_equal(out[1], ref_lab)


def test_spyral_io_h5_writer_values(tmp_path):
    """Native libhdf5 writer produces the exact h5py-readable contract."""
    import ctypes

    import h5py

    from attpc_engine_tpu.native import get_spyral_io_lib

    lib = get_spyral_io_lib(with_h5=True)
    if lib is None:
        pytest.skip("libspyral_io h5 writer unavailable")
    d = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    path = str(tmp_path / "native.h5")
    h = lib.sio_h5_open(path.encode())
    assert h
    sp = np.arange(24, dtype=np.float64).reshape(3, 8)
    labs = np.array([1, 0, 2], dtype=np.int64)
    assert lib.sio_h5_write_event(
        h, 7, 0, sp.ctypes.data_as(d), 3, labs.ctypes.data_as(i64p)
    ) == 0
    assert lib.sio_h5_write_event(h, 7, 1, None, 0, None) == 0
    assert lib.sio_h5_close(h, 0, 1) == 0
    with h5py.File(path) as f:
        g = f["cloud"]
        assert dict(g.attrs) == {"min_event": 0, "max_event": 1}
        assert g["cloud_0"].dtype == np.float64
        assert g["labels_0"].dtype == np.int64
        np.testing.assert_array_equal(g["cloud_0"][:], sp)
        np.testing.assert_array_equal(g["labels_0"][:], labs)
        a = dict(g["cloud_0"].attrs)
        assert a["orig_run"] == 7 and a["orig_event"] == 0
        for nm in ("ic_amplitude", "ic_multiplicity", "ic_integral",
                   "ic_centroid"):
            assert a[nm] == -1.0 and isinstance(a[nm], np.float64)
        assert isinstance(a["orig_run"], np.int64)
        assert g["cloud_1"].shape == (0, 8)
        assert g["labels_1"].shape == (0,)


def test_spyral_io_h5_latest_format_values(tmp_path):
    """sio_h5_set_latest(1) writes 1.8-format files (the writer child's
    measured floor is per-event metadata CPU in old-format storage) with
    h5py-identical content — the Spyral contract is h5py-level."""
    import ctypes

    import h5py

    from attpc_engine_tpu.native import get_spyral_io_lib

    lib = get_spyral_io_lib(with_h5=True)
    if lib is None:
        pytest.skip("libspyral_io h5 writer unavailable")
    try:
        lib.sio_h5_set_latest.argtypes = [ctypes.c_int]
        lib.sio_h5_set_latest.restype = None
    except AttributeError:
        pytest.skip("prebuilt .so without sio_h5_set_latest")
    d = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    sp = np.arange(24, dtype=np.float64).reshape(3, 8)
    labs = np.array([1, 0, 2], dtype=np.int64)

    def write(path):
        h = lib.sio_h5_open(path.encode())
        assert h
        assert lib.sio_h5_write_event(
            h, 7, 0, sp.ctypes.data_as(d), 3, labs.ctypes.data_as(i64p)
        ) == 0
        assert lib.sio_h5_write_event(h, 7, 1, None, 0, None) == 0
        assert lib.sio_h5_close(h, 0, 1) == 0

    p_old = str(tmp_path / "old.h5")
    p_new = str(tmp_path / "new.h5")
    write(p_old)
    lib.sio_h5_set_latest(1)
    try:
        write(p_new)
    finally:
        lib.sio_h5_set_latest(0)  # process-global toggle: restore
    with h5py.File(p_old) as fa, h5py.File(p_new) as fb:
        ga, gb = fa["cloud"], fb["cloud"]
        assert dict(ga.attrs) == dict(gb.attrs)
        for k in ("cloud_0", "labels_0", "cloud_1", "labels_1"):
            np.testing.assert_array_equal(ga[k][()], gb[k][()])
            assert ga[k].dtype == gb[k].dtype
        assert dict(ga["cloud_0"].attrs) == dict(gb["cloud_0"].attrs)
