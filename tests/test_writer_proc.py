"""SpyralWriterProc must produce byte-identical files to SpyralWriter."""

import glob

import h5py
import numpy as np

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.nuclear import GasTarget
from attpc_engine_tpu.kinematics import (
    KinematicsPipeline,
    ExcitationGaussian,
    PolarUniform,
    Reaction,
    run_kinematics_pipeline,
)
from attpc_engine_tpu.detector import (
    Config,
    DetectorParams,
    ElectronicsParams,
    PadParams,
    EngineParams,
    SpyralWriter,
    SpyralWriterProc,
    run_simulation,
)

gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)


def test_writer_proc_byte_identical(tmp_path):
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        120.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 12, kine, batch_size=12, seed=31,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=4,
    )
    d_thread = tmp_path / "thread"
    d_proc = tmp_path / "proc"
    d_thread.mkdir()
    d_proc.mkdir()
    # rotation exercised too: 5 events per file over 12 events
    run_simulation(config, kine, SpyralWriter(d_thread, config, 5),
                   engine=engine, seed=6, show_progress=False)
    run_simulation(config, kine, SpyralWriterProc(d_proc, config, 5),
                   engine=engine, seed=6, show_progress=False)

    files_a = sorted(glob.glob(str(d_thread / "run_*.h5")))
    files_b = sorted(glob.glob(str(d_proc / "run_*.h5")))
    assert [f.split("/")[-1] for f in files_a] == [
        f.split("/")[-1] for f in files_b
    ]
    assert len(files_a) >= 2  # rotation happened
    for fa, fb in zip(files_a, files_b):
        with h5py.File(fa) as a, h5py.File(fb) as b:
            ga, gb = a["cloud"], b["cloud"]
            assert set(ga.keys()) == set(gb.keys())
            assert ga.attrs["min_event"] == gb.attrs["min_event"]
            assert ga.attrs["max_event"] == gb.attrs["max_event"]
            for k in ga.keys():
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k
                )
                for attr in ga[k].attrs:
                    assert ga[k].attrs[attr] == gb[k].attrs[attr], (k, attr)


def test_empty_event_datasets_reference_parity(tmp_path):
    """Events whose points all fail the ADC threshold must get EMPTY
    cloud_N/labels_N datasets and count toward rotation (reference
    writer.py:240-255); raw-empty events stay skipped
    (reference simulator.py:204-205). Both writer paths must agree."""
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    rng = np.random.default_rng(3)
    rows = 5
    q = rng.uniform(1e4, 1e6, rows).astype(np.float32)
    tb = rng.integers(0, 512, rows).astype(np.int32)
    pad = rng.integers(0, 10240, rows).astype(np.int32)
    lab = np.full(rows, 2, np.int32)
    counts = np.array([2, 0, 0, 3])  # kept rows per event
    raw_counts = np.array([2, 7, 0, 3])  # event 1: all-below-threshold
    event_numbers = np.arange(4)
    wseed = 77

    d_pool = tmp_path / "pool"
    d_proc = tmp_path / "proc"
    d_pool.mkdir()
    d_proc.mkdir()

    from attpc_engine_tpu.detector.simulator import (
        DetectorSimulator, split_packed,
    )

    # pack into the [rows, 2] i32 wire layout as _convert_to_spyral emits it
    packed = np.empty((rows, 2), dtype=np.int32)
    packed[:, 0] = q.view(np.int32)
    packed[:, 1] = (tb << 22) | (pad << 8) | lab
    q2, tb2, pad2, lab2 = split_packed(packed)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(tb2, tb)
    np.testing.assert_array_equal(pad2, pad)
    np.testing.assert_array_equal(lab2, lab)

    w = SpyralWriter(d_pool, config)
    sim_tables = DetectorSimulator(
        config, np.array([1, 1, 1]), np.array([2, 2, 2]), indices=[2],
        engine=EngineParams(events_per_batch=4),
    )
    spyral, labels = sim_tables.assemble_spyral_ordered(
        packed, counts, event_numbers, wseed
    )
    w.write_spyral_pool(spyral, labels, counts, event_numbers, raw_counts)
    w.close()

    wp = SpyralWriterProc(d_proc, config)
    wp.write_packed(packed, counts, event_numbers, raw_counts=raw_counts,
                    wiggle_seed=wseed)
    wp.close()

    for d in (d_pool, d_proc):
        with h5py.File(d / "run_0000.h5") as f:
            g = f["cloud"]
            # event 1 (threshold-empty): empty datasets present
            assert g["cloud_1"].shape == (0, 8)
            assert g["labels_1"].shape == (0,)
            assert g["cloud_1"].attrs["orig_event"] == 1
            # event 2 (raw-empty): skipped entirely
            assert "cloud_2" not in g
            assert g["cloud_0"].shape == (2, 8)
            assert g["cloud_3"].shape == (3, 8)


def test_writer_native_vs_python_identical(tmp_path):
    """The native (C) assembly+HDF5 pipeline and the numpy+h5py fallback
    must produce value-identical files, through the full simulation."""
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        120.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 6, kine, batch_size=6, seed=77,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=3,
    )
    import attpc_engine_tpu.native as native_mod

    if native_mod.get_spyral_io_lib(with_h5=True) is None:
        import pytest

        pytest.skip("libspyral_io unavailable")

    d_nat = tmp_path / "nat"
    d_py = tmp_path / "py"
    d_nat.mkdir()
    d_py.mkdir()
    run_simulation(config, kine, SpyralWriterProc(d_nat, config),
                   engine=engine, seed=5, show_progress=False)
    # force the pure-Python child + in-process paths
    saved = native_mod._SIO, native_mod._SIO_TRIED
    import os

    os.environ["ATTPC_TPU_NO_NATIVE"] = "1"
    native_mod._SIO, native_mod._SIO_TRIED = None, True
    try:
        run_simulation(config, kine, SpyralWriterProc(d_py, config),
                       engine=engine, seed=5, show_progress=False)
    finally:
        native_mod._SIO, native_mod._SIO_TRIED = saved
        del os.environ["ATTPC_TPU_NO_NATIVE"]

    fa = sorted(glob.glob(str(d_nat / "run_*.h5")))
    fb = sorted(glob.glob(str(d_py / "run_*.h5")))
    assert [f.split("/")[-1] for f in fa] == [f.split("/")[-1] for f in fb]
    for pa, pb in zip(fa, fb):
        with h5py.File(pa) as a, h5py.File(pb) as b:
            ga, gb = a["cloud"], b["cloud"]
            assert set(ga.keys()) == set(gb.keys()) and len(ga.keys())
            assert dict(ga.attrs) == dict(gb.attrs)
            for k in ga.keys():
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k
                )
                assert dict(ga[k].attrs) == dict(gb[k].attrs), k


def test_writer_recycled_mem_path_identical(tmp_path):
    """The in-memory (core VFD) image path with recycled destination files
    must produce value-identical files to the plain native per-file path,
    including when a recycled predecessor's stale bytes are overwritten in
    place (the no-O_TRUNC pwrite must leave an exactly-sized valid file)."""
    import attpc_engine_tpu.native as native_mod

    lib = native_mod.get_spyral_io_lib(with_h5=True)
    if lib is None or not lib.sio_h5_mem_available():
        import pytest

        pytest.skip("native in-memory HDF5 writer unavailable")

    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        120.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 12, kine, batch_size=12, seed=31,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=4,
    )
    d_plain = tmp_path / "plain"
    d_mem = tmp_path / "mem"
    d_plain.mkdir()
    d_mem.mkdir()
    # opt into the mem path and seed the recycle pool with oversized junk
    # files: the rename-then-overwrite flow must produce exact-size output
    rdir = d_mem / ".recycle"
    rdir.mkdir()
    for i in range(2):
        (rdir / f"spare_{i}.h5").write_bytes(b"\xab" * (1 << 20))
    # a stale .part sidecar (crashed predecessor mid-publish) must be
    # consumed as a spare, never surface as output, and never linger
    (d_mem / ".run_0099.h5.part").write_bytes(b"\xcd" * (1 << 20))

    run_simulation(config, kine, SpyralWriterProc(d_plain, config, 5),
                   engine=engine, seed=6, show_progress=False)
    run_simulation(config, kine, SpyralWriterProc(d_mem, config, 5),
                   engine=engine, seed=6, show_progress=False)

    # atomic publish leaves no sidecars behind (the stale one included)
    assert not list(d_mem.glob(".run_*.h5.part"))
    files_a = sorted(glob.glob(str(d_plain / "run_*.h5")))
    files_b = sorted(glob.glob(str(d_mem / "run_*.h5")))
    assert [f.split("/")[-1] for f in files_a] == [
        f.split("/")[-1] for f in files_b
    ]
    assert len(files_a) >= 2  # rotation exercised
    for fa, fb in zip(files_a, files_b):
        import os

        # the core-VFD image carries ~100 KB of free-space slack the sec2
        # path reclaims; content must match exactly, size within bounds
        # (and far below the recycled spares' 1 MB of stale junk)
        assert os.path.getsize(fb) <= os.path.getsize(fa) * 1.1 + 262144
        with h5py.File(fa) as a, h5py.File(fb) as b:
            ga, gb = a["cloud"], b["cloud"]
            assert set(ga.keys()) == set(gb.keys()) and len(ga.keys())
            assert dict(ga.attrs) == dict(gb.attrs)
            for k in ga.keys():
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k
                )
                assert dict(ga[k].attrs) == dict(gb[k].attrs), k


def test_writer_striped_shards_identical(tmp_path):
    """n_shards=2 must produce the SAME set of run files, with the same
    names and value-identical content, as the single-child writer: each
    run file holds a contiguous written-event range and shard k owns
    every 2nd file (run_stride routing). Small max_events_per_file forces
    many rotations, including batch-straddling boundaries."""
    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        120.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 14, kine, batch_size=14, seed=77,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=7,
    )
    d1 = tmp_path / "one"
    d2 = tmp_path / "two"
    d1.mkdir()
    d2.mkdir()
    run_simulation(config, kine, SpyralWriterProc(d1, config, 3),
                   engine=engine, seed=6, show_progress=False)
    run_simulation(config, kine,
                   SpyralWriterProc(d2, config, 3, n_shards=2),
                   engine=engine, seed=6, show_progress=False)

    files_a = sorted(glob.glob(str(d1 / "run_*.h5")))
    files_b = sorted(glob.glob(str(d2 / "run_*.h5")))
    assert [f.split("/")[-1] for f in files_a] == [
        f.split("/")[-1] for f in files_b
    ]
    assert len(files_a) >= 3  # both shards rotated
    for fa, fb in zip(files_a, files_b):
        with h5py.File(fa) as a, h5py.File(fb) as b:
            ga, gb = a["cloud"], b["cloud"]
            assert set(ga.keys()) == set(gb.keys()), fa
            assert dict(ga.attrs) == dict(gb.attrs), fa
            for k in ga.keys():
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k
                )
                assert dict(ga[k].attrs) == dict(gb[k].attrs), k


def test_writer_striped_plus_recycle_identical(tmp_path):
    """Striping and the recycled in-memory path compose: two children
    share one .recycle pool (rename races fall back to fresh files) and
    the output stays value-identical to the plain single-child writer."""
    import attpc_engine_tpu.native as native_mod

    lib = native_mod.get_spyral_io_lib(with_h5=True)
    if lib is None or not lib.sio_h5_mem_available():
        import pytest

        pytest.skip("native in-memory HDF5 writer unavailable")

    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(1, 2),
                projectile=nuclear_map.get_data(6, 12),
                ejectile=nuclear_map.get_data(1, 1),
            )
        ],
        [ExcitationGaussian(0.0, 0.0)],
        [PolarUniform(0.0, np.pi)],
        120.0,
    )
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 12, kine, batch_size=12, seed=55,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=6,
    )
    d_plain = tmp_path / "plain"
    d_mix = tmp_path / "mix"
    d_plain.mkdir()
    (d_mix / ".recycle").mkdir(parents=True)
    (d_mix / ".recycle" / "spare.h5").write_bytes(b"\xcd" * (1 << 19))

    run_simulation(config, kine, SpyralWriterProc(d_plain, config, 4),
                   engine=engine, seed=9, show_progress=False)
    run_simulation(config, kine,
                   SpyralWriterProc(d_mix, config, 4, n_shards=2),
                   engine=engine, seed=9, show_progress=False)

    files_a = sorted(glob.glob(str(d_plain / "run_*.h5")))
    files_b = sorted(glob.glob(str(d_mix / "run_*.h5")))
    assert [f.split("/")[-1] for f in files_a] == [
        f.split("/")[-1] for f in files_b
    ]
    assert len(files_a) >= 3
    for fa, fb in zip(files_a, files_b):
        with h5py.File(fa) as a, h5py.File(fb) as b:
            ga, gb = a["cloud"], b["cloud"]
            assert set(ga.keys()) == set(gb.keys()), fa
            assert dict(ga.attrs) == dict(gb.attrs), fa
            for k in ga.keys():
                np.testing.assert_array_equal(
                    np.asarray(ga[k]), np.asarray(gb[k]), err_msg=k
                )


def test_recycle_helpers(tmp_path):
    """seed_spares creates a bounded pool idempotently; the pruner process
    keeps the newest `keep` run files, returns the rest to the pool, and
    deletes beyond max_spares so the pool cannot grow without bound."""
    import time

    from attpc_engine_tpu.io.recycle import seed_spares, spawn_pruner

    rdir = seed_spares(tmp_path, n=2, spare_bytes=4096)
    assert rdir == tmp_path / ".recycle"
    spares = sorted(p.name for p in rdir.glob("*.h5"))
    assert spares == ["spare_0.h5", "spare_1.h5"]
    assert all(p.stat().st_size >= 4096 for p in rdir.glob("*.h5"))
    seed_spares(tmp_path, n=2, spare_bytes=4096)  # idempotent
    assert sorted(p.name for p in rdir.glob("*.h5")) == spares

    for i in range(6):
        (tmp_path / f"run_{i:04d}.h5").write_bytes(b"x")
    proc = spawn_pruner(tmp_path, keep=2, max_spares=3)
    try:
        deadline = time.time() + 15.0
        runs: list = []
        while time.time() < deadline:
            runs = sorted(p.name for p in tmp_path.glob("run_*.h5"))
            if runs == ["run_0004.h5", "run_0005.h5"]:
                break
            time.sleep(0.2)
        assert runs == ["run_0004.h5", "run_0005.h5"]
        # 2 seeded + 4 pruned candidates, bounded at 3
        assert len(list(rdir.glob("*.h5"))) <= 3
        assert proc.poll() is None  # pruner stays alive until terminated
    finally:
        proc.terminate()
        proc.wait(timeout=10)
