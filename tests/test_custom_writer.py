"""A custom writer implementing only the reference SimulationWriter
protocol must work with run_simulation (protocol parity)."""

from pathlib import Path

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
    run_simulation,
)

gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)


class RecordingWriter:
    """Reference-protocol writer: write(data, labels, config, event_number)."""

    def __init__(self, directory: Path):
        self.events = {}
        self.directory = directory

    def write(self, data, labels, config, event_number):
        assert data.shape[1] == 3
        assert len(labels) == len(data)
        self.events[event_number] = (data.copy(), labels.copy())

    def get_directory_name(self) -> Path:
        return self.directory

    def close(self):
        self.closed = True


def test_reference_protocol_writer(tmp_path):
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
    run_kinematics_pipeline(pipeline, 8, kine, batch_size=8, seed=21,
                            show_progress=False)
    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    writer = RecordingWriter(tmp_path)
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        cloud_cap=8192, out_budget=8192, events_per_batch=4,
    )
    run_simulation(config, kine, writer, engine=engine, seed=5,
                   show_progress=False)
    assert writer.closed
    assert len(writer.events) >= 4
    data, labels = next(iter(writer.events.values()))
    assert np.all((data[:, 0] >= 0) & (data[:, 0] < 10240))  # pads
    assert np.all((data[:, 1] >= 0) & (data[:, 1] < 512))  # tbs
    # electrons nonnegative; sub-epsilon-faint entries may merge to exactly
    # 0 (the reference's per-pixel int() truncation zeroes them the same way)
    assert np.all(data[:, 2] >= 0)
    assert data[:, 2].max() > 0
    assert set(labels.tolist()) <= {2, 3}


def test_spyral_writer_lzf_compression(tmp_path):
    """compression="lzf" writes transparently-readable files with the same
    data (HDF5 filters are invisible to h5py readers like Spyral)."""
    import h5py
    from attpc_engine_tpu.detector import SpyralWriter

    config = Config(
        DetectorParams(1.0, 45000.0, 2.85, 175000, gas, 0.277, 0.2, 34.0),
        ElectronicsParams(6.25, 900, 1000, 10, 560, 40),
        PadParams(),
    )
    rng = np.random.default_rng(3)
    spyral = rng.random((100, 8))
    labels = rng.integers(0, 4, 100)
    for comp in (None, "lzf"):
        d = tmp_path / f"c_{comp}"
        d.mkdir()
        w = SpyralWriter(d, config, compression=comp)
        w.write_spyral_pool(spyral, labels, np.array([100]), np.array([0]))
        w.close()
        with h5py.File(d / "run_0000.h5") as f:
            got = np.asarray(f["cloud/cloud_0"])
            assert np.array_equal(got, spyral)
            assert np.array_equal(np.asarray(f["cloud/labels_0"]), labels)


def test_validate_spyral_tool(tmp_path):
    """tools/validate_spyral.py passes real engine output and catches
    injected contract violations + unreadable files."""
    import importlib.util
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "validate_spyral", repo / "tools" / "validate_spyral.py"
    )
    vs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vs)

    # a real output dir from the engine
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "validate_spyral.py")],
        capture_output=True, text=True,
    )
    assert out.returncode == 2  # usage

    clouds = tmp_path / "clouds"
    clouds.mkdir()
    import h5py
    import numpy as np

    with h5py.File(clouds / "run_0000.h5", "w") as f:
        g = f.create_group("cloud")
        g.attrs["min_event"] = 0
        g.attrs["max_event"] = 1
        rows = np.zeros((3, 8))
        rows[:, 2] = [1.0, 2.0, 3.0]   # z ascending
        rows[:, 3] = [100.0, 200.0, 4095.0]
        rows[:, 4] = 1.0
        rows[:, 5] = [0, 5, 10239]
        rows[:, 6] = [0.5, 100.2, 511.9]
        rows[:, 7] = 1.0
        d = g.create_dataset("cloud_0", data=rows)
        for a in ("ic_amplitude", "ic_multiplicity", "ic_integral", "ic_centroid"):
            d.attrs[a] = -1.0
        d.attrs["orig_run"] = 0
        d.attrs["orig_event"] = 0
        g.create_dataset("labels_0", data=np.zeros(3, dtype=np.int64))

    errors: list = []
    ne, npts, gaps, rng = vs.validate_file(clouds / "run_0000.h5", 40.0, errors)
    assert (ne, npts, gaps, rng) == (1, 3, 1, (0, 1)) and errors == []

    # violations: bad pad id + broken z order + truncated second file
    with h5py.File(clouds / "run_0000.h5", "r+") as f:
        d = f["cloud/cloud_0"]
        rows = d[...]
        rows[0, 5] = 99999
        rows[:, 2] = rows[::-1, 2]
        d[...] = rows
    (clouds / "run_0001.h5").write_bytes(b"not hdf5")
    errors = []
    vs.validate_file(clouds / "run_0000.h5", 40.0, errors)
    vs.validate_file(clouds / "run_0001.h5", 40.0, errors)
    msgs = " | ".join(errors)
    assert "pad id out of range" in msgs
    assert "z not ascending" in msgs
    assert "unreadable HDF5" in msgs
