"""End-to-end pipeline tests: kinematics generation -> HDF5 -> detector
simulation -> Spyral cloud files, exercising both file schemas."""

import h5py as h5
import numpy as np

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.nuclear import GasTarget
from attpc_engine_tpu.kinematics import (
    KinematicsPipeline,
    KinematicsTargetMaterial,
    ExcitationGaussian,
    PolarUniform,
    Reaction,
    run_kinematics_pipeline,
)
from attpc_engine_tpu.io.kinematics_file import KinematicsReader
from attpc_engine_tpu.detector import (
    Config,
    DetectorParams,
    ElectronicsParams,
    PadParams,
    EngineParams,
    SpyralWriter,
    run_simulation,
)

gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)


def _pipeline(with_target: bool = False):
    target_material = None
    if with_target:
        target_material = KinematicsTargetMaterial(
            material=gas, z_range=(0.0, 1.0), rho_sigma=0.007
        )
    return KinematicsPipeline(
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
        target_material=target_material,
    )


def _config():
    return Config(
        DetectorParams(
            length=1.0,
            efield=45000.0,
            bfield=2.85,
            mpgd_gain=175000,
            gas_target=gas,
            diffusion=0.277,
            fano_factor=0.2,
            w_value=34.0,
        ),
        ElectronicsParams(
            clock_freq=6.25,
            amp_gain=900,
            shaping_time=1000,
            micromegas_edge=10,
            windows_edge=560,
            adc_threshold=40,
        ),
        PadParams(),
    )


def test_kinematics_file_schemas(tmp_path):
    pipeline = _pipeline()
    for schema in ("columnar", "reference"):
        path = tmp_path / f"kine_{schema}.h5"
        run_kinematics_pipeline(
            pipeline, 32, path, batch_size=16, seed=1, schema=schema,
            show_progress=False,
        )
        reader = KinematicsReader(path)
        assert reader.n_events == 32
        assert list(reader.proton_numbers) == [1, 6, 1, 6]
        assert list(reader.mass_numbers) == [2, 12, 1, 13]
        vertices, momenta = reader.read_range(0, 32)
        assert momenta.shape == (32, 4, 4)
        assert np.all(momenta[:, 2, 3] > 0)
        reader.close()

    # reference schema structure is bit-compatible
    with h5.File(tmp_path / "kine_reference.h5") as f:
        data = f["data"]
        assert data.attrs["n_events"] == 32
        assert "chunk_0" in data
        ev = data["chunk_0"]["event_5"]
        assert ev.shape == (4, 4)
        assert "vertex_x" in ev.attrs


def test_kinematics_with_target_material(tmp_path):
    """Vertex sampling + beam energy loss in the gas."""
    pipeline = _pipeline(with_target=True)
    import jax

    vertices, momenta = pipeline.run_batch(128, key=jax.random.PRNGKey(3))
    # vertices spread in z, rho ~ |N(0, 7mm)|
    assert vertices[:, 2].min() > 0.0 and vertices[:, 2].max() < 1.0
    rho = np.hypot(vertices[:, 0], vertices[:, 1])
    assert rho.max() < 0.05
    # beam lost energy: projectile KE at vertex below accelerator energy
    ke_beam = momenta[:, 1, 3] - nuclear_map.get_data(6, 12).mass
    assert np.all(ke_beam < 120.0)
    assert np.all(ke_beam > 100.0)  # but not absurdly much at 300 Torr


def test_full_chain(tmp_path):
    pipeline = _pipeline()
    kine_path = tmp_path / "kine.h5"
    run_kinematics_pipeline(
        pipeline, 8, kine_path, batch_size=8, seed=7, show_progress=False
    )

    config = _config()
    outdir = tmp_path / "clouds"
    outdir.mkdir()
    writer = SpyralWriter(outdir, config)
    engine = EngineParams(
        n_time_steps=2000,
        chunk_steps=250,
        point_budget=2048,
        cloud_cap=8192,
        out_budget=8192,
        events_per_batch=4,
    )
    run_simulation(config, kine_path, writer, engine=engine, seed=11,
                   show_progress=False)

    files = sorted(outdir.glob("run_*.h5"))
    assert len(files) == 1
    with h5.File(files[0]) as f:
        cloud_group = f["cloud"]
        names = [n for n in cloud_group if n.startswith("cloud_")]
        assert len(names) >= 1  # some events produce clouds
        ev = names[0]
        data = cloud_group[ev][:]
        labels = cloud_group[ev.replace("cloud", "labels")][:]
        assert data.shape[1] == 8
        assert len(labels) == len(data)
        # z sorted ascending
        assert np.all(np.diff(data[:, 2]) >= 0)
        # amplitudes above threshold and <= 4095
        assert np.all(data[:, 3] > 40)
        assert np.all(data[:, 3] <= 4095)
        # pad ids valid, tb in window
        assert np.all((data[:, 5] >= 0) & (data[:, 5] < 10240))
        assert np.all((data[:, 6] >= 0) & (data[:, 6] < 512))
        # attrs
        assert cloud_group[ev].attrs["ic_amplitude"] == -1.0
        assert "min_event" in cloud_group.attrs

    # run manifests: one per driver invocation, reproducibility record
    import json

    kine_manifest = kine_path.with_suffix(".h5.run.json")
    assert kine_manifest.exists()
    rec = json.loads(kine_manifest.read_text())
    assert rec["stage"] == "kinematics"
    assert rec["seed"] == 7
    assert rec["event_range"] == [0, 8]
    det_manifests = sorted(outdir.glob("run_manifest_*.json"))
    assert len(det_manifests) == 1
    rec = json.loads(det_manifests[0].read_text())
    assert rec["stage"] == "detector"
    assert rec["seed"] == 11
    assert rec["budgets"]["point"] > 0
    assert rec["wall_seconds"] > 0


def test_full_chain_multistep(tmp_path):
    """Three-step chain (reaction + 2 decays): 8 nuclei, default indices
    [2, 4, 6, 7], four tracks per event through the detector."""
    from attpc_engine_tpu.kinematics import Decay

    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(5, 10),
                projectile=nuclear_map.get_data(2, 3),
                ejectile=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(5, 9),
                residual_1=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(3, 5),
                residual_1=nuclear_map.get_data(2, 4),
            ),
        ],
        [
            ExcitationGaussian(16.8, 0.2),
            ExcitationGaussian(0.0, 1.25),
            ExcitationGaussian(0.0, 0.0),
        ],
        [PolarUniform(0.0, np.pi)] * 3,
        24.0,
        target_material=KinematicsTargetMaterial(
            material=gas, z_range=(0.2, 0.8), rho_sigma=0.005
        ),
    )
    kine = tmp_path / "chain.h5"
    run_kinematics_pipeline(pipeline, 8, kine, batch_size=8, seed=31,
                            show_progress=False)

    config = _config()
    outdir = tmp_path / "clouds"
    outdir.mkdir()
    writer = SpyralWriter(outdir, config)
    engine = EngineParams(
        n_time_steps=2000, chunk_steps=250, point_budget=4096,
        cloud_cap=24576, out_budget=24576, events_per_batch=4,
    )
    run_simulation(config, kine, writer, engine=engine, seed=13,
                   show_progress=False)

    with h5.File(sorted(outdir.glob("run_*.h5"))[0]) as f:
        g = f["cloud"]
        names = [n for n in g if n.startswith("cloud_")]
        assert len(names) >= 4
        all_labels = set()
        for n in names:
            all_labels |= set(g[n.replace("cloud", "labels")][:].tolist())
        # labels are the simulated nucleus indices: alphas at 2, 4, 6 and
        # the final proton at 7 (10B(3He,a)9B* -> a + 5Li -> a + p)
        assert all_labels <= {2, 4, 6, 7}
        assert len(all_labels) >= 3  # several species actually hit pads


def test_overflow_retry_self_heals(tmp_path):
    """Deliberately tiny initial budgets must self-heal (double + retry,
    deterministic keys) and produce the same events as generous budgets."""
    import glob

    pipeline = _pipeline()
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 8, kine, batch_size=8, seed=77,
                            show_progress=False)
    config = _config()

    outs = {}
    for name, engine in (
        (
            "tiny",
            EngineParams(
                n_time_steps=1000, chunk_steps=250, point_budget=64,
                uniq_budget=1024, out_budget=1024, events_per_batch=4,
            ),
        ),
        (
            "big",
            EngineParams(
                n_time_steps=1000, chunk_steps=250, point_budget=2048,
                uniq_budget=12288, out_budget=8192, events_per_batch=4,
            ),
        ),
    ):
        d = tmp_path / name
        d.mkdir()
        run_simulation(
            config, kine, SpyralWriter(d, config), engine=engine, seed=3,
            show_progress=False, auto_tune=False,
        )
        outs[name] = sorted(glob.glob(str(d / "run_*.h5")))

    import h5py

    # the TB wiggle stream depends on the pool SHAPE, so tb/z jitter
    # differs between budget settings; everything else must match exactly
    def keyed(f):
        events = {}
        g = f["cloud"]
        for k in g.keys():
            if not k.startswith("cloud_"):
                continue
            d = np.asarray(g[k])
            lab = np.asarray(g[k.replace("cloud", "labels")])
            rows = {}
            for i in range(len(d)):
                rows[(int(d[i, 5]), int(d[i, 6]))] = (
                    d[i, 0], d[i, 1], d[i, 3], d[i, 4], d[i, 7], lab[i]
                )
            events[k] = rows
        return events

    with h5py.File(outs["tiny"][0]) as a, h5py.File(outs["big"][0]) as b:
        ea, eb = keyed(a), keyed(b)
        assert set(ea.keys()) == set(eb.keys())
        for k in ea:
            assert ea[k].keys() == eb[k].keys(), k
            for key in ea[k]:
                assert ea[k][key] == eb[k][key], (k, key)


def test_decay_chain_detector_end_to_end(tmp_path):
    """A 3-step chain — 10B(3He,4He)9B* -> 4He + 5Li -> 4He + p — runs
    through the detector with 4 simulated charged products per event
    (exercises the multi-track rank packing in the merge keys and the
    default exit-channel index rule)."""
    from attpc_engine_tpu.kinematics import Decay, ExcitationGaussian

    pipeline = KinematicsPipeline(
        [
            Reaction(
                target=nuclear_map.get_data(5, 10),
                projectile=nuclear_map.get_data(2, 3),
                ejectile=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(5, 9),
                residual_1=nuclear_map.get_data(2, 4),
            ),
            Decay(
                parent=nuclear_map.get_data(3, 5),
                residual_1=nuclear_map.get_data(2, 4),
            ),
        ],
        [
            ExcitationGaussian(16.8, 0.2),
            ExcitationGaussian(0.0, 1.25),
            ExcitationGaussian(0.0, 0.0),
        ],
        [PolarUniform(0.0, np.pi)] * 3,
        24.0,
    )
    kine = tmp_path / "chain.h5"
    run_kinematics_pipeline(pipeline, 8, kine, batch_size=8, seed=12,
                            show_progress=False)
    config = _config()
    engine = EngineParams(
        n_time_steps=1500, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=4,
    )
    d = tmp_path / "clouds"
    d.mkdir()
    run_simulation(config, kine, SpyralWriter(d, config), engine=engine,
                   seed=4, show_progress=False)
    import h5py

    with h5py.File(d / "run_0000.h5") as f:
        g = f["cloud"]
        names = [k for k in g.keys() if k.startswith("cloud_")]
        assert len(names) >= 6  # nearly every event lights up pads
        # default indices rule: [2, 4, 6, 7] = ejectile, decay products
        # with the final residual (reference simulator.py:153-158)
        seen_labels = set()
        for name in names:
            n = name.split("_")[1]
            lab = np.asarray(g[f"labels_{n}"])
            seen_labels |= set(lab.tolist())
            d_arr = np.asarray(g[name])
            assert (np.diff(d_arr[:, 2]) >= 0).all()
        assert seen_labels <= {2, 4, 6, 7}
        assert len(seen_labels) >= 3  # several species actually hit pads


def test_steps_probe_ladder_matches_full_window(tmp_path):
    """The auto-tuned probe-first step window (first batch runs ONE chunk,
    x4 retry ladder when tracks outlive it) must produce the same physics
    as a pinned full-window run. chunk_steps=50 forces at least one
    saturation retry (12C tracks at 120 MeV live for hundreds of steps)."""
    import glob

    pipeline = _pipeline()
    kine = tmp_path / "k.h5"
    run_kinematics_pipeline(pipeline, 4, kine, batch_size=4, seed=55,
                            show_progress=False)
    config = _config()

    outs = {}
    for name, auto in (("probe", True), ("pinned", False)):
        engine = EngineParams(
            n_time_steps=800, chunk_steps=50, point_budget=2048,
            uniq_budget=16384, out_budget=8192, events_per_batch=4,
        )
        d = tmp_path / name
        d.mkdir()
        run_simulation(
            config, kine, SpyralWriter(d, config), engine=engine, seed=9,
            show_progress=False, auto_tune=auto,
        )
        outs[name] = sorted(glob.glob(str(d / "run_*.h5")))

    # wiggle stream depends on pool shapes (documented); compare the
    # shape-independent columns keyed by (pad, int tb)
    def keyed(f):
        events = {}
        g = f["cloud"]
        for k in g.keys():
            if not k.startswith("cloud_"):
                continue
            d = np.asarray(g[k])
            lab = np.asarray(g[k.replace("cloud", "labels")])
            events[k] = {
                (int(d[i, 5]), int(d[i, 6])): (
                    d[i, 0], d[i, 1], d[i, 3], d[i, 4], d[i, 7], lab[i]
                )
                for i in range(len(d))
            }
        return events

    with h5.File(outs["probe"][0]) as a, h5.File(outs["pinned"][0]) as b:
        ea, eb = keyed(a), keyed(b)
        assert set(ea.keys()) == set(eb.keys())
        assert any(len(v) for v in ea.values())
        for k in ea:
            assert ea[k].keys() == eb[k].keys(), k
            for key in ea[k]:
                assert ea[k][key] == eb[k][key], (k, key)


def test_resume_reproduces_one_shot(tmp_path):
    """The documented resume contract: rerunning with the same seed and
    start_event reproduces the interrupted run's remaining events with
    identical dataset values, for ANY events_per_batch — every random
    stream is keyed by the event's global id (device draws via
    deposition.event_keys, the TB wiggle via a host Philox stream), so
    the resume point need not sit on the original run's batch grid and
    the resumed run may even use a different batch size."""
    import glob

    import h5py

    from attpc_engine_tpu.detector import SpyralWriterProc

    kine = tmp_path / "k.h5"
    config = _config()
    engine = EngineParams(
        n_time_steps=1000, chunk_steps=250, point_budget=2048,
        out_budget=8192, events_per_batch=5,
    )
    run_kinematics_pipeline(_pipeline(), 12, kine, batch_size=12, seed=21,
                            show_progress=False)

    def collect(dirs):
        out = {}
        for d in dirs:
            for fn in glob.glob(str(d / "run_*.h5")):
                with h5py.File(fn) as f:
                    g = f["cloud"]
                    for k in g.keys():
                        if k.startswith("cloud_"):
                            out[int(k.split("_")[1])] = np.asarray(g[k])
        return out

    d_full = tmp_path / "full"
    run_simulation(config, kine, SpyralWriterProc(d_full, config, 100),
                   engine=engine, seed=3, show_progress=False)

    d_a = tmp_path / "part_a"
    d_b = tmp_path / "part_b"
    run_simulation(config, kine, SpyralWriterProc(d_a, config, 100),
                   engine=engine, seed=3, show_progress=False,
                   stop_event=5)
    # resume OFF the original grid: start 5 is not a multiple of the new
    # events_per_batch=4, and 4 differs from the original 5 — bit-exact
    # equality must hold anyway (grid-independent per-event streams)
    import dataclasses

    engine_b = dataclasses.replace(engine, events_per_batch=4)
    run_simulation(config, kine,
                   SpyralWriterProc(d_b, config, 100, first_run_number=1),
                   engine=engine_b, seed=3, show_progress=False,
                   start_event=5)

    full = collect([d_full])
    split = collect([d_a, d_b])
    assert set(full) == set(split) and len(full) >= 10
    for ev in full:
        np.testing.assert_array_equal(full[ev], split[ev], err_msg=str(ev))
