"""Upstream-name import compatibility: ``attpc_engine`` + ``spyral_utils``.

A reference user's scripts import from ``attpc_engine`` and from its
``spyral_utils`` dependency (reference docs/user_guide/getting_started.md:
31-45, 161-172). This repo ships a top-level ``attpc_engine`` alias package
and a guarded ``spyral_utils`` module shim (attpc_engine_tpu/compat.py) so
those scripts run unmodified. Shim installation mutates sys.modules, so
every test here runs in a subprocess.
"""

import glob
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import h5py
import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run(tmp_path, code: str, env_extra=None):
    """Run a python snippet in a clean subprocess pinned to CPU."""
    shim = tmp_path / "sitecustomize.py"
    shim.write_text("import jax\njax.config.update('jax_platforms', 'cpu')\n")
    env = dict(
        os.environ,
        PYTHONPATH=f"{tmp_path}{os.pathsep}{ROOT}",
        JAX_PLATFORMS="",
        **(env_extra or {}),
    )
    script = tmp_path / "snippet.py"
    script.write_text(textwrap.dedent(code))
    return subprocess.run(
        [sys.executable, str(script)], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=900,
    )


def test_upstream_import_surface(tmp_path):
    """Every import statement the reference source/docs use resolves."""
    proc = _run(
        tmp_path,
        """
        # exact import blocks of the reference getting-started scripts
        from attpc_engine.kinematics import (
            KinematicsPipeline,
            KinematicsTargetMaterial,
            ExcitationGaussian,
            PolarUniform,
            run_kinematics_pipeline,
            Reaction,
        )
        from attpc_engine import nuclear_map
        from spyral_utils.nuclear.target import load_target, GasTarget
        from attpc_engine.detector import (
            DetectorParams,
            ElectronicsParams,
            PadParams,
            Config,
            run_simulation,
            SpyralWriter,
        )
        # the remaining spyral_utils spellings found in the reference
        from spyral_utils.nuclear import NucleusData
        from spyral_utils.nuclear.nuclear_map import NuclearDataMap
        # upstream submodule paths this engine reproduces one-to-one
        from attpc_engine.kinematics.pipeline import PipelineError
        from attpc_engine.kinematics.excitation import ExcitationBreitWigner
        from attpc_engine.kinematics.angle import PolarArbitrary
        from attpc_engine.kinematics.reaction import Decay
        from attpc_engine.detector.beam_pads import BEAM_PADS, BEAM_PADS_ARRAY
        from attpc_engine.detector.pairing import pair, unpair
        from attpc_engine.detector.response import get_response, apply_response
        from attpc_engine.detector.constants import C, E_CHARGE
        from attpc_engine.detector.writer import SimulationWriter
        from attpc_engine.detector.parameters import Config as Config2

        import attpc_engine_tpu.nuclear.target as real_target

        assert Config2 is Config
        # the shim aliases the REAL module, so isinstance checks hold
        # across both import spellings
        assert GasTarget is real_target.GasTarget
        assert isinstance(nuclear_map, NuclearDataMap)
        assert isinstance(nuclear_map.get_data(1, 2), NucleusData)
        assert pair(3, 7) >= 0 and unpair(pair(3, 7)) == (3, 7)
        print("OK")
        """,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "OK" in proc.stdout


@pytest.mark.slow
def test_getting_started_scripts_run_unmodified(tmp_path):
    """The reference getting-started scripts run end to end, zero edits.

    Script bodies mirror reference docs/user_guide/getting_started.md:29-77
    and 159-216 (shrunk event count; same imports, classes, call shapes).
    """
    (tmp_path / "target.json").write_text(
        '{"compound": [[1, 2, 2]], "pressure(Torr)": 300.0}'
    )
    kin = _run(
        tmp_path,
        """
        from attpc_engine.kinematics import (
            KinematicsPipeline,
            KinematicsTargetMaterial,
            ExcitationGaussian,
            PolarUniform,
            run_kinematics_pipeline,
            Reaction,
        )
        from attpc_engine import nuclear_map
        from spyral_utils.nuclear.target import load_target, GasTarget
        from pathlib import Path
        import numpy as np

        output_path = Path("./output/kinematics/c16dd.h5")
        output_path.parent.mkdir(parents=True, exist_ok=True)
        target = load_target(Path("./target.json"), nuclear_map)
        if not isinstance(target, GasTarget):
            raise Exception("Could not load target data!")

        pipeline = KinematicsPipeline(
            [
                Reaction(
                    target=nuclear_map.get_data(1, 2),
                    projectile=nuclear_map.get_data(6, 16),
                    ejectile=nuclear_map.get_data(1, 2),
                )
            ],
            [ExcitationGaussian(0.0, 0.001)],
            [PolarUniform(0.0, np.pi)],
            beam_energy=184.131,
            target_material=KinematicsTargetMaterial(
                material=target, z_range=(0.0, 1.0), rho_sigma=0.007
            ),
        )
        run_kinematics_pipeline(pipeline, 48, output_path, seed=7,
                                schema="reference", show_progress=False)
        """,
    )
    assert kin.returncode == 0, (kin.stdout[-2000:], kin.stderr[-2000:])

    det = _run(
        tmp_path,
        """
        from attpc_engine.detector import (
            DetectorParams,
            ElectronicsParams,
            PadParams,
            Config,
            run_simulation,
            SpyralWriter,
        )
        from attpc_engine import nuclear_map
        from spyral_utils.nuclear.target import load_target, GasTarget
        from pathlib import Path

        gas = load_target(Path("./target.json"), nuclear_map)
        if not isinstance(gas, GasTarget):
            raise Exception("Could not load target data!")

        detector = DetectorParams(
            length=1.0, efield=45000.0, bfield=2.85, mpgd_gain=175000,
            gas_target=gas, diffusion=0.277, fano_factor=0.2, w_value=34.0,
        )
        electronics = ElectronicsParams(
            clock_freq=6.25, amp_gain=900, shaping_time=1000,
            micromegas_edge=10, windows_edge=560, adc_threshold=10,
        )
        config = Config(detector, electronics, PadParams())
        # the reference workflow pre-creates the project's output dirs
        Path("./output/detector").mkdir(parents=True, exist_ok=True)
        writer = SpyralWriter(Path("./output/detector/"), config, 5_000)
        run_simulation(
            config,
            Path("./output/kinematics/c16dd.h5"),
            writer,
            show_progress=False,
        )
        """,
    )
    assert det.returncode == 0, (det.stdout[-2000:], det.stderr[-2000:])

    runs = sorted(glob.glob(str(tmp_path / "output/detector/run_*.h5")))
    assert runs, "no Spyral output written through the compat shim"
    with h5py.File(runs[0]) as f:
        g = f["cloud"]
        clouds = [k for k in g if k.startswith("cloud_")]
        assert clouds
        a = np.asarray(g[clouds[0]])
        assert a.ndim == 2 and a.shape[1] == 8


def test_spyral_shim_never_shadows_real_package(tmp_path):
    proc = _run(
        tmp_path,
        """
        import sys, types

        real = types.ModuleType("spyral_utils")
        real.MARK = "the real one"
        sys.modules["spyral_utils"] = real

        import attpc_engine  # would install the shim if spyral_utils absent

        assert sys.modules["spyral_utils"] is real
        from attpc_engine_tpu.compat import install_spyral_utils_shim
        assert install_spyral_utils_shim() is False
        print("OK")
        """,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "OK" in proc.stdout


def test_spyral_shim_env_opt_out(tmp_path):
    proc = _run(
        tmp_path,
        """
        import sys

        import attpc_engine

        assert "spyral_utils" not in sys.modules
        try:
            import spyral_utils  # noqa: F401
        except ImportError:
            print("OK")
        else:
            raise AssertionError("shim installed despite opt-out")
        """,
        env_extra={"ATTPC_NO_SPYRAL_SHIM": "1"},
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "OK" in proc.stdout
