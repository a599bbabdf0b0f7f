"""Example stage-2 script: apply AT-TPC detector effects to a kinematics
file, producing Spyral-compatible point-cloud files."""

import os
from pathlib import Path

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.nuclear import GasTarget
from attpc_engine_tpu.detector import (
    Config,
    DetectorParams,
    ElectronicsParams,
    PadParams,
    SpyralWriter,
    run_simulation,
)

kine_path = Path("./output/kinematics/c16dd_d2_300Torr_184MeV.h5")
cloud_dir = Path("./output/clouds")
cloud_dir.mkdir(parents=True, exist_ok=True)

target = GasTarget([(1, 2, 2)], 300.0, nuclear_map)

config = Config(
    DetectorParams(
        length=1.0,
        efield=45000.0,
        bfield=2.85,
        mpgd_gain=175000,
        gas_target=target,
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

if __name__ == "__main__":
    # SpyralWriterProc (same signature) writes byte-identical files from a
    # separate OS process, overlapping all host I/O with device work
    writer = SpyralWriter(cloud_dir, config)
    # EXAMPLE_EVENTS caps the batch size for smoke tests (tiny CI runs)
    engine = None
    cap = os.environ.get("EXAMPLE_EVENTS")
    if cap is not None:
        from attpc_engine_tpu.detector import EngineParams

        engine = EngineParams(
            events_per_batch=min(64, int(cap)), n_time_steps=1000,
        )
    run_simulation(config, kine_path, writer, seed=1234, engine=engine)
