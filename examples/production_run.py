"""Example production-scale stage-2 run: all the throughput machinery on.

Differences from the minimal ``apply_detector.py``:

- ``SpyralWriterProc``: Spyral assembly + HDF5 writing in separate OS
  process(es), fully overlapping host I/O with device work. On multi-core
  hosts whose accelerator outruns one writer (~4.3k ev/s/child), raise
  ``n_shards`` — each child owns every N-th run file and output stays
  value-identical to a single writer.
- recycle pool: on VMs with expensive first-touch page faults, creating
  ``<outdir>/.recycle`` and MOVING verified run files there (instead of
  deleting them) lets the writer build each file in memory and overwrite
  a recycled predecessor in place — measured 5.2x on the writer path on
  the dev VM (see BASELINE.md "page-fault tax"). Harmless elsewhere.
- resume: ``start_event`` + the same seed reproduce the interrupted run's
  remaining events bit-identically (manifests next to the output record
  the exact invocation).

Multi-chip: when more than one device is visible, ``run_simulation``
auto-shards the event batch over all of them (see docs/user_guide's
performance + parallel pages); multi-host pods use
``attpc_engine_tpu.parallel.distributed_init`` first.
"""

from pathlib import Path

from attpc_engine_tpu import nuclear_map
from attpc_engine_tpu.nuclear import GasTarget
from attpc_engine_tpu.detector import (
    Config,
    DetectorParams,
    ElectronicsParams,
    EngineParams,
    PadParams,
    SpyralWriterProc,
    run_simulation,
)

kine_path = Path("./output/kinematics/c16dd_d2_300Torr_184MeV.h5")
cloud_dir = Path("./output/clouds")
cloud_dir.mkdir(parents=True, exist_ok=True)
# opt into recycled in-memory run files (prune verified files into here)
(cloud_dir / ".recycle").mkdir(exist_ok=True)

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
    writer = SpyralWriterProc(
        cloud_dir,
        config,
        max_events_per_file=5_000,
        n_shards=1,  # raise on multi-core hosts feeding multiple chips
    )
    # events_per_batch is the biggest throughput lever; budgets auto-tune
    engine = EngineParams(events_per_batch=384)
    run_simulation(
        config,
        kine_path,
        writer,
        engine=engine,
        seed=1234,
        start_event=0,  # set to resume an interrupted run (same seed!)
    )
