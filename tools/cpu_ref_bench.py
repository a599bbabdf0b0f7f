"""CPU-reference stand-in benchmark for the BASELINE "speedup vs CPU ref".

The reference engine itself cannot run on this box (its spyral-utils /
pycatima dependencies are not installable without egress), so this tool
times the REFERENCE-FAITHFUL serial chain from tests/test_fullchain_parity
— scipy Radau with the reference's four terminal events + the per-pixel
int() mesh deposit + wiggle/response/ADC, the exact per-event algorithm of
/root/reference/src/attpc_engine/detector (solver.py:243-413,
transporter.py:124-318, simulator.py:52-113, writer.py:194-251) — on the
flagship 12C(d,p)@120 MeV configuration.

Honesty adjustments (printed with the result):
- The mirror's Radau+RHS phase matches the reference's cost structure
  (both run a pure-Python RHS per integrator step; the reference calls
  pycatima there, the mirror a numpy table interp).
- The mirror's deposit phase is pure Python dict/loop code where the
  reference is numba-JIT; the printed "reference estimate" divides ONLY
  that phase by NUMBA_SPEEDUP (default 30x, generous for dict-heavy
  numba code).

Env: CPUREF_EVENTS (default 16), CPUREF_NUMBA_SPEEDUP (default 30).
Prints one JSON line with both the raw mirror rate and the adjusted
reference-estimate rate.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _load_mirror():
    spec = importlib.util.spec_from_file_location(
        "fullchain_parity", REPO / "tests" / "test_fullchain_parity.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    n_events = int(os.environ.get("CPUREF_EVENTS", 16))
    numba_speedup = float(os.environ.get("CPUREF_NUMBA_SPEEDUP", 30.0))

    import jax

    jax.config.update("jax_platforms", "cpu")

    fc = _load_mirror()
    fc.N_STEPS = 10_000  # the reference's full 1 us physics window

    from attpc_engine_tpu import nuclear_map

    config = fc._make_config(diffusion=0.277)
    # sample the events with the engine's kinematics (negligible cost next
    # to the serial detector chain; the reference's own kinematics stage
    # runs >1k ev/s and would not move the denominator)
    pipe_fixture = fc.kinematics_sample.__wrapped__
    fc.N_EVENTS = n_events
    pipeline, vertices, momenta = pipe_fixture()

    # indices rule: default [2, 4, ..., N-1] exit-channel nuclei
    n_rows = momenta.shape[1]
    indices = list(range(2, n_rows, 2))
    if (n_rows - 1) not in indices:
        indices.append(n_rows - 1)
    zs = pipeline.get_proton_numbers()
    as_ = pipeline.get_mass_numbers()
    nuclei = [nuclear_map.get_data(int(zs[i]), int(as_[i])) for i in indices]

    # split the trajectory phase out of the event total
    traj_t = [0.0]
    orig_traj = fc._ref_trajectory

    def timed_traj(*a, **k):
        t0 = time.perf_counter()
        r = orig_traj(*a, **k)
        traj_t[0] += time.perf_counter() - t0
        return r

    fc._ref_trajectory = timed_traj

    rng = np.random.default_rng(42)
    rows_total = 0
    t0 = time.perf_counter()
    for i in range(n_events):
        _, rows = fc._ref_event_cloud(
            vertices[i], momenta[i][indices], nuclei, indices, config, rng
        )
        rows_total += len(rows)
        print(
            f"[cpu-ref] event {i}: {len(rows)} points "
            f"({time.perf_counter() - t0:.1f}s elapsed)",
            file=sys.stderr,
        )
    total_s = time.perf_counter() - t0
    deposit_s = total_s - traj_t[0]

    mirror_eps = n_events / total_s
    ref_est_s = traj_t[0] + deposit_s / numba_speedup
    ref_est_eps = n_events / ref_est_s
    print(
        f"[cpu-ref] {n_events} events in {total_s:.1f}s "
        f"(trajectory {traj_t[0]:.1f}s, deposit/merge {deposit_s:.1f}s), "
        f"{rows_total} output points",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cpu_reference_standin_events_per_sec",
                "mirror_events_per_sec": round(mirror_eps, 3),
                "reference_estimate_events_per_sec": round(ref_est_eps, 3),
                "numba_speedup_assumed": numba_speedup,
                "trajectory_s_per_event": round(traj_t[0] / n_events, 3),
                "deposit_s_per_event": round(deposit_s / n_events, 3),
                "events": n_events,
            }
        )
    )


if __name__ == "__main__":
    main()
