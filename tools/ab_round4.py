"""Round-4 device-step A/B: pallas_sort and lookup_two_stage at bench shapes.

Times the fused detector step (_sim_jit) at the official bench
configuration (batch 384, tuned budgets point=576 / uniq=12288 /
steps=500 / out=4096) for the four combinations of the two new kernels:

  base            — r3 defaults (pallas transport+lookup on, lax sorts)
  +sort           — in-VMEM Pallas bitonic merge/convert sorts
  +2s             — two-stage MXU lookup select
  +sort+2s        — both
  +fused(+2s)     — whole-merge fused kernel (charges exact only to ulps)

Prints one JSON line per combo (median ms over AB_REPS, ev/s) and a
verdict line. Serialize with other TPU scripts (CLAUDE.md). Env:
AB_EVENTS (384), AB_REPS (5), AB_POINT (576), AB_UNIQ (12288),
AB_STEPS (500), AB_OUT (4096).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _tiny_setup  # noqa: E402


def main():
    e = int(os.environ.get("AB_EVENTS", 384))
    reps = int(os.environ.get("AB_REPS", 5))
    point = int(os.environ.get("AB_POINT", 576))
    uniq = int(os.environ.get("AB_UNIQ", 12288))
    steps = int(os.environ.get("AB_STEPS", 500))
    out_b = int(os.environ.get("AB_OUT", 4096))

    pipeline, sim0 = _tiny_setup(events_per_batch=e, n_time_steps=steps)
    vertices, momenta = pipeline.run_batch(e, key=jax.random.PRNGKey(0))
    p3 = momenta[:, sim0.sim_indices, :3]
    gvs = (p3 / sim0.track_masses[None, :, None]).astype(np.float32)
    vg = np.concatenate(
        [np.asarray(vertices, dtype=np.float32), gvs.reshape(e, -1)], axis=1
    )
    key = np.asarray(jax.random.PRNGKey(1))

    combos = [
        ("base", dict()),
        ("+sort", dict(pallas_sort=True)),
        ("+2s", dict(lookup_two_stage=True)),
        ("+sort+2s", dict(pallas_sort=True, lookup_two_stage=True)),
        ("+fused", dict(pallas_sort="fused")),
        ("+fused+2s", dict(pallas_sort="fused", lookup_two_stage=True)),
    ]
    results = {}
    for name, flags in combos:
        # isolate combos: a Mosaic compile failure in one kernel (the known
        # risk for the 136-stage in-VMEM sort) must not abort the matrix —
        # the remaining combos are independent measurements the chain runs
        # unattended and cannot retry
        try:
            _, sim = _tiny_setup(events_per_batch=e, n_time_steps=steps)
            for k, v in flags.items():
                setattr(sim.engine, k, v)
            vg_d = jnp.asarray(vg)
            t0 = time.perf_counter()
            out = sim._sim_jit(
                key, vg_d, e, point_budget=point, uniq_budget=uniq,
                out_budget=out_b, n_steps=steps,
            )
            # scalar host pull: block_until_ready is unreliable over the
            # tunnel
            float(np.asarray(out["meta_i32"][0]))
            print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s",
                  flush=True)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = sim._sim_jit(
                    key, vg_d, e, point_budget=point, uniq_budget=uniq,
                    out_budget=out_b, n_steps=steps,
                )
                float(np.asarray(out["meta_i32"][0]))
                ts.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — record and move on
            print(json.dumps({
                "combo": name, "failed": f"{type(exc).__name__}: {exc}"[:500],
            }), flush=True)
            continue
        med = float(np.median(ts)) * 1000
        results[name] = med
        print(json.dumps({
            "combo": name, "median_ms": round(med, 1),
            "ev_per_s": round(e / (med / 1000), 1), "reps": reps,
        }), flush=True)

    if "base" not in results:
        print(json.dumps({"verdict": "base", "speedup_vs_base": 0.0,
                          "all": {}, "note": "base itself failed"}),
              flush=True)
        return
    base = results["base"]
    best = min(results, key=results.get)
    print(json.dumps({
        "verdict": best, "speedup_vs_base": round(base / results[best], 3),
        "all": {k: round(v, 1) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
