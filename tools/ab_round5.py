"""Round-5 device-step A/B: the in-VMEM sort kernels, post-Mosaic-fix.

Round 5 root-caused the round-4 "HTTP 500" compile failures to two
bool-lowering hazards (bool==bool and select-of-bools -> i8->i1
arith.trunci, tools/probe_mosaic_sort.py) and fixed them in _stage; all
sort kernels now compile on silicon (tools/bisect_sort_compile.py:
12288 roll/transpose 41.5/35.3 ms, 57600 transpose 53.2 ms, bit-exact).
This matrix times the fused detector step at bench shapes for the r5
defaults question. NOTE `base` already includes the two-stage lookup
(default "auto" since b8c394a) — combos vary only pallas_sort:

  base    — lax sorts (r4 flipped defaults)
  +sort   — in-VMEM pair sorts, lane-roll stages
  +sortT  — in-VMEM pair sorts, transposed lane stages
  +fused  — whole-merge kernel (sorts + prefix + run-ends in one kernel)
  +fusedT — whole-merge, transposed lane stages

Prints one JSON line per combo and a verdict. Serialize with other TPU
scripts (CLAUDE.md). Env: AB_EVENTS (384), AB_REPS (5), AB_POINT (576),
AB_UNIQ (12288), AB_STEPS (500), AB_OUT (4096).
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

    # `base` pins pallas_sort=False explicitly: the default flipped to
    # "transpose" after this tool's original run (commit b2d82ef), so an
    # empty dict would silently measure transpose-vs-transpose
    combos = [
        ("base", dict(pallas_sort=False)),
        ("+sort", dict(pallas_sort=True)),
        ("+sortT", dict(pallas_sort="transpose")),
        ("+fused", dict(pallas_sort="fused")),
        ("+fusedT", dict(pallas_sort="fused_transpose")),
    ]
    results = {}
    for name, flags in combos:
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
