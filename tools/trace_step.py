"""Capture a jax.profiler trace of one full detector step + parse it.

Usage: python tools/trace_step.py [events] [outdir]
Writes the trace under outdir (default /tmp/jaxtrace) and prints the top
device ops by time. This is the ground-truth profiling tool on the axon
tunnel (block_until_ready timing is unreliable; see CLAUDE.md).
"""

import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"

    from __graft_entry__ import _tiny_setup

    steps = int(os.environ.get("PROF_STEPS", 500))
    pipeline, sim = _tiny_setup(events_per_batch=e, n_time_steps=steps)
    vertices, momenta = pipeline.run_batch(e, key=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    kw = dict(
        assemble=False,
        point_budget=int(os.environ.get("PROF_POINT_BUDGET", 576)),
        uniq_budget=int(os.environ.get("PROF_UNIQ_BUDGET", 12288)),
        out_budget=int(os.environ.get("PROF_OUT_BUDGET", 4096)),
        n_steps=steps,
    )
    out = sim.simulate_batch(key, vertices, momenta, **kw)
    np.asarray(out["packed"].ravel()[0])  # warm + sync
    with jax.profiler.trace(outdir):
        out = sim.simulate_batch(key, vertices, momenta, **kw)
        np.asarray(out["packed"].ravel()[0])

    traces = sorted(Path(outdir).rglob("*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    count = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and "dur" in ev:
            by_name[ev.get("name", "?")] += ev["dur"]
            count[ev["name"]] += 1
    print(f"trace: {traces[-1]}")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 1000:10.1f} ms  x{count[name]:<4} {name[:100]}")


if __name__ == "__main__":
    main()
