"""Silicon measurement of the fori-loop bitonic variants (lane_mode="loop").

Round-5 parked the whole-merge fused kernel on a backend compile death at
the bench merge width (W=57600, ~272 unrolled stages) and noted "a
fori_loop-over-stages restructure is the known path". That restructure
now exists (`sort_pallas._bitonic_loop`, dynamic-amount `pltpu.roll`
stage segments — CPU-bit-exact in the interpret suite, the dynamic-roll
op pattern probed on silicon by tools/probe_roll_loop.py). This tool
answers the three open questions on the real TPU, each attempt in its
own timeout-wrapped subprocess (a wedged Mosaic compile cannot be
interrupted in-process), strictly serialized:

  1. sort 57600 loop — compile time + runtime vs the unrolled transpose
     default (175.8 s / 53.2 ms standalone, BASELINE.md r5 matrix)
  2. sort 12288 loop — same vs 63.7 s / 35.3 ms (the convert shape)
  3. fused 57600 loop — does the restructure lift the width death, and
     what does the whole-merge kernel cost at bench shape?
  4. fused 12288 loop — compile-time comparison vs the unrolled 302 s

Usage: python tools/measure_loop_sort.py                 # orchestrate
       python tools/measure_loop_sort.py --fused-child W MODE
(sort children reuse tools/bisect_sort_compile.py --child.)
Env: LOOP_E (default 384), LOOP_REPS (default 3), LOOP_TIMEOUT (1500 s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

STATUS = "/tmp/runbook_status"
KEY_SENTINEL = 2**31 - 1


def _mark(line: str) -> None:
    stamp = time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime())
    with open(STATUS, "a") as f:
        f.write(f"{line} {stamp}\n")


def _fused_numpy_ref(packed, qv, cap, rank_bits):
    """Integer-output reference (keys + n_uniq) of the fused merge."""
    import numpy as np

    e, w = packed.shape
    keys_out = np.full((e, cap), KEY_SENTINEL, np.int32)
    n_out = np.zeros(e, np.int32)
    qbits = qv.view(np.int32)
    for r in range(e):
        order = np.lexsort((qbits[r], packed[r]))
        h = packed[r][order]
        space = h.astype(np.int64) >> rank_bits
        # run-last positions of the space key (the very last element is
        # always a run end); sentinel rows excluded
        last = np.ones(w, bool)
        last[:-1] = space[:-1] != space[1:]
        real = last & (h != KEY_SENTINEL)
        vals = np.sort(h[real])
        n = min(len(vals), cap)
        keys_out[r, :n] = vals[:n]
        n_out[r] = real.sum()
    return keys_out, n_out


def fused_child(w: int, mode: str) -> None:
    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    import numpy as np

    import attpc_engine_tpu  # noqa: F401  (x64 + compile-cache config)
    from attpc_engine_tpu.detector.sort_pallas import merge_runs_fused_pallas

    e = int(os.environ.get("LOOP_E", 384))
    reps = int(os.environ.get("LOOP_REPS", 3))
    cap, rank_bits = 12288, 2
    rng = np.random.default_rng(7)
    space = np.sort(rng.integers(0, 30_000, (e, w)), axis=1).astype(np.int32)
    rank = rng.integers(0, 4, (e, w)).astype(np.int32)
    packed = (space << rank_bits) | rank
    qv = np.abs(rng.normal(100.0, 30.0, (e, w))).astype(np.float32)
    dead = rng.random((e, w)) < 0.2
    packed[dead] = KEY_SENTINEL
    qv[dead] = 0.0

    import jax.numpy as jnp

    pk_d, qv_d = jnp.asarray(packed), jnp.asarray(qv)
    out = {"kernel": "fused", "w": w, "mode": mode, "e": e}
    t0 = time.perf_counter()
    try:
        k2, c2, n2 = merge_runs_fused_pallas(pk_d, qv_d, cap, rank_bits,
                                             lane_mode=mode)
        float(np.asarray(k2.ravel()[0]))
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            k2, c2, n2 = merge_runs_fused_pallas(pk_d, qv_d, cap, rank_bits,
                                                 lane_mode=mode)
            float(np.asarray(k2.ravel()[0]))
            ts.append(time.perf_counter() - t1)
        out["median_ms"] = round(float(np.median(ts)) * 1000, 1)
        want_k, want_n = _fused_numpy_ref(packed[:8], qv[:8], min(cap, w),
                                          rank_bits)
        got_k = np.asarray(k2[:8])
        got_n = np.asarray(n2[:8])
        out["int_exact"] = bool(
            np.array_equal(want_k, got_k) and np.array_equal(want_n, got_n)
        )
    except Exception as exc:  # noqa: BLE001 — record the verdict
        out["failed"] = f"{type(exc).__name__}: {exc}"[:400]
        out["compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--fused-child":
        fused_child(int(sys.argv[2]), sys.argv[3])
        return
    per_timeout = int(os.environ.get("LOOP_TIMEOUT", 1500))
    attempts = [
        ("sort", 57600, "loop"),
        ("sort", 12288, "loop"),
        ("fused", 57600, "loop"),
        ("fused", 12288, "loop"),
    ]
    _mark("r5loopmeas start")
    rc = 0
    try:
        for i, (kind, w, mode) in enumerate(attempts):
            if i:
                time.sleep(30)
            print(f"=== attempt {kind} w={w} mode={mode} ===", flush=True)
            if kind == "sort":
                cmd = [sys.executable,
                       str(REPO / "tools/bisect_sort_compile.py"),
                       "--child", str(w), mode]
            else:
                cmd = [sys.executable, __file__, "--fused-child", str(w),
                       mode]
            p = subprocess.run(
                ["timeout", "--kill-after=30", str(per_timeout), *cmd],
                capture_output=False,
            )
            if p.returncode:
                print(f"attempt rc={p.returncode}", flush=True)
                rc = rc or p.returncode
    finally:
        _mark(f"r5loopmeas rc={rc}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
