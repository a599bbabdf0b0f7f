"""Bisect WHERE the in-VMEM Pallas sort stops compiling on real TPU.

Round-4 on-TPU A/B: `sort_pairs_pallas` at bench shape ([384, 57600] ->
total 65536, 136 unrolled stages) dies in the Mosaic remote compile
helper (HTTP 500, subprocess exit 1) — a compile-TIME resource blowup
invisible to host-side `jax.export` lowering (tests/test_tpu_lowering.py).
This tool answers the r5 question (VERDICT task 3): does a SMALLER
network compile, and if so where is the cliff? Attempts, in order of
prize value:

  1. w=12288 roll      — the convert sort's exact shape (total 16384,
                         105 stages). Landing here alone flips
                         `simulator._convert_to_spyral`'s sort.
  2. w=12288 transpose — same shape, transposed lane-stage variant.
  3. w=57600 transpose — bench merge shape; r4 only ever tried roll.
  4. w=4096 roll       — 78 stages; the host-lowering test's scale.
  5. w=57600 roll      — known-failing r4 shape, re-run last to record
                         the verdict in the same log.

Each attempt is its own subprocess under `timeout` (a hung Mosaic compile
cannot be interrupted in-process), strictly serialized with a 30 s gap
(overlapping TPU processes hang device init — CLAUDE.md). The whole run
holds a `/tmp/runbook_status` tag so bench.py / __graft_entry__.py wait.

Usage: python tools/bisect_sort_compile.py            # orchestrate all
       python tools/bisect_sort_compile.py --child W MODE   # one attempt
Env:   BISECT_E (default 384), BISECT_REPS (default 3),
       BISECT_TIMEOUT (default 1500 s per attempt).
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
ATTEMPTS = [
    (12288, "roll"),
    (12288, "transpose"),
    (57600, "transpose"),
    (4096, "roll"),
    (57600, "roll"),
]


def _stamp() -> str:
    return time.strftime("%a %b %d %H:%M:%S UTC %Y", time.gmtime())


def _mark(line: str) -> None:
    with open(STATUS, "a") as f:
        f.write(f"{line} {_stamp()}\n")


def child(w: int, mode: str) -> None:
    os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
    import numpy as np

    import attpc_engine_tpu  # noqa: F401  (x64 + compile-cache config)
    from attpc_engine_tpu.detector.sort_pallas import sort_pairs_pallas

    e = int(os.environ.get("BISECT_E", 384))
    reps = int(os.environ.get("BISECT_REPS", 3))
    rng = np.random.default_rng(0)
    hi = (rng.integers(0, 40_000, (e, w)).astype(np.int32) << 2) | (
        rng.integers(0, 4, (e, w)).astype(np.int32)
    )
    lo = np.abs(rng.normal(100.0, 30.0, (e, w)).astype(np.float32)).view(
        np.int32
    )
    import jax.numpy as jnp

    hi_d, lo_d = jnp.asarray(hi), jnp.asarray(lo)
    out = {"w": w, "mode": mode, "e": e}
    t0 = time.perf_counter()
    try:
        oh, ol = sort_pairs_pallas(hi_d, lo_d, lane_mode=mode)
        # sync via scalar pull (block_until_ready unreliable over tunnel)
        float(np.asarray(oh.ravel()[0]))
        out["compile_s"] = round(time.perf_counter() - t0, 1)
        ts = []
        for _ in range(reps):
            t1 = time.perf_counter()
            oh, ol = sort_pairs_pallas(hi_d, lo_d, lane_mode=mode)
            float(np.asarray(oh.ravel()[0]))
            ts.append(time.perf_counter() - t1)
        out["median_ms"] = round(float(np.median(ts)) * 1000, 1)
        # correctness spot check on a few rows against numpy
        packed = (hi[:4].astype(np.int64) << 32) | (
            lo[:4].astype(np.uint32).astype(np.int64)
        )
        want = np.sort(packed, axis=1)
        got = (np.asarray(oh[:4]).astype(np.int64) << 32) | (
            np.asarray(ol[:4]).astype(np.uint32).astype(np.int64)
        )
        out["bit_exact"] = bool(np.array_equal(want, got))
    except Exception as exc:  # noqa: BLE001 — record the verdict
        out["failed"] = f"{type(exc).__name__}: {exc}"[:500]
        out["compile_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    per_timeout = int(os.environ.get("BISECT_TIMEOUT", 1500))
    _mark("r5sortbisect start")
    rc = 0
    try:
        for i, (w, mode) in enumerate(ATTEMPTS):
            if i:
                time.sleep(30)  # let the previous process fully wind down
            print(f"=== attempt w={w} mode={mode} ===", flush=True)
            # `timeout` the POSIX way so a wedged Mosaic compile dies
            # with the whole process group
            p = subprocess.run(
                [
                    "timeout",
                    "--kill-after=30",
                    str(per_timeout),
                    sys.executable,
                    __file__,
                    "--child",
                    str(w),
                    mode,
                ],
                check=False,
            )
            if p.returncode == 124:
                print(
                    json.dumps(
                        {"w": w, "mode": mode,
                         "failed": f"timeout after {per_timeout}s"}
                    ),
                    flush=True,
                )
    except Exception:
        rc = 1
        raise
    finally:
        _mark(f"r5sortbisect rc={rc}")


if __name__ == "__main__":
    main()
