"""Validate Spyral cloud HDF5 output against the downstream contract.

Checks every ``run_*.h5`` under a directory (or a single file) for the
schema the reference's SpyralWriter produces and downstream Spyral-style
analysis expects (/root/reference/src/attpc_engine/detector/writer.py:
194-263):

- ``/cloud`` group attrs ``min_event``/``max_event`` bound the cloud_N
  keys present. Gaps inside the range are LEGAL (the reference skips
  raw-empty events entirely — simulator.py:204-205 — while zero-point
  events still get empty datasets); the tool reports the gap count per
  file informationally,
- ``cloud_N``: float64 [n, 8] sorted ascending in z (col 2), amplitudes
  in (adc_threshold, 4095] when a threshold is given (col 3), integrals
  positive (col 4), pad ids in [0, 10240) (col 5), tb floats in [0, 512)
  (col 6), positive pad sizes (col 7),
- ``labels_N``: int64 [n] matching cloud_N's length,
- per-event attrs ``orig_run``/``orig_event`` and the four ``ic_*`` = -1.0,
- file ranges do not overlap across run files.

Usage: python tools/validate_spyral.py <clouds_dir_or_file> [adc_threshold]
Exit code 0 = clean; prints a summary line per file and a final verdict.
"""

from __future__ import annotations

import sys
from pathlib import Path

import h5py
import numpy as np

IC_ATTRS = ("ic_amplitude", "ic_multiplicity", "ic_integral", "ic_centroid")


def validate_file(
    path: Path, adc: float | None, errors: list[str]
) -> tuple[int, int, int, tuple[int, int] | None]:
    """Returns (n_events, n_points, n_gaps, (min_event, max_event) or None
    when the file is malformed); appends problems to ``errors``."""
    n_points = 0
    try:
        f = h5py.File(path, "r")
    except OSError as exc:
        errors.append(f"{path.name}: unreadable HDF5 ({exc})")
        return 0, 0, 0, None
    with f:
        if "cloud" not in f:
            errors.append(f"{path.name}: no /cloud group")
            return 0, 0, 0, None
        g = f["cloud"]
        if "min_event" not in g.attrs or "max_event" not in g.attrs:
            errors.append(f"{path.name}: missing min/max_event attrs")
            return 0, 0, 0, None
        lo, hi = int(g.attrs["min_event"]), int(g.attrs["max_event"])
        events = sorted(
            int(k.split("_")[1]) for k in g.keys() if k.startswith("cloud_")
        )
        if events and (events[0] < lo or events[-1] > hi):
            errors.append(
                f"{path.name}: events outside [{lo}, {hi}]: "
                f"{events[0]}..{events[-1]}"
            )
        for n in events:
            c = g[f"cloud_{n}"][...]
            name = f"{path.name}:cloud_{n}"
            if c.dtype != np.float64 or c.ndim != 2 or c.shape[1] != 8:
                errors.append(f"{name}: bad shape/dtype {c.shape} {c.dtype}")
                continue
            if f"labels_{n}" not in g:
                errors.append(f"{name}: missing labels_{n}")
            elif len(g[f"labels_{n}"]) != len(c):
                errors.append(f"{name}: labels length mismatch")
            for a in IC_ATTRS:
                if g[f"cloud_{n}"].attrs.get(a) != -1.0:
                    errors.append(f"{name}: attr {a} != -1.0")
            if len(c) == 0:
                continue
            n_points += len(c)
            if not np.all(np.diff(c[:, 2]) >= 0):
                errors.append(f"{name}: z not ascending")
            if adc is not None and not np.all((c[:, 3] > adc) & (c[:, 3] <= 4095)):
                errors.append(f"{name}: amplitude outside ({adc}, 4095]")
            if not np.all((c[:, 5] >= 0) & (c[:, 5] < 10240)):
                errors.append(f"{name}: pad id out of range")
            if not np.all((c[:, 6] >= 0) & (c[:, 6] < 512)):
                errors.append(f"{name}: tb out of range")
            if not np.all(c[:, 7] > 0):
                errors.append(f"{name}: non-positive pad size")
            if not np.all(c[:, 4] > 0):
                errors.append(f"{name}: non-positive integral")
        n_gaps = (hi - lo + 1 - len(events)) if events else 0
    return len(events), n_points, n_gaps, (lo, hi)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    target = Path(sys.argv[1])
    adc = float(sys.argv[2]) if len(sys.argv) > 2 else None
    files = [target] if target.is_file() else sorted(target.glob("run_*.h5"))
    if not files:
        print(f"no run_*.h5 under {target}")
        raise SystemExit(2)
    errors: list[str] = []
    ranges = []
    total_ev = total_pts = 0
    for path in files:
        ne, np_, gaps, rng = validate_file(path, adc, errors)
        if rng is not None:
            ranges.append((rng[0], rng[1], path.name))
        total_ev += ne
        total_pts += np_
        gap_note = f" ({gaps} raw-empty gaps)" if gaps else ""
        print(f"{path.name}: {ne} events, {np_} points{gap_note}")
    ranges.sort()
    for (l1, h1, n1), (l2, h2, n2) in zip(ranges, ranges[1:]):
        if l2 <= h1:
            errors.append(f"overlapping event ranges: {n1} [{l1},{h1}] vs {n2} [{l2},{h2}]")
    if errors:
        print(f"\nFAIL: {len(errors)} problem(s)")
        for e in errors[:50]:
            print(f"  - {e}")
        raise SystemExit(1)
    print(f"\nOK: {len(files)} file(s), {total_ev} events, {total_pts} points")


if __name__ == "__main__":
    main()
