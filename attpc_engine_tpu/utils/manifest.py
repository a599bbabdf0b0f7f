"""Persistent run records.

The reference engine leaves no record of a run beyond the HDF5 attrs it
writes (seed, event range are unrecoverable from the output alone). A
production engine needs a durable, machine-readable record of every run:
what was simulated, with which seed and budgets, on which backend, and how
long each phase took — enough to reproduce the run bit-for-bit (paired with
the code version) or to diff two runs' performance.

``write_run_manifest`` writes one JSON file per driver invocation next to
the run's output (``<stem>.run.json`` for file outputs,
``run_manifest_<n>.json`` inside directory outputs).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

__all__ = ["write_run_manifest"]


def _jsonable(value: Any) -> Any:
    """Best-effort conversion to a JSON-serializable value."""
    import numpy as np

    if isinstance(value, (str, int, float, bool)) or value is None:
        return value
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, np.ndarray):
        return value.tolist() if value.size <= 64 else f"<array {value.shape}>"
    if isinstance(value, Path):
        return str(value)
    if isinstance(value, dict):
        return {str(k): _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    return repr(value)


def write_run_manifest(
    target: Path | str,
    *,
    stage: str,
    seed: int,
    event_range: tuple[int, int],
    config: dict | None = None,
    budgets: dict | None = None,
    phase_seconds: dict | None = None,
    wall_seconds: float | None = None,
    extra: dict | None = None,
) -> Path | None:
    """Write a run-record JSON next to ``target``.

    ``target`` is the run's output file or directory. Returns the manifest
    path, or None if the record could not be written (records must never
    fail a run — any OSError is swallowed).
    """
    import jax

    from .. import __version__

    target = Path(target)
    try:
        devices = jax.devices()
        record = {
            "engine": "attpc_engine_tpu",
            "version": __version__,
            "stage": stage,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "seed": int(seed),
            "event_range": [int(event_range[0]), int(event_range[1])],
            "backend": {
                "platform": devices[0].platform if devices else "none",
                "n_devices": len(devices),
                "jax_version": jax.__version__,
            },
            "config": _jsonable(config or {}),
            "budgets": _jsonable(budgets or {}),
            "phase_seconds": _jsonable(phase_seconds or {}),
            "wall_seconds": wall_seconds,
        }
        if extra:
            record.update(_jsonable(extra))
        if target.is_dir():
            # exclusive create: several processes (multi-host driver) may
            # finish into the same directory at once — check-then-write
            # would let one overwrite another's record
            n = 0
            while True:
                path = target / f"run_manifest_{n}.json"
                try:
                    with open(path, "x") as f:
                        json.dump(record, f, indent=2)
                    return path
                except FileExistsError:
                    n += 1
        else:
            path = target.with_suffix(target.suffix + ".run.json")
            with open(path, "w") as f:
                json.dump(record, f, indent=2)
            return path
    except OSError:
        return None
