"""Build the packaged pad-plane asset bundle.

The AT-TPC pad plane is physical hardware: 10,240 pads whose positions,
sizes, lookup grid and beam-region membership are *measured detector
geometry*, not code. This script repacks that geometry data from an
attpc_engine source checkout (default /root/reference) into this package's
single-bundle format:

    attpc_engine_tpu/detector/data/pad_assets.npz
        grid      [5600, 5600] int16  pad id per 0.1 mm spatial bin, -1 = none
        edges     [3] float64         [low_edge_mm, high_edge_mm, bin_mm]
        centers   [10240, 2] float64  pad center (x, y) in mm
        sizes     [10240] float64     pad size class
        beam_pads [n] int64           pad ids in the beam region
        beam_mask [10240] bool        LUT form of beam_pads

Run once when regenerating assets:
    python tools/build_pad_assets.py [source_dir] [out_path]
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

import numpy as np


def parse_beam_pads(beam_pads_py: Path) -> np.ndarray:
    """Extract the BEAM_PADS integer list literal from a source file."""
    text = beam_pads_py.read_text()
    match = re.search(r"BEAM_PADS[^=]*=\s*(\[[^\]]*\])", text, re.DOTALL)
    if not match:
        raise ValueError(f"No BEAM_PADS list found in {beam_pads_py}")
    pads = ast.literal_eval(match.group(1))
    return np.asarray(sorted(pads), dtype=np.int64)


def main() -> None:
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference")
    out = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else Path(__file__).resolve().parents[1]
        / "attpc_engine_tpu/detector/data/pad_assets.npz"
    )
    data_dir = src / "src/attpc_engine/detector/data"

    grid_npz = np.load(data_dir / "pad_grid.npz")
    grid = np.asarray(grid_npz["grid"], dtype=np.int16)
    edges = np.asarray(grid_npz["edges"], dtype=np.float64)

    centers = np.loadtxt(data_dir / "padxy.csv", delimiter=",", skiprows=1)[:, :2]
    sizes = np.loadtxt(data_dir / "pad_scale.csv", delimiter=",", skiprows=1)

    beam_pads = parse_beam_pads(src / "src/attpc_engine/detector/beam_pads.py")
    beam_mask = np.zeros(len(centers), dtype=bool)
    beam_mask[beam_pads] = True

    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out,
        grid=grid,
        edges=edges,
        centers=np.asarray(centers, dtype=np.float64),
        sizes=np.asarray(sizes, dtype=np.float64),
        beam_pads=beam_pads,
        beam_mask=beam_mask,
    )
    print(f"wrote {out} ({out.stat().st_size / 1e6:.2f} MB)")
    print(f"  grid {grid.shape} edges {edges} pads {len(centers)} beam {len(beam_pads)}")


if __name__ == "__main__":
    main()
