"""Generate exact-parity stopping tables with pycatima (run wherever
pycatima is installed — it is NOT required by this engine).

The reference engine computes stopping with the CATIMA C++ library via
pycatima (/root/reference/src/attpc_engine/detector/solver.py:65). This
engine ships a self-contained analytic model (attpc_engine_tpu/nuclear/
stopping.py, accuracy documented there); for bit-level physics parity with
a reference install, export CATIMA tables with this script and load them:

    python tools/make_catima_tables.py --gas '[[1,2,2]]' --pressure 300 \
        --species 1,1 1,2 2,4 6,12 6,13 --out catima_d2_300.npz

    gas = GasTarget([(1, 2, 2)], 300.0, nuclear_map)
    gas.load_dedx_npz("catima_d2_300.npz")   # before building simulators

npz layout: for each species "z_a": ke_mev [n] ascending, dedx [n]
(MeV cm^2/g total mass stopping power). Metadata in attrs-like arrays.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gas", required=True,
                    help="JSON [[Z,A,count],...] gas composition")
    ap.add_argument("--pressure", type=float, required=True, help="Torr")
    ap.add_argument("--species", nargs="+", required=True,
                    help="projectiles as Z,A pairs, e.g. 1,1 2,4")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--n-points", type=int, default=1024)
    ap.add_argument("--ke-min", type=float, default=1e-6)
    ap.add_argument("--ke-max", type=float, default=20000.0)
    args = ap.parse_args()

    try:
        import pycatima as catima
    except ImportError:
        print(
            "pycatima is not installed. Run this script on a machine with\n"
            "pycatima (pip install pycatima) and copy the npz over — the\n"
            "engine itself never needs pycatima.",
            file=sys.stderr,
        )
        return 1

    import numpy as np

    comp = json.loads(args.gas)
    material = catima.Material()
    for z, a, count in comp:
        material.add_element(float(a), int(z), float(count))
    # thickness is irrelevant for dedx; density from ideal gas like the
    # engine's GasTarget (spyral-utils semantics)
    molar = sum(a * count for _z, a, count in comp)
    density = args.pressure * molar / (62.36367 * 293.15) / 1000.0  # g/cm^3
    material.density(density)

    ke = np.geomspace(args.ke_min, args.ke_max, args.n_points)
    out = {"ke_mev": ke}
    for spec in args.species:
        z, a = (int(x) for x in spec.split(","))
        proj = catima.Projectile(float(a), float(z))
        dedx = np.array(
            [catima.dedx(proj(float(e) / a), material) for e in ke]
        )  # MeV/u in -> MeV cm^2/g out (catima dedx is mass stopping power)
        out[f"dedx_{z}_{a}"] = dedx
        print(f"species Z={z} A={a}: dedx range "
              f"[{dedx.min():.3g}, {dedx.max():.3g}] MeV cm^2/g")
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
