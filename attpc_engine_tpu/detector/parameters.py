"""Detector configuration: parameter dataclasses + ``Config``.

Mirrors the reference's ``detector/parameters.py``
(/root/reference/src/attpc_engine/detector/parameters.py:10-261) API:
``DetectorParams``, ``ElectronicsParams``, ``PadParams`` and a ``Config``
that derives the drift velocity and loads pad-plane geometry.

TPU-first details:

- geometry ships as one packaged bundle (``data/pad_assets.npz``) holding
  the lookup grid, pad centers, pad sizes and the beam-pad LUT,
- ``Config.device_arrays()`` materializes everything the jitted detector
  programs need as device arrays with pinned dtypes (grid int16, physics
  f32) exactly once,
- the beam-pad veto is a 10240-entry boolean LUT instead of the reference's
  123-element linear scan per mesh pixel (transporter.py:164,237).

Known divergence from the reference (documented): the reference's
``load_pad_sizes`` reads ``geometry_path`` instead of ``pad_size_path`` for
custom paths (parameters.py:255) — a bug we do not reproduce.
"""

from __future__ import annotations

from dataclasses import dataclass
from importlib import resources
from pathlib import Path

import numpy as np

from ..nuclear.target import GasTarget

__all__ = ["DetectorParams", "ElectronicsParams", "PadParams", "Config", "DEFAULT"]

DEFAULT = "Default"


@dataclass
class DetectorParams:
    """Detector parameters.

    Attributes
    ----------
    length: float
        Active-volume length in meters.
    efield: float
        Electric field magnitude in V/m (+z, parallel to the beam).
    bfield: float
        Magnetic field magnitude in Tesla (+z).
    mpgd_gain: int
        Overall micropattern gas detector gain (unitless).
    gas_target: GasTarget
        Target gas.
    diffusion: float
        Transverse electron diffusion coefficient (Volts).
    fano_factor: float
        Fano factor of the gas (unitless).
    w_value: float
        W-value of the gas in eV (energy per electron-ion pair).
    """

    length: float
    efield: float
    bfield: float
    mpgd_gain: int
    gas_target: GasTarget
    diffusion: float
    fano_factor: float
    w_value: float


@dataclass
class ElectronicsParams:
    """GET electronics parameters.

    Attributes
    ----------
    clock_freq: float
        GET clock frequency in MHz.
    amp_gain: int
        Amplifier gain in lsb/fC.
    shaping_time: int
        Shaping time in ns.
    micromegas_edge: int
        Micromegas edge in time buckets.
    windows_edge: int
        Window edge in time buckets.
    adc_threshold: int
        Minimum signal amplitude for a point to be kept.
    """

    clock_freq: float
    amp_gain: int
    shaping_time: int
    micromegas_edge: int
    windows_edge: int
    adc_threshold: int


@dataclass
class PadParams:
    """Pad-plane geometry sources.

    ``Default`` uses the packaged asset bundle. Custom paths accept the
    reference's file formats (grid npz with ``grid``/``edges``; centers and
    sizes CSVs with a header line).
    """

    grid_path: Path | str = DEFAULT
    geometry_path: Path | str = DEFAULT
    pad_size_path: Path | str = DEFAULT


class Config:
    """All simulation input parameters + derived state.

    Attributes
    ----------
    det_params, elec_params, pad_params
        The input dataclasses.
    drift_velocity: float
        Electron drift velocity in m/time-bucket, derived as
        length / (windows_edge - micromegas_edge) (reference
        parameters.py:164-174).
    pad_grid: np.ndarray [5600, 5600] int16
    pad_grid_edges: np.ndarray [3]
    pad_centers: np.ndarray [10240, 2]
    pad_sizes: np.ndarray [10240]
    beam_pads: np.ndarray [n]
    beam_mask: np.ndarray [10240] bool
    """

    def __init__(
        self,
        detector_params: DetectorParams,
        electronics_params: ElectronicsParams,
        pad_params: PadParams,
    ):
        self.det_params = detector_params
        self.elec_params = electronics_params
        self.pad_params = pad_params
        self.calculate_drift_velocity()
        self._load_pad_data()
        self._device_cache = None

    def calculate_drift_velocity(self) -> None:
        """Drift velocity in m/TB (reference parameters.py:164-174)."""
        self.drift_velocity = self.det_params.length / float(
            self.elec_params.windows_edge - self.elec_params.micromegas_edge
        )

    def _load_pad_data(self) -> None:
        pp = self.pad_params
        bundle = None
        if DEFAULT in (pp.grid_path, pp.geometry_path, pp.pad_size_path):
            handle = resources.files("attpc_engine_tpu.detector.data").joinpath(
                "pad_assets.npz"
            )
            with resources.as_file(handle) as path:
                bundle = {k: v for k, v in np.load(path).items()}

        if pp.grid_path == DEFAULT:
            self.pad_grid = bundle["grid"]
            self.pad_grid_edges = bundle["edges"]
        else:
            data = np.load(pp.grid_path)
            self.pad_grid = np.asarray(data["grid"], dtype=np.int16)
            self.pad_grid_edges = np.asarray(data["edges"], dtype=np.float64)

        if pp.geometry_path == DEFAULT:
            self.pad_centers = bundle["centers"]
        else:
            self.pad_centers = np.loadtxt(
                pp.geometry_path, delimiter=",", skiprows=1
            )[:, :2].astype(np.float64)

        if pp.pad_size_path == DEFAULT:
            self.pad_sizes = bundle["sizes"]
        else:
            self.pad_sizes = np.loadtxt(
                pp.pad_size_path, delimiter=",", skiprows=1
            ).astype(np.float64)

        n_pads = len(self.pad_centers)
        if bundle is not None and "beam_mask" in bundle:
            self.beam_pads = bundle["beam_pads"]
            self.beam_mask = bundle["beam_mask"]
        else:
            from .beam_pads import BEAM_PADS_ARRAY

            self.beam_pads = BEAM_PADS_ARRAY
            self.beam_mask = np.zeros(n_pads, dtype=bool)
            self.beam_mask[self.beam_pads] = True
        self.n_pads = n_pads

    def device_arrays(self):
        """Materialize (once) the device-resident geometry/physics arrays
        used by the jitted detector programs.

        The transport lookup uses ``key_grid_mm``: because positions are
        floored to whole mm before binning (reference transporter.py:101-120),
        only one grid cell per mm is ever addressed — so the 5600^2 int16
        grid (62 MB, which XLA gathers by streaming the table through VMEM
        in ~26 passes over every index) collapses to a 1-mm-resolution,
        VMEM-resident int32 table with the pad id pre-multiplied by NUM_TB
        and the beam-pad veto + off-plane holes pre-folded to a sentinel.
        One single-pass gather replaces gather + beam LUT + masking.
        """
        if self._device_cache is None:
            from ..constants import NUM_TB
            from .response import get_response

            lo, hi, step = self.pad_grid_edges
            n_mm = int(round(hi - lo))
            mm = np.arange(n_mm)
            src = np.round(mm / step).astype(np.int64)
            src = np.clip(src, 0, self.pad_grid.shape[0] - 1)
            grid_mm = self.pad_grid[np.ix_(src, src)].astype(np.int64)
            vetoed = (grid_mm < 0) | self.beam_mask[np.clip(grid_mm, 0, None)]
            key_grid = np.where(vetoed, np.int32(2**31 - 1), grid_mm * NUM_TB)

            # plane tables for the Pallas lookup kernel (pad id split into
            # two bf16-exact <= 8-bit planes; see deposit_pallas.py).
            # Grids too large for the kernel's fixed table simply skip it —
            # the elementwise-gather path handles any n_mm, so this must
            # not be fatal at config time.
            from .deposit_pallas import build_plane_tables

            try:
                plane_hi, plane_lo = build_plane_tables(
                    grid_mm, self.beam_mask
                )
            except ValueError:
                plane_hi = plane_lo = None

            # Host numpy, NOT jnp: these are embedded as closure constants
            # of the jitted detector programs, and a jnp (device) constant
            # forces a device->host pull at LOWERING time — minutes over a
            # tunneled TPU. Numpy constants embed into MLIR directly; XLA
            # still stages them into device memory exactly once at compile.
            self._device_cache = {
                "key_grid_mm": key_grid.astype(np.int32),
                "plane_hi": plane_hi,
                "plane_lo": plane_lo,
                "grid_lo_mm": float(lo),
                "grid_n_mm": n_mm,
                "edges": np.asarray(self.pad_grid_edges, dtype=np.float32),
                "centers": np.asarray(self.pad_centers, dtype=np.float32),
                "sizes": np.asarray(self.pad_sizes, dtype=np.float32),
                "response": np.asarray(get_response(self), dtype=np.float32),
            }
        return self._device_cache
