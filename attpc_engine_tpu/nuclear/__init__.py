"""Nuclear data and materials layer (L0): masses, gas targets, stopping power."""

from .masses import NuclearDataMap, NucleusData
from .target import GasTarget, SolidTarget, load_target

__all__ = [
    "NuclearDataMap",
    "NucleusData",
    "GasTarget",
    "SolidTarget",
    "load_target",
]
