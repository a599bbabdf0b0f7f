"""Nuclear data and materials layer (L0): masses, gas targets, stopping power."""

from .masses import NuclearDataMap, NucleusData

__all__ = ["NuclearDataMap", "NucleusData"]
