"""Low-level array ops and kernels."""

from .pairing import pair, unpair, pair_arrays, unpair_arrays

__all__ = ["pair", "unpair", "pair_arrays", "unpair_arrays"]
