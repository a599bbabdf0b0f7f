"""Utilities: profiling, logging, run metadata."""

from .profiling import phase_timer, trace_to, PhaseTimes

__all__ = ["phase_timer", "trace_to", "PhaseTimes"]
