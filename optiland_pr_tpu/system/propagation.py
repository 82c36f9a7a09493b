"""Propagation models (reference optiland/propagation/, 195 LoC).

Homogeneous straight-line propagation with absorption is implemented inline in
the trace (core/rays.py propagate, trace/real.py). GRIN media are a declared
extension point in the reference (propagation/grin.py:14-27 raises
NotImplementedError); mirrored here with the same contract so systems that
declare GRIN media fail loudly rather than silently mistracing.
"""
from __future__ import annotations

__all__ = ["HomogeneousPropagation", "GRINPropagation"]


class HomogeneousPropagation:
    """Marker for the default straight-line propagation model."""
    kind = "homogeneous"


class GRINPropagation:
    """Gradient-index propagation (reference propagation/grin.py:14-27:
    placeholder raising NotImplementedError)."""

    kind = "grin"

    def __init__(self, *a, **k):
        raise NotImplementedError(
            "GRIN propagation is not implemented (parity with the reference, "
            "optiland/propagation/grin.py). Planned: RK4 ray marching with "
            "lax.scan over fixed step counts.")
