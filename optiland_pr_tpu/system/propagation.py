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
    """Gradient-index propagation marker.

    The reference leaves this unimplemented (propagation/grin.py:14-27 raises
    NotImplementedError); here GRIN is fully implemented — declare a
    :class:`~optiland_pr_tpu.materials.GrinMaterial` as a surface material and
    the trace marches rays through it with Sharma-Ghatak RK4 (trace/grin.py).
    """

    kind = "grin"
