"""Pickups and solves as pure parameter transforms.

Reference: optiland/pickup.py:14-241 (copy an attribute source->target with
scale/offset on every optic.update()) and optiland/solves/ (535 LoC:
MarginalRayHeightSolve, ChiefRayHeightSolve, QuickFocusSolve).

TPU-first design (SURVEY.md §7 "Dynamic system edits"): instead of mutating an
object graph, each pickup/solve is a differentiable function
``params -> params`` applied before tracing. ``apply_constraints`` composes
them; optimizers call it inside the merit, so gradients flow *through* the
constraint resolution (the reference applies them eagerly outside autograd).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.safe_math import safe_div
from .model import OpticModel

__all__ = ["Pickup", "MarginalRayHeightSolve", "ChiefRayHeightSolve",
           "QuickFocusSolve", "apply_constraints"]

_ATTRS = {
    "radius": ("geom", "radius"),
    "conic": ("geom", "conic"),
    "thickness": ("thickness",),
}


def _get(params, surface_idx, path):
    leaf = params["surfaces"][surface_idx]
    for k in path:
        leaf = leaf[k]
    return leaf


def _set(params, surface_idx, path, value):
    surfaces = list(params["surfaces"])
    sp = dict(surfaces[surface_idx])
    if len(path) == 1:
        sp[path[0]] = jnp.asarray(value, jnp.asarray(sp[path[0]]).dtype)
    else:
        inner = dict(sp[path[0]])
        inner[path[1]] = jnp.asarray(value,
                                     jnp.asarray(inner[path[1]]).dtype)
        sp[path[0]] = inner
    surfaces[surface_idx] = sp
    out = dict(params)
    out["surfaces"] = surfaces
    return out


@dataclasses.dataclass(frozen=True)
class Pickup:
    """target.attr = scale * source.attr + offset (reference pickup.py:115-241)."""
    source_surface_idx: int
    attr_type: str
    target_surface_idx: int
    scale: float = 1.0
    offset: float = 0.0

    def __call__(self, model: OpticModel, params):
        path = _ATTRS[self.attr_type]
        v = _get(params, self.source_surface_idx, path)
        return _set(params, self.target_surface_idx, path,
                    self.scale * v + self.offset)


@dataclasses.dataclass(frozen=True)
class _RayHeightSolve:
    """Adjust the thickness before ``surface_idx`` so the chosen paraxial ray
    reaches ``height`` there (reference solves/ray_height_base.py:88:
    shift = (height - y[k]) / u[k] applied to the preceding thickness).

    Reference quirk reproduced deliberately: the divisor is ``u[k]``, the
    slope recorded AT the target surface (post-interaction), not the slope in
    the gap being adjusted (``u[k-1]``). When the preceding gap is glass and
    the target is the image plane (e.g. Microscope20x's N-K5 window), the
    image row records the slope refracted back into air, so the solve does
    NOT exactly zero the height — matching the reference's image_solve
    (optic_updater.py:263-270) and its sample prescriptions."""
    surface_idx: int
    height: float = 0.0
    _chief: bool = False

    def __call__(self, model: OpticModel, params):
        from ..trace.paraxial import Paraxial
        par = Paraxial(model, params)
        y, u = (par.chief_ray() if self._chief else par.marginal_ray())
        y_k = y[self.surface_idx][0]
        u_k = u[self.surface_idx][0]
        shift = safe_div(self.height - y_k, u_k)
        t = _get(params, self.surface_idx - 1, ("thickness",))
        return _set(params, self.surface_idx - 1, ("thickness",), t + shift)


def MarginalRayHeightSolve(surface_idx: int, height: float = 0.0):
    return _RayHeightSolve(surface_idx, height, _chief=False)


def ChiefRayHeightSolve(surface_idx: int, height: float = 0.0):
    return _RayHeightSolve(surface_idx, height, _chief=True)


@dataclasses.dataclass(frozen=True)
class QuickFocusSolve:
    """Move the image plane to the RMS-minimizing focus (reference
    solves/quick_focus.py:14-90): least-squares focus of the traced bundle."""
    Hx: float = 0.0
    Hy: float = 0.0
    wavelength: float | None = None
    num_rays: int = 5
    distribution: str = "hexapolar"

    def __call__(self, model: OpticModel, params):
        from ..core.distributions import generate_distribution
        from ..trace import real as real_trace
        wl = self.wavelength or float(
            params["wavelengths"][model.primary_wavelength_idx])
        Px, Py = generate_distribution(self.distribution, self.num_rays)
        rays = real_trace.trace(model, params, self.Hx, self.Hy, wl, Px, Py)
        # dz* = -<x ux + y uy> / <ux^2 + uy^2> with u = (L, M)/N
        ux = rays.L / rays.N
        uy = rays.M / rays.N
        num = jnp.mean(rays.x * ux + rays.y * uy)
        den = jnp.mean(ux**2 + uy**2)
        dz = -safe_div(num, den)
        t = _get(params, model.num_surfaces - 2, ("thickness",))
        return _set(params, model.num_surfaces - 2, ("thickness",), t + dz)


def apply_constraints(model: OpticModel, params, constraints):
    """Compose pickups/solves left-to-right (reference optic.update():
    pickups then solves, optic/optic_updater.py:243-257)."""
    for c in constraints:
        params = c(model, params)
    return params
