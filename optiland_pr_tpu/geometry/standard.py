"""Plane and sphere/conic geometries (closed-form intersection).

Reference: optiland/geometries/plane.py:19, optiland/geometries/standard.py:37-167.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from ..core.safe_math import safe_div
from .base import Geometry, conic_distance, normalize_normal

__all__ = ["Plane", "StandardGeometry"]


def _conic_sag(radius, conic, x, y):
    """z = r^2 / (R (1 + sqrt(1 - (1+k) r^2 / R^2))), guarded for R=inf."""
    is_plane = jnp.isinf(radius)
    R = jnp.where(is_plane, 1.0, radius)
    r2 = x**2 + y**2
    arg = 1.0 - (1.0 + conic) * r2 / R**2
    ok = arg >= 0
    # finite-clamped: out-of-domain points return the rim-clamped value
    # instead of NaN so that downstream arithmetic keeps finite partials
    # (validity is tracked by the intersection mask; NaN injection for
    # reference parity happens once at the end of the trace).
    root = jnp.sqrt(jnp.where(ok, arg, 0.0) + jnp.where(ok, 0.0, 1e-12))
    z = r2 / (R * (1.0 + root))
    return jnp.where(is_plane, jnp.zeros_like(z), z)


def _conic_sag_grad(radius, conic, x, y):
    """(dz/dx, dz/dy) = (x, y) / (R sqrt(1 - (1+k) r^2/R^2)), guarded."""
    is_plane = jnp.isinf(radius)
    R = jnp.where(is_plane, 1.0, radius)
    r2 = x**2 + y**2
    arg = 1.0 - (1.0 + conic) * r2 / R**2
    ok = arg >= 0
    root = jnp.sqrt(jnp.where(ok, arg, 1.0))
    denom = R * root
    # finite-clamped (see _conic_sag): slope at the rim for out-of-domain
    dfdx = safe_div(x, denom)
    dfdy = safe_div(y, denom)
    zero = jnp.zeros_like(dfdx)
    return (jnp.where(is_plane, zero, dfdx), jnp.where(is_plane, zero, dfdy))


class Plane(Geometry):
    """Infinite plane at z=0 (reference geometries/plane.py:19)."""

    kind = "plane"
    is_symmetric = True

    def default_params(self, **kw) -> dict:
        dt = default_float()
        # radius/conic kept for a uniform paraxial interface (power 0).
        return {"radius": jnp.asarray(jnp.inf, dt), "conic": jnp.asarray(0.0, dt)}

    def sag(self, p, x, y):
        return jnp.zeros_like(jnp.asarray(x) + jnp.asarray(y))

    def sag_grad(self, p, x, y):
        zero = jnp.zeros_like(jnp.asarray(x) + jnp.asarray(y))
        return zero, zero

    def normal(self, p, x, y):
        # +z, matching the reference Plane (geometries/plane.py:79-92) whose
        # sign differs from the conic df/dz=-1 convention; interactions that
        # care align the normal against the ray anyway.
        zero = jnp.zeros_like(jnp.asarray(x) + jnp.asarray(y))
        return zero, zero, jnp.ones_like(zero)

    def distance(self, p, x, y, z, L, M, N):
        return safe_div(-z, N)


class StandardGeometry(Geometry):
    """Sphere/conic: z = r^2/(R(1+sqrt(1-(1+k)r^2/R^2)))
    (reference geometries/standard.py:37-167). Closed-form intersection."""

    kind = "standard"
    is_symmetric = True

    def default_params(self, radius=jnp.inf, conic=0.0, **kw) -> dict:
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt)}

    def sag(self, p, x, y):
        return _conic_sag(p["radius"], p["conic"], x, y)

    def sag_grad(self, p, x, y):
        return _conic_sag_grad(p["radius"], p["conic"], x, y)

    def normal(self, p, x, y):
        dfdx, dfdy = self.sag_grad(p, x, y)
        return normalize_normal(dfdx, dfdy)

    def distance(self, p, x, y, z, L, M, N):
        return conic_distance(p["radius"], p["conic"], x, y, z, L, M, N)
