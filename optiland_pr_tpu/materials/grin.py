"""Gradient-index (GRIN) media.

The reference declares GRIN as an extension point but never implements it
(optiland/propagation/grin.py:14-27 raises NotImplementedError). This module
is the TPU-native implementation: a polynomial index profile

    n(x, y, z; lambda) = n_base(lambda) + nr2 r^2 + nr4 r^4 + nr6 r^6
                         + nz1 z + nz2 z^2 + nz3 z^3,    r^2 = x^2 + y^2

(the classic radial/axial polynomial GRIN a la Zemax GRIN surfaces; a Selfoc/
parabolic rod is nr2 = -n0 A / 2). The profile's z is measured from the vertex
of the surface the material is attached to (the GRIN element's front vertex).

All coefficients live in the differentiable parameter pytree, so GRIN profiles
are optimizable like any other variable. Ray marching through the medium is in
trace/grin.py (Sharma-Ghatak RK4 under a fixed-iteration lax loop).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from .base import IdealMaterial, MaterialModel

__all__ = ["GrinMaterial"]


class GrinMaterial(MaterialModel):
    """Polynomial GRIN medium wrapping a base dispersion model.

    ``base``: any MaterialModel providing the on-axis index n_base(lambda)
    (IdealMaterial(n0) if a bare float is given). ``n_steps`` is the static
    RK4 step count used when marching rays through this medium.
    """

    kind = "grin"
    is_grin = True

    def __init__(self, base: MaterialModel | float = 1.5, *,
                 n_steps: int = 64, overshoot: float = 1.5):
        if not isinstance(base, MaterialModel):
            base = IdealMaterial(float(base))
        self.base = base
        self.n_steps = int(n_steps)
        self.overshoot = float(overshoot)

    def default_params(self, nr2=0.0, nr4=0.0, nr6=0.0,
                       nz1=0.0, nz2=0.0, nz3=0.0, **base_kw) -> dict:
        dt = default_float()
        return {
            "base": self.base.default_params(**base_kw),
            "nr2": jnp.asarray(nr2, dt), "nr4": jnp.asarray(nr4, dt),
            "nr6": jnp.asarray(nr6, dt),
            "nz1": jnp.asarray(nz1, dt), "nz2": jnp.asarray(nz2, dt),
            "nz3": jnp.asarray(nz3, dt),
        }

    # -- MaterialModel contract (axial values; used by paraxial & aiming) ----
    def n(self, p, wavelength_um):
        """On-axis (r=0, z=0) index: the base dispersion."""
        return self.base.n(p["base"], wavelength_um)

    def k(self, p, wavelength_um):
        return self.base.k(p["base"], wavelength_um)

    @property
    def absorbing(self):
        return self.base.absorbing

    # -- field evaluation -----------------------------------------------------
    def n_field(self, p, wavelength_um, x, y, z):
        """Index at points (x, y, z) in the profile frame."""
        n0 = self.base.n(p["base"], wavelength_um)
        r2 = x * x + y * y
        return (n0 + (p["nr2"] + (p["nr4"] + p["nr6"] * r2) * r2) * r2
                + (p["nz1"] + (p["nz2"] + p["nz3"] * z) * z) * z)

    def half_grad_n2(self, p, wavelength_um, x, y, z):
        """D = grad(n^2)/2 = n * grad(n) — the RK4 right-hand side
        (Sharma, Kumar & Ghatak, Appl. Opt. 21, 984 (1982))."""
        n = self.n_field(p, wavelength_um, x, y, z)
        r2 = x * x + y * y
        dn_dr2 = p["nr2"] + (2.0 * p["nr4"] + 3.0 * p["nr6"] * r2) * r2
        dn_dx = 2.0 * x * dn_dr2
        dn_dy = 2.0 * y * dn_dr2
        dn_dz = p["nz1"] + (2.0 * p["nz2"] + 3.0 * p["nz3"] * z) * z
        return n * dn_dx, n * dn_dy, n * dn_dz

    def __repr__(self):
        return f"GrinMaterial(base={self.base!r}, n_steps={self.n_steps})"
