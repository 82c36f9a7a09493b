"""Surface coatings (reference optiland/coatings.py:1-400).

- SimpleCoating: scalar reflectance/transmittance intensity scaling.
- FresnelCoating: s/p Fresnel coefficients from the surface's material pair,
  applied as a per-ray Jones matrix to the polarization chain (requires a
  polarized trace, as in the reference).

A coating is a static def; numeric values (R/T) live in the surface params.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from ..core.polarization import fresnel_jones

__all__ = ["CoatingDef", "SimpleCoating", "FresnelCoating"]


class CoatingDef:
    kind = "base"
    polarization_dependent = False

    def default_params(self, **kw) -> dict:
        return {}


class SimpleCoating(CoatingDef):
    """Scalar R/T coating (reference coatings.py SimpleCoating)."""

    kind = "simple"

    def __init__(self, transmittance: float = 1.0, reflectance: float = 0.0):
        self._t = transmittance
        self._r = reflectance

    def default_params(self, **kw) -> dict:
        dt = default_float()
        return {"transmittance": jnp.asarray(self._t, dt),
                "reflectance": jnp.asarray(self._r, dt)}

    def intensity_factor(self, p, reflect: bool):
        return p["reflectance"] if reflect else p["transmittance"]


class FresnelCoating(CoatingDef):
    """Uncoated-interface Fresnel interaction (reference coatings.py:345):
    per-ray Jones matrix from the s/p amplitude coefficients of the
    material_pre -> material_post interface."""

    kind = "fresnel"
    polarization_dependent = True

    def default_params(self, **kw) -> dict:
        return {}

    def jones(self, n1, n2, aoi, reflect: bool):
        return fresnel_jones(n1, n2, aoi, reflect)
