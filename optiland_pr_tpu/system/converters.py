"""Thin-lens to thick-lens conversion (reference surfaces/converters.py:21).

Replaces a ``paraxial`` (ideal thin lens) surface with an equivalent thick
lens: equi-convex with radii R = 2 f (n - 1) / (2 - t (n-1)/(f n)) solved for
the requested center thickness, preserving the focal length.
"""
from __future__ import annotations

import numpy as np

__all__ = ["ParaxialToThickLensConverter"]


class ParaxialToThickLensConverter:
    """Convert surface ``surface_idx`` (a thin ``paraxial`` lens with focal
    length f) of ``optic`` into an equi-convex thick lens of the given
    material and center thickness."""

    def __init__(self, optic, surface_idx: int, material="N-BK7",
                 thickness: float = 2.0, n_estimate: float | None = None):
        self.optic = optic
        self.surface_idx = surface_idx
        self.material = material
        self.thickness = float(thickness)
        self.n_estimate = n_estimate

    def convert(self):
        optic = self.optic
        e = optic._surfaces[self.surface_idx]
        if e["surface_type"] != "paraxial":
            raise ValueError("surface is not a paraxial (thin) lens")
        f = float(e["geom_kw"].get("f", np.inf))
        if self.n_estimate is None:
            from ..materials import resolve_material
            model, params = resolve_material(self.material)
            n = float(np.asarray(model.n(params, 0.5876)))
        else:
            n = self.n_estimate
        t = self.thickness
        # lensmaker with R1 = -R2 = R:
        # 1/f = (n-1) (2/R - (n-1) t / (n R^2)) -> quadratic in 1/R
        # solve: a x^2 + b x + c = 0 with x = 1/R
        a = -(n - 1) ** 2 * t / n
        b = 2 * (n - 1)
        c = -1.0 / f
        disc = b * b - 4 * a * c
        x = (-b + np.sqrt(disc)) / (2 * a) if a != 0 else -c / b
        if abs(x) < 1e-14:
            raise ValueError("degenerate thin-lens conversion")
        R = 1.0 / x
        # the root closest to the thin-lens R = 2 f (n-1)
        R_thin = 2 * f * (n - 1)
        x2 = (-b - np.sqrt(disc)) / (2 * a) if a != 0 else x
        if abs(1.0 / x2 - R_thin) < abs(R - R_thin):
            R = 1.0 / x2

        # rebuild prescription: replace the thin surface with two surfaces,
        # shifting the following gap to preserve the rear principal distance
        rear_gap = float(e["thickness"]) - t / 2.0
        optic._surfaces[self.surface_idx] = dict(
            surface_type="standard", radius=R, thickness=t,
            material=self.material, conic=0.0,
            is_stop=e["is_stop"], comment=e["comment"],
            dx=0.0, dy=0.0, dz=0.0, rx=0.0, ry=0.0, rz=0.0,
            aperture=e["aperture"], bsdf=None, coating=None, geom_kw={})
        optic._surfaces.insert(self.surface_idx + 1, dict(
            surface_type="standard", radius=-R, thickness=rear_gap,
            material=None, conic=0.0, is_stop=False, comment="",
            dx=0.0, dy=0.0, dz=0.0, rx=0.0, ry=0.0, rz=0.0,
            aperture=None, bsdf=None, coating=None, geom_kw={}))
        optic._dirty()
        return optic
