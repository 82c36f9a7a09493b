"""Phase profiles for diffractive/metasurface interactions.

Reference: optiland/phase/ (600 LoC) — ConstantPhaseProfile,
RadialPhaseProfile, LinearGratingPhaseProfile, GridPhaseProfile, applied by
PhaseInteractionModel (interactions/phase_interaction_model.py): the tangential
wavevector picks up the surface-projected phase gradient, the normal component
is rebuilt from |k_out| = n2 k0, OPD shifts by -phase/k0, intensity scales by
the profile's diffraction efficiency.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float

__all__ = ["PhaseProfileDef", "ConstantPhaseProfile", "RadialPhaseProfile",
           "LinearGratingPhaseProfile", "GridPhaseProfile"]


class PhaseProfileDef:
    kind = "base"
    efficiency: float = 1.0

    def default_params(self, **kw) -> dict:
        return {}

    def phase(self, p, x, y):
        raise NotImplementedError

    def gradient(self, p, x, y):
        """(dphi/dx, dphi/dy, dphi/dz)."""
        raise NotImplementedError

    def paraxial_gradient(self, p, y):
        _, gy, _ = self.gradient(p, jnp.zeros_like(y), y)
        return gy


class ConstantPhaseProfile(PhaseProfileDef):
    kind = "constant"

    def __init__(self, efficiency: float = 1.0):
        self.efficiency = efficiency

    def default_params(self, phase=0.0, **kw):
        return {"phase": jnp.asarray(phase, default_float())}

    def phase(self, p, x, y):
        return p["phase"] * jnp.ones_like(x)

    def gradient(self, p, x, y):
        z = jnp.zeros_like(x)
        return z, z, z


class RadialPhaseProfile(PhaseProfileDef):
    """phi(r) = sum_i c_i r^(2(i+1)) (reference phase/radial.py)."""

    kind = "radial"

    def __init__(self, num_terms: int, efficiency: float = 1.0):
        self.num_terms = int(num_terms)
        self.efficiency = efficiency

    def default_params(self, coefficients=None, **kw):
        dt = default_float()
        c = jnp.zeros((self.num_terms,), dt)
        if coefficients is not None and len(coefficients):
            c = c.at[: len(coefficients)].set(jnp.asarray(coefficients, dt))
        return {"coefficients": c}

    def phase(self, p, x, y):
        r2 = x**2 + y**2
        phase = jnp.zeros_like(x)
        term = r2
        for i in range(self.num_terms):
            phase = phase + p["coefficients"][i] * term
            term = term * r2
        return phase

    def gradient(self, p, x, y):
        r2 = x**2 + y**2
        r = jnp.sqrt(r2)
        d_dr = jnp.zeros_like(r)
        for i in range(self.num_terms):
            power = i + 1
            d_dr = d_dr + p["coefficients"][i] * 2 * power * r ** (2 * power - 1)
        safe_r = jnp.where(r == 0, 1.0, r)
        return (d_dr / safe_r) * x, (d_dr / safe_r) * y, jnp.zeros_like(x)


class LinearGratingPhaseProfile(PhaseProfileDef):
    """phi = Kx x + Ky y with |K| = 2 pi / period
    (reference phase/linear_grating.py)."""

    kind = "linear_grating"

    def __init__(self, efficiency: float = 1.0):
        self.efficiency = efficiency

    def default_params(self, period=1.0, angle=0.0, order=1, **kw):
        dt = default_float()
        return {"period": jnp.asarray(period, dt),
                "angle": jnp.asarray(angle, dt),
                "order": jnp.asarray(order, dt)}

    def _K(self, p):
        mag = 2 * jnp.pi * p["order"] / p["period"]
        return mag * jnp.cos(p["angle"]), mag * jnp.sin(p["angle"])

    def phase(self, p, x, y):
        Kx, Ky = self._K(p)
        return Kx * x + Ky * y

    def gradient(self, p, x, y):
        Kx, Ky = self._K(p)
        one = jnp.ones_like(x)
        return Kx * one, Ky * one, jnp.zeros_like(x)


class GridPhaseProfile(PhaseProfileDef):
    """Tabulated phase grid, bilinear interpolation (reference phase/grid.py
    uses 2-D splines; bilinear keeps it branchless and differentiable)."""

    kind = "grid"

    def __init__(self, nx: int, ny: int, efficiency: float = 1.0):
        self.nx = int(nx)
        self.ny = int(ny)
        self.efficiency = efficiency

    def default_params(self, x_coords=None, y_coords=None, phase_grid=None,
                       **kw):
        dt = default_float()
        if x_coords is None:
            x_coords = jnp.linspace(-1.0, 1.0, self.nx)
        if y_coords is None:
            y_coords = jnp.linspace(-1.0, 1.0, self.ny)
        if phase_grid is None:
            phase_grid = jnp.zeros((self.ny, self.nx))
        return {"x_coords": jnp.asarray(x_coords, dt),
                "y_coords": jnp.asarray(y_coords, dt),
                "phase_grid": jnp.asarray(phase_grid, dt)}

    def _cell(self, p, x, y):
        xc, yc = p["x_coords"], p["y_coords"]
        ix = jnp.clip(jnp.searchsorted(xc, x) - 1, 0, self.nx - 2)
        iy = jnp.clip(jnp.searchsorted(yc, y) - 1, 0, self.ny - 2)
        x0, x1 = xc[ix], xc[ix + 1]
        y0, y1 = yc[iy], yc[iy + 1]
        tx = (x - x0) / (x1 - x0)
        ty = (y - y0) / (y1 - y0)
        g = p["phase_grid"]
        return (x1 - x0, y1 - y0, tx, ty, g[iy, ix], g[iy, ix + 1],
                g[iy + 1, ix], g[iy + 1, ix + 1])

    def phase(self, p, x, y):
        dx, dy, tx, ty, z00, z01, z10, z11 = self._cell(p, x, y)
        return ((1 - ty) * ((1 - tx) * z00 + tx * z01)
                + ty * ((1 - tx) * z10 + tx * z11))

    def gradient(self, p, x, y):
        dx, dy, tx, ty, z00, z01, z10, z11 = self._cell(p, x, y)
        gx = ((1 - ty) * (z01 - z00) + ty * (z11 - z10)) / dx
        gy = ((1 - tx) * (z10 - z00) + tx * (z11 - z01)) / dy
        return gx, gy, jnp.zeros_like(x)
