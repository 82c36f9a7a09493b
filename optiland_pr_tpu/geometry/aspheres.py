"""Asphere and freeform sag models (Newton-Raphson intersection).

Coefficient counts are static (fixed at build); coefficient values live in the
parameter pytree so merit-function gradients flow through them. Sag loops
unroll over the static count, which XLA fuses into a single polynomial kernel.

References:
- EvenAsphere:   optiland/geometries/even_asphere.py:28
- OddAsphere:    optiland/geometries/odd_asphere.py:25
- PolynomialGeometry (XY): optiland/geometries/polynomial.py:33-130
- ChebyshevPolynomialGeometry: optiland/geometries/chebyshev.py:33-150
- BiconicGeometry: optiland/geometries/biconic.py:29-185
- ToroidalGeometry: optiland/geometries/toroidal.py:26-220
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from ..core.safe_math import safe_div
from .base import Geometry
from .standard import _conic_sag, _conic_sag_grad

__all__ = ["EvenAsphere", "OddAsphere", "PolynomialXY", "ChebyshevSag",
           "Biconic", "Toroidal"]


def _asarray(v, n, dt=None):
    dt = dt or default_float()
    a = jnp.zeros((n,), dt)
    if v is not None and len(v):
        a = a.at[: len(v)].set(jnp.asarray(v, dt))
    return a


class EvenAsphere(Geometry):
    """z = conic + sum_i C_i r^(2i), i = 1..num_terms."""

    kind = "even_asphere"
    is_symmetric = True

    def __init__(self, num_terms: int):
        self.num_terms = int(num_terms)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": _asarray(coefficients, self.num_terms, dt)}

    def sag(self, p, x, y):
        r2 = x**2 + y**2
        z = _conic_sag(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        term = r2
        for i in range(self.num_terms):
            z = z + c[i] * term
            term = term * r2
        return z

    def sag_grad(self, p, x, y):
        r2 = x**2 + y**2
        dfdx, dfdy = _conic_sag_grad(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        # d(r^2i)/dx = 2i x r^(2(i-1))
        term = jnp.ones_like(r2)
        for i in range(self.num_terms):
            k = 2.0 * (i + 1)
            dfdx = dfdx + k * x * c[i] * term
            dfdy = dfdy + k * y * c[i] * term
            term = term * r2
        return dfdx, dfdy


class OddAsphere(Geometry):
    """z = conic + sum_i C_i r^i, i = 1..num_terms."""

    kind = "odd_asphere"
    is_symmetric = True

    def __init__(self, num_terms: int):
        self.num_terms = int(num_terms)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": _asarray(coefficients, self.num_terms, dt)}

    def sag(self, p, x, y):
        r = jnp.sqrt(x**2 + y**2)
        z = _conic_sag(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        term = r
        for i in range(self.num_terms):
            z = z + c[i] * term
            term = term * r
        return z

    def sag_grad(self, p, x, y):
        r2 = x**2 + y**2
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        dfdx, dfdy = _conic_sag_grad(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        # d(r^i)/dx = i r^(i-2) x
        term = safe_div(jnp.ones_like(r), r)  # r^-1
        for i in range(self.num_terms):
            k = float(i + 1)
            dfdx = dfdx + k * x * c[i] * term
            dfdy = dfdy + k * y * c[i] * term
            term = term * r
        return dfdx, dfdy


class PolynomialXY(Geometry):
    """z = conic + sum_ij C[i,j] x^i y^j (XY freeform)."""

    kind = "polynomial_xy"
    is_symmetric = False

    def __init__(self, num_x: int, num_y: int):
        self.num_x = int(num_x)
        self.num_y = int(num_y)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None, **kw):
        dt = default_float()
        c = jnp.zeros((self.num_x, self.num_y), dt)
        if coefficients is not None:
            cin = jnp.atleast_2d(jnp.asarray(coefficients, dt))
            c = c.at[: cin.shape[0], : cin.shape[1]].set(cin)
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": c}

    def _powers(self, v, n):
        out = [jnp.ones_like(v)]
        for _ in range(n - 1):
            out.append(out[-1] * v)
        return out  # [v^0 .. v^(n-1)]

    def sag(self, p, x, y):
        z = _conic_sag(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        xp = self._powers(x, self.num_x)
        yp = self._powers(y, self.num_y)
        for i in range(self.num_x):
            for j in range(self.num_y):
                z = z + c[i, j] * xp[i] * yp[j]
        return z

    def sag_grad(self, p, x, y):
        dfdx, dfdy = _conic_sag_grad(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        xp = self._powers(x, self.num_x)
        yp = self._powers(y, self.num_y)
        for i in range(1, self.num_x):
            for j in range(self.num_y):
                dfdx = dfdx + i * c[i, j] * xp[i - 1] * yp[j]
        for i in range(self.num_x):
            for j in range(1, self.num_y):
                dfdy = dfdy + j * c[i, j] * xp[i] * yp[j - 1]
        return dfdx, dfdy


def _chebyshev_t(n, u):
    """T_0..T_{n-1}(u) via the recurrence, returned as a list."""
    ts = [jnp.ones_like(u)]
    if n > 1:
        ts.append(u)
    for _ in range(2, n):
        ts.append(2 * u * ts[-1] - ts[-2])
    return ts


def _chebyshev_dt(n, u):
    """T'_k via T'_k = k*U_{k-1}; U via recurrence."""
    us = [jnp.ones_like(u)]  # U_0
    if n > 2:
        us.append(2 * u)  # U_1
    for _ in range(3, n):
        us.append(2 * u * us[-1] - us[-2])
    dts = [jnp.zeros_like(u)]
    for k in range(1, n):
        dts.append(k * us[k - 1])
    return dts


class ChebyshevSag(Geometry):
    """z = conic + sum_ij C[i,j] T_i(x/norm_x) T_j(y/norm_y)."""

    kind = "chebyshev"
    is_symmetric = False

    def __init__(self, num_x: int, num_y: int):
        self.num_x = int(num_x)
        self.num_y = int(num_y)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None,
                       norm_x=1.0, norm_y=1.0, **kw):
        dt = default_float()
        c = jnp.zeros((self.num_x, self.num_y), dt)
        if coefficients is not None:
            cin = jnp.atleast_2d(jnp.asarray(coefficients, dt))
            c = c.at[: cin.shape[0], : cin.shape[1]].set(cin)
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": c,
                "norm_x": jnp.asarray(norm_x, dt),
                "norm_y": jnp.asarray(norm_y, dt)}

    def sag(self, p, x, y):
        u = x / p["norm_x"]
        v = y / p["norm_y"]
        z = _conic_sag(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        tx = _chebyshev_t(self.num_x, u)
        ty = _chebyshev_t(self.num_y, v)
        for i in range(self.num_x):
            for j in range(self.num_y):
                z = z + c[i, j] * tx[i] * ty[j]
        return z

    def sag_grad(self, p, x, y):
        u = x / p["norm_x"]
        v = y / p["norm_y"]
        dfdx, dfdy = _conic_sag_grad(p["radius"], p["conic"], x, y)
        c = p["coefficients"]
        tx = _chebyshev_t(self.num_x, u)
        ty = _chebyshev_t(self.num_y, v)
        dtx = _chebyshev_dt(self.num_x, u)
        dty = _chebyshev_dt(self.num_y, v)
        # NOTE: matches the reference exactly (geometries/chebyshev.py
        # _surface_normal), which evaluates T' at the *normalized* coordinate
        # without the 1/norm chain-rule factor.
        for i in range(self.num_x):
            for j in range(self.num_y):
                if i > 0:
                    dfdx = dfdx + c[i, j] * dtx[i] * ty[j]
                if j > 0:
                    dfdy = dfdy + c[i, j] * tx[i] * dty[j]
        return dfdx, dfdy


class Biconic(Geometry):
    """z = cx x^2/(1+sqrt(1-(1+kx)cx^2 x^2)) + cy y^2/(1+sqrt(1-(1+ky)cy^2 y^2)).

    ``radius``/``conic`` params alias (Ry, ky) for the Newton warm start and
    the paraxial y-power, matching the reference's use of Ry as base radius.
    """

    kind = "biconic"
    is_symmetric = False

    def default_params(self, radius=jnp.inf, conic=0.0, radius_x=jnp.inf,
                       conic_x=0.0, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "radius_x": jnp.asarray(radius_x, dt),
                "conic_x": jnp.asarray(conic_x, dt)}

    @staticmethod
    def _axis_sag(R, k, v):
        is_plane = jnp.isinf(R)
        c = jnp.where(is_plane, 0.0, safe_div(jnp.ones_like(R), R))
        arg = 1.0 - (1.0 + k) * c**2 * v**2
        arg = jnp.where(arg < 1e-14, 0.0, arg)
        denom = 1.0 + jnp.sqrt(arg)
        return (c * v**2) / jnp.where(jnp.abs(denom) < 1e-14, 1e-14, denom)

    @staticmethod
    def _axis_grad(R, k, v):
        is_plane = jnp.isinf(R)
        c = jnp.where(is_plane, 0.0, safe_div(jnp.ones_like(R), R))
        arg = 1.0 - (1.0 + k) * c**2 * v**2
        arg = jnp.where(arg < 1e-14, 1e-14, arg)
        return (c * v) / jnp.sqrt(arg)

    def sag(self, p, x, y):
        return (self._axis_sag(p["radius_x"], p["conic_x"], x)
                + self._axis_sag(p["radius"], p["conic"], y))

    def sag_grad(self, p, x, y):
        return (self._axis_grad(p["radius_x"], p["conic_x"], x),
                self._axis_grad(p["radius"], p["conic"], y))


class Toroidal(Geometry):
    """Y-Z curve (conic + even polynomial in y) swept about an axis parallel to
    y at distance R_rot: z = z_y + (R - z_y) - sign(R - z_y) sqrt((R-z_y)^2 - x^2).

    Params: ``radius`` aliases R_yz (+ ``conic`` its k) for warm start;
    ``radius_rot`` is the X-Z radius of rotation; ``coeffs_poly_y[i]`` is the
    coefficient of y^(2(i+1)).
    """

    kind = "toroidal"
    is_symmetric = False

    def __init__(self, num_terms: int = 0):
        self.num_terms = int(num_terms)

    def default_params(self, radius=jnp.inf, conic=0.0, radius_rot=jnp.inf,
                       coeffs_poly_y=None, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "radius_rot": jnp.asarray(radius_rot, dt),
                "coeffs_poly_y": _asarray(coeffs_poly_y, self.num_terms, dt)}

    def _zy(self, p, y):
        z = Biconic._axis_sag(p["radius"], p["conic"], y)
        y2 = y**2
        term = y2
        for i in range(self.num_terms):
            z = z + p["coeffs_poly_y"][i] * term
            term = term * y2
        return z

    def _dzy(self, p, y):
        dz = Biconic._axis_grad(p["radius"], p["conic"], y)
        y2 = y**2
        term = y
        for i in range(self.num_terms):
            dz = dz + 2.0 * (i + 1) * p["coeffs_poly_y"][i] * term
            term = term * y2
        return dz

    def sag(self, p, x, y):
        z_y = self._zy(p, y)
        R = p["radius_rot"]
        is_inf = jnp.isinf(R)
        Rs = jnp.where(is_inf, 1.0, R)
        inside = (Rs - z_y) ** 2 - x**2
        ok = inside >= 0
        root = jnp.sqrt(jnp.where(ok, inside, 0.0)
                        + jnp.where(ok, 0.0, 1e-12))
        z_tor = z_y + (Rs - z_y) - jnp.sign(Rs - z_y) * root
        return jnp.where(is_inf, z_y, z_tor)

    def sag_grad(self, p, x, y):
        z_y = self._zy(p, y)
        dz_dy = self._dzy(p, y)
        R = p["radius_rot"]
        is_inf = jnp.isinf(R)
        Rs = jnp.where(is_inf, 1.0, R)
        inside = (Rs - z_y) ** 2 - x**2
        ok = inside >= 0
        root = jnp.sqrt(jnp.where(ok, jnp.maximum(inside, 1e-14), 1e-14))
        fx = jnp.where(ok, jnp.sign(Rs) * x / root, 0.0)
        fy = jnp.where(ok, jnp.sign(Rs) * (Rs - z_y) * dz_dy / root, 0.0)
        dfdx = jnp.where(is_inf, jnp.zeros_like(fx), fx)
        dfdy = jnp.where(is_inf, dz_dy, fy)
        return dfdx, dfdy
