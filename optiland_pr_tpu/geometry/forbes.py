"""Forbes Q-polynomial surfaces (Qbfs rotationally-symmetric; Q2D freeform).

Reference: optiland/geometries/forbes/geometry.py:83-670 + qpoly.py (625 LoC),
whose recurrences follow G. W. Forbes, "Shape specification for axially
symmetric optical surfaces," Opt. Express 15, 5218 (2007).

TPU-first reformulation: the Qbfs -> Pn basis change is a *linear* map with
coefficients that depend only on the (static) term count, so it is precomputed
host-side as a matrix; the Clenshaw recurrence unrolls statically over terms.
Everything differentiable w.r.t. the coefficients.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..config import default_float
from ..core.safe_math import safe_div
from .base import Geometry
from .standard import _conic_sag, _conic_sag_grad

__all__ = ["ForbesQbfs", "qbfs_basis_matrix"]


@lru_cache(maxsize=None)
def _f_qbfs(n: int) -> float:
    if n == 0:
        return 2.0
    if n == 1:
        return math.sqrt(19) / 2
    return math.sqrt(n * (n + 1) + 3 - _g_qbfs(n - 1) ** 2
                     - _h_qbfs(n - 2) ** 2)


@lru_cache(maxsize=None)
def _g_qbfs(n_minus_1: int) -> float:
    if n_minus_1 == 0:
        return -0.5
    n_minus_2 = n_minus_1 - 1
    return -(1 + _g_qbfs(n_minus_2) * _h_qbfs(n_minus_2)) / _f_qbfs(n_minus_1)


@lru_cache(maxsize=None)
def _h_qbfs(n_minus_2: int) -> float:
    n = n_minus_2 + 2
    return -n * (n - 1) / (2 * _f_qbfs(n_minus_2))


@lru_cache(maxsize=None)
def qbfs_basis_matrix(num_terms: int) -> np.ndarray:
    """Matrix M with bs = M @ cs (the Qbfs -> Pn basis change,
    reference qpoly.py change_basis_qbfs_to_pn, which is linear in cs)."""
    m = num_terms - 1
    M = np.zeros((num_terms, num_terms))
    if m < 0:
        return M
    # build by feeding unit vectors through the recurrence
    for col in range(num_terms):
        cs = np.zeros(num_terms)
        cs[col] = 1.0
        bs = np.zeros(num_terms)
        bs[m] = cs[m] / _f_qbfs(m)
        if m > 0:
            bs[m - 1] = (cs[m - 1] - _g_qbfs(m - 1) * bs[m]) / _f_qbfs(m - 1)
        for i in range(m - 2, -1, -1):
            bs[i] = (cs[i] - _g_qbfs(i) * bs[i + 1]
                     - _h_qbfs(i) * bs[i + 2]) / _f_qbfs(i)
        M[:, col] = bs
    return M


def _clenshaw_qbfs(bs_list, usq):
    """Sum of Pn terms via Clenshaw (reference qpoly.py:138-170). ``bs_list``
    is a list of scalars/arrays (len = num_terms); returns (alpha0, alpha1)."""
    m = len(bs_list) - 1
    prefix = 2 - 4 * usq
    alphas = [None] * (m + 1)
    alphas[m] = bs_list[m] + jnp.zeros_like(usq)
    if m > 0:
        alphas[m - 1] = bs_list[m - 1] + prefix * alphas[m]
    for i in range(m - 2, -1, -1):
        alphas[i] = bs_list[i] + prefix * alphas[i + 1] - alphas[i + 2]
    return alphas


def _clenshaw_qbfs_der(bs_list, usq, alphas0):
    """First-derivative Clenshaw pass (reference qpoly.py:192-292, j=1)."""
    m = len(bs_list) - 1
    prefix = 2 - 4 * usq
    a1 = [jnp.zeros_like(usq) for _ in range(m + 1)]
    jj = 1
    if m - jj >= 0:
        a1[m - jj] = -4 * jj * alphas0[m - jj + 1] if m - jj + 1 <= m \
            else jnp.zeros_like(usq)
    if m - jj - 1 >= 0:
        a1[m - jj - 1] = prefix * a1[m - jj] - 4 * jj * alphas0[m - jj]
    for n in range(m - jj - 2, -1, -1):
        a1[n] = prefix * a1[n + 1] - a1[n + 2] - 4 * jj * alphas0[n + 1]
    return a1


class ForbesQbfs(Geometry):
    """Q-bfs surface: z = conic + (u^2(1-u^2) sum a_m Q_m(u^2)) / sigma(rho)
    (reference forbes/geometry.py:183-380)."""

    kind = "forbes_qbfs"
    is_symmetric = True

    def __init__(self, num_terms: int):
        self.num_terms = int(num_terms)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None,
                       norm_radius=1.0, radial_terms=None, **kw):
        dt = default_float()
        coefficients = coefficients if coefficients is not None else \
            ([radial_terms.get(n, 0.0) for n in
              range(max(radial_terms.keys()) + 1)] if radial_terms else None)
        c = jnp.zeros((max(self.num_terms, 1),), dt)
        if coefficients is not None and len(coefficients):
            c = c.at[: len(coefficients)].set(jnp.asarray(coefficients, dt))
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": c,
                "norm_radius": jnp.asarray(norm_radius, dt)}

    # -- pieces ------------------------------------------------------------
    def _conic_correction(self, p, r2):
        """sigma(rho)^-1 projection factor and its rho-derivative
        (reference forbes/geometry.py:150-181)."""
        R = p["radius"]
        is_plane = jnp.isinf(R)
        Rs = jnp.where(is_plane, 1.0, R)
        c2 = (1.0 / Rs) ** 2
        k = p["conic"]
        rho = jnp.sqrt(r2)
        num_arg = 1 - k * c2 * r2
        den_arg = 1 - (k + 1) * c2 * r2
        N = jnp.sqrt(jnp.where(num_arg > 0, num_arg, 1e-12))
        D = jnp.sqrt(jnp.where(den_arg > 0, den_arg, 1e-12))
        factor = jnp.where(is_plane, 1.0, N / D)
        deriv = jnp.where(is_plane, 0.0, (c2 * rho) / (N * D**3))
        return factor, deriv

    def _poly(self, p, usq):
        """(sum, d(sum)/d(usq)) of the Qbfs series at u^2."""
        if self.num_terms == 0:
            z = jnp.zeros_like(usq)
            return z, z
        M = jnp.asarray(qbfs_basis_matrix(self.num_terms), usq.dtype)
        bs = M @ p["coefficients"][: self.num_terms]
        bs_list = [bs[i] for i in range(self.num_terms)]
        alphas0 = _clenshaw_qbfs(bs_list, usq)
        if self.num_terms > 1:
            s = 2 * (alphas0[0] + alphas0[1])
            a1 = _clenshaw_qbfs_der(bs_list, usq, alphas0)
            ds_dusq = 2 * (a1[0] + a1[1]) if self.num_terms > 1 else 2 * a1[0]
        else:
            s = 2 * alphas0[0]
            ds_dusq = jnp.zeros_like(usq)
        return s, ds_dusq

    # -- interface ---------------------------------------------------------
    def sag(self, p, x, y):
        r2 = x**2 + y**2
        z_base = _conic_sag(p["radius"], p["conic"], x, y)
        z_base = jnp.where(jnp.isinf(p["radius"]), jnp.zeros_like(z_base),
                           z_base)
        usq = r2 / p["norm_radius"] ** 2
        poly, _ = self._poly(p, usq)
        factor, _ = self._conic_correction(p, r2)
        departure = usq * (1 - usq) * factor * poly
        S = jnp.where(usq > 1, 0.0, departure)
        return z_base + S

    def sag_grad(self, p, x, y):
        r2 = x**2 + y**2
        rho = jnp.sqrt(r2 + 1e-12)
        dz_base = _conic_sag_grad(p["radius"], p["conic"], x, y)
        # base conic d/drho (rebuild from dfdx = df/drho * x/rho)
        base_x, base_y = dz_base
        nr = p["norm_radius"]
        u = rho / nr
        usq = u**2
        poly, ds_dusq = self._poly(p, usq)
        ds_du = ds_dusq * 2 * u
        factor, dfactor_drho = self._conic_correction(p, r2)
        dprefactor_drho = (2 * u - 4 * u**3) / nr
        dpoly_drho = ds_du / nr
        ds_dep_drho = (dprefactor_drho * factor * poly
                       + (usq - usq**2) * dfactor_drho * poly
                       + (usq - usq**2) * factor * dpoly_drho)
        ds_dep_drho = jnp.where(u >= 1, 0.0, ds_dep_drho)
        dfdx = base_x + ds_dep_drho * (x / rho)
        dfdy = base_y + ds_dep_drho * (y / rho)
        return dfdx, dfdy
