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

__all__ = ["ForbesQbfs", "ForbesQ2d", "qbfs_basis_matrix"]


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


# --- Forbes Q2D freeform --------------------------------------------------

@lru_cache(maxsize=None)
def _gamma_q2d(n: int, m: int) -> float:
    """(reference qpoly.py gamma_func)."""
    if n == 1 and m == 2:
        return 3.0 / 8.0
    if n == 1 and m > 2:
        mm1 = m - 1
        return ((2 * mm1 + 1) / (2 * (mm1 - 1))) * _gamma_q2d(1, mm1)
    nm1 = n - 1
    num = (nm1 + 1) * (2 * m + 2 * nm1 - 1)
    den = (m + nm1 - 2) * (2 * nm1 + 1)
    return (num / den) * _gamma_q2d(nm1, m)


def _kron(i, j):
    return 1 if i == j else 0


@lru_cache(maxsize=None)
def _g_q2d_raw(n: int, m: int) -> float:
    from scipy import special
    if n == 0:
        return float(special.factorial2(2 * m - 1)
                     / (2 ** (m + 1) * special.factorial(m - 1)))
    if n > 0 and m == 1:
        term1 = -((2 * n**2 - 1) * (n**2 - 1)) / (8 * (4 * n**2 - 1))
        return term1 - _kron(n, 1) / 24.0
    nt1 = 2 * n * (m + n - 1) - m
    nt2 = (n + 1) * (2 * m + 2 * n - 1)
    den = (m + 2 * n - 2) * (m + 2 * n - 1) * (m + 2 * n) * (2 * n + 1)
    return -(nt1 * nt2) / den * _gamma_q2d(n, m)


@lru_cache(maxsize=None)
def _f_q2d_raw(n: int, m: int) -> float:
    from scipy import special
    if n == 0 and m == 1:
        return 0.25
    if n == 0:
        return float(m**2 * special.factorial2(2 * m - 3)
                     / (2 ** (m + 1) * special.factorial(m - 1)))
    if n > 0 and m == 1:
        term1 = (4 * (n - 1) ** 2 * n**2 + 1) / (8 * (2 * n - 1) ** 2)
        return term1 + 11.0 / 32.0 * _kron(n, 1)
    chi = m + n - 2
    num = 2 * n * chi * (3 - 5 * m + 4 * n * chi) \
        + m**2 * (3 - m + 4 * n * chi)
    den = (m + 2 * n - 3) * (m + 2 * n - 2) * (m + 2 * n - 1) * (2 * n - 1)
    return num / den * _gamma_q2d(n, m)


@lru_cache(maxsize=None)
def _f_q2d(n: int, m: int) -> float:
    if n == 0:
        return math.sqrt(_f_q2d_raw(0, m))
    return math.sqrt(_f_q2d_raw(n, m) - _g_q2d(n - 1, m) ** 2)


@lru_cache(maxsize=None)
def _g_q2d(n: int, m: int) -> float:
    return _g_q2d_raw(n, m) / _f_q2d(n, m)


_ABC_Q2D_SPECIAL = {(1, 0): (2, -1, 0), (1, 1): (-4 / 3, -8 / 3, -11 / 3),
                    (1, 2): (9 / 5, -24 / 5, 0), (2, 0): (3, -2, 0),
                    (3, 0): (5, -4, 0)}


@lru_cache(maxsize=None)
def _abc_q2d(n: int, m: int):
    if (m, n) in _ABC_Q2D_SPECIAL:
        return _ABC_Q2D_SPECIAL[(m, n)]
    d = (4 * n**2 - 1) * (m + n - 2) * (m + 2 * n - 3)
    if d == 0:
        d = 1e-99
    a = ((2 * n - 1) * (m + 2 * n - 2)
         * (4 * n * (m + n - 2) + (m - 3) * (2 * m - 1))) / d
    b = (-2 * (2 * n - 1) * (m + 2 * n - 3) * (m + 2 * n - 2)
         * (m + 2 * n - 1)) / d
    c = (n * (2 * n - 3) * (m + 2 * n - 1) * (2 * m + 2 * n - 3)) / d
    return a, b, c


@lru_cache(maxsize=None)
def q2d_basis_matrix(num_terms: int, m: int) -> np.ndarray:
    """ds = M @ cns for the Q2D -> Pnm basis change (linear, reference
    qpoly.py change_basis_q2d_to_pnm)."""
    m = abs(m)
    n_max = num_terms - 1
    M = np.zeros((num_terms, num_terms))
    for col in range(num_terms):
        cns = np.zeros(num_terms)
        cns[col] = 1.0
        ds = np.zeros(num_terms)
        ds[n_max] = cns[n_max] / _f_q2d(n_max, m)
        for n in range(n_max - 1, -1, -1):
            ds[n] = (cns[n] - _g_q2d(n, m) * ds[n + 1]) / _f_q2d(n, m)
        M[:, col] = ds
    return M


def _clenshaw_q2d(ds_list, m, usq):
    n_max = len(ds_list) - 1
    al = [jnp.zeros_like(usq) for _ in range(n_max + 3)]
    al[n_max] = ds_list[n_max] + jnp.zeros_like(usq)
    if n_max >= 1:
        a, b, _ = _abc_q2d(n_max - 1, m)
        al[n_max - 1] = ds_list[n_max - 1] + (a + b * usq) * al[n_max]
    for n in range(n_max - 2, -1, -1):
        a, b, _ = _abc_q2d(n, m)
        _, _, c = _abc_q2d(n + 1, m)
        al[n] = ds_list[n] + (a + b * usq) * al[n + 1] - c * al[n + 2]
    return al


def _clenshaw_q2d_der(ds_list, m, usq, al0):
    n_max = len(ds_list) - 1
    al = [jnp.zeros_like(usq) for _ in range(n_max + 3)]
    jj = 1
    if n_max - jj >= 0:
        _, b, _ = _abc_q2d(n_max - jj, m)
        al[n_max - jj] = jj * b * al0[n_max - jj + 1]
        for n in range(n_max - jj - 1, -1, -1):
            a, b, _ = _abc_q2d(n, m)
            _, _, c = _abc_q2d(n + 1, m)
            al[n] = (jj * b * al0[n + 1] + (a + b * usq) * al[n + 1]
                     - c * al[n + 2])
    return al


def _q2d_sum(al, m, num_coeffs):
    s = 0.5 * al[0]
    if m == 1 and num_coeffs - 1 > 2:
        s = s - 2.0 / 5.0 * al[3]
    return s


class ForbesQ2d(Geometry):
    """Forbes Q2D freeform (reference forbes/geometry.py:382-670):

    z = z_base + sigma^-1 [ u^2(1-u^2) sum a_n Q_n(u^2)
                            + sum_m u^m (cos/sin)(m theta) sum_n c Q_n^m(u^2) ]

    Static structure: the (n, m) term list (Zemax-style keys ("A", m, n) for
    cosine and ("B", m, n) for sine terms). Coefficient values live in params.
    """

    kind = "forbes_q2d"
    is_symmetric = False

    def __init__(self, terms: tuple):
        """``terms``: ordered tuple of (n, m) with m > 0 cosine, m < 0 sine,
        m == 0 rotational."""
        self.terms = tuple((int(n), int(m)) for n, m in terms)
        # group: m=0 list length, per-|m| a (cos) and b (sin) list lengths
        self.n_m0 = max([n for n, m in self.terms if m == 0], default=-1) + 1
        max_m = max([abs(m) for n, m in self.terms if m != 0], default=0)
        self.max_m = max_m
        self.len_a = [0] * (max_m + 1)
        self.len_b = [0] * (max_m + 1)
        for n, m in self.terms:
            if m > 0:
                self.len_a[m] = max(self.len_a[m], n + 1)
            elif m < 0:
                self.len_b[-m] = max(self.len_b[-m], n + 1)

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None,
                       norm_radius=1.0, **kw):
        dt = default_float()
        c = jnp.zeros((max(len(self.terms), 1),), dt)
        if coefficients is not None and len(coefficients):
            c = c.at[: len(coefficients)].set(jnp.asarray(coefficients, dt))
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": c,
                "norm_radius": jnp.asarray(norm_radius, dt)}

    # -- coefficient regrouping (differentiable gather) --------------------
    def _grouped(self, c):
        cm0 = [jnp.zeros(()) for _ in range(self.n_m0)]
        ams = [[jnp.zeros(()) for _ in range(self.len_a[m])]
               for m in range(self.max_m + 1)]
        bms = [[jnp.zeros(()) for _ in range(self.len_b[m])]
               for m in range(self.max_m + 1)]
        for idx, (n, m) in enumerate(self.terms):
            if m == 0:
                cm0[n] = c[idx]
            elif m > 0:
                ams[m][n] = c[idx]
            else:
                bms[-m][n] = c[idx]
        return cm0, ams, bms

    def _series(self, p, u, theta):
        """(poly_m0, dpoly_m0_du, poly_mgt0, dr_mgt0, dt_mgt0)."""
        usq = u * u
        c = p["coefficients"]
        cm0, ams, bms = self._grouped(c)
        zero = jnp.zeros_like(u)

        # m = 0 part: Qbfs machinery
        if cm0:
            Mb = jnp.asarray(qbfs_basis_matrix(len(cm0)), u.dtype)
            bs = Mb @ jnp.stack(cm0)
            bs_list = [bs[i] for i in range(len(cm0))]
            al0 = _clenshaw_qbfs(bs_list, usq)
            if len(cm0) > 1:
                s_m0 = 2 * (al0[0] + al0[1])
                a1 = _clenshaw_qbfs_der(bs_list, usq, al0)
                ds_dusq = 2 * (a1[0] + a1[1])
            else:
                s_m0 = 2 * al0[0]
                ds_dusq = zero
            d_m0_du = ds_dusq * 2 * u
        else:
            s_m0, d_m0_du = zero, zero

        poly_terms, dr_terms, dt_terms = [], [], []
        for m in range(1, self.max_m + 1):
            s_a = s_b = sp_a = sp_b = zero
            for coefs, is_a in ((ams[m], True), (bms[m], False)):
                if not coefs:
                    continue
                Mq = jnp.asarray(q2d_basis_matrix(len(coefs), m), u.dtype)
                ds = Mq @ jnp.stack(coefs)
                ds_list = [ds[i] for i in range(len(coefs))]
                al0 = _clenshaw_q2d(ds_list, m, usq)
                al1 = _clenshaw_q2d_der(ds_list, m, usq, al0)
                s = _q2d_sum(al0, m, len(coefs))
                sp = _q2d_sum(al1, m, len(coefs))
                if is_a:
                    s_a, sp_a = s, sp
                else:
                    s_b, sp_b = s, sp
            um = u**m
            cost = jnp.cos(m * theta)
            sint = jnp.sin(m * theta)
            poly_terms.append(um * (cost * s_a + sint * s_b))
            umm1 = u ** (m - 1)
            aterm = cost * (2 * usq * sp_a + m * s_a)
            bterm = sint * (2 * usq * sp_b + m * s_b)
            dr_terms.append(umm1 * (aterm + bterm))
            dt_terms.append(m * um * (-s_a * sint + s_b * cost))

        poly_mgt0 = sum(poly_terms) if poly_terms else zero
        dr_mgt0 = sum(dr_terms) if dr_terms else zero
        dt_mgt0 = sum(dt_terms) if dt_terms else zero
        return s_m0, d_m0_du, poly_mgt0, dr_mgt0, dt_mgt0

    # -- interface ---------------------------------------------------------
    def _sigma(self, p, r2):
        return ForbesQbfs._conic_correction(self, p, r2)

    def sag(self, p, x, y):
        r2 = x**2 + y**2
        z_base = _conic_sag(p["radius"], p["conic"], x, y)
        z_base = jnp.where(jnp.isinf(p["radius"]), jnp.zeros_like(z_base),
                           z_base)
        rho = jnp.sqrt(r2 + 1e-12)
        u = rho / p["norm_radius"]
        theta = jnp.arctan2(y, jnp.where(rho < 1e-12, x + 1e-12, x))
        s_m0, _, s_mgt0, _, _ = self._series(p, u, theta)
        factor, _ = self._sigma(p, r2)
        usq = u * u
        departure = usq * (1 - usq) * factor * s_m0 + factor * s_mgt0
        S = jnp.where(u > 1, 0.0, departure)
        return z_base + S

    def sag_grad(self, p, x, y):
        r2 = x**2 + y**2
        rho = jnp.sqrt(r2 + 1e-12)
        base_x, base_y = _conic_sag_grad(p["radius"], p["conic"], x, y)
        nr = p["norm_radius"]
        u = rho / nr
        usq = u * u
        theta = jnp.arctan2(y, jnp.where(rho < 1e-12, x + 1e-12, x))
        s_m0, d_m0_du, s_mgt0, dr_mgt0, dt_mgt0 = self._series(p, u, theta)
        factor, dfactor_drho = self._sigma(p, r2)

        # m = 0 departure derivative (as Qbfs)
        dpref_drho = (2 * u - 4 * u**3) / nr
        dpoly_drho = d_m0_du / nr
        dS0 = (dpref_drho * factor * s_m0
               + (usq - usq**2) * dfactor_drho * s_m0
               + (usq - usq**2) * factor * dpoly_drho)
        # m > 0 departure derivative
        dSg_drho = dfactor_drho * s_mgt0 + factor * dr_mgt0 / nr
        dS_drho = jnp.where(u >= 1, 0.0, dS0 + dSg_drho)
        dS_dtheta = jnp.where(u >= 1, 0.0, factor * dt_mgt0)

        inv_rho = 1.0 / rho
        dfdx = base_x + dS_drho * x * inv_rho - dS_dtheta * y * inv_rho**2
        dfdy = base_y + dS_drho * y * inv_rho + dS_dtheta * x * inv_rho**2
        return dfdx, dfdy
