"""Zernike polynomial bases (fringe / noll / standard) and least-squares fit.

Rebuild of optiland/zernike/ (base.py:26, fit.py:33). Term (n, m) index maps
are computed host-side (static term count); radial polynomials evaluate as
unrolled Horner-style sums, and the fit is a single lstsq solve — all jittable
and differentiable.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["zernike_terms", "zernike_eval", "zernike_design_matrix",
           "ZernikeFit", "noll_indices", "fringe_indices", "standard_indices"]


def standard_indices(num_terms: int):
    """ANSI-standard ordering: j = (n(n+2)+m)/2."""
    out = []
    j = 0
    n = 0
    while len(out) < num_terms:
        for m in range(-n, n + 1, 2):
            out.append((n, m))
            j += 1
            if len(out) == num_terms:
                break
        n += 1
    return out


def noll_indices(num_terms: int):
    """Noll ordering (j starts at 1)."""
    out = []
    j = 1
    while len(out) < num_terms:
        n = 0
        j1 = j - 1
        while j1 > n:
            n += 1
            j1 -= n
        m = (-1) ** j * ((n % 2) + 2 * int((j1 + ((n + 1) % 2)) / 2.0))
        out.append((n, m))
        j += 1
    return out


def fringe_indices(num_terms: int):
    """Fringe (University of Arizona) ordering."""
    # generate candidates sorted by fringe index
    cands = []
    for n in range(0, 20):
        for m in range(-n, n + 1, 2):
            fringe = (1 + (n + abs(m)) / 2) ** 2 - 2 * abs(m) + (1 - np.sign(m)) / 2
            cands.append((fringe, n, m))
    cands.sort(key=lambda t: t[0])
    return [(n, m) for _, n, m in cands[:num_terms]]


_ORDERINGS = {"standard": standard_indices, "noll": noll_indices,
              "fringe": fringe_indices}


def zernike_terms(zernike_type: str, num_terms: int):
    return _ORDERINGS[zernike_type](num_terms)


def _radial_coeffs(n: int, m: int):
    """Coefficients of rho^(n-2k) in R_n^m."""
    m = abs(m)
    out = []
    for k in range((n - m) // 2 + 1):
        c = ((-1) ** k * math.factorial(n - k)
             / (math.factorial(k) * math.factorial((n + m) // 2 - k)
                * math.factorial((n - m) // 2 - k)))
        out.append((n - 2 * k, c))
    return out


def _norm_factor(zernike_type: str, n: int, m: int) -> float:
    """Normalization per basis convention (reference zernike/base.py)."""
    if zernike_type == "fringe":
        return 1.0
    if zernike_type == "noll":
        norm = math.sqrt(n + 1) if m == 0 else math.sqrt(2 * (n + 1))
        return norm
    if zernike_type == "standard":
        # ANSI standard: same normalization as Noll
        if m == 0:
            return math.sqrt(n + 1)
        return math.sqrt(2 * (n + 1))
    raise ValueError(zernike_type)


def zernike_eval(zernike_type: str, coeffs, rho, phi):
    """Sum of coeffs[j] * Z_j(rho, phi). Static num_terms = len(coeffs)."""
    terms = zernike_terms(zernike_type, len(coeffs))
    out = jnp.zeros_like(rho)
    for j, (n, m) in enumerate(terms):
        out = out + coeffs[j] * _single_term(zernike_type, n, m, rho, phi)
    return out


def _single_term(zernike_type, n, m, rho, phi):
    Rnm = jnp.zeros_like(rho)
    for p, c in _radial_coeffs(n, m):
        Rnm = Rnm + c * rho**p
    norm = _norm_factor(zernike_type, n, m)
    if m > 0:
        ang = jnp.cos(m * phi)
    elif m < 0:
        ang = jnp.sin(-m * phi)
    else:
        ang = jnp.ones_like(phi)
    return norm * Rnm * ang


def zernike_design_matrix(zernike_type: str, num_terms: int, rho, phi):
    """[N, num_terms] design matrix of basis values."""
    terms = zernike_terms(zernike_type, num_terms)
    cols = [_single_term(zernike_type, n, m, rho, phi) for (n, m) in terms]
    return jnp.stack(cols, axis=-1)


class ZernikeFit:
    """Least-squares Zernike fit of scattered (x, y, z) data
    (reference zernike/fit.py:33). x, y are normalized pupil coordinates."""

    def __init__(self, x, y, z, zernike_type: str = "fringe",
                 num_terms: int = 36):
        self.zernike_type = zernike_type
        self.num_terms = num_terms
        rho = jnp.sqrt(x**2 + y**2)
        phi = jnp.arctan2(y, x)
        A = zernike_design_matrix(zernike_type, num_terms, rho, phi)
        # precision pin (round-4 MXU audit): the lstsq's inner matmuls run
        # at the TPU MXU's bf16 default otherwise, corrupting low-order
        # coefficients at the ~1e-3 level on f32 inputs
        import jax
        with jax.default_matmul_precision("highest"):
            self.coeffs, *_ = jnp.linalg.lstsq(A, z, rcond=None)
        self._rho, self._phi, self._z = rho, phi, z

    def evaluate(self, rho, phi):
        return zernike_eval(self.zernike_type, self.coeffs, rho, phi)

    @property
    def residual_rms(self):
        fit = self.evaluate(self._rho, self._phi)
        return jnp.sqrt(jnp.mean((fit - self._z) ** 2))
