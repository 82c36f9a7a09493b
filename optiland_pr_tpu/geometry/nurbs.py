"""NURBS freeform surfaces with parametric Newton ray intersection.

Reference: optiland/geometries/nurbs/ (nurbs_geometry.py:29, 932 LoC +
basis/fitting modules), following W. Martin et al., "Practical ray tracing of
trimmed NURBS surfaces" (two-plane Newton in (u, v)).

TPU-first formulation: degrees and control-net shape are static; knots,
control points, and weights live in the parameter pytree (the reference's
NURBS optimization variables). The Cox-de Boor recursion unrolls over the
static degree; per-ray knot spans are found with ``searchsorted``; the (u, v)
Newton runs on stop-gradient values with a final differentiable step (same
implicit-gradient pattern as geometry/base.newton_distance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import default_float
from ..core.safe_math import safe_div
from .base import Geometry

__all__ = ["NurbsGeometry"]


def _find_span(knots, degree, n_ctrl, t):
    """Knot span index for clamped knot vectors (NURBS book A2.1)."""
    # valid spans: degree .. n_ctrl-1
    span = jnp.searchsorted(knots, t, side="right") - 1
    return jnp.clip(span, degree, n_ctrl - 1)


def _basis_funs(knots, degree, span, t):
    """The degree+1 nonzero basis functions at t (NURBS book A2.2),
    vectorized over rays; returns [..., degree+1]."""
    N = [jnp.ones_like(t)]
    left = []
    right = []
    for j in range(1, degree + 1):
        left.append(t - knots[span + 1 - j])
        right.append(knots[span + j] - t)
        saved = jnp.zeros_like(t)
        Nj = []
        for r in range(j):
            denom = right[r] + left[j - r - 1]
            temp = safe_div(N[r], denom)
            Nj.append(saved + right[r] * temp)
            saved = left[j - r - 1] * temp
        Nj.append(saved)
        N = Nj
    return jnp.stack(N, axis=-1)


def _basis_funs_der(knots, degree, span, t):
    """(basis, d basis/dt) via first-order finite recursion (exact): compute
    basis of degree and degree-1; derivative N'_{i,p} = p*(N_{i,p-1}/(u_{i+p}-u_i)
    - N_{i+1,p-1}/(u_{i+p+1}-u_{i+1}))."""
    Np = _basis_funs(knots, degree, span, t)
    if degree == 0:
        return Np, jnp.zeros_like(Np)
    Nm = _basis_funs(knots, degree - 1, span, t)  # uses same span (clamped)
    ders = []
    for r in range(degree + 1):
        i = span - degree + r
        left_num = Nm[..., r - 1] if r - 1 >= 0 else jnp.zeros_like(t)
        d1 = knots[i + degree] - knots[i]
        term1 = safe_div(left_num, d1)
        right_num = Nm[..., r] if r <= degree - 1 else jnp.zeros_like(t)
        d2 = knots[i + degree + 1] - knots[i + 1]
        term2 = safe_div(right_num, d2)
        ders.append(degree * (term1 - term2))
    return Np, jnp.stack(ders, axis=-1)


class NurbsGeometry(Geometry):
    """Rational B-spline surface S(u, v) in 3-D.

    Static: (u_degree, v_degree, n_u, n_v). Params: ``control_points``
    [3, n_u, n_v], ``weights`` [n_u, n_v], ``u_knots``, ``v_knots``.
    """

    kind = "nurbs"
    is_symmetric = False

    def __init__(self, n_u: int, n_v: int, u_degree: int = 3,
                 v_degree: int = 3, newton_iters: int = 30):
        self.n_u = int(n_u)
        self.n_v = int(n_v)
        self.p = min(int(u_degree), self.n_u - 1)
        self.q = min(int(v_degree), self.n_v - 1)
        self.newton_iters = int(newton_iters)

    # -- schema ------------------------------------------------------------
    def _clamped_knots(self, n_ctrl, degree, dt):
        inner = jnp.linspace(0.0, 1.0, n_ctrl - degree + 1, dtype=dt)
        return jnp.concatenate([jnp.zeros(degree, dt), inner,
                                jnp.ones(degree, dt)])

    def default_params(self, radius=jnp.inf, conic=0.0, control_points=None,
                       weights=None, u_knots=None, v_knots=None, **kw):
        dt = default_float()
        if control_points is None:
            # flat unit patch
            xs = jnp.linspace(-1, 1, self.n_u, dtype=dt)
            ys = jnp.linspace(-1, 1, self.n_v, dtype=dt)
            X, Y = jnp.meshgrid(xs, ys, indexing="ij")
            control_points = jnp.stack([X, Y, jnp.zeros_like(X)])
        control_points = jnp.asarray(control_points, dt)
        weights = jnp.ones((self.n_u, self.n_v), dt) if weights is None \
            else jnp.asarray(weights, dt)
        u_knots = self._clamped_knots(self.n_u, self.p, dt) \
            if u_knots is None else jnp.asarray(u_knots, dt)
        v_knots = self._clamped_knots(self.n_v, self.q, dt) \
            if v_knots is None else jnp.asarray(v_knots, dt)
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "control_points": control_points, "weights": weights,
                "u_knots": u_knots, "v_knots": v_knots}

    # -- evaluation --------------------------------------------------------
    def evaluate(self, prm, u, v):
        """S(u,v) -> (x, y, z) plus partials (Su, Sv)."""
        P = prm["control_points"]
        W = prm["weights"]
        su = _find_span(prm["u_knots"], self.p, self.n_u, u)
        sv = _find_span(prm["v_knots"], self.q, self.n_v, v)
        Nu, dNu = _basis_funs_der(prm["u_knots"], self.p, su, u)
        Nv, dNv = _basis_funs_der(prm["v_knots"], self.q, sv, v)

        # gather the (p+1)x(q+1) active control points per ray
        iu = su[..., None] - self.p + jnp.arange(self.p + 1)   # [..., p+1]
        iv = sv[..., None] - self.q + jnp.arange(self.q + 1)

        Wg = W[iu[..., :, None], iv[..., None, :]]             # [..., p+1, q+1]
        Pg = P[:, iu[..., :, None], iv[..., None, :]]          # [3, ..., p+1, q+1]

        def tensor(Bu, Bv):
            # sum_ij Bu_i Bv_j (w_ij, w_ij * P_ij)
            BB = Bu[..., :, None] * Bv[..., None, :]
            w = jnp.sum(BB * Wg, axis=(-2, -1))
            pw = jnp.sum(BB * Wg * Pg, axis=(-2, -1))
            return w, pw

        w0, pw0 = tensor(Nu, Nv)
        wu, pwu = tensor(dNu, Nv)
        wv, pwv = tensor(Nu, dNv)

        S = pw0 / w0
        Su = (pwu - S * wu) / w0
        Sv = (pwv - S * wv) / w0
        return S, Su, Sv

    # -- (u, v) solves -----------------------------------------------------
    def _solve_uv_for_xy(self, prm, x, y):
        """Newton in (u, v) for S_xy(u, v) = (x, y) on stop-grad values."""
        prm0, x0, y0 = jax.tree_util.tree_map(lax.stop_gradient, (prm, x, y))

        def body(i, uv):
            u, v = uv
            S, Su, Sv = self.evaluate(prm0, u, v)
            rx = S[0] - x0
            ry = S[1] - y0
            a, b = Su[0], Sv[0]
            c, d = Su[1], Sv[1]
            det = a * d - b * c
            du = safe_div(d * rx - b * ry, det)
            dv = safe_div(-c * rx + a * ry, det)
            u = jnp.clip(u - du, 0.0, 1.0)
            v = jnp.clip(v - dv, 0.0, 1.0)
            return u, v

        u = jnp.full_like(x0, 0.5)
        v = jnp.full_like(y0, 0.5)
        u, v = lax.fori_loop(0, self.newton_iters, body, (u, v))
        return u, v

    def sag(self, p, x, y):
        u, v = self._solve_uv_for_xy(p, x, y)
        # differentiable final evaluation (implicit-gradient for z(x, y)):
        # one live Newton step in (u, v) then evaluate z
        S, Su, Sv = self.evaluate(p, u, v)
        rx = S[0] - x
        ry = S[1] - y
        a, b = Su[0], Sv[0]
        c, d = Su[1], Sv[1]
        det = a * d - b * c
        du = safe_div(d * rx - b * ry, det)
        dv = safe_div(-c * rx + a * ry, det)
        z = S[2] - Su[2] * du - Sv[2] * dv
        return z

    def sag_grad(self, p, x, y):
        u, v = self._solve_uv_for_xy(p, x, y)
        S, Su, Sv = self.evaluate(p, u, v)
        # dz/dx = (Su[2] * d - Sv[2] * c') via inverse of the xy Jacobian
        a, b = Su[0], Sv[0]
        c, d = Su[1], Sv[1]
        det = a * d - b * c
        dzdx = safe_div(Su[2] * d - Sv[2] * c, det)
        dzdy = safe_div(-Su[2] * b + Sv[2] * a, det)
        return dzdx, dzdy

    def normal(self, p, x, y):
        """Unit normal from the cross product of the surface partials,
        oriented with the (dfdx, dfdy, -1) convention."""
        dzdx, dzdy = self.sag_grad(p, x, y)
        from .base import normalize_normal
        return normalize_normal(dzdx, dzdy)

    # -- ray intersection --------------------------------------------------
    def distance(self, p, x, y, z, L, M, N):
        """Two-plane Newton (Martin et al.): find (u, v) with S(u, v) on the
        ray, then t from projection onto the ray direction."""
        args = (p, x, y, z, L, M, N)
        p0, x0, y0, z0, L0, M0, N0 = jax.tree_util.tree_map(
            lax.stop_gradient, args)

        # two planes orthogonal to the ray (reference nurbs_geometry.py:726+)
        mask = jnp.logical_and(L0 > M0, L0 > N0)
        n1x = jnp.where(mask, safe_div(M0, jnp.sqrt(L0**2 + M0**2)), 0.0)
        n1y = jnp.where(mask, safe_div(-L0, jnp.sqrt(L0**2 + M0**2)),
                        safe_div(N0, jnp.sqrt(N0**2 + M0**2)))
        n1z = jnp.where(mask, 0.0, safe_div(-M0, jnp.sqrt(N0**2 + M0**2)))
        # n2 = n1 x d
        n2x = n1y * N0 - n1z * M0
        n2y = n1z * L0 - n1x * N0
        n2z = n1x * M0 - n1y * L0
        d1 = -(n1x * x0 + n1y * y0 + n1z * z0)
        d2 = -(n2x * x0 + n2y * y0 + n2z * z0)

        def residual(prm, u, v):
            S, Su, Sv = self.evaluate(prm, u, v)
            r1 = n1x * S[0] + n1y * S[1] + n1z * S[2] + d1
            r2 = n2x * S[0] + n2y * S[1] + n2z * S[2] + d2
            j11 = n1x * Su[0] + n1y * Su[1] + n1z * Su[2]
            j12 = n1x * Sv[0] + n1y * Sv[1] + n1z * Sv[2]
            j21 = n2x * Su[0] + n2y * Su[1] + n2z * Su[2]
            j22 = n2x * Sv[0] + n2y * Sv[1] + n2z * Sv[2]
            return S, r1, r2, j11, j12, j21, j22

        def body(i, uv):
            u, v = uv
            S, r1, r2, j11, j12, j21, j22 = residual(p0, u, v)
            det = j11 * j22 - j12 * j21
            du = safe_div(j22 * r1 - j12 * r2, det)
            dv = safe_div(-j21 * r1 + j11 * r2, det)
            return (jnp.clip(u - du, 0.0, 1.0), jnp.clip(v - dv, 0.0, 1.0))

        u = jnp.full_like(x0, 0.5)
        v = jnp.full_like(y0, 0.5)
        u, v = lax.fori_loop(0, self.newton_iters, body, (u, v))

        # differentiable t from the converged parametric point
        S, Su, Sv = self.evaluate(p, u, v)
        t = (S[0] - x) * L + (S[1] - y) * M + (S[2] - z) * N
        return t
