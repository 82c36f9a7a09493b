"""NURBS surface fitting: least-squares control-net approximation.

Reference: optiland/geometries/nurbs/nurbs_fitting.py:19 (``approximate_surface``,
The NURBS Book 2nd ed., Algorithm A9.7) and nurbs_geometry.py:828-885
(``fit_surface`` / ``_standard_surface`` / ``_plane_surface``).

This is host-side *build-time* code: it runs once (NumPy) to produce the
control net, which then lives in the differentiable parameter pytree consumed
by :class:`~optiland_pr_tpu.geometry.nurbs.NurbsGeometry`. Keeping the fit
outside jit follows the repo's static-structure/numeric-params split.

Beyond the reference (which fits only plane and sphere/conic bases), the
generic :func:`fit_nurbs_sag` accepts *any* sag callable — so every geometry
in the zoo can be converted to an optimizable NURBS freeform.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "approximate_surface",
    "fit_nurbs_sag",
    "nurbs_params_from_standard",
]


# -- basis / parametrization helpers (NURBS Book ch. 9) ----------------------

def basis_matrix(degree: int, knots, n_basis: int, params) -> np.ndarray:
    """Collocation matrix B[i, j] = N_{j,degree}(params[i]).

    Vectorized Cox-de Boor over all parameters at once (the reference builds
    this entry-by-entry with ``basis_function_one``, nurbs_fitting.py:48-54).
    Uses the half-open span convention with the clamped end fixed so that
    N_{n-1,p}(u_max) = 1, matching the reference's A2.4 special cases.
    """
    kv = np.asarray(knots, dtype=float)
    u = np.asarray(params, dtype=float)
    m = len(kv) - 1
    span = np.clip(np.searchsorted(kv, u, side="right") - 1,
                   degree, n_basis - 1)
    N = (np.arange(m)[None, :] == span[:, None]).astype(float)
    uu = u[:, None]
    for k in range(1, degree + 1):
        nk = m - k
        j = np.arange(nk)
        d1 = kv[j + k] - kv[j]
        d2 = kv[j + k + 1] - kv[j + 1]
        a = np.where(d1 > 0, (uu - kv[j]) / np.where(d1 > 0, d1, 1.0), 0.0)
        b = np.where(d2 > 0, (kv[j + k + 1] - uu)
                     / np.where(d2 > 0, d2, 1.0), 0.0)
        N = a * N[:, :nk] + b * N[:, 1:nk + 1]
    return N[:, :n_basis]


def _params_curve(points: np.ndarray, centripetal: bool = False) -> np.ndarray:
    """Chord-length (or centripetal) parameters u_bar (Eq. 9.4-9.6).

    Reference: nurbs_fitting.py:167-198. ``points``: [n, dim].
    """
    d = np.linalg.norm(np.diff(points, axis=0), axis=1)
    if centripetal:
        d = np.sqrt(d)
    total = d.sum()
    uk = np.concatenate([[0.0], np.cumsum(d)]) / total
    return uk


def _params_surface(points: np.ndarray, centripetal: bool = False):
    """Averaged surface parameters (u_bar_k, v_bar_l) (NURBS Book pp. 366-7).

    Reference: nurbs_fitting.py:201-244. ``points``: [size_u, size_v, dim].
    """
    size_u, size_v = points.shape[:2]
    uk = np.mean([_params_curve(points[:, v], centripetal)
                  for v in range(size_v)], axis=0)
    vl = np.mean([_params_curve(points[u, :], centripetal)
                  for u in range(size_u)], axis=0)
    return uk, vl


def _knot_vector(degree: int, num_dpts: int, num_cpts: int,
                 params: np.ndarray) -> np.ndarray:
    """Averaging knot vector for approximation (Eq. 9.68/9.69).

    Reference: nurbs_fitting.py:137-164.
    """
    kv = [0.0] * (degree + 1)
    d = float(num_dpts) / float(num_cpts - degree)
    for j in range(1, num_cpts - degree):
        i = int(j * d)
        alpha = (j * d) - i
        kv.append((1.0 - alpha) * params[i - 1] + alpha * params[i])
    kv += [1.0] * (degree + 1)
    return np.asarray(kv)


def _fit_direction(data: np.ndarray, degree: int, num_cpts: int,
                   kv: np.ndarray, params: np.ndarray) -> np.ndarray:
    """One directional pass of A9.7: fix the two end rows, least-squares the
    interior control points along axis 0. ``data``: [n_pts, ..., dim]."""
    B = basis_matrix(degree, kv, num_cpts, params)        # [n_pts, num_cpts]
    N = B[1:-1, 1:-1]                                     # interior block
    ext = np.moveaxis(np.stack([B[1:-1, 0], B[1:-1, -1]]), 1, 0)  # [n-2, 2]
    shape_tail = data.shape[1:]
    R = (data[1:-1]
         - ext[:, 0].reshape(-1, *([1] * len(shape_tail))) * data[0]
         - ext[:, 1].reshape(-1, *([1] * len(shape_tail))) * data[-1])
    rhs = np.tensordot(N.T, R, axes=1).reshape(num_cpts - 2, -1)
    X = np.linalg.solve(N.T @ N, rhs).reshape(num_cpts - 2, *shape_tail)
    return np.concatenate([data[:1], X, data[-1:]], axis=0)


def approximate_surface(points, size_u: int, size_v: int,
                        degree_u: int = 3, degree_v: int = 3, *,
                        ctrlpts_size_u: int | None = None,
                        ctrlpts_size_v: int | None = None,
                        centripetal: bool = False):
    """Least-squares B-spline surface approximation (A9.7).

    Reference: nurbs_fitting.py:19-134. ``points`` may be a flat
    [size_u*size_v, dim] list in the reference's v-fastest ordering or an
    array [size_u, size_v, dim].

    Returns ``(ctrlpts [ncu, ncv, dim], kv_u, kv_v)``.
    """
    pts = np.asarray(points, dtype=float)
    if pts.ndim == 2:
        pts = pts.reshape(size_u, size_v, -1)
    ncu = ctrlpts_size_u or size_u - 1
    ncv = ctrlpts_size_v or size_v - 1

    uk, vl = _params_surface(pts, centripetal)
    kv_u = _knot_vector(degree_u, size_u, ncu, uk)
    kv_v = _knot_vector(degree_v, size_v, ncv, vl)

    tmp = _fit_direction(pts, degree_u, ncu, kv_u, uk)       # [ncu, size_v, d]
    tmp = np.swapaxes(tmp, 0, 1)                             # [size_v, ncu, d]
    ctrl = _fit_direction(tmp, degree_v, ncv, kv_v, vl)      # [ncv, ncu, d]
    ctrl = np.swapaxes(ctrl, 0, 1)                           # [ncu, ncv, d]
    return ctrl, kv_u, kv_v


# -- sag-grid front ends ------------------------------------------------------

def fit_nurbs_sag(sag_fn, norm_x: float, norm_y: float, *,
                  size_u: int = 32, size_v: int = 32,
                  degree_u: int = 3, degree_v: int = 3,
                  x_center: float = 0.0, y_center: float = 0.0,
                  ctrlpts_size_u: int | None = None,
                  ctrlpts_size_v: int | None = None):
    """Fit a NURBS control net to any sag function z = f(x, y).

    Generalizes the reference's ``fit_surface`` (nurbs_geometry.py:828-838) to
    arbitrary sag callables. Returns the kwargs dict expected by
    ``NurbsGeometry.default_params`` / ``Optic.add_surface(surface_type=
    "nurbs", ...)``: control_points [3, ncu, ncv], weights, u_knots, v_knots.
    """
    x = np.linspace(x_center - norm_x, x_center + norm_x, size_u)
    y = np.linspace(y_center - norm_y, y_center + norm_y, size_v)
    X, Y = np.meshgrid(x, y, indexing="ij")          # [size_u, size_v]
    Z = np.asarray(sag_fn(X, Y), dtype=float)
    pts = np.stack([X, Y, Z], axis=-1)
    ctrl, kv_u, kv_v = approximate_surface(
        pts, size_u, size_v, degree_u, degree_v,
        ctrlpts_size_u=ctrlpts_size_u, ctrlpts_size_v=ctrlpts_size_v)
    ncu, ncv = ctrl.shape[:2]
    return {
        "control_points": np.moveaxis(ctrl, -1, 0),   # [3, ncu, ncv]
        "weights": np.ones((ncu, ncv)),
        "u_knots": kv_u,
        "v_knots": kv_v,
        "u_degree": degree_u,
        "v_degree": degree_v,
    }


def nurbs_params_from_standard(radius: float, conic: float = 0.0, *,
                               norm_x: float = 1.0, norm_y: float = 1.0,
                               size_u: int = 32, size_v: int = 32,
                               x_center: float = 0.0, y_center: float = 0.0,
                               degree_u: int = 3, degree_v: int = 3):
    """NURBS net for a sphere/conic or plane base surface.

    Mirrors the reference's ``_standard_surface`` (fit, nurbs_geometry.py:
    840-885) and ``_plane_surface`` (exact flat net, :887-932).
    """
    if np.isinf(radius):
        x = np.linspace(x_center - norm_x, x_center + norm_x, size_u)
        y = np.linspace(y_center - norm_y, y_center + norm_y, size_v)
        X, Y = np.meshgrid(x, y, indexing="ij")
        ctrl = np.stack([X, Y, np.zeros_like(X)])
        ku = np.concatenate([np.zeros(degree_u),
                             np.linspace(0, 1, size_u - degree_u + 1),
                             np.ones(degree_u)])
        kvv = np.concatenate([np.zeros(degree_v),
                              np.linspace(0, 1, size_v - degree_v + 1),
                              np.ones(degree_v)])
        return {"control_points": ctrl, "weights": np.ones((size_u, size_v)),
                "u_knots": ku, "v_knots": kvv,
                "u_degree": degree_u, "v_degree": degree_v}

    def sag(x, y):
        r2 = x ** 2 + y ** 2
        return r2 / (radius * (1.0 + np.sqrt(
            1.0 - (1.0 + conic) * r2 / radius ** 2)))

    return fit_nurbs_sag(sag, norm_x, norm_y, size_u=size_u, size_v=size_v,
                         degree_u=degree_u, degree_v=degree_v,
                         x_center=x_center, y_center=y_center)
