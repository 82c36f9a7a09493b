"""Geometry protocol and the shared ray-surface intersection machinery.

A geometry is a *static* object (type + structural config like coefficient
count); all numeric values live in a per-surface parameter dict so that
``jax.grad``/``vmap`` flow through radii, conics, and freeform coefficients.

Intersection redesign vs the reference (optiland/geometries/newton_raphson.py:119-168):
- the Newton iteration runs device-side under ``lax.while_loop`` with all inputs
  ``stop_gradient``-ed (no Python-loop host sync, no autodiff tape through the
  iterations),
- gradients are recovered with one final *differentiable* Newton step at the
  converged root — the implicit-function-theorem correction, which is exact at
  f(t*)=0 and costs O(1) memory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.safe_math import safe_div

__all__ = ["Geometry", "conic_distance", "newton_distance", "normalize_normal"]


def normalize_normal(dfdx, dfdy):
    """Build the unit surface normal from sag partials, with the reference's
    df/dz=-1 convention (optiland/geometries/standard.py:142-167)."""
    mag = jnp.sqrt(dfdx**2 + dfdy**2 + 1.0)
    return dfdx / mag, dfdy / mag, -1.0 / mag


def conic_distance(radius, conic, x, y, z, L, M, N):
    """Closed-form ray/conic intersection, root closest to the vertex plane
    (reference optiland/geometries/standard.py:89-140). Handles infinite radius
    (plane) and the degenerate a==0 case branchlessly.

    Algebraically identical to the reference quadratic but conditioned for
    low precision (the reference form loses ~4 digits in f32 at telescope
    scales, e.g. Hubble's 5e3-mm gaps):
    1. the ray is pre-advanced to the vertex plane so the coefficients are
       sag-scale rather than z^2-scale;
    2. the two roots are paired citardauq-style (near root = c/q with
       q = -(b/2 + sign(b/2)*sqrt(disc))), stable when a -> 0 — a
       near-parabolic mirror (conic ~ -1) makes the quadratic degenerate."""
    is_plane = jnp.isinf(radius)
    R = jnp.where(is_plane, 1.0, radius)  # guard against inf*0 NaNs

    # pre-advance to the vertex plane; rays near-perpendicular to the axis
    # (|N| ~ 0) skip the shift — the general coefficients below stay correct
    # either way, the shift is purely a conditioning move
    t0 = jnp.where(jnp.abs(N) > 1e-8, safe_div(-z, N), 0.0)
    x0 = x + t0 * L
    y0 = y + t0 * M
    z0 = z + t0 * N                       # == 0 unless the shift was skipped

    a = conic * N**2 + L**2 + M**2 + N**2
    bh = conic * N * z0 + L * x0 + M * y0 + N * z0 - N * R   # half-b
    c = conic * z0**2 - 2 * R * z0 + x0**2 + y0**2 + z0**2

    d = bh**2 - a * c
    ok = d >= 0
    # Double-where pattern: (1) sqrt's argument is substituted where invalid
    # so its gradient stays finite (sqrt(max(d,0)) would give inf at the clamp
    # and inf*0=NaN in reverse-mode); (2) NaN is injected ONLY at the final
    # output so no discarded branch ever carries NaN into arithmetic.
    sqrt_d = jnp.sqrt(jnp.where(ok, d, 1.0))

    # sign-of-bh pairing, with sign(0) := 1 (jnp.sign(0)=0 would zero q)
    q = -(bh + jnp.where(bh >= 0, 1.0, -1.0) * sqrt_d)
    t_far = safe_div(q, a)                # +-inf-safe when a ~ 0
    t_near = safe_div(c, q)

    # root closest to the vertex plane (z0 == 0 unless the shift was skipped)
    tq = jnp.where(jnp.abs(z0 + t_near * N) <= jnp.abs(z0 + t_far * N),
                   t_near, t_far)

    # degenerate quadratic (a == 0): linear solution c/(-2*bh) == t_near
    tq = jnp.where(a == 0, t_near, tq)
    t = t0 + jnp.where(ok, tq, jnp.nan)   # NaN: ray misses the conic entirely

    # plane: z + t*N = 0
    return jnp.where(is_plane, t0, t)


def newton_distance(geom: "Geometry", p, x, y, z, L, M, N,
                    tol: float = 1e-10, max_iter: int = 100):
    """Newton-Raphson ray-surface intersection with a conic warm start and
    implicit-diff gradients.

    The root search runs on stop-gradient values; one final live Newton step
    recovers exact IFT gradients w.r.t. both surface params and ray state.
    """
    args = (p, x, y, z, L, M, N)
    p0, x0, y0, z0, L0, M0, N0 = jax.tree_util.tree_map(lax.stop_gradient, args)

    t_init = conic_distance(p0["radius"], p0["conic"], x0, y0, z0, L0, M0, N0)
    # NaN warm starts (conic miss) would never converge; restart those at 0.
    t_init = jnp.where(jnp.isnan(t_init), jnp.zeros_like(t_init), t_init)

    def f_and_df(t, pp, xx, yy, zz, LL, MM, NN):
        xi = xx + t * LL
        yi = yy + t * MM
        zi = zz + t * NN
        f = geom.sag(pp, xi, yi) - zi
        dfdx, dfdy = geom.sag_grad(pp, xi, yi)
        df = dfdx * LL + dfdy * MM - NN
        return f, df

    def cond(state):
        i, t, err = state
        return jnp.logical_and(i < max_iter, err > tol)

    def body(state):
        i, t, _ = state
        f, df = f_and_df(t, p0, x0, y0, z0, L0, M0, N0)
        t_new = t - safe_div(f, df)
        f_new, _ = f_and_df(t_new, p0, x0, y0, z0, L0, M0, N0)
        # Ignore non-finite residuals (rays that miss entirely) in the
        # convergence check so they don't stall the loop.
        err = jnp.max(jnp.where(jnp.isfinite(f_new), jnp.abs(f_new), 0.0))
        return i + 1, t_new, err

    _, t_star, _ = lax.while_loop(cond, body, (jnp.array(0), t_init,
                                               jnp.array(jnp.inf,
                                                         dtype=t_init.dtype)))

    # One differentiable Newton step at the (non-differentiable) root: the
    # primal is unchanged to O(f^2) and the tangent/cotangent is the exact
    # implicit-function-theorem derivative dt/dtheta = -f_theta / f_t.
    f, df = f_and_df(lax.stop_gradient(t_star), p, x, y, z, L, M, N)
    return lax.stop_gradient(t_star) - safe_div(f, df)


class Geometry:
    """Base geometry. Subclasses define ``kind``, ``sag`` and ``sag_grad``.

    Numeric state lives in the per-surface param dict (``default_params``
    defines the schema); structural state (coefficient counts, grid shapes)
    lives on the instance and is static under jit.
    """

    kind: str = "base"
    is_symmetric: bool = False
    # host-side structural hints stamped by Optic.build() (None = unknown,
    # fall back to a concrete param check): inf-ness of the vertex radius is
    # static, and reading it back from device params poisons the axon
    # dispatch path (utils/hostvals.py)
    radius_is_inf: bool | None = None
    radius_rot_is_inf: bool | None = None

    # --- schema -----------------------------------------------------------
    def default_params(self, **kw) -> dict:
        raise NotImplementedError

    # --- math -------------------------------------------------------------
    def sag(self, p, x, y):
        raise NotImplementedError

    def sag_grad(self, p, x, y):
        """(d sag/dx, d sag/dy). Default: forward-mode autodiff of ``sag``."""
        _, dfdx = jax.jvp(lambda xx: self.sag(p, xx, y), (x,),
                          (jnp.ones_like(x),))
        _, dfdy = jax.jvp(lambda yy: self.sag(p, x, yy), (y,),
                          (jnp.ones_like(y),))
        return dfdx, dfdy

    def normal(self, p, x, y):
        dfdx, dfdy = self.sag_grad(p, x, y)
        return normalize_normal(dfdx, dfdy)

    def distance(self, p, x, y, z, L, M, N):
        return newton_distance(self, p, x, y, z, L, M, N)

    def __repr__(self):
        return f"{type(self).__name__}()"
