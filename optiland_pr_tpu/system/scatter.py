"""Surface scattering BSDFs (reference optiland/scatter.py:24-265).

Monte-Carlo perturbation of outgoing ray directions. Needs explicit PRNG keys
(JAX is functionally random); the trace threads a key through surfaces that
carry a BSDF.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float

__all__ = ["BSDFDef", "LambertianBSDF", "GaussianBSDF"]


def _orthonormal_basis(nx, ny, nz):
    """Two tangent vectors orthogonal to the normal."""
    # pick helper axis least aligned with n
    hx = jnp.where(jnp.abs(nx) < 0.9, 1.0, 0.0)
    hy = jnp.where(jnp.abs(nx) < 0.9, 0.0, 1.0)
    tx = ny * 0.0 - nz * hy
    ty = nz * hx - nx * 0.0
    tz = nx * hy - ny * hx
    mag = jnp.sqrt(tx**2 + ty**2 + tz**2)
    tx, ty, tz = tx / mag, ty / mag, tz / mag
    ux = ny * tz - nz * ty
    uy = nz * tx - nx * tz
    uz = nx * ty - ny * tx
    return (tx, ty, tz), (ux, uy, uz)


class BSDFDef:
    kind = "base"

    def default_params(self, **kw) -> dict:
        return {}

    def scatter(self, p, rays, nx, ny, nz, key):
        raise NotImplementedError


class LambertianBSDF(BSDFDef):
    """Cosine-weighted hemisphere scatter about the surface normal
    (reference scatter.py LambertianBSDF)."""

    kind = "lambertian"

    def scatter(self, p, rays, nx, ny, nz, key):
        n = rays.x.shape[-1]
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (n,), rays.x.dtype)
        u2 = jax.random.uniform(k2, (n,), rays.x.dtype)
        r = jnp.sqrt(u1)
        theta = 2 * jnp.pi * u2
        # align the hemisphere with the outgoing side (normal flipped along
        # the current propagation direction)
        sgn = jnp.sign(rays.L * nx + rays.M * ny + rays.N * nz)
        nxs, nys, nzs = nx * sgn, ny * sgn, nz * sgn
        (tx, ty, tz), (ux, uy, uz) = _orthonormal_basis(nxs, nys, nzs)
        a = r * jnp.cos(theta)
        b = r * jnp.sin(theta)
        c = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        L = a * tx + b * ux + c * nxs
        M = a * ty + b * uy + c * nys
        N = a * tz + b * uz + c * nzs
        return rays.replace(L=L, M=M, N=N)


class GaussianBSDF(BSDFDef):
    """Gaussian perturbation of the specular direction
    (reference scatter.py GaussianBSDF)."""

    kind = "gaussian"

    def __init__(self, sigma: float = 0.05):
        self._sigma = sigma

    def default_params(self, **kw) -> dict:
        return {"sigma": jnp.asarray(self._sigma, default_float())}

    def scatter(self, p, rays, nx, ny, nz, key):
        n = rays.x.shape[-1]
        k1, k2 = jax.random.split(key)
        sigma = p["sigma"]
        d1 = sigma * jax.random.normal(k1, (n,), rays.x.dtype)
        d2 = sigma * jax.random.normal(k2, (n,), rays.x.dtype)
        (tx, ty, tz), (ux, uy, uz) = _orthonormal_basis(rays.L, rays.M,
                                                        rays.N)
        L = rays.L + d1 * tx + d2 * ux
        M = rays.M + d1 * ty + d2 * uy
        N = rays.N + d1 * tz + d2 * uz
        mag = jnp.sqrt(L**2 + M**2 + N**2)
        return rays.replace(L=L / mag, M=M / mag, N=N / mag)
