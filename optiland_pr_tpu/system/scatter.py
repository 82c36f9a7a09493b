"""Surface scattering BSDFs (reference optiland/scatter.py:24-265).

The reference model perturbs the *specular* outgoing direction: express the
ray in a local (a, b, n) frame anchored on the surface normal, add a random
offset (uniform unit disk for Lambertian, 2-D Gaussian for Gaussian) to the
tangential components, and rebuild the normal component so the result is a
unit vector in the outgoing hemisphere; offsets that push the tangential
magnitude past 1 are rejection-sampled (reference scatter.py:65-111).

TPU design: the reference's per-ray ``while True`` rejection loop becomes a
fixed bank of K candidate draws per ray + first-valid selection (static
shapes, no host sync); the specular direction (zero offset, always valid) is
the terminal fallback. Needs explicit PRNG keys (JAX functional randomness);
the trace threads a key through surfaces that carry a BSDF.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float

__all__ = ["BSDFDef", "LambertianBSDF", "GaussianBSDF"]

_K_CANDIDATES = 8


def _scatter_basis(L, nx, ny, nz):
    """Local frame (a, b) tangent to the normal (reference scatter.py:86-97):
    a = normalize(n x arb), b = n x a, with arb = x-hat when L < 0.999 else
    y-hat (per-ray choice on the L direction cosine)."""
    use_x = L < 0.999
    # n x (1,0,0) = (0, nz, -ny);  n x (0,1,0) = (-nz, 0, nx)
    ax = jnp.where(use_x, 0.0, -nz)
    ay = jnp.where(use_x, nz, 0.0)
    az = jnp.where(use_x, -ny, nx)
    mag = jnp.sqrt(ax**2 + ay**2 + az**2)
    ax, ay, az = ax / mag, ay / mag, az / mag
    bx = ny * az - nz * ay
    by = nz * ax - nx * az
    bz = nx * ay - ny * ax
    return (ax, ay, az), (bx, by, bz)


def _apply_offsets(rays, nx, ny, nz, off_x, off_y):
    """Combine K candidate tangential offsets [K, n] with the specular
    direction; return the first candidate whose radicand is >= 0, falling
    back to the (always-valid) zero offset."""
    (ax, ay, az), (bx, by, bz) = _scatter_basis(rays.L, nx, ny, nz)
    ra = rays.L * ax + rays.M * ay + rays.N * az
    rb = rays.L * bx + rays.M * by + rays.N * bz
    # append the zero-offset fallback as candidate K
    zeros = jnp.zeros_like(off_x[:1])
    off_x = jnp.concatenate([off_x, zeros])
    off_y = jnp.concatenate([off_y, zeros])
    sx = ra[None, :] + off_x
    sy = rb[None, :] + off_y
    radicand = 1.0 - sx**2 - sy**2
    ok = radicand >= 0
    first = jnp.argmax(ok, axis=0)                      # first valid per ray
    idx = (first, jnp.arange(sx.shape[1]))
    sx1, sy1 = sx[idx], sy[idx]
    sz1 = jnp.sqrt(jnp.maximum(1.0 - sx1**2 - sy1**2, 0.0))
    L = sx1 * ax + sy1 * bx + sz1 * nx
    M = sx1 * ay + sy1 * by + sz1 * ny
    N = sx1 * az + sy1 * bz + sz1 * nz
    return rays.replace(L=L, M=M, N=N)


class BSDFDef:
    kind = "base"

    def default_params(self, **kw) -> dict:
        return {}

    def scatter(self, p, rays, nx, ny, nz, key):
        raise NotImplementedError


class LambertianBSDF(BSDFDef):
    """Uniform-unit-disk tangential offset of the specular direction
    (reference scatter.py:23-35 get_point_lambertian)."""

    kind = "lambertian"

    def scatter(self, p, rays, nx, ny, nz, key):
        n = rays.x.shape[-1]
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (_K_CANDIDATES, n), rays.x.dtype)
        u2 = jax.random.uniform(k2, (_K_CANDIDATES, n), rays.x.dtype)
        r = jnp.sqrt(u1)
        theta = 2 * jnp.pi * u2
        return _apply_offsets(rays, nx, ny, nz, r * jnp.cos(theta),
                              r * jnp.sin(theta))


class GaussianBSDF(BSDFDef):
    """2-D Gaussian tangential offset of the specular direction
    (reference scatter.py:37-53 get_point_gaussian)."""

    kind = "gaussian"

    def __init__(self, sigma: float = 0.05):
        self._sigma = sigma

    def default_params(self, **kw) -> dict:
        return {"sigma": jnp.asarray(self._sigma, default_float())}

    def scatter(self, p, rays, nx, ny, nz, key):
        n = rays.x.shape[-1]
        k1, k2 = jax.random.split(key)
        sigma = p["sigma"]
        dx = sigma * jax.random.normal(k1, (_K_CANDIDATES, n), rays.x.dtype)
        dy = sigma * jax.random.normal(k2, (_K_CANDIDATES, n), rays.x.dtype)
        return _apply_offsets(rays, nx, ny, nz, dx, dy)
