"""Ray bundles as JAX pytrees (struct-of-arrays).

TPU-first redesign of the reference's mutable ``RealRays`` object
(optiland/rays/real_rays.py:22-613): a frozen dataclass of 1-D arrays registered
as a pytree, with *pure* functions for every ray operation. This makes the trace
jittable, vmappable over system batches, and shardable along the ray axis.

Conventions preserved from the reference:
- direction cosines (L, M, N) with L^2+M^2+N^2 = 1,
- vignetted/blocked rays are masked by zeroing ``intensity`` (mask-don't-drop),
- ``opd`` accumulates |t * n| per propagation step (standard_surface.py:218).

Polarization (reference rays/polarized_rays.py) adds a per-ray 3x3 matrix ``p``;
here it is an optional leaf (None for unpolarized bundles).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import default_float
from .safe_math import safe_div

__all__ = ["Rays", "new_rays", "propagate", "refract", "reflect", "normalize",
           "clip", "align_normal"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "y", "z", "L", "M", "N", "intensity", "wavelength",
                      "opd", "p"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Rays:
    """A bundle of real rays. All leaves are arrays broadcastable to [..., n].

    ``p`` is the per-ray 3x3 polarization matrix chain ([..., n, 3, 3]) or
    None for unpolarized bundles (reference rays/polarized_rays.py:17-153).
    """
    x: jax.Array
    y: jax.Array
    z: jax.Array
    L: jax.Array
    M: jax.Array
    N: jax.Array
    intensity: jax.Array
    wavelength: jax.Array
    opd: jax.Array
    p: jax.Array | None = None

    @property
    def num_rays(self) -> int:
        return self.x.shape[-1]

    def replace(self, **kw) -> "Rays":
        return dataclasses.replace(self, **kw)


def new_rays(x, y, z, L, M, N, intensity=1.0, wavelength=0.55, opd=None,
             polarized: bool = False, dtype=None) -> Rays:
    """Build a ray bundle, broadcasting scalars to the common shape."""
    dtype = dtype or default_float()
    arrs = [jnp.asarray(a, dtype) for a in (x, y, z, L, M, N, intensity,
                                            wavelength)]
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    x, y, z, L, M, N, intensity, wavelength = [jnp.broadcast_to(a, shape)
                                               for a in arrs]
    opd = jnp.zeros(shape, dtype) if opd is None else jnp.broadcast_to(
        jnp.asarray(opd, dtype), shape)
    p = None
    if polarized:
        eye = jnp.eye(3, dtype=dtype)
        p = jnp.broadcast_to(eye, shape + (3, 3))
    return Rays(x, y, z, L, M, N, intensity, wavelength, opd, p)


def propagate(rays: Rays, t, alpha=None) -> Rays:
    """Straight-line propagation by distance t (reference
    propagation/homogeneous.py:30-56). ``alpha`` is the absorption coefficient
    4*pi*k/lambda (per um); when given, intensity decays exp(-alpha * t * 1e3)
    with t in mm."""
    out = rays.replace(
        x=rays.x + t * rays.L,
        y=rays.y + t * rays.M,
        z=rays.z + t * rays.N,
    )
    if alpha is not None:
        out = out.replace(intensity=out.intensity * jnp.exp(-alpha * t * 1e3))
    return out


def normalize(rays: Rays) -> Rays:
    mag = jnp.sqrt(rays.L**2 + rays.M**2 + rays.N**2)
    return rays.replace(L=rays.L / mag, M=rays.M / mag, N=rays.N / mag)


def clip(rays: Rays, blocked) -> Rays:
    """Zero the intensity of rays where ``blocked`` is True (mask-don't-drop;
    reference rays/real_rays.py:132-139 zeroes where the keep-condition fails)."""
    return rays.replace(intensity=jnp.where(blocked,
                                            jnp.zeros_like(rays.intensity),
                                            rays.intensity))


def align_normal(L, M, N, nx, ny, nz):
    """Flip the surface normal to oppose the incident direction; returns the
    aligned normal and |cos(theta_i)| (reference rays/real_rays.py:511-547)."""
    dot = L * nx + M * ny + N * nz
    sgn = jnp.sign(dot)
    return nx * sgn, ny * sgn, nz * sgn, jnp.abs(dot)


def refract(rays: Rays, nx, ny, nz, n1, n2):
    """Vector Snell refraction (reference rays/real_rays.py:141-163).

    Returns (rays, ok): TIR rays keep a *finite* direction (the clamped
    grazing solution) and are flagged invalid via ``ok``; the trace injects
    NaN at the end for reference parity. Keeping internals finite is what
    keeps reverse-mode gradients clean when rays are lost (0 * NaN = NaN
    otherwise — see docs/architecture.md).
    """
    nx, ny, nz, dot = align_normal(rays.L, rays.M, rays.N, nx, ny, nz)
    u = n1 / n2
    disc = 1.0 - u**2 * (1.0 - dot**2)
    ok = disc >= 0
    root = jnp.sqrt(jnp.where(ok, disc, 0.0))
    tx = u * rays.L + nx * root - u * nx * dot
    ty = u * rays.M + ny * root - u * ny * dot
    tz = u * rays.N + nz * root - u * nz * dot
    return rays.replace(L=tx, M=ty, N=tz), ok


def reflect(rays: Rays, nx, ny, nz):
    """Mirror reflection (reference rays/real_rays.py:165-181).
    Returns (rays, ok) for interface symmetry with refract (always valid)."""
    nx, ny, nz, dot = align_normal(rays.L, rays.M, rays.N, nx, ny, nz)
    out = rays.replace(L=rays.L - 2 * dot * nx,
                       M=rays.M - 2 * dot * ny,
                       N=rays.N - 2 * dot * nz)
    return out, jnp.ones_like(rays.L, dtype=bool)


def grating_diffract(rays: Rays, nx, ny, nz, fx, fy, fz, m, d, n1, n2,
                     is_reflective: bool) -> Rays:
    """Closed-form grating diffraction for order ``m`` with period ``d``
    (reference rays/real_rays.py:183-498).

    The grating vector (fx,fy,fz) lies in the surface tangent plane. The
    tangential component of n1*k_in is augmented by m*lambda/d along the
    grating vector; the normal component is rebuilt from |k_out| = n2.
    """
    nxa, nya, nza, dot = align_normal(rays.L, rays.M, rays.N, nx, ny, nz)
    sgn = -1.0 if is_reflective else 1.0
    n2c = n2 * sgn if is_reflective else n2

    # wavelength in um, d in um: grating term per unit length
    lam = rays.wavelength
    g = m * lam / d

    # incident wavevector (scaled by n1)
    kx, ky, kz = n1 * rays.L, n1 * rays.M, n1 * rays.N
    kdotn = kx * nxa + ky * nya + kz * nza
    # tangential components + grating shift
    tx = kx - kdotn * nxa + g * fx
    ty = ky - kdotn * nya + g * fy
    tz = kz - kdotn * nza + g * fz
    t2 = tx**2 + ty**2 + tz**2
    disc = n2**2 - t2
    ok = disc >= 0
    kn = jnp.sqrt(jnp.where(ok, disc, 0.0))
    if is_reflective:
        kn = -kn
    Lx = (tx + kn * nxa) / n2c if is_reflective else (tx + kn * nxa) / n2
    Ly = (ty + kn * nya) / n2c if is_reflective else (ty + kn * nya) / n2
    Lz = (tz + kn * nza) / n2c if is_reflective else (tz + kn * nza) / n2
    out = rays.replace(L=Lx, M=Ly, N=Lz)
    return normalize(out), ok
