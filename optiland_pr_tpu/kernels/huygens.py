"""Pallas kernel for the Huygens-Fresnel diffraction integral.

Reference: optiland/psf/huygens_fresnel_strategies.py:64-173 — the reference's
ONLY JIT kernel (numba ``@njit(parallel=True, fastmath=True)`` over image
pixels) with a batched-torch alternative.

TPU design: the O(pixels x pupil) summation tiles the image axis over the
grid; each kernel instance holds its pixel tile's accumulators in VMEM and
loops over pupil-point chunks (also VMEM-resident), so HBM traffic is
O(pixels + pupil) instead of O(pixels x pupil). All VPU elementwise math
(sqrt, sin/cos) at f32.

An XLA fallback (`huygens_sum_xla`) chunked with `lax.map` serves CPU runs and
correctness A/B checks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["huygens_sum_xla", "huygens_sum_pallas", "huygens_fresnel_xla",
           "huygens_fresnel_ref"]


def huygens_fresnel_ref(px, py, pz, amp, opd, ix, iy, iz, k, Rp,
                        chunk: int = 4096):
    """Phase-re-referenced Huygens-Fresnel summation, f32-safe on TPU.

    Numerically equal to ``huygens_fresnel_xla`` in exact arithmetic, but the
    naive form evaluates cos(k*(opd + R)) at k*R ~ 1e6 rad, where the f32 ulp
    is ~0.1 rad — measured 10.9%% PSF error on TPU even for wavelength-scale
    aberrations (round-4 audit). Here:

    - all coordinates are shifted to the image-cloud centroid c (host f64),
      so device arrays carry only SMALL magnitudes,
    - the per-pupil residual phase phi_p = (k*(r0_p - opd_p)) mod 2pi, with
      r0_p = |p - c|, is computed on the HOST in f64 (it's a [P] array,
      outside the hot O(I*P) loop),
    - the per-pair distance enters only as the DIFFERENCE
      dr = r - r0 = (|t'|^2 - 2 t'.p') / (r + r0), cancellation-free,
    - the obliquity uses the reference convention nu = p/Rp (shift-applied
      to the numerator only; cos theta is shift-invariant).

    Measured f32-vs-f64 PSF error: 2.9e-6 (was 1.1e-1). Requires CONCRETE
    (non-traced) inputs — the analysis classes are eager, so the host
    round-trip is free.
    """
    import numpy as np
    pxh = np.asarray(px, np.float64)
    pyh = np.asarray(py, np.float64)
    pzh = np.asarray(pz, np.float64)
    opdh = np.asarray(opd, np.float64)
    cx = float(np.mean(np.asarray(ix, np.float64)))
    cy = float(np.mean(np.asarray(iy, np.float64)))
    cz = float(np.mean(np.asarray(iz, np.float64)))
    pxs = pxh - cx
    pys = pyh - cy
    pzs = pzh - cz
    r0 = np.sqrt(pxs * pxs + pys * pys + pzs * pzs)
    phi = np.mod(float(k) * (r0 - opdh), 2 * np.pi)
    dt = jnp.asarray(px).dtype
    pxs_d = jnp.asarray(pxs, dt)
    pys_d = jnp.asarray(pys, dt)
    pzs_d = jnp.asarray(pzs, dt)
    r0_d = jnp.asarray(r0, dt)
    pre = jnp.asarray(amp, dt) * jnp.cos(jnp.asarray(phi, dt))
    pim = jnp.asarray(amp, dt) * jnp.sin(jnp.asarray(phi, dt))
    nux = jnp.asarray(pxh / np.asarray(Rp, np.float64), dt)
    nuy = jnp.asarray(pyh / np.asarray(Rp, np.float64), dt)
    nuz = jnp.asarray(pzh / np.asarray(Rp, np.float64), dt)
    ixs = jnp.asarray(np.asarray(ix, np.float64) - cx, dt)
    iys = jnp.asarray(np.asarray(iy, np.float64) - cy, dt)
    izs = jnp.asarray(np.asarray(iz, np.float64) - cz, dt)

    n = ixs.shape[0]
    pad = (-n) % chunk
    tiles = tuple(jnp.pad(v, (0, pad)).reshape(-1, chunk)
                  for v in (ixs, iys, izs))

    def one_tile(t):
        tx, ty, tz = t
        dx = tx[:, None] - pxs_d[None, :]
        dy = ty[:, None] - pys_d[None, :]
        dz = tz[:, None] - pzs_d[None, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cos_t = (dx * nux[None, :] + dy * nuy[None, :]
                 + dz * nuz[None, :]) / r
        q = 0.5 * (1.0 + cos_t) / r
        t2 = (tx * tx + ty * ty + tz * tz)[:, None]
        dr = (t2 - 2.0 * (tx[:, None] * pxs_d[None, :]
                          + ty[:, None] * pys_d[None, :]
                          + tz[:, None] * pzs_d[None, :])) \
            / (r + r0_d[None, :])
        cr = jnp.cos(k * dr)
        sr = jnp.sin(k * dr)
        # (pre + i pim) * (cr + i sr) * q; total phase phi_p + k dr
        re = jnp.sum(q * (pre[None, :] * cr - pim[None, :] * sr), axis=1)
        im = jnp.sum(q * (pre[None, :] * sr + pim[None, :] * cr), axis=1)
        return re * re + im * im

    out = jax.lax.map(one_tile, tiles)
    return out.reshape(-1)[:n]


def huygens_fresnel_xla(px, py, pz, amp, opd, ix, iy, iz, k, Rp,
                        chunk: int = 4096):
    """Reference-exact Huygens-Fresnel summation
    (optiland/psf/huygens_fresnel_strategies.py:96-173):

    E(img) = sum_p amp_p * exp(-i k opd_p) * exp(i k R)/R * 0.5*(1+cos theta)

    with the obliquity normal taken as the pupil point over the sphere radius
    (nu = (u, v, w)/Rp, the reference's convention). px/py/pz/amp/opd: [P]
    exit-pupil-sphere samples (opd in mm); ix/iy/iz: [I] image points;
    returns |E|^2 [I]. Chunked over the image axis with lax.map so the
    [chunk, P] tile stays VMEM-resident on TPU.
    """
    n = ix.shape[0]
    pad = (-n) % chunk
    tiles = tuple(jnp.pad(v, (0, pad)).reshape(-1, chunk)
                  for v in (ix, iy, iz))
    nux = px / Rp
    nuy = py / Rp
    nuz = pz / Rp
    # pupil phase exp(-i k opd) folded into per-pupil re/im weights
    pre = amp * jnp.cos(k * opd)
    pim = -amp * jnp.sin(k * opd)

    def one_tile(t):
        tx, ty, tz = t
        dx = tx[:, None] - px[None, :]
        dy = ty[:, None] - py[None, :]
        dz = tz[:, None] - pz[None, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cos_t = (dx * nux[None, :] + dy * nuy[None, :]
                 + dz * nuz[None, :]) / r
        q = 0.5 * (1.0 + cos_t) / r
        cr, sr = jnp.cos(k * r), jnp.sin(k * r)
        # (pre + i pim) * (cr + i sr) * q
        re = jnp.sum(q * (pre[None, :] * cr - pim[None, :] * sr), axis=1)
        im = jnp.sum(q * (pre[None, :] * sr + pim[None, :] * cr), axis=1)
        return re * re + im * im

    out = jax.lax.map(one_tile, tiles)
    return out.reshape(-1)[:n]


def huygens_sum_xla(px, py, pz, opl, amp, ix, iy, iz, k, chunk: int = 4096):
    """E(image) = sum_pupil amp * exp(i k (opl + |r_img - r_pupil|)).

    px/py/pz/opl/amp: [P] pupil-point state; ix/iy/iz: [I] image points;
    returns |E|^2 [I]. Chunked over the image axis with lax.map.
    """
    n = ix.shape[0]
    pad = (-n) % chunk
    ixp = jnp.pad(ix, (0, pad))
    iyp = jnp.pad(iy, (0, pad))
    izp = jnp.pad(iz, (0, pad))
    tiles = ixp.reshape(-1, chunk), iyp.reshape(-1, chunk), \
        izp.reshape(-1, chunk)

    def one_tile(t):
        tx, ty, tz = t
        dx = tx[:, None] - px[None, :]
        dy = ty[:, None] - py[None, :]
        dz = tz[:, None] - pz[None, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        phase = k * (opl[None, :] + r)
        re = jnp.sum(amp[None, :] * jnp.cos(phase), axis=1)
        im = jnp.sum(amp[None, :] * jnp.sin(phase), axis=1)
        return re * re + im * im

    out = jax.lax.map(one_tile, tiles)
    return out.reshape(-1)[:n]


def _kernel(pup_ref, img_ref, out_ref, *, n_pupil: int, k: float):
    """One image tile ([rows, 128] layout): loop pupil points (scalars from
    SMEM), accumulate the complex field in VMEM registers."""
    tx = img_ref[0, :, :]
    ty = img_ref[1, :, :]
    tz = img_ref[2, :, :]
    re = jnp.zeros_like(tx)
    im = jnp.zeros_like(tx)

    def inner(j, carry):
        re2, im2 = carry
        px = pup_ref[0, j]
        py = pup_ref[1, j]
        pz = pup_ref[2, j]
        opl = pup_ref[3, j]
        amp = pup_ref[4, j]
        dx = tx - px
        dy = ty - py
        dz = tz - pz
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        phase = k * (opl + r)
        re2 = re2 + amp * jnp.cos(phase)
        im2 = im2 + amp * jnp.sin(phase)
        return re2, im2

    re, im = jax.lax.fori_loop(0, n_pupil, inner, (re, im))
    out_ref[:, :] = re * re + im * im


def huygens_sum_pallas(px, py, pz, opl, amp, ix, iy, iz, k,
                       tile_rows: int = 8):
    """Pallas version of ``huygens_sum_xla`` (TPU only). Image points are laid
    out [3, rows, 128]; pupil scalars live in SMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = px.shape[0]
    n = ix.shape[0]
    lanes = 128
    per_tile = tile_rows * lanes
    n_pad = (-n) % per_tile
    rows = (n + n_pad) // lanes

    pup = jnp.stack([jnp.asarray(v, jnp.float32)
                     for v in (px, py, pz, opl, amp)])
    img = jnp.stack([jnp.pad(jnp.asarray(v, jnp.float32),
                             (0, n_pad)).reshape(rows, lanes)
                     for v in (ix, iy, iz)])

    grid = (rows // tile_rows,)
    kernel = functools.partial(_kernel, n_pupil=P, k=float(k))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5, P), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, tile_rows, lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
    )(pup, img)
    return out.reshape(-1)[:n]
