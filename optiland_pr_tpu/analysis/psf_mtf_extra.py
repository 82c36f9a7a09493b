"""MMDFT PSF, Sampled MTF, Huygens MTF, Through-focus MTF.

References: optiland/psf/mmdft.py:19-315 (matrix-method zoomed DFT),
optiland/mtf/sampled.py (pupil-autocorrelation OTF via Zernike fit),
optiland/mtf/huygens.py, optiland/analysis/through_focus_mtf.py.

The MMDFT triple product G = L @ pupil @ R is two dense matmuls — exactly the
shape the TPU MXU wants; for large grids this is the fastest PSF path on TPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.zernike import ZernikeFit, zernike_eval
from ..core.distributions import generate_distribution
from ..trace.paraxial import Paraxial
from .psf import FFTPSF, HuygensPSF, calculate_grid_size
from .wavefront import Wavefront, wavefront_data

__all__ = ["MMDFTPSF", "SampledMTF", "HuygensMTF", "ThroughFocusMTF"]


class MMDFTPSF:
    """Matrix-method (zoomed) DFT PSF (reference psf/mmdft.py:19-315).

    G = L @ P @ R with L/R complex DFT kernels mapping the pupil grid to an
    arbitrary image grid/pitch — two MXU matmuls instead of a padded FFT.
    With default sizing it reproduces FFTPSF.
    """

    def __init__(self, optic, field, wavelength=None, num_rays: int = 128,
                 image_size: int | None = None, pixel_scale: float | None = None,
                 strategy: str = "chief_ray", remove_tilt: bool = False):
        if image_size is None and pixel_scale is None:
            if num_rays < 32:
                raise ValueError("num_rays must be >= 32 when image sizing "
                                 "is not specified")
            num_rays, image_size = calculate_grid_size(num_rays)
        wavelength = wavelength or optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.num_rays = num_rays
        self.image_size = image_size
        # pixel scale in units of (pupil-sample frequency bins); default
        # matches FFTPSF's zero-padding ratio num_rays/(2*num_rays) etc.
        self.zoom = pixel_scale if pixel_scale is not None else 1.0

        self.wavefront = Wavefront(optic, fields=[field],
                                   wavelengths=[wavelength],
                                   num_rays=num_rays, distribution="uniform",
                                   strategy=strategy, remove_tilt=remove_tilt)
        self.pupil = self._pupil(wavelength)
        self.psf = self._compute_psf()

    def _pupil(self, wl):
        from .psf import _scatter_disk
        n = self.num_rays
        x = jnp.linspace(-1, 1, n)
        X, Y = jnp.meshgrid(x, x)
        inside = (X.ravel() ** 2 + Y.ravel() ** 2) <= 1
        d = self.wavefront.get_data(self.field, wl)
        valid = d.intensity > 0
        nvalid = jnp.sum(valid)
        mean_valid = jnp.where(
            nvalid > 0,
            jnp.sum(jnp.where(valid, d.intensity, 0.0))
            / jnp.maximum(nvalid, 1), 1.0)
        amplitude = d.intensity / mean_valid
        vals = amplitude * jnp.exp(-1j * 2 * jnp.pi * d.opd)
        P = jnp.zeros(n * n, dtype=vals.dtype)
        P = _scatter_disk(P, inside, vals)
        return P.reshape(n, n)

    def _kernels(self):
        n = self.num_rays
        g = self.image_size
        m = jnp.arange(n)
        p = (jnp.arange(g) - g // 2) * self.zoom
        # FFT-equivalent zoomed DFT: pitch 1/(2*num_rays) of pupil frequency
        # when image_size = 2*num_rays (the FFTPSF default)
        phase = -2j * jnp.pi * jnp.outer(p, m) / (2 * n)
        L = jnp.exp(phase)
        return L, L.T

    def _compute_psf(self):
        L, R = self._kernels()
        G = L @ self.pupil.astype(L.dtype) @ R
        psf = jnp.real(G * jnp.conj(G))
        norm = jnp.sum(jnp.abs(self.pupil) > 0).astype(psf.dtype) ** 2
        return psf * 100.0 / norm

    def strehl_ratio(self):
        return jnp.max(self.psf) / 100.0

    def view(self, log=False):
        import matplotlib.pyplot as plt
        img = np.asarray(self.psf)
        fig, ax = plt.subplots()
        ax.imshow(np.log10(img + 1e-9) if log else img, cmap="inferno")
        return fig, ax


class SampledMTF:
    """OTF from the pupil-overlap (autocorrelation) integral on sampled
    wavefront data with a Zernike surrogate (reference mtf/sampled.py)."""

    def __init__(self, optic, field=(0, 0), wavelength=None,
                 num_rays: int = 64, distribution: str = "uniform",
                 zernike_terms: int = 37, zernike_type: str = "fringe"):
        model, params = optic.build()
        wavelength = wavelength or optic.primary_wavelength
        self.wavelength = wavelength
        self.optic = optic
        Px, Py = generate_distribution(distribution, num_rays)
        d = wavefront_data(model, params, field, wavelength, Px, Py)
        self.x_norm, self.y_norm = Px, Py
        self.opd_waves = d.opd
        self.intensity = d.intensity
        self.fit = ZernikeFit(Px, Py, d.opd, zernike_type, zernike_terms)
        par = Paraxial(model, params)
        self.xpd = float(par.XPD())
        self.xpl = float(par.XPL())
        cdtype = jnp.complex128 if Px.dtype == jnp.float64 else jnp.complex64
        self.P1 = (jnp.sqrt(jnp.maximum(self.intensity, 0.0))
                   * jnp.exp(1j * 2 * jnp.pi * self.opd_waves)).astype(cdtype)
        self.otf_at_zero = jnp.sum(self.intensity)

    def calculate_mtf(self, frequencies):
        """MTF at (fx, fy) pairs in cycles/mm."""
        wl_mm = self.wavelength * 1e-3
        out = []
        for fx, fy in frequencies:
            if self.xpd == 0:
                out.append(1.0 if (fx == 0 and fy == 0) else 0.0)
                continue
            # normalized pupil shift (reference mtf/sampled.py: shift =
            # XPL * lambda * f / (XPD/2))
            dx = self.xpl * wl_mm * fx / (self.xpd / 2)
            dy = self.xpl * wl_mm * fy / (self.xpd / 2)
            xs = self.x_norm - dx
            ys = self.y_norm - dy
            inside = xs**2 + ys**2 <= 1.0
            rho = jnp.sqrt(xs**2 + ys**2)
            phi = jnp.arctan2(ys, xs)
            opd2 = self.fit.evaluate(rho, phi)
            P2_conj = (jnp.sqrt(jnp.maximum(self.intensity, 0.0))
                       * jnp.exp(-1j * 2 * jnp.pi * opd2))
            otf = jnp.sum(jnp.where(inside, self.P1 * P2_conj, 0.0))
            out.append(float(jnp.abs(otf / self.otf_at_zero)))
        return out


class HuygensMTF:
    """MTF from the Huygens-Fresnel PSF (reference mtf/huygens.py): the same
    |FFT| reduction FFTMTF applies, on the direct-summation PSF."""

    def __init__(self, optic, field=(0, 0), wavelength=None,
                 num_rays: int = 64, image_size: int = 128):
        wavelength = wavelength or optic.primary_wavelength
        self.psf_obj = HuygensPSF(optic, field, wavelength, num_rays=num_rays,
                                  image_size=image_size)
        psf = self.psf_obj.psf
        otf = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(psf)))
        mtf2d = jnp.abs(otf)
        c = image_size // 2
        mtf2d = mtf2d / mtf2d[c, c]
        self.mtf_tangential = mtf2d[c:, c]
        self.mtf_sagittal = mtf2d[c, c:]
        # frequency axis from the PSF image pitch
        dx = float(self.psf_obj.x_grid[1] - self.psf_obj.x_grid[0])
        self.freq = jnp.arange(c) / (dx * image_size)


class ThroughFocusMTF:
    """Geometric MTF at a chosen frequency across a defocus sweep
    (reference analysis/through_focus_mtf.py)."""

    def __init__(self, optic, frequency: float, delta_focus: float = 0.1,
                 num_steps: int = 5, fields="all", wavelength=None,
                 num_rays: int = 64):
        from ..system.model import field_coords
        from .mtf import GeometricMTF
        wavelength = wavelength or optic.primary_wavelength
        steps = np.linspace(-delta_focus * (num_steps // 2),
                            delta_focus * (num_steps // 2), num_steps)
        self.positions = steps
        self.frequency = frequency
        self.results = []
        base_thickness = optic._surfaces[-2]["thickness"]
        for dz in steps:
            optic._surfaces[-2]["thickness"] = float(base_thickness) + dz
            optic._dirty()
            g = GeometricMTF(optic, fields=fields, wavelength=wavelength,
                             num_rays=num_rays, num_points=64,
                             max_freq=max(2 * frequency, 1.0))
            idx = int(np.argmin(np.abs(np.asarray(g.freq) - frequency)))
            self.results.append([(float(mt[idx]), float(ms[idx]))
                                 for mt, ms in g.mtf])
        optic._surfaces[-2]["thickness"] = base_thickness
        optic._dirty()

    def view(self):
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        r = np.asarray(self.results)   # [steps, fields, 2]
        for i in range(r.shape[1]):
            ax.plot(self.positions, r[:, i, 0], "-o", label=f"field {i} T")
            ax.plot(self.positions, r[:, i, 1], "--s", label=f"field {i} S")
        ax.set_xlabel("Defocus (mm)")
        ax.set_ylabel(f"MTF @ {self.frequency} c/mm")
        ax.legend(fontsize=7)
        return fig, ax
