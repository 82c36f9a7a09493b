"""Modulation transfer functions (reference optiland/mtf/: FFTMTF, GeometricMTF,
SampledMTF; HuygensMTF derives from the Huygens PSF the same way FFTMTF does
from the FFT PSF).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..system.model import field_coords
from ..trace.paraxial import Paraxial
from .psf import FFTPSF
from .spot import spot_diagram

__all__ = ["FFTMTF", "GeometricMTF"]


class FFTMTF:
    """MTF as |FFT(PSF)| along tangential/sagittal axes
    (reference mtf/fft.py:82-154)."""

    def __init__(self, optic, field=(0, 0), wavelength=None,
                 num_rays: int = 128, grid_size: int | None = None,
                 max_freq: str | float = "cutoff"):
        self.optic = optic
        wavelength = wavelength or optic.primary_wavelength
        self.wavelength = wavelength
        self.psf_obj = FFTPSF(optic, field, wavelength, num_rays=num_rays,
                              grid_size=grid_size)
        psf = self.psf_obj.psf

        otf = jnp.fft.fftshift(jnp.fft.fft2(jnp.fft.ifftshift(psf)))
        mtf2d = jnp.abs(otf)
        mtf2d = mtf2d / mtf2d[self.psf_obj.grid_size // 2,
                              self.psf_obj.grid_size // 2]
        c = self.psf_obj.grid_size // 2
        self.mtf_tangential = mtf2d[c:, c]
        self.mtf_sagittal = mtf2d[c, c:]

        # frequency axis: PSF pixel pitch dx = lambda * FNO * num_rays/grid
        par = Paraxial(*optic.build())
        fno = self._working_fno(par)
        lam_mm = wavelength * 1e-3
        dx = lam_mm * fno * self.psf_obj.num_rays / self.psf_obj.grid_size
        self.freq = jnp.arange(c) / (dx * self.psf_obj.grid_size)
        self.cutoff = 1.0 / (lam_mm * fno)
        if max_freq == "cutoff":
            self.max_freq = self.cutoff

    def _working_fno(self, par):
        return par.FNO()

    def view(self):
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        f = np.asarray(self.freq)
        n = f.shape[0]
        ax.plot(f, np.asarray(self.mtf_tangential)[:n], label="tangential")
        ax.plot(f, np.asarray(self.mtf_sagittal)[:n], label="sagittal")
        ax.set_xlabel("Frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.set_xlim(0, float(self.cutoff))
        ax.legend()
        return fig, ax


class GeometricMTF:
    """Geometric MTF from spot-diagram ray distributions
    (reference mtf/geometric.py): line-spread function per axis -> |FT|."""

    def __init__(self, optic, fields="all", wavelength=None,
                 num_rays: int = 100, distribution: str = "uniform",
                 num_points: int = 256, max_freq: str | float = "cutoff",
                 scale: bool = True):
        model, params = optic.build()
        wavelength = wavelength or optic.primary_wavelength
        self.wavelength = wavelength
        if fields == "all":
            fields = field_coords(params)
        self.fields = fields

        par = Paraxial(model, params)
        fno = par.FNO()
        lam_mm = wavelength * 1e-3
        self.cutoff = 1.0 / (lam_mm * fno)
        self.max_freq = self.cutoff if max_freq == "cutoff" else max_freq
        self.freq = jnp.linspace(0.0, self.max_freq, num_points)
        self.scale = scale

        data = spot_diagram(model, params, fields=fields,
                            wavelengths=[wavelength], num_rays=num_rays,
                            distribution=distribution)
        self.mtf = []   # per field: (tangential, sagittal)
        for i in range(len(fields)):
            x_raw = data.x[i, 0]
            y_raw = data.y[i, 0]
            ok = jnp.isfinite(x_raw) & jnp.isfinite(y_raw)
            w = jnp.where(ok, data.intensity[i, 0], 0.0)
            wsum = jnp.maximum(jnp.sum(w), 1e-12)
            x_raw = jnp.where(ok, x_raw, 0.0)
            y_raw = jnp.where(ok, y_raw, 0.0)
            xs = x_raw - jnp.sum(x_raw * w) / wsum
            ys = y_raw - jnp.sum(y_raw * w) / wsum
            mt = self._axis_mtf(ys, w)
            ms = self._axis_mtf(xs, w)
            self.mtf.append((mt, ms))

    def _axis_mtf(self, coord, weight):
        """|sum w exp(-2pi i f x)| / sum w — exact geometric MTF of the ray
        distribution (equivalent to the reference's binned LSF + FT in the
        limit of fine bins)."""
        f = self.freq[:, None]
        ph = -2 * jnp.pi * f * coord[None, :]
        c = jnp.sum(weight[None, :] * jnp.exp(1j * ph), axis=1)
        mtf = jnp.abs(c) / jnp.maximum(jnp.sum(weight), 1e-12)
        if self.scale:
            # scale by the diffraction-limited MTF (reference mtf/base.py)
            v = jnp.clip(self.freq / self.cutoff, 0.0, 1.0)
            dl = 2 / jnp.pi * (jnp.arccos(v) - v * jnp.sqrt(1 - v**2))
            mtf = mtf * dl
        return mtf

    def view(self):
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        f = np.asarray(self.freq)
        for i, field in enumerate(self.fields):
            mt, ms = self.mtf[i]
            ax.plot(f, np.asarray(mt), label=f"{field} tangential")
            ax.plot(f, np.asarray(ms), "--", label=f"{field} sagittal")
        ax.set_xlabel("Frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.legend(fontsize=7)
        return fig, ax
