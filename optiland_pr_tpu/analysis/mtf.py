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

        from ..utils.hostcomplex import backend_has_complex, fft2_centered
        otf = fft2_centered(psf, pre_ifftshift=True)
        mtf2d = jnp.abs(otf) if backend_has_complex() \
            else jnp.asarray(np.abs(otf))
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
    (reference mtf/geometric.py): binned line-spread function per axis ->
    cosine/sine transform magnitude, optionally scaled by the
    diffraction-limited MTF."""

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
        self.num_points = num_points
        self.freq = jnp.linspace(0.0, self.max_freq, num_points)
        self.scale = scale

        data = spot_diagram(model, params, fields=fields,
                            wavelengths=[wavelength], num_rays=num_rays,
                            distribution=distribution)
        # diffraction-limited scale factor — reference mtf/geometric.py:163-168
        # (quirk: normalized by max_freq, not the optical cutoff, so a
        # user-specified max_freq rescales the reference curve too)
        if scale:
            phi = jnp.arccos(jnp.clip(self.freq / self.max_freq, -1.0, 1.0))
            self.diff_limited_mtf = 2 / jnp.pi * (phi - jnp.cos(phi)
                                                  * jnp.sin(phi))
        else:
            self.diff_limited_mtf = jnp.ones_like(self.freq)
        self.mtf = []   # per field: (tangential, sagittal)
        for i in range(len(fields)):
            mt = self._axis_mtf(data.y[i, 0])
            ms = self._axis_mtf(data.x[i, 0])
            self.mtf.append((mt, ms))

    def _axis_mtf(self, coord):
        """Reference mtf/geometric.py:176-205: unweighted histogram of the ray
        coordinates into num_points+1 bins (the LSF), then
        mtf(v) = sqrt(Ac^2 + As^2) with Ac/As the cosine/sine moments of the
        binned LSF at bin centers. Expressed as one [F, B] contraction."""
        coord = coord[jnp.isfinite(coord)]
        A, edges = jnp.histogram(coord, bins=self.num_points + 1)
        x = (edges[1:] + edges[:-1]) / 2
        Anorm = A / jnp.maximum(jnp.sum(A), 1)
        ph = 2 * jnp.pi * self.freq[:, None] * x[None, :]
        Ac = jnp.sum(Anorm[None, :] * jnp.cos(ph), axis=1)
        As = jnp.sum(Anorm[None, :] * jnp.sin(ph), axis=1)
        return jnp.sqrt(Ac**2 + As**2) * self.diff_limited_mtf

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
