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
from .psf import FFTPSF, HuygensPSF, PSFViewMixin, calculate_grid_size
from .wavefront import Wavefront, wavefront_data

__all__ = ["MMDFTPSF", "SampledMTF", "HuygensMTF", "ThroughFocusMTF"]


class MMDFTPSF(PSFViewMixin):
    """Matrix-method (zoomed) DFT PSF (reference psf/mmdft.py:19-315).

    G = L @ P @ R with L/R complex DFT kernels mapping the pupil grid to an
    image grid of chosen size/pixel pitch — two dense MXU matmuls instead of
    a padded FFT. Kernel pad size = wl * working_FNO * (num_rays-1) /
    pixel_pitch, exactly the reference parameterization, so the default
    sizing reproduces FFTPSF's sampling.
    """

    def __init__(self, optic, field, wavelength=None, num_rays: int = 128,
                 image_size: int | None = None,
                 pixel_pitch: float | None = None,
                 strategy: str = "chief_ray", remove_tilt: bool = False):
        from .psf import get_working_FNO
        grid_size = None
        if image_size is None and pixel_pitch is None:
            if num_rays < 32:
                raise ValueError("num_rays must be >= 32 when image sizing "
                                 "is not specified")
            num_rays, grid_size = calculate_grid_size(num_rays)
        wavelength = wavelength or optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.num_rays = num_rays

        model, params = optic.build()
        clear_size = num_rays - 1
        fno = float(get_working_FNO(model, params, field, wavelength))
        if pixel_pitch is None:
            if image_size is None:
                image_size = grid_size
            pixel_pitch = wavelength * fno * clear_size / image_size
        if image_size is None:
            image_size = int(wavelength * fno * clear_size / pixel_pitch)
        self.image_size = image_size
        self.pixel_pitch = pixel_pitch
        self._fno = fno

        self.wavefront = Wavefront(optic, fields=[field],
                                   wavelengths=[wavelength],
                                   num_rays=num_rays, distribution="uniform",
                                   strategy=strategy, remove_tilt=remove_tilt)
        self.pupil_re_im = self._pupil(wavelength)
        self.psf = self._compute_psf(wavelength)

    def _pupil(self, wl):
        """Complex pupil as a REAL (re, im) pair: the axon TPU backend has
        no complex dtype support at all (complex add/matmul/FFT are
        UNIMPLEMENTED), and the real decomposition is also where the MXU
        matmul precision can be pinned (round-4 audit)."""
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
        # amp * exp(-i 2 pi opd), decomposed
        vr = amplitude * jnp.cos(2 * jnp.pi * d.opd)
        vi = -amplitude * jnp.sin(2 * jnp.pi * d.opd)
        Pr = _scatter_disk(jnp.zeros(n * n, vr.dtype), inside, vr)
        Pi = _scatter_disk(jnp.zeros(n * n, vi.dtype), inside, vi)
        return Pr.reshape(n, n), Pi.reshape(n, n)

    @property
    def pupil(self):
        """Complex pupil grid (host-side convenience; complex dtypes do not
        exist on the axon TPU backend — use ``pupil_re_im`` there)."""
        Pr, Pi = self.pupil_re_im
        return Pr + 1j * Pi

    def _kernels(self, wl):
        """Reference psf/mmdft.py:232-295: non-unitary zoomed DFT kernels,
        as real (cos, sin) pairs."""
        n = self.num_rays
        g = self.image_size
        pad = wl * self._fno * (n - 1) / self.pixel_pitch
        if g > pad:
            raise ValueError(f"image_size {g} exceeds pad size {int(pad)}; "
                             "increase num_rays")
        pc = jnp.arange(n) - n // 2
        ic = jnp.arange(g) - g // 2
        aR = 2 * jnp.pi * jnp.outer(pc, ic) / pad
        aL = 2 * jnp.pi * jnp.outer(ic, pc) / pad
        # exp(-i a) = cos a - i sin a
        return (jnp.cos(aL), -jnp.sin(aL)), (jnp.cos(aR), -jnp.sin(aR))

    def _compute_psf(self, wl):
        (Lr, Li), (Rr, Ri) = self._kernels(wl)
        Pr, Pi = self.pupil_re_im
        dt = Lr.dtype
        Pr = Pr.astype(dt)
        Pi = Pi.astype(dt)

        # G = L @ P @ R via 8 real matmuls. precision="highest": the TPU
        # MXU's default bf16 passes cost ~1e-3 relative error in the PSF
        # (round-4 audit vs CPU f64 truth); full-f32 passes restore ~1e-6
        # at a negligible share of the analysis runtime.
        def mm(a, b):
            return jnp.matmul(a, b, precision="highest")

        M1r = mm(Lr, Pr) - mm(Li, Pi)
        M1i = mm(Lr, Pi) + mm(Li, Pr)
        Gr = mm(M1r, Rr) - mm(M1i, Ri)
        Gi = mm(M1r, Ri) + mm(M1i, Rr)
        psf = Gr * Gr + Gi * Gi
        norm = jnp.sum(Pr * Pr + Pi * Pi > 0).astype(psf.dtype) ** 2
        return psf * 100.0 / norm

    def strehl_ratio(self):
        return jnp.max(self.psf) / 100.0

    def _get_psf_units(self, image):
        """Physical extent in µm: pixel pitch is wl*FNO*clear/image (µm)."""
        return (image.shape[1] * self.pixel_pitch,
                image.shape[0] * self.pixel_pitch)


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
        # reference mtf/sampled.py:97 negates XPL before forming the shift
        self.xpl = -float(par.XPL())
        from ..utils.hostcomplex import backend_has_complex
        if backend_has_complex():
            cdtype = jnp.complex128 if Px.dtype == jnp.float64 \
                else jnp.complex64
            self.P1 = (jnp.sqrt(jnp.maximum(self.intensity, 0.0))
                       * jnp.exp(1j * 2 * jnp.pi * self.opd_waves)
                       ).astype(cdtype)
        else:
            # host fallback (axon TPU: no complex dtypes); the overlap sums
            # below are tiny vs the trace that produced the wavefront
            inten_h = np.maximum(np.asarray(self.intensity, np.float64), 0.0)
            self.P1 = np.sqrt(inten_h) * np.exp(
                1j * 2 * np.pi * np.asarray(self.opd_waves, np.float64))
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
            from ..utils.hostcomplex import backend_has_complex
            if backend_has_complex():
                P2_conj = (jnp.sqrt(jnp.maximum(self.intensity, 0.0))
                           * jnp.exp(-1j * 2 * jnp.pi * opd2))
                otf = jnp.sum(jnp.where(inside, self.P1 * P2_conj, 0.0))
            else:
                inten_h = np.maximum(np.asarray(self.intensity, np.float64),
                                     0.0)
                P2_conj = np.sqrt(inten_h) * np.exp(
                    -1j * 2 * np.pi * np.asarray(opd2, np.float64))
                otf = np.sum(np.where(np.asarray(inside),
                                      self.P1 * P2_conj, 0.0))
            out.append(float(np.abs(np.asarray(otf))
                             / float(np.asarray(self.otf_at_zero))))
        return out


class HuygensMTF:
    """MTF from the Huygens-Fresnel PSF (reference mtf/huygens_fresnel.py):
    2x-oversampled (vs the optical cutoff) Huygens PSF, |FFT| slices clipped
    to [0, 1], DC-normalized."""

    def __init__(self, optic, fields="all", wavelength=None,
                 num_rays: int = 64, image_size: int = 128,
                 max_freq="cutoff"):
        from ..system.model import field_coords
        wavelength = wavelength or optic.primary_wavelength
        model, params = optic.build()
        if fields == "all":
            fields = field_coords(params)
        self.fields = fields
        self.wavelength = wavelength
        self.image_size = image_size
        self.psf_instances = []
        self.mtf = []
        c = image_size // 2
        for f in fields:
            p = HuygensPSF(optic, f, wavelength, num_rays=num_rays,
                           image_size=image_size, oversample=2.0)
            self.psf_instances.append(p)
            from ..utils.hostcomplex import (backend_has_complex,
                                             fft2_centered)
            otf = fft2_centered(p.psf)
            mtf2d = jnp.abs(otf) if backend_has_complex() \
                else jnp.asarray(np.abs(otf))
            dc = mtf2d[c, c]
            tan = jnp.clip(mtf2d[c:, c][:c] / dc, 0.0, 1.0)
            sag = jnp.clip(mtf2d[c, c:][:c] / dc, 0.0, 1.0)
            self.mtf.append([tan, sag])
        pitch = self.psf_instances[0].pixel_pitch
        self.freq = jnp.arange(c) * (1.0 / (image_size * pitch))
        self.mtf_tangential = self.mtf[0][0]
        self.mtf_sagittal = self.mtf[0][1]


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
