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

__all__ = ["FFTPSF", "HuygensPSF", "calculate_grid_size", "fft_psf_from_pupil",
           "get_working_FNO"]


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


def get_working_FNO(model, params, field, wavelength):
    """Working F-number from four marginal rays + chief ray
    (reference utils.py:14-64)."""
    from ..trace.paraxial import system_arrays
    hx, hy = field
    _, n_arr, _ = system_arrays(model, params, wavelength)
    n = n_arr[-1]
    Px = jnp.array([0.0, 0.0, 0.0, 1.0, -1.0])
    Py = jnp.array([0.0, 1.0, -1.0, 0.0, 0.0])
    rays = real_trace.trace_generic(model, params, hx, hy, Px, Py, wavelength)
    dot = rays.L[0] * rays.L[1:] + rays.M[0] * rays.M[1:] \
        + rays.N[0] * rays.N[1:]
    angles = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    avg_na_sq = jnp.mean((n * jnp.sin(angles)) ** 2)
    fno = jnp.where(avg_na_sq <= 0, jnp.inf, 1.0 / (2 * jnp.sqrt(avg_na_sq)))
    return jnp.minimum(fno, 10000.0)


def _image_surface_pose(model, params):
    """(R, tx, ty, tz) pose of the image surface in the global frame."""
    from ..core.transforms import rotation_matrix
    pos = positions_from_params(params)
    spec = model.surfaces[-1]
    sp = params["surfaces"][-1]
    tz = pos[-1]
    if spec.has_tilt_decenter:
        cs = sp["cs"]
        Rm = rotation_matrix(cs["rx"], cs["ry"], cs["rz"])
        return Rm, cs["dx"], cs["dy"], tz + cs["dz"]
    return None, 0.0, 0.0, tz


def _image_to_local(model, params, x, y, z):
    Rm, tx, ty, tz = _image_surface_pose(model, params)
    if Rm is None:
        return x - tx, y - ty, z - tz
    v = jnp.stack([x - tx, y - ty, z - tz])
    out = Rm.T @ v.reshape(3, -1)
    return (out[0].reshape(x.shape), out[1].reshape(x.shape),
            out[2].reshape(x.shape))


def _image_to_global(model, params, x, y, z):
    Rm, tx, ty, tz = _image_surface_pose(model, params)
    if Rm is None:
        return x + tx, y + ty, z + tz
    v = Rm @ jnp.stack([x, y, z]).reshape(3, -1)
    return (v[0].reshape(x.shape) + tx, v[1].reshape(x.shape) + ty,
            v[2].reshape(x.shape) + tz)


class HuygensPSF:
    """Huygens-Fresnel direct-summation PSF (reference psf/huygens_fresnel.py:25-339).

    PSF(img) = | sum_p amp_p e^{-ik opd_p} e^{ikR}/R (1+cos theta)/2 |^2 over
    pupil samples on the exit-pupil reference sphere, normalized so an ideal
    (zero-OPD, same-amplitude) pupil peaks at 100. This is the heaviest kernel
    in the reference (its only numba kernel); here one batched XLA reduction
    (kernels/huygens.py) that tiles onto the TPU VPU.
    """

    def __init__(self, optic, field, wavelength=None, num_rays: int = 128,
                 image_size: int = 128, strategy: str = "chief_ray",
                 remove_tilt: bool = False, oversample: float | None = None,
                 pixel_pitch: float | None = None):
        self.optic = optic
        model, params = optic.build()
        self.model, self.params = model, params
        wavelength = wavelength or optic.primary_wavelength
        self.wavelength = wavelength
        self.field = field
        self.num_rays = num_rays
        self.image_size = image_size
        self.oversample = oversample
        self.pixel_pitch = pixel_pitch

        self.wavefront = Wavefront(optic, fields=[field],
                                   wavelengths=[wavelength],
                                   num_rays=num_rays, distribution="uniform",
                                   strategy=strategy, remove_tilt=remove_tilt)
        self.psf = self._compute_psf()

    def get_data(self, field, wl):
        return self.wavefront.get_data(field, wl)

    def _determine_image_center(self):
        """Centroid of a hexapolar footprint in image-surface local coords
        (reference huygens_fresnel.py:113-137)."""
        Px, Py = generate_distribution("hexapolar", 6)
        hx, hy = self.field
        rays = real_trace.trace_generic(self.model, self.params, hx, hy,
                                        Px, Py, self.wavelength)
        valid = rays.intensity > 0
        rx, ry, _ = _image_to_local(self.model, self.params,
                                    rays.x, rays.y, rays.z)
        nv = jnp.maximum(jnp.sum(valid), 1)
        cx = jnp.sum(jnp.where(valid, rx, 0.0)) / nv
        cy = jnp.sum(jnp.where(valid, ry, 0.0)) / nv
        return rx, ry, valid, cx, cy

    def _get_image_extent(self):
        """Half-extent of the image window (reference huygens_fresnel.py:139-202):
        pixel_pitch override, else cutoff-frequency (oversample mode), else
        max(geometric footprint, 5 Airy radii)."""
        rx, ry, valid, cx, cy = self._determine_image_center()
        self.cx, self.cy = cx, cy
        wl_mm = self.wavelength * 1e-3
        if self.pixel_pitch is not None:
            extent = 0.5 * self.image_size * self.pixel_pitch
        else:
            fno = get_working_FNO(self.model, self.params, self.field,
                                  self.wavelength)
            if self.oversample is not None:
                f_cutoff = 1.0 / (fno * wl_mm)
                self.pixel_pitch = 1.0 / (2 * self.oversample * f_cutoff)
                extent = 0.5 * self.image_size * self.pixel_pitch
            else:
                geom = jnp.max(jnp.where(
                    valid, jnp.hypot(rx - cx, ry - cy), 0.0))
                ideal = 5.0 * fno * 1.22 * wl_mm
                extent = jnp.maximum(geom, ideal)
                self.pixel_pitch = 2 * extent / self.image_size
        return cx - extent, cx + extent, cy - extent, cy + extent

    def _get_image_coordinates(self):
        xmin, xmax, ymin, ymax = self._get_image_extent()
        n = self.image_size
        gx = jnp.linspace(xmin, xmax, n)
        gy = jnp.linspace(ymin, ymax, n)
        X, Y = jnp.meshgrid(gx, gy)
        spec = self.model.surfaces[-1]
        sp = self.params["surfaces"][-1]
        Z = jnp.broadcast_to(spec.geometry.sag(sp["geom"], X.ravel(),
                                               Y.ravel()).reshape(X.shape),
                             X.shape)
        self.x_grid, self.y_grid = gx, gy
        return _image_to_global(self.model, self.params, X, Y, Z)

    def _sum(self, data, opd_mm, ix, iy, iz):
        from ..kernels.huygens import huygens_fresnel_xla
        k = 2 * jnp.pi / (self.wavelength * 1e-3)
        finite = (jnp.isfinite(data.pupil_x) & jnp.isfinite(data.pupil_y)
                  & jnp.isfinite(data.pupil_z) & jnp.isfinite(opd_mm))
        px = jnp.where(finite, data.pupil_x, 0.0)
        py = jnp.where(finite, data.pupil_y, 0.0)
        pz = jnp.where(finite, data.pupil_z, 1.0)
        amp = jnp.where(finite, data.intensity, 0.0)
        opd = jnp.where(finite, opd_mm, 0.0)
        return huygens_fresnel_xla(px, py, pz, amp, opd, ix.ravel(),
                                   iy.ravel(), iz.ravel(), k, data.radius
                                   ).reshape(ix.shape)

    def _get_normalization(self, data):
        """Peak of the ideal (zero-OPD) PSF at the on-axis field
        (reference huygens_fresnel.py:231-279)."""
        if tuple(self.field) == (0.0, 0.0):
            d0 = data
        else:
            wf = Wavefront(self.optic, fields=[(0, 0)],
                           wavelengths=[self.wavelength],
                           num_rays=self.num_rays, distribution="uniform")
            d0 = wf.get_data((0, 0), self.wavelength)
        pos = positions_from_params(self.params)
        one = jnp.zeros((1, 1))
        iz = jnp.full((1, 1), pos[-1])
        ideal = self._sum(d0, jnp.zeros_like(d0.opd), one, one, iz)
        return ideal[0, 0]

    def _compute_psf(self):
        data = self.get_data(self.field, self.wavelength)
        wl_mm = self.wavelength * 1e-3
        ix, iy, iz = self._get_image_coordinates()
        psf = self._sum(data, data.opd * wl_mm, ix, iy, iz)
        return psf / self._get_normalization(data) * 100.0

    def strehl_ratio(self):
        c = self.image_size // 2
        return self.psf[c, c] / 100.0

    def view(self, log: bool = False):
        import matplotlib.pyplot as plt
        img = np.asarray(self.psf)
        fig, ax = plt.subplots()
        ax.imshow(np.log10(img + 1e-10) if log else img, cmap="inferno")
        return fig, ax
