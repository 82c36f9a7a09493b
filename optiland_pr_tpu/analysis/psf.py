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
    import numpy as _np

    from ..utils.hostcomplex import backend_has_complex, fft2_centered
    W, n, _ = pupils.shape
    xp = jnp if backend_has_complex() else _np
    pupils = pupils if backend_has_complex() else _np.asarray(pupils)
    pad_before = (grid_size - n) // 2
    pad_after = pad_before + (grid_size - n) % 2
    padded = xp.pad(pupils, ((0, 0), (pad_before, pad_after),
                             (pad_before, pad_after)))
    amp = fft2_centered(padded)
    psf = jnp.sum(jnp.real(amp * jnp.conj(amp)), axis=0) \
        if backend_has_complex() else \
        jnp.asarray(_np.sum(_np.abs(amp) ** 2, axis=0))

    # normalization: ideal uniform pupil peak
    x = jnp.linspace(-1, 1, n)
    X, Y = jnp.meshgrid(x, x)
    inside = (X**2 + Y**2) <= 1
    count = jnp.sum(inside)
    norm = W * count.astype(psf.dtype) ** 2
    return psf / norm * 100.0


class PSFViewMixin:
    """Shared PSF visualization pipeline (reference psf/base.py:51-458):
    threshold-zoomed peak-centred bounds, bicubic interpolation to
    ``num_points``, physical-unit axes via the subclass ``_get_psf_units``
    hook, 2d imshow (log-normalized option) or 3d surface projection, and
    the original-size annotation."""

    @staticmethod
    def _find_bounds(psf, threshold=0.25):
        """Peak-centred square bounding box of the above-threshold region
        (reference psf/base.py:368-408)."""
        nz = np.argwhere(np.asarray(psf) > threshold)
        if nz.size:
            min_x, min_y = nz.min(axis=0)
            max_x, max_y = nz.max(axis=0)
        else:
            (min_x, min_y), (max_x, max_y) = (0, 0), psf.shape
        size = max(max_x - min_x, max_y - min_y)
        peak_x, peak_y = psf.shape[0] // 2, psf.shape[1] // 2
        min_x = max(0, peak_x - size / 2)
        max_x = min(psf.shape[0], peak_x + size / 2)
        min_y = max(0, peak_y - size / 2)
        max_y = min(psf.shape[1], peak_y + size / 2)
        return int(min_x), int(min_y), int(max_x), int(max_y)

    @staticmethod
    def _interpolate_psf(image, n=128):
        """Bicubic zoom to an n x n display grid (reference
        psf/base.py:345-366)."""
        image = np.asarray(image)
        zoom_factor = n / image.shape[0]
        if zoom_factor == 1:
            return image
        from scipy.ndimage import zoom
        return zoom(image, zoom_factor, order=3)

    @staticmethod
    def _annotate_original_size(fig, original_size):
        fig.text(0.99, 0.01,
                 f"Original Size: {original_size[0]}×{original_size[1]}",
                 transform=fig.transFigure, fontsize=10,
                 verticalalignment="bottom", horizontalalignment="right",
                 bbox=dict(facecolor="white", alpha=0.8, edgecolor="none"))

    def view(self, fig_to_plot_on=None, projection: str = "2d",
             log: bool = False, figsize: tuple = (7, 5.5),
             threshold: float = 0.05, num_points: int = 128):
        """Visualize the PSF (reference psf/base.py:99-209)."""
        import warnings
        import matplotlib.pyplot as plt

        if getattr(self, "psf", None) is None:
            raise RuntimeError("PSF has not been computed.")
        if projection not in ("2d", "3d"):
            raise ValueError('Projection must be "2d" or "3d".')

        if fig_to_plot_on is not None:
            fig = fig_to_plot_on
            fig.clear()
            ax = fig.add_subplot(
                111, projection=None if projection == "2d" else "3d")
        elif projection == "2d":
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig, ax = plt.subplots(subplot_kw={"projection": "3d"},
                                   figsize=figsize)

        psf_np = np.asarray(self.psf)
        min_x, min_y, max_x, max_y = self._find_bounds(psf_np, threshold)
        zoomed = psf_np[min_x:max_x, min_y:max_y]
        oversampling = num_points / max(zoomed.shape[0], 1)
        if oversampling > 3:
            warnings.warn(f"The PSF view has a high oversampling factor "
                          f"({oversampling:.2f}). Results may be inaccurate.",
                          stacklevel=2)

        if hasattr(self, "_get_psf_units"):
            x_extent, y_extent = self._get_psf_units(zoomed)
            x_label, y_label = "X (µm)", "Y (µm)"
        else:
            x_extent, y_extent = zoomed.shape[1], zoomed.shape[0]
            x_label, y_label = "X (pixels)", "Y (pixels)"

        smooth = self._interpolate_psf(zoomed, num_points)
        if log:
            pos = smooth[smooth > 0]
            floor = pos.min() if pos.size else 1e-9
            smooth = np.where(smooth > 0, smooth, floor)

        title = type(self).__name__.replace("PSF", " PSF")
        if projection == "2d":
            from matplotlib.colors import LogNorm
            extent = [-x_extent / 2, x_extent / 2,
                      -y_extent / 2, y_extent / 2]
            im = ax.imshow(smooth, norm=LogNorm() if log else None,
                           extent=extent, origin="lower")
            self._annotate_original_size(fig, zoomed.shape)
            ax.set_xlabel(x_label)
            ax.set_ylabel(y_label)
            ax.set_title(title)
            cbar = fig.colorbar(im, ax=ax)
            cbar.ax.get_yaxis().labelpad = 15
            cbar.ax.set_ylabel("Relative Intensity (%)", rotation=270)
        else:
            import matplotlib.ticker as mticker
            X, Y = np.meshgrid(
                np.linspace(-x_extent / 2, x_extent / 2, smooth.shape[1]),
                np.linspace(-y_extent / 2, y_extent / 2, smooth.shape[0]))
            plot_img = np.log10(smooth) if log else smooth
            log_formatter = None
            if log:
                ax.zaxis.set_major_formatter(mticker.FuncFormatter(
                    lambda v, pos=None: f"$10^{{{int(v)}}}$"))
                ax.zaxis.set_major_locator(mticker.MaxNLocator(integer=True))
                log_formatter = lambda v, pos=None: f"{10**v:.1e}"  # noqa: E731
            surf = ax.plot_surface(X, Y, plot_img, rstride=1, cstride=1,
                                   cmap="viridis", linewidth=0,
                                   antialiased=False)
            self._annotate_original_size(fig, zoomed.shape)
            ax.set_xlabel(x_label)
            ax.set_ylabel(y_label)
            ax.set_zlabel("Relative Intensity (%)")
            ax.set_title(title)
            fig.colorbar(surf, ax=ax, shrink=0.5, aspect=10, pad=0.15,
                         format=log_formatter)
        return fig, ax


class FFTPSF(PSFViewMixin):
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
            from ..utils.hostcomplex import backend_has_complex
            if backend_has_complex():
                vals = amplitude * jnp.exp(-1j * 2 * jnp.pi * d.opd)
                P = jnp.zeros(n * n, dtype=vals.dtype)
                P = _scatter_disk(P, inside, vals)
                pupils.append(P.reshape(n, n))
            else:
                # host fallback: the axon TPU backend has no complex dtypes
                import numpy as _np
                amp_h = _np.asarray(amplitude)
                opd_h = _np.asarray(d.opd, _np.float64)
                vals = amp_h * _np.exp(-1j * 2 * _np.pi * opd_h)
                P = _np.zeros(n * n, complex)
                P[_np.asarray(inside)] = vals
                pupils.append(P.reshape(n, n))
        import numpy as _np
        from ..utils.hostcomplex import backend_has_complex
        return jnp.stack(pupils) if backend_has_complex() \
            else _np.stack(pupils)

    def strehl_ratio(self):
        c = self.grid_size // 2
        return self.psf[c, c] / 100.0

    def _get_psf_units(self, image):
        """Physical extent of an image window in µm: dx = wl * FNO / Q with
        Q = grid_size / (num_rays - 1) (reference psf/fft.py:260-293)."""
        model, params = self.optic.build()
        FNO = float(get_working_FNO(model, params, self.field,
                                    self.wavelengths[0]))
        Q = self.grid_size / (self.num_rays - 1)
        dx = self.wavelengths[0] * FNO / Q
        return image.shape[1] * dx, image.shape[0] * dx


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


class HuygensPSF(PSFViewMixin):
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
        import jax.core
        from ..kernels.huygens import huygens_fresnel_ref, huygens_fresnel_xla
        k = 2 * jnp.pi / (self.wavelength * 1e-3)
        finite = (jnp.isfinite(data.pupil_x) & jnp.isfinite(data.pupil_y)
                  & jnp.isfinite(data.pupil_z) & jnp.isfinite(opd_mm))
        px = jnp.where(finite, data.pupil_x, 0.0)
        py = jnp.where(finite, data.pupil_y, 0.0)
        pz = jnp.where(finite, data.pupil_z, 1.0)
        amp = jnp.where(finite, data.intensity, 0.0)
        opd = jnp.where(finite, opd_mm, 0.0)
        # phase-re-referenced form (f32-safe on TPU; round-4 audit: the
        # naive cos(k*(opd+R)) loses ~11% at f32) — needs concrete inputs,
        # which the eager analysis class always has; tracers fall back
        traced = any(isinstance(v, jax.core.Tracer)
                     for v in (px, ix, opd, amp))
        fn = huygens_fresnel_xla if traced else huygens_fresnel_ref
        return fn(px, py, pz, amp, opd, ix.ravel(),
                  iy.ravel(), iz.ravel(), k, data.radius).reshape(ix.shape)

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

    def _get_psf_units(self, image):
        """Physical extent in µm from the image-plane pixel pitch (mm)."""
        dx_um = float(self.pixel_pitch) * 1e3
        return image.shape[1] * dx_um, image.shape[0] * dx_um
