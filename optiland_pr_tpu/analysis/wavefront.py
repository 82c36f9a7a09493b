"""Wavefront analysis: OPD relative to an exit-pupil reference sphere.

Rebuild of optiland/wavefront/ (wavefront.py:26-167, strategy.py:31-511).
Strategies: chief-ray sphere (default), centroid-anchored sphere, best-fit
sphere. All math is pure jnp on traced ray state — jit/grad/vmap-safe — so RMS
wavefront error is directly usable as a merit-function operand.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.distributions import generate_distribution
from ..core.zernike import ZernikeFit
from ..system.model import OpticModel, positions_from_params, field_coords
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial, system_arrays

__all__ = ["WavefrontData", "wavefront_data", "wavefront_grid",
           "Wavefront", "OPD", "OPDFan",
           "ZernikeOPD", "fit_and_remove_tilt"]


@dataclasses.dataclass
class WavefrontData:
    """Per-(field, wavelength) wavefront results (reference
    wavefront/wavefront_data.py). Registered as a pytree so a whole
    fields x wavelengths grid can be computed under one vmap
    (``wavefront_grid``)."""
    pupil_x: jnp.ndarray
    pupil_y: jnp.ndarray
    pupil_z: jnp.ndarray
    opd: jnp.ndarray            # in waves
    intensity: jnp.ndarray
    radius: jnp.ndarray         # reference-sphere radius
    center: tuple | None = None  # reference-sphere center (x, y, z)


jax.tree_util.register_dataclass(
    WavefrontData,
    data_fields=["pupil_x", "pupil_y", "pupil_z", "opd", "intensity",
                 "radius", "center"],
    meta_fields=[])


def _opd_image_to_xp(rays, xc, yc, zc, R, n_image):
    """Optical path from the image-plane intersection back to the reference
    sphere (reference wavefront/strategy.py:68-117)."""
    xr, yr, zr = rays.x, rays.y, rays.z
    L, M, N = -rays.L, -rays.M, -rays.N
    a = L**2 + M**2 + N**2
    b = 2 * (L * (xr - xc) + M * (yr - yc) + N * (zr - zc))
    c = (xr**2 + yr**2 + zr**2
         - 2 * (xr * xc + yr * yc + zr * zc)
         + xc**2 + yc**2 + zc**2 - R**2)
    d = b**2 - 4 * a * c
    ok = d >= 0
    # value parity with reference (sqrt->0 when d<0) with finite gradients
    sq = jnp.where(ok, jnp.sqrt(jnp.where(ok, d, 1.0)), 0.0)
    t = (-b - sq) / (2 * a)
    t = jnp.where(t < 0, (-b + sq) / (2 * a), t)
    return n_image * t


def _correct_tilt(model, params, field, opd, xs, ys, epd):
    """Remove the artificial launch-plane tilt for angle fields
    (reference wavefront/strategy.py:118-168)."""
    if model.field_type != "angle":
        return opd
    hx, hy = field
    fields = params["fields"]
    max_field = jnp.max(jnp.sqrt(jnp.sum(fields**2, axis=1)))
    fx = jnp.deg2rad(hx * max_field)
    fy = jnp.deg2rad(hy * max_field)
    tx, ty = jnp.tan(fx), jnp.tan(fy)
    uz = 1.0 / jnp.sqrt(1.0 + tx**2 + ty**2)
    ux, uy = tx * uz, ty * uz
    X_m = xs * epd / 2
    Y_m = ys * epd / 2
    return opd + ux * X_m + uy * Y_m


def _split_wavefront_eligible(model) -> bool:
    """The f32 split-OPD wavefront path applies on accelerators (or when the
    engine is pinned to the kernel) for untilted conic/plane angle-field
    systems — exactly where f32 absolute OPD would otherwise be
    ulp(path)-limited (meter-scale: waves of error)."""
    import jax

    from ..kernels import gen_eligible, supports_split_opd
    from ..trace.engine import _FORCE
    if not gen_eligible(model):
        return False
    if not supports_split_opd(model):
        return False
    if _FORCE in ("pallas", "pallas_interpret"):
        return True
    if _FORCE == "xla":
        return False
    return jax.devices()[0].platform != "cpu"


def _opd_sphere_dev(ux, uy, uz, L, M, N, R, n_image):
    """n * (t - R): back-projection distance onto the reference sphere,
    DEVIATION from the common radius, cancellation-free for |u| << R
    (u = ray point - sphere center, both near the image).

    Same quadratic as _opd_image_to_xp (t = w + sqrt(R^2 + w^2 - |u|^2),
    w = u . ray_dir), but the R-scale part never forms: t - R =
    w + (w^2 - |u|^2)/(R + sqrt(R^2 + w^2 - |u|^2)). The omitted common
    n*R cancels in every chief-relative difference."""
    w = ux * L + uy * M + uz * N
    h = w * w - (ux * ux + uy * uy + uz * uz)
    rad = R * R + h
    root = jnp.sqrt(jnp.maximum(rad, 0.0))
    return n_image * (w + h / (R + root))


def _wavefront_data_split(model, params, field, wavelength, Px, Py
                          ) -> WavefrontData:
    """Chief-ray-strategy wavefront via the split-OPD kernel: every
    R-scale/path-scale magnitude is either kept out of the per-ray arrays or
    exactly common to chief and pupil rays (so it cancels in the
    difference). Meter-scale f32 wavefronts come out wave-accurate where the
    plain path is ulp(path)-limited (round-4 item 5 follow-through)."""
    from ..kernels import pallas_gen_trace_conic
    from ..trace.engine import _FORCE
    from ..trace.raygen import vig_factor

    par = Paraxial(model, params)
    _, n_arr, _ = system_arrays(model, params, wavelength)
    n_image = n_arr[-1]
    hx, hy = field

    vx_, vy_ = vig_factor(model, params, hx, hy)
    # chief ray rides as sample 0 of the SAME kernel launch: identical OPD
    # base, identical frames -> exact cancellation
    Pxc = jnp.concatenate([jnp.zeros((1,)), jnp.asarray(Px) * (1 - vx_)])
    Pyc = jnp.concatenate([jnp.zeros((1,)), jnp.asarray(Py) * (1 - vy_)])
    import jax
    interpret = (_FORCE == "pallas_interpret") \
        or jax.devices()[0].platform == "cpu"
    rays, _base = pallas_gen_trace_conic(
        model, params, jnp.asarray(Pxc, jnp.float32),
        jnp.asarray(Pyc, jnp.float32), wavelength, Hx=hx, Hy=hy,
        final_prop=True, interpret=interpret, opd_split=True,
        keep_local_z=True)

    # all z are LOCAL to the image vertex; the exit pupil sits at XPL()
    xpl = par.XPL()
    chief = jax.tree_util.tree_map(lambda a: a[0], rays)
    xc, yc, zc = chief.x, chief.y, chief.z
    R = jnp.sqrt(xc**2 + yc**2 + (zc - xpl) ** 2)

    epd = par.EPD()
    # w = u . ray_dir (the original quadratic's -d.u with d the REVERSED
    # direction; the squared terms are sign-invariant)
    dev_img = _opd_sphere_dev(rays.x - xc, rays.y - yc, rays.z - zc,
                              rays.L, rays.M, rays.N, R, n_image)
    opd = rays.opd - dev_img          # per-ray deviation (bases cancel)
    opd = _correct_tilt(model, params, field, opd,
                        jnp.concatenate([jnp.zeros((1,)), jnp.asarray(Px)]),
                        jnp.concatenate([jnp.zeros((1,)), jnp.asarray(Py)]),
                        epd)
    opd_ref = opd[0]
    opd_wv = (opd_ref - opd[1:]) / (wavelength * 1e-3)

    # pupil coordinates for display/PSF sampling: coarse (R-scale) is fine
    t = (dev_img[1:] + n_image * R) / n_image
    pos = positions_from_params(params)
    z_glob = rays.z[1:] + pos[-1]
    return WavefrontData(pupil_x=rays.x[1:] - t * rays.L[1:],
                         pupil_y=rays.y[1:] - t * rays.M[1:],
                         pupil_z=z_glob - t * rays.N[1:],
                         opd=opd_wv, intensity=rays.intensity[1:],
                         radius=R,
                         center=(xc, yc, zc + pos[-1]))


def wavefront_data(model: OpticModel, params, field, wavelength, Px, Py,
                   strategy: str = "chief_ray",
                   engine: str = "auto") -> WavefrontData:
    """Compute wavefront data for one field/wavelength
    (reference strategy.py:176-230 chief-ray path).

    ``engine`` forwards to the trace dispatch; "xla" also bypasses the
    split-OPD kernel path (used by ``wavefront_grid``, whose vmap cannot
    batch a pallas_call)."""
    if (strategy == "chief_ray" and engine != "xla"
            and _split_wavefront_eligible(model)):
        return _wavefront_data_split(model, params, field, wavelength,
                                     Px, Py)
    par = Paraxial(model, params)
    pos = positions_from_params(params)
    _, n_arr, _ = system_arrays(model, params, wavelength)
    n_image = n_arr[-1]
    hx, hy = field

    # full pupil grid trace — engine-dispatched (trace/engine.py: the fused
    # Pallas kernel when eligible). trace_generic semantics preserved: the
    # vig pre-scale is applied here AND again inside ray generation (the
    # reference applies it twice, real_ray_tracer.py:113-121 +
    # ray_generator.py:49 — a reproduced quirk).
    from ..trace.engine import final_rays
    from ..trace.raygen import vig_factor
    vx_, vy_ = vig_factor(model, params, hx, hy)
    rays = final_rays(model, params, hx, hy, wavelength,
                      jnp.asarray(Px) * (1 - vx_), jnp.asarray(Py) * (1 - vy_),
                      final_prop=True, engine=engine)

    if strategy == "chief_ray":
        pupil_z = par.XPL() + pos[-1]
        chief = real_trace.trace_generic(model, params, hx, hy, 0.0, 0.0,
                                         wavelength)
        xc, yc, zc = chief.x, chief.y, chief.z
        R = jnp.sqrt(xc**2 + yc**2 + (zc - pupil_z) ** 2)
        opd_img_ref = _opd_image_to_xp(chief, xc, yc, zc, R, n_image)
        opd_ref = chief.opd - opd_img_ref
        epd = par.EPD()
        opd_ref = _correct_tilt(model, params, field, opd_ref,
                                jnp.zeros(1), jnp.zeros(1), epd)
    elif strategy in ("centroid_sphere", "best_fit_sphere"):
        # Reference wavefront/strategy.py:272-511: tilt-correct the raw OPL
        # FIRST (so the back-projected wavefront points use corrected OPL),
        # then anchor the sphere on the image-plane centroid (centroid_sphere,
        # with a 3-sigma robust trim) or a least-squares sphere fit
        # (best_fit_sphere). Piston is removed with the unweighted mean over
        # valid rays.
        epd = par.EPD()
        opd_corr = _correct_tilt(model, params, field, rays.opd, Px, Py, epd)
        rays = rays.replace(opd=opd_corr)
        valid = (jnp.isfinite(rays.x) & jnp.isfinite(rays.y)
                 & jnp.isfinite(rays.z) & jnp.isfinite(rays.L)
                 & jnp.isfinite(rays.M) & jnp.isfinite(rays.N)
                 & jnp.isfinite(rays.opd) & (rays.intensity != 0))
        vf = valid.astype(rays.opd.dtype)
        xr = jnp.where(valid, rays.x, 0.0)
        yr = jnp.where(valid, rays.y, 0.0)
        zr = jnp.where(valid, rays.z, 0.0)
        # wavefront points: back-project by total OPL along reversed rays
        s = jnp.where(valid, rays.opd, 0.0) / n_image
        wx = xr - s * jnp.where(valid, rays.L, 0.0)
        wy = yr - s * jnp.where(valid, rays.M, 0.0)
        wz = zr - s * jnp.where(valid, rays.N, 0.0)
        if strategy == "centroid_sphere":
            # reference strategy.py:367-404: the weight branches both
            # collapse to uniform ones over valid rays (documented quirk)
            w0 = vf
            nv = jnp.sum(w0)
            cx = jnp.sum(xr * w0) / nv
            cy = jnp.sum(yr * w0) / nv
            cz = jnp.sum(zr * w0) / nv
            # robust 3-sigma trim on image-plane distances
            d_img = jnp.sqrt((xr - cx) ** 2 + (yr - cy) ** 2 + (zr - cz) ** 2)
            mean_d = jnp.sum(d_img * w0) / nv
            std_d = jnp.sqrt(jnp.sum((d_img - mean_d) ** 2 * w0) / nv)
            keep = w0 * (d_img <= mean_d + 3.0 * std_d)
            use_trim = (std_d > 0) & (jnp.sum(keep) >= 4)
            w = jnp.where(use_trim, keep, w0)
            nw = jnp.sum(w)
            xc = jnp.sum(xr * w) / nw
            yc = jnp.sum(yr * w) / nw
            zc = jnp.sum(zr * w) / nw
            d_wf = jnp.sqrt((wx - xc) ** 2 + (wy - yc) ** 2 + (wz - zc) ** 2)
            R = jnp.sum(w * d_wf) / nw
        else:  # best_fit_sphere: LSQ sphere through the wavefront points
            # (reference strategy.py:432-511): 2x·xc+2y·yc+2z·zc+(R²-|c|²)=|p|²
            A = jnp.stack([wx, wy, wz, jnp.ones_like(wx)], axis=1) * vf[:, None]
            b = (wx**2 + wy**2 + wz**2) * vf
            c = jnp.linalg.lstsq(A, b, rcond=None)[0]
            xc, yc, zc = c[0] / 2, c[1] / 2, c[2] / 2
            R = jnp.sqrt(c[3] + xc**2 + yc**2 + zc**2)
        opd_img = _opd_image_to_xp(rays, xc, yc, zc, R, n_image)
        opd = rays.opd - opd_img
        mean_opd = jnp.sum(jnp.where(rays.intensity > 0, opd, 0.0)) \
            / jnp.maximum(jnp.sum(rays.intensity > 0), 1)
        opd_wv = (mean_opd - opd) / (wavelength * 1e-3)
        t = opd_img / n_image
        return WavefrontData(pupil_x=rays.x - t * rays.L,
                             pupil_y=rays.y - t * rays.M,
                             pupil_z=rays.z - t * rays.N, opd=opd_wv,
                             intensity=rays.intensity, radius=R,
                             center=(xc, yc, zc))
    else:
        raise ValueError(f"unknown wavefront strategy {strategy}")

    opd_img = _opd_image_to_xp(rays, xc, yc, zc, R, n_image)
    opd = rays.opd - opd_img
    opd = _correct_tilt(model, params, field, opd, Px, Py, epd)
    opd_wv = (opd_ref - opd) / (wavelength * 1e-3)

    t = opd_img / n_image
    pupil_x = rays.x - t * rays.L
    pupil_y = rays.y - t * rays.M
    pupil_z_out = rays.z - t * rays.N
    return WavefrontData(pupil_x=pupil_x, pupil_y=pupil_y,
                         pupil_z=pupil_z_out, opd=opd_wv,
                         intensity=rays.intensity, radius=R,
                         center=(xc, yc, zc))


def wavefront_grid(model: OpticModel, params, fields, wavelengths, Px, Py,
                   strategy: str = "chief_ray") -> WavefrontData:
    """The whole fields x wavelengths wavefront grid as ONE computation
    (VERDICT r4 item 2, wavefront half): every leaf of the returned
    WavefrontData carries leading axes [F, W].

    Three regimes:
    - split-OPD-eligible on an accelerator: the per-pair kernel path is
      already a single fused launch (chief ray rides as sample 0) and a
      pallas_call cannot be vmapped, so pairs loop and stack;
    - kernel-eligible big bundles on an accelerator (aspheres, freeforms,
      gratings at >= the engine's pallas threshold): pairs loop with
      engine "auto" so each pupil trace stays a fused kernel launch —
      forcing a vmapped XLA grid here would be a ~5-10x regression;
    - everywhere else (CPU, tilted systems, small bundles): one jitted
      vmap over the flattened (F*W) pairs — the XLA engine batches the
      small per-pair bundles into one program instead of F*W eager
      dispatches.
    """
    from ..trace.engine import resolve_engine

    F = len(fields)
    W = len(wavelengths)

    def _loop_stack(engine):
        data = [wavefront_data(model, params, f, wl, Px, Py,
                               strategy=strategy, engine=engine)
                for f in fields for wl in wavelengths]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs).reshape((F, W) + jnp.shape(xs[0])),
            *data)

    if strategy == "chief_ray" and _split_wavefront_eligible(model):
        return _loop_stack("auto")
    if resolve_engine(model, 0.0, 0.0, None,
                      int(jnp.shape(jnp.asarray(Px))[-1])) == "pallas":
        return _loop_stack("auto")

    hh = jnp.asarray([[f[0], f[1]] for f in fields], jnp.result_type(Px))
    ww = jnp.asarray(wavelengths, jnp.result_type(Px))
    hh_flat = jnp.repeat(hh, W, axis=0)           # [(F*W), 2]
    ww_flat = jnp.tile(ww, F)

    def one(h, w):
        return wavefront_data(model, params, (h[0], h[1]), w, Px, Py,
                              strategy=strategy, engine="xla")

    data = jax.jit(jax.vmap(one))(hh_flat, ww_flat)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((F, W) + a.shape[1:]), data)


def fit_and_remove_tilt(data: WavefrontData, remove_piston: bool = False,
                        ridge: float = 1e-12):
    """Weighted LSQ piston/tilt removal (reference wavefront/wavefront.py:96-142)."""
    x, y, w, opd = data.pupil_x, data.pupil_y, data.intensity, data.opd
    one = jnp.ones_like(x)
    X = jnp.stack([one, x, y], axis=1)
    W = jnp.sqrt(w)[:, None]
    Xw = X * W
    yw = opd * jnp.sqrt(w)
    XtX = Xw.T @ Xw + ridge * jnp.eye(3, dtype=x.dtype)
    Xty = Xw.T @ yw
    coeffs = jnp.linalg.solve(XtX, Xty)
    if not remove_piston:
        coeffs = coeffs.at[0].set(0.0)
    return opd - X @ coeffs


class Wavefront:
    """Facade mirroring the reference Wavefront controller
    (wavefront/wavefront.py:26-167)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 12, distribution: str = "hexapolar",
                 strategy: str = "chief_ray", remove_tilt: bool = False):
        self.optic = optic
        model, params = optic.build()
        if fields == "all":
            fields = field_coords(params)
        if wavelengths == "all":
            wavelengths = [float(w) for w in params["wavelengths"]]
        elif wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        self.fields = fields
        self.wavelengths = wavelengths
        Px, Py = generate_distribution(distribution, num_rays)
        self.distribution_x, self.distribution_y = Px, Py
        # one computation for the whole grid (vmapped XLA or stacked
        # split-kernel launches — wavefront_grid decides)
        grid = wavefront_grid(model, params, list(fields), list(wavelengths),
                              Px, Py, strategy=strategy)
        self.data = {}
        for i, f in enumerate(fields):
            for j, wl in enumerate(wavelengths):
                d = jax.tree_util.tree_map(lambda a: a[i, j], grid)
                if remove_tilt:
                    d = dataclasses.replace(d, opd=fit_and_remove_tilt(d))
                self.data[(f, wl)] = d

    def get_data(self, field, wl) -> WavefrontData:
        return self.data[(field, wl)]


class OPD(Wavefront):
    """OPD map for a single field/wavelength (reference wavefront/opd.py:37-230)."""

    def __init__(self, optic, field, wavelength, num_rings: int = 15,
                 strategy: str = "chief_ray", remove_tilt: bool = False):
        super().__init__(optic, fields=[field], wavelengths=[wavelength],
                         num_rays=num_rings, distribution="hexapolar",
                         strategy=strategy, remove_tilt=remove_tilt)
        self.field = field
        self.wavelength = wavelength

    def rms(self):
        """Unweighted RMS over rays with nonzero intensity
        (reference wavefront/opd.py rms)."""
        d = self.get_data(self.field, self.wavelength)
        valid = d.intensity > 0
        n = jnp.sum(valid)
        mean_sq = jnp.sum(jnp.where(valid, d.opd**2, 0.0)) / jnp.maximum(n, 1)
        return jnp.sqrt(mean_sq)

    def peak_to_valley(self):
        d = self.get_data(self.field, self.wavelength)
        valid = d.intensity > 0
        opd = jnp.where(valid, d.opd, 0.0)
        return jnp.max(opd) - jnp.min(opd)


class ZernikeOPD:
    """Zernike decomposition of the OPD map (reference wavefront/zernike_opd.py:21)."""

    def __init__(self, optic, field, wavelength, num_rings: int = 15,
                 zernike_type: str = "fringe", num_terms: int = 37):
        self.opd = OPD(optic, field, wavelength, num_rings=num_rings)
        d = self.opd.get_data(field, wavelength)
        # normalized exit-pupil coordinates
        px = d.pupil_x / jnp.max(jnp.abs(d.pupil_x))
        py = d.pupil_y / jnp.max(jnp.abs(d.pupil_y))
        self.fit = ZernikeFit(px, py, d.opd, zernike_type, num_terms)

    @property
    def coeffs(self):
        return self.fit.coeffs


class OPDFan(Wavefront):
    """Tangential/sagittal OPD fans (reference wavefront/opd_fan.py:27):
    the wavefront error along the Py axis (Px=0) and the Px axis (Py=0)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 100):
        self.pupil_coord = jnp.linspace(-1, 1, num_rays)
        super().__init__(optic, fields=fields, wavelengths=wavelengths,
                         num_rays=num_rays, distribution="cross")

    def view(self):
        import matplotlib.pyplot as plt
        import numpy as np
        F = len(self.fields)
        fig, axs = plt.subplots(F, 2, figsize=(8, 3 * F), squeeze=False)
        n = self.pupil_coord.shape[0]
        for i, f in enumerate(self.fields):
            for wl in self.wavelengths:
                d = self.get_data(f, wl)
                opd = np.asarray(d.opd)
                # cross distribution: first the y-line, then the x-line
                axs[i, 0].plot(np.asarray(self.pupil_coord), opd[:n],
                               label=f"{wl} um")
                axs[i, 1].plot(np.asarray(self.pupil_coord)[
                    np.argsort(np.asarray(self.distribution_x[n:]))],
                    opd[n:], label=f"{wl} um")
            axs[i, 0].set_title(f"Py fan, field {f}", fontsize=8)
            axs[i, 1].set_title(f"Px fan, field {f}", fontsize=8)
        return fig, axs
