"""Merit-function operands (reference optiland/optimization/operand/:
METRIC_DICT, operand.py:29-151, paraxial.py, ray.py, lens.py, aberration.py).

Each metric is a pure, differentiable function ``metric(model, params,
**input_data) -> scalar``. ``input_data`` carries *static* trace configuration
(field/pupil coords, surface numbers, ray counts) — these specialize the jit.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.distributions import generate_distribution, gaussian_quad_weights
from ..system.model import positions_from_params
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial
from ..analysis.wavefront import wavefront_data
from ..trace.aberrations import third_order

__all__ = ["METRIC_DICT", "operand_registry", "register_operand"]


# --- paraxial metrics -----------------------------------------------------

def _paraxial_metric(name):
    def metric(model, params, **kw):
        return getattr(Paraxial(model, params), name)()
    metric.__name__ = name
    return metric


def total_track(model, params, **kw):
    """Distance from first surface to image plane (reference
    optimization/operand/paraxial.py total_track)."""
    pos = positions_from_params(params)
    return pos[-1] - pos[1]


# --- real-ray metrics -----------------------------------------------------

def _traced_history(model, params, Hx, Hy, Px, Py, wavelength):
    _, hist = real_trace.trace_generic(model, params, Hx, Hy, Px, Py,
                                       wavelength, record=True)
    return hist


def _intercept(coord):
    def metric(model, params, surface_number, Hx, Hy, Px, Py, wavelength,
               **kw):
        hist = _traced_history(model, params, Hx, Hy, Px, Py, wavelength)
        return getattr(hist, coord)[surface_number, 0]
    metric.__name__ = f"real_{coord}_intercept"
    return metric


def _intercept_lcs(coord, cs_key):
    def metric(model, params, surface_number, Hx, Hy, Px, Py, wavelength,
               **kw):
        hist = _traced_history(model, params, Hx, Hy, Px, Py, wavelength)
        val = getattr(hist, coord)[surface_number, 0]
        sp = params["surfaces"][surface_number]
        dec = sp.get("cs", {}).get(cs_key, 0.0)
        if coord == "z":
            dec = dec + positions_from_params(params)[surface_number]
        return val - dec
    return metric


def _direction(coord):
    def metric(model, params, surface_number, Hx, Hy, Px, Py, wavelength,
               **kw):
        hist = _traced_history(model, params, Hx, Hy, Px, Py, wavelength)
        return getattr(hist, coord)[surface_number, 0]
    metric.__name__ = f"real_{coord}"
    return metric


def rms_spot_size(model, params, surface_number, Hx, Hy, num_rays, wavelength,
                  distribution="hexapolar", **kw):
    """(reference optimization/operand/ray.py:300-341).

    Image-surface evaluations (the overwhelmingly common merit form) go
    through trace/engine.py ``final_rays`` — the fused differentiable Pallas
    kernel when eligible — instead of the recorded-history XLA trace.
    """
    from ..trace.engine import final_rays
    Px, Py = generate_distribution(distribution, num_rays)
    at_image = surface_number in (-1, model.num_surfaces - 1)
    if wavelength == "all":
        wavelengths = [float(w) for w in params["wavelengths"]]
        if at_image:
            rays = final_rays(model, params, Hx, Hy,
                              jnp.asarray(wavelengths), Px, Py,
                              final_prop=False)
            n = Px.shape[0]
            xs = [rays.x[i * n:(i + 1) * n] for i in range(len(wavelengths))]
            ys = [rays.y[i * n:(i + 1) * n] for i in range(len(wavelengths))]
        else:
            xs, ys = [], []
            for wl in wavelengths:
                _, hist = real_trace.trace(model, params, Hx, Hy, wl, Px, Py,
                                           record=True)
                xs.append(hist.x[surface_number].ravel())
                ys.append(hist.y[surface_number].ravel())
        wi = model.primary_wavelength_idx
        mean_x = jnp.mean(xs[wi])
        mean_y = jnp.mean(ys[wi])
        r2 = jnp.concatenate([(x - mean_x) ** 2 + (y - mean_y) ** 2
                              for x, y in zip(xs, ys)])
        return jnp.sqrt(jnp.mean(r2))
    if at_image:
        rays = final_rays(model, params, Hx, Hy, wavelength, Px, Py,
                          final_prop=False)
        x = rays.x
        y = rays.y
    else:
        _, hist = real_trace.trace(model, params, Hx, Hy, wavelength, Px, Py,
                                   record=True)
        x = hist.x[surface_number].ravel()
        y = hist.y[surface_number].ravel()
    # finite-masked statistics: lost rays (miss/TIR -> NaN) drop out of the
    # merit instead of poisoning it (matters at f32 where marginal rays can
    # tip over the TIR boundary; identical to the reference when no rays
    # are lost)
    ok = jnp.isfinite(x) & jnp.isfinite(y)
    w = ok.astype(x.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    xs = jnp.where(ok, x, 0.0)
    ys = jnp.where(ok, y, 0.0)
    mx = jnp.sum(xs * w) / wsum
    my = jnp.sum(ys * w) / wsum
    r2 = jnp.where(ok, (xs - mx) ** 2 + (ys - my) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(r2) / wsum)


def OPD_difference(model, params, Hx, Hy, num_rays, wavelength,
                   distribution="gaussian_quad", **kw):
    """Weighted mean |OPD - mean(OPD)| (reference ray.py:343-390)."""
    if distribution == "gaussian_quad":
        symmetric = (Hx == 0 and Hy == 0)
        Px, Py = generate_distribution("gaussian_quad", num_rays,
                                       is_symmetric=symmetric)
        w = gaussian_quad_weights(num_rays, is_symmetric=symmetric)
        weights = w if symmetric else jnp.repeat(w, 3)
    else:
        Px, Py = generate_distribution(distribution, num_rays)
        weights = 1.0
    d = wavefront_data(model, params, (Hx, Hy), wavelength, Px, Py)
    delta = (d.opd - jnp.mean(d.opd)) * weights
    return jnp.mean(jnp.abs(delta))


def AOI(model, params, surface_number, Hx, Hy, Px, Py, wavelength, **kw):
    """Angle of incidence at a surface (reference ray.py:238-298)."""
    hist = _traced_history(model, params, Hx, Hy, Px, Py, wavelength)
    spec = model.surfaces[surface_number]
    sp = params["surfaces"][surface_number]
    # localize the intersection point to evaluate the local normal
    pos = positions_from_params(params)
    x = hist.x[surface_number, 0]
    y = hist.y[surface_number, 0]
    nx, ny, nz = spec.geometry.normal(sp["geom"], x, y)
    L = hist.L[surface_number - 1, 0]
    M = hist.M[surface_number - 1, 0]
    N = hist.N[surface_number - 1, 0]
    dot = jnp.abs(nx * L + ny * M + nz * N)
    return jnp.rad2deg(jnp.arccos(jnp.clip(dot, -1.0, 1.0)))


def clearance(model, params, line_ray_surface_idx, line_ray_field_coords,
              line_ray_pupil_coords, point_ray_surface_idx,
              point_ray_field_coords, point_ray_pupil_coords, wavelength,
              **kw):
    """Signed YZ distance from a ray-line to a ray-point
    (reference ray.py clearance)."""
    FA_Hx, FA_Hy = line_ray_field_coords
    FA_Px, FA_Py = line_ray_pupil_coords
    hist_a = _traced_history(model, params, FA_Hx, FA_Hy, FA_Px, FA_Py,
                             wavelength)
    yA = hist_a.y[line_ray_surface_idx, 0]
    zA = hist_a.z[line_ray_surface_idx, 0]
    mA = hist_a.M[line_ray_surface_idx, 0]
    nA = hist_a.N[line_ray_surface_idx, 0]

    FB_Hx, FB_Hy = point_ray_field_coords
    FB_Px, FB_Py = point_ray_pupil_coords
    hist_b = _traced_history(model, params, FB_Hx, FB_Hy, FB_Px, FB_Py,
                             wavelength)
    yB = hist_b.y[point_ray_surface_idx, 0]
    zB = hist_b.z[point_ray_surface_idx, 0]

    norm = jnp.sqrt(mA**2 + nA**2)
    dist = jnp.where(norm > 0,
                     (nA * (yB - yA) - mA * (zB - zA))
                     / jnp.where(norm > 0, norm, 1.0), 0.0)
    return jnp.where(nA < 0, -dist, dist)


def edge_thickness(model, params, surface_number, semi_aperture=None, **kw):
    """Edge thickness between surface k and k+1 (reference lens.py:24-50).

    ``semi_aperture`` defaults to the reference's choice: the MINIMUM of the
    paraxial semi-apertures (|y_marginal| + |y_chief|, optic_updater.py:202)
    of the two surfaces.
    """
    par = Paraxial(model, params)
    if semi_aperture is None:
        ya, _ = par.marginal_ray()
        yb, _ = par.chief_ray()
        r1 = jnp.abs(ya[surface_number][0]) + jnp.abs(yb[surface_number][0])
        r2 = jnp.abs(ya[surface_number + 1][0]) + \
            jnp.abs(yb[surface_number + 1][0])
        semi_aperture = jnp.minimum(r1, r2)
    s1 = model.surfaces[surface_number]
    s2 = model.surfaces[surface_number + 1]
    p1 = params["surfaces"][surface_number]["geom"]
    p2 = params["surfaces"][surface_number + 1]["geom"]
    zero = jnp.zeros(())
    sag1 = s1.geometry.sag(p1, zero, semi_aperture)
    sag2 = s2.geometry.sag(p2, zero, semi_aperture)
    t = params["surfaces"][surface_number]["thickness"]
    return t - sag1 + sag2


def rms_wavefront_error(model, params, Hx, Hy, num_rays, wavelength,
                        distribution="hexapolar", **kw):
    """RMS wavefront error in waves — TPU-native extension operand."""
    Px, Py = generate_distribution(distribution, num_rays)
    d = wavefront_data(model, params, (Hx, Hy), wavelength, Px, Py)
    valid = d.intensity > 0
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sqrt(jnp.sum(jnp.where(valid, d.opd**2, 0.0)) / n)


def _aberration_metric(name, summed=False):
    """Per-surface term indexes the raw third_order array directly —
    reference operand/aberration.py:78-123 does `TSC()[surface_number]`
    (no off-by-one shift)."""
    def metric(model, params, surface_number=None, **kw):
        d = third_order(model, params)
        v = d[name]
        if summed:
            return jnp.sum(v)
        if surface_number is not None:
            return v[surface_number]
        return v
    metric.__name__ = name
    return metric


def _seidel_metric(model, params, seidel_number=1, **kw):
    return third_order(model, params)["S"][seidel_number - 1]


_AB_NAMES = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
             "TAchC", "LchC", "TchC"]

METRIC_DICT = {
    # aberrations (reference optimization/operand/aberration.py)
    "seidel": _seidel_metric,
    **{name: _aberration_metric(name) for name in _AB_NAMES},
    **{f"{name}_sum": _aberration_metric(name, summed=True)
       for name in _AB_NAMES},
    # paraxial
    **{name: _paraxial_metric(name)
       for name in ["f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2", "EPD",
                    "EPL", "XPD", "XPL", "FNO", "magnification"]},
    "total_track": total_track,
    # real ray
    "real_x_intercept": _intercept("x"),
    "real_y_intercept": _intercept("y"),
    "real_z_intercept": _intercept("z"),
    "real_x_intercept_lcs": _intercept_lcs("x", "dx"),
    "real_y_intercept_lcs": _intercept_lcs("y", "dy"),
    "real_z_intercept_lcs": _intercept_lcs("z", "dz"),
    "real_L": _direction("L"),
    "real_M": _direction("M"),
    "real_N": _direction("N"),
    "rms_spot_size": rms_spot_size,
    "OPD_difference": OPD_difference,
    "AOI": AOI,
    "clearance": clearance,
    "edge_thickness": edge_thickness,
    "rms_wavefront_error": rms_wavefront_error,
}

operand_registry = dict(METRIC_DICT)


def register_operand(name, func, overwrite=False):
    if name in operand_registry and not overwrite:
        raise ValueError(f"Operand {name!r} is already registered.")
    operand_registry[name] = func
