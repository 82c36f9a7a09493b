"""Launch-ray construction from field and pupil coordinates.

Functional rebuild of the reference RayGenerator (optiland/rays/ray_generator.py:22-107)
and the field-definition ray-origin math (optiland/fields/field_types.py:139-479).
Everything is differentiable w.r.t. system params (EPL/EPD are paraxial traces).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.rays import Rays, new_rays
from ..system.model import OpticModel, positions_from_params
from .paraxial import Paraxial, trace_generic

__all__ = ["generate_rays", "vig_factor"]


def _field_norms(fields):
    """Per-field |(x, y)| with the double-where sqrt guard: a (0, 0) field
    row would otherwise put an inf in sqrt's gradient and NaN the whole
    ``fields`` cotangent (0 * inf) through the max."""
    s = jnp.sum(fields**2, axis=1)
    nz = s > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, s, 1.0)), 0.0)


def vig_factor(model: OpticModel, params, Hx, Hy):
    """Nearest-neighbour vignetting-factor lookup over the defined fields
    (reference fields/field_group.py:80-109).

    Implemented as an unrolled running-min over the (few, static-count)
    fields with where-selects — the obvious argmin + fancy-index gather ran
    ~100x slower on TPU for per-ray Hx arrays (round-4 profile: a 1M-ray
    gather dominated the whole XLA generation stage at 23 ms)."""
    fields = params["fields"]              # [F, 2]
    vig = params["vig"]                    # [F, 2]
    max_field = jnp.max(_field_norms(fields))
    denom = jnp.where(max_field == 0, 1.0, max_field)
    fn = fields / denom
    Hxa = jnp.asarray(Hx)
    Hya = jnp.asarray(Hy)
    F = fields.shape[0]
    best_d2 = (fn[0, 0] - Hxa) ** 2 + (fn[0, 1] - Hya) ** 2
    best_vx = jnp.broadcast_to(vig[0, 0], best_d2.shape)
    best_vy = jnp.broadcast_to(vig[0, 1], best_d2.shape)
    for f in range(1, F):
        d2 = (fn[f, 0] - Hxa) ** 2 + (fn[f, 1] - Hya) ** 2
        closer = d2 < best_d2
        best_vx = jnp.where(closer, vig[f, 0], best_vx)
        best_vy = jnp.where(closer, vig[f, 1], best_vy)
        best_d2 = jnp.minimum(d2, best_d2)
    return best_vx, best_vy


def _max_field(params):
    return jnp.max(_field_norms(params["fields"]))


def _starting_z_offset(model, params, par: Paraxial):
    """EPD - min(z) of the inner surfaces (reference field_types.py:228-240)."""
    pos = positions_from_params(params)
    return par.EPD() - jnp.min(pos[1:-1])


def _ray_origins(model: OpticModel, params, par: Paraxial, Hx, Hy, Px, Py,
                 vx, vy):
    """Per-field-type ray origin positions (reference field_types.py)."""
    pos = positions_from_params(params)
    max_field = _max_field(params)
    field_x = max_field * Hx
    field_y = max_field * Hy

    if model.field_type == "angle":
        EPL = par.EPL()
        if model._object_infinite:
            EPD = par.EPD()
            offset = _starting_z_offset(model, params, par)
            x = -jnp.tan(jnp.deg2rad(field_x)) * (offset + EPL)
            y = -jnp.tan(jnp.deg2rad(field_y)) * (offset + EPL)
            z = pos[1] - offset
            x0 = Px * EPD / 2 * vx + x
            y0 = Py * EPD / 2 * vy + y
            z0 = jnp.broadcast_to(z, x0.shape)
        else:
            z0 = pos[0]
            x0 = -jnp.tan(jnp.deg2rad(field_x)) * (EPL - z0)
            y0 = -jnp.tan(jnp.deg2rad(field_y)) * (EPL - z0)
            x0, y0, z0 = jnp.broadcast_arrays(x0, y0, z0 * jnp.ones_like(Px))
        return x0, y0, z0

    if model.field_type == "object_height":
        if model._object_infinite:
            raise ValueError("object_height fields require a finite object")
        obj = model.surfaces[0]
        x0 = field_x * jnp.ones_like(Px)
        y0 = field_y * jnp.ones_like(Px)
        sag = obj.geometry.sag(params["surfaces"][0]["geom"], x0, y0)
        z0 = sag + pos[0]
        return x0, y0, z0

    if model.field_type == "paraxial_image_height":
        stop_idx = model.stop_index
        num_surf = model.num_surfaces
        wl = params["wavelengths"][model.primary_wavelength_idx]
        # unit chief rays (reference field_types.py:463-479)
        y_f, _ = trace_generic(model, params, 0.0, 1.0, pos[stop_idx], wl,
                               skip=stop_idx)
        y_img_unit = y_f[-1][0]
        y_r, u_r = trace_generic(model, params, 0.0, 1.0,
                                 pos[-1] - pos[stop_idx], wl, reverse=True,
                                 skip=num_surf - stop_idx)
        y_obj_unit, u_obj_unit = y_r[-1][0], u_r[-1][0]
        y_t, x_t = field_y, field_x
        if model._object_infinite:
            u_obj_y = u_obj_unit * (y_t / y_img_unit)
            u_obj_x = u_obj_unit * (x_t / y_img_unit)
            EPL = par.EPL()
            EPD = par.EPD()
            offset = _starting_z_offset(model, params, par)
            x = -u_obj_x * (offset + EPL)
            y = -u_obj_y * (offset + EPL)
            z = pos[1] - offset
            x0 = Px * EPD / 2 * vx + x
            y0 = Py * EPD / 2 * vy + y
            z0 = jnp.broadcast_to(z, x0.shape)
        else:
            y_obj = y_obj_unit * (y_t / y_img_unit)
            x_obj = y_obj_unit * (x_t / y_img_unit)
            x0 = x_obj * jnp.ones_like(Px)
            y0 = y_obj * jnp.ones_like(Px)
            obj = model.surfaces[0]
            sag = obj.geometry.sag(params["surfaces"][0]["geom"], x0, y0)
            z0 = sag + pos[0]
        return x0, y0, z0

    raise ValueError(f"unknown field type {model.field_type}")


def generate_rays(model: OpticModel, params, Hx, Hy, Px, Py, wavelength,
                  apodization=None, polarized: bool = False) -> Rays:
    """Build launch rays aimed at the entrance pupil
    (reference rays/ray_generator.py:28-107)."""
    par = Paraxial(model, params)
    vxf, vyf = vig_factor(model, params, Hx, Hy)
    vx = 1.0 - vxf
    vy = 1.0 - vyf

    Px = jnp.asarray(Px)
    Py = jnp.asarray(Py)
    x0, y0, z0 = _ray_origins(model, params, par, Hx, Hy, Px, Py, vx, vy)

    if model.obj_space_telecentric:
        sin_u = params["aperture_value"]
        z = jnp.sqrt(1 - sin_u**2) / sin_u + z0
        x1 = Px * vx + x0
        y1 = Py * vy + y0
        z1 = jnp.broadcast_to(z, Px.shape)
    else:
        EPL = par.EPL()
        EPD = par.EPD()
        x1 = Px * EPD * vx / 2
        y1 = Py * EPD * vy / 2
        z1 = jnp.broadcast_to(EPL, Px.shape)

    mag = jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2 + (z1 - z0) ** 2)
    is_zero = mag < 1e-9
    mag = jnp.where(is_zero, 1.0, mag)
    L = jnp.where(is_zero, 0.0, (x1 - x0) / mag)
    M = jnp.where(is_zero, 0.0, (y1 - y0) / mag)
    N = jnp.where(is_zero, 1.0, (z1 - z0) / mag)

    if apodization is not None:
        intensity = apodization(Px, Py)
    else:
        intensity = jnp.ones_like(Px)

    wl = jnp.broadcast_to(jnp.asarray(wavelength), Px.shape)
    return new_rays(x0, y0, z0, L, M, N, intensity=intensity, wavelength=wl,
                    polarized=polarized, dtype=Px.dtype)
