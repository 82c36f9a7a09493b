"""Paraxial y-u trace engine and first-order system properties.

Functional rebuild of the reference's ParaxialRayTracer
(optiland/raytrace/paraxial_ray_tracer.py:22-150) and Paraxial property class
(optiland/paraxial.py:33-496). Everything is a pure, differentiable function of
(model, params); the per-surface loop unrolls statically (S is small), so XLA
sees a scalar dataflow chain it can fuse.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.safe_math import safe_div
from ..system.model import OpticModel, positions_from_params

__all__ = ["system_arrays", "trace_generic", "Paraxial"]


def system_arrays(model: OpticModel, params, wavelength):
    """(radii[S], n[S], positions[S], reflective[S]) for the paraxial engine.

    ``n[k]`` is the index after surface k (reference surface_group.n()).
    """
    radii = jnp.stack([sp["geom"].get("radius", jnp.asarray(jnp.inf))
                       for sp in params["surfaces"]])
    ns = []
    for k, spec in enumerate(model.surfaces):
        src = spec.material_src
        mat = model.surfaces[src].material
        ns.append(mat.n(params["surfaces"][src]["material"],
                        jnp.asarray(wavelength)))
    n = jnp.stack([jnp.reshape(v, ()) for v in ns])
    pos = positions_from_params(params)
    return radii, n, pos


def _gap_grin_media(model: OpticModel, params, reverse: bool):
    """Per-surface list: the GRIN (material, params) filling the gap BEFORE
    surface k, or None. Radial GRIN contributes paraxial power continuously;
    axial terms are ignored at first order (documented v1 approximation)."""
    num = len(model.surfaces)
    gaps = [None]
    for k in range(1, num):
        spec_prev = model.surfaces[k - 1]
        mat = model.surfaces[spec_prev.material_src].material
        if getattr(mat, "is_grin", False):
            gaps.append((mat,
                         params["surfaces"][spec_prev.material_src]["material"]))
        else:
            gaps.append(None)
    if reverse:
        gaps = [None] + gaps[1:][::-1]
    return gaps


def _grin_transfer(y, u, t, A):
    """Parabolic-GRIN paraxial transfer over thickness t: y'' = -A y with
    A = -2 nr2 / n0 (n = n0 + nr2 r^2). Branchless in the sign of A
    (cos/cosh), with the A -> 0 limit y + t u."""
    sa = jnp.sqrt(jnp.abs(A))
    st = sa * t
    small = jnp.abs(A) < 1e-16
    Cf = jnp.where(A >= 0, jnp.cos(st), jnp.cosh(st))
    Sf = jnp.where(small, t,
                   jnp.where(A >= 0, jnp.sin(st), jnp.sinh(st))
                   / jnp.where(sa > 0, sa, 1.0))
    y2 = y * Cf + u * Sf
    u2 = -y * A * Sf + u * Cf
    return y2, u2


def trace_generic(model: OpticModel, params, y, u, z, wavelength,
                  reverse: bool = False, skip: int = 0):
    """Trace a paraxial ray; returns stacked (heights, slopes), one row per
    traced surface (reference paraxial_ray_tracer.py:58-140)."""
    R, n, pos = system_arrays(model, params, wavelength)

    specs = list(model.surfaces)
    grin_gaps = _gap_grin_media(model, params, reverse)
    if reverse:
        R = -jnp.flip(R)
        n = jnp.flip(jnp.roll(n, shift=1))
        pos = pos[-1] - jnp.flip(pos)
        specs = specs[::-1]

    power = jnp.diff(n, prepend=n[:1]) / R

    y_ = jnp.atleast_1d(jnp.asarray(y, R.dtype))
    u_ = jnp.atleast_1d(jnp.asarray(u, R.dtype))
    z_ = jnp.atleast_1d(jnp.asarray(z, R.dtype))
    y_, u_, z_ = jnp.broadcast_arrays(y_, u_, z_)

    heights, slopes = [], []
    num = len(specs)
    for k in range(skip, num):
        spec = specs[k]
        if spec.is_object:
            heights.append(y_)
            slopes.append(u_)
            continue
        t = pos[k] - z_
        z_ = jnp.broadcast_to(pos[k], z_.shape)
        if grin_gaps[k] is not None:
            gmat, gmp = grin_gaps[k]
            n0 = gmat.n(gmp, jnp.asarray(wavelength))
            A = -2.0 * gmp["nr2"] / n0
            y_, u_ = _grin_transfer(y_, u_, t, A)
        else:
            y_ = y_ + t * u_
        if spec.interaction == "thin_lens":
            orig_idx = (num - 1 - k) if reverse else k
            f = params["surfaces"][orig_idx]["f"]
            if spec.is_reflective:
                u_ = -u_ - y_ / f
            else:
                u_ = (n[k - 1] * u_ - y_ / f) / n[k]
        elif spec.is_reflective:
            u_ = -u_ - 2 * y_ / R[k]
        else:
            u_ = (n[k - 1] * u_ - y_ * power[k]) / n[k]
        heights.append(y_)
        slopes.append(u_)

    return jnp.stack(heights), jnp.stack(slopes)


class Paraxial:
    """First-order properties (reference paraxial.py:33-496). A thin stateless
    facade over ``trace_generic``; every method is differentiable."""

    def __init__(self, model: OpticModel, params):
        self.model = model
        self.params = params

    # -- internals ---------------------------------------------------------
    def _wl(self):
        return self.params["wavelengths"][self.model.primary_wavelength_idx]

    def _pos(self):
        return positions_from_params(self.params)

    def _trace(self, y, u, z, reverse=False, skip=0):
        return trace_generic(self.model, self.params, y, u, z, self._wl(),
                             reverse=reverse, skip=skip)

    # -- focal properties --------------------------------------------------
    def f1(self):
        y, u = self._trace(1.0, 0.0, -1.0, reverse=True)
        return (y[0] / u[-1])[0]

    def f2(self):
        z0 = self._pos()[1] - 1.0
        y, u = self._trace(1.0, 0.0, z0)
        return jnp.abs((-y[0] / u[-1])[0])

    def F1(self):
        y, u = self._trace(1.0, 0.0, -1.0, reverse=True, skip=1)
        return (y[-1] / u[-1])[0]

    def F2(self):
        z0 = self._pos()[1] - 1.0
        y, u = self._trace(1.0, 0.0, z0)
        return (-y[-1] / u[-1])[0]

    def P1(self):
        return self.F1() - self.f1()

    def P2(self):
        return self.F2() - self.f2()

    def P1anti(self):
        return self.F1() + self.f1()

    def P2anti(self):
        return self.F2() + self.f2()

    def N1(self):
        return self.F1() + self.f2()

    def N2(self):
        return self.F2() + self.f1()

    def N1anti(self):
        return self.F1() - self.f2()

    def N2anti(self):
        return self.F2() - self.f1()

    # -- pupils ------------------------------------------------------------
    def EPL(self):
        stop_index = self.model.stop_index
        pos = self._pos()
        if stop_index == 1:
            return pos[1]
        z0 = pos[-1] - pos[stop_index]
        skip = self.model.num_surfaces - stop_index
        y, u = self._trace(0.0, 0.1, z0, reverse=True, skip=skip)
        return (y[-1] / u[-1])[0]

    def EPD(self):
        m = self.model
        ap_value = self.params["aperture_value"]
        if m.ap_type == "EPD":
            return ap_value
        if m.ap_type == "imageFNO":
            return self.f2() / ap_value
        if m.ap_type == "objectNA":
            pos = self._pos()
            obj_z = pos[0]
            src = m.surfaces[0].material_src
            n0 = m.surfaces[src].material.n(
                self.params["surfaces"][src]["material"], self._wl())
            u0 = jnp.arcsin(ap_value / n0)
            z = self.EPL() - obj_z
            return 2 * z * jnp.tan(u0)
        if m.ap_type == "float_by_stop_size":
            stop_index = m.stop_index
            if m._object_infinite:
                y, _ = self._trace(1.0, 0.0, -1.0)
                return ap_value / y[stop_index][0]
            pos = self._pos()
            obj_z = pos[0]
            EPL = self.EPL()
            y, _ = self._trace(0.0, 0.1, obj_z)
            u0 = 0.1 * ap_value / y[stop_index][0]
            return u0 * (EPL - obj_z)
        raise NotImplementedError(f"aperture type {m.ap_type}")

    def XPL(self):
        stop_index = self.model.stop_index
        pos = self._pos()
        z0 = pos[stop_index]
        y, u = self._trace(0.0, 0.1, z0, skip=stop_index + 1)
        return (-y[-1] / u[-1])[0]

    def XPD(self):
        ya, ua = self.marginal_ray()
        yxp = ya[-1] + ua[-1] * self.XPL()
        return 2 * yxp[0]

    def FNO(self):
        if self.model.ap_type == "imageFNO":
            return self.params["aperture_value"]
        return self.f2() / self.EPD()

    def magnification(self):
        _, ua = self.marginal_ray()
        _, n, _ = system_arrays(self.model, self.params, self._wl())
        return (n[0] * ua[0] / (n[-1] * ua[-1]))[0]

    def invariant(self):
        ya, ua = self.marginal_ray()
        yb, ub = self.chief_ray()
        _, n, _ = system_arrays(self.model, self.params, self._wl())
        return (yb[1] * n[1] * ua[1] - ya[1] * n[1] * ub[1])[0]

    # -- fundamental rays --------------------------------------------------
    def marginal_ray(self):
        EPD = self.EPD()
        pos = self._pos()
        if self.model._object_infinite:
            ya, ua = EPD / 2.0, 0.0
            obj_z = pos[1] - 10.0
        else:
            obj_z = pos[0]
            z = self.EPL() - obj_z
            ya, ua = 0.0, EPD / (2.0 * z)
        return self._trace(ya, ua, obj_z)

    def chief_ray(self):
        m = self.model
        stop_index = m.stop_index
        pos = self._pos()
        num_surf = m.num_surfaces

        # unit ray forward from stop to image
        y_fwd, _ = self._trace(0.0, 0.1, pos[stop_index], skip=stop_index)
        y_img_unit = y_fwd[-1]

        # same unit ray backward from stop to object
        z_rev = pos[-1] - pos[stop_index]
        skip_rev = num_surf - stop_index
        y_rev, u_rev = self._trace(0.0, 0.1, z_rev, reverse=True, skip=skip_rev)
        y_obj_unit = y_rev[-1]
        u_obj_unit = u_rev[-1]

        scaling = self._scale_chief_ray(y_obj_unit, u_obj_unit, y_img_unit)

        if m.field_type == "paraxial_image_height":
            y_obj_start = y_obj_unit * scaling
        else:
            y_obj_start = -(y_obj_unit * scaling)
        u_obj_start = u_obj_unit * scaling

        if m._object_infinite:
            EPL = self.EPL()
            z1 = pos[1]
            y1 = u_obj_start * (z1 - EPL)
            return self._trace(y1, u_obj_start, z1)
        return self._trace(y_obj_start, u_obj_start, pos[0])

    def _scale_chief_ray(self, y_obj_unit, u_obj_unit, y_img_unit):
        """Field-definition-specific unit-chief-ray scaling
        (reference fields/field_types.py:202-210, 316-333, 423-441)."""
        m = self.model
        max_y_field = jnp.max(jnp.abs(self.params["fields"][:, 1]))
        if m.field_type == "angle":
            target_slope = jnp.tan(jnp.deg2rad(max_y_field))
            return target_slope / u_obj_unit
        if m.field_type == "object_height":
            return max_y_field / y_obj_unit
        if m.field_type == "paraxial_image_height":
            return max_y_field / y_img_unit
        raise ValueError(f"unknown field type {m.field_type}")
