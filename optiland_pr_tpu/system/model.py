"""Static system description (the "compiled" form of an optical system).

The reference couples system structure and numeric state in one mutable object
graph (optiland/optic/optic.py:67-713, surfaces/surface_group.py:27-539). Here
they are split:

- ``OpticModel`` / ``SurfaceDef``: *static* structure — geometry types,
  material models, interaction kinds, stop index, field/wavelength counts.
  Hashable; a jit specialization key.
- the parameter pytree (built by ``OpticModel.default_params``): every numeric
  value — radii, conics, thicknesses, coefficients, tilts, field coords,
  wavelengths. ``jax.grad``/``vmap``/``pjit`` flow through it.

Surface positions derive from thicknesses *inside* jit (cumulative sum), so
thickness gradients shift all downstream surfaces exactly like the reference's
OpticUpdater does eagerly.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..config import default_float
from ..geometry import Geometry
from ..materials.base import MaterialModel
from .apertures import ApertureDef

__all__ = ["SurfaceDef", "OpticModel", "positions_from_params"]


@dataclasses.dataclass(frozen=True)
class SurfaceDef:
    """Static description of one surface (reference
    surfaces/standard_surface.py:33-383)."""
    geometry: Geometry
    material: MaterialModel            # post-material model
    material_src: int                  # surface index owning the post-material params
    is_reflective: bool = False
    is_stop: bool = False
    aperture: ApertureDef | None = None
    interaction: str = "refract_reflect"  # | "thin_lens" | "grating" | "phase"
    has_tilt_decenter: bool = False
    is_object: bool = False
    is_image: bool = False
    coating: Any = None
    bsdf: Any = None
    phase_profile: Any = None
    comment: str = ""


@dataclasses.dataclass(frozen=True)
class OpticModel:
    """Static model of the whole system."""
    surfaces: tuple[SurfaceDef, ...]
    ap_type: str = "EPD"               # | "imageFNO" | "objectNA" | "float_by_stop_size"
    field_type: str = "angle"          # | "object_height" | "paraxial_image_height"
    num_fields: int = 0
    num_wavelengths: int = 0
    primary_wavelength_idx: int = 0
    polarization: str = "ignore"
    obj_space_telecentric: bool = False

    # ------------------------------------------------------------------
    @property
    def num_surfaces(self) -> int:
        return len(self.surfaces)

    @property
    def stop_index(self) -> int:
        for i, s in enumerate(self.surfaces):
            if s.is_stop:
                return i
        return 1

    @property
    def object_is_infinite(self) -> bool:
        # static: the builder stores inf thickness as float('inf') marker
        return self._object_infinite

    # set via __post_init__ workaround: stored on a normal attr by builder
    _object_infinite: bool = True

    def surface_pre_material(self, k: int) -> tuple[MaterialModel, int]:
        """(model, params-src index) of the material *before* surface k."""
        prev = self.surfaces[k - 1] if k > 0 else self.surfaces[0]
        return prev.material, prev.material_src


def field_coords(params) -> list:
    """Normalized (Hx, Hy) coordinates of the defined fields
    (reference fields/field_group.py:111-130)."""
    import numpy as np
    f = np.asarray(params["fields"])
    max_field = float(np.max(np.sqrt(np.sum(f**2, axis=1))))
    if max_field == 0:
        return [(0.0, 0.0)]
    return [(float(x / max_field), float(y / max_field)) for x, y in f]


def positions_from_params(params) -> jnp.ndarray:
    """z position of every surface vertex, surface 1 at z=0
    (reference surfaces/surface_group.py:143-149 convention).

    positions[0] = -thickness[0] (object distance; -inf for infinite object),
    positions[k] = sum(thickness[1..k-1]) for k >= 1.
    """
    t = jnp.stack([sp["thickness"] for sp in params["surfaces"]])
    dt = t.dtype
    inner = jnp.concatenate([jnp.zeros((1,), dt), jnp.cumsum(t[1:-1])])
    return jnp.concatenate([(-t[0])[None], inner])


def make_surface_params(spec: SurfaceDef, thickness, geom_kw: dict,
                        material_params: dict, aperture_params, cs_kw: dict
                        ) -> dict:
    dt = default_float()
    p = {
        "thickness": jnp.asarray(thickness, dt),
        "geom": spec.geometry.default_params(**geom_kw),
        "material": material_params,
    }
    if spec.aperture is not None:
        p["aperture"] = aperture_params
    if spec.coating is not None:
        p["coating"] = spec.coating.default_params()
    if spec.bsdf is not None:
        p["bsdf"] = spec.bsdf.default_params()
    if spec.phase_profile is not None:
        p["phase"] = spec.phase_profile.default_params(
            **geom_kw.get("phase_kw", {}))
    if spec.has_tilt_decenter:
        p["cs"] = {k: jnp.asarray(cs_kw.get(k, 0.0), dt)
                   for k in ("dx", "dy", "dz", "rx", "ry", "rz")}
    if spec.interaction == "thin_lens":
        p["f"] = jnp.asarray(geom_kw.get("f", jnp.inf), dt)
    return p
