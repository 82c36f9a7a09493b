"""The user-facing system builder (reference API surface: optiland/optic/optic.py:67-713).

``Optic`` is a mutable *builder* used host-side; it compiles into an immutable
static ``OpticModel`` plus a parameter pytree (``build()``). All tracing and
analysis runs on pure functions of (model, params) — the builder itself never
appears inside jit. Convenience methods (.trace, .paraxial, ...) build lazily
and cache jitted closures keyed by static trace configuration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from ..core.distributions import generate_distribution
from ..geometry import (Biconic, ChebyshevSag, EvenAsphere, OddAsphere, Plane,
                        PolynomialXY, StandardGeometry, Toroidal)
from ..geometry.extras import (FresnelDesignedSag, FresnelZoneSag, GridSag,
                               PlaneGrating, StandardGrating, ZernikeSag)
from ..geometry.forbes import ForbesQbfs, ForbesQ2d
from ..geometry.nurbs import NurbsGeometry
from ..materials import resolve_material
from ..materials.base import Mirror
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial
from ..utils.hostvals import host_isinf
from .apertures import configure_aperture
from .model import OpticModel, SurfaceDef, make_surface_params

__all__ = ["Optic"]

_GEOMETRY_BUILDERS = {
    "standard": lambda kw: StandardGeometry(),
    "plane": lambda kw: Plane(),
    "even_asphere": lambda kw: EvenAsphere(len(kw.get("coefficients") or [])),
    "odd_asphere": lambda kw: OddAsphere(len(kw.get("coefficients") or [])),
    "polynomial": lambda kw: PolynomialXY(
        *(_shape2d(kw.get("coefficients")))),
    "chebyshev": lambda kw: ChebyshevSag(*(_shape2d(kw.get("coefficients")))),
    "biconic": lambda kw: Biconic(),
    "toroidal": lambda kw: Toroidal(len(kw.get("coeffs_poly_y") or [])),
    "paraxial": lambda kw: Plane(),
    "zernike": lambda kw: ZernikeSag(len(kw.get("coefficients") or []),
                                     kw.get("zernike_type", "standard")),
    "grid_sag": lambda kw: GridSag(*(__import__("numpy").asarray(
        kw["sag_grid"]).shape[::-1])),
    "standard_grating": lambda kw: StandardGrating(),
    "plane_grating": lambda kw: PlaneGrating(),
    "grating": lambda kw: StandardGrating(),
    "fresnel_zone": lambda kw: FresnelZoneSag(),
    "fresnel_designed": lambda kw: FresnelDesignedSag(),
    "nurbs": lambda kw: NurbsGeometry(
        *(__import__("numpy").asarray(kw["control_points"]).shape[1:3]),
        kw.get("u_degree", 3), kw.get("v_degree", 3)),
    "forbes_q2d": lambda kw: ForbesQ2d(tuple(kw["terms"])),
    "forbes_qbfs": lambda kw: ForbesQbfs(
        len(kw.get("coefficients") or [])
        or (max(kw.get("radial_terms", {0: 0}).keys()) + 1)),
    "phase": lambda kw: (StandardGeometry()
                         if not __import__("numpy").isinf(
                             __import__("numpy").asarray(kw.get("radius",
                                                               float("inf"))))
                         else Plane()),
}


def _shape2d(coeffs):
    import numpy as np
    if coeffs is None:
        return (1, 1)
    a = np.atleast_2d(np.asarray(coeffs))
    return a.shape


class Optic:
    """Sequential optical system builder.

    Usage mirrors the reference::

        lens = Optic()
        lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
        lens.add_surface(index=1, radius=22.01, thickness=3.26, material="SK16")
        ...
        lens.set_aperture(aperture_type="EPD", value=10)
        lens.set_field_type(field_type="angle")
        lens.add_field(y=14)
        lens.add_wavelength(value=0.55, is_primary=True)
        rays = lens.trace(Hx=0, Hy=1, wavelength=0.55, num_rays=64)
    """

    def __init__(self, name: str | None = None):
        self.name = name
        self._surfaces: list[dict] = []
        self.ap_type: str = "EPD"
        self.ap_value: float = 1.0
        self.field_type: str = "angle"
        self.fields: list[tuple] = []       # (x, y, vx, vy)
        self.wavelengths: list[float] = []
        self.primary_wavelength_idx: int = 0
        self.polarization = "ignore"
        self.obj_space_telecentric = False
        self.apodization = None         # callable (Px, Py) -> intensity
        self.constraints: list = []     # pickups + solves (param transforms)
        self._cache = None
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    # construction API
    # ------------------------------------------------------------------
    def add_surface(self, index: int | None = None, surface_type: str = "standard",
                    radius=jnp.inf, thickness=0.0, conic=0.0, material=None,
                    is_stop: bool = False, comment: str = "", dx=0.0, dy=0.0,
                    dz=0.0, rx=0.0, ry=0.0, rz=0.0, aperture=None, bsdf=None,
                    coating=None, **geom_kw):
        """Add (or insert) a surface. Mirrors reference Optic.add_surface
        (optic/optic.py:220-320); geometry-specific keywords (coefficients,
        norm_x/norm_y, radius_x, conic_x, radius_rot, coeffs_poly_y, f, ...)
        pass through to the geometry parameter schema."""
        entry = dict(surface_type=surface_type, radius=radius,
                     thickness=thickness, conic=conic, material=material,
                     is_stop=is_stop, comment=comment, dx=dx, dy=dy, dz=dz,
                     rx=rx, ry=ry, rz=rz, aperture=aperture, bsdf=bsdf,
                     coating=coating, geom_kw=geom_kw)
        if index is None or index == len(self._surfaces):
            self._surfaces.append(entry)
        else:
            self._surfaces.insert(index, entry)
        self._dirty()
        return self

    def set_aperture(self, aperture_type: str, value: float):
        if aperture_type not in ("EPD", "imageFNO", "objectNA",
                                 "float_by_stop_size"):
            raise ValueError(f"unknown aperture type {aperture_type}")
        self.ap_type = aperture_type
        self.ap_value = float(value)
        self._dirty()

    def set_field_type(self, field_type: str):
        if field_type not in ("angle", "object_height",
                              "paraxial_image_height"):
            raise ValueError(f"unknown field type {field_type}")
        self.field_type = field_type
        self._dirty()

    def add_field(self, y: float, x: float = 0.0, vx: float = 0.0,
                  vy: float = 0.0):
        self.fields.append((float(x), float(y), float(vx), float(vy)))
        self._dirty()

    def add_wavelength(self, value: float, is_primary: bool = False,
                       unit: str = "um"):
        scale = {"um": 1.0, "nm": 1e-3, "mm": 1e3}[unit]
        self.wavelengths.append(float(value) * scale)
        if is_primary or len(self.wavelengths) == 1:
            self.primary_wavelength_idx = len(self.wavelengths) - 1
        self._dirty()

    def set_polarization(self, state):
        self.polarization = state
        self._dirty()

    def set_apodization(self, apodization):
        """Pupil apodization applied at ray generation (reference
        optic_updater.set_apodization); see system/apodization.py."""
        self.apodization = apodization
        self._dirty()

    # -- prescription edit helpers (reference optic/optic_updater.py) ------
    def set_radius(self, value, surface_number: int):
        self._surfaces[surface_number]["radius"] = float(value)
        self._surfaces[surface_number]["geom_kw"].pop("radius", None)
        self._dirty()

    def set_conic(self, value, surface_number: int):
        self._surfaces[surface_number]["conic"] = float(value)
        self._surfaces[surface_number]["geom_kw"].pop("conic", None)
        self._dirty()

    def set_thickness(self, value, surface_number: int):
        self._surfaces[surface_number]["thickness"] = float(value)
        self._dirty()

    def set_material(self, material, surface_number: int):
        self._surfaces[surface_number]["material"] = material
        self._dirty()

    def set_asphere_coeff(self, value, surface_number: int,
                          aspher_coeff_idx: int):
        """Set one aspheric coefficient (reference
        optic_updater.set_asphere_coeff)."""
        kw = self._surfaces[surface_number]["geom_kw"]
        coeffs = list(kw.get("coefficients") or [])
        while len(coeffs) <= aspher_coeff_idx:
            coeffs.append(0.0)
        coeffs[aspher_coeff_idx] = float(value)
        kw["coefficients"] = coeffs
        self._dirty()

    def set_index(self, value, surface_number: int):
        """Set the post-surface medium to an ideal index (reference
        optic_updater.set_index)."""
        self.set_material(float(value), surface_number)

    def set_norm_radius(self, value, surface_number: int):
        """Set the normalization radius of a Zernike/Forbes/poly surface
        (reference optic_updater.set_norm_radius)."""
        self._surfaces[surface_number]["geom_kw"]["norm_radius"] = float(value)
        self._dirty()

    def update(self):
        """Re-apply pickups/solves (reference optic_updater.update). Here
        constraints are parameter transforms applied inside build(), so
        updating = invalidating the compiled cache."""
        self._dirty()

    def reset(self):
        """Clear the prescription back to an empty system (reference
        optic.reset)."""
        self.__init__(name=self.name)

    # -- reference-facade conveniences --------------------------------------
    @property
    def object_surface(self):
        """The object-space SurfaceDef (reference optic.object_surface)."""
        return self.model.surfaces[0]

    @property
    def image_surface(self):
        """The image SurfaceDef (reference optic.image_surface)."""
        return self.model.surfaces[-1]

    @property
    def polarization_state(self):
        """The launch polarization state (reference optic.polarization_state)."""
        return None if isinstance(self.polarization, str) else self.polarization

    @property
    def total_track(self):
        """Total track length: max-min of surface z positions excluding the
        object surface (reference surface_group.py:196-201)."""
        from .model import positions_from_params
        pos = positions_from_params(self.params)[1:]
        import jax.numpy as jnp
        return jnp.max(pos) - jnp.min(pos)

    def to_dict(self) -> dict:
        """Serialize the prescription (reference optic.to_dict)."""
        from ..fileio.json_io import optic_to_dict
        return optic_to_dict(self)

    @classmethod
    def from_dict(cls, data: dict) -> "Optic":
        """Rebuild from to_dict output or a reference-schema dict
        (reference optic.from_dict)."""
        from ..fileio.json_io import optic_from_dict
        return optic_from_dict(data)

    def draw(self, fields="all", wavelength=None, num_rays: int = 3,
             figsize=(10, 4), title=None, reference=None):
        """2-D layout plot (reference optic.draw -> OpticViewer)."""
        from ..viz import OpticViewer
        return OpticViewer(self).view(fields=fields, wavelength=wavelength,
                                      num_rays=num_rays, figsize=figsize,
                                      title=title)

    def draw3D(self, fields="all", wavelength=None, num_rays: int = 24,
               figsize=(9, 6), title=None):
        """3-D layout plot (reference optic.draw3D -> OpticViewer3D; VTK in
        the reference, matplotlib-3D here)."""
        from ..viz import OpticViewer3D
        return OpticViewer3D(self).view(fields=fields, wavelength=wavelength,
                                        num_rays=num_rays, figsize=figsize,
                                        title=title)

    def update_paraxial(self):
        """Set per-surface semi-apertures from the paraxial marginal + chief
        ray heights and refresh normalization radii (reference
        optic_updater.update_paraxial:192-204: semi = |ya| + |yb|)."""
        import numpy as np
        par = self.paraxial
        ya, _ = par.marginal_ray()
        yb, _ = par.chief_ray()
        semi = np.abs(np.asarray(ya)).ravel() + np.abs(np.asarray(yb)).ravel()
        for k, e in enumerate(self._surfaces):
            if k < semi.shape[0] and np.isfinite(semi[k]):
                e["semi_aperture"] = float(semi[k])
        self.update_normalization()
        self._dirty()

    def update_normalization(self, surface_number: int | None = None):
        """Set norm_x/norm_y/norm_radius of normalized freeform geometries to
        1.25x the surface semi-aperture (reference
        optic_updater.update_normalization:205-232). Surfaces whose norm
        radius is an optimization variable (``norm_radius_is_variable`` on the
        entry) are skipped, as in the reference."""
        idxs = (range(len(self._surfaces)) if surface_number is None
                else [surface_number])
        for k in idxs:
            e = self._surfaces[k]
            semi = e.get("semi_aperture")
            if semi is None or e.get("norm_radius_is_variable", False):
                continue
            for key in ("norm_x", "norm_y", "norm_radius"):
                if key in e["geom_kw"]:
                    e["geom_kw"][key] = 1.25 * semi
        self._dirty()

    def info(self):
        """Tabulated prescription (reference LensInfoViewer)."""
        from ..viz import LensInfoViewer
        return LensInfoViewer(self).view()

    def plot_surface_sag(self, surface_number: int, r_max: float = None,
                         n: int = 128):
        """Sag cross-section plot (reference optic.plot_surface_sag)."""
        from ..viz import SurfaceSagViewer
        v = SurfaceSagViewer(self, surface_number)
        return v.view(r_max=r_max or 1.0, n=n)

    def scale_system(self, scale_factor: float):
        """Scale all lengths (radii/thicknesses/apertures) by ``scale_factor``
        (reference optic_updater.scale_system:160-190 — radii, thicknesses,
        EPD/float_by_stop_size aperture value, and every physical-aperture
        dimension)."""
        import jax
        import numpy as np
        for e in self._surfaces:
            if np.isfinite(float(np.asarray(e["radius"]))):
                e["radius"] = float(e["radius"]) * scale_factor
            if np.isfinite(float(np.asarray(e["thickness"]))):
                e["thickness"] = float(e["thickness"]) * scale_factor
            if e.get("aperture") is not None:
                # every physical-aperture parameter is a length (radii,
                # offsets, box extents, polygon vertices) and scales linearly
                ap_def, ap_params = configure_aperture(e["aperture"])
                ap_params = jax.tree_util.tree_map(
                    lambda v: v * scale_factor, ap_params)
                e["aperture"] = (ap_def, ap_params)
            for key in ("coefficients",):
                pass  # aspheric coefficients scale nontrivially; left to user
        if self.ap_type in ("EPD", "float_by_stop_size"):
            self.ap_value *= scale_factor
        self._dirty()

    def flip(self):
        """Reverse the optical system (reference surface_group.flip:445-539):
        inner surfaces reverse order, radii change sign, thicknesses shift
        back by one surface, glasses follow their left interface."""
        inner = self._surfaces[1:-1]
        n = len(inner)
        new_inner = []
        for i in range(n - 1, -1, -1):
            e = dict(inner[i])
            e["geom_kw"] = dict(e["geom_kw"])
            import numpy as np
            r = float(np.asarray(e["radius"]))
            e["radius"] = -r if np.isfinite(r) else r
            # thickness after new surface j = thickness before old surface i
            prev_idx = i - 1
            e["thickness"] = float(inner[prev_idx]["thickness"])                 if prev_idx >= 0 else float(self._surfaces[-2]["thickness"])
            # material after new surface = material before old surface
            e["material"] = inner[i - 1]["material"] if i >= 1 else None
            new_inner.append(e)
        # the last new inner surface takes the original image distance
        new_inner[-1]["thickness"] = float(inner[-1]["thickness"])
        self._surfaces = ([self._surfaces[0]] + new_inner
                          + [self._surfaces[-1]])
        self._dirty()

    def image_solve(self):
        """Move the image plane to the paraxial focus (reference
        optic_updater.image_solve): marginal-ray height 0 at the image."""
        self.add_solve("marginal_ray_height",
                       surface_idx=len(self._surfaces) - 1, height=0.0)

    def add_pickup(self, source_surface_idx, attr_type, target_surface_idx,
                   scale=1.0, offset=0.0):
        """Reference pickup.py:39-64 API."""
        from .constraints import Pickup
        self.constraints.append(Pickup(source_surface_idx, attr_type,
                                       target_surface_idx, scale, offset))
        self._dirty()

    def add_solve(self, solve_type, surface_idx=None, height=0.0, **kw):
        """Reference solves/factory.py API: marginal_ray_height,
        chief_ray_height, quick_focus."""
        from .constraints import (ChiefRayHeightSolve, MarginalRayHeightSolve,
                                  QuickFocusSolve)
        if solve_type == "marginal_ray_height":
            c = MarginalRayHeightSolve(surface_idx, height)
        elif solve_type == "chief_ray_height":
            c = ChiefRayHeightSolve(surface_idx, height)
        elif solve_type == "quick_focus":
            c = QuickFocusSolve(**kw)
        else:
            raise ValueError(f"unknown solve type {solve_type}")
        self.constraints.append(c)
        self._dirty()

    # ------------------------------------------------------------------
    # compile
    # ------------------------------------------------------------------
    def _dirty(self):
        self._cache = None
        self._jit_cache = {}

    def build(self):
        """Compile to (OpticModel, params)."""
        if self._cache is not None:
            return self._cache
        if len(self._surfaces) < 2:
            raise ValueError("need at least object and image surfaces")

        specs = []
        sparams = []
        last_material_src = 0
        for k, e in enumerate(self._surfaces):
            is_object = k == 0
            is_image = k == len(self._surfaces) - 1

            gkw = dict(e["geom_kw"])
            gkw.setdefault("radius", e["radius"])
            gkw.setdefault("conic", e["conic"])
            geometry = _GEOMETRY_BUILDERS[e["surface_type"]](gkw)
            # static host-side hints: inf-ness of a radius is structural
            # (users type radius=inf; no optimizer reaches it), and reading
            # it back from the device params later poisons the process-wide
            # dispatch path (utils/hostvals.py) — stamp it here from the
            # HOST builder inputs instead
            geometry.radius_is_inf = host_isinf(gkw.get("radius"), False)
            geometry.radius_rot_is_inf = host_isinf(
                gkw.get("radius_rot", float("inf")), False)

            mat_spec = e["material"]
            is_reflective = isinstance(mat_spec, str) and \
                mat_spec.lower() == "mirror"
            if is_reflective:
                material_model = Mirror()
                material_src = last_material_src
                mat_params = {}
            else:
                material_model, mat_params = resolve_material(mat_spec)
                material_src = k
                last_material_src = k

            ap_def, ap_params = configure_aperture(e["aperture"])
            coating = e["coating"]
            if isinstance(coating, str):
                from .coatings import FresnelCoating
                if coating.lower() == "fresnel":
                    coating = FresnelCoating()
                else:
                    raise ValueError(f"unknown coating spec {coating!r}")
            has_td = any(float(e[kk]) != 0.0
                         for kk in ("dx", "dy", "dz", "rx", "ry", "rz")) \
                or bool(e["geom_kw"].get("force_transform", False))

            if e["surface_type"] == "paraxial":
                interaction = "thin_lens"
            elif e["surface_type"] == "phase" or e["geom_kw"].get(
                    "phase_profile") is not None:
                interaction = "phase"
            elif e["surface_type"] in ("standard_grating", "plane_grating",
                                       "grating"):
                interaction = "grating"
            else:
                interaction = "refract_reflect"

            spec = SurfaceDef(
                geometry=geometry,
                material=material_model,
                material_src=material_src,
                is_reflective=is_reflective,
                is_stop=bool(e["is_stop"]),
                aperture=ap_def,
                interaction=interaction,
                has_tilt_decenter=has_td,
                is_object=is_object,
                is_image=is_image,
                coating=coating,
                bsdf=e["bsdf"],
                phase_profile=e["geom_kw"].get("phase_profile"),
                comment=e["comment"],
            )
            # mirror keeps the pre-material: point the spec's material at src
            if is_reflective:
                spec = SurfaceDef(**{**spec.__dict__,
                                     "material": specs[material_src].material})
            specs.append(spec)

            cs_kw = {kk2: e[kk1] for kk1, kk2 in
                     (("dx", "dx"), ("dy", "dy"), ("dz", "dz"),
                      ("rx", "rx"), ("ry", "ry"), ("rz", "rz"))}
            gkw_full = dict(gkw)
            if interaction == "thin_lens":
                gkw_full["f"] = e["geom_kw"].get("f", jnp.inf)
            sp = make_surface_params(spec, e["thickness"], gkw_full,
                                     mat_params, ap_params, cs_kw)
            sparams.append(sp)

        dt = default_float()
        model = OpticModel(
            surfaces=tuple(specs),
            ap_type=self.ap_type,
            field_type=self.field_type,
            num_fields=len(self.fields),
            num_wavelengths=len(self.wavelengths),
            primary_wavelength_idx=self.primary_wavelength_idx,
            polarization=self.polarization,
            obj_space_telecentric=self.obj_space_telecentric,
            _object_infinite=host_isinf(self._surfaces[0]["thickness"]),
        )
        fields = jnp.asarray([(f[0], f[1]) for f in self.fields] or [(0., 0.)],
                             dt)
        vig = jnp.asarray([(f[2], f[3]) for f in self.fields] or [(0., 0.)], dt)
        params = {
            "surfaces": sparams,
            "aperture_value": jnp.asarray(self.ap_value, dt),
            "fields": fields,
            "vig": vig,
            "wavelengths": jnp.asarray(self.wavelengths or [0.55], dt),
        }
        if self.constraints:
            from .constraints import apply_constraints
            params = apply_constraints(model, params, self.constraints)
        self._cache = (model, params)
        return self._cache

    @property
    def model(self) -> OpticModel:
        return self.build()[0]

    @property
    def params(self):
        return self.build()[1]

    @property
    def primary_wavelength(self) -> float:
        return self.wavelengths[self.primary_wavelength_idx]

    # ------------------------------------------------------------------
    # convenience execution
    # ------------------------------------------------------------------
    @property
    def paraxial(self) -> Paraxial:
        model, params = self.build()
        return Paraxial(model, params)

    @property
    def aberrations(self):
        from ..trace.aberrations import Aberrations
        return Aberrations(self)

    def _pallas_eligible(self, model, params, Hx, Hy, record) -> bool:
        """True when the fused Pallas kernel can trace this call: conic/
        even-asphere stack, angle fields from infinity, scalar field point,
        no apodization/vignetting/recording, and a non-CPU backend."""
        import numpy as np
        from ..kernels import supports_model
        if record or self.apodization is not None:
            return False
        if np.ndim(Hx) != 0 or np.ndim(Hy) != 0:
            return False
        if not (model.field_type == "angle" and model._object_infinite):
            return False
        if not supports_model(model):
            return False
        # vignetting folds into the kernel's half-EPD gen terms — no gate
        return jax.devices()[0].platform != "cpu"

    def trace(self, Hx=0.0, Hy=0.0, wavelength=None, num_rays: int = 100,
              distribution: str = "hexapolar", record: bool = False,
              engine: str = "auto"):
        """Trace a pupil distribution (reference optic/optic.py:584-609).

        ``engine``: "auto" uses the fused Pallas kernel (generation + surface
        stack + image propagation in one VMEM-resident kernel, f32) whenever
        the system is eligible and a TPU is present, else the XLA unrolled
        trace; "xla"/"pallas" force a path ("pallas" raises if ineligible).
        """
        model, params = self.build()
        wavelength = wavelength or self.primary_wavelength
        Px, Py = generate_distribution(distribution, num_rays)

        use_pallas = False
        if engine in ("auto", "pallas"):
            use_pallas = self._pallas_eligible(model, params, Hx, Hy, record)
            if engine == "pallas" and not use_pallas:
                raise ValueError(
                    "system/call not eligible for the fused Pallas kernel")
        if use_pallas:
            from ..kernels import model_flags, pallas_gen_trace_conic
            key = ("trace_pallas", distribution, int(Px.shape[0]))
            if key not in self._jit_cache:
                flags = model_flags(model, params)
                self._jit_cache[key] = jax.jit(
                    lambda p, hx, hy, wl, px, py: pallas_gen_trace_conic(
                        model, p, px, py, wl, Hx=hx, Hy=hy, flags=flags,
                        final_prop=True))
            return self._jit_cache[key](params, Hx, Hy, wavelength, Px, Py)

        key = ("trace", distribution, int(Px.shape[0]),
               jnp.shape(jnp.atleast_1d(Hx)), record)
        apod = self.apodization
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, hx, hy, wl, px, py: real_trace.trace(
                    model, p, hx, hy, wl, px, py, record=record,
                    apodization=apod))
        return self._jit_cache[key](params, Hx, Hy, wavelength, Px, Py)

    def trace_generic(self, Hx, Hy, Px, Py, wavelength=None,
                      record: bool = False):
        model, params = self.build()
        wavelength = wavelength or self.primary_wavelength
        return real_trace.trace_generic(model, params, Hx, Hy, Px, Py,
                                        wavelength, record=record)

    def n(self, wavelength=None):
        """Refractive index after each surface (reference optic/optic.py:563)."""
        from ..trace.paraxial import system_arrays
        model, params = self.build()
        wavelength = wavelength or self.primary_wavelength
        _, n, _ = system_arrays(model, params, wavelength)
        return n
