"""Zernike-sag, grid-sag, grating, and Fresnel-zone geometries.

References:
- ZernikePolynomialGeometry: optiland/geometries/zernike.py:55-200
- GridSagGeometry: optiland/geometries/grid_sag.py:18-103 (bilinear interp)
- StandardGratingGeometry / PlaneGrating: optiland/geometries/standard_grating.py:25,
  plane_grating.py:19 (conic/plane carrying grating vector + period)
- Fresnel zone sag: NEW capability (the reference models Fresnel lenses as
  equivalent refractive surfaces, prithus_examples/fresnel_lens_1.5m/
  fresnel_concentrator_1.5m.py:46-56); here the true collapsed (mod-height)
  sag with the same sag/normal -> Newton contract.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float
from ..core.safe_math import safe_div
from ..core.zernike import zernike_eval, zernike_terms, _single_term
from .base import Geometry, normalize_normal
from .standard import _conic_sag, _conic_sag_grad

__all__ = ["ZernikeSag", "GridSag", "StandardGrating", "PlaneGrating",
           "FresnelZoneSag"]


class ZernikeSag(Geometry):
    """conic + sum c_i Z_i(rho/norm_radius, phi)."""

    kind = "zernike"
    is_symmetric = False

    def __init__(self, num_terms: int, zernike_type: str = "standard"):
        self.num_terms = int(num_terms)
        self.zernike_type = zernike_type

    def default_params(self, radius=jnp.inf, conic=0.0, coefficients=None,
                       norm_radius=1.0, **kw):
        dt = default_float()
        c = jnp.zeros((self.num_terms,), dt)
        if coefficients is not None and len(coefficients):
            c = c.at[: len(coefficients)].set(jnp.asarray(coefficients, dt))
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "coefficients": c,
                "norm_radius": jnp.asarray(norm_radius, dt)}

    def sag(self, p, x, y):
        z = _conic_sag(p["radius"], p["conic"], x, y)
        rho = jnp.sqrt(x**2 + y**2) / p["norm_radius"]
        phi = jnp.arctan2(y, x)
        return z + zernike_eval(self.zernike_type, p["coefficients"], rho, phi)

    def sag_grad(self, p, x, y):
        dfdx, dfdy = _conic_sag_grad(p["radius"], p["conic"], x, y)
        nr = p["norm_radius"]
        r = jnp.sqrt(x**2 + y**2)
        r_safe = jnp.maximum(r, 1e-12)
        rho = r / nr
        phi = jnp.arctan2(y, x)
        # chain rule through (rho, phi) using jvp on each term
        import jax
        c = p["coefficients"]

        def zsum(rho_, phi_):
            return zernike_eval(self.zernike_type, c, rho_, phi_)

        _, dz_drho = jax.jvp(lambda r_: zsum(r_, phi), (rho,),
                             (jnp.ones_like(rho),))
        _, dz_dphi = jax.jvp(lambda p_: zsum(rho, p_), (phi,),
                             (jnp.ones_like(phi),))
        drho_dx = x / (r_safe * nr)
        drho_dy = y / (r_safe * nr)
        dphi_dx = -y / r_safe**2
        dphi_dy = x / r_safe**2
        dfdx = dfdx + dz_drho * drho_dx + dz_dphi * dphi_dx
        dfdy = dfdy + dz_drho * drho_dy + dz_dphi * dphi_dy
        return dfdx, dfdy


class GridSag(Geometry):
    """Tabulated sag on a regular grid, bilinear interpolation
    (reference geometries/grid_sag.py:61-103)."""

    kind = "grid_sag"
    is_symmetric = False

    def __init__(self, nx: int, ny: int):
        self.nx = int(nx)
        self.ny = int(ny)

    def default_params(self, radius=jnp.inf, conic=0.0, x_coords=None,
                       y_coords=None, sag_grid=None, **kw):
        dt = default_float()
        if x_coords is None:
            x_coords = jnp.linspace(-1.0, 1.0, self.nx)
        if y_coords is None:
            y_coords = jnp.linspace(-1.0, 1.0, self.ny)
        if sag_grid is None:
            sag_grid = jnp.zeros((self.ny, self.nx))
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "x_coords": jnp.asarray(x_coords, dt),
                "y_coords": jnp.asarray(y_coords, dt),
                "sag_grid": jnp.asarray(sag_grid, dt)}

    def _cell(self, p, x, y):
        xc, yc = p["x_coords"], p["y_coords"]
        ix = jnp.clip(jnp.searchsorted(xc, x) - 1, 0, self.nx - 2)
        iy = jnp.clip(jnp.searchsorted(yc, y) - 1, 0, self.ny - 2)
        x0 = xc[ix]
        x1 = xc[ix + 1]
        y0 = yc[iy]
        y1 = yc[iy + 1]
        tx = (x - x0) / (x1 - x0)
        ty = (y - y0) / (y1 - y0)
        g = p["sag_grid"]
        z00 = g[iy, ix]
        z01 = g[iy, ix + 1]
        z10 = g[iy + 1, ix]
        z11 = g[iy + 1, ix + 1]
        return x1 - x0, y1 - y0, tx, ty, z00, z01, z10, z11

    def sag(self, p, x, y):
        dx, dy, tx, ty, z00, z01, z10, z11 = self._cell(p, x, y)
        return ((1 - ty) * ((1 - tx) * z00 + tx * z01)
                + ty * ((1 - tx) * z10 + tx * z11))

    def sag_grad(self, p, x, y):
        dx, dy, tx, ty, z00, z01, z10, z11 = self._cell(p, x, y)
        dzdx = ((1 - ty) * (z01 - z00) + ty * (z11 - z10)) / dx
        dzdy = ((1 - tx) * (z10 - z00) + tx * (z11 - z01)) / dy
        return dzdx, dzdy


class StandardGrating(Geometry):
    """Conic surface carrying a linear grating
    (reference geometries/standard_grating.py:25). Grooves oriented at
    ``groove_angle`` in the tangent plane; period in um."""

    kind = "standard_grating"
    is_symmetric = True

    def default_params(self, radius=jnp.inf, conic=0.0, grating_order=0,
                       grating_period=1.0, groove_orientation_angle=0.0, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "grating_order": jnp.asarray(grating_order, dt),
                "grating_period": jnp.asarray(grating_period, dt),
                "groove_angle": jnp.asarray(groove_orientation_angle, dt)}

    def sag(self, p, x, y):
        return _conic_sag(p["radius"], p["conic"], x, y)

    def sag_grad(self, p, x, y):
        return _conic_sag_grad(p["radius"], p["conic"], x, y)

    def distance(self, p, x, y, z, L, M, N):
        from .base import conic_distance
        return conic_distance(p["radius"], p["conic"], x, y, z, L, M, N)

    def grating_vector(self, p, x, y):
        """Unit grating vector in the tangent plane, perpendicular to the
        grooves (reference standard_grating.py grating_vector + _tangent:
        groove tangent = normalize(1, tan(a), directional sag slope))."""
        nx, ny, nz = self.normal(p, x, y)
        ang = p["groove_angle"]
        ta = jnp.tan(ang)
        dfdx, dfdy = self.sag_grad(p, x, y)
        tx = jnp.ones_like(x)
        ty = ta * jnp.ones_like(x)
        tz = dfdx + ta * dfdy
        tmag = jnp.sqrt(tx**2 + ty**2 + tz**2)
        tx, ty, tz = tx / tmag, ty / tmag, tz / tmag
        fx = ny * tz - nz * ty
        fy = -nx * tz + nz * tx
        fz = nx * ty - ny * tx
        mag = jnp.sqrt(fx**2 + fy**2 + fz**2)
        return -fx / mag, -fy / mag, -fz / mag


class PlaneGrating(StandardGrating):
    """Plane carrying a linear grating (reference geometries/plane_grating.py:19)."""

    kind = "plane_grating"

    def default_params(self, grating_order=0, grating_period=1.0,
                       groove_orientation_angle=0.0, **kw):
        return super().default_params(radius=jnp.inf, conic=0.0,
                                      grating_order=grating_order,
                                      grating_period=grating_period,
                                      groove_orientation_angle=
                                      groove_orientation_angle)


class FresnelZoneSag(Geometry):
    """True Fresnel-lens zone surface (NEW; beyond the reference, which uses an
    equivalent refractive surface for its solar-concentrator examples).

    The parent conic profile is collapsed into annular zones of fixed depth
    ``zone_depth``: z(r) = conic_sag(r) mod zone_depth. Tracing uses the
    standard thin-Fresnel idealization: rays intersect the base plane z = 0
    (the collapsed surface is optically thin — zone_depth << aperture), then
    refract with the PARENT profile's slope, which is what the molded facets
    realize. The zoned ``sag`` is exact for rendering/metrology; facet-height
    parallax (<= zone_depth) and draft-facet shadowing are neglected, the
    universal thin-Fresnel approximation.
    """

    kind = "fresnel_zone"
    is_symmetric = True

    def default_params(self, radius=jnp.inf, conic=0.0, zone_depth=1.0, **kw):
        dt = default_float()
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "zone_depth": jnp.asarray(zone_depth, dt)}

    def sag(self, p, x, y):
        z_parent = _conic_sag(p["radius"], p["conic"], x, y)
        d = p["zone_depth"]
        return z_parent - d * jnp.floor(z_parent / d)

    def sag_grad(self, p, x, y):
        # slope of the active facet = slope of the parent profile
        return _conic_sag_grad(p["radius"], p["conic"], x, y)

    def distance(self, p, x, y, z, L, M, N):
        # thin-Fresnel: the collapsed surface sits at its base plane
        return safe_div(-z, N)


class FresnelDesignedSag(Geometry):
    """Flat Fresnel lens with facet angles DESIGNED for the flat geometry
    (NEW capability).

    Collapsing a solid-lens profile onto a plane shifts its focus (the sag
    that made the solid surface stigmatic is gone), so real molded Fresnel
    lenses choose each zone's facet angle to aim the refracted ray at the
    focus from the flat plane. For a glass(n)->air exit facet and collimated
    input the exact facet slope is

        dz/dr = -sin(theta) / (n_design - cos(theta)),
        tan(theta) = r / f    (theta = required bend toward the focus)

    Params: ``focal_length``, ``n_design`` (the index the zones were cut
    for), plus radius/conic (inf/0) for the paraxial interface. Tracing uses
    the thin-surface idealization (base plane + designed facet slope).
    """

    kind = "fresnel_designed"
    is_symmetric = True

    def default_params(self, radius=None, conic=0.0, focal_length=100.0,
                       n_design=1.5, zone_depth=1.0, **kw):
        dt = default_float()
        if radius is None or (isinstance(radius, float) and
                              not jnp.isfinite(radius)):
            # paraxial-equivalent radius so first-order properties (f2, EPL,
            # ray aiming) see the lens power: phi = (1 - n)/R = 1/f
            radius = -(n_design - 1.0) * focal_length
        return {"radius": jnp.asarray(radius, dt),
                "conic": jnp.asarray(conic, dt),
                "focal_length": jnp.asarray(focal_length, dt),
                "n_design": jnp.asarray(n_design, dt),
                "zone_depth": jnp.asarray(zone_depth, dt)}

    def _slope(self, p, r):
        f = p["focal_length"]
        n = p["n_design"]
        hyp = jnp.sqrt(r**2 + f**2)
        sin_t = r / hyp
        cos_t = f / hyp
        return -sin_t / (n - cos_t)

    def sag(self, p, x, y):
        # thin surface: optical sag ~ 0 (zones are rendered via zone_depth
        # in visualization only)
        return jnp.zeros_like(x + y)

    def sag_grad(self, p, x, y):
        r = jnp.sqrt(x**2 + y**2)
        r_safe = jnp.maximum(r, 1e-12)
        m = self._slope(p, r)
        return m * x / r_safe, m * y / r_safe

    def distance(self, p, x, y, z, L, M, N):
        return safe_div(-z, N)
