"""Material models: static structure + parameterized n(λ)/k(λ).

Redesign of the reference material hierarchy (optiland/materials/base.py:22,
ideal.py, abbe.py, material_file.py:82-470) for jit: a material is a *static*
model object whose numeric state (constants, dispersion coefficients, tabulated
data) lives in the per-surface parameter pytree, so refractive indices are
differentiable (the reference's "index" and "material" optimization variables).
"""
from __future__ import annotations

from importlib import resources

import numpy as np
import jax.numpy as jnp

from ..config import default_float
from .dispersion import evaluate_formula, nair_edlen

__all__ = ["MaterialModel", "IdealMaterial", "AbbeMaterial", "FormulaMaterial",
           "TabulatedMaterial", "AIR", "MIRROR", "Mirror"]


class MaterialModel:
    kind: str = "base"
    is_grin: bool = False  # GRIN media override (materials/grin.py)

    def default_params(self, **kw) -> dict:
        raise NotImplementedError

    def n(self, p, wavelength_um):
        raise NotImplementedError

    def k(self, p, wavelength_um):
        return jnp.zeros_like(jnp.asarray(wavelength_um))

    @property
    def absorbing(self) -> bool:
        """Static hint: True if k may be nonzero (enables attenuation ops)."""
        return False

    def __repr__(self):
        return f"{type(self).__name__}()"


class IdealMaterial(MaterialModel):
    """Constant n, k (reference materials/ideal.py). Constructor defaults
    mirror the reference API: ``IdealMaterial(n=4.002)``."""

    kind = "ideal"

    def __init__(self, n: float = 1.0, k: float = 0.0,
                 absorbing: bool | None = None):
        self._n = n
        self._k = k
        self._absorbing = (k != 0.0) if absorbing is None else absorbing

    def default_params(self, n=None, k=None, **kw) -> dict:
        dt = default_float()
        return {"n": jnp.asarray(self._n if n is None else n, dt),
                "k": jnp.asarray(self._k if k is None else k, dt)}

    def n(self, p, wavelength_um):
        return p["n"] * jnp.ones_like(jnp.asarray(wavelength_um))

    def k(self, p, wavelength_um):
        return p["k"] * jnp.ones_like(jnp.asarray(wavelength_um))

    @property
    def absorbing(self):
        return self._absorbing


_ABBE_COEFFS = None


def _abbe_model_coefficients():
    """Load the Schott-catalog polynomial fit matrix (data asset extracted from
    the public glass-fit used by the reference; see tools/gen_full_catalog.py)."""
    global _ABBE_COEFFS
    if _ABBE_COEFFS is None:
        path = resources.files("optiland_pr_tpu.data").joinpath(
            "abbe_model_coefficients.npy")
        with resources.as_file(path) as f:
            _ABBE_COEFFS = np.load(str(f))
    return _ABBE_COEFFS


class AbbeMaterial(MaterialModel):
    """n from (n_d, V_d) via a polynomial fit to Schott catalog data
    (reference materials/abbe.py:19-100). Valid 0.380-0.750 um."""

    kind = "abbe"

    def default_params(self, n=1.5, abbe=50.0, **kw) -> dict:
        dt = default_float()
        return {"index": jnp.asarray(n, dt), "abbe": jnp.asarray(abbe, dt)}

    def n(self, p, wavelength_um):
        coeffs = jnp.asarray(_abbe_model_coefficients(), default_float())
        nd, vd = p["index"], p["abbe"]
        X = jnp.stack([nd, vd, nd**2, vd**2, nd**3, vd**3])
        poly = X @ coeffs
        return jnp.polyval(poly, jnp.asarray(wavelength_um))


class FormulaMaterial(MaterialModel):
    """Dispersion-formula material (refractiveindex.info formulas 1-9), with
    optional tabulated extinction coefficient (reference material_file.py)."""

    kind = "formula"

    def __init__(self, formula_id: int, num_coefficients: int,
                 has_k_table: bool = False, k_table_len: int = 0,
                 has_thermal: bool = False):
        self.formula_id = int(formula_id)
        self.num_coefficients = int(num_coefficients)
        self.has_k_table = bool(has_k_table)
        self.k_table_len = int(k_table_len)
        self.has_thermal = bool(has_thermal)

    def default_params(self, coefficients=None, k_wavelength=None, k_values=None,
                       t0_celsius=None, thermal_dispersion=None, **kw) -> dict:
        dt = default_float()
        c = jnp.zeros((self.num_coefficients,), dt)
        if coefficients is not None:
            c = jnp.asarray(coefficients, dt)
        p = {"coefficients": c}
        if self.has_k_table:
            p["k_wavelength"] = jnp.asarray(k_wavelength, dt)
            p["k_values"] = jnp.asarray(k_values, dt)
        if self.has_thermal:
            p["t0_celsius"] = jnp.asarray(t0_celsius if t0_celsius is not None
                                          else 20.0, dt)
            p["thermal_dispersion"] = jnp.asarray(
                thermal_dispersion if thermal_dispersion is not None
                else [0.0] * 6, dt)
        return p

    def n(self, p, wavelength_um, temperature=None, pressure=None):
        """Catalog index; with ``temperature`` given and thermal data present,
        applies the Schott dn/dT correction + air-index rescaling exactly as
        the reference (materials/material_file.py:96-232)."""
        w = jnp.asarray(wavelength_um)
        if temperature is None or not self.has_thermal:
            return evaluate_formula(self.formula_id, p["coefficients"], w)
        pressure = 1.0 if pressure is None else pressure
        t0 = p["t0_celsius"]
        c = p["thermal_dispersion"]
        # relative wavelength scaled by air-index ratio
        waverel = w * nair_edlen(w, temperature, pressure) /             nair_edlen(w, t0, 1.0)
        base = evaluate_formula(self.formula_id, p["coefficients"], waverel)
        n_air_ref = nair_edlen(w, t0, 1.0)
        n_abs = base * n_air_ref
        dT = temperature - t0
        term1 = c[0] + c[1] * dT + c[2] * dT**2
        term2 = (c[3] + c[4] * dT) / (w**2 - c[5] ** 2)
        dn_abs = (n_abs**2 - 1.0) / (2.0 * n_abs) * (term1 + term2) * dT
        n_abs = n_abs + dn_abs
        return n_abs / nair_edlen(w, temperature, pressure)

    def k(self, p, wavelength_um):
        w = jnp.asarray(wavelength_um)
        if not self.has_k_table:
            return jnp.zeros_like(w)
        return jnp.interp(w, p["k_wavelength"], p["k_values"])

    @property
    def absorbing(self):
        return self.has_k_table

    def __repr__(self):
        return (f"FormulaMaterial(formula={self.formula_id}, "
                f"ncoeff={self.num_coefficients})")


class TabulatedMaterial(MaterialModel):
    """Interpolated n (and optionally k) tables."""

    kind = "tabulated"

    def __init__(self, n_table_len: int, has_k_table: bool = False,
                 k_table_len: int = 0):
        self.n_table_len = int(n_table_len)
        self.has_k_table = bool(has_k_table)
        self.k_table_len = int(k_table_len)

    def default_params(self, n_wavelength=None, n_values=None,
                       k_wavelength=None, k_values=None, **kw) -> dict:
        dt = default_float()
        p = {"n_wavelength": jnp.asarray(n_wavelength, dt),
             "n_values": jnp.asarray(n_values, dt)}
        if self.has_k_table:
            p["k_wavelength"] = jnp.asarray(k_wavelength, dt)
            p["k_values"] = jnp.asarray(k_values, dt)
        return p

    def n(self, p, wavelength_um):
        w = jnp.asarray(wavelength_um)
        return jnp.interp(w, p["n_wavelength"], p["n_values"])

    def k(self, p, wavelength_um):
        w = jnp.asarray(wavelength_um)
        if not self.has_k_table:
            return jnp.zeros_like(w)
        return jnp.interp(w, p["k_wavelength"], p["k_values"])

    @property
    def absorbing(self):
        return self.has_k_table


class Mirror(MaterialModel):
    """Sentinel: reflective surface; the post-material equals the pre-material
    (the builder resolves it)."""

    kind = "mirror"

    def default_params(self, **kw) -> dict:
        return {}


AIR = IdealMaterial()
MIRROR = Mirror()
