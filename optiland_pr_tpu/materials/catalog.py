"""Glass-catalog lookup and material resolution.

The standalone catalog (``data/glass_catalog.json``) holds dispersion
coefficients extracted from the public refractiveindex.info database for the
glasses used by the sample library; see tools/gen_catalog.py. A larger external
database directory can be pointed to later without code changes.

The reference resolves names by similarity scoring against a packaged CSV
(optiland/materials/material.py:22-60); here names must match the curated
catalog (case-insensitive), which covers the whole sample library.
"""
from __future__ import annotations

import json
from functools import lru_cache
from importlib import resources

from .base import (AIR, MIRROR, AbbeMaterial, FormulaMaterial, IdealMaterial,
                   MaterialModel, Mirror, TabulatedMaterial)

__all__ = ["glass", "resolve_material", "catalog_names"]


@lru_cache(maxsize=1)
def _catalog() -> dict:
    path = resources.files("optiland_pr_tpu.data").joinpath("glass_catalog.json")
    with resources.as_file(path) as f:
        with open(str(f)) as fh:
            return json.load(fh)


def catalog_names():
    return sorted(_catalog().keys())


def _find_entry(name: str, reference: str | None = None) -> dict:
    cat = _catalog()
    keys = [f"{name}|{reference}"] if reference else [name]
    if not reference:
        # a reference-qualified entry may be the only one present
        keys += [k for k in cat if k.split("|")[0].upper() == name.upper()]
    for key in keys:
        for k in cat:
            if k.upper() == key.upper():
                return cat[k]
    raise KeyError(
        f"Glass {name!r} (reference={reference!r}) not in the catalog. "
        f"Known: {', '.join(catalog_names()[:10])}...")


def glass(name: str, reference: str | None = None):
    """Return (MaterialModel, params) for a catalog glass."""
    e = _find_entry(name, reference)
    has_k = "k_values" in e
    if "formula" in e:
        has_thermal = "thermal_dispersion" in e
        model = FormulaMaterial(e["formula"], len(e["coefficients"]),
                                has_k_table=has_k,
                                k_table_len=len(e.get("k_values", [])),
                                has_thermal=has_thermal)
        params = model.default_params(
            coefficients=e["coefficients"],
            k_wavelength=e.get("k_wavelength"),
            k_values=e.get("k_values"),
            t0_celsius=e.get("t0_celsius"),
            thermal_dispersion=e.get("thermal_dispersion"))
    else:
        model = TabulatedMaterial(len(e["n_values"]), has_k_table=has_k,
                                  k_table_len=len(e.get("k_values", [])))
        params = model.default_params(n_wavelength=e["n_wavelength"],
                                      n_values=e["n_values"],
                                      k_wavelength=e.get("k_wavelength"),
                                      k_values=e.get("k_values"))
    return model, params


def resolve_material(spec):
    """Resolve an ``add_surface(material=...)`` spec to (model, params).

    Accepts: None/"air" (air), "mirror", a float/int (ideal index), a glass
    name, a (name, reference) tuple, an (n_d, V_d) numeric tuple via
    ``("abbe", n, v)``, a MaterialModel (with default params), or an explicit
    (MaterialModel, params) pair.
    """
    if spec is None or (isinstance(spec, str) and spec.lower() == "air"):
        return AIR, AIR.default_params()
    if isinstance(spec, str) and spec.lower() == "mirror":
        return MIRROR, {}
    if isinstance(spec, (int, float)):
        m = IdealMaterial()
        return m, m.default_params(n=float(spec))
    if isinstance(spec, str):
        return glass(spec)
    if isinstance(spec, tuple):
        if len(spec) == 2 and isinstance(spec[0], str) and isinstance(spec[1], str):
            return glass(*spec)
        if len(spec) == 3 and spec[0] == "abbe":
            m = AbbeMaterial()
            return m, m.default_params(n=spec[1], abbe=spec[2])
        if len(spec) == 2 and isinstance(spec[0], MaterialModel):
            return spec
    if isinstance(spec, MaterialModel):
        return spec, spec.default_params()
    raise ValueError(f"Cannot resolve material spec: {spec!r}")
