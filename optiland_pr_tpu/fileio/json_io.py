"""JSON system persistence, compatible with the reference schema.

Reference: optiland/fileio/optiland_handler.py:21-80 + per-class versioned
to_dict/from_dict (optic/optic.py:649-713). Here serialization captures the
*builder* prescription (the host-side description), which round-trips exactly;
an importer also reads the reference's own saved files (type names like
"StandardGeometry"/"Material" are mapped onto our models).
"""
from __future__ import annotations

import json

import numpy as np

from ..system import Optic

__all__ = ["optic_to_dict", "optic_from_dict", "save_optiland_file",
           "load_optiland_file", "save_optic", "load_optic"]


def _jsonable(v):
    if hasattr(v, "tolist"):
        v = np.asarray(v).tolist()
    if isinstance(v, float) and (v == float("inf") or v == float("-inf")):
        return "Infinity" if v > 0 else "-Infinity"
    return v


def _unjson(v):
    if v == "Infinity":
        return float("inf")
    if v == "-Infinity":
        return float("-inf")
    return v


def _material_to_json(mat):
    """Serialize an add_surface material spec. Strings/numbers/None pass
    through; MaterialModel instances (ideal/abbe/grin) become tagged dicts
    (the reference serializes materials through per-class to_dict,
    optiland/materials/base.py)."""
    from ..materials import MaterialModel
    if mat is None or isinstance(mat, (str, int, float)):
        return mat
    if isinstance(mat, tuple) and not isinstance(mat[0], MaterialModel):
        return list(mat)
    if isinstance(mat, MaterialModel):
        model, prm = mat, mat.default_params()
    else:
        model, prm = mat

    def scal(d):
        return {k: (scal(v) if isinstance(v, dict)
                    else np.asarray(v).tolist()) for k, v in d.items()}

    out = {"__material__": model.kind, "params": scal(prm)}
    if model.kind == "grin":
        out["base_kind"] = model.base.kind
        out["n_steps"] = model.n_steps
        out["overshoot"] = model.overshoot
    return out


def _material_from_json(mat):
    """Inverse of _material_to_json."""
    if not isinstance(mat, dict) or "__material__" not in mat:
        return tuple(mat) if isinstance(mat, list) else mat
    from ..materials import AbbeMaterial, GrinMaterial, IdealMaterial
    kind = mat["__material__"]
    prm = mat.get("params", {})
    if kind == "ideal":
        m = IdealMaterial()
        return (m, m.default_params(**prm))
    if kind == "abbe":
        m = AbbeMaterial()
        return (m, m.default_params(**prm))
    if kind == "grin":
        base_prm = prm.pop("base", {})
        if mat.get("base_kind", "ideal") == "abbe":
            base = AbbeMaterial()
        else:
            base = IdealMaterial()
        m = GrinMaterial(base, n_steps=mat.get("n_steps", 64),
                         overshoot=mat.get("overshoot", 1.5))
        return (m, m.default_params(**prm, **base_prm))
    raise ValueError(f"Cannot deserialize material kind {kind!r}")


def optic_to_dict(optic: Optic) -> dict:
    """Serialize the builder prescription (native schema, version 1)."""
    surfaces = []
    for e in optic._surfaces:
        entry = {k: _jsonable(v) for k, v in e.items()
                 if k not in ("geom_kw", "coating", "bsdf")}
        entry["geom_kw"] = {k: _jsonable(v) for k, v in e["geom_kw"].items()
                            if k not in ("phase_profile",)}
        entry["material"] = _material_to_json(e["material"])
        if e["coating"] is not None:
            entry["coating"] = getattr(e["coating"], "kind", str(e["coating"]))
        surfaces.append(entry)
    return {
        "version": 1.0,
        "generator": "optiland_pr_tpu",
        "aperture": {"type": optic.ap_type, "value": optic.ap_value},
        "field_type": optic.field_type,
        "fields": [list(f) for f in optic.fields],
        "wavelengths": list(optic.wavelengths),
        "primary_wavelength_idx": optic.primary_wavelength_idx,
        "polarization": optic.polarization
        if isinstance(optic.polarization, str) else "polarized",
        "surfaces": surfaces,
        "name": optic.name,
    }


def optic_from_dict(data: dict) -> Optic:
    """Build an Optic from either the native schema or the reference's
    to_dict schema (version key + surface_group)."""
    if "surface_group" in data:
        return _from_reference_dict(data)
    optic = Optic(name=data.get("name"))
    for e in data["surfaces"]:
        kw = dict(e.get("geom_kw", {}))
        mat = _material_from_json(e.get("material"))
        optic.add_surface(
            surface_type=e.get("surface_type", "standard"),
            radius=_unjson(e.get("radius", float("inf"))),
            thickness=_unjson(e.get("thickness", 0.0)),
            conic=e.get("conic", 0.0),
            material=mat,
            is_stop=e.get("is_stop", False),
            comment=e.get("comment", ""),
            dx=e.get("dx", 0.0), dy=e.get("dy", 0.0), dz=e.get("dz", 0.0),
            rx=e.get("rx", 0.0), ry=e.get("ry", 0.0), rz=e.get("rz", 0.0),
            aperture=e.get("aperture"),
            coating=e.get("coating"),
            **{k: _unjson(v) for k, v in kw.items()},
        )
    ap = data["aperture"]
    optic.set_aperture(ap["type"], ap["value"])
    optic.set_field_type(data.get("field_type", "angle"))
    for f in data["fields"]:
        x, y = f[0], f[1]
        vx = f[2] if len(f) > 2 else 0.0
        vy = f[3] if len(f) > 3 else 0.0
        optic.add_field(y=y, x=x, vx=vx, vy=vy)
    for i, wl in enumerate(data["wavelengths"]):
        optic.add_wavelength(wl, is_primary=(
            i == data.get("primary_wavelength_idx", 0)))
    return optic


_REF_FIELD_TYPES = {"AngleField": "angle", "ObjectHeightField": "object_height",
                    "ParaxialImageHeightField": "paraxial_image_height"}

_REF_GEOMETRY_TYPES = {
    "Plane": "standard", "StandardGeometry": "standard",
    "EvenAsphere": "even_asphere", "OddAsphere": "odd_asphere",
    "PolynomialGeometry": "polynomial",
    "ChebyshevPolynomialGeometry": "chebyshev",
    "ZernikePolynomialGeometry": "zernike",
    "ToroidalGeometry": "toroidal", "BiconicGeometry": "biconic",
    "StandardGratingGeometry": "grating", "PlaneGrating": "grating",
}


def _ref_material_spec(m: dict):
    if m is None:
        return None
    t = m.get("type")
    if t == "IdealMaterial":
        return float(m.get("index", m.get("n", 1.0))) \
            if float(m.get("index", m.get("n", 1.0))) != 1.0 else None
    if t == "AbbeMaterial":
        return ("abbe", float(m["index"]), float(m["abbe"]))
    if t in ("Material", "MaterialFile"):
        name = m.get("name")
        ref = m.get("reference")
        if name is None and m.get("filename"):
            name = m["filename"].rsplit("/", 1)[-1].split(".yml")[0]
        return (name, ref) if ref else name
    if t == "Mirror":
        return "mirror"
    return None


def _from_reference_dict(data: dict) -> Optic:
    """Import a reference-format saved system (optic/optic.py:649-713)."""
    optic = Optic()
    surfaces = data["surface_group"]["surfaces"]
    for i, s in enumerate(surfaces):
        g = s.get("geometry", {})
        gtype = _REF_GEOMETRY_TYPES.get(g.get("type"), "standard")
        cs = g.get("cs", {})
        kw = {}
        for key in ("coefficients", "norm_x", "norm_y", "norm_radius",
                    "zernike_type", "coeffs_poly_y"):
            if key in g:
                kw[key] = g[key]
        if g.get("type") == "ToroidalGeometry":
            kw["radius_rot"] = g.get("radius_x", g.get("R_rot"))
        if g.get("type") == "BiconicGeometry":
            kw["radius_x"] = g.get("radius_x", float("inf"))
            kw["conic_x"] = g.get("conic_x", 0.0)
        im = s.get("interaction_model", {})
        is_reflective = im.get("is_reflective", False)
        mat = "mirror" if is_reflective else _ref_material_spec(
            s.get("material_post"))
        radius = g.get("radius", float("inf"))
        optic.add_surface(
            surface_type=gtype,
            radius=_unjson(radius) if radius is not None else float("inf"),
            thickness=_unjson(s.get("thickness", 0.0)) or 0.0,
            conic=g.get("conic", 0.0),
            material=mat,
            is_stop=s.get("is_stop", False),
            comment=s.get("comment", ""),
            dx=cs.get("x", 0.0), dy=cs.get("y", 0.0),
            rx=cs.get("rx", 0.0), ry=cs.get("ry", 0.0), rz=cs.get("rz", 0.0),
            aperture=None,
            **kw,
        )
        # object surface thickness: infinite object encoded via cs.z = -inf
        if i == 0 and cs.get("z") in (float("-inf"), "-Infinity"):
            optic._surfaces[0]["thickness"] = float("inf")
    ap = data["aperture"]
    optic.set_aperture(ap["type"], ap["value"])
    fd = data["fields"].get("field_definition", {}).get("field_type",
                                                        "AngleField")
    optic.set_field_type(_REF_FIELD_TYPES.get(fd, "angle"))
    for f in data["fields"]["fields"]:
        optic.add_field(y=f["y"], x=f.get("x", 0.0), vx=f.get("vx", 0.0),
                        vy=f.get("vy", 0.0))
    for w in data["wavelengths"]["wavelengths"]:
        optic.add_wavelength(w["value"], is_primary=w.get("is_primary", False),
                             unit=w.get("unit", "um"))
    return optic


def save_optiland_file(optic: Optic, path: str):
    with open(path, "w") as f:
        json.dump(optic_to_dict(optic), f, indent=1)


def load_optiland_file(path: str) -> Optic:
    with open(path) as f:
        return optic_from_dict(json.load(f))


# aliases mirroring the reference function names
save_optic = save_optiland_file
load_optic = load_optiland_file
