"""AutoLens JSON interchange (the fork's integration surface).

Reference: /root/reference/optiland_autolens_integration.py:109-170
(`optiland_to_autolens` / `autolens_to_optiland`) and the shipped artifact
`integrated_analysis_20251211_010713/fresnel_autolens_format.json` — a flat
per-surface schema (index / radius / thickness / material / conic, with
"infinity" strings for unbounded values) plus fields (y in degrees),
wavelengths (um) and the system aperture.
"""
from __future__ import annotations

import json

import numpy as np

__all__ = ["optic_to_autolens", "autolens_to_optic", "save_autolens_file",
           "load_autolens_file"]


def _num(v):
    v = float(np.asarray(v))
    return "infinity" if np.isinf(v) else v


def _denum(v, default=np.inf):
    if isinstance(v, str):
        return np.inf if v in ("infinity", "inf") else float(v)
    return float(v) if v is not None else default


def optic_to_autolens(optic) -> dict:
    """Serialize an Optic prescription to the AutoLens interchange dict
    (reference optiland_to_autolens)."""
    surfaces = []
    for i, e in enumerate(optic._surfaces):
        mat = e["material"]
        if mat is None:
            mat_name = "air"
        elif isinstance(mat, str):
            mat_name = mat
        elif isinstance(mat, (int, float)):
            mat_name = f"ideal:{float(mat)}"
        elif isinstance(mat, tuple) and mat and isinstance(mat[0], str):
            # keep the catalog reference ("F2", "schott") -> "F2@schott" so
            # the roundtrip re-resolves the SAME glass file
            mat_name = mat[0] if len(mat) < 2 or not isinstance(mat[1], str) \
                else f"{mat[0]}@{mat[1]}"
        else:
            mat_name = "air"
        entry = {
            "index": i,
            "radius": _num(e["radius"]),
            "thickness": _num(e["thickness"]),
            "material": mat_name,
            "conic": float(np.asarray(e["conic"])),
        }
        # the reference schema is lossy here, but our reader honors the key:
        # emit it so a central-stop system self round-trips faithfully
        if e.get("is_stop"):
            entry["aperture_stop"] = True
        surfaces.append(entry)
    return {
        "lens_name": optic.name or "optiland_pr_tpu_export",
        "surfaces": surfaces,
        "fields": [float(f[1]) for f in optic.fields],
        "wavelengths": [float(w) for w in optic.wavelengths],
        "aperture": {"type": optic.ap_type, "value": float(optic.ap_value)},
    }


def autolens_to_optic(data: dict):
    """Rebuild an Optic from the AutoLens interchange dict (reference
    autolens_to_optiland)."""
    from ..system.optic import Optic

    lens = Optic(name=data.get("lens_name"))
    for s in data["surfaces"]:
        mat = s.get("material", "air")
        if mat in ("air", None, ""):
            mat = None
        elif isinstance(mat, str) and mat.startswith("ideal:"):
            mat = float(mat.split(":", 1)[1])
        elif isinstance(mat, str) and "@" in mat:
            name, ref = mat.split("@", 1)
            mat = (name, ref)
        lens.add_surface(
            index=int(s["index"]),
            radius=_denum(s.get("radius")),
            thickness=_denum(s.get("thickness"), 0.0),
            conic=float(s.get("conic", 0.0)),
            material=mat,
            is_stop=bool(s.get("aperture_stop", False)),
        )
    # the schema has no explicit stop marker on most artifacts; default to
    # the first inner surface if none was flagged
    if not any(e["is_stop"] for e in lens._surfaces) and len(lens._surfaces) > 2:
        lens._surfaces[1]["is_stop"] = True
    ap = data.get("aperture", {"type": "EPD", "value": 1.0})
    lens.set_aperture(aperture_type=ap.get("type", "EPD"),
                      value=float(ap.get("value", 1.0)))
    lens.set_field_type(field_type="angle")
    for y in data.get("fields", [0.0]):
        lens.add_field(y=float(y))
    wls = data.get("wavelengths", [0.55])
    for i, w in enumerate(wls):
        lens.add_wavelength(value=float(w), is_primary=(i == len(wls) // 2))
    return lens


def save_autolens_file(optic, path: str):
    with open(path, "w") as f:
        json.dump(optic_to_autolens(optic), f, indent=2)


def load_autolens_file(path: str):
    with open(path) as f:
        return autolens_to_optic(json.load(f))
