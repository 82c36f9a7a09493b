"""Zemax .zmx import (reference optiland/fileio/zemax_handler.py:53-368 +
converters.py:16-238).

Parses sequential-mode .zmx files (MODE SEQ): surfaces (STANDARD/EVENASPH/
ODDASPHE/TOROIDAL/COORDBRK), curvature, thickness, conic, glass, stop flag,
aperture (ENPD / FNO / object NA), fields (angle / object height, with
vignetting factors), wavelengths, and even-asphere PARM coefficients. Handles
latin-1-encoded files like the reference.
"""
from __future__ import annotations

import re

from ..system import Optic

__all__ = ["load_zemax_file", "ZemaxFileReader"]

_GLASS_ABBE_FALLBACK = True


def _read_text(path: str) -> str:
    with open(path, "rb") as f:
        raw = f.read()
    for enc in ("utf-16", "utf-8", "latin-1"):
        try:
            txt = raw.decode(enc)
            if "SURF" in txt or "MODE" in txt:
                return txt
        except (UnicodeDecodeError, UnicodeError):
            continue
    raise ValueError(f"cannot decode {path}")


class ZemaxFileReader:
    """Tokenizer/parser producing a system prescription dict."""

    def __init__(self, path: str):
        self.path = path
        self.data = {
            "aperture": None, "fields": [], "field_type": "angle",
            "wavelengths": [], "primary_idx": 0, "surfaces": [],
            "vig_x": [], "vig_y": [],
        }
        self._parse(_read_text(path))

    def _parse(self, text: str):
        cur = None
        for line in text.splitlines():
            if line.startswith("SURF"):
                cur = {"type": "STANDARD", "curv": 0.0, "disz": 0.0,
                       "conic": 0.0, "glass": None, "stop": False,
                       "parm": {}, "decenter": [0.0, 0.0],
                       "tilt": [0.0, 0.0, 0.0], "mirror": False, "diam": None}
                self.data["surfaces"].append(cur)
                continue
            tokens = line.split()
            if not tokens:
                continue
            tag = tokens[0]
            if cur is not None and line.startswith("  "):
                self._surface_token(cur, tag, tokens[1:])
            else:
                cur = None
                self._global_token(tag, tokens[1:])

    def _global_token(self, tag, args):
        d = self.data
        if tag == "ENPD":
            d["aperture"] = ("EPD", float(args[0]))
        elif tag == "FNUM":
            d["aperture"] = ("imageFNO", float(args[0]))
        elif tag == "OBNA":
            d["aperture"] = ("objectNA", float(args[0]))
        elif tag == "FLOA":
            # floating stop: value resolved from the stop surface's DIAM
            # (reference zemax_handler.py:196-197 + converters.py:253-267)
            d["aperture"] = ("float_by_stop_size", None)
        elif tag == "FTYP":
            # field type: 0 = angle, 1 = object height, 2/3 = image height
            ft = int(args[0])
            d["field_type"] = {0: "angle", 1: "object_height",
                               2: "paraxial_image_height",
                               3: "paraxial_image_height"}.get(ft, "angle")
        elif tag == "XFLN":
            d["_xfln"] = [float(v) for v in args]
        elif tag == "YFLN":
            d["_yfln"] = [float(v) for v in args]
        elif tag == "VCYF" or tag == "ZVCY":
            d["vig_y"] = [float(v) for v in args]
        elif tag == "VCXF" or tag == "ZVCX":
            d["vig_x"] = [float(v) for v in args]
        elif tag == "WAVM":
            idx = int(args[0])
            d["wavelengths"].append((idx, float(args[1])))
        elif tag == "PWAV":
            d["primary_idx"] = int(args[0]) - 1

    def _surface_token(self, cur, tag, args):
        if tag == "TYPE":
            cur["type"] = args[0]
        elif tag == "CURV":
            cur["curv"] = float(args[0])
        elif tag == "DISZ":
            cur["disz"] = float("inf") if args[0] == "INFINITY" \
                else float(args[0])
        elif tag == "CONI":
            cur["conic"] = float(args[0])
        elif tag == "GLAS":
            name = args[0]
            if name.upper() == "MIRROR":
                cur["mirror"] = True
            else:
                entry = {"name": name}
                if len(args) >= 5:
                    entry["nd"] = float(args[3])
                    entry["vd"] = float(args[4])
                cur["glass"] = entry
        elif tag == "STOP":
            cur["stop"] = True
        elif tag == "PARM":
            cur["parm"][int(args[0])] = float(args[1])
        elif tag == "DIAM":
            cur["diam"] = float(args[0])
        elif tag == "DCBK" or tag == "DECX":
            cur["decenter"][0] = float(args[0])
        elif tag == "DECY":
            cur["decenter"][1] = float(args[0])

    # ------------------------------------------------------------------
    @staticmethod
    def _rot(rx, ry, rz):
        """Rz @ Ry @ Rx (reference coordinate_system.py:121-143)."""
        import numpy as np
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return Rz @ Ry @ Rx

    def generate_lens(self) -> Optic:
        d = self.data
        optic = Optic(name=self.path)
        surfaces = d["surfaces"]
        import numpy as np
        has_cb = any(s["type"] == "COORDBRK" for s in surfaces)
        T = np.zeros(3)        # chained coordinate-break transform
        Rm = np.eye(3)         # (reference converters.py:54-158)
        z_accum = 0.0
        first = True
        for i, s in enumerate(surfaces):
            if s["type"] == "COORDBRK":
                # decenters + tilts rotate the chain; the CB's own
                # "thickness" advances along the NEW local z
                dx = s["parm"].get(1, 0.0)
                dy = s["parm"].get(2, 0.0)
                rx = np.deg2rad(s["parm"].get(3, 0.0))
                ry = np.deg2rad(s["parm"].get(4, 0.0))
                rz = np.deg2rad(s["parm"].get(5, 0.0))
                T = T + Rm @ np.array([dx, dy, 0.0])
                Rm = Rm @ self._rot(rx, ry, rz)
                T = T + Rm @ np.array([0.0, 0.0, s["disz"]])
                continue
            radius = float("inf") if s["curv"] == 0 else 1.0 / s["curv"]
            material = None
            if s["mirror"]:
                material = "mirror"
            elif s["glass"] is not None:
                g = s["glass"]
                try:
                    from ..materials import glass as lookup
                    lookup(g["name"])
                    material = g["name"]
                except Exception:
                    if "nd" in g:
                        material = ("abbe", g["nd"], g["vd"])
                    else:
                        raise
            surface_type = "standard"
            kw = {}
            if s["type"] == "EVENASPH":
                surface_type = "even_asphere"
                coeffs = [s["parm"].get(j, 0.0) for j in
                          range(1, max(s["parm"].keys() or [0]) + 1)]
                kw["coefficients"] = coeffs
            elif s["type"] == "ODDASPHE":
                surface_type = "odd_asphere"
                coeffs = [s["parm"].get(j, 0.0) for j in
                          range(1, max(s["parm"].keys() or [0]) + 1)]
                kw["coefficients"] = coeffs
            elif s["type"] == "TOROIDAL":
                # CURV is the Y-Z curve radius; PARM2 the rotation radius;
                # PARM3+ the y-polynomial coefficients (reference
                # converters.py:112-124, param_j == PARM j+1)
                surface_type = "toroidal"
                rrot = s["parm"].get(2, 0.0)
                kw["radius_rot"] = float("inf") if rrot == 0.0 else rrot
                cmax = max([j for j in s["parm"] if j >= 3] or [2])
                kw["coeffs_poly_y"] = [s["parm"].get(j, 0.0)
                                       for j in range(3, cmax + 1)]
            cs_kw = {}
            if has_cb and not first:
                from scipy.spatial.transform import Rotation
                eul = Rotation.from_matrix(Rm).as_euler("xyz")
                cs_kw = dict(dx=float(T[0]), dy=float(T[1]),
                             dz=float(T[2] - z_accum),
                             rx=float(eul[0]), ry=float(eul[1]),
                             rz=float(eul[2]))
            optic.add_surface(
                surface_type=surface_type,
                radius=radius, thickness=s["disz"], conic=s["conic"],
                material=material, is_stop=s["stop"], **cs_kw, **kw)
            dt_s = s["disz"]
            if not first and np.isfinite(dt_s):
                T = T + Rm @ np.array([0.0, 0.0, dt_s])
                z_accum += dt_s
            first = False
        if d["aperture"] is not None:
            ap_type, ap_value = d["aperture"]
            if ap_type == "float_by_stop_size" and ap_value is None:
                for s in surfaces:
                    if s["stop"] and s["diam"] is not None:
                        ap_value = s["diam"]
                        break
                if ap_value is None:
                    raise ValueError("floating stop but no stop diameter")
            optic.set_aperture(ap_type, ap_value)
        optic.set_field_type(d["field_type"])
        xf = d.get("_xfln", [0.0])
        yf = d.get("_yfln", [0.0])
        n_fields = max(len([v for v in yf if True]), 1)
        # zemax pads field lists; keep entries up to the last nonzero pair
        pairs = list(zip(xf, yf))
        while len(pairs) > 1 and pairs[-1] == (0.0, 0.0):
            pairs.pop()
        for i, (x, y) in enumerate(pairs):
            vx = d["vig_x"][i] if i < len(d["vig_x"]) else 0.0
            vy = d["vig_y"][i] if i < len(d["vig_y"]) else 0.0
            optic.add_field(y=y, x=x, vx=vx, vy=vy)
        wls = sorted(d["wavelengths"])
        for i, (idx, wl) in enumerate(wls):
            optic.add_wavelength(wl, is_primary=(i == d["primary_idx"]))
        return optic


def load_zemax_file(path: str) -> Optic:
    return ZemaxFileReader(path).generate_lens()
