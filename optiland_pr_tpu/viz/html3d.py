"""Self-contained interactive 3-D HTML export of an optical system.

Closes the interactivity gap with the reference's VTK viewer
(optiland/visualization/system/optic_viewer_3d.py:22 — Lens3D/Mirror3D/Rays3D
with an interactive render window) WITHOUT the host-side VTK/Qt dependency:
the exported file embeds the surface wireframes + traced ray polylines as
JSON and a ~100-line canvas renderer (orbit / zoom / pan with the mouse),
so it opens in any browser with zero dependencies and zero network access.
"""
from __future__ import annotations

import json

import numpy as np

__all__ = ["system_scene", "export_html"]


def system_scene(optic, fields="all", wavelength=None, num_rays: int = 24,
                 distribution: str = "ring", n_theta: int = 32,
                 n_r: int = 7) -> dict:
    """Geometry payload: per-surface wireframe polylines (rings + meridians
    sampled from the true sag function) and per-field ray polylines."""
    from ..core.distributions import generate_distribution
    from ..system.model import field_coords, positions_from_params
    from ..trace import real as real_trace
    from ..trace.paraxial import Paraxial

    model, params = optic.build()
    wavelength = wavelength or optic.primary_wavelength
    pos = np.asarray(positions_from_params(params))
    par = Paraxial(model, params)
    ya, _ = par.marginal_ray()
    yb, _ = par.chief_ray()
    semi = np.abs(np.asarray(ya)).ravel() + np.abs(np.asarray(yb)).ravel()

    theta = np.linspace(0.0, 2.0 * np.pi, n_theta)
    surfaces = []
    for k in range(1, model.num_surfaces):
        spec = model.surfaces[k]
        sp = params["surfaces"][k]
        r_max = max(float(semi[k]) * 1.05, 1e-6)
        lines = []
        # concentric rings
        for r in np.linspace(r_max / n_r, r_max, n_r):
            X = r * np.cos(theta)
            Y = r * np.sin(theta)
            Z = np.asarray(spec.geometry.sag(sp["geom"], X, Y)) + pos[k]
            lines.append(np.stack([Z, X, Y], axis=1).tolist())
        # meridians
        rr = np.linspace(-r_max, r_max, 17)
        for ang in (0.0, np.pi / 2, np.pi / 4, 3 * np.pi / 4):
            X = rr * np.cos(ang)
            Y = rr * np.sin(ang)
            Z = np.asarray(spec.geometry.sag(sp["geom"], X, Y)) + pos[k]
            lines.append(np.stack([Z, X, Y], axis=1).tolist())
        surfaces.append({
            "lines": lines,
            "mirror": bool(spec.is_reflective),
            "comment": spec.comment or f"surface {k}",
        })

    if fields == "all":
        fields = field_coords(params)
    Px, Py = generate_distribution(distribution, num_rays)
    ray_groups = []
    for f in fields:
        _, hist = real_trace.trace(model, params, f[0], f[1], wavelength,
                                   Px, Py, record=True)
        x = np.asarray(hist.x)
        y = np.asarray(hist.y)
        z = np.asarray(hist.z)
        polys = []
        for j in range(x.shape[1]):
            pts = np.stack([z[:, j], x[:, j], y[:, j]], axis=1)
            if np.isfinite(pts).all():
                polys.append(pts.tolist())
        ray_groups.append({"field": [float(f[0]), float(f[1])],
                           "rays": polys})
    return {"name": optic.name or "Optical system",
            "surfaces": surfaces, "ray_groups": ray_groups}


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{margin:0;background:#14181d;color:#d7dde3;font:13px sans-serif;
      overflow:hidden}
 #hud{position:fixed;top:10px;left:12px;opacity:.85;pointer-events:none}
 canvas{display:block;cursor:grab}
</style></head><body>
<div id="hud"><b>__TITLE__</b><br>drag: orbit &nbsp; wheel: zoom &nbsp;
shift-drag: pan</div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let W, H; const resize = () => { W = cv.width = innerWidth;
  H = cv.height = innerHeight; };
addEventListener('resize', () => { resize(); draw(); }); resize();
// scene bounds -> center/scale
let mn = [1e30,1e30,1e30], mx = [-1e30,-1e30,-1e30];
const seen = p => { for (let i = 0; i < 3; i++) {
  mn[i] = Math.min(mn[i], p[i]); mx[i] = Math.max(mx[i], p[i]); } };
DATA.surfaces.forEach(s => s.lines.forEach(l => l.forEach(seen)));
DATA.ray_groups.forEach(g => g.rays.forEach(r => r.forEach(seen)));
const ctr = mn.map((v, i) => 0.5 * (v + mx[i]));
const span = Math.max(mx[0]-mn[0], mx[1]-mn[1], mx[2]-mn[2], 1e-9);
let yaw = 0.6, pitch = 0.25, zoom = 1.0, panX = 0, panY = 0;
const proj = p => {
  const x = p[0]-ctr[0], y = p[1]-ctr[1], z = p[2]-ctr[2];
  const cy = Math.cos(yaw), sy = Math.sin(yaw),
        cp = Math.cos(pitch), sp = Math.sin(pitch);
  const x1 = cy*x + sy*y, y1 = -sy*x + cy*y;
  const y2 = cp*y1 - sp*z, z2 = sp*y1 + cp*z;
  const s = 0.85 * Math.min(W, H) / span * zoom;
  return [W/2 + panX + x1*s, H/2 + panY - z2*s, y2];
};
const poly = (pts, color, w) => {
  ctx.strokeStyle = color; ctx.lineWidth = w; ctx.beginPath();
  pts.forEach((p, i) => { const q = proj(p);
    i ? ctx.lineTo(q[0], q[1]) : ctx.moveTo(q[0], q[1]); });
  ctx.stroke();
};
const FIELD_COLORS = ['#66c2ff','#ffd166','#ef767a','#6ee7b7','#c3a6ff'];
function draw(){
  ctx.clearRect(0, 0, W, H);
  DATA.surfaces.forEach(s => s.lines.forEach(
    l => poly(l, s.mirror ? '#aab4bd' : '#5d87a8', 1.1)));
  DATA.ray_groups.forEach((g, i) => g.rays.forEach(
    r => poly(r, FIELD_COLORS[i % FIELD_COLORS.length], 0.6)));
}
let drag = null;
cv.onmousedown = e => drag = [e.clientX, e.clientY, e.shiftKey];
addEventListener('mouseup', () => drag = null);
addEventListener('mousemove', e => { if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { panX += dx; panY += dy; }
  else { yaw += dx * 0.008; pitch += dy * 0.008;
         pitch = Math.max(-1.55, Math.min(1.55, pitch)); }
  drag = [e.clientX, e.clientY, drag[2]]; draw(); });
cv.onwheel = e => { e.preventDefault();
  zoom *= Math.exp(-e.deltaY * 0.0012); draw(); };
draw();
</script></body></html>
"""


def export_html(optic, path: str, **scene_kw) -> str:
    """Write the interactive standalone HTML; returns ``path``."""
    scene = system_scene(optic, **scene_kw)
    html = _HTML_TEMPLATE.replace("__TITLE__", scene["name"]) \
                         .replace("__DATA__", json.dumps(scene))
    with open(path, "w") as f:
        f.write(html)
    return path
