"""2-D system visualization and prescription report.

Reference: optiland/visualization/system/ (OpticViewer: lens cross-sections +
traced ray paths) and visualization/info/ (LensInfoViewer prescription table).
VTK 3-D viewing is host-side and out of TPU scope (SURVEY.md §2.9); the 2-D
matplotlib viewer plus mesh export covers the draw/inspect workflows.
"""
from __future__ import annotations

import numpy as np

from ..system.model import positions_from_params, field_coords
from ..trace import real as real_trace
from ..trace.paraxial import Paraxial, system_arrays
from ..core.distributions import generate_distribution

__all__ = ["OpticViewer", "LensInfoViewer", "SurfaceSagViewer"]


class OpticViewer:
    """Cross-section plot: surface profiles + traced fan of rays
    (reference visualization/system/optic_viewer.py)."""

    def __init__(self, optic):
        self.optic = optic

    def view(self, fields="all", wavelength=None, num_rays: int = 3,
             distribution: str = "line_y", figsize=(10, 4), title=None,
             theme=None, interactive: bool = True):
        """Draw the system. ``theme``: a name from viz.themes.THEMES or a
        Theme; ``interactive``: attach the hover InteractionManager (surface
        prescriptions and ray field/wavelength on mouse-over — reference
        visualization/system/ interaction layer)."""
        import matplotlib.pyplot as plt
        from .interaction import InteractionManager
        from .themes import THEMES, get_theme

        t = get_theme() if theme is None else (
            THEMES[theme] if isinstance(theme, str) else theme)
        optic = self.optic
        model, params = optic.build()
        wavelength = wavelength or optic.primary_wavelength
        pos = np.asarray(positions_from_params(params))
        par = Paraxial(model, params)

        fig, ax = plt.subplots(figsize=figsize)
        fig.patch.set_facecolor(t.background)
        ax.set_facecolor(t.axes_face)
        for spine in ax.spines.values():
            spine.set_color(t.text)
        ax.tick_params(colors=t.text)
        if t.grid:
            ax.grid(True, alpha=0.25)
        im = InteractionManager(fig, ax, t) if interactive else None

        # semi-apertures from marginal + chief ray heights
        ya, _ = par.marginal_ray()
        yb, _ = par.chief_ray()
        semi = np.abs(np.asarray(ya)).ravel() + np.abs(np.asarray(yb)).ravel()

        def profile(k, r_max):
            yy = np.linspace(-r_max, r_max, 64)
            sp = params["surfaces"][k]
            sag = np.asarray(model.surfaces[k].geometry.sag(
                sp["geom"], np.zeros_like(yy), yy))
            return pos[k] + sag, yy

        # glass bodies: filled region between consecutive glass surfaces
        for k in range(1, model.num_surfaces - 1):
            spec = model.surfaces[k]
            if spec.material_src == k and spec.material.kind != "ideal":
                r_edge = max(semi[k], semi[k + 1], 1e-6)
                z1, yy = profile(k, r_edge)
                z2, _ = profile(k + 1, r_edge)
                ax.fill_betweenx(yy, z1, z2, color=t.glass_fill,
                                 alpha=t.glass_alpha, lw=0)

        # surface profiles
        for k in range(1, model.num_surfaces):
            spec = model.surfaces[k]
            sp = params["surfaces"][k]
            zz, yy = profile(k, max(semi[k] * 1.1, 1e-6))
            color = t.mirror if spec.is_reflective else t.surface
            (line,) = ax.plot(zz, yy, "-", color=color, lw=1.0)
            if im is not None:
                radius = float(np.asarray(sp["geom"].get("radius", np.inf)))
                im.register(line, (
                    f"surface {k} ({spec.geometry.kind})\n"
                    f"R = {radius:.4g} mm, t = "
                    f"{float(np.asarray(sp['thickness'])):.4g} mm"
                    + ("  [stop]" if spec.is_stop else "")))

        # lens edges: connect consecutive glass surfaces
        for k in range(1, model.num_surfaces - 1):
            spec = model.surfaces[k]
            if spec.material_src == k and spec.material.kind != "ideal":
                r_edge = max(semi[k], semi[k + 1])
                for sgn in (+1, -1):
                    s1 = float(model.surfaces[k].geometry.sag(
                        params["surfaces"][k]["geom"], 0.0, sgn * r_edge))
                    s2 = float(model.surfaces[k + 1].geometry.sag(
                        params["surfaces"][k + 1]["geom"], 0.0, sgn * r_edge))
                    ax.plot([pos[k] + s1, pos[k + 1] + s2],
                            [sgn * r_edge, sgn * r_edge], "-",
                            color=t.surface, lw=0.8)

        # ray fans per field
        if fields == "all":
            fields = field_coords(params)
        Px, Py = generate_distribution(distribution, num_rays)
        colors = plt.get_cmap(t.ray_cmap)(np.linspace(0, 0.9, len(fields)))
        for f, color in zip(fields, colors):
            _, hist = real_trace.trace(model, params, f[0], f[1], wavelength,
                                       Px, Py, record=True)
            z = np.asarray(hist.z)
            y = np.asarray(hist.y)
            lines = ax.plot(z, y, "-", color=color, lw=0.7)
            if im is not None:
                for line in lines:
                    im.register(line, (
                        f"field (Hx, Hy) = ({float(f[0]):.3g}, "
                        f"{float(f[1]):.3g})\nwavelength {wavelength} um"))

        ax.set_xlabel("z (mm)", color=t.text)
        ax.set_ylabel("y (mm)", color=t.text)
        ax.set_title(title or optic.name or "Optical system", color=t.text)
        ax.set_aspect("equal", adjustable="datalim")
        return fig, ax


class LensInfoViewer:
    """Tabulated prescription (reference visualization/info/lens_info.py)."""

    def __init__(self, optic):
        self.optic = optic

    def table(self):
        import pandas as pd
        optic = self.optic
        model, params = optic.build()
        wl = optic.primary_wavelength
        _, n_arr, _ = system_arrays(model, params, wl)
        rows = []
        for k, spec in enumerate(model.surfaces):
            sp = params["surfaces"][k]
            radius = float(sp["geom"].get("radius", np.inf))
            rows.append({
                "Surface": k,
                "Type": spec.geometry.kind,
                "Radius": radius,
                "Thickness": float(sp["thickness"]),
                "Material": spec.material.kind
                if not spec.is_reflective else "mirror",
                "n(primary)": round(float(n_arr[k]), 6),
                "Conic": float(sp["geom"].get("conic", 0.0)),
                "Stop": "*" if spec.is_stop else "",
                "Comment": spec.comment,
            })
        return pd.DataFrame(rows)

    def view(self):
        df = self.table()
        print(df.to_string(index=False))
        return df


class SurfaceSagViewer:
    """Sag profile / map for one surface (reference
    visualization/analysis/surface_sag.py:33)."""

    def __init__(self, optic, surface_number: int):
        self.optic = optic
        self.surface_number = surface_number

    def view(self, r_max: float = 1.0, n: int = 128):
        import matplotlib.pyplot as plt
        model, params = self.optic.build()
        spec = model.surfaces[self.surface_number]
        sp = params["surfaces"][self.surface_number]
        x = np.linspace(-r_max, r_max, n)
        X, Y = np.meshgrid(x, x)
        Z = np.asarray(spec.geometry.sag(sp["geom"], X.ravel(), Y.ravel())
                       ).reshape(n, n)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 4))
        im = ax1.imshow(Z, extent=[-r_max, r_max, -r_max, r_max],
                        origin="lower")
        fig.colorbar(im, ax=ax1, label="sag (mm)")
        ax2.plot(x, Z[n // 2, :], label="y = 0")
        ax2.plot(x, Z[:, n // 2], "--", label="x = 0")
        ax2.set_xlabel("coordinate (mm)")
        ax2.set_ylabel("sag (mm)")
        ax2.legend()
        return fig, (ax1, ax2)


class OpticViewer3D:
    """3-D system rendering: revolved surface meshes + traced ray polylines
    (reference visualization/system/optic_viewer_3d.py, VTK-based; here a
    dependency-free matplotlib-3D equivalent so draw3D works everywhere)."""

    def __init__(self, optic):
        self.optic = optic

    def view(self, fields="all", wavelength=None, num_rays: int = 24,
             distribution: str = "ring", figsize=(9, 6), title=None,
             n_theta: int = 48, n_r: int = 12):
        import matplotlib.pyplot as plt
        optic = self.optic
        model, params = optic.build()
        wavelength = wavelength or optic.primary_wavelength
        pos = np.asarray(positions_from_params(params))
        par = Paraxial(model, params)
        ya, _ = par.marginal_ray()
        yb, _ = par.chief_ray()
        semi = np.abs(np.asarray(ya)).ravel() + np.abs(np.asarray(yb)).ravel()

        fig = plt.figure(figsize=figsize)
        ax = fig.add_subplot(projection="3d")

        theta = np.linspace(0.0, 2.0 * np.pi, n_theta)
        for k in range(1, model.num_surfaces):
            spec = model.surfaces[k]
            sp = params["surfaces"][k]
            r_max = max(semi[k] * 1.05, 1e-6)
            r = np.linspace(0.0, r_max, n_r)
            R, T = np.meshgrid(r, theta)
            X, Y = R * np.cos(T), R * np.sin(T)
            Z = np.asarray(spec.geometry.sag(sp["geom"], X.ravel(), Y.ravel())
                           ).reshape(X.shape) + pos[k]
            is_glass = (spec.material_src == k
                        and spec.material.kind != "ideal") \
                or spec.is_reflective
            ax.plot_surface(Z, X, Y, alpha=0.35 if is_glass else 0.15,
                            color="#7aa6c2" if not spec.is_reflective
                            else "#b0b0b0", linewidth=0, antialiased=True)

        if fields == "all":
            fields = field_coords(params)
        Px, Py = generate_distribution(distribution, num_rays)
        colors = plt.cm.viridis(np.linspace(0, 0.9, len(fields)))
        for f, color in zip(fields, colors):
            _, hist = real_trace.trace(model, params, f[0], f[1], wavelength,
                                       Px, Py, record=True)
            x = np.asarray(hist.x)
            y = np.asarray(hist.y)
            z = np.asarray(hist.z)
            for j in range(x.shape[1]):
                ax.plot(z[:, j], x[:, j], y[:, j], "-", color=color, lw=0.5)

        ax.set_xlabel("z (mm)")
        ax.set_ylabel("x (mm)")
        ax.set_zlabel("y (mm)")
        ax.set_title(title or optic.name or "Optical system")
        try:
            ax.set_box_aspect((2.5, 1, 1))
        except Exception:
            pass
        return fig, ax

    def export_html(self, path: str, **scene_kw) -> str:
        """Standalone interactive 3-D HTML (orbit/zoom/pan; zero
        dependencies) — the TPU-scope answer to the reference's VTK render
        window (visualization/system/optic_viewer_3d.py:22)."""
        from .html3d import export_html
        return export_html(self.optic, path, **scene_kw)
