"""Physical (per-surface) apertures with boolean composition.

Reference: optiland/physical_apertures/ (949 LoC) — RadialAperture,
OffsetRadialAperture, EllipticalAperture, RectangularAperture, PolygonAperture,
and Union/Intersection/Difference composition (physical_apertures/base.py:174-335).

An aperture is a static node (type + composition tree); numeric extents live in
the params pytree. ``contains`` returns a boolean mask over ray coordinates in
the surface's local frame; blocked rays get intensity zeroed (mask-don't-drop).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import default_float

__all__ = ["ApertureDef", "RadialAperture", "OffsetRadialAperture",
           "EllipticalAperture", "RectangularAperture", "PolygonAperture",
           "FileAperture", "UnionAperture", "IntersectionAperture", "DifferenceAperture",
           "configure_aperture"]


class ApertureDef:
    kind = "base"

    def default_params(self, **kw) -> dict:
        raise NotImplementedError

    def contains(self, p, x, y):
        raise NotImplementedError

    # boolean composition sugar (mirrors reference base.py:174-335)
    def __or__(self, other):
        return UnionAperture(self, other)

    def __and__(self, other):
        return IntersectionAperture(self, other)

    def __sub__(self, other):
        return DifferenceAperture(self, other)


class RadialAperture(ApertureDef):
    """r_min <= r <= r_max annulus (reference physical_apertures/radial.py)."""

    kind = "radial"

    def default_params(self, r_max=jnp.inf, r_min=0.0, **kw) -> dict:
        dt = default_float()
        return {"r_max": jnp.asarray(r_max, dt), "r_min": jnp.asarray(r_min, dt)}

    def contains(self, p, x, y):
        r2 = x**2 + y**2
        return (r2 <= p["r_max"] ** 2) & (r2 >= p["r_min"] ** 2)


class OffsetRadialAperture(RadialAperture):
    kind = "offset_radial"

    def default_params(self, r_max=jnp.inf, r_min=0.0, offset_x=0.0,
                       offset_y=0.0, **kw) -> dict:
        dt = default_float()
        p = super().default_params(r_max=r_max, r_min=r_min)
        p["offset_x"] = jnp.asarray(offset_x, dt)
        p["offset_y"] = jnp.asarray(offset_y, dt)
        return p

    def contains(self, p, x, y):
        return super().contains(p, x - p["offset_x"], y - p["offset_y"])


class EllipticalAperture(ApertureDef):
    kind = "elliptical"

    def default_params(self, a=jnp.inf, b=jnp.inf, offset_x=0.0, offset_y=0.0,
                       **kw) -> dict:
        dt = default_float()
        return {"a": jnp.asarray(a, dt), "b": jnp.asarray(b, dt),
                "offset_x": jnp.asarray(offset_x, dt),
                "offset_y": jnp.asarray(offset_y, dt)}

    def contains(self, p, x, y):
        u = (x - p["offset_x"]) / p["a"]
        v = (y - p["offset_y"]) / p["b"]
        return u**2 + v**2 <= 1.0


class RectangularAperture(ApertureDef):
    kind = "rectangular"

    def default_params(self, x_min=-jnp.inf, x_max=jnp.inf, y_min=-jnp.inf,
                       y_max=jnp.inf, **kw) -> dict:
        dt = default_float()
        return {"x_min": jnp.asarray(x_min, dt), "x_max": jnp.asarray(x_max, dt),
                "y_min": jnp.asarray(y_min, dt), "y_max": jnp.asarray(y_max, dt)}

    def contains(self, p, x, y):
        return ((x >= p["x_min"]) & (x <= p["x_max"])
                & (y >= p["y_min"]) & (y <= p["y_max"]))


class PolygonAperture(ApertureDef):
    """Point-in-polygon via the even-odd crossing rule, vectorized over rays
    (replaces the reference's matplotlib Path dependency,
    physical_apertures/polygon.py)."""

    kind = "polygon"

    def __init__(self, num_vertices: int):
        self.num_vertices = int(num_vertices)

    def default_params(self, vertices=None, **kw) -> dict:
        dt = default_float()
        v = jnp.asarray(vertices, dt)
        assert v.shape == (self.num_vertices, 2)
        return {"vertices": v}

    def contains(self, p, x, y):
        v = p["vertices"]
        x1, y1 = v[:, 0], v[:, 1]
        x2 = jnp.roll(x1, -1)
        y2 = jnp.roll(y1, -1)
        # [n_rays, n_edges] crossing test
        xs = x[..., None]
        ys = y[..., None]
        cond = (y1 > ys) != (y2 > ys)
        x_int = x1 + (ys - y1) * (x2 - x1) / jnp.where(y2 == y1, 1.0, y2 - y1)
        crossings = jnp.sum(jnp.where(cond & (xs < x_int), 1, 0), axis=-1)
        return crossings % 2 == 1


def _load_aperture_file(filepath, delimiter=None, skip_header: int = 0):
    """Two-column coordinate file -> (x, y) numpy arrays (reference
    physical_apertures/polygon.py:135-185): '//' comment lines, optional
    header skip, delimiter None = whitespace, and an encoding fallback chain
    for non-UTF8 exports."""
    import numpy as np
    encodings = ("utf-8", "utf-16", "utf-16le", "utf-16be", "utf-32",
                 "utf-32le", "utf-32be", "latin1", "ascii")
    data = None
    for enc in encodings:
        try:
            with open(filepath, encoding=enc) as f:
                delim = delimiter if delimiter is not None else None
                data = np.genfromtxt(f, delimiter=delim, comments="//",
                                     skip_header=skip_header)
            if data is not None and np.isfinite(data).all():
                break
        except (UnicodeDecodeError, UnicodeError, ValueError):
            continue
    if data is None or data.ndim != 2 or data.shape[1] != 2 \
            or not np.isfinite(data).all():
        raise ValueError(f'Error reading aperture file "{filepath}"')
    return data[:, 0], data[:, 1]


class FileAperture(PolygonAperture):
    """Polygon aperture whose vertices are loaded from a coordinate file
    (reference physical_apertures/polygon.py:107-209)."""

    kind = "file"

    def __init__(self, filepath, delimiter=None, skip_header: int = 0):
        import numpy as np
        self.filepath = str(filepath)
        self.delimiter = delimiter
        self.skip_header = int(skip_header)
        x, y = _load_aperture_file(filepath, delimiter, skip_header)
        super().__init__(len(x))
        self._file_vertices = np.stack([x, y], axis=1)

    def default_params(self, vertices=None, **kw) -> dict:
        if vertices is None:
            vertices = self._file_vertices
        return super().default_params(vertices=vertices, **kw)


class _BooleanAperture(ApertureDef):
    def __init__(self, a: ApertureDef, b: ApertureDef):
        self.a = a
        self.b = b

    def default_params(self, a_params=None, b_params=None, **kw) -> dict:
        return {"a": a_params if a_params is not None else self.a.default_params(),
                "b": b_params if b_params is not None else self.b.default_params()}


class UnionAperture(_BooleanAperture):
    kind = "union"

    def contains(self, p, x, y):
        return self.a.contains(p["a"], x, y) | self.b.contains(p["b"], x, y)


class IntersectionAperture(_BooleanAperture):
    kind = "intersection"

    def contains(self, p, x, y):
        return self.a.contains(p["a"], x, y) & self.b.contains(p["b"], x, y)


class DifferenceAperture(_BooleanAperture):
    kind = "difference"

    def contains(self, p, x, y):
        return self.a.contains(p["a"], x, y) & ~self.b.contains(p["b"], x, y)


def configure_aperture(spec):
    """Resolve an ``add_surface(aperture=...)`` spec to (ApertureDef, params).

    A bare scalar is a lens *diameter* (reference
    physical_apertures/radial.py configure_aperture).
    """
    if spec is None:
        return None, None
    if isinstance(spec, (int, float)):
        ap = RadialAperture()
        return ap, ap.default_params(r_max=float(spec) / 2.0)
    if isinstance(spec, tuple) and len(spec) == 2 and isinstance(spec[0], ApertureDef):
        return spec
    if isinstance(spec, ApertureDef):
        return spec, spec.default_params()
    raise ValueError(f"Cannot resolve aperture spec: {spec!r}")
