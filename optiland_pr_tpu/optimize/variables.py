"""Optimization variables: typed views into the parameter pytree.

Redesign of the reference VariableBehavior hierarchy
(optiland/optimization/variable/, 20 files): since all numeric state already
lives in a pytree, a variable is just (path into the pytree, scaler, bounds).
No mutation of an object graph — ``apply`` produces a new params pytree, which
is what makes jax.grad/vmap over the merit function trivial.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from .scaling import get_scaler, IdentityScaler, ReciprocalScaler

__all__ = ["Variable", "VariableList", "make_variable"]


@dataclasses.dataclass
class Variable:
    """One scalar degree of freedom."""
    path: tuple                     # e.g. ("surfaces", 3, "geom", "radius")
    element: tuple | None = None    # index into an array leaf (e.g. (2,) or (1, 0))
    scaler: Any = None
    min_val: float | None = None
    max_val: float | None = None
    name: str = ""

    def get(self, params):
        leaf = params
        for k in self.path:
            leaf = leaf[k]
        if self.element is not None:
            leaf = leaf[self.element]
        return leaf

    def set(self, params, value):
        """Pure update: returns a new params pytree with this leaf replaced."""
        return _set_path(params, self.path, self.element, value)

    def scaled_value(self, params):
        return self.scaler.scale(self.get(params))

    def set_scaled(self, params, scaled):
        return self.set(params, self.scaler.inverse_scale(scaled))


def _set_path(obj, path, element, value):
    if not path:
        if element is None:
            return jnp.asarray(value, jnp.asarray(obj).dtype)
        return jnp.asarray(obj).at[element].set(value)
    k = path[0]
    if isinstance(obj, dict):
        new = dict(obj)
        new[k] = _set_path(obj[k], path[1:], element, value)
        return new
    if isinstance(obj, (list, tuple)):
        new = list(obj)
        new[k] = _set_path(obj[k], path[1:], element, value)
        return type(obj)(new) if isinstance(obj, tuple) else new
    raise TypeError(f"cannot descend into {type(obj)}")


# --- variable-type registry ----------------------------------------------

def make_variable(model, variable_type: str, surface_number: int = None,
                  scaler=None, min_val=None, max_val=None, **kw) -> Variable:
    """Build a Variable for a reference-style variable type
    (radius, reciprocal_radius, conic, thickness, index, asphere_coeff,
    polynomial_coeff, chebyshev_coeff, norm_radius, decenter_x/y/z,
    tilt_x/y/z, material_coefficient, grating_period, f)."""
    sp = ("surfaces", surface_number)
    t = variable_type
    if t == "radius":
        v = Variable(sp + ("geom", "radius"))
    elif t == "reciprocal_radius":
        v = Variable(sp + ("geom", "radius"), scaler=ReciprocalScaler())
    elif t == "conic":
        v = Variable(sp + ("geom", "conic"))
    elif t == "thickness":
        v = Variable(sp + ("thickness",))
    elif t == "index":
        v = Variable(sp + ("material", "n"))
    elif t == "abbe":
        v = Variable(sp + ("material", "abbe"))
    elif t == "asphere_coeff":
        v = Variable(sp + ("geom", "coefficients"),
                     element=(kw["coeff_number"],))
    elif t in ("polynomial_coeff", "chebyshev_coeff", "zernike_coeff"):
        idx = kw.get("coeff_index", kw.get("coeff_number"))
        v = Variable(sp + ("geom", "coefficients"),
                     element=tuple(idx) if isinstance(idx, (tuple, list))
                     else (idx,))
    elif t == "norm_radius":
        v = Variable(sp + ("geom", "norm_radius"))
    elif t in ("norm_x", "norm_y"):
        v = Variable(sp + ("geom", t))
    elif t == "decenter_x":
        v = Variable(sp + ("cs", "dx"))
    elif t == "decenter_y":
        v = Variable(sp + ("cs", "dy"))
    elif t == "decenter_z":
        v = Variable(sp + ("cs", "dz"))
    elif t == "tilt_x":
        v = Variable(sp + ("cs", "rx"))
    elif t == "tilt_y":
        v = Variable(sp + ("cs", "ry"))
    elif t == "tilt_z":
        v = Variable(sp + ("cs", "rz"))
    elif t == "f":
        v = Variable(sp + ("f",))
    elif t == "grating_period":
        v = Variable(sp + ("grating", "period"))
    elif t == "grid_sag":
        # one sag-grid point (reference variable/grid_sag.py exposes the whole
        # grid; per-point scalars compose into the same DoF set)
        idx = kw.get("point_index", kw.get("coeff_index"))
        v = Variable(sp + ("geom", "sag_grid"),
                     element=tuple(idx) if isinstance(idx, (tuple, list))
                     else (idx,))
    elif t in ("nurbs_ctrlpt", "nurbs_control_point"):
        # reference variable/nurbs.py indexes P[i, j, k] with k the xyz axis;
        # our control_points pytree leaf is stacked [3, n_u, n_v]
        i, j, k = kw["coeff_index"]
        v = Variable(sp + ("geom", "control_points"), element=(k, i, j))
    elif t == "nurbs_weight":
        i, j = kw["coeff_index"][:2]
        v = Variable(sp + ("geom", "weights"), element=(i, j))
    elif t == "material":
        raise ValueError(
            "categorical material variables are not pytree scalars; use "
            "optimize.glass_expert.MaterialVariable with GlassExpert")
    elif t == "path":
        v = Variable(tuple(kw["path"]), element=kw.get("element"))
    else:
        raise ValueError(f"unknown variable type {variable_type!r}")

    if v.scaler is None:
        v.scaler = get_scaler(scaler)
    v.min_val = min_val
    v.max_val = max_val
    v.name = f"{t}@{surface_number}" + \
        (f"[{kw.get('coeff_number', kw.get('coeff_index', ''))}]"
         if "coeff" in t else "")
    return v


class VariableList:
    """An ordered set of variables with vector <-> pytree conversion."""

    def __init__(self):
        self._vars: list[Variable] = []

    def append(self, v: Variable):
        self._vars.append(v)

    def __len__(self):
        return len(self._vars)

    def __iter__(self):
        return iter(self._vars)

    def __getitem__(self, i):
        return self._vars[i]

    def to_vector(self, params):
        """Scaled variable values as a flat vector."""
        return jnp.stack([jnp.reshape(v.scaled_value(params), ())
                          for v in self._vars])

    def apply(self, params, x):
        """Pure: write scaled vector x back into a copy of params."""
        out = params
        for i, v in enumerate(self._vars):
            out = v.set_scaled(out, x[i])
        return out

    def bounds(self):
        return ([v.min_val for v in self._vars],
                [v.max_val for v in self._vars])
