"""Seidel third-order aberrations and first-order chromatic terms.

Vectorized, differentiable rebuild of the reference Aberrations class
(optiland/aberrations.py:24-461). Per-surface terms are computed as arrays over
the inner surfaces (1..N-2) rather than Python-loop appends; formulas and
index conventions (including ya[k-1] in the chromatic terms) match the
reference exactly for parity.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..system.model import OpticModel
from .paraxial import Paraxial, system_arrays

__all__ = ["Aberrations", "third_order", "seidels"]


def _precalc(model: OpticModel, params):
    par = Paraxial(model, params)
    wl = params["wavelengths"][model.primary_wavelength_idx]
    inv = par.invariant()
    R, n, _ = system_arrays(model, params, wl)
    C = 1.0 / R
    ya, ua = par.marginal_ray()
    yb, ub = par.chief_ray()
    ya, ua, yb, ub = [v[:, 0] for v in (ya, ua, yb, ub)]
    N = model.num_surfaces
    hp = inv / (n[-1] * ua[-1])
    _, n_F, _ = system_arrays(model, params, 0.4861)
    _, n_C, _ = system_arrays(model, params, 0.6563)
    dn = n_F - n_C

    k = jnp.arange(1, N - 1)
    i_val = C[k] * ya[k] + ua[k - 1]
    ip_val = C[k] * yb[k] + ub[k - 1]
    on_axis = jnp.isclose(inv, 0.0)
    denom = 2 * n[k] * jnp.where(on_axis, 1.0, inv)
    B = jnp.where(on_axis, 0.0,
                  n[k - 1] * (n[k] - n[k - 1]) * ya[k] * (ua[k] + i_val)
                  / denom)
    Bp = jnp.where(on_axis, 0.0,
                   n[k - 1] * (n[k] - n[k - 1]) * yb[k] * (ub[k] + ip_val)
                   / denom)
    return dict(inv=inv, on_axis=on_axis, n=n, N=N, C=C, ya=ya, ua=ua, yb=yb,
                ub=ub, hp=hp, dn=dn, k=k, i=i_val, ip=ip_val, B=B, Bp=Bp)


def third_order(model: OpticModel, params):
    """All third-order terms, per inner surface. Returns a dict of arrays
    (each [N-2]) plus the summed Seidel coefficients S [5]."""
    p = _precalc(model, params)
    k, n, C = p["k"], p["n"], p["C"]
    ya, ua, yb, ub = p["ya"], p["ua"], p["yb"], p["ub"]
    i_val, ip_val, B, Bp, hp = p["i"], p["ip"], p["B"], p["Bp"], p["hp"]

    TSC_on = (n[k - 1] * (n[k] - n[k - 1]) * ya[k] * (ua[k] + i_val)
              * i_val**2) / (2 * n[k] * n[-1] * ua[-1])
    TSC = jnp.where(p["on_axis"], TSC_on, B * i_val**2 * hp)
    CC = B * i_val * ip_val * hp
    TAC = B * ip_val**2 * hp
    TPC = ((n[k] - n[k - 1]) * C[k] * hp * p["inv"]
           / (2 * n[k] * n[k - 1]))
    DC = hp * (Bp * i_val * ip_val + 0.5 * (ub[k] ** 2 - ub[k - 1] ** 2))
    dn = p["dn"]
    TAchC = (-ya[k - 1] * i_val / (n[-1] * ua[-1])
             * (dn[k - 1] - n[k - 1] / n[k] * dn[k]))
    TchC = (-ya[k - 1] * ip_val / (n[-1] * ua[-1])
            * (dn[k - 1] - n[k - 1] / n[k] * dn[k]))

    SC = -TSC / ua[-1]
    AC = -TAC / ua[-1]
    PC = -TPC / ua[-1]
    LchC = -TAchC / ua[-1]
    TCC = CC * 3

    factor = n[-1] * ua[-1] * 2
    S = jnp.stack([-jnp.sum(TSC), -jnp.sum(CC), -jnp.sum(TAC),
                   -jnp.sum(TPC), -jnp.sum(DC)]) * factor
    return dict(TSC=TSC, SC=SC, CC=CC, TCC=TCC, TAC=TAC, AC=AC, TPC=TPC,
                PC=PC, DC=DC, TAchC=TAchC, LchC=LchC, TchC=TchC, S=S)


def seidels(model: OpticModel, params):
    return third_order(model, params)["S"]


class Aberrations:
    """Facade mirroring the reference Aberrations API."""

    def __init__(self, optic):
        self.optic = optic

    def _all(self):
        model, params = self.optic.build()
        return third_order(model, params)

    def third_order(self):
        d = self._all()
        return (d["TSC"], d["SC"], d["CC"], d["TCC"], d["TAC"], d["AC"],
                d["TPC"], d["PC"], d["DC"], d["TAchC"], d["LchC"], d["TchC"],
                d["S"])

    def seidels(self):
        return self._all()["S"]

    def __getattr__(self, name):
        if name in ("TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
                    "TAchC", "LchC", "TchC"):
            return lambda: self._all()[name]
        raise AttributeError(name)
