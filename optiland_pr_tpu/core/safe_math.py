"""NaN-safe math primitives for differentiable ray tracing.

The reference produces NaN positions for rays that miss a surface or suffer TIR
(optiland/geometries/standard.py:89-140, rays/real_rays.py:141-163) and masks
invalid rays by zeroing intensity. We reproduce those *values*, but guard every
sqrt/division so that reverse-mode gradients of masked-out rays are exactly zero
instead of NaN (the ``where``-before-sqrt pattern; see SURVEY.md §7 "Hard parts").
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["safe_sqrt", "safe_div", "safe_recip", "nan_sqrt", "TINY"]

TINY = 1e-14


def safe_sqrt(x):
    """sqrt clamped at zero: returns 0 for x<=0 with exactly-zero gradient
    there (double-where keeps the discarded branch's partial finite)."""
    ok = x > 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), 0.0)


def nan_sqrt(x):
    """sqrt that returns NaN for negative inputs (reference parity) but whose
    gradient never poisons: grad flows through sqrt(max(x,0)) for x>=0 and is
    zero for x<0."""
    ok = x >= 0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), jnp.nan)


def safe_div(num, den, eps: float = TINY):
    """num/den with |den| clamped away from zero (sign-preserving).

    Mirrors the reference's safe-denominator clamps (newton_raphson.py:158-166).
    """
    mag = jnp.maximum(jnp.abs(den), eps)
    den_safe = jnp.where(den < 0, -mag, mag)
    return num / den_safe


def safe_recip(den, eps: float = TINY):
    return safe_div(jnp.ones_like(den), den, eps)
