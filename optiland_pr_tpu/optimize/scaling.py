"""Variable scalers (reference optiland/optimization/scaling/)."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["IdentityScaler", "LinearScaler", "LogScaler", "PowScaler",
           "ReciprocalScaler", "get_scaler"]


class IdentityScaler:
    def scale(self, v):
        return v

    def inverse_scale(self, v):
        return v


class LinearScaler:
    def __init__(self, factor: float = 1.0, offset: float = 0.0):
        self.factor = factor
        self.offset = offset

    def scale(self, v):
        return v * self.factor + self.offset

    def inverse_scale(self, v):
        return (v - self.offset) / self.factor


class LogScaler:
    def scale(self, v):
        return jnp.log(v)

    def inverse_scale(self, v):
        return jnp.exp(v)


class PowScaler:
    def __init__(self, power: float = 2.0):
        self.power = power

    def scale(self, v):
        return jnp.sign(v) * jnp.abs(v) ** self.power

    def inverse_scale(self, v):
        return jnp.sign(v) * jnp.abs(v) ** (1.0 / self.power)


class ReciprocalScaler:
    """1/v both ways. IEEE semantics reproduce the reference's explicit
    branches (scaling/reciprocal.py: inf -> 0, 0 -> inf) without breaking
    jit; jnp.asarray avoids Python-float ZeroDivisionError at v = 0."""

    def scale(self, v):
        return 1.0 / jnp.asarray(v)

    def inverse_scale(self, v):
        return 1.0 / jnp.asarray(v)


_SCALERS = {"identity": IdentityScaler, "linear": LinearScaler,
            "log": LogScaler, "pow": PowScaler, "reciprocal": ReciprocalScaler}


def get_scaler(spec):
    if spec is None:
        return IdentityScaler()
    if isinstance(spec, str):
        return _SCALERS[spec]()
    return spec
