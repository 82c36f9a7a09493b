"""Global numeric configuration for the TPU-native ray tracer.

Unlike the reference (optiland/backend/__init__.py:82-155), there is no swappable
backend: JAX is the only numeric substrate. What remains configurable is the
working dtype. TPU hot paths run float32 (MXU/VPU native); parity tests against
the reference run float64 on CPU via ``jax.config.update("jax_enable_x64", True)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_float", "set_default_float", "working_dtype"]

_DEFAULT_FLOAT: jnp.dtype | None = None


def default_float() -> jnp.dtype:
    """The dtype used for newly-created optical parameters and rays.

    Defaults to float64 when x64 is enabled (parity/testing mode), else float32
    (TPU production mode).
    """
    if _DEFAULT_FLOAT is not None:
        return _DEFAULT_FLOAT
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_default_float(dtype) -> None:
    """Override the default float dtype (pass ``None`` to restore auto)."""
    global _DEFAULT_FLOAT
    _DEFAULT_FLOAT = None if dtype is None else jnp.dtype(dtype)


# Back-compat alias used throughout the package.
def working_dtype() -> jnp.dtype:
    return default_float()
