"""Host-side inspection of builder inputs WITHOUT device readbacks.

Measured on the axon TPU tunnel (BENCHMARKS.md round 5): the FIRST
device->host readback in a process permanently drops the jax dispatch path
from ~0.03 ms/call to ~2.6 ms/call — a synchronizing slow path the client
never leaves. One `bool(jnp.isinf(...))` inside ``Optic.build()`` therefore
taxed every subsequent kernel launch in the process (the whole bench suite,
every optimizer step) by ~2.6 ms.

Builders and static-flag computations must therefore inspect USER inputs
(Python numbers, numpy arrays) on the host, and only fall back to a device
read when handed an actual committed jax array (documented, avoidable by
callers). tests/test_no_readback.py pins the build/flags/dispatch path
readback-free under ``jax.transfer_guard_device_to_host("disallow")``.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["host_isinf"]


def host_isinf(value, default: bool = False) -> bool:
    """True if ``value`` is +-inf, computed without a device->host transfer
    for Python numbers / numpy inputs (the only things builders should see).

    A concrete jax array falls back to a real device read; a traced value
    returns ``default`` (flags computed inside jit keep the general path —
    the conic math handles radius_inv == 0 exactly).
    """
    if value is None:
        return default
    if isinstance(value, (int, float)):
        return math.isinf(value)
    if isinstance(value, (np.ndarray, np.generic)):
        return bool(np.isinf(value))
    try:
        return bool(np.isinf(np.asarray(value)))
    except Exception:
        return default
