"""Host fallback for complex arithmetic on backends without complex dtypes.

The axon TPU backend raises UNIMPLEMENTED for EVERY complex op (add, matmul,
FFT — round-4 audit), while the analyses that need complex math (FFT PSF/MTF,
sampled-MTF pupil overlap) are all EAGER classes whose complex stage is a tiny
fraction of their runtime (the ray trace dominates). So: probe the default
backend once, and when complex is unsupported run just the complex stage in
numpy on the host.
"""
from __future__ import annotations

import functools

import numpy as np

__all__ = ["backend_has_complex", "fft2_centered"]


@functools.lru_cache(maxsize=1)
def backend_has_complex() -> bool:
    """Platform-based, NOT probe-based: actually issuing a complex op on the
    axon backend leaves the runtime in a sticky error state (every
    subsequent op, even real scalars, then raises UNIMPLEMENTED). CPU/GPU
    jax support complex fully; TPU backends get the host fallback (standard
    libtpu emulates complex but this code only ever meets the axon tunnel,
    and the host path is correct everywhere)."""
    import jax
    return jax.devices()[0].platform in ("cpu", "gpu", "cuda", "rocm")


def fft2_centered(a, pre_ifftshift: bool = False):
    """fftshift(fft2(a)) (optionally ifftshift first): a device array when
    the backend supports complex, else a HOST numpy array (a complex result
    must never be placed on a complex-free device)."""
    import jax.numpy as jnp
    if backend_has_complex():
        x = jnp.asarray(a)
        if pre_ifftshift:
            x = jnp.fft.ifftshift(x)
        return jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1))
    x = np.asarray(a)
    if pre_ifftshift:
        x = np.fft.ifftshift(x)
    return np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
