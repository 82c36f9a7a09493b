"""Engine dispatch for final-surface ray queries.

The product's core use case is *differentiable* merit evaluation
(reference optimization/optimizer/torch/base.py:95-154: every optimizer step
re-traces under autograd). This module gives every merit/operand/analysis
call one entry point that rides the fused Pallas kernel — forward AND
backward (kernels/pallas_grad.py custom_vjp) — whenever the system/call is
eligible, and the XLA unrolled trace otherwise.

``set_engine`` pins the dispatch for tests ("pallas_interpret" runs the real
kernel + custom_vjp under the Pallas interpreter on CPU).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from . import real as real_trace
from .raygen import generate_rays

__all__ = ["final_rays", "pallas_eligible", "set_engine",
           "engine_override", "resolve_engine"]

_FORCE: str | None = None   # None | "auto" | "xla" | "pallas" | "pallas_interpret"

# "auto" dispatch threshold: below this many rays the fused kernel's launch
# overhead + lane padding (one block = block_rows x 128 rays) costs more than
# the XLA trace saves — measured on the 50-variable merit bench, whose
# 12-ray operand bundles ran 1.8x SLOWER through pallas (BENCHMARKS.md r3)
_PALLAS_MIN_RAYS = 4096


def set_engine(mode: str | None):
    """Pin the engine globally (tests / debugging). None restores "auto"."""
    global _FORCE
    _FORCE = mode


@contextlib.contextmanager
def engine_override(mode: str | None):
    global _FORCE
    prev = _FORCE
    _FORCE = mode
    try:
        yield
    finally:
        _FORCE = prev


def _apod_supported(apodization) -> bool:
    """Closed-form apodizations evaluate in-kernel (branch-free VPU math);
    anything else — custom callables whose tracing behavior is unknown —
    stays on XLA."""
    if apodization is None:
        return True
    from ..system import apodization as apo
    return isinstance(apodization, (
        apo.UniformApodization, apo.GaussianApodization,
        apo.CosineSquaredApodization, apo.HannApodization,
        apo.TukeyApodization, apo.SuperGaussianApodization,
        apo.PolynomialApodization))


def pallas_eligible(model, Hx, Hy, apodization=None) -> bool:
    """Static eligibility of a (system, call) for the fused gen+trace
    kernel: supported surface stack + launch mode; field coordinates may be
    scalars or 1-D vectors (the kernel's field grid axis, one launch for a
    whole F x W analysis grid); closed-form apodizations ride along."""
    from ..kernels import supports_model
    if not _apod_supported(apodization):
        return False
    if np.ndim(Hx) > 1 or np.ndim(Hy) > 1:
        return False
    from ..kernels import gen_eligible
    if not gen_eligible(model):
        return False
    return supports_model(model)


def _on_accelerator() -> bool:
    return jax.devices()[0].platform != "cpu"


def resolve_engine(model, Hx, Hy, apodization, n_rays: int,
                   on_accelerator: bool | None = None,
                   mode: str = "auto") -> str:
    """The dispatch decision, factored out so tests can pin the crossover
    policy without timing hardware: returns "pallas" or "xla"."""
    ok = pallas_eligible(model, Hx, Hy, apodization)
    if mode in ("pallas", "pallas_interpret"):
        if not ok:
            raise ValueError(
                "system/call not eligible for the fused Pallas kernel")
        return "pallas"
    if mode == "xla":
        return "xla"
    acc = _on_accelerator() if on_accelerator is None else on_accelerator
    return "pallas" if (ok and acc and n_rays >= _PALLAS_MIN_RAYS) else "xla"


def _xla_final(model, params, Hx, Hy, wavelength, Px, Py, apodization,
               final_prop):
    """XLA path: one wavelength, scalar or [F] field coords; returns the final
    ray state, optionally without the post-image propagation (matching the
    reference's recorded image-surface state, real_ray_tracer.py:85-92)."""
    if final_prop:
        return real_trace.trace(model, params, Hx, Hy, wavelength, Px, Py,
                                apodization=apodization)
    Hxa = jnp.atleast_1d(jnp.asarray(Hx))
    Hya = jnp.atleast_1d(jnp.asarray(Hy))
    P = Px.shape[0]
    F = Hxa.shape[0]
    rays = generate_rays(model, params, jnp.repeat(Hxa, P),
                         jnp.repeat(Hya, P), jnp.tile(Px, F), jnp.tile(Py, F),
                         wavelength, apodization=apodization,
                         polarized=(model.polarization != "ignore"))
    launch = rays
    wl_scalar = wavelength if jnp.ndim(wavelength) == 0 else None
    rays, _ = real_trace.trace_system(model, params, rays,
                                      wl_scalar=wl_scalar)
    return real_trace._finalize_polarization(model, rays, launch)


def final_rays(model, params, Hx, Hy, wavelength, Px, Py, *,
               apodization=None, final_prop: bool = True,
               engine: str = "auto"):
    """Final-surface ray state, differentiable, via the fastest eligible
    engine.

    ``wavelength`` may be a scalar (bundle of len(Px) rays) or a 1-D array of
    W wavelengths (returns W*len(Px) rays, wavelength-major — both engines).
    ``engine``: "auto" (Pallas when eligible and an accelerator is present),
    "xla", "pallas" (raise if ineligible), "pallas_interpret" (force the
    kernel through the CPU interpreter — for tests).
    """
    mode = _FORCE or engine
    wl = wavelength if isinstance(wavelength, str) else jnp.asarray(wavelength)

    use_pallas = False
    interpret = False
    if mode in ("auto", "pallas", "pallas_interpret"):
        n_rays = int(jnp.shape(jnp.asarray(Px))[-1])  # static under jit
        use_pallas = resolve_engine(model, Hx, Hy, apodization, n_rays,
                                    mode=mode) == "pallas"
        if use_pallas and mode != "auto":
            interpret = (mode == "pallas_interpret") or not _on_accelerator()

    if use_pallas:
        from ..kernels import model_flags, pallas_gen_trace_conic
        flags = model_flags(model, params)
        return pallas_gen_trace_conic(
            model, params, jnp.asarray(Px), jnp.asarray(Py), wl,
            Hx=Hx, Hy=Hy, flags=flags, final_prop=final_prop,
            interpret=interpret, differentiable=True,
            apodization=apodization)

    if jnp.ndim(wl) == 1:
        # wavelength-major stacking to match the Pallas polychromatic layout
        one = lambda w: _xla_final(model, params, Hx, Hy, w, Px, Py,
                                   apodization, final_prop)
        stacked = jax.vmap(one)(wl)
        return jax.tree_util.tree_map(
            lambda a: (a.reshape(-1) if a is not None and a.ndim == 2
                       else (a.reshape(-1, *a.shape[2:])
                             if a is not None else None)),
            stacked)
    return _xla_final(model, params, Hx, Hy, wl, Px, Py, apodization,
                      final_prop)
