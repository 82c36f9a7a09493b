"""The build -> flags -> kernel-dispatch path must not read device values.

Measured on the axon TPU tunnel (BENCHMARKS.md round 5): the first
device->host readback in a process permanently drops jax dispatch from
~0.03 ms/call to ~2.6 ms/call — a synchronizing client path that never
recovers. One ``bool(jnp.isinf(...))`` in ``Optic.build()`` therefore taxed
every kernel launch of the whole process (the full bench suite, every
optimizer step) by ~2.6 ms.

These tests pin the hot host-side paths readback-free. The transfer guard
does not fire on the CPU backend (zero-copy), so concretization is detected
by spying on ``ArrayImpl._value`` and ``ArrayImpl.__array__`` — the funnels
behind float()/bool()/.item() and most np conversions. (CPU-only limitation:
``np.asarray`` of a CPU jax array uses the C buffer protocol and escapes the
spy; the sites fixed in round 5 were all float()/bool()-shaped.)
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_pr_tpu.samples import CookeTriplet, DoubleGauss
from optiland_pr_tpu.kernels import model_flags, supports_model, gen_eligible


@contextlib.contextmanager
def _guard():
    """Raise on any jax-array concretization inside the block."""
    import jax._src.array as jarr

    orig_value = jarr.ArrayImpl._value.fget
    orig_array = jarr.ArrayImpl.__array__

    def spy_value(self):
        raise AssertionError("device->host readback (._value) in guarded "
                             "region")

    def spy_array(self, *a, **k):
        raise AssertionError("device->host readback (__array__) in guarded "
                             "region")

    jarr.ArrayImpl._value = property(spy_value)
    jarr.ArrayImpl.__array__ = spy_array
    try:
        yield
    finally:
        jarr.ArrayImpl._value = property(orig_value)
        jarr.ArrayImpl.__array__ = orig_array


def test_guard_catches_readbacks():
    """Sanity: the guard actually fires on this backend, so the tests below
    are not vacuous."""
    x = jnp.ones((4,))
    with pytest.raises(AssertionError):
        with _guard():
            float(x[0])
    with pytest.raises(AssertionError):
        with _guard():
            bool(jnp.isinf(x[0]))


def test_build_is_readback_free():
    with _guard():
        lens = CookeTriplet()
        model, params = lens.build()
    assert model.num_surfaces >= 3


def test_flags_and_eligibility_are_readback_free():
    lens = DoubleGauss()
    model, params = lens.build()
    with _guard():
        flags = model_flags(model, params)
        ok = supports_model(model) and gen_eligible(model)
    assert ok
    assert len(flags) == model.num_surfaces - 1


def test_flag_hints_match_concrete_values():
    """The host-side hints stamped at build time must agree with the values
    actually in the params pytree (the old readback path)."""
    from optiland_pr_tpu.samples import HubbleTelescope
    from optiland_pr_tpu.system import Optic

    def flat_window():
        lens = Optic(name="flat window + lens")
        lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
        lens.add_surface(index=1, radius=jnp.inf, thickness=2.0,
                         material="N-BK7", is_stop=True)
        lens.add_surface(index=2, radius=jnp.inf, thickness=1.0)
        lens.add_surface(index=3, radius=30.0, thickness=5.0,
                         material="N-BK7")
        lens.add_surface(index=4, radius=-30.0, thickness=25.0)
        lens.add_surface(index=5)
        lens.set_aperture(aperture_type="EPD", value=10.0)
        lens.set_field_type(field_type="angle")
        lens.add_field(y=0)
        lens.add_wavelength(value=0.55, is_primary=True)
        return lens

    for lens in (CookeTriplet(), HubbleTelescope(), flat_window()):
        model, params = lens.build()
        flags = model_flags(model, params)
        for k in range(1, model.num_surfaces):
            sp = params["surfaces"][k]
            want_plane = bool(np.isinf(np.asarray(
                sp["geom"].get("radius", np.inf))))
            assert flags[k - 1][0] == want_plane, (lens.name, k)


def test_trace_setup_readback_free_end_to_end():
    """The full per-step flow of a bench/optimizer iteration: build, flags,
    jit trace + execution — without a single device->host read."""
    from optiland_pr_tpu.trace import real as real_trace

    lens = CookeTriplet()
    model, params = lens.build()
    Px = jnp.asarray(np.linspace(-0.9, 0.9, 64))
    Py = jnp.zeros((64,))

    @jax.jit
    def step(params, Px, Py):
        rays = real_trace.trace(model, params, 0.0, 0.7, 0.55, Px, Py)
        return jnp.sum(rays.x) + jnp.sum(rays.intensity)

    with _guard():
        flags = model_flags(model, params)
        out = step(params, Px, Py)
        out.block_until_ready()
    assert flags is not None
    assert bool(jnp.isfinite(out))
