"""Benchmark: real-ray throughput through the 6-surface Cooke triplet.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- metric: ray-surfaces per second per chip (the reference's headline unit,
  README.md:120 "150M+ ray-surfaces/s" on GPU). The Cooke triplet has 7
  traced surfaces (6 lens surfaces + image plane).
- vs_baseline: value / 150e6 (ratio vs the reference's published number).

Run on the TPU chip by default; falls back to CPU if no TPU is present.
"""
from __future__ import annotations

import json
import time

import numpy as np

N_RAYS = 4_000_000
N_SURFACES_TRACED = 7  # 6 lens surfaces + image plane (object is a no-op)
REFERENCE_RAY_SURFACES_PER_S = 150e6  # reference README.md:120 (GPU)


def main():
    import jax
    import jax.numpy as jnp
    from optiland_pr_tpu.samples import CookeTriplet
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.trace.raygen import generate_rays

    model, params = CookeTriplet().build()
    dt = jnp.float32
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dt)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)

    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=N_RAYS))
    th = rng.uniform(0, 2 * np.pi, size=N_RAYS)
    Px = jnp.asarray(r * np.cos(th), dt)
    Py = jnp.asarray(r * np.sin(th), dt)
    zeros = jnp.zeros_like(Px)

    from optiland_pr_tpu.kernels import (pallas_gen_trace_conic,
                                         supports_model, model_flags)
    use_pallas = supports_model(model) and jax.devices()[0].platform != "cpu"
    flags = model_flags(model, params) if use_pallas else None

    @jax.jit
    def trace(params, Px, Py):
        if use_pallas:
            # fully fused generation + trace + image propagation: HBM reads
            # only the pupil samples; one kernel for the whole pipeline
            rays = pallas_gen_trace_conic(model, params, Px, Py, 0.55,
                                          flags=flags, final_prop=True)
        else:
            rays = generate_rays(model, params, zeros, zeros, Px, Py, 0.55)
            rays, _ = real_trace.trace_system(model, params, rays,
                                              wl_scalar=0.55)
            rays = real_trace._final_image_propagation(model, params, rays)
        # small reduction so nothing is dead-code-eliminated and only scalars
        # cross back over the wire
        return (jnp.sum(rays.x) + jnp.sum(rays.y) + jnp.sum(rays.opd)
                + jnp.sum(rays.intensity))

    # warm-up / compile
    trace(params, Px, Py).block_until_ready()

    # steady-state timing: best of 3 rounds x 10 reps (the chip is reached
    # over a shared tunnel; min-time is the standard noise-robust estimator)
    reps = 10
    dt_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = trace(params, Px, Py)
        acc.block_until_ready()
        dt_s = min(dt_s, (time.perf_counter() - t0) / reps)

    rays_per_s = N_RAYS / dt_s
    ray_surfaces_per_s = rays_per_s * N_SURFACES_TRACED
    print(json.dumps({
        "metric": "ray_surfaces_per_s_per_chip_cooke_triplet",
        "value": float(ray_surfaces_per_s),
        "unit": "ray-surfaces/s",
        "vs_baseline": float(ray_surfaces_per_s / REFERENCE_RAY_SURFACES_PER_S),
    }))


if __name__ == "__main__":
    main()
