"""Benchmark: real-ray throughput of the fused Pallas trace pipeline.

Default (driver contract): ONE JSON line for the headline metric —
ray-surfaces/s/chip on the 6-surface Cooke triplet
{"metric", "value", "unit", "vs_baseline"}.

``python bench.py --suite`` runs the full benchmark suite (VERDICT round-1
item 3): Cooke mono + 3-wavelength, AsphericSinglet, DoubleGauss mono +
3-wavelength, Hubble (mirrors + central obscuration), tilted singlet
(tilt/decenter fast path), and the XLA fallback — one JSON line each, plus
a combined BENCH_SUITE.json.

- metric unit: ray-surfaces per second per chip (the reference's headline,
  README.md:120 "150M+ ray-surfaces/s" on GPU).
- vs_baseline: value / 150e6.

Run on the TPU chip by default; falls back to the XLA path if no TPU.
"""
from __future__ import annotations

import json
import sys

import numpy as np

N_RAYS = 4_000_000
REFERENCE_RAY_SURFACES_PER_S = 150e6  # reference README.md:120 (GPU)


def _pupil(n, dt):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    return jnp.asarray(r * np.cos(th), dt), jnp.asarray(r * np.sin(th), dt)


def _f32_params(params):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)


def _tilted_singlet():
    import jax.numpy as jnp
    from optiland_pr_tpu.system.optic import Optic
    lens = Optic(name="tilted singlet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=60.0, thickness=8.0, material="N-BK7",
                     is_stop=True, dx=0.5, rx=np.deg2rad(2.0))
    lens.add_surface(index=2, radius=-400.0, thickness=95.0,
                     ry=np.deg2rad(-1.0))
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=20.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


def _chebyshev_freeform():
    import jax.numpy as jnp
    from optiland_pr_tpu.system.optic import Optic
    lens = Optic(name="chebyshev freeform singlet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=60.0, conic=-0.2, thickness=7.0,
                     material="N-BK7", is_stop=True,
                     surface_type="chebyshev", norm_x=10.0, norm_y=10.0,
                     coefficients=[[0.0, 1e-4, 0.0, 2e-5],
                                   [5e-5, 0.0, 1e-5, 0.0],
                                   [0.0, 3e-5, 0.0, 0.0],
                                   [1e-5, 0.0, 0.0, 0.0]])
    lens.add_surface(index=2, radius=-320.0, thickness=92.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=16.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


def _time_best(fn, *args, reps=10, rounds=3):
    from optiland_pr_tpu.utils import time_best
    return time_best(fn, *args, reps=reps, rounds=rounds)


def bench_system(name, build, wavelength, n_rays=N_RAYS, engine="auto"):
    """One benchmark entry: fused Pallas gen+trace+image-prop when supported
    (and a TPU is present), else the XLA pipeline."""
    import jax
    import jax.numpy as jnp
    from optiland_pr_tpu.kernels import (pallas_gen_trace_conic,
                                         supports_model, model_flags)
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.trace.raygen import generate_rays

    lens = build()
    model, params = lens.build()
    params = _f32_params(params)
    dt = jnp.float32

    wl = jnp.asarray(wavelength, dt)
    n_wl = 1 if wl.ndim == 0 else int(wl.shape[0])
    Px, Py = _pupil(n_rays, dt)
    zeros = jnp.zeros_like(Px)

    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = engine != "xla" and supports_model(model) and on_tpu \
        and model.field_type == "angle" and model._object_infinite
    flags = model_flags(model, params) if use_pallas else None

    @jax.jit
    def step(params, Px, Py):
        if use_pallas:
            rays = pallas_gen_trace_conic(model, params, Px, Py, wl,
                                          flags=flags, final_prop=True)
        else:
            def one(w):
                rays = generate_rays(model, params, zeros, zeros, Px, Py, w)
                rays, _ = real_trace.trace_system(model, params, rays,
                                                  wl_scalar=w)
                return real_trace._final_image_propagation(model, params,
                                                           rays)
            if wl.ndim == 0:
                rays = one(wl)
            else:
                import jax as _jax
                rays = _jax.vmap(one)(wl)
        return (jnp.sum(rays.x) + jnp.sum(rays.y) + jnp.sum(rays.opd)
                + jnp.sum(rays.intensity))

    dt_s = _time_best(step, params, Px, Py)
    n_surf = model.num_surfaces - 1  # object surface is a no-op
    ray_surfaces_per_s = n_rays * n_wl * n_surf / dt_s
    return {
        "metric": f"ray_surfaces_per_s_per_chip_{name}",
        "value": float(ray_surfaces_per_s),
        "unit": "ray-surfaces/s",
        "vs_baseline": float(ray_surfaces_per_s
                             / REFERENCE_RAY_SURFACES_PER_S),
        "rays_per_s": float(n_rays * n_wl / dt_s),
        "n_rays": n_rays, "n_wavelengths": n_wl, "n_surfaces": n_surf,
        "engine": "pallas" if use_pallas else "xla",
    }


def suite():
    from optiland_pr_tpu.samples import (CookeTriplet, DoubleGauss,
                                         HubbleTelescope, AsphericSinglet)
    FRAUNHOFER = [0.4861, 0.5876, 0.6563]
    entries = [
        ("cooke_triplet", CookeTriplet, 0.55, N_RAYS, "auto"),
        ("cooke_triplet_3wl", CookeTriplet, FRAUNHOFER, N_RAYS, "auto"),
        ("aspheric_singlet", AsphericSinglet, 0.55, N_RAYS, "auto"),
        ("double_gauss", DoubleGauss, 0.5876, N_RAYS, "auto"),
        ("double_gauss_3wl", DoubleGauss, FRAUNHOFER, 2_000_000, "auto"),
        ("hubble_obscured", HubbleTelescope, 0.55, N_RAYS, "auto"),
        ("tilted_singlet", _tilted_singlet, 0.55, N_RAYS, "auto"),
        ("chebyshev_freeform", _chebyshev_freeform, 0.55, N_RAYS, "auto"),
        ("cooke_triplet_xla", CookeTriplet, 0.55, 1_000_000, "xla"),
    ]
    results = []
    for name, build, wl, n, engine in entries:
        res = bench_system(name, build, wl, n_rays=n, engine=engine)
        print(json.dumps(res), flush=True)
        results.append(res)
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=1)
    return results


def main():
    if "--suite" in sys.argv:
        suite()
        return
    from optiland_pr_tpu.samples import CookeTriplet
    res = bench_system("cooke_triplet", CookeTriplet, 0.55)
    print(json.dumps({
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "vs_baseline": res["vs_baseline"],
    }))


if __name__ == "__main__":
    main()
