"""Hybrid refractive/diffractive achromat designed by gradient descent.

A diffractive surface's dispersion has the OPPOSITE sign of any glass
(effective Abbe number ~ -3.45), so a weak diffractive profile on a singlet
can cancel its chromatic focal shift — the classic hybrid achromat. The
optimizer tunes the radial-phase coefficient (the diffractive power) and the
back radius to bring the F/d/C foci together; the phase surface runs IN the
fused Pallas kernel (round 4), so the same merit rides the custom_vjp
gradient path on TPU.

Reference context: interactions/phase_interaction_model.py + phase/radial.py
give the reference the same physics, but its optimizer loops re-trace the
whole system under torch autograd per step.

Run (CPU): env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python examples/doe_hybrid_achromat.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from optiland_pr_tpu.system.optic import Optic
from optiland_pr_tpu.system.phase import RadialPhaseProfile

WAVELENGTHS = (0.4861, 0.5876, 0.6563)   # F, d, C


def build(c_phase: float = 0.0, t_img: float = 93.0):
    lens = Optic(name="hybrid achromat")
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True)
    # diffractive profile molded on the (flat) back face
    lens.add_surface(index=2, radius=np.inf, thickness=t_img,
                     surface_type="phase",
                     phase_profile=RadialPhaseProfile(1),
                     phase_kw={"coefficients": [c_phase]})
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=12.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    for i, w in enumerate(WAVELENGTHS):
        lens.add_wavelength(value=w, is_primary=(i == 1))
    return lens


def chromatic_merit_fn():
    """RMS spot over the three wavelengths traced together — minimizing it
    forces the foci to coincide (axial color -> spot blur at best focus)."""
    from optiland_pr_tpu.core.distributions import generate_distribution
    from optiland_pr_tpu.trace.engine import final_rays

    model, params0 = build().build()
    Px, Py = generate_distribution("hexapolar", 6)
    wls = jnp.asarray(WAVELENGTHS)

    def merit(x):
        c_phase, t_img = x
        p = jax.tree_util.tree_map(lambda a: a, params0)
        p["surfaces"][2]["phase"]["coefficients"] = \
            p["surfaces"][2]["phase"]["coefficients"].at[0].set(c_phase)
        p["surfaces"][2]["thickness"] = t_img
        rays = final_rays(model, p, 0.0, 0.0, wls, Px, Py)
        ok = jnp.isfinite(rays.x) & jnp.isfinite(rays.y)
        w = ok.astype(rays.x.dtype)
        ws = jnp.maximum(jnp.sum(w), 1.0)
        xs = jnp.where(ok, rays.x, 0.0)
        ys = jnp.where(ok, rays.y, 0.0)
        return jnp.sqrt(jnp.sum(jnp.where(ok, xs**2 + ys**2, 0.0)) / ws)

    return merit, params0


def axial_color(lens):
    """REAL-ray chromatic focal spread F..C (mm): per-wavelength best-focus
    offset from the image plane, found by the least-squares focus shift
    t* = -sum(xL + yM)/sum(L^2 + M^2). (Both this framework's and the
    reference's PARAXIAL property path ignore diffractive deflections —
    reference raytrace/paraxial_ray_tracer.py:117-128 never calls
    interact_paraxial_rays — so paraxial f2 cannot see the DOE correction.)"""
    from optiland_pr_tpu.core.distributions import generate_distribution
    from optiland_pr_tpu.trace.real import trace
    model, params = lens.build()
    Px, Py = generate_distribution("hexapolar", 6)
    focus = []
    for w in (WAVELENGTHS[0], WAVELENGTHS[2]):
        rays = trace(model, params, 0.0, 0.0, w, Px, Py)
        ok = np.isfinite(np.asarray(rays.x))
        x, y = np.asarray(rays.x)[ok], np.asarray(rays.y)[ok]
        L, M = np.asarray(rays.L)[ok], np.asarray(rays.M)[ok]
        t = -np.sum(x * L + y * M) / np.sum(L**2 + M**2)
        focus.append(t)
    return abs(focus[0] - focus[1])


def main(n_steps: int = 200):
    import optax
    merit, _ = chromatic_merit_fn()
    vg = jax.jit(jax.value_and_grad(merit))
    x = jnp.asarray([0.0, 93.0])
    opt = optax.adam(learning_rate=optax.piecewise_constant_schedule(3e-2))
    # parameter scaling: c_phase ~ 1e-3, t_img ~ 1e2 -> optimize scaled vars
    scale = jnp.asarray([1e-3, 10.0])
    state = opt.init(x / scale)
    xs = x / scale
    v0 = float(merit(x))
    for i in range(n_steps):
        v, g = vg(xs * scale)
        upd, state = opt.update(g * scale, state)
        xs = xs + upd
    x = xs * scale
    v1 = float(merit(x))
    print(f"merit {v0:.5f} -> {v1:.5f}  "
          f"(c_phase={float(x[0]):.5e}, r_back={float(x[1]):.2f})")
    print(f"axial color: start {axial_color(build()):.3f} mm -> "
          f"optimized {axial_color(build(float(x[0]), float(x[1]))):.3f} mm")
    assert np.isfinite(v1)
    return v0, v1, x


if __name__ == "__main__":
    main()
