"""GRIN rod-lens relay (endoscope-style) designed by gradient descent.

The reference fork ships endoscope designs built from conventional lenses
(prithus_examples/); real endoscopes use Selfoc GRIN rods. The reference
cannot trace them (optiland/propagation/grin.py raises NotImplementedError) —
this framework can: the radial index coefficient nr2 is an ordinary
differentiable parameter, so we can ask the optimizer to find the profile
that relays an image over a prescribed rod length.

Run (CPU): env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/grin_endoscope_relay.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from optiland_pr_tpu.materials import GrinMaterial
from optiland_pr_tpu.system.optic import Optic
from optiland_pr_tpu.trace.real import trace
from optiland_pr_tpu.core.distributions import generate_distribution

ROD_LENGTH = 20.0    # mm
N0 = 1.6


def build(nr2):
    grin = GrinMaterial(N0, n_steps=128)
    lens = Optic(name="GRIN relay")
    lens.add_surface(index=0, thickness=np.inf)
    lens.add_surface(index=1, thickness=ROD_LENGTH, is_stop=True,
                     material=(grin, grin.default_params(nr2=nr2)))
    lens.add_surface(index=2, thickness=0.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 1.2)
    lens.set_field_type("angle")
    lens.add_field(0, 0)
    lens.add_wavelength(0.55, is_primary=True)
    return lens


def main():
    Px, Py = generate_distribution("hexapolar", 6)
    model, params0 = build(-1e-3).build()

    def rms_spot(nr2):
        p = jax.tree_util.tree_map(lambda a: a, params0)
        p["surfaces"][1]["material"]["nr2"] = nr2
        out = trace(model, p, 0.0, 0.0, 0.55, Px, Py)
        return jnp.sqrt(jnp.mean(out.x ** 2 + out.y ** 2))

    # quarter-pitch target: focus at the rod exit face. Analytic answer:
    # g = pi / (2 L)  ->  nr2 = -n0 g^2 / 2
    g_exact = np.pi / (2 * ROD_LENGTH)
    nr2_exact = -N0 * g_exact ** 2 / 2

    import optax
    nr2 = jnp.asarray(-1e-3)
    opt = optax.adam(2e-4)
    state = opt.init(nr2)
    vg = jax.jit(jax.value_and_grad(rms_spot))
    for i in range(400):
        v, gr = vg(nr2)
        upd, state = opt.update(gr, state)
        nr2 = optax.apply_updates(nr2, upd)
    print(f"descended nr2 = {float(nr2):.6e}  (analytic {nr2_exact:.6e})")
    print(f"final RMS spot = {float(rms_spot(nr2)) * 1e3:.3f} um")
    assert abs(float(nr2) - nr2_exact) / abs(nr2_exact) < 0.05


if __name__ == "__main__":
    main()
