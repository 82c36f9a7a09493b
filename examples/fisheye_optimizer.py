"""170-degree wide-angle fisheye optimization (BASELINE config #3).

Rebuild of the fork's fisheye workflow (reference
prithus_examples/wide_angle_fisheye_optimizer.py): a 5-element rear-stop
fisheye whose ten radii are optimized to minimize RMS spot size across seven
field angles up to 85 deg — here with exact jax gradients (L-BFGS-B +
optional Adam polish) instead of derivative-free differential evolution.

Run:  python examples/fisheye_optimizer.py [--steps 60]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from optiland_pr_tpu.system import Optic
from optiland_pr_tpu.optimize import OptimizationProblem, OptimizerGeneric
from optiland_pr_tpu.analysis import SpotDiagram


def build_fisheye() -> Optic:
    """5-element 170-deg fisheye, rear-telephoto layout (reference
    prithus_examples/wide_angle_fisheye_optimizer.py:40-150)."""
    lens = Optic(name="Fisheye 170deg")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    # front negative group
    lens.add_surface(index=1, radius=-25.0, thickness=3.0, material="N-SF11")
    lens.add_surface(index=2, radius=-40.0, thickness=6.0)
    lens.add_surface(index=3, radius=-20.0, thickness=2.5, material="N-SF11")
    lens.add_surface(index=4, radius=-30.0, thickness=5.0)
    # stop
    lens.add_surface(index=5, radius=jnp.inf, thickness=3.0, is_stop=True)
    # rear positive group
    lens.add_surface(index=6, radius=15.0, thickness=3.5, material="N-BK7")
    lens.add_surface(index=7, radius=-12.0, thickness=4.0)
    lens.add_surface(index=8, radius=18.0, thickness=3.0, material="N-LAK12")
    lens.add_surface(index=9, radius=-25.0, thickness=0.5)
    lens.add_surface(index=10, radius=16.0, thickness=2.5, material="N-BK7")
    lens.add_surface(index=11, radius=-18.0, thickness=10.0)
    lens.add_surface(index=12)
    lens.set_aperture(aperture_type="EPD", value=1.5)
    lens.set_field_type(field_type="angle")
    for angle in [0, 15, 30, 45, 60, 75, 85]:
        lens.add_field(y=angle)
    lens.add_wavelength(value=0.460)
    lens.add_wavelength(value=0.550, is_primary=True)
    lens.add_wavelength(value=0.620)
    return lens


def main(maxiter: int = 60):
    lens = build_fisheye()
    problem = OptimizationProblem(lens)

    field_angles = np.array([0, 15, 30, 45, 60, 75, 85]) / 85.0
    for hy in field_angles:
        problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                            input_data={"surface_number": 12, "Hx": 0.0,
                                        "Hy": float(hy), "num_rays": 4,
                                        "wavelength": 0.550})
    for k in [1, 2, 3, 4, 6, 7, 8, 9, 10, 11]:
        problem.add_variable("radius", surface_number=k)

    v0, g0 = problem.value_and_grad(problem.x0())
    print(f"initial merit: {float(v0):.6e}  |grad|: "
          f"{float(jnp.linalg.norm(g0)):.3e}")

    t0 = time.time()
    res = OptimizerGeneric(problem).optimize(maxiter=maxiter)
    print(f"optimized merit: {res.fun:.6e} in {time.time()-t0:.1f}s "
          f"({res.nit} iterations)")

    rms = SpotDiagram(lens, num_rings=4).rms_spot_radius()
    print("per-field RMS spot radius (primary wl):")
    for (hx, hy), r in zip([(0, a) for a in field_angles],
                           np.asarray(rms)[:, 1]):
        print(f"  Hy={hy:4.2f}: {r:.4f} mm")
    return res


if __name__ == "__main__":
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) \
        if "--steps" in sys.argv else 60
    main(steps)
