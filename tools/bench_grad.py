"""Gradient-step throughput for a 50-variable merit function (BASELINE
"grad-step/s for 50-var merit fn").

Builds a double-Gauss problem with 50 distinct variables (11 radii +
11 thicknesses + 11 conics + 12 glass dispersion coefficients + 5 air
indices) and an RMS-spot merit over 3 fields, then times jitted
value_and_grad steps.

Reciprocal-scaled radius variables are deliberately NOT placed on flat
surfaces: 1/R = 0 there and the unscale R = 1/x has an infinite derivative
at x = 0, so the gradient is NaN by construction (matches the reference
scaler's behavior, optiland/optimization/scaling/reciprocal.py).

Run on TPU: python tools/bench_grad.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from optiland_pr_tpu.samples import DoubleGauss
from optiland_pr_tpu.optimize import OptimizationProblem


def main():
    lens = DoubleGauss()
    problem = OptimizationProblem(lens)
    for hy in (0.0, 0.7, 1.0):
        problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                            input_data={"surface_number": 12, "Hx": 0.0,
                                        "Hy": hy, "num_rays": 12,
                                        "wavelength": 0.5876,
                                        "distribution": "hexapolar"})
    problem.add_operand("f2", target=100.0, weight=0.1)

    # 50 distinct variables: radii + conics + thicknesses + glass
    # dispersion coefficients + air indices (every leaf unique, every
    # gradient finite).
    for k in range(1, 12):
        problem.add_variable("radius", surface_number=k)
    for k in range(1, 12):
        problem.add_variable("conic", surface_number=k)
    for k in range(1, 12):
        problem.add_variable("thickness", surface_number=k)
    for k in range(1, 12):
        if lens.model.surfaces[k].material.kind == "formula":
            for c in (0, 1):
                problem.add_variable(
                    "path", path=("surfaces", k, "material", "coefficients"),
                    element=(c,))
        else:
            problem.add_variable("index", surface_number=k)

    x0 = problem.x0()
    n_vars = int(x0.shape[0])
    vg = problem.value_and_grad
    v, g = jax.block_until_ready(vg(x0))
    assert np.isfinite(float(v)) and np.isfinite(np.asarray(g)).all()

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(x0)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "grad_steps_per_s_50var_merit",
        "num_variables": n_vars,
        "value": 1.0 / dt,
        "unit": "grad-steps/s",
        "ms_per_step": dt * 1e3,
    }))


if __name__ == "__main__":
    main()
