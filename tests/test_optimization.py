"""Optimization layer: operand values vs reference, gradient correctness vs
the reference merit's central differences (ground truth), optimizer descent.

Note on the gradient baseline: the reference's torch-autograd gradients do NOT
match its own merit function's finite differences for radius variables (its
graph detaches parts of the ray-aiming path). Our jax gradients match the
reference merit's central differences to ~1e-6 relative, which is the
correctness standard used here (BASELINE.md "gradients allclose").
"""
import numpy as np
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.optimize import (OptimizationProblem, OptimizerGeneric,
                                      OptimizerAdam, LeastSquares)


def _cooke_problem():
    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_operand("f2", target=50.0, weight=1.0)
    for f in [(0, 0), (0, 0.7), (0, 1.0)]:
        problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                            input_data={"surface_number": 7, "Hx": f[0],
                                        "Hy": f[1], "num_rays": 3,
                                        "wavelength": 0.55})
    for k in [1, 2, 3, 4, 5, 6]:
        problem.add_variable("radius", surface_number=k)
    return lens, problem


def test_operand_values_match_reference(ref_optiland):
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland.optimization import OptimizationProblem as RefProblem
    lens, problem = _cooke_problem()
    ref = RefCooke()
    rp = RefProblem()
    rp.add_operand("f2", target=50.0, weight=1.0, input_data={"optic": ref})
    for f in [(0, 0), (0, 0.7), (0, 1.0)]:
        rp.add_operand("rms_spot_size", target=0.0, weight=1.0,
                       input_data={"optic": ref, "surface_number": 7,
                                   "Hx": f[0], "Hy": f[1], "num_rays": 3,
                                   "wavelength": 0.55,
                                   "distribution": "hexapolar"})
    np.testing.assert_allclose(float(problem.sum_squared()),
                               float(rp.sum_squared()), rtol=1e-9)
    for op, rop in zip(problem.operands, rp.operands):
        np.testing.assert_allclose(
            float(op.value(problem.model, problem.params)),
            float(rop.value), rtol=1e-9, err_msg=op.operand_type)


def test_gradient_matches_reference_merit_fd(ref_optiland):
    """jax.grad == central differences of the REFERENCE's merit function."""
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland.optimization import OptimizationProblem as RefProblem
    import optiland.backend as be
    lens, problem = _cooke_problem()
    _, g = problem.value_and_grad(problem.x0())
    g = np.asarray(g)

    ref = RefCooke()
    rp = RefProblem()
    rp.add_operand("f2", target=50.0, weight=1.0, input_data={"optic": ref})
    for f in [(0, 0), (0, 0.7), (0, 1.0)]:
        rp.add_operand("rms_spot_size", target=0.0, weight=1.0,
                       input_data={"optic": ref, "surface_number": 7,
                                   "Hx": f[0], "Hy": f[1], "num_rays": 3,
                                   "wavelength": 0.55,
                                   "distribution": "hexapolar"})
    for k in [1, 2, 3, 4, 5, 6]:
        rp.add_variable(ref, "radius", surface_number=k)

    def merit(x):
        for var, xi in zip(rp.variables, x):
            var.variable.update_value(float(xi))
        ref.update()
        return float(rp.sum_squared())

    x0 = np.array([float(np.asarray(be.to_numpy(v.variable.get_value())))
                   for v in rp.variables])
    g_fd = np.zeros_like(x0)
    for i in range(len(x0)):
        h = 1e-5 * max(1.0, abs(x0[i]))
        xp = x0.copy()
        xp[i] += h
        xm = x0.copy()
        xm[i] -= h
        g_fd[i] = (merit(xp) - merit(xm)) / (2 * h)

    np.testing.assert_allclose(g, g_fd, rtol=1e-3, atol=1e-12)


def test_scipy_descent_reduces_merit():
    lens, problem = _cooke_problem()
    initial = float(problem.sum_squared())
    res = OptimizerGeneric(problem).optimize(maxiter=30)
    assert res.fun < initial


def test_adam_descent_reduces_merit():
    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_operand("f2", target=48.0, weight=1.0)
    for k in [1, 2]:
        problem.add_variable("radius", surface_number=k)
    initial = float(problem.sum_squared())
    res = OptimizerAdam(problem, lr=1e-2).optimize(n_steps=100)
    assert res.fun < initial


def test_least_squares_reduces_merit():
    lens, problem = _cooke_problem()
    initial = float(problem.sum_squared())
    res = LeastSquares(problem).optimize(maxiter=40)
    assert res.fun < initial


def test_inequality_operand():
    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_operand("f2", min_val=60.0, weight=1.0)  # violated: f2 = 50
    v = float(problem.sum_squared())
    assert v > 0
    problem2 = OptimizationProblem(CookeTriplet())
    problem2.add_operand("f2", min_val=40.0, max_val=60.0, weight=1.0)
    assert float(problem2.sum_squared()) == 0.0


def test_thickness_and_conic_variables():
    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_operand("f2", target=51.0, weight=1.0)
    problem.add_variable("thickness", surface_number=2)
    problem.add_variable("conic", surface_number=1)
    _, g = problem.value_and_grad(problem.x0())
    assert np.isfinite(np.asarray(g)).all()
    res = OptimizerGeneric(problem).optimize(maxiter=50)
    assert abs(float(lens.paraxial.f2()) - 51.0) < 0.1


def test_opd_difference_and_aoi_operands(ref_optiland):
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland.optimization.operand.ray import RayOperand
    from optiland_pr_tpu.optimize.operands import METRIC_DICT
    ref = RefCooke()
    lens = CookeTriplet()
    model, params = lens.build()
    for hx, hy in [(0, 0), (0, 0.7)]:
        want = float(RayOperand.OPD_difference(ref, hx, hy, 3, 0.55))
        got = float(METRIC_DICT["OPD_difference"](model, params, hx, hy, 3,
                                                  0.55))
        np.testing.assert_allclose(got, want, rtol=1e-9)
    want = float(RayOperand.AOI(ref, 1, 0.0, 1.0, 0.0, 0.8, 0.55))
    got = float(METRIC_DICT["AOI"](model, params, 1, 0.0, 1.0, 0.0, 0.8,
                                   0.55))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_lost_ray_gradients_finite():
    """Rays lost mid-trace (TIR / missed surface) must not poison parameter
    gradients: internals stay finite, NaN is injected only at trace end, and
    the finite-masked rms operand ignores the lost rays (reference cannot do
    this — its torch graph NaNs out, see BENCHMARKS.md)."""
    import jax
    from optiland_pr_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, thickness=np.inf)
    # steep singlet: marginal rays at full field TIR / miss the second surface
    lens.add_surface(index=1, radius=6.0, thickness=5.0, material="N-SF11",
                     is_stop=True)
    lens.add_surface(index=2, radius=7.0, thickness=10.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 11.0)
    lens.set_field_type("angle")
    lens.add_field(0, 30.0)
    lens.add_wavelength(0.55, is_primary=True)

    model, params = lens.build()
    from optiland_pr_tpu.trace.real import trace
    from optiland_pr_tpu.core.distributions import generate_distribution
    Px, Py = generate_distribution("hexapolar", 6)
    out = trace(model, params, 0.0, 1.0, 0.55, Px, Py)
    n_lost = int(np.sum(~np.isfinite(np.asarray(out.x))))
    assert n_lost > 0, "test premise: some rays must be lost"
    assert n_lost < out.x.shape[-1], "test premise: some rays must survive"

    problem = OptimizationProblem(lens)
    problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                        input_data={"surface_number": 3, "Hx": 0.0,
                                    "Hy": 1.0, "num_rays": 6,
                                    "wavelength": 0.55})
    problem.add_variable("radius", surface_number=1)
    problem.add_variable("radius", surface_number=2)
    v, g = problem.value_and_grad(problem.x0())
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0
