"""Long-tail parity vs the live reference (VERDICT round-1 "test depth"):
pupil distributions, Gaussian-quadrature weights, apodization profiles,
variable scalers, and a broad operand-registry sweep.

Reference analogues: tests/test_distribution.py, tests/test_apodization.py,
tests/optimization/ (scaling + operand tests).
"""
import numpy as np
import pytest

from optiland_pr_tpu.core.distributions import (generate_distribution,
                                                gaussian_quad_weights)
from optiland_pr_tpu.samples import CookeTriplet


# --- distributions (reference optiland/distribution.py) ---------------------

@pytest.mark.parametrize("kind,n", [
    ("line_x", 11), ("line_y", 7), ("positive_line_x", 9),
    ("positive_line_y", 5), ("uniform", 12), ("hexapolar", 4),
    ("cross", 8), ("ring", 16),
])
def test_distribution_parity(ref_optiland, kind, n):
    from optiland.distribution import create_distribution
    ref = create_distribution(kind)
    ref.generate_points(n)
    Px, Py = generate_distribution(kind, n)
    np.testing.assert_allclose(np.asarray(Px), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-15, err_msg=kind)
    np.testing.assert_allclose(np.asarray(Py), np.asarray(ref.y),
                               rtol=1e-12, atol=1e-15, err_msg=kind)


@pytest.mark.parametrize("num_rings,symmetric", [(3, True), (3, False),
                                                 (6, True), (6, False)])
def test_gaussian_quadrature_parity(ref_optiland, num_rings, symmetric):
    """Radii AND weights vs reference GaussianQuadrature
    (distribution.py:268-356)."""
    from optiland.distribution import GaussianQuadrature
    ref = GaussianQuadrature(is_symmetric=symmetric)
    ref.generate_points(num_rings=num_rings)
    Px, Py = generate_distribution("gaussian_quad", num_rings,
                                   is_symmetric=symmetric)
    np.testing.assert_allclose(np.asarray(Px), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(Py), np.asarray(ref.y),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(gaussian_quad_weights(num_rings, is_symmetric=symmetric)),
        np.asarray(ref.get_weights(num_rings)), rtol=1e-12)


def test_random_distribution_is_unit_disk():
    """Our random distribution uses an explicit seed (jax-style determinism)
    rather than the reference's global RNG; pin its contract instead."""
    Px, Py = generate_distribution("random", 500)
    r2 = np.asarray(Px) ** 2 + np.asarray(Py) ** 2
    assert r2.max() <= 1.0
    assert r2.mean() == pytest.approx(0.5, abs=0.06)  # uniform over disk
    Qx, Qy = generate_distribution("random", 500)
    np.testing.assert_array_equal(np.asarray(Px), np.asarray(Qx))


# --- apodization (reference optiland/apodization/) --------------------------

def test_apodization_parity(ref_optiland):
    import optiland.apodization as ra
    from optiland_pr_tpu.system import apodization as oa

    rng = np.random.default_rng(11)
    Px = rng.uniform(-1, 1, 400)
    Py = rng.uniform(-1, 1, 400)
    pairs = [
        (oa.UniformApodization(), ra.UniformApodization()),
        (oa.GaussianApodization(sigma=0.7), ra.GaussianApodization(sigma=0.7)),
        (oa.CosineSquaredApodization(R=0.9), ra.CosineSquaredApodization(R=0.9)),
        (oa.HannApodization(D=1.8), ra.HannApodization(D=1.8)),
        (oa.TukeyApodization(R=1.0, alpha=0.4),
         ra.TukeyApodization(R=1.0, alpha=0.4)),
        (oa.SuperGaussianApodization(w=0.8, n=6),
         ra.SuperGaussianApodization(w=0.8, n=6)),
        (oa.PolynomialApodization(R=1.0, p=2.0),
         ra.PolynomialApodization(R=1.0, p=2.0)),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(
            np.asarray(ours.get_intensity(Px, Py)),
            np.asarray(ref.get_intensity(Px, Py)),
            rtol=1e-10, atol=1e-12, err_msg=type(ref).__name__)


# --- scalers (reference optiland/optimization/scaling/) ---------------------

def test_scaler_parity(ref_optiland):
    from optiland.optimization.scaling.identity import IdentityScaler as RI
    from optiland.optimization.scaling.linear import LinearScaler as RLin
    from optiland.optimization.scaling.log import LogScaler as RLog
    from optiland.optimization.scaling.power import PowerScaler as RPow
    from optiland.optimization.scaling.reciprocal import ReciprocalScaler as RRec
    from optiland_pr_tpu.optimize.scaling import (IdentityScaler, LinearScaler,
                                                  LogScaler, PowScaler,
                                                  ReciprocalScaler)
    vals = np.asarray([0.3, 1.0, 2.5, 40.0])
    pairs = [
        (IdentityScaler(), RI()),
        (LinearScaler(factor=2.5, offset=-1.0), RLin(factor=2.5, offset=-1.0)),
        (LogScaler(), RLog()),
        (PowScaler(power=2.0), RPow(power=2.0)),
    ]
    for ours, ref in pairs:
        for v in vals:
            s_o = float(np.asarray(ours.scale(v)))
            s_r = float(np.asarray(ref.scale(v)))
            assert s_o == pytest.approx(s_r, rel=1e-12), type(ref).__name__
            v_o = float(np.asarray(ours.inverse_scale(s_o)))
            v_r = float(np.asarray(ref.inverse_scale(s_r)))
            assert v_o == pytest.approx(v_r, rel=1e-12)
    # reciprocal: matches the reference's branches through IEEE semantics
    rec, rrec = ReciprocalScaler(), RRec()
    for v in (0.5, -4.0):
        assert float(np.asarray(rec.scale(v))) == pytest.approx(
            float(np.asarray(rrec.scale(v))), rel=1e-12)
    assert float(np.asarray(rec.scale(np.inf))) == 0.0 == float(
        np.asarray(rrec.scale(np.inf)))
    assert np.isinf(float(np.asarray(rec.inverse_scale(0.0))))


# --- operand-registry sweep (reference operand/*.py) -------------------------

def _problems(ref_optiland):
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland.optimization import OptimizationProblem as RefProblem
    from optiland_pr_tpu.optimize import OptimizationProblem
    return (OptimizationProblem(CookeTriplet()), RefProblem(), RefCooke())


PARAXIAL_OPS = ["f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2", "EPD",
                "EPL", "XPD", "XPL", "magnification", "total_track"]
AB_PER_SURFACE = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
                  "TAchC", "LchC", "TchC"]
RAY_OPS = ["real_x_intercept", "real_y_intercept", "real_z_intercept",
           "real_L", "real_M", "real_N"]


def test_operand_registry_sweep(ref_optiland):
    """Every paraxial operand, every aberration operand (per-surface at k=2
    and summed), ray intercept/direction operands, and edge_thickness — one
    value-level parity check each, through both frameworks' public
    add_operand contract."""
    problem, rp, ref = _problems(ref_optiland)

    for name in PARAXIAL_OPS:
        problem.add_operand(name, target=0.0, weight=1.0)
        rp.add_operand(name, target=0.0, weight=1.0,
                       input_data={"optic": ref})
    for name in AB_PER_SURFACE:
        problem.add_operand(name, target=0.0, weight=1.0,
                            input_data={"surface_number": 2})
        rp.add_operand(name, target=0.0, weight=1.0,
                       input_data={"optic": ref, "surface_number": 2})
        problem.add_operand(f"{name}_sum", target=0.0, weight=1.0)
        rp.add_operand(f"{name}_sum", target=0.0, weight=1.0,
                       input_data={"optic": ref})
    problem.add_operand("seidel", target=0.0, weight=1.0,
                        input_data={"seidel_number": 3})
    rp.add_operand("seidel", target=0.0, weight=1.0,
                   input_data={"optic": ref, "seidel_number": 3})
    ray_kw = {"surface_number": 4, "Hx": 0.0, "Hy": 0.6, "Px": 0.3,
              "Py": -0.4, "wavelength": 0.55}
    for name in RAY_OPS + ["AOI"]:
        problem.add_operand(name, target=0.0, weight=1.0,
                            input_data=dict(ray_kw))
        rp.add_operand(name, target=0.0, weight=1.0,
                       input_data={"optic": ref, **ray_kw})
    # edge_thickness: the reference reads surface semi-apertures populated by
    # update_paraxial (optic_updater.py:192-203, r_max = |ya|+|yb|) — the
    # same default our operand computes when semi_aperture is omitted
    ref.update_paraxial()
    problem.add_operand("edge_thickness", target=0.0, weight=1.0,
                        input_data={"surface_number": 1})
    rp.add_operand("edge_thickness", target=0.0, weight=1.0,
                   input_data={"optic": ref, "surface_number": 1})

    assert len(problem.operands) == len(rp.operands)
    ref_total = 0.0
    for op, rop in zip(problem.operands, rp.operands):
        rv = float(np.asarray(rop.value).reshape(()))
        np.testing.assert_allclose(
            float(op.value(problem.model, problem.params)),
            rv, rtol=1e-8, atol=1e-12, err_msg=op.operand_type)
        ref_total += (rop.weight * (rv - rop.target)) ** 2
    # (the reference's own sum_squared() crashes on this operand set — its
    # fun_array stacks mixed-shape operand values, problem.py:105 — so the
    # total is accumulated manually from the same per-operand deltas)
    np.testing.assert_allclose(float(problem.sum_squared()), ref_total,
                               rtol=1e-8)
