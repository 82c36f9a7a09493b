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
