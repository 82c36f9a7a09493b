"""Smoke tests for the five BASELINE-config examples (VERDICT r2 item 6):
small ray counts, CPU, <2 min total — a signature change in the library can
no longer break the demo workflows silently."""
import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(f"examples_{name}",
                                                  _EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fisheye_descent_decreases_merit():
    """BASELINE config #3 (fisheye optimizer): a few L-BFGS iterations on a
    reduced merit must decrease it."""
    from optiland_pr_tpu.optimize import OptimizationProblem
    from optiland_pr_tpu.optimize.optimizers import OptimizerGeneric
    mod = _load("fisheye_optimizer")
    lens = mod.build_fisheye()
    problem = OptimizationProblem(lens)
    for hy in (0.0, 0.5, 1.0):
        problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                            input_data={"surface_number": 12, "Hx": 0.0,
                                        "Hy": hy, "num_rays": 4,
                                        "wavelength": 0.550})
    for k in (1, 6, 7):
        problem.add_variable("radius", surface_number=k)
    v0, g0 = problem.value_and_grad(problem.x0())
    assert np.isfinite(float(v0)) and np.isfinite(np.asarray(g0)).all()
    res = OptimizerGeneric(problem).optimize(maxiter=4)
    assert float(res.fun) < float(v0)


def test_fresnel_concentrator_irradiance():
    """BASELINE config #4: the zoned concentrator's detector histogram must
    conserve the launched power and concentrate it."""
    from optiland_pr_tpu.analysis.irradiance import irradiance_histogram
    from optiland_pr_tpu.trace import real as real_trace
    mod = _load("fresnel_concentrator")
    lens = mod.build_concentrator("zoned")
    model, params = lens.build()
    rng = np.random.default_rng(0)
    n = 512
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    rays = real_trace.trace(model, params, 0.0, 0.0, 0.55, Px, Py)
    power = rays.intensity / n
    extent = 40.0
    hist = irradiance_histogram(rays.x, rays.y, power, 32, 32,
                                (-extent, extent, -extent, extent))
    total = float(jnp.sum(hist) * (2 * extent / 32) ** 2)
    launched = float(jnp.sum(power))
    np.testing.assert_allclose(total, launched, rtol=1e-6)
    # concentration: the central 1/16 area holds >90% of the power
    h = np.asarray(hist)
    c = h[12:20, 12:20].sum() / h.sum()
    assert c > 0.9, c


def test_monte_carlo_pod_runs_on_mesh():
    """BASELINE config #5: vmapped+sharded compensated Monte-Carlo trials on
    the 8-virtual-device CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from optiland_pr_tpu.samples import DoubleGauss
    from optiland_pr_tpu.tolerancing import DistributionSampler, Tolerancing
    lens = DoubleGauss()
    tol = Tolerancing(lens)
    tol.add_perturbation("radius",
                         DistributionSampler("normal", 56.20238, 0.05),
                         surface_number=1)
    tol.add_compensator("thickness", surface_number=11)
    tol.add_operand("rms_spot_size",
                    input_data={"surface_number": 12, "Hx": 0, "Hy": 0,
                                "num_rays": 4, "wavelength": 0.5876})
    mesh = Mesh(np.asarray(jax.devices()), ("trials",))
    num_trials = 16
    key = jax.random.PRNGKey(0)
    samples = jnp.stack([p.sampler.sample(key, num_trials)
                         for p in tol.perturbations], axis=1)
    samples = jax.device_put(samples, NamedSharding(mesh, P("trials")))
    run = jax.jit(jax.vmap(lambda v: tol.evaluate_single(
        v, compensate=True, comp_steps=4)))
    out = np.asarray(jax.block_until_ready(run(samples)))
    assert out.shape[0] == num_trials
    assert np.isfinite(out).all()


def test_grin_relay_traces():
    """GRIN endoscope relay (beyond-reference capability): the quarter-pitch
    rod must focus a collimated bundle near the exit face."""
    from optiland_pr_tpu.core.distributions import generate_distribution
    from optiland_pr_tpu.trace.real import trace
    mod = _load("grin_endoscope_relay")
    g_exact = np.pi / (2 * mod.ROD_LENGTH)
    nr2_exact = -mod.N0 * g_exact ** 2 / 2
    model, params = mod.build(nr2_exact).build()
    Px, Py = generate_distribution("hexapolar", 6)
    rays = trace(model, params, 0.0, 0.0, 0.55, Px, Py)
    rms = float(jnp.sqrt(jnp.mean(rays.x ** 2 + rays.y ** 2)))
    assert np.isfinite(rms)
    assert rms < 5e-3, rms   # focused: < 5 um for a 1.2 mm beam


def test_polarized_double_gauss_finite_wavefront():
    """BASELINE config #2: polarized + Fresnel-coated double Gauss traces
    with physical intensities and a finite on-axis OPD spread."""
    from optiland_pr_tpu.core.distributions import generate_distribution
    from optiland_pr_tpu.trace import real as real_trace
    mod = _load("double_gauss_polarized")
    lens = mod.build()
    model, params = lens.build()
    Px, Py = generate_distribution("hexapolar", 5)
    rays = real_trace.trace(model, params, 0.0, 0.0, 0.5876, Px, Py)
    inten = np.asarray(rays.intensity)
    assert np.isfinite(inten).all()
    assert (inten >= 0).all() and (inten <= 1.0 + 1e-9).all()
    # uncoated Fresnel losses through 10 air-glass interfaces: meaningful
    assert inten.mean() < 0.95
    opd = np.asarray(rays.opd)
    ok = np.isfinite(opd)
    assert ok.any()
    assert np.ptp(opd[ok]) < 0.1   # mm; on-axis OPD spread is small


def test_doe_hybrid_achromat_corrects_color():
    """Hybrid refractive/diffractive achromat (round 4: phase surfaces on
    the fused-kernel gradient path): descent must reduce both the
    polychromatic spot merit and the real-ray axial color."""
    mod = _load("doe_hybrid_achromat")
    v0, v1, x = mod.main(n_steps=120)
    assert v1 < 0.5 * v0, (v0, v1)
    ax0 = mod.axial_color(mod.build())
    ax1 = mod.axial_color(mod.build(float(x[0]), float(x[1])))
    assert ax1 < 0.2 * ax0, (ax0, ax1)
