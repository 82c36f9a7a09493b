"""GlassExpert + typed categorical/geometry variables (VERDICT round-1 items
4, 7, 9): achromat glass search over the full catalog, NURBS/grid-sag typed
variables with descent."""
import numpy as np
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.system.optic import Optic
from optiland_pr_tpu.optimize import (OptimizationProblem, OptimizerGeneric,
                                      GlassExpert)
from optiland_pr_tpu.optimize.glass_expert import (MaterialVariable,
                                                   get_nd_vd,
                                                   downsample_glass_map,
                                                   get_neighbour_glasses,
                                                   default_glass_selection)


def _doublet(glass2="N-BK7"):
    """Cemented doublet, deliberately NOT color-corrected when both elements
    share a glass family."""
    lens = Optic()
    lens.add_surface(index=0, thickness=np.inf)
    lens.add_surface(index=1, thickness=6.0, radius=61.0, material="N-BK7",
                     is_stop=True)
    lens.add_surface(index=2, thickness=4.0, radius=-45.0, material=glass2)
    lens.add_surface(index=3, thickness=97.0, radius=-130.0)
    lens.add_surface(index=4)
    lens.set_aperture("EPD", 20.0)
    lens.set_field_type("angle")
    lens.add_field(0.0)
    lens.add_wavelength(0.4861)
    lens.add_wavelength(0.5876, is_primary=True)
    lens.add_wavelength(0.6563)
    return lens


def test_nd_vd_helpers():
    nd, vd = get_nd_vd("N-BK7")
    assert abs(nd - 1.5168) < 2e-3
    assert abs(vd - 64.17) < 0.5
    sel = default_glass_selection()
    assert len(sel) > 100
    gd = {g: get_nd_vd(g) for g in list(sel)[:60]}
    pool = downsample_glass_map(gd, 10)
    assert len(pool) <= 10 and len(pool) >= 5
    neigh = get_neighbour_glasses("N-BK7", gd, 5)
    assert len(neigh) == 5 and "N-BK7" not in neigh


def test_glass_expert_achromatizes():
    """Greedy search swaps the rear element to a flint and cuts axial color
    (reference glass_expert.py behavior on a 2-glass achromat)."""
    lens = _doublet()
    problem = OptimizationProblem(lens)
    problem.add_operand("LchC_sum", target=0.0, weight=100.0)
    problem.add_operand("f2", target=100.0, weight=1.0)
    problem.add_variable("radius", surface_number=1)
    problem.add_variable("radius", surface_number=3)
    initial = float(problem.sum_squared())

    candidates = ["N-BK7", "N-SF11", "N-F2", "N-SK16", "SF5", "N-LAK9",
                  "N-BAF10", "SF10"]
    var = MaterialVariable(lens, 2, glass_selection=candidates)
    expert = GlassExpert(problem)
    res = expert.run([var], num_neighbours=2, pool_size=5, maxiter=40)
    assert res.fun < 0.2 * initial
    assert var.value != "N-BK7"   # a flint was selected
    _, vd = get_nd_vd(var.value)
    assert vd < 50.0


def test_vmapped_screening_matches_serial():
    """VERDICT r4 item 9: screen_candidates ranks >=64 catalog glasses with
    ONE vmapped merit launch, and its merits equal the serial swap-and-
    measure values (the tabulated proxy reproduces each glass's n exactly
    at the merit wavelengths)."""
    lens = _doublet()
    problem = OptimizationProblem(lens)
    problem.add_operand("LchC_sum", target=0.0, weight=100.0)
    problem.add_operand("f2", target=100.0, weight=1.0)
    problem.add_variable("radius", surface_number=1)
    problem.add_variable("radius", surface_number=3)

    sel = [g for g in default_glass_selection()
           if np.isfinite(get_nd_vd(g)[1])][:72]
    assert len(sel) >= 64
    var = MaterialVariable(lens, 2, glass_selection=sel)
    expert = GlassExpert(problem)
    ranked, merits = expert.screen_candidates(var, sel)
    assert len(ranked) == len(sel)
    assert np.all(np.diff(merits) >= 0)          # best-first
    assert var.value == "N-BK7"                  # builder state restored

    # serial truth on a spread of candidates
    for name in (ranked[0], ranked[len(ranked) // 2], ranked[-1]):
        if not np.isfinite(merits[ranked.index(name)]):
            continue
        var.update(name)
        problem.rebuild()
        serial = float(problem.sum_squared())
        np.testing.assert_allclose(merits[ranked.index(name)], serial,
                                   rtol=1e-6)
    var.update("N-BK7")
    problem.rebuild()


def test_glass_expert_screened_run_matches_unscreened():
    """The screened greedy run (vmapped pre-ranking + top-k re-opt) selects
    the same glass as the fully serial loop on the achromat."""
    picks = {}
    for screen in (False, True):
        lens = _doublet()
        problem = OptimizationProblem(lens)
        problem.add_operand("LchC_sum", target=0.0, weight=100.0)
        problem.add_operand("f2", target=100.0, weight=1.0)
        problem.add_variable("radius", surface_number=1)
        problem.add_variable("radius", surface_number=3)
        candidates = ["N-BK7", "N-SF11", "N-F2", "N-SK16", "SF5", "N-LAK9",
                      "N-BAF10", "SF10"]
        var = MaterialVariable(lens, 2, glass_selection=candidates)
        expert = GlassExpert(problem)
        res = expert.run([var], num_neighbours=2, pool_size=8, maxiter=30,
                         screen=screen, screen_top_k=3)
        picks[screen] = (var.value, float(res.fun))
    assert picks[True][0] == picks[False][0]
    np.testing.assert_allclose(picks[True][1], picks[False][1], rtol=1e-3)


def test_material_variable_roundtrip():
    lens = _doublet()
    var = MaterialVariable(lens, 2, glass_selection=["N-BK7", "SF5"])
    assert var.value == "N-BK7"
    var.update("SF5")
    assert var.value == "SF5"
    model, params = lens.build()
    # the built model reflects the swap: n_d of SF5 ~ 1.6727
    mat = model.surfaces[2].material
    n = float(np.asarray(mat.n(params["surfaces"][2]["material"], 0.5876)))
    assert abs(n - 1.6727) < 2e-3


def test_nurbs_ctrlpt_variable_descent():
    from optiland_pr_tpu.geometry.nurbs_fit import nurbs_params_from_standard
    kw = nurbs_params_from_standard(105.0, 0.0, norm_x=12.0, norm_y=12.0,
                                    size_u=8, size_v=8)
    lens = Optic()
    lens.add_surface(index=0, thickness=np.inf)
    lens.add_surface(index=1, surface_type="nurbs", thickness=6.0,
                     material="N-BK7", is_stop=True, **kw)
    lens.add_surface(index=2, thickness=95.0, radius=np.inf)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(0.0)
    lens.add_wavelength(0.5876, is_primary=True)

    problem = OptimizationProblem(lens)
    problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                        input_data={"surface_number": -1, "Hx": 0.0,
                                    "Hy": 0.0, "num_rays": 16,
                                    "wavelength": 0.5876})
    ncu, ncv = np.asarray(kw["control_points"]).shape[1:3]
    for i in range(2, ncu - 2):
        for j in range(2, ncv - 2):
            problem.add_variable("nurbs_ctrlpt", surface_number=1,
                                 coeff_index=(i, j, 2))
    initial = float(problem.sum_squared())
    x0 = np.asarray(problem.x0())
    # gradients flow through control points
    _, g = problem.value_and_grad(jnp.asarray(x0))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    res = OptimizerGeneric(problem).optimize(maxiter=25)
    assert res.fun < initial


def test_grid_sag_variable_descent():
    grid = np.zeros((9, 9))
    lens = Optic()
    lens.add_surface(index=0, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True)
    lens.add_surface(index=2, surface_type="grid_sag", thickness=95.0,
                     sag_grid=grid, norm_x=12.0, norm_y=12.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(0.0)
    lens.add_wavelength(0.5876, is_primary=True)

    problem = OptimizationProblem(lens)
    problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                        input_data={"surface_number": -1, "Hx": 0.0,
                                    "Hy": 0.0, "num_rays": 16,
                                    "wavelength": 0.5876})
    for i in range(3, 6):
        for j in range(3, 6):
            problem.add_variable("grid_sag", surface_number=2,
                                 point_index=(i, j))
    initial = float(problem.sum_squared())
    res = OptimizerGeneric(problem).optimize(maxiter=20)
    assert res.fun < initial


def test_material_variable_type_raises_in_make_variable():
    from optiland_pr_tpu.optimize.variables import make_variable
    with pytest.raises(ValueError, match="MaterialVariable"):
        make_variable(None, "material", surface_number=2)
