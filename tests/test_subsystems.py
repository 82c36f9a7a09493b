"""Subsystem tests: fileio, polarization, constraints, environment, phase,
apodization, ML wrapper, pallas kernel (CPU interpret path)."""
import json
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.system import Optic


def test_json_roundtrip():
    from optiland_pr_tpu.fileio import save_optic, load_optic
    lens = CookeTriplet()
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        path = f.name
    save_optic(lens, path)
    lens2 = load_optic(path)
    np.testing.assert_allclose(float(lens2.paraxial.f2()),
                               float(lens.paraxial.f2()), rtol=1e-12)
    r1 = lens.trace(Hy=1, num_rays=5, distribution="line_y")
    r2 = lens2.trace(Hy=1, num_rays=5, distribution="line_y")
    np.testing.assert_allclose(np.asarray(r1.y), np.asarray(r2.y), rtol=1e-12)


def test_reference_json_import(ref_optiland):
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.fileio import optic_from_dict
    ref_dict = json.loads(json.dumps(RefCooke().to_dict(), default=str))
    lens = optic_from_dict(ref_dict)
    np.testing.assert_allclose(float(lens.paraxial.f2()), 49.999783071431914,
                               rtol=1e-9)


def test_zemax_import(ref_optiland):
    from optiland.fileio import load_zemax_file as ref_load
    from optiland_pr_tpu.fileio import load_zemax_file
    path = "/root/reference/tests/zemax_files/lens1.zmx"
    z = load_zemax_file(path)
    rz = ref_load(path)
    np.testing.assert_allclose(float(z.paraxial.f2()),
                               float(rz.paraxial.f2()), rtol=1e-9)
    np.testing.assert_allclose(float(z.paraxial.EPD()),
                               float(rz.paraxial.EPD()), rtol=1e-9)


def test_polarized_fresnel_trace(ref_optiland):
    from optiland.optic import Optic as RefOptic
    from optiland.rays.polarization_state import PolarizationState as RefState
    from optiland_pr_tpu.core.polarization import PolarizationState

    def build(mine):
        lens = Optic() if mine else RefOptic()
        lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
        lens.add_surface(index=1, radius=22.01359, thickness=3.25896,
                         material="SK16", coating="fresnel")
        lens.add_surface(index=2, radius=-435.76044, thickness=42.0,
                         coating="fresnel", is_stop=True)
        lens.add_surface(index=3)
        lens.set_aperture(aperture_type="EPD", value=10)
        lens.set_field_type(field_type="angle")
        lens.add_field(y=0)
        lens.add_wavelength(value=0.55, is_primary=True)
        state = (PolarizationState if mine else RefState)(
            is_polarized=True, Ex=1.0, Ey=0.0, phase_x=0.0, phase_y=0.0)
        lens.set_polarization(state)
        return lens

    r1 = build(True).trace(Hx=0, Hy=0, wavelength=0.55, num_rays=6,
                           distribution="line_y")
    r2 = build(False).trace(Hx=0, Hy=0, wavelength=0.55, num_rays=6,
                            distribution="line_y")
    np.testing.assert_allclose(np.asarray(r1.intensity), np.asarray(r2.i),
                               rtol=1e-8)


def test_phase_surface_parity(ref_optiland):
    from optiland.optic import Optic as RefOptic
    from optiland.phase import RadialPhaseProfile as RefRadial
    from optiland_pr_tpu.system.phase import RadialPhaseProfile
    k0 = 2 * np.pi / 0.55
    f = 50.0

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, surface_type="phase", thickness=f, is_stop=True,
                     phase_profile=RadialPhaseProfile(1),
                     phase_kw={"coefficients": [-k0 / (2 * f)]})
    lens.add_surface(index=2)
    lens.set_aperture(aperture_type="EPD", value=4)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.55, is_primary=True)

    ref = RefOptic()
    ref.add_surface(index=0, radius=np.inf, thickness=np.inf)
    ref.add_surface(index=1, thickness=f, is_stop=True,
                    phase_profile=RefRadial(coefficients=[-k0 / (2 * f)]))
    ref.add_surface(index=2)
    ref.set_aperture(aperture_type="EPD", value=4)
    ref.set_field_type(field_type="angle")
    ref.add_field(y=0)
    ref.add_wavelength(value=0.55, is_primary=True)

    r1 = lens.trace(Hx=0, Hy=0, wavelength=0.55, num_rays=5,
                    distribution="line_y")
    r2 = ref.trace(Hx=0, Hy=0, wavelength=0.55, num_rays=5,
                   distribution="line_y")
    np.testing.assert_allclose(np.asarray(r1.y), np.asarray(r2.y), atol=1e-10)
    np.testing.assert_allclose(np.asarray(r1.opd), np.asarray(r2.opd),
                               atol=1e-9)


def test_grating_parity(ref_optiland):
    from optiland.optic import Optic as RefOptic

    def build(mine):
        lens = Optic() if mine else RefOptic()
        lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
        lens.add_surface(index=1, surface_type="grating", radius=-100.0,
                         thickness=5.0, is_stop=True, grating_order=1,
                         grating_period=5.0, groove_orientation_angle=0.3)
        lens.add_surface(index=2, thickness=20.0)
        lens.add_surface(index=3)
        lens.set_aperture(aperture_type="EPD", value=4)
        lens.set_field_type(field_type="angle")
        lens.add_field(y=0)
        lens.add_wavelength(value=0.55, is_primary=True)
        return lens

    r1 = build(True).trace(Hx=0, Hy=0, wavelength=0.55, num_rays=4,
                           distribution="line_y")
    r2 = build(False).trace(Hx=0, Hy=0, wavelength=0.55, num_rays=4,
                            distribution="line_y")
    np.testing.assert_allclose(np.asarray(r1.y), np.asarray(r2.y), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.L), np.asarray(r2.L), atol=1e-13)


def test_pickup_and_solves():
    lens = CookeTriplet()
    lens.add_pickup(1, "radius", 2, scale=-1.0)
    _, p = lens.build()
    np.testing.assert_allclose(float(p["surfaces"][2]["geom"]["radius"]),
                               -22.01359)
    lens2 = CookeTriplet()
    lens2.add_solve("marginal_ray_height", surface_idx=7, height=0.0)
    ya, _ = lens2.paraxial.marginal_ray()
    assert abs(float(np.asarray(ya)[7][0])) < 1e-10


def test_air_index_models(ref_optiland):
    from optiland.environment import EnvironmentalConditions as RefCond
    from optiland.environment.models.ciddor import (
        ciddor_refractive_index as ref_ciddor)
    from optiland_pr_tpu.materials import (EnvironmentalConditions, air_index)
    rc = RefCond(temperature=25.0, pressure=95000.0, relative_humidity=0.5,
                 co2_ppm=420.0)
    mc = EnvironmentalConditions(temperature=25.0, pressure=95000.0,
                                 relative_humidity=0.5, co2_ppm=420.0)
    for model in ["ciddor", "edlen", "birch_downs"]:
        v = float(air_index(0.55, mc, model=model))
        assert 1.0002 < v < 1.0003
    # Kohlrausch reproduces the reference's larger (n-1) convention
    # (reference kohlrausch docstring: 1.00271728 at 0.55 um standard)
    assert 1.002 < float(air_index(0.55, mc, model="kohlrausch")) < 1.003
    np.testing.assert_allclose(float(air_index(0.55, mc, model="ciddor")),
                               float(ref_ciddor(0.55, rc)), atol=1e-12)


def test_apodization_shapes():
    from optiland_pr_tpu.system.apodization import (
        GaussianApodization, TukeyApodization, UniformApodization)
    Px = jnp.linspace(-1, 1, 11)
    Py = jnp.zeros_like(Px)
    for ap in [GaussianApodization(0.5), TukeyApodization(1.0, 0.5),
               UniformApodization()]:
        v = np.asarray(ap(Px, Py))
        assert v.shape == Px.shape
        assert (v >= 0).all() and (v <= 1 + 1e-12).all()


def test_flax_module():
    from optiland_pr_tpu.optimize import OptimizationProblem, OpticalSystemModule
    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_operand("f2", target=50.0)
    problem.add_variable("radius", surface_number=1)
    module = OpticalSystemModule(problem=problem)
    variables = module.init(jax.random.PRNGKey(0))
    loss = module.apply(variables)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda v: module.apply(v))(variables)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_pallas_kernel_interpret_mode():
    """Fused kernel vs XLA path in pallas interpret mode (CPU)."""
    from optiland_pr_tpu.kernels import pallas_trace_conic, supports_model
    from optiland_pr_tpu.kernels.pallas_trace import (_pallas_call_2d,
                                                      pack_surface_constants,
                                                      model_flags)
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.trace.raygen import generate_rays
    import optiland_pr_tpu.kernels.pallas_trace as ptmod
    import functools
    from jax.experimental import pallas as pl

    model, params = CookeTriplet().build()
    assert supports_model(model)
    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)

    n = 1024
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)
    rays0 = generate_rays(model, params32, jnp.zeros_like(Px),
                          jnp.zeros_like(Px), Px, Py, 0.55)

    ref, _ = real_trace.trace_system(model, params32, rays0, wl_scalar=0.55)

    # run the kernel body through the interpreter (CPU-safe)
    consts = pack_surface_constants(model, params32, 0.55)
    flags = model_flags(model, params32)
    acoef = ptmod.pack_asphere_coeffs(model, params32)
    rows, lanes = 8, 128
    def shape(a):
        return jnp.asarray(a, jnp.float32).reshape(rows, lanes)
    args = [shape(v) for v in (rays0.x, rays0.y, rays0.z, rays0.L, rays0.M,
                               rays0.N, rays0.intensity, rays0.opd)]
    kernel = functools.partial(ptmod._kernel, flags=flags)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, lanes), jnp.float32)] * 8,
        interpret=True,
    )(consts, acoef, *args)
    x = out[0].reshape(-1)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=2e-4, atol=2e-4)
    opd = out[7].reshape(-1)
    np.testing.assert_allclose(np.asarray(opd), np.asarray(ref.opd),
                               rtol=1e-4, atol=2e-3)


def test_pallas_gen_trace_kernel_interpret_mode():
    """Fused generation+trace+final-propagation kernel vs the XLA pipeline
    (pallas interpret mode, CPU)."""
    import functools
    from jax.experimental import pallas as pl
    import optiland_pr_tpu.kernels.pallas_trace as ptmod
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.trace.raygen import generate_rays

    model, params = CookeTriplet().build()
    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)

    n = 1024
    rng = np.random.default_rng(1)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)

    rays0 = generate_rays(model, params32, jnp.zeros_like(Px),
                          jnp.zeros_like(Px), Px, Py, 0.55)
    ref, _ = real_trace.trace_system(model, params32, rays0, wl_scalar=0.55)
    ref = real_trace._final_image_propagation(model, params32, ref)

    # the REAL entry point (gen-row assembly + grid/BlockSpec pipeline),
    # run through the Pallas interpreter
    rays_k = ptmod.pallas_gen_trace_conic(model, params32, Px, Py, 0.55,
                                          final_prop=True, block_rows=4,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(rays_k.x),
                               np.asarray(ref.x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rays_k.y),
                               np.asarray(ref.y), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rays_k.opd),
                               np.asarray(ref.opd), rtol=1e-4, atol=2e-3)


def test_optic_facade_methods():
    """Reference-facade conveniences: total_track, to_dict/from_dict, info,
    set_index/update/reset (reference optic/optic.py + optic_updater.py)."""
    from optiland_pr_tpu.system.optic import Optic
    lens = CookeTriplet()
    tt = float(lens.total_track)
    assert 59 < tt < 61, tt
    assert lens.object_surface.is_object
    assert lens.image_surface.is_image
    assert lens.polarization_state is None

    lens2 = Optic.from_dict(lens.to_dict())
    np.testing.assert_allclose(float(lens2.paraxial.f2()),
                               float(lens.paraxial.f2()), rtol=1e-12)

    df = lens.info()
    assert len(df) == 8

    lens.set_index(1.7, 2)
    lens.update()
    n_after = float(lens.n()[2])
    np.testing.assert_allclose(n_after, 1.7)

    lens.reset()
    assert len(lens._surfaces) == 0


def test_pallas_asphere_kernel_interpret_mode():
    """Even-asphere in-kernel Newton path vs the XLA trace (interpret)."""
    import functools
    from jax.experimental import pallas as pl
    import optiland_pr_tpu.kernels.pallas_trace as pt
    from optiland_pr_tpu.kernels import supports_model
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.trace.raygen import generate_rays
    from optiland_pr_tpu.samples import AsphericSinglet

    model, params = AsphericSinglet().build()
    assert supports_model(model)           # asphere now on the fast path
    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)

    n = 1024
    rng = np.random.default_rng(3)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)
    rays0 = generate_rays(model, params32, jnp.zeros_like(Px),
                          jnp.zeros_like(Px), Px, Py, 0.587)
    ref, _ = real_trace.trace_system(model, params32, rays0, wl_scalar=0.587)

    consts = pt.pack_surface_constants(model, params32, 0.587)
    acoef = pt.pack_asphere_coeffs(model, params32)
    flags = pt.model_flags(model, params32)
    # flags layout: (is_plane, is_refl, absorbing, gkind, nu, nv, ...)
    assert any(f[3] == "even" and f[4] > 0 for f in flags)
    rows, lanes = 8, 128

    def shape(a):
        return jnp.asarray(a, jnp.float32).reshape(rows, lanes)
    args = [shape(v) for v in (rays0.x, rays0.y, rays0.z, rays0.L, rays0.M,
                               rays0.N, rays0.intensity, rays0.opd)]
    kernel = functools.partial(pt._kernel, flags=flags)
    out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, lanes), jnp.float32)] * 8,
        interpret=True,
    )(consts, acoef, *args)
    np.testing.assert_allclose(np.asarray(out[0].reshape(-1)),
                               np.asarray(ref.x), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1].reshape(-1)),
                               np.asarray(ref.y), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[7].reshape(-1)),
                               np.asarray(ref.opd), rtol=1e-4, atol=2e-3)


def test_zemax_import_fold_mirror(ref_optiland):
    """COORDBRK fold mirror: trace parity vs the reference importer."""
    from optiland.fileio import load_zemax_file as ref_load
    from optiland_pr_tpu.fileio import load_zemax_file
    path = "/root/reference/tests/zemax_files/simple_fold_mirror_up.zmx"
    z = load_zemax_file(path)
    rz = ref_load(path)
    wl = rz.primary_wavelength
    got = z.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=5,
                  distribution="line_y")
    want = rz.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=5,
                    distribution="line_y")
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(want.z),
                               rtol=1e-8, atol=1e-9)


def test_zemax_import_toroidal(ref_optiland):
    """TOROIDAL surfaces (cylindrical Thorlabs lens): geometry parameters
    match the reference importer (its test_load_toroidal_surface)."""
    from optiland_pr_tpu.fileio import load_zemax_file
    path = "/root/reference/tests/zemax_files/thorlabs_lj1598l1.zmx"
    z = load_zemax_file(path)
    model, params = z.build()
    assert model.surfaces[1].geometry.kind == "toroidal"
    np.testing.assert_allclose(float(params["surfaces"][1]["geom"]["radius"]),
                               1 / 0.4950495049504951)
    assert np.isinf(float(params["surfaces"][1]["geom"]["radius_rot"]))


def test_zemax_import_floating_stop(ref_optiland):
    """FLOA aperture resolves to float_by_stop_size with the stop DIAM
    (reference test_load_floa_zemax_file: value == 8.5)."""
    from optiland_pr_tpu.fileio import load_zemax_file
    z = load_zemax_file("/root/reference/tests/zemax_files/lens_floa.zmx")
    assert z.ap_type == "float_by_stop_size"
    np.testing.assert_allclose(z.ap_value, 8.5)
    assert np.isfinite(float(z.paraxial.EPD()))


def test_trace_engine_dispatch_cpu():
    """Engine selection: on CPU, "auto" must use XLA (identical results to
    engine="xla"); engine="pallas" must refuse; ineligible systems (GRIN,
    apodized, multi-field Hx arrays) must fall back under "auto"."""
    lens = CookeTriplet()
    a = lens.trace(Hx=0.0, Hy=1.0, wavelength=0.55, num_rays=12,
                   distribution="hexapolar", engine="auto")
    b = lens.trace(Hx=0.0, Hy=1.0, wavelength=0.55, num_rays=12,
                   distribution="hexapolar", engine="xla")
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))

    import pytest
    with pytest.raises(ValueError):
        lens.trace(Hx=0.0, Hy=1.0, wavelength=0.55, num_rays=12,
                   engine="pallas")

    # array-valued field point is ineligible but must work under auto
    out = lens.trace(Hx=np.asarray([0.0, 0.0]), Hy=np.asarray([0.0, 1.0]),
                     wavelength=0.55, num_rays=6, distribution="line_y",
                     engine="auto")
    assert np.isfinite(np.asarray(out.x)).all()


def test_autolens_json_roundtrip():
    """AutoLens interchange (the fork's integration surface; reference
    optiland_autolens_integration.py:109-170): export -> import preserves the
    prescription and first-order properties, and the shipped reference
    artifact loads."""
    import json
    from optiland_pr_tpu.fileio import (autolens_to_optic, optic_to_autolens)
    from optiland_pr_tpu.samples import CookeTriplet

    lens = CookeTriplet()
    data = optic_to_autolens(lens)
    assert data["surfaces"][0]["thickness"] == "infinity"
    assert len(data["wavelengths"]) == len(lens.wavelengths)
    back = autolens_to_optic(json.loads(json.dumps(data)))
    np.testing.assert_allclose(float(back.paraxial.f2()),
                               float(lens.paraxial.f2()), rtol=1e-10)
    np.testing.assert_allclose(float(back.paraxial.EPD()),
                               float(lens.paraxial.EPD()), rtol=1e-10)

    # the fork's shipped artifact parses and builds
    path = ("/root/reference/integrated_analysis_20251211_010713/"
            "fresnel_autolens_format.json")
    with open(path) as f:
        art = json.load(f)
    ext = autolens_to_optic(art)
    model, params = ext.build()
    assert model.num_surfaces == 4
    assert float(ext.ap_value) == 1200.0


def test_viewer_themes_and_interaction():
    """Viewer theming + hover interaction layer (reference
    visualization/system/ themes + InteractionManager, compact form)."""
    import matplotlib
    matplotlib.use("Agg")
    from optiland_pr_tpu.viz import THEMES, set_theme, get_theme, OpticViewer
    assert set(THEMES) >= {"light", "dark", "classic"}
    set_theme("dark")
    assert get_theme().name == "dark"
    lens = CookeTriplet()
    fig, ax = OpticViewer(lens).view(num_rays=3, theme="dark",
                                     interactive=True)
    assert fig.patch.get_facecolor() != (1.0, 1.0, 1.0, 1.0)
    # hover payloads registered for surfaces + rays
    texts = [t for t in ax.texts]
    assert len(ax.lines) > 7
    set_theme("light")
    fig2, _ = OpticViewer(lens).view(num_rays=3, interactive=False)
    import matplotlib.pyplot as plt
    plt.close("all")


def test_autolens_stop_roundtrip():
    """ADVICE r3: the exporter emits 'aperture_stop' so a central-stop system
    self round-trips with the SAME stop surface (the reader's default would
    otherwise flag surface 1)."""
    import json
    from optiland_pr_tpu.fileio import autolens_to_optic, optic_to_autolens
    from optiland_pr_tpu.samples import DoubleGauss

    lens = DoubleGauss()
    model, _ = lens.build()
    assert model.stop_index != 1  # central stop — the interesting case
    back = autolens_to_optic(json.loads(json.dumps(optic_to_autolens(lens))))
    bmodel, _ = back.build()
    assert bmodel.stop_index == model.stop_index
