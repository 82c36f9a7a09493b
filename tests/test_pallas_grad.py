"""Differentiable fused-kernel tests (VERDICT r2 item 1).

The custom_vjp backward Pallas kernel (kernels/pallas_grad.py) runs under the
interpreter on CPU; gradients are pinned against the XLA trace path (which
round-1/2 suites pin against the live reference merit FD), all at f32 — the
kernel's native precision.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_pr_tpu.kernels import (model_flags, pallas_gen_trace_conic,
                                     supports_model)
from optiland_pr_tpu.trace import real as real_trace
from optiland_pr_tpu.trace.engine import engine_override, final_rays


def _f32(params):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)


def _pupil(n, seed=0):
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    return (jnp.asarray(r * np.cos(th), jnp.float32),
            jnp.asarray(r * np.sin(th), jnp.float32))


def _masked_rms(x, y):
    ok = jnp.isfinite(x) & jnp.isfinite(y)
    w = ok.astype(x.dtype)
    ws = jnp.maximum(jnp.sum(w), 1.0)
    xs = jnp.where(ok, x, 0.0)
    ys = jnp.where(ok, y, 0.0)
    mx = jnp.sum(xs * w) / ws
    my = jnp.sum(ys * w) / ws
    return jnp.sqrt(jnp.sum(jnp.where(ok, (xs - mx) ** 2 + (ys - my) ** 2,
                                      0.0)) / ws)


def _grad_parity(build, wavelength, Hx=0.0, Hy=0.7, n=512, rtol=3e-3,
                 atol=1e-7):
    """max-rel-err of d(masked RMS spot)/d(params): pallas custom_vjp
    (interpret) vs the XLA trace, both f32."""
    model, params = build().build()
    assert supports_model(model)
    params = _f32(params)
    flags = model_flags(model, params)
    Px, Py = _pupil(n)

    def merit_pallas(p):
        rays = pallas_gen_trace_conic(model, p, Px, Py, wavelength,
                                      Hx=Hx, Hy=Hy, flags=flags,
                                      final_prop=True, interpret=True,
                                      differentiable=True)
        return _masked_rms(rays.x, rays.y)

    def merit_xla(p):
        rays = real_trace.trace(model, p, Hx, Hy, wavelength, Px, Py)
        return _masked_rms(rays.x, rays.y)

    vp, gp = jax.value_and_grad(merit_pallas)(params)
    vx, gx = jax.value_and_grad(merit_xla)(params)
    np.testing.assert_allclose(float(vp), float(vx), rtol=5e-4)
    for (kp, lp), (_, lx) in zip(jax.tree_util.tree_leaves_with_path(gp),
                                 jax.tree_util.tree_leaves_with_path(gx)):
        lp = np.asarray(lp)
        lx = np.asarray(lx)
        scale = max(np.max(np.abs(lx)), 1e-4)
        np.testing.assert_allclose(
            lp, lx, rtol=rtol, atol=rtol * scale + atol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")


def test_grad_parity_cooke():
    from optiland_pr_tpu.samples import CookeTriplet
    _grad_parity(CookeTriplet, 0.55)


def test_grad_parity_asphere_ift():
    """Even-asphere: the in-kernel stop-gradient Newton + one differentiable
    IFT step must reproduce the XLA implicit-diff gradients (incl. through
    the aspheric coefficients)."""
    from optiland_pr_tpu.samples import AsphericSinglet
    _grad_parity(AsphericSinglet, 0.587, Hy=0.5)


def test_grad_parity_mirrors_obscuration():
    """Mirrors + central obscuration aperture: aperture-clipped rays carry
    zero intensity but finite kinematics; gradients must stay finite.

    Uses Hubble scaled to benchtop size: at the full 5e3-mm scale the f32
    spot is SMALLER than the f32 positional ulp, so spot-RMS gradients are
    noise in every f32 engine (measured: both the Pallas and the XLA f32
    gradients deviate ~2x from the f64 truth, in the same direction) — that
    regime belongs to the f64 XLA path, not to a parity assertion."""
    from optiland_pr_tpu.samples import HubbleTelescope

    def small_hubble():
        lens = HubbleTelescope()
        lens.scale_system(0.02)
        # deliberately under-corrected primary: the aplanat's residual spot
        # (~0.1 wave) sits below f32 positional noise even at benchtop
        # scale; the aberrated spot (~um) is far above it
        lens.set_conic(-0.90, 2)
        return lens

    _grad_parity(small_hubble, 0.55, Hy=0.3, rtol=5e-3)


def _singlet(surface_type, **geom_kw):
    from optiland_pr_tpu.system.optic import Optic
    lens = Optic(name=f"{surface_type} singlet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=60.0, conic=-0.2, thickness=7.0,
                     material=1.5168, is_stop=True,
                     surface_type=surface_type, **geom_kw)
    lens.add_surface(index=2, radius=-320.0, thickness=92.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=16.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_field(y=2)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


@pytest.mark.parametrize("surface_type,geom_kw", [
    ("zernike", dict(zernike_type="standard", norm_radius=10.0,
                     coefficients=[0.0, 2e-4, -1e-4, 5e-4, 3e-4, -2e-4,
                                   1e-4, 5e-5])),
    ("forbes_qbfs", dict(norm_radius=10.0,
                         coefficients=[1e-3, -5e-4, 2e-4, -1e-4])),
    ("forbes_q2d", dict(norm_radius=10.0,
                        terms=((0, 0), (1, 0), (0, 2), (1, 2), (0, -3)),
                        coefficients=[1e-3, -4e-4, 3e-4, -2e-4, 2e-4])),
    ("fresnel_zone", dict(zone_depth=0.5)),
    ("fresnel_designed", dict(focal_length=120.0, n_design=1.5168)),
])
def test_grad_parity_north_star_sags(surface_type, geom_kw):
    """North-star kernel sags (VERDICT r2 item 3) differentiate in-kernel:
    Zernike / Forbes Qbfs / Q2D (through the pre-packed basis change) and
    both Fresnel idealizations, vs the XLA implicit-diff path at f32."""
    _grad_parity(lambda: _singlet(surface_type, **geom_kw), 0.55, Hy=0.6,
                 n=256, rtol=5e-3)


def test_grad_parity_polarized():
    """Polarized + Fresnel-coated system: gradients of an intensity-weighted
    spot merit through the in-kernel Jones chain vs the XLA polarization
    path (BASELINE config #2 differentiability). Small surface count keeps
    the interpret-mode backward fast; the full double Gauss is covered by
    the forward parity test in test_pallas_widened.py."""
    from optiland_pr_tpu.core.polarization import PolarizationState
    from optiland_pr_tpu.system.optic import Optic
    lens = Optic(name="polarized coated doublet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=61.0, thickness=6.0, material="N-BK7",
                     is_stop=True, coating="fresnel")
    lens.add_surface(index=2, radius=-45.0, thickness=3.0,
                     material=("F2", "schott"), coating="fresnel")
    lens.add_surface(index=3, radius=-130.0, thickness=97.0,
                     coating="fresnel")
    lens.add_surface(index=4)
    lens.set_aperture(aperture_type="EPD", value=18.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_field(y=10)
    lens.add_wavelength(value=0.5876, is_primary=True)
    lens.set_polarization(PolarizationState(is_polarized=True, Ex=1.0,
                                            Ey=0.0, phase_x=0.0,
                                            phase_y=0.0))
    model, params = lens.build()
    assert supports_model(model)
    params = _f32(params)
    flags = model_flags(model, params)
    Px, Py = _pupil(256)

    def merit_of(rays):
        ok = jnp.isfinite(rays.x) & jnp.isfinite(rays.y)
        w = jnp.where(ok, rays.intensity, 0.0)
        ws = jnp.maximum(jnp.sum(w), 1e-6)
        xs = jnp.where(ok, rays.x, 0.0)
        ys = jnp.where(ok, rays.y, 0.0)
        mx = jnp.sum(xs * w) / ws
        my = jnp.sum(ys * w) / ws
        return jnp.sqrt(jnp.sum(w * ((xs - mx) ** 2 + (ys - my) ** 2)) / ws)

    def merit_pallas(p):
        rays = pallas_gen_trace_conic(model, p, Px, Py, 0.5876, Hy=0.7,
                                      flags=flags, final_prop=True,
                                      interpret=True, differentiable=True)
        return merit_of(rays)

    def merit_xla(p):
        return merit_of(real_trace.trace(model, p, 0.0, 0.7, 0.5876, Px, Py))

    vp, gp = jax.value_and_grad(merit_pallas)(params)
    vx, gx = jax.value_and_grad(merit_xla)(params)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-3)
    for (kp, lp), (_, lx) in zip(jax.tree_util.tree_leaves_with_path(gp),
                                 jax.tree_util.tree_leaves_with_path(gx)):
        lx = np.asarray(lx)
        scale = max(np.max(np.abs(lx)), 1e-3)
        np.testing.assert_allclose(
            np.asarray(lp), lx, rtol=5e-3, atol=5e-3 * scale,
            err_msg=f"polarized grad mismatch at {jax.tree_util.keystr(kp)}")


def test_grad_parity_polychromatic():
    """3-wavelength bundle: cotangents accumulate across the wavelength grid
    axis into one dconsts/dgen."""
    from optiland_pr_tpu.samples import CookeTriplet
    model, params = CookeTriplet().build()
    params = _f32(params)
    flags = model_flags(model, params)
    Px, Py = _pupil(256)
    wls = jnp.asarray([0.4861, 0.5876, 0.6563], jnp.float32)

    def merit_pallas(p):
        rays = pallas_gen_trace_conic(model, p, Px, Py, wls, Hy=0.7,
                                      flags=flags, final_prop=True,
                                      interpret=True, differentiable=True)
        return _masked_rms(rays.x, rays.y)

    def merit_xla(p):
        def one(w):
            rays = real_trace.trace(model, p, 0.0, 0.7, w, Px, Py)
            return rays.x, rays.y
        xs, ys = jax.vmap(one)(wls)
        return _masked_rms(xs.reshape(-1), ys.reshape(-1))

    vp, gp = jax.value_and_grad(merit_pallas)(params)
    vx, gx = jax.value_and_grad(merit_xla)(params)
    np.testing.assert_allclose(float(vp), float(vx), rtol=5e-4)
    for (kp, lp), (_, lx) in zip(jax.tree_util.tree_leaves_with_path(gp),
                                 jax.tree_util.tree_leaves_with_path(gx)):
        lx = np.asarray(lx)
        scale = max(np.max(np.abs(lx)), 1e-4)
        np.testing.assert_allclose(
            np.asarray(lp), lx, rtol=3e-3, atol=3e-3 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")


def test_merit_path_rides_pallas():
    """OptimizationProblem value_and_grad through the forced-interpret Pallas
    engine matches the XLA engine (the VERDICT r2 'differentiable path is the
    product' routing)."""
    from optiland_pr_tpu.optimize import OptimizationProblem
    from optiland_pr_tpu.samples import CookeTriplet

    def make():
        problem = OptimizationProblem(CookeTriplet())
        problem.add_operand("rms_spot_size", target=0.0, weight=1.0,
                            input_data={"surface_number": -1, "Hx": 0.0,
                                        "Hy": 0.7, "num_rays": 6,
                                        "wavelength": 0.55})
        problem.add_variable("radius", surface_number=1)
        problem.add_variable("radius", surface_number=2)
        problem.add_variable("thickness", surface_number=3)
        return problem

    with engine_override("xla"):
        p = make()
        x0 = p.x0()
        v_x, g_x = p.value_and_grad(x0)
        v_x, g_x = np.asarray(v_x), np.asarray(g_x)
    with engine_override("pallas_interpret"):
        p = make()
        v_p, g_p = p.value_and_grad(x0)
    # f64 XLA vs f32 kernel: loose but meaningful bounds
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_p), g_x, rtol=5e-3,
                               atol=5e-3 * max(np.max(np.abs(g_x)), 1e-6))


def test_final_rays_engine_dispatch_matches():
    """final_rays(pallas_interpret) == final_rays(xla) forward, f32."""
    from optiland_pr_tpu.samples import DoubleGauss
    model, params = DoubleGauss().build()
    params = _f32(params)
    Px, Py = _pupil(256)
    with engine_override("pallas_interpret"):
        rp = final_rays(model, params, 0.0, 0.5, 0.5876, Px, Py,
                        final_prop=False)
    with engine_override("xla"):
        rx = final_rays(model, params, 0.0, 0.5, 0.5876, Px, Py,
                        final_prop=False)
    np.testing.assert_allclose(np.asarray(rp.x), np.asarray(rx.x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rp.y), np.asarray(rx.y),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rp.opd), np.asarray(rx.opd),
                               rtol=1e-4, atol=2e-3)


def _f32_opd_errors(build, wavelength, n=512):
    """(plain, kahan) mean |OPD_f32 - OPD_f64| of the fused kernel vs the f64
    XLA trace."""
    model, params = build().build()
    params32 = _f32(params)
    flags = model_flags(model, params32)
    Px, Py = _pupil(n, seed=2)
    r64 = real_trace.trace(model, params, 0.0, 0.0, wavelength,
                           jnp.asarray(Px, jnp.float64),
                           jnp.asarray(Py, jnp.float64))
    kw = dict(flags=flags, final_prop=True, interpret=True)
    wl32 = jnp.float32(wavelength)
    r_plain = pallas_gen_trace_conic(model, params32, Px, Py, wl32, **kw)
    r_kahan = pallas_gen_trace_conic(model, params32, Px, Py, wl32,
                                     kahan=True, **kw)
    opd64 = np.asarray(r64.opd, np.float64)
    ok = np.isfinite(opd64) & np.isfinite(np.asarray(r_plain.opd))
    err_plain = np.abs(np.asarray(r_plain.opd, np.float64) - opd64)[ok]
    err_kahan = np.abs(np.asarray(r_kahan.opd, np.float64) - opd64)[ok]
    return err_plain.mean(), err_kahan.mean()


def test_kahan_opd_f32_error():
    """f32 OPD error budget (SURVEY §7, measured in BENCHMARKS.md): the
    compensated sum must never be worse and must hold the documented bounds.
    The measured decomposition: on many-surface systems the accumulation
    error Kahan removes is ~15-20% of the total — the remaining f32 error is
    per-surface intersection roundoff, which no summation scheme recovers
    (the f64 XLA path is the designed answer at meter scale)."""
    from optiland_pr_tpu.samples import HubbleTelescope, ObjectiveUS008879901

    ep, ek = _f32_opd_errors(ObjectiveUS008879901, 0.55)  # 25 surfaces
    assert ek <= ep * 1.001
    assert ek < 3e-5     # documented bound: ~0.05 waves at 142-mm path

    ep_h, ek_h = _f32_opd_errors(HubbleTelescope, 0.55)   # 18.6e3-mm path
    assert ek_h <= ep_h * 1.001
    assert ek_h < 2.5e-3  # documented bound: f32 ulp-limited at meter scale


def test_jacrev_through_pallas_dispatch():
    """ADVICE r3 (medium): forward-mode AD (jacfwd) cannot differentiate the
    custom_vjp kernel, so every Jacobian on a possibly-Pallas-routed residual
    (tolerancing GN polish, scipy LeastSquares) must use jacrev. Pin that
    reverse-mode works through the forced kernel dispatch."""
    from optiland_pr_tpu.samples import CookeTriplet
    model, params = CookeTriplet().build()
    params = _f32(params)
    Px, Py = _pupil(256)

    def resid(radius):
        p = jax.tree_util.tree_map(lambda a: a, params)
        p["surfaces"][1]["geom"]["radius"] = radius
        rays = final_rays(model, p, 0.0, 0.0, 0.55, Px, Py)
        return jnp.stack([_masked_rms(rays.x, rays.y)])

    r0 = params["surfaces"][1]["geom"]["radius"]
    with engine_override("pallas_interpret"):
        J = jax.jacrev(resid)(r0)
        with pytest.raises(TypeError):
            jax.jacfwd(resid)(r0)
    with engine_override("xla"):
        Jx = jax.jacrev(resid)(r0)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jx), rtol=5e-3,
                               atol=1e-6)


def test_split_opd_meter_scale():
    """SURVEY §7 hard part, round 4 (VERDICT r3 item 5): the split-OPD kernel
    mode holds wave-accuracy at METER scale in f32 — the gap path is
    decomposed so only sag-scale, cancellation-free deviations enter the
    per-ray accumulator (axial base returned as a scalar). Round-3 state:
    Hubble f32 OPD error ~2.7 waves (intersection roundoff at 18.6-m path);
    now 0.023 waves RMS / <0.15 max. The old kahan mode is pinned as >10x
    worse on the same system."""
    from optiland_pr_tpu.kernels import (pallas_gen_trace_conic,
                                         supports_split_opd)
    from optiland_pr_tpu.samples import HubbleTelescope, ObjectiveUS008879901

    Px, Py = _pupil(512)

    def dev_err_waves(build, wl):
        model, params64 = build().build()
        assert supports_split_opd(model)
        params = _f32(params64)
        r64 = real_trace.trace(model, params64, 0.0, 0.0, wl,
                               jnp.asarray(Px, jnp.float64),
                               jnp.asarray(Py, jnp.float64))
        r32, base = pallas_gen_trace_conic(model, params, Px, Py, wl,
                                           final_prop=True, interpret=True,
                                           opd_split=True)
        rk = pallas_gen_trace_conic(model, params, Px, Py, wl,
                                    final_prop=True, interpret=True,
                                    kahan=True)
        opd64 = np.asarray(r64.opd, np.float64)
        dev32 = np.asarray(r32.opd, np.float64)
        opdk = np.asarray(rk.opd, np.float64)
        ok = np.isfinite(opd64) & np.isfinite(dev32) & np.isfinite(opdk)
        d64 = opd64[ok] - opd64[ok].mean()
        ds = dev32[ok] - dev32[ok].mean()
        dk = opdk[ok] - opdk[ok].mean()
        wl_mm = wl * 1e-3
        e_split = (np.max(np.abs(ds - d64)) / wl_mm,
                   np.sqrt(np.mean((ds - d64) ** 2)) / wl_mm)
        e_kahan = np.max(np.abs(dk - d64)) / wl_mm
        # absolute reconstruction: base + deviation == full OPD (f32-level
        # of the TOTAL magnitude)
        tot_tol = 2e-7 * abs(float(base)) + 1e-3
        assert np.max(np.abs(float(base) + dev32[ok] - opd64[ok])) < tot_tol
        return e_split, e_kahan

    (mx, rms), kah = dev_err_waves(HubbleTelescope, 0.55)
    assert mx < 0.15, mx          # meter scale: 18.6e3-mm path
    assert rms < 0.04, rms
    assert kah > 10 * mx, (kah, mx)   # the old mode really was the problem
    (mx2, rms2), _ = dev_err_waves(ObjectiveUS008879901, 0.55)
    assert mx2 < 0.02, mx2        # 142-mm path, 25 surfaces


# -- round 5: meter-scale f32 coordinates + gradients ------------------------

def _full_hubble():
    from optiland_pr_tpu.samples import HubbleTelescope
    return HubbleTelescope()


def test_coord_split_meter_scale_forward():
    """VERDICT r4 item 8 (forward half): the double-f32 deviation kernel
    (coord_split) traces full-scale Hubble with per-ray position noise far
    below the spot, where plain f32 noise EXCEEDS the on-axis spot. The
    honest baseline is an f64 trace of the same f32-rounded params."""
    from optiland_pr_tpu.kernels import (pallas_gen_trace_conic,
                                         supports_split_xy)

    model, params = _full_hubble().build()
    assert supports_split_xy(model)
    p32 = _f32(params)
    p64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, p32)
    Px, Py = _pupil(1024)
    for hy in (0.0, 0.3):
        r64 = real_trace.trace(model, p64, 0.0, hy, 0.55,
                               jnp.asarray(Px, jnp.float64),
                               jnp.asarray(Py, jnp.float64))
        rk, base = pallas_gen_trace_conic(model, p32, Px, Py, 0.55,
                                          Hx=0.0, Hy=hy, final_prop=True,
                                          interpret=True, coord_split=True)
        x64 = np.asarray(r64.x)
        y64 = np.asarray(r64.y)
        xk = np.asarray(rk.x, np.float64)
        yk = np.asarray(rk.y, np.float64)
        ok = np.isfinite(x64) & np.isfinite(xk)
        spot64 = np.sqrt(np.mean(
            (x64[ok] - x64[ok].mean()) ** 2 + (y64[ok] - y64[ok].mean()) ** 2))
        spotk = np.sqrt(np.mean(
            (xk[ok] - xk[ok].mean()) ** 2 + (yk[ok] - yk[ok].mean()) ** 2))
        # spot VALUE: per-ray arithmetic is df32-exact (~1e-9 mm vs an
        # f64 rerun of the identical pipeline); the residual is the
        # f32-evaluated system constants (EPL/EPD/n at rel ~1e-7) shifting
        # focus by ~ulp(focal) — ~11% of the 2.2e-4-mm on-axis spot, ~1%
        # where the spot is aberration-dominated. Plain f32 is ~5x high
        # on-axis (per-ray noise 1.3e-3 mm > the spot itself).
        tol = 0.15 if hy == 0.0 else 0.02
        assert abs(spotk - spot64) / spot64 < tol, (hy, spotk, spot64)
        rp = pallas_gen_trace_conic(model, p32, Px, Py, 0.55, Hx=0.0,
                                    Hy=hy, final_prop=True, interpret=True)
        xp_ = np.asarray(rp.x, np.float64)
        yp_ = np.asarray(rp.y, np.float64)
        spot_plain = np.sqrt(np.mean(
            (xp_[ok] - xp_[ok].mean()) ** 2 + (yp_[ok] - yp_[ok].mean()) ** 2))
        if hy == 0.0:   # pin the contrast being fixed
            assert spot_plain / spot64 > 3.0, spot_plain
        # OPD deviation-from-chief wave-accurate (off-axis too — beyond
        # the round-4 split-OPD mode, which had no field support)
        o64 = np.asarray(r64.opd)[ok]
        odev = np.asarray(rk.opd, np.float64)[ok]
        err = (odev - odev.mean()) - (o64 - o64.mean())
        assert np.sqrt(np.mean(err ** 2)) / 0.55e-3 < 0.06, hy
        # absolute reconstruction: base + deviation tracks the true OPD
        np.testing.assert_allclose(float(np.asarray(base)) + odev.mean(),
                                   o64.mean(), rtol=1e-6)


def test_coord_split_gradient_benchtop_exact():
    """The coord_split custom_vjp machinery is exact where f32 backward
    precision suffices (benchtop scale): gradients match XLA f64 to 0.5%."""
    from optiland_pr_tpu.kernels import pallas_gen_trace_conic, model_flags

    lens = _full_hubble()
    lens.scale_system(0.02)
    lens.set_conic(-0.90, 2)
    model, params = lens.build()
    p32 = _f32(params)
    p64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, p32)
    flags = model_flags(model, p32)
    Px, Py = _pupil(512)

    def merit_k(p):
        rays, _ = pallas_gen_trace_conic(model, p, Px, Py, 0.55, Hx=0.0,
                                         Hy=0.3, flags=flags,
                                         final_prop=True, interpret=True,
                                         differentiable=True,
                                         coord_split=True)
        return _masked_rms(rays.x, rays.y)

    def merit_x(p):
        rays = real_trace.trace(model, p, 0.0, 0.3, 0.55,
                                jnp.asarray(Px, jnp.float64),
                                jnp.asarray(Py, jnp.float64))
        return _masked_rms(rays.x, rays.y)

    vk, gk = jax.value_and_grad(merit_k)(p32)
    v64, g64 = jax.value_and_grad(merit_x)(p64)
    np.testing.assert_allclose(float(vk), float(v64), rtol=1e-4)
    for (kp, lk), (_, l64) in zip(jax.tree_util.tree_leaves_with_path(gk),
                                  jax.tree_util.tree_leaves_with_path(g64)):
        l64 = np.asarray(l64, np.float64)
        m = max(np.max(np.abs(l64)), 1e-6)
        np.testing.assert_allclose(
            np.asarray(lk, np.float64), l64, rtol=0, atol=5e-3 * m + 1e-8,
            err_msg=f"coord_split grad mismatch at "
                    f"{jax.tree_util.keystr(kp)}")


def test_meter_scale_gradient_value_and_direction():
    """VERDICT r4 item 8 (gradient half), measured honestly. Full-scale
    Hubble spot-merit at f32:

    - the df32 kernel's merit VALUE is within 1.5% of f64 truth (plain f32:
      +40%+ on-axis — the round-3 caveat's forward half is CLOSED);
    - its gradient DIRECTION is preserved (cosine > 0.98 vs f64 over the
      full parameter vector) — usable for optimization — but the magnitude
      of the focus-coupled components carries a coherent ~0.6x shrink: the
      f32 reverse-mode accumulation of the shared d(spot)/d(focus)
      sensitivity is cancellation-dominated near focus, in ANY f32 engine
      (the experiment log is in BENCHMARKS.md round 5). A 10%-accurate
      per-leaf meter-scale f32 gradient would need two-float COTANGENT
      arithmetic (a hand-written tf adjoint) — documented as the remaining
      floor, not claimed."""
    from optiland_pr_tpu.kernels import pallas_gen_trace_conic, model_flags

    model, params = _full_hubble().build()
    p32 = _f32(params)
    p64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, p32)
    flags = model_flags(model, p32)
    Px, Py = _pupil(2048)

    def merit_k(p):
        rays, _ = pallas_gen_trace_conic(model, p, Px, Py, 0.55, Hx=0.0,
                                         Hy=0.3, flags=flags,
                                         final_prop=True, interpret=True,
                                         differentiable=True,
                                         coord_split=True)
        return _masked_rms(rays.x, rays.y)

    def merit64(p):
        rays = real_trace.trace(model, p, 0.0, 0.3, 0.55,
                                jnp.asarray(Px, jnp.float64),
                                jnp.asarray(Py, jnp.float64))
        return _masked_rms(rays.x, rays.y)

    vk, gk = jax.value_and_grad(merit_k)(p32)
    v64, g64 = jax.value_and_grad(merit64)(p64)
    assert abs(float(vk) - float(v64)) / float(v64) < 0.015

    a = np.concatenate([np.asarray(l, np.float64).ravel()
                        for l in jax.tree_util.tree_leaves(gk)])
    b = np.concatenate([np.asarray(l, np.float64).ravel()
                        for l in jax.tree_util.tree_leaves(g64)])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.98, cos
