"""GRIN propagation (trace/grin.py + materials/grin.py).

The reference declares GRIN but raises NotImplementedError
(optiland/propagation/grin.py:14-27), so there is no parity target; these
tests validate against closed-form GRIN optics instead:

- a parabolic-index (Selfoc) rod follows y(z) = y0 cos(g z) + (u0/g) sin(g z)
  in the paraxial regime, with g = sqrt(A) for n(r) = n0 (1 - A r^2 / 2);
- a quarter-pitch rod (L = pi / (2 g)) focuses a collimated beam at its exit
  face;
- a purely axial gradient leaves rays straight and accumulates
  OPD = integral n(z) dz exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from optiland_pr_tpu.materials import GrinMaterial
from optiland_pr_tpu.system.optic import Optic

N0 = 1.6
G = 0.1                      # rad/mm -> pitch 2*pi/G
A = G * G
L_QUARTER = float(np.pi / (2 * G))
NR2 = -N0 * A / 2.0          # n(r) = n0 - n0*A/2 r^2


def _grin_rod(length, nr2=NR2, nz1=0.0, n_steps=256):
    grin = GrinMaterial(N0, n_steps=n_steps)
    lens = Optic()
    lens.add_surface(index=0, thickness=np.inf)
    lens.add_surface(index=1, thickness=length, is_stop=True,
                     material=(grin, grin.default_params(nr2=nr2, nz1=nz1)))
    lens.add_surface(index=2, thickness=5.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 1.0)
    lens.set_field_type("angle")
    lens.add_field(0, 0)
    lens.add_wavelength(0.55, is_primary=True)
    return lens


def test_selfoc_sinusoid():
    """Exit heights of a collimated bundle follow y0*cos(g*L)."""
    for frac in (0.25, 0.5, 0.8):
        length = frac * 2 * np.pi / G        # fraction of a full pitch
        lens = _grin_rod(length)
        out, hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=8,
                               distribution="line_y", record=True)
        y_in = np.asarray(hist.y[1])         # at the rod entry face
        y_exit = np.asarray(hist.y[2])       # at the rod exit face
        want = y_in * np.cos(G * length)
        # cos(gz) is the PARAXIAL trajectory; exact rays deviate by an
        # amplitude-dependent phase error ~ (y0 g)^2 * gz (verified
        # step-count independent, i.e. converged physics, not RK error):
        # 2e-3 at y0=0.5, gz=5 rad.
        np.testing.assert_allclose(y_exit, want, atol=2.5e-3,
                                   err_msg=f"pitch fraction {frac}")


def test_selfoc_quarter_pitch_focus():
    """Quarter-pitch rod: collimated in -> focus at the exit face."""
    lens = _grin_rod(L_QUARTER)
    out, hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=16,
                           distribution="hexapolar", record=True)
    x_exit = np.asarray(hist.x[2])
    y_exit = np.asarray(hist.y[2])
    r = np.hypot(x_exit, y_exit)
    assert np.isfinite(r).all()
    assert r.max() < 2e-3, r.max()           # 0.5 mm beam -> micron-scale spot


def test_axial_grin_opd():
    """Pure axial gradient: rays stay straight, OPD = n0*L + nz1*L^2/2."""
    length = 10.0
    nz1 = 0.01
    lens = _grin_rod(length, nr2=0.0, nz1=nz1)
    out, hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4,
                           distribution="line_y", record=True)
    y_in = np.asarray(hist.y[1])
    y_exit = np.asarray(hist.y[2])
    np.testing.assert_allclose(y_exit, y_in, atol=1e-9)  # no bending
    opd_gap = np.asarray(hist.opd[2]) - np.asarray(hist.opd[1])
    want = N0 * length + nz1 * length**2 / 2.0
    np.testing.assert_allclose(opd_gap, want, rtol=1e-6)


def test_grin_gradient_finite_and_useful():
    """d(spot size)/d(nr2) is finite and nonzero: GRIN profiles are
    optimizable variables."""
    length = 12.0
    grin = GrinMaterial(N0, n_steps=64)

    def rms_spot(nr2):
        lens = Optic()
        lens.add_surface(index=0, thickness=np.inf)
        lens.add_surface(index=1, thickness=length, is_stop=True,
                         material=(grin, grin.default_params(nr2=nr2)))
        lens.add_surface(index=2, thickness=5.0)
        lens.add_surface(index=3)
        lens.set_aperture("EPD", 1.0)
        lens.set_field_type("angle")
        lens.add_field(0, 0)
        lens.add_wavelength(0.55, is_primary=True)
        model, params = lens.build()
        params["surfaces"][1]["material"]["nr2"] = nr2
        from optiland_pr_tpu.trace.real import trace
        from optiland_pr_tpu.core.distributions import generate_distribution
        Px, Py = generate_distribution("hexapolar", 3)
        out = trace(model, params, 0.0, 0.0, 0.55, Px, Py)
        return jnp.sqrt(jnp.mean(out.x**2 + out.y**2))

    val, grad = jax.value_and_grad(rms_spot)(jnp.asarray(NR2))
    assert np.isfinite(float(val))
    assert np.isfinite(float(grad))
    assert abs(float(grad)) > 1e-6

    # the gradient matches central differences
    eps = 1e-6
    fd = (float(rms_spot(jnp.asarray(NR2 + eps)))
          - float(rms_spot(jnp.asarray(NR2 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(grad), fd, rtol=1e-3)


def test_grin_and_instance_material_json_roundtrip(tmp_path):
    """Materials given as model instances (ideal, grin) survive JSON I/O."""
    from optiland_pr_tpu.fileio.json_io import save_optic, load_optic
    from optiland_pr_tpu.samples import NavarroWideAngleEye

    for build in (lambda: _grin_rod(L_QUARTER), NavarroWideAngleEye):
        lens = build()
        f = tmp_path / "sys.json"
        save_optic(lens, str(f))
        lens2 = load_optic(str(f))
        a = lens.trace(Hx=0.0, Hy=0.0, wavelength=lens.wavelengths[
            lens.primary_wavelength_idx], num_rays=6, distribution="line_y")
        b = lens2.trace(Hx=0.0, Hy=0.0, wavelength=lens2.wavelengths[
            lens2.primary_wavelength_idx], num_rays=6, distribution="line_y")
        np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y),
                                   rtol=1e-12)


def test_grin_paraxial_matches_real_trace():
    """Paraxial f2 through a parabolic GRIN rod agrees with the real-ray
    finite-difference focal length (marginal ray, small height)."""
    for frac in (0.15, 0.25, 0.4):
        length = frac * 2 * np.pi / G
        lens = _grin_rod(length)
        f2 = float(lens.paraxial.f2())
        # real-ray: parallel input at small height -> f = -y_in / u_out
        out, hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4,
                               distribution="line_y", record=True)
        y_in = np.asarray(hist.y[1])
        L_exit = np.asarray(hist.L[2]) if hasattr(hist, "L") else None
        # use the two innermost rays for the paraxial limit
        i = np.argsort(np.abs(y_in))[1]
        # slope after exit face from positions at exit and image plane
        y2 = np.asarray(hist.y[2])[i]
        y3 = np.asarray(hist.y[3])[i]
        t23 = 5.0  # rod exit -> image distance in _grin_rod
        u_out = (y3 - y2) / t23
        f_real = -y_in[i] / u_out
        np.testing.assert_allclose(f2, f_real, rtol=5e-3,
                                   err_msg=f"pitch fraction {frac}")


def test_grin_paraxial_epd_quarter_pitch():
    """EPD through a GRIN gap: finite, and matches the stop diameter when the
    stop is at the rod entry."""
    lens = _grin_rod(L_QUARTER)
    epd = float(lens.paraxial.EPD())
    np.testing.assert_allclose(epd, 1.0, rtol=1e-9)  # stop at first surface
    f2 = float(lens.paraxial.f2())
    want = 1.0 / (N0 * G * np.sin(G * L_QUARTER))     # selfoc EFL at L=q pitch
    np.testing.assert_allclose(f2, want, rtol=1e-6)
