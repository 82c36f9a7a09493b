"""Real-ray and paraxial parity vs the live reference (numpy backend).

Mirrors the reference's dual-backend fixture approach (tests/conftest.py:5-19
there): same prescriptions traced through both implementations, compared with
rtol 1e-8 (both are float64 here).
"""
import numpy as np
import pytest

import optiland_pr_tpu.samples as samples

RTOL = 1e-8
ATOL = 1e-10


def _ref_lens(ref_optiland, name):
    import optiland.samples.objectives as ro
    return getattr(ro, name)()


LENSES = ["CookeTriplet", "DoubleGauss", "TripletTelescopeObjective",
          "ReverseTelephoto"]


@pytest.mark.parametrize("name", LENSES)
def test_paraxial_properties(ref_optiland, name):
    ours = getattr(samples, name)()
    ref = _ref_lens(ref_optiland, name)
    p = ours.paraxial
    rp = ref.paraxial
    for prop in ["f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2", "EPL", "EPD",
                 "XPL", "XPD", "FNO", "magnification"]:
        got = float(getattr(p, prop)())
        want = float(getattr(rp, prop)())
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10,
                                   err_msg=f"{name}.{prop}")


@pytest.mark.parametrize("name", LENSES)
def test_marginal_chief_rays(ref_optiland, name):
    ours = getattr(samples, name)()
    ref = _ref_lens(ref_optiland, name)
    ya, ua = ours.paraxial.marginal_ray()
    ya_r, ua_r = ref.paraxial.marginal_ray()
    np.testing.assert_allclose(np.asarray(ya).ravel(), np.asarray(ya_r).ravel(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ua).ravel(), np.asarray(ua_r).ravel(),
                               rtol=1e-9, atol=1e-12)
    yb, ub = ours.paraxial.chief_ray()
    yb_r, ub_r = ref.paraxial.chief_ray()
    np.testing.assert_allclose(np.asarray(yb).ravel(), np.asarray(yb_r).ravel(),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ub).ravel(), np.asarray(ub_r).ravel(),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", LENSES)
@pytest.mark.parametrize("field", [(0.0, 0.0), (0.0, 0.7), (0.5, 1.0)])
@pytest.mark.parametrize("dist,nr", [("line_y", 16), ("hexapolar", 4),
                                     ("uniform", 8)])
def test_real_trace_parity(ref_optiland, name, field, dist, nr):
    ours = getattr(samples, name)()
    ref = _ref_lens(ref_optiland, name)
    Hx, Hy = field
    wl = ref.primary_wavelength
    got = ours.trace(Hx=Hx, Hy=Hy, wavelength=wl, num_rays=nr,
                     distribution=dist)
    want = ref.trace(Hx=Hx, Hy=Hy, wavelength=wl, num_rays=nr,
                     distribution=dist)
    for attr_o, attr_r in [("x", "x"), ("y", "y"), ("z", "z"), ("L", "L"),
                           ("M", "M"), ("N", "N"), ("opd", "opd"),
                           ("intensity", "i")]:
        np.testing.assert_allclose(
            np.asarray(getattr(got, attr_o)), np.asarray(getattr(want, attr_r)),
            rtol=RTOL, atol=ATOL, err_msg=f"{name} {field} {dist} {attr_o}")


@pytest.mark.parametrize("name", ["CookeTriplet", "DoubleGauss"])
def test_trace_history_matches_reference_recording(ref_optiland, name):
    ours = getattr(samples, name)()
    ref = _ref_lens(ref_optiland, name)
    wl = ref.primary_wavelength
    rays, hist = ours.trace(Hx=0.0, Hy=1.0, wavelength=wl, num_rays=8,
                            distribution="line_y", record=True)
    ref.trace(Hx=0.0, Hy=1.0, wavelength=wl, num_rays=8,
              distribution="line_y")
    sg = ref.surface_group
    np.testing.assert_allclose(np.asarray(hist.x), np.asarray(sg.x),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(hist.y), np.asarray(sg.y),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(hist.opd), np.asarray(sg.opd),
                               rtol=RTOL, atol=ATOL)


def test_multi_field_trace(ref_optiland):
    """Vectorized multi-field trace matches per-field reference traces."""
    ours = samples.CookeTriplet()
    ref = _ref_lens(ref_optiland, "CookeTriplet")
    wl = 0.55
    got = ours.trace(Hx=np.array([0.0, 0.0, 0.0]), Hy=np.array([0.0, 0.7, 1.0]),
                     wavelength=wl, num_rays=6, distribution="line_y")
    ys = np.asarray(got.y).reshape(3, -1)
    for i, hy in enumerate([0.0, 0.7, 1.0]):
        want = ref.trace(Hx=0.0, Hy=hy, wavelength=wl, num_rays=6,
                         distribution="line_y")
        np.testing.assert_allclose(ys[i], np.asarray(want.y), rtol=RTOL,
                                   atol=ATOL)


def _finite_doublet(cls):
    """Finite-conjugate doublet + field flattener, built with either API."""
    import numpy as np
    lens = cls()
    lens.add_surface(index=0, radius=np.inf, thickness=200.0)
    lens.add_surface(index=1, radius=61.2, thickness=6.0, material="N-BK7",
                     is_stop=True)
    lens.add_surface(index=2, radius=-43.2, thickness=2.0,
                     material=("F2", "schott"))
    lens.add_surface(index=3, radius=-128.0, thickness=80.0)
    lens.add_surface(index=4, radius=-24.0, thickness=2.5, material="N-BK7")
    lens.add_surface(index=5, radius=np.inf, thickness=5.0)
    lens.add_surface(index=6)
    lens.set_aperture(aperture_type="EPD", value=20.0)
    lens.set_field_type(field_type="object_height")
    lens.add_field(y=0)
    lens.add_field(y=10)
    lens.add_wavelength(value=0.5876, is_primary=True)
    return lens


def test_finite_object_trace(ref_optiland):
    """Finite-conjugate system with object_height fields."""
    from optiland.optic import Optic as RefOptic
    from optiland_pr_tpu.system import Optic as OurOptic
    ours = _finite_doublet(OurOptic)
    ref = _finite_doublet(RefOptic)

    got = ours.trace(Hx=0.0, Hy=1.0, wavelength=0.5876, num_rays=8,
                     distribution="line_y")
    want = ref.trace(Hx=0.0, Hy=1.0, wavelength=0.5876, num_rays=8,
                     distribution="line_y")
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got.opd), np.asarray(want.opd),
                               rtol=RTOL, atol=ATOL)


def _unused_old_finite(ref_optiland):
    import optiland
    ours = samples.LensWithFieldCorrector()
    # build equivalent reference system
    ref = optiland.optic.Optic()
    ref.add_surface(index=0, radius=np.inf, thickness=200.0)
    ref.add_surface(index=1, radius=61.2, thickness=6.0, material="N-BK7",
                    is_stop=True)
    ref.add_surface(index=2, radius=-43.2, thickness=2.0,
                    material=("F2", "schott"))
    ref.add_surface(index=3, radius=-128.0, thickness=80.0)
    ref.add_surface(index=4, radius=-24.0, thickness=2.5, material="N-BK7")
    ref.add_surface(index=5, radius=np.inf, thickness=5.0)
    ref.add_surface(index=6)
    ref.set_aperture(aperture_type="EPD", value=20.0)
    ref.set_field_type(field_type="object_height")
    ref.add_field(y=0)
    ref.add_field(y=10)
    ref.add_wavelength(value=0.5876, is_primary=True)

    got = ours.trace(Hx=0.0, Hy=1.0, wavelength=0.5876, num_rays=8,
                     distribution="line_y")
    want = ref.trace(Hx=0.0, Hy=1.0, wavelength=0.5876, num_rays=8,
                     distribution="line_y")
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got.opd), np.asarray(want.opd),
                               rtol=RTOL, atol=ATOL)
