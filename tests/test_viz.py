"""Visualization + facade-maintenance smoke tests (reference
tests/visualization/ are matplotlib smoke tests; same approach here)."""
import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np

from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.system import Optic


def test_draw_2d_smoke():
    fig, ax = CookeTriplet().draw(num_rays=3)
    assert len(ax.lines) > 0


def test_draw_3d_smoke():
    fig, ax = CookeTriplet().draw3D(num_rays=6)
    assert ax.name == "3d"


def test_info_table():
    df = CookeTriplet().info()
    assert len(df) == 8  # object + 6 lens surfaces + image
    assert "*" in df["Stop"].values


def test_plot_surface_sag_smoke():
    CookeTriplet().plot_surface_sag(1, r_max=5.0, n=16)


def _chebyshev_singlet():
    o = Optic()
    o.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    o.add_surface(index=1, surface_type="chebyshev", radius=50.0,
                  thickness=5.0, material=1.5, is_stop=True,
                  coefficients=[[0.0, 0.0], [0.0, 1e-5]],
                  norm_x=1.0, norm_y=1.0)
    o.add_surface(index=2, radius=-50.0, thickness=40.0)
    o.add_surface(index=3)
    o.set_aperture(aperture_type="EPD", value=10.0)
    o.set_field_type(field_type="angle")
    o.add_field(y=0)
    o.add_field(y=5)
    o.add_wavelength(value=0.55, is_primary=True)
    return o


def test_update_paraxial_sets_semi_aperture_and_norms():
    """Reference optic_updater.update_paraxial:192-232: semi = |ya| + |yb|,
    norm_x/norm_y = 1.25 * semi. At the stop (EPD 10, on-axis field):
    semi = 5, norm = 6.25."""
    o = _chebyshev_singlet()
    o.update_paraxial()
    np.testing.assert_allclose(o._surfaces[1]["semi_aperture"], 5.0,
                               rtol=1e-9)
    np.testing.assert_allclose(o._surfaces[1]["geom_kw"]["norm_x"], 6.25,
                               rtol=1e-9)
    np.testing.assert_allclose(o._surfaces[1]["geom_kw"]["norm_y"], 6.25,
                               rtol=1e-9)
    # system still traces after the rebuild
    r = o.trace(Hx=0, Hy=1, wavelength=0.55, num_rays=4,
                distribution="line_y")
    assert np.isfinite(np.asarray(r.y)).all()


def test_update_normalization_respects_variable_flag():
    o = _chebyshev_singlet()
    o._surfaces[1]["semi_aperture"] = 4.0
    o._surfaces[1]["norm_radius_is_variable"] = True
    o.update_normalization()
    # untouched: flagged as an optimization variable (reference
    # optic_updater.update_normalization:215-217)
    np.testing.assert_allclose(o._surfaces[1]["geom_kw"]["norm_x"], 1.0)
