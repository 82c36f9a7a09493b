"""Geometry sag/normal/intersection parity vs the reference
(reference test model: tests/test_geometries.py there, 2,903 LoC)."""
import numpy as np
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.geometry import (StandardGeometry, Plane, EvenAsphere,
                                      OddAsphere, PolynomialXY, ChebyshevSag,
                                      Biconic, Toroidal, ZernikeSag,
                                      ForbesQbfs, FresnelZoneSag)

RNG = np.random.RandomState(42)
X = RNG.uniform(-8, 8, 150)
Y = RNG.uniform(-8, 8, 150)


def _ref_cs(ref_optiland):
    from optiland.coordinate_system import CoordinateSystem
    return CoordinateSystem()


def _check_sag_normal(g, p, ref_geom, x=X, y=Y, rtol=1e-9, atol=1e-12):
    zs = np.asarray(g.sag(p, jnp.asarray(x), jnp.asarray(y)))
    zr = np.asarray(ref_geom.sag(x, y))
    np.testing.assert_allclose(zs, zr, rtol=rtol, atol=atol)

    class _FakeRays:
        pass
    fr = _FakeRays()
    fr.x, fr.y = x, y
    n_ref = ref_geom.surface_normal(fr)
    n_my = g.normal(p, jnp.asarray(x), jnp.asarray(y))
    for a, b in zip(n_my, n_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                                   atol=1e-10)


def test_standard_geometry(ref_optiland):
    from optiland.geometries import StandardGeometry as RefStd
    g = StandardGeometry()
    p = g.default_params(radius=55.0, conic=-0.8)
    _check_sag_normal(g, p, RefStd(_ref_cs(ref_optiland), 55.0, -0.8))


def test_even_asphere(ref_optiland):
    from optiland.geometries import EvenAsphere as RefEA
    coeffs = [1e-5, -3e-8, 2e-10]
    g = EvenAsphere(3)
    p = g.default_params(radius=40.0, conic=-1.2, coefficients=coeffs)
    _check_sag_normal(g, p, RefEA(_ref_cs(ref_optiland), 40.0, -1.2,
                                  coefficients=coeffs))


def test_odd_asphere(ref_optiland):
    from optiland.geometries import OddAsphere as RefOA
    coeffs = [1e-4, -2e-6, 3e-8]
    g = OddAsphere(3)
    p = g.default_params(radius=60.0, conic=0.0, coefficients=coeffs)
    _check_sag_normal(g, p, RefOA(_ref_cs(ref_optiland), 60.0, 0.0,
                                  coefficients=coeffs))


def test_polynomial_xy(ref_optiland):
    from optiland.geometries import PolynomialGeometry as RefPoly
    coeffs = [[0.0, 1e-4, -2e-6], [1e-4, 2e-5, 0.0], [-3e-6, 0.0, 1e-7]]
    g = PolynomialXY(3, 3)
    p = g.default_params(radius=70.0, conic=0.0, coefficients=coeffs)
    _check_sag_normal(g, p, RefPoly(_ref_cs(ref_optiland), 70.0, 0.0,
                                    coefficients=coeffs))


def test_chebyshev(ref_optiland):
    from optiland.geometries import ChebyshevPolynomialGeometry as RefCheb
    coeffs = [[0.0, 1e-3], [2e-3, -1e-3]]
    g = ChebyshevSag(2, 2)
    p = g.default_params(radius=90.0, conic=0.0, coefficients=coeffs,
                         norm_x=10.0, norm_y=10.0)
    ref = RefCheb(_ref_cs(ref_optiland), 90.0, 0.0, coefficients=coeffs,
                  norm_x=10.0, norm_y=10.0)
    _check_sag_normal(g, p, ref)


def test_biconic(ref_optiland):
    from optiland.geometries import BiconicGeometry as RefBiconic
    g = Biconic()
    p = g.default_params(radius=80.0, conic=-0.5, radius_x=50.0, conic_x=0.2)
    ref = RefBiconic(_ref_cs(ref_optiland), radius_x=50.0, radius_y=80.0,
                     conic_x=0.2, conic_y=-0.5)
    _check_sag_normal(g, p, ref)


def test_toroidal(ref_optiland):
    from optiland.geometries import ToroidalGeometry as RefToroidal
    g = Toroidal(2)
    p = g.default_params(radius=40.0, conic=-0.3, radius_rot=120.0,
                         coeffs_poly_y=[1e-5, -2e-7])
    ref = RefToroidal(_ref_cs(ref_optiland), radius_x=120.0, radius_y=40.0,
                      conic=-0.3, coeffs_poly_y=[1e-5, -2e-7])
    x = RNG.uniform(-5, 5, 100)
    y = RNG.uniform(-5, 5, 100)
    _check_sag_normal(g, p, ref, x=x, y=y)


def test_zernike_sag(ref_optiland):
    from optiland.geometries import ZernikePolynomialGeometry as RefZern
    coeffs = [0.01, -0.005, 0.002, 0.001, 0.0005]
    g = ZernikeSag(5, "standard")
    p = g.default_params(radius=100.0, conic=0.0, coefficients=coeffs,
                         norm_radius=10.0)
    ref = RefZern(_ref_cs(ref_optiland), 100.0, 0.0, coefficients=coeffs,
                  norm_radius=10.0)
    x = RNG.uniform(-7, 7, 100)
    y = RNG.uniform(-7, 7, 100)
    zs = np.asarray(g.sag(p, jnp.asarray(x), jnp.asarray(y)))
    zr = np.asarray(ref.sag(x, y))
    np.testing.assert_allclose(zs, zr, rtol=1e-9, atol=1e-12)
    # NOTE: the reference's analytic Zernike normal disagrees with finite
    # differences of its own sag (~3e-4); our gradient matches FD to 1e-6,
    # so FD of the reference sag is the ground truth here.
    h = 1e-6
    fd_x = (np.asarray(ref.sag(x + h, y)) - np.asarray(ref.sag(x - h, y))) \
        / (2 * h)
    fd_y = (np.asarray(ref.sag(x, y + h)) - np.asarray(ref.sag(x, y - h))) \
        / (2 * h)
    gx, gy = g.sag_grad(p, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx), fd_x, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy), fd_y, rtol=1e-5, atol=1e-8)


def test_forbes_qbfs(ref_optiland):
    from optiland.geometries.forbes.geometry import (ForbesQbfsGeometry,
                                                     ForbesSurfaceConfig)
    terms = {0: 1e-4, 1: -2e-5, 2: 5e-6, 3: 1e-6}
    cfg = ForbesSurfaceConfig(radius=50.0, conic=-0.5, terms=terms,
                              norm_radius=12.0)
    ref = ForbesQbfsGeometry(_ref_cs(ref_optiland), cfg)
    g = ForbesQbfs(4)
    p = g.default_params(radius=50.0, conic=-0.5,
                         coefficients=[1e-4, -2e-5, 5e-6, 1e-6],
                         norm_radius=12.0)
    x = RNG.uniform(-10, 10, 100)
    y = RNG.uniform(-10, 10, 100)
    zs = np.asarray(g.sag(p, jnp.asarray(x), jnp.asarray(y)))
    zr = np.asarray(ref.sag(x, y))
    np.testing.assert_allclose(zs, zr, rtol=1e-10, atol=1e-14)
    dx, dy = ref._surface_normal_analytical(x, y)
    gx, gy = g.sag_grad(p, jnp.asarray(x), jnp.asarray(y))
    # reference returns df/dx before normalization here
    np.testing.assert_allclose(np.asarray(gx), np.asarray(dx), rtol=1e-8,
                               atol=1e-12)


def test_newton_intersection_matches_reference(ref_optiland):
    """Full ray-surface intersection through an asphere vs the reference NR."""
    from optiland.geometries import EvenAsphere as RefEA
    from optiland.rays import RealRays
    coeffs = [1e-5, -3e-8]
    ref = RefEA(_ref_cs(ref_optiland), 45.0, -0.7, coefficients=coeffs)
    g = EvenAsphere(2)
    p = g.default_params(radius=45.0, conic=-0.7, coefficients=coeffs)

    n = 50
    x0 = RNG.uniform(-5, 5, n)
    y0 = RNG.uniform(-5, 5, n)
    z0 = np.full(n, -10.0)
    L = RNG.uniform(-0.1, 0.1, n)
    M = RNG.uniform(-0.1, 0.1, n)
    N = np.sqrt(1 - L**2 - M**2)

    rays = RealRays(x0.copy(), y0.copy(), z0.copy(), L.copy(), M.copy(),
                    N.copy(), np.ones(n), np.full(n, 0.55))
    t_ref = np.asarray(ref.distance(rays))
    t_my = np.asarray(g.distance(p, *[jnp.asarray(v) for v in
                                      (x0, y0, z0, L, M, N)]))
    np.testing.assert_allclose(t_my, t_ref, rtol=1e-9, atol=1e-10)


def test_fresnel_zone_sag_is_collapsed():
    g = FresnelZoneSag()
    p = g.default_params(radius=100.0, conic=0.0, zone_depth=0.5)
    parent = StandardGeometry()
    pp = parent.default_params(radius=100.0, conic=0.0)
    x = jnp.linspace(0.0, 30.0, 500)
    y = jnp.zeros_like(x)
    z = np.asarray(g.sag(p, x, y))
    zp = np.asarray(parent.sag(pp, x, y))
    assert z.max() < 0.5 + 1e-9      # bounded by zone depth
    assert zp.max() > 3.0            # parent profile is deep
    # facet slope equals parent slope
    gx, _ = g.sag_grad(p, x, y)
    px_, _ = parent.sag_grad(pp, x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(px_), rtol=1e-12)


def test_plane_distance():
    g = Plane()
    p = g.default_params()
    t = g.distance(p, jnp.asarray([0.0]), jnp.asarray([0.0]),
                   jnp.asarray([-5.0]), jnp.asarray([0.0]),
                   jnp.asarray([0.0]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(t), [5.0])


# -- NURBS: geometry + fitting (reference geometries/nurbs/) -----------------

def test_nurbs_fit_matches_reference(ref_optiland):
    """approximate_surface parity vs the reference (nurbs_fitting.py:19)."""
    from optiland.geometries.nurbs import approximate_surface as ref_fit
    from optiland_pr_tpu.geometry.nurbs_fit import approximate_surface

    size_u = size_v = 12
    radius, conic = 60.0, -0.4
    x = np.linspace(-10, 10, size_u)
    y = np.linspace(-10, 10, size_v)
    Xg, Yg = np.meshgrid(x, y, indexing="ij")
    r2 = Xg**2 + Yg**2
    Z = r2 / (radius * (1 + np.sqrt(1 - (1 + conic) * r2 / radius**2)))
    pts = np.stack([Xg, Yg, Z], axis=-1)

    flat = pts.reshape(-1, 3).tolist()   # reference's v-fastest flat list
    ref_ctrl, du, dv, ncu, ncv, kv_u, kv_v = ref_fit(
        flat, size_u, size_v, 3, 3)
    ref_ctrl = np.asarray(ref_ctrl).reshape(ncu, ncv, 3)

    ctrl, my_ku, my_kv = approximate_surface(pts, size_u, size_v, 3, 3)
    np.testing.assert_allclose(my_ku, np.asarray(kv_u), atol=1e-12)
    np.testing.assert_allclose(my_kv, np.asarray(kv_v), atol=1e-12)
    np.testing.assert_allclose(ctrl, ref_ctrl, rtol=1e-9, atol=1e-10)


def test_nurbs_fitted_conic_sag_and_trace():
    """A NURBS net fitted to a conic reproduces its sag and intersections."""
    from optiland_pr_tpu.geometry.nurbs import NurbsGeometry
    from optiland_pr_tpu.geometry.nurbs_fit import nurbs_params_from_standard

    radius, conic = 60.0, -0.4
    kw = nurbs_params_from_standard(radius, conic, norm_x=12.0, norm_y=12.0,
                                    size_u=40, size_v=40)
    ncu, ncv = kw["control_points"].shape[1:3]
    g = NurbsGeometry(ncu, ncv, kw["u_degree"], kw["v_degree"])
    p = g.default_params(control_points=kw["control_points"],
                         weights=kw["weights"], u_knots=kw["u_knots"],
                         v_knots=kw["v_knots"])

    ref = StandardGeometry()
    pr = ref.default_params(radius=radius, conic=conic)

    xs = jnp.asarray(RNG.uniform(-8, 8, 64))
    ys = jnp.asarray(RNG.uniform(-8, 8, 64))
    np.testing.assert_allclose(np.asarray(g.sag(p, xs, ys)),
                               np.asarray(ref.sag(pr, xs, ys)),
                               atol=5e-6)

    # oblique ray intersection distances agree with the closed form
    n = 32
    x0 = jnp.asarray(RNG.uniform(-5, 5, n))
    y0 = jnp.asarray(RNG.uniform(-5, 5, n))
    z0 = jnp.full((n,), -20.0)
    L = jnp.full((n,), 0.08)
    M = jnp.full((n,), -0.05)
    Nz = jnp.sqrt(1 - L**2 - M**2)
    t_my = np.asarray(g.distance(p, x0, y0, z0, L, M, Nz))
    t_ref = np.asarray(ref.distance(pr, x0, y0, z0, L, M, Nz))
    np.testing.assert_allclose(t_my, t_ref, atol=1e-5)


def test_nurbs_fit_arbitrary_sag():
    """Beyond-reference: fit any sag callable (here an even asphere)."""
    from optiland_pr_tpu.geometry.nurbs import NurbsGeometry
    from optiland_pr_tpu.geometry.nurbs_fit import fit_nurbs_sag

    R, k, c4 = 80.0, 0.0, 1e-6

    def sag(x, y):
        r2 = x**2 + y**2
        return (r2 / (R * (1 + np.sqrt(1 - (1 + k) * r2 / R**2)))
                + c4 * r2**2)

    kw = fit_nurbs_sag(sag, 10.0, 10.0, size_u=40, size_v=40)
    ncu, ncv = kw["control_points"].shape[1:3]
    g = NurbsGeometry(ncu, ncv)
    p = g.default_params(control_points=kw["control_points"],
                         weights=kw["weights"], u_knots=kw["u_knots"],
                         v_knots=kw["v_knots"])
    xs = jnp.asarray(RNG.uniform(-7, 7, 50))
    ys = jnp.asarray(RNG.uniform(-7, 7, 50))
    np.testing.assert_allclose(np.asarray(g.sag(p, xs, ys)),
                               sag(np.asarray(xs), np.asarray(ys)), atol=5e-6)
