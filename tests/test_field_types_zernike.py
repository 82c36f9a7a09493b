"""Field-type and Zernike-basis long-tail parity (reference
tests/test_field_types.py, tests/test_zernike.py analogues).

Covers ParaxialImageHeightField (infinite + finite object + real-trace
equivalence), thin-lens (paraxial) surfaces, and the fringe/noll/standard
Zernike bases term-by-term.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from optiland_pr_tpu.system.optic import Optic
from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.trace.paraxial import Paraxial


def _pih_singlet(obj_thickness):
    lens = Optic()
    lens.add_surface(index=0, radius=jnp.inf, thickness=obj_thickness)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True)
    lens.add_surface(index=2, radius=jnp.inf, thickness=100.0)
    lens.add_surface(index=3)
    lens.set_field_type("paraxial_image_height")
    lens.add_field(y=10)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.58756, is_primary=True)
    return lens


def test_paraxial_image_height_infinite_object():
    """Chief ray lands at the requested image height (reference
    tests/test_field_types.py:9-26)."""
    model, params = _pih_singlet(jnp.inf).build()
    y, _ = Paraxial(model, params).chief_ray()
    np.testing.assert_allclose(float(np.asarray(y[-1]).ravel()[-1]), 10.0,
                               rtol=1e-5)


def test_paraxial_image_height_finite_object():
    """Reference golden value 9.67243803 (tests/test_field_types.py:29-46)."""
    model, params = _pih_singlet(50.0).build()
    y, _ = Paraxial(model, params).chief_ray()
    np.testing.assert_allclose(float(np.asarray(y[-1]).ravel()[-1]),
                               9.67243803, rtol=1e-5)


def test_paraxial_image_height_equivalent_to_angle():
    """On Cooke, paraxial_image_height with y = chief-ray image height must
    reproduce the angle-field chief ray (tests/test_field_types.py:66-91)."""
    lens = CookeTriplet()
    model, params = lens.build()
    y_ang, u_ang = Paraxial(model, params).chief_ray()
    h_img = float(np.asarray(y_ang[-1]).ravel()[-1])

    lens2 = CookeTriplet()
    lens2.set_field_type("paraxial_image_height")
    lens2.fields = []
    lens2._dirty()
    lens2.add_field(y=0)
    lens2.add_field(y=h_img)
    model2, params2 = lens2.build()
    y_pih, u_pih = Paraxial(model2, params2).chief_ray()
    np.testing.assert_allclose(np.asarray(y_pih).ravel(),
                               np.asarray(y_ang).ravel(), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_pih).ravel(),
                               np.asarray(u_ang).ravel(), rtol=1e-9,
                               atol=1e-12)


def test_paraxial_image_height_real_trace_parity(ref_optiland):
    """Real rays through a paraxial_image_height system match the live
    reference."""
    from optiland.optic import Optic as RefOptic
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.core.distributions import generate_distribution

    ref = RefOptic()
    ref.add_surface(index=0, thickness=float("inf"))
    ref.add_surface(index=1, material="N-BK7", radius=50, thickness=5,
                    is_stop=True)
    ref.add_surface(index=2, thickness=100)
    ref.add_surface(index=3)
    ref.set_field_type("paraxial_image_height")
    ref.add_field(y=10)
    ref.set_aperture("EPD", 10)
    ref.add_wavelength(0.58756, is_primary=True)

    lens = _pih_singlet(jnp.inf)
    model, params = lens.build()

    Px, Py = generate_distribution("hexapolar", 4)
    rays = real_trace.trace(model, params, 0.0, 1.0, 0.58756, Px, Py)
    ref_rays = ref.trace(Hx=0.0, Hy=1.0, wavelength=0.58756,
                         num_rays=4, distribution="hexapolar")
    np.testing.assert_allclose(np.asarray(rays.x), np.asarray(ref_rays.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rays.y), np.asarray(ref_rays.y),
                               rtol=1e-9, atol=1e-12)


def test_thin_lens_surface_parity(ref_optiland):
    """A paraxial (thin-lens) surface traces identically to the reference's
    ThinLensInteractionModel (interactions/thin_lens_interaction_model.py)."""
    from optiland.optic import Optic as RefOptic
    from optiland_pr_tpu.trace import real as real_trace
    from optiland_pr_tpu.core.distributions import generate_distribution

    def build_ref():
        r = RefOptic()
        r.add_surface(index=0, thickness=float("inf"))
        r.add_surface(index=1, surface_type="paraxial", f=80.0,
                      thickness=80.0, is_stop=True)
        r.add_surface(index=2)
        r.set_field_type("angle")
        r.add_field(y=0)
        r.add_field(y=5)
        r.set_aperture("EPD", 20)
        r.add_wavelength(0.55, is_primary=True)
        return r

    lens = Optic()
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, surface_type="paraxial", f=80.0,
                     thickness=80.0, is_stop=True)
    lens.add_surface(index=2)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_field(y=5)
    lens.set_aperture(aperture_type="EPD", value=20.0)
    lens.add_wavelength(value=0.55, is_primary=True)
    model, params = lens.build()

    ref = build_ref()
    Px, Py = generate_distribution("hexapolar", 5)
    for Hy in (0.0, 1.0):
        rays = real_trace.trace(model, params, 0.0, Hy, 0.55, Px, Py)
        ref_rays = ref.trace(Hx=0.0, Hy=Hy, wavelength=0.55, num_rays=5,
                             distribution="hexapolar")
        np.testing.assert_allclose(np.asarray(rays.x),
                                   np.asarray(ref_rays.x),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(rays.y),
                                   np.asarray(ref_rays.y),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(rays.N),
                                   np.asarray(ref_rays.N),
                                   rtol=1e-9, atol=1e-12)


# --- Zernike bases ----------------------------------------------------------

@pytest.mark.parametrize("ztype", ["fringe", "noll", "standard"])
def test_zernike_basis_parity(ref_optiland, ztype):
    """Polynomial values term-by-term vs the reference's ZernikeFringe/
    ZernikeNoll/ZernikeStandard over a polar grid (zernike/*.py)."""
    from optiland.zernike import ZernikeFringe, ZernikeNoll, ZernikeStandard
    from optiland_pr_tpu.core.zernike import zernike_eval

    ref_cls = {"fringe": ZernikeFringe, "noll": ZernikeNoll,
               "standard": ZernikeStandard}[ztype]
    rng = np.random.default_rng(3)
    rho = rng.uniform(0, 1, 200)
    phi = rng.uniform(0, 2 * np.pi, 200)
    n_terms = 15
    for k in range(n_terms):
        coeffs = np.zeros(n_terms)
        coeffs[k] = 1.0
        ref = ref_cls(coeffs=coeffs)
        ours = zernike_eval(ztype, jnp.asarray(coeffs), jnp.asarray(rho),
                            jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(ours),
                                   np.asarray(ref.poly(rho, phi)),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=f"{ztype} term {k}")
