"""Live-reference parity for subsystems that were previously claimed but not
test-enforced (VERDICT round 1 item 1): Seidel/chromatic aberrations, wavefront
centroid/best-fit strategies, BestFitRayFan, Distortion/GridDistortion,
Huygens PSF, MMDFT PSF, Sampled/Geometric MTF, Jones elements, scatter BSDFs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.samples import CookeTriplet, DoubleGauss, HubbleTelescope
from optiland_pr_tpu.core.distributions import generate_distribution
from optiland_pr_tpu.analysis.wavefront import wavefront_data
from optiland_pr_tpu.trace.aberrations import Aberrations


# ---------------------------------------------------------------- Seidel

@pytest.mark.parametrize("mk,ref_path", [
    (CookeTriplet, ("objectives", "CookeTriplet")),
    (DoubleGauss, ("objectives", "DoubleGauss")),
    (HubbleTelescope, ("telescopes", "HubbleTelescope")),
])
def test_seidel_parity(ref_optiland, mk, ref_path):
    """Per-surface third-order + chromatic terms and Seidel sums vs
    /root/reference/optiland/aberrations.py:24-461."""
    import importlib
    mod = importlib.import_module(f"optiland.samples.{ref_path[0]}")
    from optiland.aberrations import Aberrations as RefAb
    ref = RefAb(getattr(mod, ref_path[1])())
    ours = Aberrations(mk())

    ours_terms = ours.third_order()
    ref_terms = ref.third_order()
    names = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
             "TAchC", "LchC", "TchC"]
    assert len(ours_terms) == len(ref_terms)
    for name, a, b in zip(names, ours_terms, ref_terms):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(),
                                   rtol=1e-8, atol=1e-12,
                                   err_msg=f"{ref_path[1]} {name}")
    np.testing.assert_allclose(np.asarray(ours.seidels()).ravel(),
                               np.asarray(ref.seidels()).ravel(),
                               rtol=1e-8, atol=1e-12)


def test_seidel_scalar_accessors(ref_optiland):
    from optiland.aberrations import Aberrations as RefAb
    from optiland.samples.objectives import CookeTriplet as RefCooke
    ref = RefAb(RefCooke())
    ours = Aberrations(CookeTriplet())
    for name in ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
                 "TAchC", "LchC", "TchC"]:
        np.testing.assert_allclose(np.asarray(getattr(ours, name)()).ravel(),
                                   np.asarray(getattr(ref, name)()).ravel(),
                                   rtol=1e-8, atol=1e-12, err_msg=name)


# ------------------------------------------------- wavefront strategies

@pytest.mark.parametrize("strategy", ["centroid_sphere", "best_fit_sphere"])
@pytest.mark.parametrize("field", [(0.0, 0.0), (0.0, 1.0)])
def test_wavefront_strategy_parity(ref_optiland, strategy, field):
    """Centroid-anchored and LSQ best-fit reference spheres vs
    /root/reference/optiland/wavefront/strategy.py:242-511."""
    from optiland.wavefront import Wavefront as RefWavefront
    from optiland.samples.objectives import DoubleGauss as RefDG
    ref = RefWavefront(RefDG(), fields=[field], wavelengths=[0.55],
                       num_rays=8, strategy=strategy)
    rd = ref.get_data(field, 0.55)
    model, params = DoubleGauss().build()
    Px, Py = generate_distribution("hexapolar", 8)
    d = wavefront_data(model, params, field, 0.55, Px, Py, strategy=strategy)
    np.testing.assert_allclose(np.asarray(d.opd), np.asarray(rd.opd),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(d.radius), float(rd.radius), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(d.pupil_x), np.asarray(rd.pupil_x),
                               rtol=1e-6, atol=1e-10)


# ------------------------------------------------------------- ray fans

def test_best_fit_ray_fan_parity(ref_optiland):
    """BestFitRayFan vs /root/reference/optiland/analysis/ray_fan.py:242-346."""
    from optiland.analysis import BestFitRayFan as RefBFF
    from optiland.samples.objectives import DoubleGauss as RefDG
    from optiland_pr_tpu.analysis import BestFitRayFan
    ref = RefBFF(RefDG(), num_points=32)
    ours = BestFitRayFan(DoubleGauss(), num_points=32)
    for f in ours.fields:
        for wl in ours.wavelengths:
            d = ours.data[(f, wl)]
            rd = ref.data[f"{f}"][f"{wl}"]
            np.testing.assert_allclose(np.asarray(d["y_fan"]),
                                       np.asarray(rd["y"]),
                                       rtol=1e-6, atol=1e-9,
                                       err_msg=f"y fan {f} {wl}")
            np.testing.assert_allclose(np.asarray(d["x_fan"]),
                                       np.asarray(rd["x"]),
                                       rtol=1e-6, atol=1e-9,
                                       err_msg=f"x fan {f} {wl}")


def test_ray_fan_parity(ref_optiland):
    from optiland.analysis import RayFan as RefRayFan
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import RayFan
    ref = RefRayFan(RefCooke(), num_points=32)
    ours = RayFan(CookeTriplet(), num_points=32)
    for f in ours.fields:
        for wl in ours.wavelengths:
            d = ours.data[(f, wl)]
            rd = ref.data[f"{f}"][f"{wl}"]
            np.testing.assert_allclose(np.asarray(d["y_fan"]),
                                       np.asarray(rd["y"]), rtol=1e-6,
                                       atol=1e-9, err_msg=f"{f} {wl}")
            np.testing.assert_allclose(np.asarray(d["x_fan"]),
                                       np.asarray(rd["x"]), rtol=1e-6,
                                       atol=1e-9, err_msg=f"{f} {wl}")


# ----------------------------------------------------------- distortion

def test_distortion_parity(ref_optiland):
    from optiland.analysis import Distortion as RefDist
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import Distortion
    for kind in ["f-tan", "f-theta"]:
        ref = RefDist(RefCooke(), distortion_type=kind)
        ours = Distortion(CookeTriplet(), distortion_type=kind)
        for a, b in zip(ours.data, ref.data):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9, err_msg=kind)


def test_grid_distortion_parity(ref_optiland):
    from optiland.analysis import GridDistortion as RefGD
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import GridDistortion
    for kind in ["f-tan", "f-theta"]:
        ref = RefGD(RefCooke(), distortion_type=kind)
        ours = GridDistortion(CookeTriplet(), distortion_type=kind)
        np.testing.assert_allclose(np.asarray(ours.x_ideal),
                                   np.asarray(ref.data["xp"]),
                                   rtol=1e-8, atol=1e-12, err_msg=kind)
        np.testing.assert_allclose(np.asarray(ours.y_real),
                                   np.asarray(ref.data["yr"]),
                                   rtol=1e-8, atol=1e-12, err_msg=kind)
        np.testing.assert_allclose(float(ours.max_distortion),
                                   float(ref.data["max_distortion"]),
                                   rtol=1e-6, err_msg=kind)


# ------------------------------------------------------------------ PSF

def test_huygens_psf_parity(ref_optiland):
    """Huygens-Fresnel PSF grid + Strehl vs
    /root/reference/optiland/psf/huygens_fresnel.py:25-339 (tiny grid: the
    stubbed-numba reference kernel is pure Python)."""
    from optiland.psf import HuygensPSF as RefHuygens
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import HuygensPSF
    ref = RefHuygens(RefCooke(), (0, 1), 0.55, num_rays=16, image_size=16)
    ours = HuygensPSF(CookeTriplet(), (0, 1), 0.55, num_rays=16,
                      image_size=16)
    np.testing.assert_allclose(np.asarray(ours.psf), np.asarray(ref.psf),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(ours.strehl_ratio()),
                               float(ref.strehl_ratio()), rtol=1e-6)


def test_mmdft_psf_parity(ref_optiland):
    """MMDFT PSF vs /root/reference/optiland/psf/mmdft.py:19-315 and the
    MMDFT==FFT sampling equivalence claim."""
    from optiland.psf import MMDFTPSF as RefMMDFT, FFTPSF as RefFFT
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import MMDFTPSF
    ref = RefMMDFT(RefCooke(), (0, 0), 0.55, num_rays=32)
    ours = MMDFTPSF(CookeTriplet(), (0, 0), 0.55, num_rays=32)
    np.testing.assert_allclose(np.asarray(ours.psf), np.asarray(ref.psf),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(ours.strehl_ratio()),
                               float(ref.strehl_ratio()), rtol=1e-6)
    # default sizing reproduces the FFT PSF (reference mmdft.py docstring)
    reff = RefFFT(RefCooke(), (0, 0), 0.55, num_rays=32, grid_size=64)
    c = 32
    np.testing.assert_allclose(
        np.asarray(ours.psf)[c - 8:c + 8, c - 8:c + 8],
        np.asarray(reff.psf)[c - 8:c + 8, c - 8:c + 8], rtol=1e-6, atol=1e-8)


# ------------------------------------------------------------------ MTF

def test_sampled_mtf_parity(ref_optiland):
    from optiland.mtf import SampledMTF as RefSampled
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import SampledMTF
    freqs = [(0.0, 0.0), (10.0, 0.0), (0.0, 25.0), (40.0, 40.0)]
    ref = RefSampled(RefCooke(), (0, 0), 0.55, num_rays=32)
    ours = SampledMTF(CookeTriplet(), (0, 0), 0.55, num_rays=32)
    np.testing.assert_allclose(ours.calculate_mtf(freqs),
                               np.asarray(ref.calculate_mtf(freqs),
                                          dtype=float),
                               rtol=1e-5, atol=1e-8)


def test_geometric_mtf_parity(ref_optiland):
    from optiland.mtf import GeometricMTF as RefGeo
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import GeometricMTF
    ref = RefGeo(RefCooke(), num_rays=64, num_points=32)
    ours = GeometricMTF(CookeTriplet(), num_rays=64, num_points=32)
    for i in range(len(ours.fields)):
        for j in range(2):
            np.testing.assert_allclose(np.asarray(ours.mtf[i][j]),
                                       np.asarray(ref.mtf[i][j]),
                                       rtol=1e-6, atol=1e-9,
                                       err_msg=f"field {i} axis {j}")


def test_huygens_mtf_parity(ref_optiland):
    from optiland.mtf import HuygensMTF as RefHM
    from optiland.samples.objectives import CookeTriplet as RefCooke
    from optiland_pr_tpu.analysis import HuygensMTF
    ref = RefHM(RefCooke(), fields=[(0.0, 0.0)], wavelength=0.55,
                num_rays=16, image_size=16)
    ours = HuygensMTF(CookeTriplet(), fields=[(0.0, 0.0)], wavelength=0.55,
                      num_rays=16, image_size=16)
    np.testing.assert_allclose(np.asarray(ours.freq),
                               np.asarray(ref.freq), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.mtf[0][0]),
                               np.asarray(ref.mtf[0][0]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.mtf[0][1]),
                               np.asarray(ref.mtf[0][1]),
                               rtol=1e-5, atol=1e-8)


# ------------------------------------------------------- Jones elements

def test_jones_elements_parity(ref_optiland):
    """All constant Jones elements vs /root/reference/optiland/jones.py:120-452."""
    import optiland.jones as rj
    from optiland.rays import RealRays
    from optiland_pr_tpu.core import polarization as pol
    # constant elements ignore the ray state beyond its length
    rays = RealRays(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    pairs = [
        (pol.jones_polarizer_h(), rj.JonesPolarizerH()),
        (pol.jones_polarizer_v(), rj.JonesPolarizerV()),
        (pol.jones_polarizer_l45(), rj.JonesPolarizerL45()),
        (pol.jones_polarizer_l135(), rj.JonesPolarizerL135()),
        (pol.jones_polarizer_rcp(), rj.JonesPolarizerRCP()),
        (pol.jones_polarizer_lcp(), rj.JonesPolarizerLCP()),
        (pol.jones_linear_diattenuator(0.2, 0.9, 0.3),
         rj.JonesLinearDiattenuator(0.2, 0.9, 0.3)),
        (pol.jones_linear_retarder(1.1, 0.4),
         rj.JonesLinearRetarder(1.1, 0.4)),
        (pol.jones_quarter_wave(0.25),
         rj.JonesQuarterWaveRetarder(0.25)),
        (pol.jones_half_wave(0.6), rj.JonesHalfWaveRetarder(0.6)),
    ]
    for ours, ref in pairs:
        m_ref = np.asarray(ref.calculate_matrix(rays))
        if m_ref.ndim == 3:
            m_ref = m_ref[0]
        m_ref = m_ref[:2, :2]
        m_ours = np.asarray(ours)[:2, :2]
        np.testing.assert_allclose(m_ours, m_ref, rtol=1e-10, atol=1e-12,
                                   err_msg=type(ref).__name__)


# ----------------------------------------------------------- scatter

def _unit_rays(n):
    from optiland_pr_tpu.core.rays import Rays
    z = jnp.zeros(n)
    return Rays(x=z, y=z, z=z, L=z, M=z, N=jnp.ones(n), intensity=jnp.ones(n),
                opd=z, wavelength=jnp.full(n, 0.55))


def test_lambertian_scatter_statistics():
    """Lambertian BSDF at normal incidence: tangential offsets uniform on the
    unit disk => N = sqrt(1 - r^2) with E[N] = 2/3, and azimuthal symmetry."""
    from optiland_pr_tpu.system.scatter import LambertianBSDF
    n = 20000
    rays = _unit_rays(n)
    out = LambertianBSDF().scatter({}, rays, jnp.zeros(n), jnp.zeros(n),
                                   jnp.ones(n), jax.random.PRNGKey(0))
    L, M, N = np.asarray(out.L), np.asarray(out.M), np.asarray(out.N)
    np.testing.assert_allclose(L**2 + M**2 + N**2, 1.0, atol=1e-12)
    assert abs(N.mean() - 2.0 / 3.0) < 0.01
    assert abs(L.mean()) < 0.01 and abs(M.mean()) < 0.01
    # r^2 = 1 - N^2 uniform on [0, 1]
    r2 = 1 - N**2
    assert abs(r2.mean() - 0.5) < 0.01
    assert abs(np.mean(r2**2) - 1.0 / 3.0) < 0.01


def test_gaussian_scatter_statistics():
    from optiland_pr_tpu.system.scatter import GaussianBSDF
    n = 20000
    sigma = 0.05
    rays = _unit_rays(n)
    bsdf = GaussianBSDF(sigma)
    out = bsdf.scatter(bsdf.default_params(), rays, jnp.zeros(n),
                       jnp.zeros(n), jnp.ones(n), jax.random.PRNGKey(1))
    L, M, N = np.asarray(out.L), np.asarray(out.M), np.asarray(out.N)
    np.testing.assert_allclose(L**2 + M**2 + N**2, 1.0, atol=1e-12)
    assert abs(L.std() - sigma) < 0.002
    assert abs(M.std() - sigma) < 0.002
    assert np.all(N > 0)


def test_scatter_specular_frame_matches_reference(ref_optiland):
    """The (a, b) tangent frame construction matches reference
    scatter.py:66-113 — checked by scattering with zero offset via a
    delta-sigma Gaussian: the specular direction must be preserved."""
    from optiland_pr_tpu.system.scatter import GaussianBSDF
    from optiland_pr_tpu.core.rays import Rays
    n = 64
    rng = np.random.RandomState(3)
    v = rng.normal(size=(3, n))
    v /= np.linalg.norm(v, axis=0)
    v[2] = np.abs(v[2])
    nrm = np.zeros((3, n))
    nrm[2] = 1.0
    z = jnp.zeros(n)
    rays = Rays(x=z, y=z, z=z, L=jnp.asarray(v[0]), M=jnp.asarray(v[1]),
                N=jnp.asarray(v[2]), intensity=jnp.ones(n), opd=z,
                wavelength=jnp.full(n, 0.55))
    bsdf = GaussianBSDF(0.0)
    out = bsdf.scatter(bsdf.default_params(), rays, jnp.asarray(nrm[0]),
                       jnp.asarray(nrm[1]), jnp.asarray(nrm[2]),
                       jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out.L), v[0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.M), v[1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.N), v[2], atol=1e-12)
