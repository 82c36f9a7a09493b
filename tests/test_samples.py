"""All sample systems: paraxial parity vs the reference's own samples."""
import numpy as np
import pytest

import optiland_pr_tpu.samples as samples

# (our name, reference module, reference name)
PAIRS = [
    ("TessarLens", "objectives", "TessarLens"),
    ("LensWithFieldCorrector", "objectives", "LensWithFieldCorrector"),
    ("ObjectiveUS008879901", "objectives", "ObjectiveUS008879901"),
    ("TelescopeObjective48Inch", "objectives", "TelescopeObjective48Inch"),
    ("HeliarLens", "objectives", "HeliarLens"),
    ("PetzvalLens", "objectives", "PetzvalLens"),
    ("Telephoto", "objectives", "Telephoto"),
    ("EyepieceErfle", "eyepieces", "EyepieceErfle"),
    ("HubbleTelescope", "telescopes", "HubbleTelescope"),
    ("Edmund_49_847", "simple", "Edmund_49_847"),
    ("SingletStopSurf2", "simple", "SingletStopSurf2"),
    ("TelescopeDoublet", "simple", "TelescopeDoublet"),
    ("CementedAchromat", "simple", "CementedAchromat"),
    ("AsphericSinglet", "simple", "AsphericSinglet"),
    ("InfraredTriplet", "infrared", "InfraredTriplet"),
    ("InfraredTripletF4", "infrared", "InfraredTripletF4"),
    ("UVProjectionLens", "lithography", "UVProjectionLens"),
    ("NavarroWideAngleEye", "miscellaneous", "NavarroWideAngleEye"),
    ("Objective60x", "microscopes", "Objective60x"),
    ("Microscope20x", "microscopes", "Microscope20x"),
    ("UVReflectingMicroscope", "microscopes", "UVReflectingMicroscope"),
]


@pytest.mark.parametrize("our_name,ref_mod,ref_name", PAIRS)
def test_sample_paraxial_parity(ref_optiland, our_name, ref_mod, ref_name):
    import importlib
    ref_module = importlib.import_module(f"optiland.samples.{ref_mod}")
    ours = getattr(samples, our_name)()
    ref = getattr(ref_module, ref_name)()
    np.testing.assert_allclose(float(ours.paraxial.f2()),
                               float(ref.paraxial.f2()), rtol=1e-8,
                               err_msg=f"{our_name} f2")
    np.testing.assert_allclose(float(ours.paraxial.EPD()),
                               float(ref.paraxial.EPD()), rtol=1e-8,
                               err_msg=f"{our_name} EPD")


@pytest.mark.parametrize("hy", [0.5, 1.0])
@pytest.mark.parametrize("our_name,ref_mod,ref_name", PAIRS)
def test_sample_trace_parity(ref_optiland, our_name, ref_mod, ref_name, hy):
    """Real-ray parity for EVERY sample system (VERDICT r2 item 8: 25/25
    with test_parity_trace.py's four objectives), mid- and full-field,
    primary wavelength."""
    import importlib
    ref_module = importlib.import_module(f"optiland.samples.{ref_mod}")
    ours = getattr(samples, our_name)()
    ref = getattr(ref_module, ref_name)()
    wl = ref.primary_wavelength
    got = ours.trace(Hx=0.0, Hy=hy, wavelength=wl, num_rays=6,
                     distribution="line_y")
    want = ref.trace(Hx=0.0, Hy=hy, wavelength=wl, num_rays=6,
                     distribution="line_y")
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y),
                               rtol=1e-8, atol=1e-9, err_msg=our_name)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x),
                               rtol=1e-8, atol=1e-9, err_msg=our_name)
    np.testing.assert_allclose(np.asarray(got.opd), np.asarray(want.opd),
                               rtol=1e-8, atol=1e-9, err_msg=our_name)
    np.testing.assert_allclose(np.asarray(got.intensity), np.asarray(want.i),
                               rtol=1e-8, err_msg=our_name)
