"""Microscope objective samples (prescription data mirrors the public designs
in the reference sample library, optiland/samples/microscopes.py — Objective60x,
Microscope20x and UVReflectingMicroscope from Laikin, *Lens Design*, 4th ed.,
pp. 135/139)."""
from __future__ import annotations

import jax.numpy as jnp

from ..system import Optic, RadialAperture

__all__ = ["Objective60x", "Microscope20x", "UVReflectingMicroscope"]


def Objective60x() -> Optic:
    """60x microscope objective (reference samples/microscopes.py:8-61)."""
    lens = Optic(name="60x Objective")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, thickness=64.9, radius=553.260, material="N-FK51")
    lens.add_surface(index=2, thickness=4.4, radius=-247.644)
    lens.add_surface(index=3, thickness=59.4, radius=115.162, material="J-LLF2")
    lens.add_surface(index=4, thickness=17.6, radius=57.131)
    lens.add_surface(index=5, thickness=17.6, is_stop=True)
    lens.add_surface(index=6, thickness=74.8, radius=-57.646,
                     material=("SF5", "schott"))
    lens.add_surface(index=7, thickness=77.0, radius=196.614, material="N-FK51")
    lens.add_surface(index=8, thickness=4.4, radius=-129.243)
    lens.add_surface(index=9, thickness=15.4, radius=2062.370,
                     material="N-KZFS4")
    lens.add_surface(index=10, thickness=48.4, radius=203.781,
                     material="LITHOTEC-CAF2")
    lens.add_surface(index=11, thickness=4.4, radius=-224.003)
    lens.add_surface(index=12, thickness=35.2, radius=219.864,
                     material="LITHOTEC-CAF2")
    lens.add_surface(index=13, thickness=4.4, radius=793.3)
    lens.add_surface(index=14, thickness=26.4, radius=349.260,
                     material="N-FK51")
    lens.add_surface(index=15, thickness=4.4, radius=-401.950)
    lens.add_surface(index=16, thickness=39.6, radius=91.992, material="N-SK11")
    lens.add_surface(index=17, thickness=96.189, radius=176.0)
    lens.add_surface(index=18)
    lens.set_aperture(aperture_type="imageFNO", value=0.9)
    lens.set_field_type(field_type="angle")
    for y in (0, 0.7, 1):
        lens.add_field(y=y)
    lens.add_wavelength(value=0.4861)
    lens.add_wavelength(value=0.5876, is_primary=True)
    lens.add_wavelength(value=0.6563)
    return lens


def Microscope20x() -> Optic:
    """20x microscope objective, Laikin p. 135 (reference
    samples/microscopes.py:64-123); built in inches, focused, then scaled
    to mm exactly as the reference does."""
    lens = Optic(name="20x Microscope")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=-0.2352, thickness=0.0941,
                     material="N-SK16")
    lens.add_surface(index=2, radius=-0.1968, thickness=0.0413,
                     material=("SF4", "schott"))
    lens.add_surface(index=3, radius=-0.3251, thickness=0.01)
    lens.add_surface(index=4, radius=0.5837, thickness=0.1115,
                     material="N-SK16")
    lens.add_surface(index=5, radius=-0.9401, thickness=0.01)
    lens.add_surface(index=6, radius=jnp.inf, thickness=0.2236, is_stop=True)
    lens.add_surface(index=7, radius=0.2077, thickness=0.2, material="N-SK16")
    lens.add_surface(index=8, radius=-0.1686, thickness=0.025,
                     material=("SF4", "schott"))
    lens.add_surface(index=9, radius=0.4108, thickness=0.0965)
    lens.add_surface(index=10, radius=jnp.inf, thickness=0.007, material="N-K5")
    lens.add_surface(index=11)
    lens.set_aperture(aperture_type="EPD", value=0.317961)
    lens.set_field_type(field_type="angle")
    for y in (0, 0.7, 1):
        lens.add_field(y=y)
    lens.add_wavelength(value=0.48613270)
    lens.add_wavelength(value=0.58756180, is_primary=True)
    lens.add_wavelength(value=0.65627250)
    lens.image_solve()
    lens.scale_system(25.4)
    return lens


def UVReflectingMicroscope() -> Optic:
    """53x UV reflecting objective, Laikin p. 139 (reference
    samples/microscopes.py:126-182): two-mirror core with a central
    obscuration on the secondary, ideal-index silica/CaF2 refractors,
    single UV wavelength, built in inches then scaled to mm."""
    lens = Optic(name="UV Reflecting Microscope")
    silica = 1.4980
    caf2 = 1.4610
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=1.72300, thickness=0.0350,
                     material=silica)
    lens.add_surface(index=2, radius=2.90631, thickness=0.9731)
    lens.add_surface(index=3, radius=0.17783, thickness=-0.4995,
                     material="mirror", is_stop=True)
    obscuration = (RadialAperture(),
                   RadialAperture().default_params(r_max=jnp.inf,
                                                   r_min=0.15))
    lens.add_surface(index=4, radius=0.72913, thickness=0.5776,
                     material="mirror", aperture=obscuration)
    lens.add_surface(index=5, radius=2.66996, thickness=0.0427, material=caf2)
    lens.add_surface(index=6, radius=0.48467, thickness=0.005)
    lens.add_surface(index=7, radius=0.23767, thickness=0.1861, material=caf2)
    lens.add_surface(index=8, radius=8.64894, thickness=0.005)
    lens.add_surface(index=9, radius=7.25758, thickness=0.0588,
                     material=silica)
    lens.add_surface(index=10, radius=0.44435, thickness=0.0771)
    lens.add_surface(index=11, thickness=0.0071, material=silica)
    lens.add_surface(index=12)
    lens.set_aperture(aperture_type="imageFNO", value=0.7)
    lens.set_field_type(field_type="angle")
    for y in (0, 2.8, 4):
        lens.add_field(y=y)
    lens.add_wavelength(value=0.27, is_primary=True)
    lens.scale_system(25.4)
    return lens
