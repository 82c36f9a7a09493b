"""1.5 m Fresnel solar concentrator (BASELINE config #4).

Reproduces the fork's concentrator workflow (reference
prithus_examples/fresnel_lens_1.5m/fresnel_concentrator_1.5m.py:40-120):
a 1.5 m aperture, f/0.5 concentrator analyzed over the +-0.5 deg solar disk
with a detector irradiance map — in two variants:

1. "equivalent" — the reference's approximation: a plano-convex surface with
   R = 2 f (n-1) standing in for the Fresnel lens.
2. "zoned" — NEW capability: the true collapsed Fresnel-zone sag
   (FresnelZoneSag), traced through the Newton intersection kernel.

Run:  python examples/fresnel_concentrator.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from optiland_pr_tpu.system import Optic
from optiland_pr_tpu.analysis import IncoherentIrradiance, SpotDiagram

DIAMETER = 1500.0      # mm
FOCAL_LENGTH = 1265.0  # mm (F/0.84; the fork's integrated design uses
                       # f = 1265 mm, INTEGRATION_REPORT.txt:14-21)
N_BK7 = 1.517
SOLAR_FIELDS = [0.0, 0.25, 0.5]    # deg (solar half-disk ~0.25 deg)


def build_concentrator(mode: str = "equivalent") -> Optic:
    """Three variants:

    - "equivalent": the reference's approximation verbatim — front surface
      R = 2 f (n-1) (reference fresnel_concentrator_1.5m.py:77-80; note this
      actually yields f2 = 2f and enormous spherical aberration at f/0.5,
      faithfully reproduced here).
    - "aplanatic": flat front + hyperbolic back (k = -n^2, R = -(n-1) f), the
      aberration-free single-lens concentrator.
    - "zoned": NEW — a flat Fresnel lens whose facet angles are designed for
      the flat geometry (FresnelDesignedSag), as a real molded concentrator
      is built.
    """
    lens = Optic(name=f"Fresnel concentrator 1.5m [{mode}]")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    if mode == "equivalent":
        fresnel_radius = 2 * FOCAL_LENGTH * (N_BK7 - 1)   # reference :77-80
        lens.add_surface(index=1, radius=fresnel_radius, thickness=5.0,
                         material="N-BK7", is_stop=True)
        lens.add_surface(index=2, radius=jnp.inf, thickness=FOCAL_LENGTH)
    elif mode in ("aplanatic", "zoned"):
        back_R = -(N_BK7 - 1) * FOCAL_LENGTH
        lens.add_surface(index=1, radius=jnp.inf, thickness=5.0,
                         material="N-BK7", is_stop=True)
        if mode == "aplanatic":
            lens.add_surface(index=2, radius=back_R, conic=-N_BK7**2,
                             thickness=FOCAL_LENGTH)
        else:
            # flat Fresnel with facet angles designed for the flat geometry
            lens.add_surface(index=2, surface_type="fresnel_designed",
                             focal_length=FOCAL_LENGTH, n_design=N_BK7,
                             zone_depth=2.0, thickness=FOCAL_LENGTH)
    else:
        raise ValueError(mode)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=DIAMETER)
    lens.set_field_type(field_type="angle")
    for f in SOLAR_FIELDS:
        lens.add_field(y=f)
    lens.add_wavelength(value=0.400)
    lens.add_wavelength(value=0.550, is_primary=True)
    lens.add_wavelength(value=0.700)
    return lens


def main():
    for mode in ["equivalent", "aplanatic", "zoned"]:
        lens = build_concentrator(mode)
        print(f"\n=== {mode} ===")
        print(f"f2 = {float(lens.paraxial.f2()):.2f} mm "
              f"(target {FOCAL_LENGTH:.0f})")
        sd = SpotDiagram(lens, num_rings=8)
        rms = np.asarray(sd.rms_spot_radius())
        for f, r in zip(SOLAR_FIELDS, rms[:, 1]):
            print(f"  field {f:0.2f} deg: rms spot {r:8.3f} mm")

        irr = IncoherentIrradiance(lens, fields=[(0.0, 0.0)], num_rays=256,
                                   distribution="uniform", res=(64, 64),
                                   total_power=1000.0)   # ~1 kW on 1.5 m
        peak = float(irr.peak()[0])
        aperture_irr = 1000.0 / (np.pi * (DIAMETER / 2) ** 2)  # W/mm^2
        print(f"  peak irradiance {peak:9.3f} W/mm^2  "
              f"(x{peak / aperture_irr:,.0f} optical concentration)")


if __name__ == "__main__":
    main()
