"""Double Gauss with aspheric surface + Fresnel coatings + polarization:
RMS wavefront across fields (BASELINE config #2).

Run: JAX_PLATFORMS=cpu python examples/double_gauss_polarized.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from optiland_pr_tpu.system import Optic
from optiland_pr_tpu.core.polarization import PolarizationState
from optiland_pr_tpu.analysis import OPD
from optiland_pr_tpu.system.model import field_coords


def build() -> Optic:
    """Double Gauss (reference prescription) with an even-asphere front
    surface, Fresnel coatings on every air-glass interface, and a polarized
    trace."""
    lens = Optic(name="Double Gauss (aspheric, coated, polarized)")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=56.20238, thickness=8.75,
                     material="N-SSK2", coating="fresnel",
                     surface_type="even_asphere",
                     coefficients=[1e-8, -2e-12])
    lens.add_surface(index=2, radius=152.28580, thickness=0.5,
                     coating="fresnel")
    lens.add_surface(index=3, radius=37.68262, thickness=12.5,
                     material="N-SK2", coating="fresnel")
    lens.add_surface(index=4, radius=jnp.inf, thickness=3.8,
                     material=("F5", "schott"))
    lens.add_surface(index=5, radius=24.23130, thickness=16.369445,
                     coating="fresnel")
    lens.add_surface(index=6, radius=jnp.inf, thickness=13.747957,
                     is_stop=True)
    lens.add_surface(index=7, radius=-28.37731, thickness=3.8,
                     material=("F5", "schott"), coating="fresnel")
    lens.add_surface(index=8, radius=jnp.inf, thickness=11,
                     material="N-SK16")
    lens.add_surface(index=9, radius=-37.92546, thickness=0.5,
                     coating="fresnel")
    lens.add_surface(index=10, radius=177.41176, thickness=7,
                     material="N-SK16", coating="fresnel")
    lens.add_surface(index=11, radius=-79.41143, thickness=61.487536,
                     coating="fresnel")
    lens.add_surface(index=12)
    lens.set_aperture(aperture_type="imageFNO", value=5)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_field(y=10)
    lens.add_field(y=14)
    lens.add_wavelength(value=0.5876, is_primary=True)
    lens.set_polarization(PolarizationState(is_polarized=True, Ex=1.0,
                                            Ey=0.0, phase_x=0.0, phase_y=0.0))
    return lens


def main():
    lens = build()
    print(f"f2 = {float(lens.paraxial.f2()):.3f} mm")
    _, params = lens.build()
    for field in field_coords(params):
        opd = OPD(lens, field, 0.5876, num_rings=8)
        print(f"field {field}: RMS wavefront {float(opd.rms()):.4f} waves, "
              f"P-V {float(opd.peak_to_valley()):.4f} waves")
    rays = lens.trace(Hy=1.0, num_rays=16, distribution="hexapolar")
    i = np.asarray(rays.intensity)
    print(f"polarized transmission (uncoated Fresnel stack): "
          f"mean {i.mean():.4f}, min {i.min():.4f}")


if __name__ == "__main__":
    main()
