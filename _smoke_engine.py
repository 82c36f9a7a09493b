"""TPU smoke: Optic.trace engine dispatch — pallas vs xla agreement."""
import numpy as np
from optiland_pr_tpu.samples import CookeTriplet, AsphericSinglet

for build in (CookeTriplet, AsphericSinglet):
    lens = build()
    wl = lens.primary_wavelength
    a = lens.trace(Hx=0.0, Hy=1.0, wavelength=wl, num_rays=64,
                   distribution="hexapolar", engine="pallas")
    b = lens.trace(Hx=0.0, Hy=1.0, wavelength=wl, num_rays=64,
                   distribution="hexapolar", engine="xla")
    d = np.nanmax(np.abs(np.asarray(a.x, np.float64) - np.asarray(b.x, np.float64))
                  + np.abs(np.asarray(a.y, np.float64) - np.asarray(b.y, np.float64)))
    print(build.__name__, "pallas-vs-xla max|dxy| =", d)
    assert d < 1e-4, d
print("OK engine dispatch")
