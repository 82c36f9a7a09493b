"""Extended sample library: eyepieces, telescopes, simple lenses, IR,
lithography (prescription data mirrors the public designs in the reference
sample library: optiland/samples/{eyepieces,telescopes,simple,infrared,
lithography,objectives}.py, largely from Laikin, *Lens Design*, 4th ed.)."""
from __future__ import annotations

import jax.numpy as jnp

from ..materials import IdealMaterial
from ..system import Optic, RadialAperture

__all__ = ["EyepieceErfle", "HubbleTelescope", "Edmund_49_847",
           "SingletStopSurf2", "TelescopeDoublet", "CementedAchromat",
           "AsphericSinglet", "InfraredTriplet", "InfraredTripletF4",
           "UVProjectionLens", "TelescopeObjective48Inch", "HeliarLens",
           "PetzvalLens", "Telephoto", "ObjectiveUS008879901",
           "NavarroWideAngleEye"]

_FRAUNHOFER = [(0.48613270, False), (0.58756180, True), (0.65627250, False)]


def _finish(lens, ap_type, ap_value, fields, wavelengths=_FRAUNHOFER):
    lens.set_aperture(aperture_type=ap_type, value=ap_value)
    lens.set_field_type(field_type="angle")
    for y in fields:
        lens.add_field(y=y)
    for wl, prim in wavelengths:
        lens.add_wavelength(value=wl, is_primary=prim)
    return lens


def EyepieceErfle() -> Optic:
    lens = Optic(name="Erfle Eyepiece")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=jnp.inf, thickness=15.224, is_stop=True)
    lens.add_surface(index=2, radius=269.0, thickness=25.1, material="L-BSL7")
    lens.add_surface(index=3, radius=-125.9, thickness=36.5)
    lens.add_surface(index=4, radius=93.6, thickness=18.5, material="N-BAK2")
    lens.add_surface(index=5, radius=-93.6, thickness=4.1, material="N-F2")
    lens.add_surface(index=6, radius=2550.0, thickness=0.19)
    lens.add_surface(index=7, radius=93.6, thickness=18.5, material="N-BAK2")
    lens.add_surface(index=8, radius=-93.6, thickness=4.1, material="N-F2")
    lens.add_surface(index=9, radius=2550.0, thickness=32.685)
    lens.add_surface(index=10)
    return _finish(lens, "EPD", 4.0, [0, 14, 20],
                   [(0.4861, False), (0.5876, True), (0.6563, False)])


def HubbleTelescope() -> Optic:
    """Hubble: two-mirror Ritchey-Chretien with central obscuration
    (reference samples/telescopes.py)."""
    lens = Optic(name="Hubble Space Telescope")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, thickness=4910.01016)
    obscuration = (RadialAperture(),
                   RadialAperture().default_params(r_max=jnp.inf,
                                                   r_min=177.80035))
    lens.add_surface(index=2, radius=-11040.02286, thickness=-4910.01016,
                     material="mirror", is_stop=True, conic=-1.001152,
                     aperture=obscuration)
    lens.add_surface(index=3, radius=-1349.31166, thickness=6365.20955,
                     material="mirror", conic=-1.483014)
    lens.add_surface(index=4, radius=-635.38227)
    lens.set_aperture(aperture_type="EPD", value=2400)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_field(y=0.15)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


def Edmund_49_847() -> Optic:
    lens = Optic(name="Edmund 49-847")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, thickness=7, radius=19.93, is_stop=True,
                     material="N-SF11")
    lens.add_surface(index=2, thickness=21.48)
    lens.add_surface(index=3)
    return _finish(lens, "EPD", 25.4, [0, 10, 14])


def SingletStopSurf2() -> Optic:
    lens = Optic(name="Singlet, stop on surface 2")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, thickness=10.0, radius=63.73364157,
                     material="LAC9")
    lens.add_surface(index=2, thickness=92.73834630, radius=653.29392320,
                     is_stop=True)
    lens.add_surface(index=3)
    return _finish(lens, "EPD", 25.0, [0, 3.5, 5])


def TelescopeDoublet() -> Optic:
    lens = Optic(name="Telescope Doublet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=29.32908, thickness=0.7,
                     material="N-BK7", is_stop=True)
    lens.add_surface(index=2, radius=-20.06842, thickness=0.032)
    lens.add_surface(index=3, radius=-20.08770, thickness=0.5780,
                     material=("SF2", "schott"))
    lens.add_surface(index=4, radius=-66.54774, thickness=47.3562)
    lens.add_surface(index=5)
    _finish(lens, "imageFNO", 8.0, [0.0, 0.7, 1.0],
            [(0.4861, False), (0.5876, True), (0.6563, False)])
    lens.image_solve()
    return lens


def CementedAchromat() -> Optic:
    lens = Optic(name="Cemented Achromat")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=12.38401, thickness=0.4340, is_stop=True,
                     material="N-BAK1")
    lens.add_surface(index=2, radius=-7.94140, thickness=0.3210,
                     material=("SF2", "schott"))
    lens.add_surface(index=3, radius=-48.44396, thickness=19.6059)
    lens.add_surface(index=4)
    _finish(lens, "imageFNO", 6, [0, 3.5, 5])
    lens.image_solve()
    return lens


def AsphericSinglet() -> Optic:
    lens = Optic(name="Aspheric Singlet")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, thickness=7, radius=20.0, is_stop=True,
                     material="N-SF11", surface_type="even_asphere",
                     conic=0.0,
                     coefficients=[-2.248851e-4, -4.690412e-6, -6.404376e-8])
    lens.add_surface(index=2, thickness=21.56201105)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=20.0)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.587, is_primary=True)
    return lens


def InfraredTriplet() -> Optic:
    """Ge/ZnSe 10.6 um triplet (reference samples/infrared.py)."""
    germanium = IdealMaterial(n=4.002)
    znse = IdealMaterial(n=2.4028)
    lens = Optic(name="IR Triplet f/2")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=10.4578, thickness=0.5901,
                     material=germanium, is_stop=True)
    lens.add_surface(index=2, radius=14.1079, thickness=4.3909)
    lens.add_surface(index=3, radius=-15.8842, thickness=0.59, material=znse)
    lens.add_surface(index=4, radius=-18.2105, thickness=5.6218)
    lens.add_surface(index=5, radius=2.5319, thickness=0.3918,
                     material=germanium)
    lens.add_surface(index=6, radius=2.4308, thickness=1.3065)
    lens.add_surface(index=7)
    return _finish(lens, "imageFNO", 2, [0, 2.8, 4], [(10.6, True)])


def InfraredTripletF4() -> Optic:
    germanium = IdealMaterial(n=4.002)
    silicon = IdealMaterial(n=3.4222)
    lens = Optic(name="IR Triplet f/4")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=2.0721, thickness=0.1340,
                     material=silicon)
    lens.add_surface(index=2, radius=3.5488, thickness=0.2392)
    lens.add_surface(index=3, thickness=0.6105, is_stop=True)
    lens.add_surface(index=4, radius=13.7583, thickness=0.1,
                     material=germanium)
    lens.add_surface(index=5, radius=1.7491, thickness=0.8768)
    lens.add_surface(index=6, thickness=0.1462, material=silicon)
    lens.add_surface(index=7, radius=-3.5850, thickness=2.8386)
    lens.add_surface(index=8)
    return _finish(lens, "imageFNO", 4, [0, 2.45, 3.5], [(4.2, True)])


def UVProjectionLens() -> Optic:
    """42-surface object-space-telecentric DUV lithography lens
    (reference samples/lithography.py, U.S. Patent 5,831,776)."""
    SiO2 = IdealMaterial(n=1.5084, k=0)
    rows = [
        (-737.7847, 27.484, 1), (-235.2891, 0.916, 0), (211.1786, 36.646, 1),
        (-461.3986, 0.916, 0), (412.6778, 21.071, 1), (160.5391, 16.197, 0),
        (-604.1283, 7.215, 1), (218.1877, 23.941, 0), (-3586.063, 11.978, 1),
        (251.8168, 47.506, 0), (-85.2817, 11.961, 1), (584.8597, 9.968, 0),
        (4074.801, 35.291, 1), (-162.0185, 0.923, 0), (629.544, 41.227, 1),
        (-226.7397, 0.916, 0), (522.2739, 27.842, 1), (-582.424, 0.916, 0),
        (423.729, 22.904, 1), (-1385.36, 0.916, 0), (212.039, 33.646, 1),
        (802.3695, 55.304, 0), (-776.5697, 8.703, 1), (106.1728, 24.09, 0),
        (-200.683, 11.452, 1), (311.8264, 59.54, 0), (-77.2276, 11.772, 1),
        (2317.8032, 11.862, 0), (-290.8859, 22.904, 1), (-148.3577, 1.373, 0),
        (-5658.5043, 41.227, 1), (-151.9858, 0.916, 0), (678.1005, 32.981, 1),
        (-358.554, 0.916, 0), (264.2734, 32.814, 1), (2309.6884, 0.916, 0),
        (171.2681, 29.015, 1), (364.7765, 0.918, 0), (113.37, 76.259, 1),
        (78.6982, 54.304, 0), (49.5443, 18.65, 1), (109.8136, 13.07647896, 0),
    ]
    lens = Optic(name="UV Projection Lens")
    lens.add_surface(index=0, radius=jnp.inf, thickness=110.85883544)
    for i, (radius, thickness, is_glass) in enumerate(rows, start=1):
        lens.add_surface(index=i, radius=radius, thickness=thickness,
                         material=SiO2 if is_glass else None,
                         is_stop=(i == 20))
    lens.add_surface(index=43, radius=jnp.inf)
    lens.set_aperture(aperture_type="objectNA", value=0.133)
    lens.set_field_type(field_type="object_height")
    lens.add_field(y=0)
    lens.add_field(y=32)
    lens.add_field(y=48)
    lens.add_wavelength(value=0.248, is_primary=True)
    lens.obj_space_telecentric = True
    lens.image_solve()
    return lens


def TelescopeObjective48Inch() -> Optic:
    lens = Optic(name="48 Inch Telescope Objective")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=-12.7172, thickness=0.8,
                     material="N-PSK3")
    lens.add_surface(index=2, radius=-18.5430, thickness=0.0148)
    lens.add_surface(index=3, thickness=0.0150, is_stop=True)
    lens.add_surface(index=4, radius=15.758, thickness=1.6701,
                     material=("CAF2", "Daimon-20"))
    lens.add_surface(index=5, radius=-13.0390, thickness=0.0487)
    lens.add_surface(index=6, radius=-12.8310, thickness=0.8,
                     material="S-LAL18")
    lens.add_surface(index=7, radius=-18.5430, thickness=1.1799)
    lens.add_surface(index=8, radius=9.8197, thickness=0.8,
                     material="N-SK16")
    lens.add_surface(index=9, radius=8.0010, thickness=44.3502)
    lens.add_surface(index=10)
    return _finish(lens, "imageFNO", 6, [0, 7, 10])


def HeliarLens() -> Optic:
    lens = Optic(name="Heliar")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=4.2103, thickness=0.9004,
                     material="N-SK16")
    lens.add_surface(index=2, radius=-3.6208, thickness=0.2999,
                     material="E-LLF6")
    lens.add_surface(index=3, radius=29.1869, thickness=0.7587)
    lens.add_surface(index=4, radius=-3.1715, thickness=0.2,
                     material="E-LLF6")
    lens.add_surface(index=5, radius=3.2083, thickness=0.1264)
    lens.add_surface(index=6, radius=jnp.inf, thickness=0.2629, is_stop=True)
    lens.add_surface(index=7, radius=43.0710, thickness=0.25,
                     material="E-LLF6")
    lens.add_surface(index=8, radius=2.4494, thickness=0.8308,
                     material="N-SK16")
    lens.add_surface(index=9, radius=-3.2576, thickness=8.5066)
    lens.add_surface(index=10)
    return _finish(lens, "imageFNO", 5, [0, 7, 10])


def PetzvalLens() -> Optic:
    lens = Optic(name="Petzval")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=1.3265, thickness=0.4,
                     material="N-LAK12")
    lens.add_surface(index=2, radius=-2.6919, thickness=0.06)
    lens.add_surface(index=3, radius=-2.0028, thickness=0.16,
                     material=("SF4", "schott"))
    lens.add_surface(index=4, radius=5.4499, thickness=0.1)
    lens.add_surface(index=5, radius=jnp.inf, thickness=0.8999, is_stop=True)
    lens.add_surface(index=6, radius=1.1724, thickness=0.3,
                     material="N-LAK12")
    lens.add_surface(index=7, radius=-2.4602, thickness=0.2221)
    lens.add_surface(index=8, radius=-0.8615, thickness=0.08,
                     material=("LF5", "schott"))
    lens.add_surface(index=9, radius=3.0039, thickness=0.3921)
    lens.add_surface(index=10)
    _finish(lens, "imageFNO", 1.4, [0, 3.5, 7])
    lens.scale_system(25.4)   # inches -> mm, as in the reference
    return lens


def Telephoto() -> Optic:
    lens = Optic(name="Telephoto")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=0.8589, thickness=0.2391,
                     material="N-BK7")
    lens.add_surface(index=2, radius=-2.6902, thickness=0.09,
                     material="N-BASF2")
    lens.add_surface(index=3, radius=3.0318, thickness=0.0481)
    lens.add_surface(index=4, radius=jnp.inf, thickness=1.0347, is_stop=True)
    lens.add_surface(index=5, radius=-0.5715, thickness=0.09,
                     material="N-ZK7")
    lens.add_surface(index=6, radius=-0.7423, thickness=0.1005,
                     material="N-LAF33")
    lens.add_surface(index=7, radius=-1.1433, thickness=0.0156)
    lens.add_surface(index=8, radius=-17.0388, thickness=0.0793,
                     material=("SF1", "schott"))
    lens.add_surface(index=9, radius=-2.7695, thickness=2.4796)
    lens.add_surface(index=10)
    _finish(lens, "imageFNO", 5.6, [0, 7, 10])
    lens.scale_system(25.4)
    return lens


def ObjectiveUS008879901() -> Optic:
    """25-surface camera objective, U.S. Patent 8,879,901
    (reference samples/objectives.py)."""
    lens = Optic(name="Objective US 8,879,901")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=47.07125235, thickness=5.29811826,
                     material="N-LAF32")
    lens.add_surface(index=2, radius=184.28171667, thickness=0.6)
    lens.add_surface(index=3, radius=29.92177645, thickness=7.13654863,
                     material="H-ZLAF52A")
    lens.add_surface(index=4, radius=50.4992638, thickness=2.0)
    lens.add_surface(index=5, radius=60.5004845, thickness=0.99941671,
                     material="E-SF1")
    lens.add_surface(index=6, radius=17.72638376, thickness=9.9)
    lens.add_surface(index=7, radius=jnp.inf, thickness=8.7, is_stop=True)
    lens.add_surface(index=8, radius=-17.49862241, thickness=1.29934579,
                     material=("SF4", "hikari"))
    lens.add_surface(index=9, radius=1000.00000019, thickness=8.44325264,
                     material="M-TAF1")
    lens.add_surface(index=10, radius=-28.00122422, thickness=0.1)
    lens.add_surface(index=11, radius=-141.99976777, thickness=6.79950254,
                     material="M-TAF1")
    lens.add_surface(index=12, radius=-35.94103045, thickness=0.516)
    lens.add_surface(index=13, radius=92.00034667, thickness=3.29901361,
                     material="Q-LAFPH1S")
    lens.add_surface(index=14, radius=-277.85210888, thickness=2.13)
    lens.add_surface(index=15, radius=-157.24588662, thickness=1.29980422,
                     material="S-FSL5")
    lens.add_surface(index=16, radius=740.47397742, thickness=0.25)
    lens.add_surface(index=17, radius=19.91929498, thickness=5.59345688,
                     material="J-LASF015")
    lens.add_surface(index=18, radius=36.48852623, thickness=0.574)
    lens.add_surface(index=19, radius=45.97532235, thickness=1.00045731,
                     material="E-SF1")
    lens.add_surface(index=20, radius=16.39521847, thickness=2.951)
    lens.add_surface(index=21, radius=33.86131631, thickness=3.22444231,
                     material="H-LAK52")
    lens.add_surface(index=22, radius=jnp.inf, thickness=8.0)
    lens.add_surface(index=23, radius=jnp.inf, thickness=4.0,
                     material="H-LAK52")
    lens.add_surface(index=24, radius=jnp.inf, thickness=3.15317838)
    lens.add_surface(index=25)
    return _finish(lens, "imageFNO", 2.0, [0.0, 7.574, 10.82])


def NavarroWideAngleEye() -> Optic:
    """Navarro wide-angle schematic eye at 543 nm (reference
    samples/miscellaneous.py:10; Escudero-Sanz & Navarro 1999,
    doi:10.1364/JOSAA.16.001881). Exercises the float_by_stop_size
    system aperture and a curved image surface (retina)."""
    cornea = IdealMaterial(1.3777)
    aqueous = IdealMaterial(1.3391)
    lens_mat = IdealMaterial(1.4222)
    vitreous = IdealMaterial(1.3377)
    lens = Optic(name="Navarro Wide-Angle Eye")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=7.72, thickness=0.55, conic=-0.26,
                     material=cornea)
    lens.add_surface(index=2, radius=6.5, thickness=3.05, material=aqueous)
    lens.add_surface(index=3, radius=jnp.inf, thickness=0.0, is_stop=True,
                     material=aqueous)
    lens.add_surface(index=4, radius=10.2, thickness=4.0, conic=-3.1316,
                     material=lens_mat)
    lens.add_surface(index=5, radius=-6.0, thickness=16.3203, conic=-1.0,
                     material=vitreous)
    lens.add_surface(index=6, radius=-12.0, material=vitreous)
    lens.set_aperture(aperture_type="float_by_stop_size", value=3.0)
    lens.set_field_type(field_type="angle")
    for y in (0, 15, 30, 45, 60):
        lens.add_field(y=y)
    lens.add_wavelength(value=0.543, is_primary=True)
    return lens
