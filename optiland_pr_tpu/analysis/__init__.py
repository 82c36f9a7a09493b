from .spot import (SpotData, SpotDiagram, spot_diagram,
                   encircled_energy, EncircledEnergy)
from .wavefront import (Wavefront, WavefrontData, OPD, OPDFan, ZernikeOPD,
                        wavefront_data, wavefront_grid, fit_and_remove_tilt)
from .psf import FFTPSF, HuygensPSF, calculate_grid_size
from .mtf import FFTMTF, GeometricMTF
from .misc import (RayFan, BestFitRayFan, Distortion, GridDistortion,
                   FieldCurvature, YYbar, PupilAberration,
                   RmsSpotSizeVsField, RmsWavefrontErrorVsField,
                   ThroughFocusSpotDiagram, AngleVsHeight)
from .irradiance import IncoherentIrradiance, RadiantIntensity, irradiance_histogram
from .psf_mtf_extra import MMDFTPSF, SampledMTF, HuygensMTF, ThroughFocusMTF

__all__ = ["SpotData", "SpotDiagram", "spot_diagram", "encircled_energy",
           "EncircledEnergy",
           "Wavefront", "WavefrontData", "OPD", "OPDFan", "ZernikeOPD", "wavefront_data",
           "wavefront_grid",
           "fit_and_remove_tilt", "FFTPSF", "HuygensPSF", "calculate_grid_size",
           "FFTMTF", "GeometricMTF", "RayFan", "Distortion", "GridDistortion",
           "FieldCurvature", "YYbar", "PupilAberration", "RmsSpotSizeVsField",
           "RmsWavefrontErrorVsField", "ThroughFocusSpotDiagram",
           "IncoherentIrradiance", "RadiantIntensity", "irradiance_histogram",
           "MMDFTPSF", "SampledMTF", "HuygensMTF", "ThroughFocusMTF",
           "BestFitRayFan", "AngleVsHeight"]
