from .objectives import (CookeTriplet, DoubleGauss, TripletTelescopeObjective,
                         ReverseTelephoto, TessarLens, LensWithFieldCorrector)
from .catalog import (EyepieceErfle, HubbleTelescope, Edmund_49_847,
                      SingletStopSurf2, TelescopeDoublet, CementedAchromat,
                      AsphericSinglet, InfraredTriplet, InfraredTripletF4,
                      UVProjectionLens, TelescopeObjective48Inch, HeliarLens,
                      PetzvalLens, Telephoto, ObjectiveUS008879901,
                      NavarroWideAngleEye)
from .microscopes import Objective60x, Microscope20x, UVReflectingMicroscope

__all__ = ["CookeTriplet", "DoubleGauss", "TripletTelescopeObjective",
           "ReverseTelephoto", "TessarLens", "LensWithFieldCorrector",
           "EyepieceErfle", "HubbleTelescope", "Edmund_49_847",
           "SingletStopSurf2", "TelescopeDoublet", "CementedAchromat",
           "AsphericSinglet", "InfraredTriplet", "InfraredTripletF4",
           "UVProjectionLens", "TelescopeObjective48Inch", "HeliarLens",
           "PetzvalLens", "Telephoto", "ObjectiveUS008879901",
           "NavarroWideAngleEye",
           "Objective60x", "Microscope20x", "UVReflectingMicroscope"]
