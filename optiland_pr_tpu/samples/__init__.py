from .objectives import (CookeTriplet, DoubleGauss, TripletTelescopeObjective,
                         ReverseTelephoto, TessarLens, LensWithFieldCorrector)

__all__ = ["CookeTriplet", "DoubleGauss", "TripletTelescopeObjective",
           "ReverseTelephoto", "TessarLens", "LensWithFieldCorrector"]
