from .base import Geometry, conic_distance, newton_distance
from .standard import Plane, StandardGeometry
from .aspheres import (Biconic, ChebyshevSag, EvenAsphere, OddAsphere,
                       PolynomialXY, Toroidal)
from .extras import (FresnelDesignedSag, FresnelZoneSag, GridSag,
                     PlaneGrating, StandardGrating, ZernikeSag)
from .forbes import ForbesQbfs, ForbesQ2d
from .nurbs import NurbsGeometry

__all__ = ["Geometry", "conic_distance", "newton_distance", "Plane",
           "StandardGeometry", "Biconic", "ChebyshevSag", "EvenAsphere",
           "OddAsphere", "PolynomialXY", "Toroidal", "FresnelZoneSag",
           "GridSag", "PlaneGrating", "StandardGrating", "ZernikeSag", "ForbesQbfs", "FresnelDesignedSag", "NurbsGeometry", "ForbesQ2d"]
