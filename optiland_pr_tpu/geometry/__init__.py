from .base import Geometry, conic_distance, newton_distance
from .standard import Plane, StandardGeometry
from .aspheres import (Biconic, ChebyshevSag, EvenAsphere, OddAsphere,
                       PolynomialXY, Toroidal)

__all__ = ["Geometry", "conic_distance", "newton_distance", "Plane",
           "StandardGeometry", "Biconic", "ChebyshevSag", "EvenAsphere",
           "OddAsphere", "PolynomialXY", "Toroidal"]
