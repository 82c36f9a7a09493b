"""optiland_pr_tpu — a TPU-native differentiable sequential ray tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Optiland
(PriUVBio/optiland_Pr): see SURVEY.md for the component map.
"""
from .config import default_float, set_default_float
from .core import Rays, new_rays
from .system import Optic

__version__ = "0.1.0"
__all__ = ["Optic", "Rays", "new_rays", "default_float", "set_default_float"]
