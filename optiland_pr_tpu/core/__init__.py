from .rays import Rays, new_rays, propagate, refract, reflect, normalize, clip
from . import transforms, distributions, safe_math

__all__ = ["Rays", "new_rays", "propagate", "refract", "reflect", "normalize",
           "clip", "transforms", "distributions", "safe_math"]
