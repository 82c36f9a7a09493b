from .viewer import (OpticViewer, OpticViewer3D, LensInfoViewer,
                     SurfaceSagViewer)
from .themes import Theme, THEMES, set_theme, get_theme
from .interaction import InteractionManager

__all__ = ["OpticViewer", "OpticViewer3D", "LensInfoViewer",
           "SurfaceSagViewer", "Theme", "THEMES", "set_theme", "get_theme",
           "InteractionManager"]
