from .viewer import (OpticViewer, OpticViewer3D, LensInfoViewer,
                     SurfaceSagViewer)

__all__ = ["OpticViewer", "OpticViewer3D", "LensInfoViewer",
           "SurfaceSagViewer"]
