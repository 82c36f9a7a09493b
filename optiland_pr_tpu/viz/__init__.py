from .viewer import OpticViewer, LensInfoViewer, SurfaceSagViewer

__all__ = ["OpticViewer", "LensInfoViewer", "SurfaceSagViewer"]
