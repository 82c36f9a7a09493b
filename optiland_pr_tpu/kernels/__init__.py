from .pallas_trace import (pallas_trace_conic, pack_surface_constants,
                           supports_model, model_flags)

__all__ = ["pallas_trace_conic", "pack_surface_constants", "supports_model",
           "model_flags"]
