from .pallas_trace import (pallas_trace_conic, pallas_gen_trace_conic,
                           pack_surface_constants, supports_model,
                           supports_split_opd, supports_split_xy,
                           gen_eligible,
                           model_flags)
from .huygens import huygens_sum_xla, huygens_sum_pallas

__all__ = ["pallas_trace_conic", "pallas_gen_trace_conic",
           "pack_surface_constants", "supports_model",
           "supports_split_opd", "gen_eligible", "model_flags",
           "huygens_sum_xla", "huygens_sum_pallas"]
