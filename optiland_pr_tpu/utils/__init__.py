from .profiling import (trace_profiler, annotate, time_best, time_median, throughput,
                        memory_stats)
from .hostvals import host_isinf

__all__ = ["trace_profiler", "annotate", "time_best", "time_median", "throughput",
           "memory_stats", "host_isinf"]
