from .profiling import (trace_profiler, annotate, time_best, time_median, throughput,
                        memory_stats)

__all__ = ["trace_profiler", "annotate", "time_best", "time_median", "throughput",
           "memory_stats"]
