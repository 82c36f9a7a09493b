from .profiling import (trace_profiler, annotate, time_best, throughput,
                        memory_stats)

__all__ = ["trace_profiler", "annotate", "time_best", "throughput",
           "memory_stats"]
