"""Profiling and throughput observability (SURVEY.md §5.1: the reference has
no built-in tracing/profiling; the TPU build adds jax profiler hooks + simple
rays/s counters so perf work is self-documenting).

- ``trace_profiler``: context manager around ``jax.profiler.trace`` writing a
  TensorBoard/XProf-compatible trace (op-level timeline, HBM traffic).
- ``annotate``: named region annotation that shows up inside profiler traces.
- ``time_best`` / ``throughput``: the noise-robust best-of-rounds timing used
  by bench.py, exposed as a library utility with rays/s / ray-surfaces/s
  accounting.
- ``memory_stats``: per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace_profiler(logdir: str, host_tracer_level: int = 2):
    """Capture a jax profiler trace into ``logdir`` (view with TensorBoard's
    profile plugin or xprof). No-ops gracefully if the profiler backend is
    unavailable (e.g. a second concurrent capture)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(logdir, create_perfetto_link=False)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named region visible in profiler traces:
    ``with annotate("trace_system"): ...``"""
    import jax
    return jax.profiler.TraceAnnotation(name)


def time_best(fn, *args, reps: int = 10, rounds: int = 3) -> float:
    """Best-of-``rounds`` mean rep time of ``fn(*args)`` (compiles/warms up
    first; min-time is the standard noise-robust estimator — the TPU sits
    behind a shared tunnel). Returns seconds per call."""
    import jax
    jax.block_until_ready(fn(*args))
    dt_s = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt_s = min(dt_s, (time.perf_counter() - t0) / reps)
    return dt_s


def time_median(fn, *args, reps: int = 10, rounds: int = 5) -> float:
    """Median-of-``rounds`` mean rep time (VERDICT r2 item 9: the official
    perf record uses the median so one tunnel-noise spike can't swing the
    headline +-15%). Returns seconds per call."""
    import jax
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / reps)
    times.sort()
    n = len(times)
    return times[n // 2] if n % 2 else 0.5 * (times[n // 2 - 1]
                                              + times[n // 2])


def throughput(fn, *args, n_rays: int, n_surfaces: int | None = None,
               n_wavelengths: int = 1, reps: int = 10,
               rounds: int = 3) -> dict:
    """Rays/s (and ray-surfaces/s when ``n_surfaces`` is given) counter for a
    trace-shaped callable. Returns a dict ready for JSON logging."""
    dt_s = time_best(fn, *args, reps=reps, rounds=rounds)
    total_rays = n_rays * n_wavelengths
    out = {
        "s_per_call": dt_s,
        "rays_per_s": total_rays / dt_s,
        "n_rays": n_rays,
        "n_wavelengths": n_wavelengths,
    }
    if n_surfaces is not None:
        out["ray_surfaces_per_s"] = total_rays * n_surfaces / dt_s
        out["n_surfaces"] = n_surfaces
    return out


def memory_stats(device=None) -> dict:
    """HBM usage snapshot for ``device`` (default: first device). Returns an
    empty dict on backends that don't expose memory_stats (CPU)."""
    import jax
    dev = device if device is not None else jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}
