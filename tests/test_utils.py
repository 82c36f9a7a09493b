"""Observability utilities (SURVEY §5.1: profiler hooks + rays/s counters)."""
import os

import jax.numpy as jnp
import numpy as np

from optiland_pr_tpu.utils import (trace_profiler, annotate, time_best,
                                   throughput, memory_stats)


def test_time_best_and_throughput():
    x = jnp.arange(1024.0)

    def step(x):
        return jnp.sum(x * x)

    dt = time_best(step, x, reps=3, rounds=2)
    assert dt > 0
    res = throughput(step, x, n_rays=1024, n_surfaces=7, n_wavelengths=3,
                     reps=3, rounds=2)
    np.testing.assert_allclose(res["rays_per_s"],
                               3 * 1024 / res["s_per_call"], rtol=1e-12)
    np.testing.assert_allclose(res["ray_surfaces_per_s"],
                               7 * res["rays_per_s"], rtol=1e-12)


def test_trace_profiler_writes_trace(tmp_path):
    logdir = str(tmp_path / "prof")
    with trace_profiler(logdir):
        with annotate("tiny-region"):
            jnp.sum(jnp.arange(128.0)).block_until_ready()
    # jax writes plugins/profile/<run>/ under the logdir when capture worked
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler trace produced no files"


def test_memory_stats_dict():
    stats = memory_stats()
    assert isinstance(stats, dict)  # empty on CPU backends
