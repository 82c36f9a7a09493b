"""Pod-scale Monte-Carlo tolerancing of the double Gauss (BASELINE config #5).

"10k perturbed systems x 1e5 rays batched across pod": every trial is a
perturbed parameter pytree; `vmap` traces the whole batch in one compiled
program, and sharding the trial axis over a `jax.sharding.Mesh` spreads the
batch across chips (virtual CPU devices here; identical code on a real slice).

The reference runs this loop serially in Python
(optiland/tolerancing/monte_carlo.py:60-123).

Run (8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/monte_carlo_pod.py --trials 1024
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optiland_pr_tpu.samples import DoubleGauss
from optiland_pr_tpu.tolerancing import (Tolerancing, DistributionSampler)


def main(num_trials: int = 1024, num_rays: int = 32):
    lens = DoubleGauss()
    tol = Tolerancing(lens)
    # radius/thickness/decenter-class perturbations on a few surfaces
    tol.add_perturbation("radius", DistributionSampler("normal", 56.20238, 0.05),
                         surface_number=1)
    tol.add_perturbation("radius", DistributionSampler("normal", -28.37731, 0.05),
                         surface_number=7)
    tol.add_perturbation("thickness", DistributionSampler("normal", 8.75, 0.02),
                         surface_number=1)
    tol.add_compensator("thickness", surface_number=11)   # refocus
    tol.add_operand("rms_spot_size",
                    input_data={"surface_number": 12, "Hx": 0, "Hy": 0,
                                "num_rays": 6, "wavelength": 0.5876})

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("trials",))
    print(f"devices: {len(devices)}  trials: {num_trials}")

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, len(tol.perturbations))
    samples = jnp.stack([p.sampler.sample(k, num_trials)
                         for p, k in zip(tol.perturbations, keys)], axis=1)
    # shard the trial axis across the mesh
    samples = jax.device_put(samples, NamedSharding(mesh, P("trials")))

    run = jax.jit(jax.vmap(lambda v: tol.evaluate_single(
        v, compensate=True, comp_steps=15)))
    t0 = time.time()
    out = jax.block_until_ready(run(samples))
    t_compile = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(run(samples))
    t_run = time.time() - t0

    r = np.asarray(out)[:, 0]
    print(f"compile {t_compile:.1f}s, steady-state {t_run:.2f}s "
          f"({num_trials / max(t_run, 1e-9):,.0f} compensated trials/s)")
    print(f"rms spot: mean {r.mean():.5f}  std {r.std():.5f}  "
          f"p95 {np.percentile(r, 95):.5f}  max {r.max():.5f}")


if __name__ == "__main__":
    trials = int(sys.argv[sys.argv.index("--trials") + 1]) \
        if "--trials" in sys.argv else 1024
    main(trials)
