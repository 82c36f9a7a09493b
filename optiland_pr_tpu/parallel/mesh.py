"""Multi-chip scaling: ray-axis sharding over a device mesh.

The reference has no distributed runtime (SURVEY.md §2.9: no NCCL/MPI
anywhere); its only parallelism is single-device array vectorization. Here
scaling is first-class and TPU-idiomatic:

- **rays axis**: sharded across the mesh with ``NamedSharding(P("rays"))`` —
  each chip traces a disjoint bundle through the replicated surface stack;
  XLA/GSPMD inserts ICI collectives for reductions (spot centroid/RMS,
  irradiance histograms, merit gradients) automatically under jit.
- **system axis**: Monte-Carlo / tolerancing batches shard the vmapped system
  dimension the same way (BASELINE config #5).
- **multi-host**: call ``jax.distributed.initialize()`` before ``make_mesh``;
  the same code runs over DCN.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import rays as R
from ..trace import real as real_trace

__all__ = ["make_mesh", "shard_rays", "replicate", "sharded_trace",
           "sharded_spot_rms", "sharded_irradiance", "sharded_value_and_grad"]


def make_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    """1-D mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rays(rays: R.Rays, mesh: Mesh, axis_name: str = "rays") -> R.Rays:
    """Place every ray-axis leaf with a NamedSharding over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))

    def put(leaf):
        if leaf is None:
            return None
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map(put, rays)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), tree)


def sharded_trace(model, params, mesh: Mesh, axis_name: str = "rays"):
    """Build a jitted trace whose ray inputs/outputs stay sharded.

    Returns fn(params, Hx_full, Hy_full, Px_full, Py_full, wavelength) -> Rays
    with every per-ray array sharded over the mesh. GSPMD keeps the whole
    surface pipeline elementwise-sharded (no resharding between surfaces).
    """
    ray_sh = NamedSharding(mesh, P(axis_name))

    def pipeline(params, Hx, Hy, Px, Py, wavelength):
        from ..trace.raygen import generate_rays
        rays = generate_rays(model, params, Hx, Hy, Px, Py, wavelength)
        rays, _ = real_trace.trace_system(model, params, rays)
        return real_trace._final_image_propagation(model, params, rays)

    jitted = jax.jit(pipeline)

    def run(params, Hx, Hy, Px, Py, wavelength):
        put = lambda a: jax.device_put(jnp.asarray(a), ray_sh)
        return jitted(replicate(params, mesh), put(Hx), put(Hy), put(Px),
                      put(Py), wavelength)

    return run


def sharded_spot_rms(model, params, mesh: Mesh, wavelength,
                     axis_name: str = "rays"):
    """RMS spot radius over a sharded ray bundle: the mean reductions become
    ICI psums under GSPMD."""
    def pipeline(params, Hx, Hy, Px, Py):
        from ..trace.raygen import generate_rays
        rays = generate_rays(model, params, Hx, Hy, Px, Py, wavelength)
        rays, _ = real_trace.trace_system(model, params, rays)
        rays = real_trace._final_image_propagation(model, params, rays)
        cx = jnp.mean(rays.x)
        cy = jnp.mean(rays.y)
        return jnp.sqrt(jnp.mean((rays.x - cx) ** 2 + (rays.y - cy) ** 2))

    jitted = jax.jit(pipeline)
    ray_sh = NamedSharding(mesh, P(axis_name))

    def run(params, Hx, Hy, Px, Py):
        put = lambda a: jax.device_put(jnp.asarray(a), ray_sh)
        return jitted(replicate(params, mesh), put(Hx), put(Hy), put(Px),
                      put(Py))

    return run


def sharded_irradiance(model, params, mesh: Mesh, wavelength, nx, ny, extent,
                       axis_name: str = "rays"):
    """Sharded detector histogram: per-shard scatter-adds reduce over ICI."""
    from ..analysis.irradiance import irradiance_histogram

    def pipeline(params, Hx, Hy, Px, Py):
        from ..trace.raygen import generate_rays
        rays = generate_rays(model, params, Hx, Hy, Px, Py, wavelength)
        rays, _ = real_trace.trace_system(model, params, rays)
        rays = real_trace._final_image_propagation(model, params, rays)
        n = rays.x.shape[-1]
        power = rays.intensity / n
        return irradiance_histogram(rays.x, rays.y, power, nx, ny, extent)

    jitted = jax.jit(pipeline)
    ray_sh = NamedSharding(mesh, P(axis_name))

    def run(params, Hx, Hy, Px, Py):
        put = lambda a: jax.device_put(jnp.asarray(a), ray_sh)
        return jitted(replicate(params, mesh), put(Hx), put(Hy), put(Px),
                      put(Py))

    return run


def sharded_value_and_grad(merit_fn, mesh: Mesh):
    """value_and_grad of a merit over sharded inputs; the parameter gradient
    all-reduce rides ICI (inserted by GSPMD in the backward pass)."""
    return jax.jit(jax.value_and_grad(merit_fn))
