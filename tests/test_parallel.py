"""Sharding: ray-axis data parallelism on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optiland_pr_tpu.samples import CookeTriplet
from optiland_pr_tpu.parallel import (make_mesh, sharded_trace,
                                      sharded_spot_rms, sharded_irradiance,
                                      replicate)
from optiland_pr_tpu.trace import real as real_trace


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh()


def _pupil(n):
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    return (jnp.asarray(r * np.cos(th)), jnp.asarray(r * np.sin(th)))


def test_sharded_trace_matches_single_device(mesh):
    model, params = CookeTriplet().build()
    n = 8 * 64
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)

    run = sharded_trace(model, params, mesh)
    rays_sharded = run(params, zeros, zeros, Px, Py, 0.55)

    rays_ref = real_trace.trace_generic(model, params, zeros, zeros, Px, Py,
                                        0.55)
    np.testing.assert_allclose(np.asarray(rays_sharded.x),
                               np.asarray(rays_ref.x), rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(rays_sharded.opd),
                               np.asarray(rays_ref.opd), rtol=1e-12)
    # outputs stay sharded over the mesh
    assert len(rays_sharded.x.sharding.device_set) == 8


def test_sharded_rms_reduction(mesh):
    model, params = CookeTriplet().build()
    n = 8 * 128
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)
    run = sharded_spot_rms(model, params, mesh, 0.55)
    rms = float(run(params, zeros, zeros, Px, Py))
    rays = real_trace.trace_generic(model, params, zeros, zeros, Px, Py, 0.55)
    cx = float(jnp.mean(rays.x))
    cy = float(jnp.mean(rays.y))
    expected = float(jnp.sqrt(jnp.mean((rays.x - cx) ** 2
                                       + (rays.y - cy) ** 2)))
    np.testing.assert_allclose(rms, expected, rtol=1e-12)


def test_sharded_irradiance_histogram(mesh):
    model, params = CookeTriplet().build()
    n = 8 * 128
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)
    run = sharded_irradiance(model, params, mesh, 0.55, 16, 16,
                             (-0.1, 0.1, -0.1, 0.1))
    img = run(params, zeros, zeros, Px, Py)
    assert img.shape == (16, 16)
    assert float(jnp.sum(img)) > 0


def test_sharded_gradient(mesh):
    """Parameter gradients under sharded rays match the unsharded gradient."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from optiland_pr_tpu.trace.raygen import generate_rays

    model, params = CookeTriplet().build()
    n = 8 * 64
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)

    def merit(params, Px, Py):
        rays = generate_rays(model, params, zeros, zeros, Px, Py, 0.55)
        rays, _ = real_trace.trace_system(model, params, rays,
                                          wl_scalar=0.55)
        return jnp.mean(rays.x**2 + rays.y**2)

    grad_fn = jax.jit(jax.grad(
        lambda r, px, py: merit(_set_radius(params, r), px, py)))

    def _set_radius(params, r):
        surfaces = list(params["surfaces"])
        sp = dict(surfaces[1])
        geom = dict(sp["geom"])
        geom["radius"] = r
        sp["geom"] = geom
        surfaces[1] = sp
        return {**params, "surfaces": surfaces}

    r0 = params["surfaces"][1]["geom"]["radius"]
    g_plain = float(grad_fn(r0, Px, Py))

    sh = NamedSharding(mesh, P("rays"))
    Pxs = jax.device_put(Px, sh)
    Pys = jax.device_put(Py, sh)
    g_sharded = float(grad_fn(r0, Pxs, Pys))
    np.testing.assert_allclose(g_sharded, g_plain, rtol=1e-10)


def test_shard_map_rms_matches_gspmd(mesh):
    """Explicit-collective (shard_map + psum) path equals the GSPMD path."""
    from optiland_pr_tpu.parallel import shard_map_spot_rms

    model, params = CookeTriplet().build()
    n = 8 * 128
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)
    run_sm = shard_map_spot_rms(model, mesh, 0.55)
    rms_sm = float(run_sm(params, zeros, zeros, Px, Py))
    run_gspmd = sharded_spot_rms(model, params, mesh, 0.55)
    rms_gspmd = float(run_gspmd(params, zeros, zeros, Px, Py))
    np.testing.assert_allclose(rms_sm, rms_gspmd, rtol=1e-12)


def test_shard_map_merit_grad(mesh):
    """Explicit-collective gradient equals the unsharded value_and_grad."""
    from optiland_pr_tpu.parallel import shard_map_merit_grad
    from optiland_pr_tpu.trace.raygen import generate_rays

    model, params = CookeTriplet().build()
    n = 8 * 64
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)
    run = shard_map_merit_grad(model, mesh, 0.55)
    v, g = run(params, zeros, zeros, Px, Py)

    def merit(params):
        rays = generate_rays(model, params, zeros, zeros, Px, Py, 0.55)
        rays, _ = real_trace.trace_system(model, params, rays)
        rays = real_trace._final_image_propagation(model, params, rays)
        cx = jnp.mean(rays.x)
        cy = jnp.mean(rays.y)
        return jnp.mean((rays.x - cx) ** 2 + (rays.y - cy) ** 2)

    v_ref, g_ref = jax.value_and_grad(merit)(params)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-11)
    g_leaf = g["surfaces"][1]["geom"]["radius"]
    g_ref_leaf = g_ref["surfaces"][1]["geom"]["radius"]
    np.testing.assert_allclose(np.asarray(g_leaf), np.asarray(g_ref_leaf),
                               rtol=1e-9)


def test_sharded_value_and_grad_applies_shardings(mesh):
    from optiland_pr_tpu.parallel import sharded_value_and_grad
    from optiland_pr_tpu.trace.raygen import generate_rays

    model, params = CookeTriplet().build()
    n = 8 * 64
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)

    def merit(params, Px, Py):
        rays = generate_rays(model, params, zeros, zeros, Px, Py, 0.55)
        rays, _ = real_trace.trace_system(model, params, rays)
        return jnp.mean(rays.x**2 + rays.y**2)

    run = sharded_value_and_grad(merit, mesh, ray_argnums=(1, 2))
    v, g = run(params, Px, Py)
    v_ref, g_ref = jax.value_and_grad(merit)(params, Px, Py)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g["surfaces"][1]["geom"]["radius"]),
        np.asarray(g_ref["surfaces"][1]["geom"]["radius"]), rtol=1e-10)
    # value comes back replicated over the mesh
    assert len(v.sharding.device_set) == 8


def test_microbatched_trace_matches_plain():
    from optiland_pr_tpu.parallel import microbatched_trace, microbatch

    model, params = CookeTriplet().build()
    n = 512
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)
    run = microbatched_trace(model, params, num_microbatches=8)
    rays_mb = run(params, zeros, zeros, Px, Py, 0.55)
    rays_ref = real_trace.trace_generic(model, params, zeros, zeros, Px, Py,
                                        0.55)
    # lax.map changes op fusion/reduction order -> ~1e-14 absolute noise
    np.testing.assert_allclose(np.asarray(rays_mb.x), np.asarray(rays_ref.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rays_mb.opd),
                               np.asarray(rays_ref.opd), rtol=1e-12,
                               atol=1e-12)

    # sum-reduce mode: histogram-style accumulation
    def weight_sum(Px, Py):
        return jnp.sum(Px**2 + Py**2)

    total_mb = float(microbatch(weight_sum, 8, reduce="sum")(Px, Py))
    np.testing.assert_allclose(total_mb, float(weight_sum(Px, Py)),
                               rtol=1e-12)

    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(microbatch(weight_sum, 7))(Px, Py)


def test_init_distributed_single_process_is_graceful():
    from optiland_pr_tpu.parallel import init_distributed
    ok, err = init_distributed()
    # single-process CPU env: must not raise, must report failure reason
    assert ok in (True, False)
    if not ok:
        assert isinstance(err, str) and err


def test_two_process_distributed_merit_grad(tmp_path):
    """VERDICT r4 item 6 / SURVEY §5.8: the multi-HOST (DCN) path. Two
    subprocesses form a jax.distributed cluster (2 virtual CPU devices each,
    4 global); ``shard_map_merit_grad`` runs over the cross-process mesh with
    its psum collectives riding the inter-process (Gloo) transport, and the
    loss/gradient must equal the single-process computation bit-for-bit at
    rtol 1e-9."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    from optiland_pr_tpu.trace.raygen import generate_rays

    repo = Path(__file__).resolve().parent.parent
    worker = Path(__file__).resolve().parent / "_dist_worker.py"
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    out_json = tmp_path / "dist_result.json"

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=str(repo))
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(out_json)],
        env=env, cwd=str(repo), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"distributed worker failed:\n{out}"
    result = json.loads(out_json.read_text())
    assert result["n_global_devices"] == 4

    # single-process reference: identical bundle, identical merit
    model, params = CookeTriplet().build()
    n = 1024
    Px, Py = _pupil(n)
    zeros = jnp.zeros_like(Px)

    def merit(params):
        rays = generate_rays(model, params, zeros, zeros, Px, Py, 0.55)
        rays, _ = real_trace.trace_system(model, params, rays)
        rays = real_trace._final_image_propagation(model, params, rays)
        cx = jnp.mean(rays.x)
        cy = jnp.mean(rays.y)
        return jnp.mean((rays.x - cx) ** 2 + (rays.y - cy) ** 2)

    v_ref, g_ref = jax.value_and_grad(merit)(params)
    gradsum_ref = sum(float(jnp.sum(jnp.abs(l)))
                      for l in jax.tree_util.tree_leaves(g_ref))
    np.testing.assert_allclose(result["loss"], float(v_ref), rtol=1e-9)
    np.testing.assert_allclose(result["gradsum"], gradsum_ref, rtol=1e-8)
    np.testing.assert_allclose(
        result["g_radius"],
        float(np.asarray(g_ref["surfaces"][1]["geom"]["radius"])), rtol=1e-8)


def test_shard_map_pallas_merit_grad(mesh):
    """VERDICT r2 item 10: each shard launches the fused differentiable
    Pallas kernel (interpret mode on the CPU mesh); value and parameter
    gradients must match the XLA shard_map path at f32."""
    from optiland_pr_tpu.parallel import (shard_map_merit_grad,
                                          shard_map_merit_grad_pallas)
    model, params = CookeTriplet().build()
    params32 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)
    n = 8 * 512
    Px, Py = _pupil(n)
    Px32 = jnp.asarray(Px, jnp.float32)
    Py32 = jnp.asarray(Py, jnp.float32)

    run_p = shard_map_merit_grad_pallas(model, mesh, 0.55, Hx=0.0, Hy=0.7,
                                        interpret=True, block_rows=4)
    v_p, g_p = run_p(params32, Px32, Py32)

    run_x = shard_map_merit_grad(model, mesh, 0.55)
    v_x, g_x = run_x(params32, jnp.zeros_like(Px32),
                     jnp.zeros_like(Px32) + 0.7, Px32, Py32)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-4)
    for (kp, lp), (_, lx) in zip(jax.tree_util.tree_leaves_with_path(g_p),
                                 jax.tree_util.tree_leaves_with_path(g_x)):
        lx = np.asarray(lx)
        scale = max(np.max(np.abs(lx)), 1e-3)
        np.testing.assert_allclose(
            np.asarray(lp), lx, rtol=5e-3, atol=5e-3 * scale,
            err_msg=f"shard_map pallas grad mismatch at "
                    f"{jax.tree_util.keystr(kp)}")
