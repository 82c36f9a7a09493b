"""Worker for the 2-process ``jax.distributed`` smoke test (SURVEY §5.8).

Launched twice by ``test_two_process_distributed_merit_grad`` with
``JAX_PLATFORMS=cpu`` and 2 virtual CPU devices per process; the pair forms a
4-device global mesh whose collectives cross the process boundary (the same
Gloo/DCN code path a real multi-host pod uses — jax.distributed.initialize +
make_mesh over ``jax.devices()``, exactly the recipe
``parallel.mesh.init_distributed`` documents).

argv: process_id coordinator_port output_json_path
"""
import json
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from optiland_pr_tpu.samples import CookeTriplet
    from optiland_pr_tpu.parallel import make_mesh, shard_map_merit_grad

    model, params = CookeTriplet().build()
    mesh = make_mesh()  # spans BOTH processes (4 global devices)
    n_dev = len(jax.devices())

    n = 1024
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = r * np.cos(th)
    Py = r * np.sin(th)
    zeros = np.zeros(n)

    # global arrays assembled from per-process shards (each process only
    # materializes its addressable blocks — the multi-host input recipe)
    sh = NamedSharding(mesh, P("rays"))

    def mk(a):
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    run = shard_map_merit_grad(model, mesh, 0.55)
    v, g = run(params, mk(zeros), mk(zeros), mk(Px), mk(Py))

    gradsum = 0.0
    for leaf in jax.tree_util.tree_leaves(g):
        gradsum += float(jnp.sum(jnp.abs(leaf)))
    g_radius = float(np.asarray(g["surfaces"][1]["geom"]["radius"]))

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": float(v), "gradsum": gradsum,
                       "g_radius": g_radius, "n_global_devices": n_dev}, f)


if __name__ == "__main__":
    main()
