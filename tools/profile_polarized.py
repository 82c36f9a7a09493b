"""Decompose the polarized fused-kernel cost on the TPU (VERDICT r4 item 1).

Times the BASELINE-config-#2 double-Gauss through pallas_gen_trace_conic in
ablation variants (coatings stripped, Fresnel diag pinned to 1, the Jones
update skipped, two-E-vector launch) to attribute the polarized slowdown to
s/p-basis construction vs Fresnel coefficient math vs per-vector updates.

Run on TPU: python tools/profile_polarized.py
"""
from __future__ import annotations

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_RAYS = 4_000_000


def build_lens(coated: bool, polarized):
    import jax.numpy as jnp
    from optiland_pr_tpu.system import Optic
    from optiland_pr_tpu.core.polarization import PolarizationState

    coat = "fresnel" if coated else None
    lens = Optic(name="profile double gauss")
    lens.add_surface(index=0, radius=jnp.inf, thickness=jnp.inf)
    lens.add_surface(index=1, radius=56.20238, thickness=8.75,
                     material="N-SSK2", coating=coat,
                     surface_type="even_asphere",
                     coefficients=[1e-8, -2e-12])
    lens.add_surface(index=2, radius=152.28580, thickness=0.5, coating=coat)
    lens.add_surface(index=3, radius=37.68262, thickness=12.5,
                     material="N-SK2", coating=coat)
    lens.add_surface(index=4, radius=jnp.inf, thickness=3.8,
                     material=("F5", "schott"))
    lens.add_surface(index=5, radius=24.23130, thickness=16.369445,
                     coating=coat)
    lens.add_surface(index=6, radius=jnp.inf, thickness=13.747957,
                     is_stop=True)
    lens.add_surface(index=7, radius=-28.37731, thickness=3.8,
                     material=("F5", "schott"), coating=coat)
    lens.add_surface(index=8, radius=jnp.inf, thickness=11,
                     material="N-SK16")
    lens.add_surface(index=9, radius=-37.92546, thickness=0.5, coating=coat)
    lens.add_surface(index=10, radius=177.41176, thickness=7,
                     material="N-SK16", coating=coat)
    lens.add_surface(index=11, radius=-79.41143, thickness=61.487536,
                     coating=coat)
    lens.add_surface(index=12)
    lens.set_aperture(aperture_type="imageFNO", value=5)
    lens.set_field_type(field_type="angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.5876, is_primary=True)
    if polarized == "linear":
        lens.set_polarization(PolarizationState(
            is_polarized=True, Ex=1.0, Ey=0.0, phase_x=0.0, phase_y=0.0))
    elif polarized == "unpolarized":
        lens.set_polarization("unpolarized")
    return lens


def time_variant(name, coated, polarized, block_rows=128, patch=None):
    import jax
    import jax.numpy as jnp
    from optiland_pr_tpu.kernels import (pallas_gen_trace_conic,
                                         model_flags)
    from optiland_pr_tpu.kernels import pallas_trace as pt
    from optiland_pr_tpu.utils import time_median

    jax.clear_caches()
    saved = {}
    if patch:
        for attr, fn in patch.items():
            saved[attr] = getattr(pt, attr)
            setattr(pt, attr, fn)
    try:
        lens = build_lens(coated, polarized)
        model, params = lens.build()
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params)
        rng = np.random.default_rng(0)
        r = np.sqrt(rng.uniform(size=N_RAYS))
        th = rng.uniform(0, 2 * np.pi, size=N_RAYS)
        Px = jnp.asarray(r * np.cos(th), jnp.float32)
        Py = jnp.asarray(r * np.sin(th), jnp.float32)
        flags = model_flags(model, params)

        @jax.jit
        def step(params, Px, Py):
            rays = pallas_gen_trace_conic(model, params, Px, Py,
                                          jnp.float32(0.5876), flags=flags,
                                          final_prop=True,
                                          block_rows=block_rows)
            return (jnp.sum(rays.x) + jnp.sum(rays.y) + jnp.sum(rays.opd)
                    + jnp.sum(rays.intensity))

        dt = time_median(step, params, Px, Py, reps=10, rounds=3)
        n_surf = model.num_surfaces - 1
        print(f"{name:34s} rows={block_rows:4d} {N_RAYS/dt:.3e} rays/s  "
              f"({N_RAYS*n_surf/dt:.3e} ray-surf/s)  {dt*1e3:.2f} ms",
              flush=True)
        return N_RAYS / dt
    finally:
        for attr, fn in saved.items():
            setattr(pt, attr, fn)
        jax.clear_caches()


def main():
    def diag_one(n1, n2, cos_i, is_refl):
        return (1.0, 1.0, 1.0)

    def update_skip(evecs, *a, **k):
        return evecs

    base = time_variant("V0 mono (no coat, no polar)", False, None)
    time_variant("V1 polarized bare (Rodrigues)", False, "linear")
    full = time_variant("V2 full (fresnel + linear)", True, "linear")
    time_variant("V3 full, diag pinned to 1", True, "linear",
                 patch={"_fresnel_diag": diag_one})
    time_variant("V4 full, update skipped", True, "linear",
                 patch={"_polar_update": update_skip,
                        "_fresnel_diag": diag_one})
    time_variant("V5 full, unpolarized 2-vec", True, "unpolarized")
    for rows in (64, 256, 512):
        time_variant(f"V2 full rows={rows}", True, "linear", block_rows=rows)
    print(f"slowdown full vs mono: {base/full:.2f}x", flush=True)


if __name__ == "__main__":
    main()
