"""On-chip smoke + accuracy sweep (run on the axon TPU; ~10 min with
compiles). CPU CI cannot exercise real-TPU behavior — bf16 MXU defaults,
missing complex dtypes, Pallas Mosaic lowering — so this script validates the
paths that only exist on hardware. Expected output: every line ends OK.

Run:  python tools/tpu_smoke.py          (TPU via the axon tunnel)
Compare numbers against the CPU-f64 references printed in brackets.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from optiland_pr_tpu.samples import CookeTriplet, HubbleTelescope
    from optiland_pr_tpu.utils.hostcomplex import backend_has_complex

    print(f"platform: {jax.devices()[0].platform}  "
          f"complex: {backend_has_complex()}")

    def f32(params):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params)

    def check(name, value, ref, tol):
        ok = np.isfinite(value) and abs(value - ref) <= tol
        print(f"{name}: {value:.6f} [cpu-f64 {ref:.6f}] "
              f"{'OK' if ok else 'FAIL'}")
        return ok

    results = []

    # 1. fused kernel forward (strict: within f32 of the known answer)
    from optiland_pr_tpu.kernels import model_flags, pallas_gen_trace_conic
    model, params = CookeTriplet().build()
    params = f32(params)
    flags = model_flags(model, params)
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=65536))
    th = rng.uniform(0, 2 * np.pi, 65536)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)
    rays = pallas_gen_trace_conic(model, params, Px, Py, 0.55, flags=flags,
                                  final_prop=True)
    rms = float(jnp.sqrt(jnp.nanmean(rays.x**2 + rays.y**2)))
    results.append(check("kernel cooke rms spot (mm)", rms, 0.004172, 2e-4))

    # 2. split-OPD at meter scale: deviations must be tiny on the stigmatic
    # axis (the old kahan mode reads ~1e-3 here)
    from optiland_pr_tpu.kernels import supports_split_opd
    hmodel, hparams = HubbleTelescope().build()
    hparams = f32(hparams)
    assert supports_split_opd(hmodel)
    hrays, base = pallas_gen_trace_conic(hmodel, hparams, Px[:4096],
                                         Py[:4096], 0.55, final_prop=True,
                                         opd_split=True)
    dev_span = float(jnp.nanmax(hrays.opd) - jnp.nanmin(hrays.opd))
    results.append(check("split-OPD hubble dev span (mm)", dev_span,
                         0.0000028, 3e-4))

    # 3. analyses that were complex/precision casualties before round 4
    from optiland_pr_tpu.analysis import (FFTMTF, FFTPSF, HuygensPSF,
                                          MMDFTPSF, SampledMTF)
    t0 = time.time()
    results.append(check("MMDFT strehl", float(
        MMDFTPSF(CookeTriplet(), (0.0, 1.0), num_rays=64).strehl_ratio()),
        0.100250, 2e-3))
    results.append(check("FFTPSF strehl", float(
        FFTPSF(CookeTriplet(), (0.0, 0.0), num_rays=32).strehl_ratio()),
        0.293546, 1.5e-2))
    results.append(check("Huygens strehl", float(
        HuygensPSF(CookeTriplet(), (0.0, 1.0), 0.55, num_rays=32,
                   image_size=32).strehl_ratio()), 0.033779, 2e-3))
    results.append(check("FFTMTF tangential[1]", float(np.asarray(
        FFTMTF(CookeTriplet(), num_rays=32).mtf_tangential)[1]),
        0.934249, 1e-2))
    results.append(check("SampledMTF @10cpm", SampledMTF(
        CookeTriplet(), wavelength=0.55, num_rays=32
    ).calculate_mtf([(10.0, 0.0)])[0], 0.957440, 1e-2))
    print(f"(analyses took {time.time()-t0:.0f}s)")

    # 4. custom_vjp gradient on-chip: finite and matching the recorded value
    def merit(p):
        rr = pallas_gen_trace_conic(model, p, Px, Py, 0.55, flags=flags,
                                    final_prop=True, differentiable=True)
        ok = jnp.isfinite(rr.x) & jnp.isfinite(rr.y)
        w = ok.astype(rr.x.dtype)
        xs = jnp.where(ok, rr.x, 0.0)
        ys = jnp.where(ok, rr.y, 0.0)
        return jnp.sqrt(jnp.sum(jnp.where(ok, xs**2 + ys**2, 0.0))
                        / jnp.maximum(jnp.sum(w), 1.0))

    g = jax.grad(merit)(params)
    g1 = float(g["surfaces"][1]["geom"]["radius"])
    results.append(check("d(rms)/d(R1) on-chip", g1, 0.087700, 5e-3))

    # 5. DOE kernel-vs-XLA on the REAL Mosaic lowering (interpret mode on
    # CPU covers semantics; this covers the hardware compiler). Round-4
    # chip run: positions <= 2.6e-6 mm, OPD <= 1.5e-5 mm across all six
    # grating/phase configurations.
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tests"))
    from test_pallas_doe import DOE_SYSTEMS, _f32 as _doe_f32, _pupil
    from optiland_pr_tpu.trace.engine import engine_override, final_rays
    Pd, Qd = _pupil(4096)
    doe_ok = True
    for name in sorted(DOE_SYSTEMS):
        m2, p2 = DOE_SYSTEMS[name]().build()
        p2 = _doe_f32(p2)
        with engine_override("pallas"):
            rp = final_rays(m2, p2, 0.0, 0.7, 0.55, Pd, Qd)
        with engine_override("xla"):
            rx = final_rays(m2, p2, 0.0, 0.7, 0.55, Pd, Qd)
        err = max(float(np.nanmax(np.abs(np.asarray(getattr(rx, f))
                                         - np.asarray(getattr(rp, f)))))
                  for f in ("x", "y", "opd"))
        ok = err < 1e-4
        doe_ok &= ok
        print(f"DOE on-chip parity {name}: max err {err:.2e} mm "
              f"{'OK' if ok else 'FAIL'}")
    results.append(doe_ok)

    print("ALL OK" if all(results) else "FAILURES PRESENT")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
