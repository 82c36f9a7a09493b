"""Performance regression gate over BENCH_SUITE.json.

Reads the suite record, normalizes every entry by the session's VPU compute
probe (value_normalized is already probe-scaled by bench.py; this gate
recomputes it defensively), and fails if any pinned entry drops below its
floor. Floors are the round-5 normalized record minus 30% slack — generous
enough for chip-to-chip pool variance, tight enough that a real regression
(a kernel falling off the fast path, a new readback in the prep, a block
shape change gone wrong) trips it.

Usage:  python tools/perf_gate.py [path/to/BENCH_SUITE.json]
Exit 0 = pass, 1 = regression, 2 = missing entries.
"""
from __future__ import annotations

import json
import pathlib
import sys

PROBE_REF_VPU_GOPS = 2250.0

# metric -> floor on the probe-normalized value (round-5 record * 0.7)
FLOORS = {
    "ray_surfaces_per_s_per_chip_cooke_triplet": 1.6e10,
    "ray_surfaces_per_s_per_chip_cooke_triplet_3wl": 1.6e10,
    "ray_surfaces_per_s_per_chip_aspheric_singlet": 6.0e9,
    "ray_surfaces_per_s_per_chip_double_gauss": 2.0e10,
    "ray_surfaces_per_s_per_chip_double_gauss_3wl": 2.0e10,
    "ray_surfaces_per_s_per_chip_hubble_obscured": 1.5e10,
    "ray_surfaces_per_s_per_chip_tilted_singlet": 1.1e10,
    "ray_surfaces_per_s_per_chip_chebyshev_freeform": 3.6e9,
    "ray_surfaces_per_s_per_chip_zernike_freeform": 3.5e9,
    "ray_surfaces_per_s_per_chip_fresnel_concentrator": 1.6e10,
    "ray_surfaces_per_s_per_chip_doe_grating": 1.6e10,
    "ray_surfaces_per_s_per_chip_doe_grating_3wl": 1.3e10,
    "ray_surfaces_per_s_per_chip_metasurface_phase": 1.6e10,
    "ray_surfaces_per_s_per_chip_finite_conjugate": 1.3e10,
    "ray_surfaces_per_s_per_chip_double_gauss_polarized": 9.0e9,
    "ray_surfaces_per_s_per_chip_cooke_triplet_xla": 6.3e9,
    "ray_surfaces_per_s_per_chip_double_gauss_3f_3wl_grid": 2.0e10,
    "ray_surfaces_per_s_per_chip_uv_projection_telecentric": 1.8e10,
    "ray_surfaces_per_s_per_chip_cooke_gaussian_apodized": 1.6e10,
    "grad_rays_per_s_cooke_pallas": 5.6e8,
    "grad_rays_per_s_double_gauss_pallas": 4.2e8,
    "grad_rays_per_s_double_gauss_polarized": 2.2e8,
    "grad_rays_per_s_cooke_xla": 1.1e8,
}


def run_gate(path: str | pathlib.Path) -> int:
    entries = json.loads(pathlib.Path(path).read_text())
    by_metric = {e["metric"]: e for e in entries if isinstance(e, dict)}

    probe = by_metric.get("probe_roofline", {})
    vpu = probe.get("vpu_gops") or PROBE_REF_VPU_GOPS
    norm = PROBE_REF_VPU_GOPS / vpu

    missing = [m for m in FLOORS if m not in by_metric]
    failures = []
    for metric, floor in FLOORS.items():
        e = by_metric.get(metric)
        if e is None:
            continue
        val = e.get("value_normalized", e["value"] * norm)
        status = "ok" if val >= floor else "REGRESSION"
        print(f"{status:10s} {metric:52s} {val:.3e} >= {floor:.2e}")
        if val < floor:
            failures.append(metric)

    if missing:
        print(f"MISSING entries: {missing}")
        return 2
    if failures:
        print(f"FAILED: {len(failures)} entries below floor: {failures}")
        return 1
    print(f"perf gate PASSED ({len(FLOORS)} entries, probe vpu={vpu:.0f} "
          f"GOPS, norm x{norm:.2f})")
    return 0


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SUITE.json"
    sys.exit(run_gate(path))
