"""Extract glass dispersion data for the standalone catalog.

Resolves each curated glass name through the reference's material lookup (to
find the matching refractiveindex.info database file), then parses that YAML
*data* file directly and writes coefficients into
``optiland_pr_tpu/data/glass_catalog.json``. Also extracts the Abbe-model
polynomial-fit matrix. These are public optical-glass data (refractiveindex.info
/ Schott catalog), not code.

Run:  python tools/gen_catalog.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tools.ref_shim  # noqa: E402,F401

GLASSES = [
    # (name, reference_or_None)
    ("BASF2", None), ("E-LLF6", None), ("E-SF1", None), ("FK3", None),
    ("H-LAK52", None), ("H-ZLAF52A", None), ("J-LASF015", None),
    ("J-LLF2", None), ("K10", None), ("L-BSL7", None), ("LAC9", None),
    ("LITHOTEC-CAF2", None), ("M-TAF1", None), ("N-BAK1", None),
    ("N-BAK2", None), ("N-BASF2", None), ("N-BK7", None), ("N-F2", None),
    ("N-FK51", None), ("N-K5", None), ("N-KZFS4", None), ("N-LAF32", None),
    ("N-LAF33", None), ("N-LAF34", None), ("N-LAK12", None), ("N-PSK3", None),
    ("N-SF11", None), ("N-SK10", None), ("N-SK11", None), ("N-SK15", None),
    ("N-SK16", None), ("N-SK2", None), ("N-SK4", None), ("N-SSK2", None),
    ("N-ZK7", None), ("Q-LAFPH1S", None), ("S-FSL5", None), ("S-LAL18", None),
    ("SF4", None), ("SF4", "hikari"), ("SF4", "schott"), ("SK15", None), ("SK16", None),
    ("CAF2", None), ("CAF2", "Daimon-20"), ("F2", "schott"), ("F5", "schott"), ("LF5", "schott"),
    ("SF1", "schott"), ("SF15", "hikari"), ("SF2", "schott"),
    ("SF5", "schott"), ("SF11", "schott"), ("BK7", "schott"),
    ("SF10", "schott"), ("LASF44", "schott"), ("BAF10", "schott"),
    ("FUSED SILICA", None), ("PMMA", None), ("POLYCARB", None),
    ("N-LAK9", None), ("N-SF2", None), ("S-LAH64", None), ("N-LASF9", None),
    ("N-PK52A", None), ("N-BAF10", None), ("N-SF57", None), ("N-SF6", None),
    ("N-LAK22", None), ("SF6", "schott"), ("SF57", "schott"),
    ("N-FK58", None), ("N-PSK53A", None), ("N-LASF44", None),
]


def extract_entry(name, reference):
    from optiland.materials.material import Material

    mat = Material(name, reference=reference) if reference else Material(name)
    mf = mat  # Material subclasses MaterialFile in the reference
    filename = mat.filename
    with open(filename) as f:
        data = yaml.safe_load(f)

    entry = {"file": str(Path(filename).relative_to(
        Path(filename).parents[3])) if "data-nk" in filename else filename}
    specs = data.get("SPECS") or {}
    t0 = specs.get("temperature")
    if isinstance(t0, str):
        t0 = float(t0.split()[0])
    if t0 is not None:
        entry["t0_celsius"] = t0
    for td in specs.get("thermal_dispersion", []) or []:
        if td.get("type") == "Schott formula":
            entry["thermal_dispersion"] = [
                float(c) for c in td["coefficients"].split()]
    for sub in data.get("DATA", []):
        t = sub.get("type", "")
        if t.startswith("formula "):
            entry["formula"] = int(t.split()[-1])
            entry["coefficients"] = [float(c) for c in
                                     sub.get("coefficients", "").split()]
        elif t == "tabulated k":
            arr = np.loadtxt(__import__("io").StringIO(sub.get("data", "")))
            arr = np.atleast_2d(arr)
            entry["k_wavelength"] = arr[:, 0].tolist()
            entry["k_values"] = arr[:, 1].tolist()
        elif t in ("tabulated n", "tabulated nk"):
            arr = np.loadtxt(__import__("io").StringIO(sub.get("data", "")))
            arr = np.atleast_2d(arr)
            entry["n_wavelength"] = arr[:, 0].tolist()
            entry["n_values"] = arr[:, 1].tolist()
            if t == "tabulated nk" and arr.shape[1] > 2:
                entry["k_wavelength"] = arr[:, 0].tolist()
                entry["k_values"] = arr[:, 2].tolist()
    return entry


def main():
    out = {}
    failed = []
    for name, reference in GLASSES:
        key = f"{name}|{reference}" if reference else name
        try:
            out[key] = extract_entry(name, reference)
            print(f"ok   {key}")
        except Exception as e:  # noqa: BLE001
            failed.append((key, str(e)))
            print(f"FAIL {key}: {e}")

    data_dir = Path(__file__).resolve().parent.parent / "optiland_pr_tpu" / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    with open(data_dir / "glass_catalog.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    # Abbe polynomial-fit matrix (public Schott-catalog fit data)
    from importlib import resources
    src = str(resources.files("optiland.database").joinpath(
        "glass_model_coefficients.npy"))
    np.save(data_dir / "abbe_model_coefficients.npy", np.load(src))

    print(f"\nwrote {len(out)} glasses; {len(failed)} failures")
    for k, e in failed:
        print(f"  failed: {k}: {e}")


if __name__ == "__main__":
    main()
