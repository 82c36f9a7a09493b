"""Full material-database parity vs the live reference: name resolution
(similarity search) and n/k dispersion for a broad sample of the
refractiveindex.info catalog (VERDICT round-1 missing items #1-2)."""
import csv
import random

import numpy as np
import pytest

from optiland_pr_tpu.materials.catalog import (material, find_material,
                                               _index, catalog_names)


def _ref_rows():
    with open("/root/reference/optiland/database/catalog_nk.csv") as f:
        return list(csv.DictReader(f))


def test_catalog_covers_reference():
    rows = _ref_rows()
    idx = _index()
    assert len(idx) == len(rows)
    usable = [r for r in idx if "error" not in r]
    assert len(usable) >= len(rows) - 15


@pytest.mark.parametrize("seed", [0, 1])
def test_material_resolution_and_index_parity(ref_optiland, seed):
    """50 random catalog names per seed: our similarity search must pick the
    same database file as the reference Material lookup
    (/root/reference/optiland/materials/material.py:22-260), and n/k must
    agree at 1e-9 across each material's valid range."""
    from optiland.materials.material import Material as RefMaterial

    rows = _ref_rows()
    rng = random.Random(seed)
    picks = rng.sample(range(len(rows)), 50)
    checked = 0
    for i in picks:
        row = rows[i]
        name = row["category_name"]
        ref_kw = row["reference"]
        try:
            ref_mat = RefMaterial(name, reference=ref_kw)
        except Exception:
            continue  # reference itself cannot resolve this combination
        row_id = find_material(name, reference=ref_kw)
        ours_file = _index()[row_id]["filename"]
        assert ref_mat.filename.endswith(ours_file), \
            f"{name}|{ref_kw}: ours {ours_file} vs ref {ref_mat.filename}"
        if "error" in _index()[row_id]:
            continue
        model, params = material(name, reference=ref_kw)
        lo = float(row["min_wavelength"])
        hi = float(row["max_wavelength"])
        wls = np.linspace(lo * 1.001, hi * 0.999, 7)
        n_ref = np.array([float(ref_mat.n(w)) for w in wls])
        k_ref = np.array([float(ref_mat.k(w)) for w in wls])
        n_ours = np.asarray(model.n(params, wls))
        k_ours = np.asarray(model.k(params, wls))
        np.testing.assert_allclose(n_ours, n_ref, rtol=1e-9, atol=1e-12,
                                   err_msg=f"n({name}|{ref_kw})")
        np.testing.assert_allclose(k_ours, k_ref, rtol=1e-9, atol=1e-12,
                                   err_msg=f"k({name}|{ref_kw})")
        checked += 1
    assert checked >= 30


def test_sample_glasses_resolve(ref_optiland):
    """Every glass used by the 25 reference sample systems resolves through
    the full catalog to the same file as the reference."""
    from optiland.materials.material import Material as RefMaterial
    names = [("N-BK7", None), ("N-SF11", None), ("SF11", "schott"),
             ("N-LAK9", None), ("N-SF2", None), ("SK16", None),
             ("F2", "schott"), ("N-BAF10", None), ("LITHOTEC-CAF2", None),
             ("FUSED SILICA", None), ("PMMA", None), ("H-ZLAF52A", None),
             ("E-SF1", None), ("S-LAH64", None), ("N-PK52A", None)]
    for name, ref_kw in names:
        ref_mat = RefMaterial(name, reference=ref_kw) if ref_kw \
            else RefMaterial(name)
        row_id = find_material(name, reference=ref_kw)
        ours_file = _index()[row_id]["filename"]
        assert ref_mat.filename.endswith(ours_file), \
            f"{name}: {ours_file} vs {ref_mat.filename}"
        model, params = material(name, reference=ref_kw)
        n55 = float(np.asarray(model.n(params, 0.55)))
        np.testing.assert_allclose(n55, float(ref_mat.n(0.55)), rtol=1e-10,
                                   err_msg=name)


def test_wavelength_filtered_lookup(ref_optiland):
    """min/max wavelength filters mirror the reference's range filtering."""
    from optiland.materials.material import Material as RefMaterial
    ref_mat = RefMaterial("Si", reference="Shkondin", min_wavelength=5.0,
                          max_wavelength=10.0)
    row_id = find_material("Si", reference="Shkondin", min_wavelength=5.0,
                           max_wavelength=10.0)
    assert ref_mat.filename.endswith(_index()[row_id]["filename"])


def test_catalog_names_listing():
    names = catalog_names()
    assert len(names) > 500
    assert "BK7" in names and "SiO2" in names
