"""The reference's embedded validation suites, ported.

Five cages with 0/2/3/4/6 windows (reference:
tests/test_validate_windows.py) and five average-diameter cases
(reference: tests/test_validate_average_diameter.py), extracted to
fixture files; golden values compared order-insensitively at the
reference's own decimal=3 tolerance (case_5's golden diameters are
scipy-version-wobbly at ~1e-2, so it gets 0.05 like REYMAL).
"""

import json

import numpy as np
import pytest

import pywindow_tpu as pw
from tests.conftest import DATA, load_xyz

GOLDEN = json.loads((DATA / "validation_golden.json").read_text())


@pytest.mark.parametrize(
    "case",
    [
        pytest.param(
            f"case_{i}",
            marks=[pytest.mark.slow] if i in (2, 3, 5) else [],
        )
        for i in range(1, 6)
    ],
)
def test_windows_validation_suite(case):
    elements, coords = load_xyz(DATA / f"val_{case}.xyz")
    mol = pw.Molecule(
        {"elements": elements, "coordinates": coords}, case, 0
    )
    diameters = mol.calculate_windows()
    gold = GOLDEN[case]["windows_diam"]
    if gold is None:
        assert diameters is None
        return
    tol = 0.05 if case == "case_5" else 0.01
    assert diameters is not None and len(diameters) == len(gold)
    np.testing.assert_allclose(
        np.sort(diameters), np.sort(gold), atol=tol
    )
    # centres match the golden set pairwise (order-insensitive)
    coms = mol.properties["windows"]["centre_of_mass"]
    taken = set()
    for g in np.asarray(GOLDEN[case]["windows_coms"]):
        dists = np.linalg.norm(coms - g, axis=1)
        order = np.argsort(dists)
        j = next(int(k) for k in order if int(k) not in taken)
        taken.add(j)
        np.testing.assert_allclose(coms[j], g, atol=tol)


@pytest.mark.slow
@pytest.mark.parametrize("case", [f"avg_case_{i}" for i in range(1, 6)])
def test_average_diameter_validation_suite(case):
    elements, coords = load_xyz(DATA / f"{case}.xyz")
    mol = pw.Molecule(
        {"elements": elements, "coordinates": coords}, case, 0
    )
    avg = mol.calculate_average_diameter()
    assert avg == pytest.approx(
        GOLDEN[case]["average_diam"], abs=1e-3
    )


def test_bulk_properties_conversion_matches_single():
    """to_properties_dicts_bulk must be value-identical to the per-row
    to_properties_dict(unpack_results(...)) path on every branch:
    no-windows, masked slots, saturation and overflow markers."""
    import numpy as np

    from pywindow_tpu.ops.analysis import (
        packed_size,
        to_properties_dict,
        to_properties_dicts_bulk,
        unpack_results,
    )

    w = 4
    size = packed_size(w)
    rng = np.random.default_rng(7)
    flat = rng.uniform(-5, 25, (8, size)).astype(np.float32)
    # row 0: closed (any_open = 0); others open
    flat[:, 11] = 1.0
    flat[0, 11] = 0.0
    # cluster counts: row 1 saturated (>= w), row 2 zero
    flat[:, 12] = 2.0
    flat[1, 12] = 4.0
    flat[2, 12] = 0.0
    # overflow marker on row 3
    flat[:, 13] = 0.0
    flat[3, 13] = 1.0
    # fast-budget capped marker on row 5
    flat[:, 14] = 0.0
    flat[5, 14] = 1.0
    # window valid flags: mixed patterns
    off = 21
    flat[:, off + w : off + 2 * w] = rng.integers(
        0, 2, (8, w)
    ).astype(np.float32)
    # refine-failed flags
    flat[:, off + 2 * w : off + 3 * w] = 0.0
    flat[4, off + 2 * w] = 1.0

    bulk = to_properties_dicts_bulk(flat, w)
    for i in range(8):
        single = to_properties_dict(unpack_results(flat[i], w))
        b = bulk[i]
        assert set(single) == set(b), (set(single), set(b))
        for key in single:
            sv, bv = single[key], b[key]
            if isinstance(sv, dict):
                assert set(sv) == set(bv)
                for k2 in sv:
                    s2, b2 = sv[k2], bv[k2]
                    if s2 is None:
                        assert b2 is None
                    elif isinstance(s2, np.ndarray):
                        np.testing.assert_array_equal(s2, b2)
                        assert s2.shape == b2.shape
                    else:
                        assert float(s2) == float(b2), (key, k2)
            elif isinstance(sv, np.ndarray):
                np.testing.assert_array_equal(sv, bv)
            else:
                assert sv == bv, key
