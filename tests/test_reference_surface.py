"""Direct parity against the reference executed in this environment.

The compat layer (`pywindow_tpu.utilities`) must expose every function a
reference user could import from `pywindow.utilities`, with matching
values.  The reference itself is imported live (with the rdkit logger
stub it needs) and both implementations run on the same inputs.
"""

import logging
import sys
import types

import numpy as np
import pytest

from pywindow_tpu import tables
from pywindow_tpu import utilities as u
from tests.conftest import DATA, load_xyz


@pytest.fixture(scope="module")
def ref_utils():
    rd = types.ModuleType("rdkit")
    ch = types.ModuleType("rdkit.Chem")
    inchi = types.ModuleType("rdkit.Chem.inchi")
    inchi.logger = logging.getLogger("rdkit-stub")
    ch.inchi = inchi
    rd.Chem = ch
    sys.modules.setdefault("rdkit", rd)
    sys.modules.setdefault("rdkit.Chem", ch)
    sys.modules.setdefault("rdkit.Chem.inchi", inchi)
    sys.path.insert(0, "/root/reference/src")
    from pywindow._internal import utilities as ru

    return ru


@pytest.fixture(scope="module")
def cc3():
    elements, coords = load_xyz(DATA / "PUDXES.xyz")
    # the reference expects vdW radii as an (N, 1) column (its
    # under_sqrt/.diagonal() quirk relies on it); the compat layer
    # accepts either shape
    vdw = tables.ELEMENT_VDW[tables.element_ids(elements)].reshape(-1, 1)
    # pore-centred frame, as the per-ray functions expect
    com = np.asarray(u.center_of_mass(elements, coords))
    return elements, coords - com, vdw


def test_surface_is_complete(ref_utils):
    """Every public callable the reference's utilities module defines
    must exist on the compat layer."""
    ref_names = {
        n
        for n in dir(ref_utils)
        if not n.startswith("_")
        and callable(getattr(ref_utils, n))
        and getattr(
            getattr(ref_utils, n), "__module__", ""
        ).endswith("utilities")
    }
    ours = set(dir(u))
    missing = sorted(ref_names - ours)
    assert not missing, f"compat layer lacks: {missing}"


def test_vector_functions_match_reference(ref_utils, cc3):
    elements, coords, vdw = cc3
    rng = np.random.default_rng(5)
    open_seen = blocked_seen = 0
    for _ in range(40):
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * rng.uniform(4.0, 11.0)

        ga = ref_utils.vector_analysis(v, coords, vdw)
        ma = u.vector_analysis(v, coords, vdw)
        assert (ga is None) == (ma is None)
        if ga is not None:
            np.testing.assert_allclose(ma, ga, atol=1e-10)

        gp = ref_utils.vector_preanalysis(v, coords, vdw)
        mp = u.vector_preanalysis(v, coords, vdw)
        assert (gp is None) == (mp is None)
        if gp is not None:
            np.testing.assert_allclose(mp, gp, atol=1e-10)
            open_seen += 1
        else:
            blocked_seen += 1

        gr = ref_utils.vector_analysis_reversed(v, coords, vdw)
        mr = u.vector_analysis_reversed(v, coords, vdw)
        assert (gr is None) == (mr is None)
        if gr is not None:
            assert mr[0] == pytest.approx(gr[0], abs=1e-10)
            np.testing.assert_allclose(mr[1], gr[1], atol=1e-10)
    assert open_seen > 0 and blocked_seen > 0  # both regimes exercised


def test_shape_helpers_match_reference(ref_utils):
    rng = np.random.default_rng(3)
    a = rng.normal(size=(3, 3))
    tensor = a @ a.T
    ge = ref_utils.get_tensor_eigenvalues(tensor, sort=True)
    me = u.get_tensor_eigenvalues(tensor, sort=True)
    np.testing.assert_allclose(me, ge, atol=1e-12)
    for fn in ("asphericity", "acylidricity", "relative_shape_anisotropy"):
        assert getattr(u, fn)(ge) == pytest.approx(
            getattr(ref_utils, fn)(ge), abs=1e-12
        )


def test_cell_converters_match_reference(ref_utils):
    lattice = np.array(
        [[25.0, 0.0, 0.0], [2.0, 24.0, 0.0], [1.0, 1.5, 23.0]]
    )
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 20, size=(6, 3))
    np.testing.assert_allclose(
        u.cart2frac_all(pts, lattice),
        ref_utils.cart2frac_all(pts, lattice),
        atol=1e-10,
    )
    fr = rng.uniform(0, 1, size=(6, 3))
    np.testing.assert_allclose(
        u.frac2cart_all(fr, lattice),
        ref_utils.frac2cart_all(fr, lattice),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(u.fractional_from_cartesian(pts[0], lattice)),
        np.asarray(ref_utils.fractional_from_cartesian(pts[0], lattice)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(u.cartisian_from_fractional(fr[0], lattice)),
        np.asarray(ref_utils.cartisian_from_fractional(fr[0], lattice)),
        atol=1e-12,
    )


def test_objectives_match_reference(ref_utils, cc3):
    elements, coords, _ = cc3
    com = np.array([0.3, -0.2, 0.5])
    assert u.correct_pore_diameter(com, elements, coords) == pytest.approx(
        ref_utils.correct_pore_diameter(com, elements, coords), abs=1e-8
    )
    assert u.optimise_xy([0.2, -0.1], 0.4, elements, coords) == pytest.approx(
        ref_utils.optimise_xy([0.2, -0.1], 0.4, elements, coords), abs=1e-8
    )
    assert u.optimise_z([0.4], 0.2, -0.1, elements, coords) == pytest.approx(
        ref_utils.optimise_z([0.4], 0.2, -0.1, elements, coords), abs=1e-8
    )


@pytest.mark.slow
def test_window_analysis_matches_reference(ref_utils, cc3):
    """The compat window_analysis must land on the reference's window
    (same widest-ray selection, same optimised diameter/centre)."""
    elements, coords, vdw = cc3
    # build a small analysed-ray cluster around a real window direction:
    # sample spiral rays, keep open ones, take a handful
    rng = np.random.default_rng(1)
    rows = []
    while len(rows) < 5:
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * 10.0
        res = ref_utils.vector_preanalysis(v, coords, vdw)
        if res is not None:
            rows.append(res)
    window = np.array(rows)
    got = u.window_analysis(window, elements, coords, vdw)
    want = ref_utils.window_analysis(window, elements, coords, vdw)
    assert (got is None) == (want is None)
    if got is not None:
        assert got[0] == pytest.approx(want[0], abs=5e-3)
        np.testing.assert_allclose(got[1], want[1], atol=5e-2)


@pytest.mark.slow
def test_window_analysis_honours_custom_vdw(ref_utils, cc3):
    """Caller-supplied vdW radii flow into the fine ray re-sample, as
    in the reference (vector_analysis at utilities.py:1221-1224 takes
    them; the centre optimisation reads table radii) — a custom-radius
    call must match the reference run with the SAME custom radii, and
    radii big enough to block the re-sample must yield None in both."""
    elements, coords, vdw = cc3
    custom = vdw * 1.08  # inflated radii -> narrower re-sampled path
    rng = np.random.default_rng(1)
    rows = []
    while len(rows) < 5:
        v = rng.normal(size=3)
        v = v / np.linalg.norm(v) * 10.0
        res = ref_utils.vector_preanalysis(v, coords, custom)
        if res is not None:
            rows.append(res)
    window = np.array(rows)
    got = u.window_analysis(window, elements, coords, custom)
    want = ref_utils.window_analysis(window, elements, coords, custom)
    assert (got is None) == (want is None)
    if got is not None:
        assert got[0] == pytest.approx(want[0], abs=5e-3)
        np.testing.assert_allclose(got[1], want[1], atol=5e-2)
    # radii inflated past the channel width: the re-sampled ray is
    # blocked, both implementations report the window as None
    blocked = vdw * 3.0
    got_b = u.window_analysis(window, elements, coords, blocked)
    want_b = ref_utils.window_analysis(window, elements, coords, blocked)
    assert got_b is None
    assert want_b is None


def test_window_analysis_rejects_bad_vdw_length(cc3):
    elements, coords, _ = cc3
    with pytest.raises(ValueError, match="one radius per atom"):
        u.window_analysis(
            np.zeros((2, 8)), elements, coords, np.ones(3)
        )
