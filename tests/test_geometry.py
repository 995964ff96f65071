"""Golden-value and property-based tests for the core geometry kernels.

Golden values from the reference test suite
(reference: tests/test_validate_cc3.py:358-439).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pywindow_tpu.ops import encoding, geometry, rays

GOLD_COM = np.array([12.4, 12.4, 12.4])
GOLD_MAX = 22.179369990077188
GOLD_AVG = 13.832017514255472
GOLD_PORE = 5.397020177310022
GOLD_PORE_VOL = 82.31154385154417


@pytest.fixture(scope="module")
def cc3_mol(cc3):
    return encoding.encode(*cc3)


def test_centre_of_mass(cc3_mol):
    np.testing.assert_allclose(
        np.asarray(geometry.center_of_mass(cc3_mol)), GOLD_COM, atol=1e-8
    )


def test_molecular_weight(cc3_mol):
    assert float(geometry.molecular_weight(cc3_mol)) == pytest.approx(
        1117.548, abs=1e-3
    )


def test_max_dim(cc3_mol):
    _, _, d = geometry.max_dim(cc3_mol)
    assert float(d) == pytest.approx(GOLD_MAX, abs=1e-8)


def test_pore_diameter_and_volume(cc3_mol):
    d, _ = geometry.pore_diameter(cc3_mol)
    assert float(d) == pytest.approx(GOLD_PORE, abs=1e-8)
    vol = geometry.sphere_volume(d / 2.0)
    assert float(vol) == pytest.approx(GOLD_PORE_VOL, abs=1e-6)


def test_average_diameter(cc3_mol):
    centred = geometry.shift_to(cc3_mol, jnp.zeros(3))
    _, _, md = geometry.max_dim(centred)
    n = rays.number_of_points(float(md))
    avg = rays.average_diameter(centred, n, md)
    assert float(avg) == pytest.approx(GOLD_AVG, abs=1e-8)


def test_rigid_motion_invariance(cc3):
    """All diameters must be invariant to rotation + translation."""
    elements, coords = cc3
    rng = np.random.default_rng(7)
    # random rotation via QR
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    moved = coords @ q.T + np.array([11.0, -3.0, 42.0])

    mol_a = encoding.encode(elements, coords)
    mol_b = encoding.encode(elements, moved)
    da = float(geometry.max_dim(mol_a)[2])
    db = float(geometry.max_dim(mol_b)[2])
    assert da == pytest.approx(db, abs=1e-8)
    pa = float(geometry.pore_diameter(mol_a)[0])
    pb = float(geometry.pore_diameter(mol_b)[0])
    assert pa == pytest.approx(pb, abs=1e-8)


def test_padding_independence(cc3):
    """Results must not depend on the padded size."""
    elements, coords = cc3
    a = encoding.encode(elements, coords, pad_to=176)
    b = encoding.encode(elements, coords, pad_to=512)
    assert float(geometry.pore_diameter(a)[0]) == pytest.approx(
        float(geometry.pore_diameter(b)[0]), abs=1e-12
    )
    assert float(geometry.max_dim(a)[2]) == pytest.approx(
        float(geometry.max_dim(b)[2]), abs=1e-12
    )


def test_vmap_batch_matches_single(cc3):
    elements, coords = cc3
    batch = encoding.encode_batch(
        [(elements, coords), (elements, coords + 5.0)]
    )
    d_batch, _ = jax.vmap(geometry.pore_diameter)(batch)
    single = float(geometry.pore_diameter(encoding.encode(elements, coords))[0])
    np.testing.assert_allclose(np.asarray(d_batch), single, atol=1e-10)


def test_shape_descriptors(cc3_mol):
    gt = geometry.gyration_tensor(cc3_mol)
    ev = geometry.sorted_eigenvalues(gt)
    ev = np.asarray(ev)
    assert ev[0] >= ev[1] >= ev[2] > 0
    asph = float(geometry.asphericity(jnp.asarray(ev)))
    assert asph == pytest.approx(ev[0] - (ev[1] + ev[2]) / 2)
    # CC3 is nearly spherical: tiny relative shape anisotropy
    k2 = float(geometry.relative_shape_anisotropy(jnp.asarray(ev)))
    assert 0 <= k2 < 0.01
