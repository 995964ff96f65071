"""Fused Pallas DBSCAN kernel vs the dense jnp path.

Unlike the optimiser kernels, DBSCAN's outputs are DISCRETE (labels),
and on CPU in interpret mode the kernel executes the identical
diff-form distance arithmetic as :func:`pywindow_tpu.ops.cluster.dbscan`
— so the contract asserted here is EXACT label equality, not a
tolerance (reference behaviour: sklearn DBSCAN as invoked by
utilities.py:1478-1487).  On TPU the Mosaic lowering may contract
FMA chains differently; there the arbiter is the golden gate
(scripts/validate_f32.py), same as every other routed kernel.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pywindow_tpu.ops.cluster import dbscan  # noqa: E402
from pywindow_tpu.ops.cluster_pallas import (  # noqa: E402
    dbscan_labels_flat,
    dbscan_pallas,
    route_dbscan_to_pallas,
)


def _clumpy(rng, k, nblob):
    """Blobby point sets (windows-like: a few dense caps + noise)."""
    pts = []
    for _ in range(nblob):
        c = rng.normal(size=3)
        c /= np.linalg.norm(c)
        pts.append(c * 5.0 + rng.normal(scale=0.4, size=(k // nblob, 3)))
    pts.append(rng.normal(scale=6.0, size=(k - (k // nblob) * nblob, 3)))
    return np.concatenate(pts)[:k]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_labels_match_dense_exactly(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(20, 400))
    pts = _clumpy(rng, k, int(rng.integers(1, 7)))
    valid = rng.random(k) > 0.15
    eps = float(rng.uniform(0.5, 2.0))
    l0, n0 = dbscan(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps), 5, 8
    )
    l1, n1 = dbscan_pallas(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps), 5, 8
    )
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    assert int(n0) == int(n1)


def test_vmap_parity_and_ncl_recovery():
    """vmap-transparent, and max(labels)+1 == the dense n_clusters."""
    rng = np.random.default_rng(7)
    pts = rng.normal(scale=3.0, size=(6, 130, 3))
    valid = rng.random((6, 130)) > 0.2
    eps = rng.uniform(0.8, 1.5, size=(6,))
    f0 = jax.vmap(lambda p, v, e: dbscan(p, v, e, 5, 8))(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps)
    )
    f1 = jax.vmap(lambda p, v, e: dbscan_pallas(p, v, e, 5, 8))(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps)
    )
    np.testing.assert_array_equal(np.asarray(f0[0]), np.asarray(f1[0]))
    np.testing.assert_array_equal(np.asarray(f0[1]), np.asarray(f1[1]))


def test_max_clusters_folding_and_empty():
    """ids >= max_clusters fold to -1 with n_clusters == cap; an
    all-invalid frame is all-noise with 0 clusters."""
    rng = np.random.default_rng(11)
    # 5 well-separated dense blobs, cap at 3
    pts = np.concatenate(
        [
            np.array([20.0 * i, 0.0, 0.0]) + rng.normal(scale=0.3, size=(12, 3))
            for i in range(5)
        ]
    )
    valid = np.ones(len(pts), bool)
    l0, n0 = dbscan(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(1.5), 5, 3
    )
    l1, n1 = dbscan_pallas(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(1.5), 5, 3
    )
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    assert int(n1) == 3 and int(np.asarray(l1).max()) == 2
    le, ne = dbscan_pallas(
        jnp.asarray(pts),
        jnp.zeros(len(pts), bool),
        jnp.asarray(1.5),
        5,
        3,
    )
    assert int(ne) == 0 and (np.asarray(le) == -1).all()


def test_flat_batch_padding():
    """Flat entry pads b to the 8-frame block and K to 128 lanes
    without disturbing real frames."""
    rng = np.random.default_rng(13)
    b, k = 3, 70  # both need padding
    pts = rng.normal(scale=2.0, size=(b, k, 3))
    valid = (rng.random((b, k)) > 0.2).astype(pts.dtype)
    eps = np.full(b, 1.3, pts.dtype)
    lab = dbscan_labels_flat(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps), 5, 8
    )
    assert lab.shape == (b, k)
    for i in range(b):
        l0, _ = dbscan(
            jnp.asarray(pts[i]),
            jnp.asarray(valid[i] > 0.5),
            jnp.asarray(eps[i]),
            5,
            8,
        )
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(lab[i]))


def test_routing_gate(monkeypatch):
    monkeypatch.delenv("PYWINDOW_TPU_NO_PALLAS", raising=False)
    monkeypatch.delenv("PYWINDOW_TPU_NO_DBSCAN_PALLAS", raising=False)
    monkeypatch.setenv("PYWINDOW_TPU_FORCE_DBSCAN_PALLAS", "1")
    assert route_dbscan_to_pallas(384)
    assert not route_dbscan_to_pallas(2048)  # K over the VMEM cap
    monkeypatch.setenv("PYWINDOW_TPU_NO_PALLAS", "1")
    assert not route_dbscan_to_pallas(384)


@pytest.mark.slow
def test_routed_pipeline_bitwise_on_cpu(monkeypatch):
    """Full analysis with DBSCAN routing forced == unrouted pipeline.

    In f64 interpret mode the kernel's label decisions are bitwise
    identical, so the downstream window results must agree to fp noise
    (the windows themselves re-run the same refinement on the same
    selected rays)."""
    from pywindow_tpu.ops import analysis as ana
    from tests.conftest import load_structure

    els, co = load_structure("PUDXES")
    ana._compiled_full_analysis.cache_clear()
    base = ana.analyze(els, co)
    monkeypatch.setenv("PYWINDOW_TPU_FORCE_DBSCAN_PALLAS", "1")
    ana._compiled_full_analysis.cache_clear()
    routed = ana.analyze(els, co)
    ana._compiled_full_analysis.cache_clear()
    np.testing.assert_allclose(
        np.sort(routed["windows"]["diameters"]),
        np.sort(base["windows"]["diameters"]),
        atol=1e-9,
    )
    assert (
        routed["pore_diameter_opt"]["diameter"]
        == base["pore_diameter_opt"]["diameter"]
    )
