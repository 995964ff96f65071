"""On-device DBSCAN vs sklearn, and the spiral candidate-list variant.

The window pipeline's clustering must reproduce sklearn.cluster.DBSCAN
semantics (reference: utilities.py:1478-1487): same membership, same
cluster numbering by processing order, same border attachment.
"""

import numpy as np
import pytest
from sklearn.cluster import DBSCAN as SkDBSCAN

import jax.numpy as jnp

from pywindow_tpu.ops import rays
from pywindow_tpu.ops.cluster import (
    dbscan,
    dbscan_spiral,
    spiral_neighbor_candidates,
)


def _sk_labels(points, valid, eps, min_samples):
    """sklearn labels, renumbered the way the device code numbers them
    (by ascending minimal core index), mapped back to all slots."""
    pts = points[valid]
    sk = SkDBSCAN(eps=eps, min_samples=min_samples).fit(pts)
    out = np.full(len(points), -1, dtype=np.int32)
    out[np.flatnonzero(valid)] = sk.labels_
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dbscan_matches_sklearn_random(seed):
    rng = np.random.default_rng(seed)
    # several gaussian blobs + uniform noise, some slots invalid
    centres = rng.normal(scale=6.0, size=(4, 3))
    pts = np.concatenate(
        [c + rng.normal(scale=0.4, size=(30, 3)) for c in centres]
        + [rng.uniform(-10, 10, size=(25, 3))]
    )
    valid = rng.random(len(pts)) > 0.15
    eps, min_samples = 1.0, 5

    got, n = dbscan(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(eps),
        min_samples=min_samples, max_clusters=16,
    )
    got = np.asarray(got)
    want = _sk_labels(pts, valid, eps, min_samples)

    # same partition: mapping between label sets must be a bijection,
    # noise matches exactly
    np.testing.assert_array_equal(got == -1, want == -1)
    pairs = {(a, b) for a, b in zip(got, want) if a != -1}
    assert len({a for a, _ in pairs}) == len(pairs)
    assert len({b for _, b in pairs}) == len(pairs)
    assert int(n) == len(pairs)


@pytest.mark.parametrize("radius", [1.2, 5.0, 11.1, 30.0])
@pytest.mark.parametrize("n_points", [120, 797])
def test_dbscan_spiral_matches_dense(radius, n_points, monkeypatch):
    """The candidate-list variant must equal the dense form bit-for-bit
    on real spiral inputs across the radius range (the candidate cap is
    derived for radius >= 0.5 A)."""
    rng = np.random.default_rng(n_points)
    points = np.asarray(
        rays.golden_spiral(n_points, radius, dtype=jnp.float64)
    )
    eps = float(rays.mean_knn_eps_scaled(n_points, jnp.asarray(radius)))
    # patchy survival pattern like real windows: a few caps survive
    dirs = rng.normal(size=(5, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    unit = points / radius
    valid = (unit @ dirs.T > 0.93).any(axis=1)
    valid |= rng.random(n_points) < 0.02  # sprinkle noise points

    dense = dbscan(
        jnp.asarray(points), jnp.asarray(valid), jnp.asarray(eps)
    )
    sparse = dbscan_spiral(
        jnp.asarray(points), jnp.asarray(valid), jnp.asarray(eps),
        spiral_neighbor_candidates(n_points),
    )
    np.testing.assert_array_equal(np.asarray(dense[0]), np.asarray(sparse[0]))
    assert int(dense[1]) == int(sparse[1])


def test_spiral_candidates_cover_worst_case_eps():
    """Every edge the dense graph can contain at the minimum supported
    radius must appear in the candidate lists."""
    n_points = 300
    radius = 0.5
    points = np.asarray(
        rays.golden_spiral(n_points, radius, dtype=jnp.float64)
    )
    eps = float(rays.mean_knn_eps_scaled(n_points, jnp.asarray(radius)))
    d = np.sqrt(((points[:, None] - points[None, :]) ** 2).sum(-1))
    nbr = spiral_neighbor_candidates(n_points)
    cand = np.zeros((n_points, n_points), dtype=bool)
    for i in range(n_points):
        js = nbr[i][nbr[i] >= 0]
        cand[i, js] = True
    missing = (d <= eps) & ~cand
    assert not missing.any(), f"{missing.sum()} edges missing"
