"""On-device DBSCAN over sampling-ray endpoints.

The reference clusters surviving rays with ``sklearn.cluster.DBSCAN``
(reference: utilities.py:1478-1487).  Cluster counts here are tiny (one
per window) but the clustering sits inside the per-frame pipeline, so it
must be jit/vmap-able: this implementation builds the eps-threshold graph
and finds connected components of core points by min-label propagation
(a fixed-point ``lax.while_loop``), then attaches border points.

Semantics matched to sklearn:

* neighbourhood = ``dist <= eps`` including the point itself,
* core iff neighbourhood size >= min_samples,
* clusters = connected components of the core-core graph,
* border points join the cluster whose minimal core index is smallest
  among their core neighbours (sklearn's scan-order claim),
* noise label -1; cluster ids renumbered 0,1,... by ascending first
  core index (sklearn's processing order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INT_INF = jnp.iinfo(jnp.int32).max

#: smallest sampling-sphere radius (A) the static candidate lists must
#: stay correct for; any >= 2-atom molecule has max_dim >= ~2.4 A so
#: radius >= 1.2 A — 0.5 leaves a wide margin.
_R_MIN = 0.5


@functools.lru_cache(maxsize=64)
def spiral_neighbor_candidates(n_points: int) -> np.ndarray:
    """Static (P, K) eps-neighbour candidate lists for the golden spiral.

    The sampling rays live on a golden-angle spiral whose *layout* is
    fixed per point count — only the radius scales per frame.  The
    DBSCAN threshold is ``eps = m·r + sqrt(m·r)`` (m = unit-sphere
    mean 10-NN distance), so in unit-sphere distance the cut is
    ``t(r) = m + sqrt(m/r)``, monotonically decreasing in r.  Candidate
    lists computed at ``t(_R_MIN)`` therefore contain every possible
    eps-edge for any realistic radius, shrinking the per-frame
    clustering from (P, P) dense work to (P, K) gathers (K ~ 5% of P).

    Slot 0 is the point itself; missing slots are -1.  Distances are
    still recomputed on device from the actual scaled points, so edge
    decisions carry the exact same rounding as the dense path.
    """
    golden_angle = np.pi * (3.0 - np.sqrt(5.0))
    k = np.arange(n_points, dtype=np.float64)
    theta = golden_angle * k
    z = np.linspace(
        1.0 - 1.0 / n_points, 1.0 / n_points - 1.0, n_points
    )
    rho = np.sqrt(1.0 - z * z)
    pts = np.stack(
        [rho * np.cos(theta), rho * np.sin(theta), z], axis=-1
    )
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    m_unit = float(np.sort(d, axis=1)[:, :10].mean())
    t_cap = m_unit + np.sqrt(m_unit / _R_MIN)
    # 5% safety margin over the analytic cap for layout rounding
    within = d <= t_cap * 1.05
    counts = within.sum(axis=1)
    kmax = int(counts.max())
    nbr = np.full((n_points, kmax), -1, dtype=np.int32)
    for i in range(n_points):
        js = np.flatnonzero(within[i])
        # self first (distance 0 sorts first anyway, but make it explicit)
        order = np.argsort(d[i, js], kind="stable")
        js = js[order]
        assert js[0] == i
        nbr[i, : len(js)] = js
    return nbr


def _pointer_halve(labels: jnp.ndarray, p: int) -> jnp.ndarray:
    """One path-halving step: ``labels = min(labels, labels[labels])``.

    Labels are candidate component roots (point indices, or INT_INF for
    non-core).  Jumping to the current root's own label compresses
    chains, turning the O(graph diameter) neighbour-min propagation
    into O(log diameter) heavy iterations.  The fixpoint is unchanged
    (monotone min over the same reachability relation).
    """
    jumped = labels[jnp.clip(labels, 0, p - 1)]
    return jnp.minimum(
        labels, jnp.where(labels < p, jumped, _INT_INF)
    )


def dbscan(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    eps: jnp.ndarray,
    min_samples: int = 5,
    max_clusters: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster ``points`` (P, 3) restricted to ``valid`` slots.

    Returns ``(labels, n_clusters)`` where labels is (P,) int32 with -1
    for noise/invalid and cluster ids in 0..n_clusters-1 (capped at
    ``max_clusters``; ids beyond the cap are folded to -1 and counted
    out — callers size max_clusters generously).
    """
    p = points.shape[0]
    diff = points[:, None, :] - points[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pair_valid = valid[:, None] & valid[None, :]
    adj = pair_valid & (dist <= eps)  # includes self (dist 0 <= eps)
    # materialise the bools once: without the barrier the border pass
    # re-reads the f32 (B, P, P) distance matrix (3.7 GB at B=1440)
    # instead of the packed predicate (profiled: 17.6 ms -> ~3 ms)
    adj = jax.lax.optimization_barrier(adj)

    n_neighbors = jnp.sum(adj, axis=1)  # adj is already validity-masked
    core = valid & (n_neighbors >= min_samples)

    idx = jnp.arange(p, dtype=jnp.int32)
    labels0 = jnp.where(core, idx, _INT_INF)
    core_adj = adj & core[:, None] & core[None, :]

    def propagate(state):
        labels, _ = state
        neigh_min = jnp.min(
            jnp.where(core_adj, labels[None, :], _INT_INF), axis=1
        )
        new = jnp.minimum(labels, neigh_min)
        # NO pointer halving here (unlike dbscan_spiral): the (B, P)
        # label gather per iteration is slower on TPU than the extra
        # dense (P, P) min passes it saves — measured 34.6 -> 115 ms
        # at B=4320 (vmapped dynamic gathers serialise; see the perf
        # ledger's gather lessons).
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, propagate, (labels0, jnp.asarray(True))
    )

    # border points: minimal component label among core neighbours.
    border_label = jnp.min(
        jnp.where(adj & core[None, :], labels[None, :], _INT_INF), axis=1
    )
    return _finalise(labels, border_label, core, valid, idx, p, max_clusters)


def _finalise(labels, border_label, core, valid, idx, p, max_clusters):
    """Attach borders and renumber components by ascending root index."""
    raw = jnp.where(core, labels, jnp.where(valid, border_label, _INT_INF))
    is_root = core & (labels == idx)  # one root per component
    # rank(raw) == cumsum(is_root)[raw] - 1, computed gather-free as a
    # comparison count: the (P,) int gather lowers to a serialised TPU
    # gather (~17 ms at B=4320) while this (P, P) masked count fuses
    # like one DBSCAN pass (~4 ms).  Exact: pure integer counting.
    cnt = jnp.sum(
        (is_root[None, :] & (idx[None, :] <= raw[:, None])).astype(
            jnp.int32
        ),
        axis=-1,
    )
    rank_of = jnp.where((raw >= 0) & (raw < p), cnt - 1, -1)
    out = jnp.where((raw == _INT_INF) | (rank_of >= max_clusters), -1, rank_of)
    n_clusters = jnp.minimum(
        jnp.sum(is_root.astype(jnp.int32)), max_clusters
    )
    return out.astype(jnp.int32), n_clusters


def dbscan_spiral(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    eps: jnp.ndarray,
    nbr_idx,
    min_samples: int = 5,
    max_clusters: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DBSCAN over golden-spiral points via static candidate lists.

    Semantically identical to :func:`dbscan` (same per-edge distance
    arithmetic, same component/border/renumber rules) but all pairwise
    work happens on the (P, K) candidate lists from
    :func:`spiral_neighbor_candidates` instead of a (P, P) matrix —
    the dominant HBM cost of the dense form at trajectory batch sizes.
    ``nbr_idx`` must come from ``spiral_neighbor_candidates(P)``.
    """
    p = points.shape[0]
    nbr_idx = jnp.asarray(nbr_idx)
    nbr_ok = nbr_idx >= 0
    safe_idx = jnp.clip(nbr_idx, 0, p - 1)
    nbr_pts = points[safe_idx]  # (P, K, 3)
    diff = points[:, None, :] - nbr_pts
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # same form as dense
    edge = (
        nbr_ok
        & valid[:, None]
        & valid[safe_idx]
        & (dist <= eps)
    )  # (P, K); slot 0 is self (dist 0)

    n_neighbors = jnp.sum(edge, axis=1)
    core = valid & (n_neighbors >= min_samples)

    idx = jnp.arange(p, dtype=jnp.int32)
    labels0 = jnp.where(core, idx, _INT_INF)
    core_edge = edge & core[:, None] & core[safe_idx]

    def propagate(state):
        labels, _ = state
        neigh_min = jnp.min(
            jnp.where(core_edge, labels[safe_idx], _INT_INF), axis=1
        )
        new = jnp.minimum(labels, neigh_min)
        new = _pointer_halve(new, p)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], propagate, (labels0, jnp.asarray(True))
    )

    border_label = jnp.min(
        jnp.where(edge & core[safe_idx], labels[safe_idx], _INT_INF),
        axis=1,
    )
    return _finalise(labels, border_label, core, valid, idx, p, max_clusters)
